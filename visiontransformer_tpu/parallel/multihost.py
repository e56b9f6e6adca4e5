"""Multi-host (DCN) scale-out helpers.

The reference has no distributed training at all (SURVEY.md §2.6); this
framework scales intra-pod over ICI via the ("data","model") mesh
(parallel/mesh.py). For multi-host pods the standard JAX recipe applies and
is wrapped here: jax.distributed.initialize() + a mesh whose outer data axis
spans hosts (gradient all-reduce rides DCN between hosts, ICI within), plus
the host-local→global batch plumbing the Trainer needs once arrays span
processes.

Exercised for real by tests/test_multihost.py: two OS processes × four
virtual CPU devices each, Gloo cross-process collectives, one CE training
step bit-compared against the single-process 8-device result.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

import jax

from visiontransformer_tpu.parallel.mesh import batch_sharding, create_mesh


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """jax.distributed.initialize with explicit or env-provided topology
    (on Cloud TPU pods the arguments are auto-detected)."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs.update(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)


def pod_mesh(tp: int = 1) -> Tuple["jax.sharding.Mesh", int]:
    """A ("data","model") mesh over every device in the pod; returns
    (mesh, per_host_batch_divisor). Call initialize_multihost() first on
    every process."""
    n = jax.device_count()
    if n % tp:
        raise ValueError(f"tp={tp} must divide global device count {n}")
    mesh = create_mesh((n // tp, tp))
    return mesh, n // tp


def is_primary() -> bool:
    """True on exactly one process per job — gate logging/checkpoint writes."""
    return jax.process_index() == 0


def local_shard(batch: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """This process's contiguous rows of a (replicated) global host batch.

    Single-host data pipelines produce the full batch on every process; the
    global-array constructor wants only the local portion. Rows must divide
    evenly across processes (the Trainer's mesh-divisibility check already
    guarantees this for its batch sizes).
    """
    n = jax.process_count()
    if n == 1:
        return batch
    idx = jax.process_index()
    out = {}
    for key, value in batch.items():
        if value.shape[0] % n:
            raise ValueError(
                f"batch axis {value.shape[0]} of '{key}' must be divisible "
                f"by process count {n}")
        per = value.shape[0] // n
        out[key] = value[idx * per:(idx + 1) * per]
    return out


def global_batch(mesh: "jax.sharding.Mesh",
                 local: Dict[str, np.ndarray]) -> Dict[str, jax.Array]:
    """Assemble per-process local batches into global jax.Arrays sharded
    along the mesh "data" axis (jax.make_array_from_process_local_data — the
    standard multi-process input recipe). `local` holds only this process's
    rows; the global batch axis is the concatenation across processes."""
    sharding = batch_sharding(mesh)
    return {k: jax.make_array_from_process_local_data(sharding, v)
            for k, v in local.items()}
