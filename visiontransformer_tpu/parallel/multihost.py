"""Multi-host (DCN) scale-out helpers.

The reference has no distributed training at all (SURVEY.md §2.6); this
framework scales intra-pod over ICI via the ("data","model") mesh
(parallel/mesh.py). For multi-host pods the standard JAX recipe applies and
is wrapped here: jax.distributed.initialize() + a mesh whose outer data axis
spans hosts (gradient all-reduce rides DCN between hosts, ICI within).

Not exercisable in this single-host environment; dry-run-validated on the
virtual CPU mesh via __graft_entry__.dryrun_multichip.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax

from visiontransformer_tpu.parallel.mesh import create_mesh


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
