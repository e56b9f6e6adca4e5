"""Orbax checkpointing with the reference's naming convention.

Write cadence and layout mirror Lightning's ModelCheckpoint
(`epoch=N-step=M.ckpt` filenames, reference model/CE/trainCurrentViTmodel.py:69;
"latest" selection parses the epoch number out of the name, reference
model/CE/datasetTestViTmodel.py:38-54) — but the payload is an Orbax-saved
JAX pytree (params + optimizer state + step), which restores directly onto a
sharded mesh.
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional

import numpy as np

import orbax.checkpoint as ocp


def _ckpt_name(epoch: int, step: int) -> str:
    return f"epoch={epoch}-step={step}"


def save_checkpoint(directory: str, tree: Any, *, epoch: int, step: int) -> str:
    path = os.path.abspath(os.path.join(directory, _ckpt_name(epoch, step)))
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, tree)
    return path


def _abstract_like(leaf):
    """ShapeDtypeStruct carrying the target leaf's shape/dtype/sharding —
    the form Orbax restores DIRECTLY onto (each device reads only its own
    shard from disk; no leaf is ever fully materialized on host)."""
    import jax

    if isinstance(leaf, jax.Array):
        return jax.ShapeDtypeStruct(leaf.shape, leaf.dtype,
                                    sharding=leaf.sharding)
    arr = np.asarray(leaf)
    return jax.ShapeDtypeStruct(arr.shape, arr.dtype)


def _disk_keys(path: str):
    """Top-level keys of the on-disk pytree, from metadata only (no reads)."""
    with ocp.StandardCheckpointer() as ckptr:
        meta = ckptr.metadata(path).item_metadata
    return list(meta.keys())


def restore_checkpoint(path: str, target: Optional[Any] = None, *,
                       partial: bool = True) -> Any:
    """Restore a checkpoint onto ``target``.

    Every restore is shard-aware: target leaves' shardings are forwarded to
    Orbax as abstract arrays, so under an FSDP/tensor-parallel mesh each
    device reads only its own shard from the zarr store — no leaf is ever
    fully replicated on host (tests/test_resume_optstate.py asserts this
    under an 8-device mesh).

    Orbax's strict path demands an exact structure match; with
    ``partial=True`` (default) dict-rooted targets are instead intersected
    with the on-disk tree at the top level: keys present on disk are
    restored (to the target leaves' shardings/dtypes), keys absent on disk
    keep the target's values. This lets new code that checkpoints
    {params, opt_state, step} load older params-only checkpoints and vice
    versa (the reference's Lightning resume is similarly tolerant of
    strict=False loads)."""
    import jax

    path = os.path.abspath(path)
    if target is None:
        with ocp.StandardCheckpointer() as ckptr:
            return ckptr.restore(path)
    if not (partial and isinstance(target, dict)):
        with ocp.StandardCheckpointer() as ckptr:
            return ckptr.restore(path, target)

    on_disk = set(_disk_keys(path))
    out = {}
    with ocp.PyTreeCheckpointer() as ptc:
        for key, tval in target.items():
            if key not in on_disk:
                out[key] = tval  # e.g. step/opt_state missing on old saves
                continue
            abs_sub = {key: jax.tree.map(_abstract_like, tval)}
            try:
                restored = ptc.restore(path, args=ocp.args.PyTreeRestore(
                    item=abs_sub,
                    restore_args=ocp.checkpoint_utils.construct_restore_args(
                        abs_sub),
                    partial_restore=True))
                out[key] = restored[key]
            except (TypeError, ValueError) as e:
                if key == "params":
                    # Same tree structure, different tensor shapes — e.g.
                    # resuming a 5-class run from a 17-class checkpoint.
                    # Param mismatch is never recoverable.
                    raise ValueError(
                        f"checkpoint at {path} does not match the target "
                        "model's parameter structure/shapes — it was "
                        f"written by a different model configuration ({e})"
                    ) from e
                out[key] = tval  # e.g. opt_state from a different optimizer
    return out


def get_latest_checkpoint(directory: str) -> Optional[str]:
    """Highest-epoch checkpoint in `directory`, by filename convention
    (the reference's selection rule, datasetTestViTmodel.py:50)."""
    if not os.path.isdir(directory):
        return None
    best, best_epoch = None, -1
    for name in os.listdir(directory):
        m = re.match(r"epoch=(\d+)-step=(\d+)", name)
        if m and int(m.group(1)) > best_epoch:
            best_epoch = int(m.group(1))
            best = os.path.join(directory, name)
    return best


def parse_epoch(path: str) -> Optional[int]:
    m = re.search(r"epoch=(\d+)", os.path.basename(path))
    return int(m.group(1)) if m else None
