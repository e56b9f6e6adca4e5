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


def _place_like(target_leaf, raw_leaf):
    """Give a freshly-restored array the target leaf's dtype and placement
    (checkpoints restored onto a mesh must land sharded, not replicated)."""
    import jax

    arr = np.asarray(raw_leaf)
    target_shape = getattr(target_leaf, "shape", arr.shape)
    if tuple(arr.shape) != tuple(target_shape):
        # Same tree structure, different tensor shapes — e.g. resuming a
        # 5-class run from a 17-class checkpoint. Orbax's strict path
        # raised on this; the partial path must not silently accept it.
        raise ValueError(
            f"checkpoint leaf shape {tuple(arr.shape)} does not match the "
            f"target's {tuple(target_shape)} — the checkpoint was written "
            "by a different model configuration")
    if hasattr(target_leaf, "dtype"):
        arr = arr.astype(target_leaf.dtype)
    if isinstance(target_leaf, jax.Array):
        return jax.device_put(arr, target_leaf.sharding)
    return arr


def restore_checkpoint(path: str, target: Optional[Any] = None, *,
                       partial: bool = True) -> Any:
    """Restore a checkpoint onto ``target``.

    Orbax's StandardCheckpointer demands an exact structure match; with
    ``partial=True`` (default) dict-rooted targets are instead intersected
    with the on-disk tree at the top level: keys present on disk are
    restored (placed like the target's leaves), keys absent on disk keep the
    target's values. This lets new code that checkpoints
    {params, opt_state, step} load older params-only checkpoints and vice
    versa (the reference's Lightning resume is similarly tolerant of
    strict=False loads)."""
    import jax

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        if target is None:
            return ckptr.restore(path)
        try:
            return ckptr.restore(path, target)
        except ValueError:
            if not (partial and isinstance(target, dict)):
                raise
            raw = ckptr.restore(path)
    if not isinstance(raw, dict):
        raise ValueError(
            f"checkpoint at {path} is not a dict-rooted tree; cannot "
            "partially restore onto the given target")
    out = {}
    for key, tval in target.items():
        if key in raw:
            try:
                out[key] = jax.tree.map(_place_like, tval, raw[key])
            except (TypeError, ValueError):
                if key == "params":
                    raise  # param-structure mismatch is never recoverable
                out[key] = tval  # e.g. opt_state from a different optimizer
        else:
            out[key] = tval
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
