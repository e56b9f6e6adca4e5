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

import orbax.checkpoint as ocp


def _ckpt_name(epoch: int, step: int) -> str:
    return f"epoch={epoch}-step={step}"


def save_checkpoint(directory: str, tree: Any, *, epoch: int, step: int) -> str:
    path = os.path.abspath(os.path.join(directory, _ckpt_name(epoch, step)))
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, tree)
    return path


def restore_checkpoint(path: str, target: Optional[Any] = None) -> Any:
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(os.path.abspath(path), target)


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
