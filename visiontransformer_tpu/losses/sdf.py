"""Signed-distance-field targets for the PAED loss.

Matches `compute_sdf` (reference model/PAED/segmentation.py:6-34): exterior
EDT (background→boundary) and interior EDT (foreground→boundary), each
max-normalized to [0, 1]. Unlike the reference (scipy on host, per dataloader
worker), this is jit/vmap-able XLA (see ops/edt.py) and runs on-device.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from visiontransformer_tpu.ops.edt import edt


def compute_sdf(mask: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """mask: (H, W) binary. Returns (sdf_ext, sdf_int), float32 in [0, 1]."""
    mask = mask.astype(bool)
    sdf_ext = edt(~mask)
    sdf_int = edt(mask)

    def _norm(x):
        m = jnp.max(x)
        return jnp.where(m > 0, x / jnp.maximum(m, 1e-30), x)

    return _norm(sdf_ext), _norm(sdf_int)


compute_sdf_batch = jax.vmap(compute_sdf)
