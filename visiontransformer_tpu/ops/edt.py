"""Exact Euclidean distance transform in pure XLA.

The reference computes two `scipy.ndimage.distance_transform_edt` calls per
sample inside dataloader worker processes (reference model/PAED/classes.py:69,
model/PAED/segmentation.py:22-25) — a per-sample host CPU cost. Here the EDT
is a fully vectorized two-pass separable min-plus reduction (Meijster/
Felzenszwalb decomposition) that jits, vmaps over the batch, and runs on
TPU, so SDF targets can be produced on-device inside the input pipeline.

Pass 1: per column, L1 distance to the nearest zero within that column
        (min-plus against |i−k| with +BIG at non-zero sites).
Pass 2: per row, D²(i,j) = min_k (G(i,k)² + (j−k)²) — another min-plus.

Both passes are dense (H·H·W and H·W·W element reductions): at 224² that is
~11M lane-parallel ops on the VPU, far cheaper than a host round-trip, and the
result is *exact* (identical to scipy within fp32).
"""

from __future__ import annotations

import jax.numpy as jnp

_BIG = 1.0e6  # larger than any image-diagonal distance, small enough to square


def edt(mask: jnp.ndarray) -> jnp.ndarray:
    """Distance from each nonzero pixel of `mask` to the nearest zero pixel
    (zero pixels get 0) — semantics of scipy.ndimage.distance_transform_edt.

    mask: (H, W) bool/int. Returns (H, W) float32. If `mask` has no zero
    pixels at all the result saturates at _BIG (scipy returns an
    all-large-finite hypot in that degenerate case; callers normalize by the
    max, reference model/PAED/segmentation.py:28-32, so this never matters).
    """
    mask = mask.astype(bool)
    h, w = mask.shape

    # Pass 1 — per-column distance to nearest zero in the same column.
    rows = jnp.arange(h, dtype=jnp.float32)
    abs_diff = jnp.abs(rows[:, None] - rows[None, :])  # (H, H): |i - k|
    col_cost = jnp.where(mask, _BIG, 0.0)  # (H, W): 0 at zeros of mask
    # G[i, j] = min_k |i - k| + cost[k, j]
    g = jnp.min(abs_diff[:, :, None] + col_cost[None, :, :], axis=1)  # (H, W)

    # Pass 2 — per-row parabolic envelope: D²[i,j] = min_k G[i,k]² + (j-k)².
    cols = jnp.arange(w, dtype=jnp.float32)
    sq_diff = jnp.square(cols[:, None] - cols[None, :])  # (W, W): (j-k)²
    g2 = jnp.square(g)
    d2 = jnp.min(g2[:, :, None] + sq_diff[None, :, :], axis=1)  # (H, W)

    return jnp.sqrt(d2)
