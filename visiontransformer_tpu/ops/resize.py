"""Image/tensor resize ops with the reference's exact index semantics.

The reference mixes three different resamplers whose coordinate conventions
all differ; reproducing masks bit-for-bit requires implementing each:

- ``resize_bilinear``       — torch ``F.interpolate(mode='bilinear',
  align_corners=False)`` (reference model/CE/classes.py:260 upsamples logits
  this way). Half-pixel centers: src = (dst + 0.5) * in/out - 0.5, edge-clamped.
- ``resize_nearest_torch``  — torch ``F.interpolate(mode='nearest')``
  (reference model/CE/classes.py:273-274 resizes the target). Asymmetric:
  src = floor(dst * in/out).
- ``resize_nearest_pil``    — PIL ``Image.resize(..., NEAREST)`` (reference
  model/CE/classes.py:77 resizes masks on load; model/CE/datasetTestViTmodel.py:191).
  Pixel centers: src = floor((dst + 0.5) * in/out), clamped.

All are pure gathers / weighted gathers — XLA fuses them into surrounding
computation; no host round-trips.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp


def _nearest_indices_torch(out_size: int, in_size: int) -> jnp.ndarray:
    # Sizes are static → indices are compile-time constants; fp64 numpy
    # avoids fp32 boundary errors at exact-integer source coordinates.
    scale = in_size / out_size
    idx = np.floor(np.arange(out_size, dtype=np.float64) * scale).astype(np.int32)
    return jnp.asarray(np.clip(idx, 0, in_size - 1))


def _nearest_indices_pil(out_size: int, in_size: int) -> jnp.ndarray:
    # PIL's NEAREST (affine path, Pillow Geometry.c) truncates a source
    # coordinate that starts at scale/2 and is advanced by repeated `+= scale`
    # in double precision — the per-step rounding drift is observable at
    # exact-integer boundaries, so the accumulation is replicated literally
    # (verified bit-exact against PIL 'L'-mode resize for many ratios).
    scale = in_size / out_size
    xo = scale * 0.5
    idx = np.empty(out_size, dtype=np.int32)
    for i in range(out_size):
        idx[i] = int(xo)
        xo += scale
    return jnp.asarray(np.clip(idx, 0, in_size - 1))


def _gather_hw(x: jnp.ndarray, rows: jnp.ndarray, cols: jnp.ndarray,
               h_axis: int, w_axis: int) -> jnp.ndarray:
    x = jnp.take(x, rows, axis=h_axis)
    return jnp.take(x, cols, axis=w_axis)


def resize_nearest_torch(x: jnp.ndarray, size: Tuple[int, int],
                         h_axis: int = -2, w_axis: int = -1) -> jnp.ndarray:
    """torch F.interpolate(mode='nearest') semantics (floor(i * scale))."""
    h_axis = h_axis % x.ndim
    w_axis = w_axis % x.ndim
    rows = _nearest_indices_torch(size[0], x.shape[h_axis])
    cols = _nearest_indices_torch(size[1], x.shape[w_axis])
    return _gather_hw(x, rows, cols, h_axis, w_axis)


def resize_nearest_pil(x: jnp.ndarray, size: Tuple[int, int],
                       h_axis: int = -2, w_axis: int = -1) -> jnp.ndarray:
    """PIL Image.resize(NEAREST) semantics (floor((i + 0.5) * scale))."""
    h_axis = h_axis % x.ndim
    w_axis = w_axis % x.ndim
    rows = _nearest_indices_pil(size[0], x.shape[h_axis])
    cols = _nearest_indices_pil(size[1], x.shape[w_axis])
    return _gather_hw(x, rows, cols, h_axis, w_axis)


def _linear_weights(out_size: int, in_size: int):
    """Half-pixel (align_corners=False) source coordinates and lerp weights."""
    scale = in_size / out_size
    src = (jnp.arange(out_size) + 0.5) * scale - 0.5
    src = jnp.clip(src, 0.0, in_size - 1)
    lo = jnp.floor(src).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, in_size - 1)
    w_hi = (src - lo).astype(jnp.float32)
    return lo, hi, w_hi


def bilinear_matrix(out_size: int, in_size: int) -> np.ndarray:
    """Dense (out, in) interpolation matrix for align_corners=False bilinear.

    Each row has (at most) two non-zeros — the lerp weights of
    ``_linear_weights``. Materializing it densely turns the upsample into a
    matmul, which is the MXU-native formulation: the gather-based path leaves
    the channel axis (e.g. 17 classes) in the minor dim where it pads to the
    128-lane tile and runs ~14× slower (measured on v5e, see
    docs/PERFORMANCE.md). Same align_corners=False weights, but NOT
    bit-identical to ``resize_bilinear``: the coordinates here are computed
    in float64 and the matmul accumulates w_lo·x_lo + w_hi·x_hi where the
    gather path evaluates top + w·(bot − top) — 1-ulp rounding differences
    that can flip argmax at exact logit near-ties (README "intentional
    divergences"; ``resize_bilinear`` remains the bit-exact-to-torch path).
    """
    scale = in_size / out_size
    src = (np.arange(out_size, dtype=np.float64) + 0.5) * scale - 0.5
    src = np.clip(src, 0.0, in_size - 1)
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, in_size - 1)
    w_hi = (src - lo).astype(np.float32)
    mat = np.zeros((out_size, in_size), np.float32)
    mat[np.arange(out_size), lo] += 1.0 - w_hi
    mat[np.arange(out_size), hi] += w_hi
    return mat


def resize_bilinear_mm(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """Bilinear upsample of (B, h, w, C) via two interpolation-matrix
    matmuls — same align_corners=False semantics as ``resize_bilinear``,
    restructured for the MXU (used by the seg-head hot path)."""
    out_h, out_w = size
    in_h, in_w = x.shape[1], x.shape[2]
    wh = jnp.asarray(bilinear_matrix(out_h, in_h))
    ww = jnp.asarray(bilinear_matrix(out_w, in_w))
    x = x.astype(jnp.float32)
    # (H, h) × (B, h, w, C) -> (B, H, w, C); then (W, w) × ... -> (B, H, W, C)
    x = jnp.einsum("Hh,bhwc->bHwc", wh, x)
    return jnp.einsum("Ww,bHwc->bHWc", ww, x)


def resize_bilinear(x: jnp.ndarray, size: Tuple[int, int],
                    h_axis: int = -2, w_axis: int = -1) -> jnp.ndarray:
    """Bilinear resize, align_corners=False, matching torch F.interpolate.

    Implemented as two separable 1-D lerps (gather + fma), which XLA vectorizes
    on the VPU and fuses with producers/consumers.
    """
    h_axis = h_axis % x.ndim
    w_axis = w_axis % x.ndim
    in_h, in_w = x.shape[h_axis], x.shape[w_axis]
    out_h, out_w = size

    orig_dtype = x.dtype
    x = x.astype(jnp.float32)

    r_lo, r_hi, r_w = _linear_weights(out_h, in_h)
    c_lo, c_hi, c_w = _linear_weights(out_w, in_w)

    def expand(w, axis):
        shape = [1] * x.ndim
        shape[axis] = w.shape[0]
        return w.reshape(shape)

    top = jnp.take(x, r_lo, axis=h_axis)
    bot = jnp.take(x, r_hi, axis=h_axis)
    x = top + expand(r_w, h_axis) * (bot - top)

    left = jnp.take(x, c_lo, axis=w_axis)
    right = jnp.take(x, c_hi, axis=w_axis)
    x = left + expand(c_w, w_axis) * (right - left)

    if jnp.issubdtype(orig_dtype, jnp.floating):
        return x.astype(orig_dtype)
    return x
