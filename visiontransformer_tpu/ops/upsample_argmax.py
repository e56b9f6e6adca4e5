"""Fused bilinear-upsample + argmax Pallas kernel (the seg-head epilogue).

The serving path ends with "bilinear-upsample logits to the output size,
then argmax" (reference model/CE/classes.py:260 + testViTModel.py:126). Done
as two XLA interpolation matmuls (ops/resize.resize_bilinear_mm) the W-stage
materializes the full (B, H, W, C) fp32 logits in HBM — ~285 MB per batch-16
at 512²×17 — only for argmax to immediately reduce it to (B, H, W) uint8.
Measured at 2.9 ms/batch-16 on v5e, pure HBM round-trip.

This kernel keeps the upsampled tile in VMEM: the cheap H-stage matmul stays
in XLA (its output is (B, H, w, C) — small), and each grid step computes the
W-stage interpolation matmul for one (batch, H-tile) block on the MXU, then
argmaxes over classes on the VPU and writes only the (hb, W) int32 indices.
HBM traffic drops from ~2·B·H·W·C·4 bytes to B·H·(w·C·4 + W·4).

Measured outcome (scripts/bench_preproc.py, v5e, batch 32, 14²→512²×17):
XLA's mm+argmax runs 1.74 ms — it already keeps the W-stage fused with the
argmax — while this kernel runs 3.27 ms (the (hb, C, W) class reduction
relayouts dominate). The XLA epilogue is therefore the default everywhere
(models/vitseg.py:vitseg_predict); this kernel is kept as the measured
alternative and as the template for wider-C heads where the fp32
intermediate actually exceeds HBM budget.

Semantics match ``argmax(resize_bilinear_mm(x, size), -1)`` — same
align_corners=False weights, fp32 accumulation, first-index tie-breaking —
up to 1-ulp contraction-order differences that can flip near-exact logit
ties (same caveat as resize_bilinear_mm vs the gather path, README
"intentional divergences").
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from visiontransformer_tpu.ops.resize import bilinear_matrix


def _pick_tile(total: int, target: int) -> int:
    """Largest divisor of ``total`` that is ≤ target (grid must tile H)."""
    for cand in range(min(target, total), 0, -1):
        if total % cand == 0:
            return cand
    return 1


def _kernel(y_ref, wwt_ref, out_ref, *, hb: int, n_classes: int):
    # y_ref: (1, hb*C, w) fp32 — H-upsampled logits, classes-major layout.
    # wwt_ref: (w, W) fp32 — transposed W-interpolation matrix.
    # out_ref: (1, hb, W) int32 — argmax class indices.
    z = jax.lax.dot_general(
        y_ref[0], wwt_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)          # (hb*C, W)
    w_out = z.shape[-1]
    z = z.reshape(hb, n_classes, w_out)               # minor dim intact
    m = jnp.max(z, axis=1, keepdims=True)             # (hb, 1, W)
    # Mosaic requires integer iota; cast to f32 for the select+min below.
    ci = jax.lax.broadcasted_iota(jnp.int32, z.shape, 1).astype(jnp.float32)
    # First-max-wins: among maximal classes take the smallest index.
    idx = jnp.min(jnp.where(z >= m, ci, jnp.float32(n_classes)), axis=1)
    out_ref[0] = idx.astype(jnp.int32)


@partial(jax.jit, static_argnames=("size", "interpret"))
def upsample_argmax(x: jnp.ndarray, size: Tuple[int, int], *,
                    interpret: bool = False) -> jnp.ndarray:
    """(B, h, w, C) fp32 logits → (B, H, W) int32 argmax class map.

    Equivalent to ``jnp.argmax(resize_bilinear_mm(x, size), axis=-1)`` with
    the (B, H, W, C) intermediate never leaving VMEM.
    """
    out_h, out_w = size
    b, in_h, in_w, c = x.shape
    wh = jnp.asarray(bilinear_matrix(out_h, in_h))
    wwt = jnp.asarray(bilinear_matrix(out_w, in_w).T)  # (w, W)

    x = x.astype(jnp.float32)
    # H-stage in XLA: output is small ((B, H, w, C)); then classes-major
    # (B, H, C, w) → (B, H*C, w) so the kernel's matmul output keeps W in
    # the lane dimension and the class reduce only splits sublanes.
    y = jnp.einsum("Hh,bhwc->bHwc", wh, x)
    y = y.transpose(0, 1, 3, 2).reshape(b, out_h * c, in_w)

    hb = _pick_tile(out_h, 64)
    grid = (b, out_h // hb)
    return pl.pallas_call(
        partial(_kernel, hb=hb, n_classes=c),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, hb * c, in_w), lambda i, t: (i, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((in_w, out_w), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hb, out_w), lambda i, t: (i, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, out_h, out_w), jnp.int32),
        interpret=interpret,
    )(y, wwt)
