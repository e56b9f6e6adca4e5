"""Resize→normalize→patchify→patch-embed folded into one contraction.

The reference-parity serving pipeline for a 512² mask request computes, per
batch (reference model/CE/testViTModel.py:92-97 resizes every input to 224
before the backbone; torchvision ToTensor + ImageNet Normalize):

    raw 512² → bilinear resize 224² → (x − mean)/std → patchify(16) → @ Wp

Every step is linear (the normalize is affine), so the whole chain composes
OFFLINE into weights applied directly to the raw image:

- the resize is separable: ``R224 = Wh · X · Wwᵀ`` per channel with the
  align_corners=False interpolation matrices (ops/resize.py:bilinear_matrix);
- the row stage stays a clean matmul (contraction over the major H axis with
  the (W·C) minor dims — MXU-friendly as-is);
- the column stage, the normalize, and the patch-embed projection fold into
  one per-column-patch kernel ``K``: output patch column pc only reads input
  columns [v0(pc), v0(pc)+DV), so
      K[pc][(ph, v', c), j] = Σ_pw Ww[16·pc+pw, v0+v'] · Wp[(ph,pw,c), j]/std[c]
  and the embedding becomes a single gather + batched matmul
      tokens[b, pr, pc, j] = Σ_k windows[b, pr, pc, k] · K[pc][k, j] + b'
  with the normalize's mean folded into the bias
  (b'_j = bias_j − Σ Wp[(·,·,c),j]·mean[c]/std[c]).

What this buys on v5e: the separate resize program's intermediate writes and
the normalize's elementwise pass disappear — the raw image is read once and
the next materialization is already the (B, N, hidden) token matrix. The
arithmetic is algebraically identical to the unfused chain; floating-point
association differs (the fold is computed in float64 offline, the fused
contraction runs in the compute dtype), measured argmax-equivalent on the
parity pipeline (scripts/fuse_preproc_ab.py).

``input_scale`` folds a uint8→[0,1] conversion (the serving worker ships
uint8 over the tunnel, serve/worker.py) into the row matrix for free.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

import jax.numpy as jnp

from visiontransformer_tpu.ops.resize import bilinear_matrix


def _fold_constants(patch_embed: dict, *, patch_size: int, in_size: int,
                    compute_size: int, mean, std, input_scale: float):
    """float64/32 offline composition. Returns numpy arrays:
    wh (compute, in), vidx (gp, DV) int32, K (gp, p·DV·C, hidden),
    bias (hidden,)."""
    if compute_size % patch_size:
        raise ValueError(f"{compute_size=} not divisible by {patch_size=}")
    gp = compute_size // patch_size  # patches per side
    wp = np.asarray(patch_embed["kernel"], np.float64)  # (p*p*C, hidden)
    hidden = wp.shape[1]
    n_ch = wp.shape[0] // (patch_size * patch_size)
    wp4 = wp.reshape(patch_size, patch_size, n_ch, hidden)  # (ph, pw, c, j)

    mean = np.asarray(mean, np.float64).reshape(n_ch)
    std = np.asarray(std, np.float64).reshape(n_ch)

    # Normalize folds into the projection: W' = Wp/std, bias' absorbs −mean/std.
    wp4 = wp4 / std[None, None, :, None]
    bias = np.zeros(hidden, np.float64)
    if "bias" in patch_embed:
        bias = bias + np.asarray(patch_embed["bias"], np.float64)
    bias = bias - np.einsum("hwcj,c->j", wp4, mean)

    wh = bilinear_matrix(compute_size, in_size).astype(np.float64) * input_scale
    ww = bilinear_matrix(compute_size, in_size).astype(np.float64)

    # Column support per output patch column: rows 16·pc..16·pc+15 of ww.
    supports = []
    for pc in range(gp):
        rows = ww[pc * patch_size:(pc + 1) * patch_size]
        nz = np.nonzero(rows.sum(axis=0) != 0.0)[0]
        supports.append((int(nz.min()), int(nz.max())))
    dv = max(hi - lo + 1 for lo, hi in supports)
    v0 = np.array([min(lo, in_size - dv) for lo, _ in supports], np.int32)

    k_mats = np.zeros((gp, patch_size * dv * n_ch, hidden), np.float32)
    for pc in range(gp):
        seg = ww[pc * patch_size:(pc + 1) * patch_size,
                 v0[pc]:v0[pc] + dv]                      # (pw, v')
        k = np.einsum("pv,hpcj->hvcj", seg, wp4)          # (ph, v', c, j)
        k_mats[pc] = k.reshape(-1, hidden).astype(np.float32)

    vidx = v0[:, None] + np.arange(dv, dtype=np.int32)[None, :]
    return wh.astype(np.float32), vidx, k_mats, bias.astype(np.float32)


def build_fused_embed(patch_embed: dict, *, patch_size: int, in_size: int,
                      compute_size: int, mean, std,
                      input_scale: float = 1.0) -> dict:
    """Precompute the fused resize+normalize+embed constants for
    ``fused_resize_embed``. ``patch_embed`` is the backbone's patch-embed
    linear params ({"kernel": (p²C, hidden), "bias"}), ``in_size`` the raw
    input side (e.g. 512), ``compute_size`` the backbone resolution (224)."""
    wh, vidx, k_mats, bias = _fold_constants(
        patch_embed, patch_size=patch_size, in_size=in_size,
        compute_size=compute_size, mean=mean, std=std,
        input_scale=input_scale)
    return {
        "wh": jnp.asarray(wh),            # (compute, in)
        "vidx": jnp.asarray(vidx),        # (gp, DV)
        "k": jnp.asarray(k_mats),         # (gp, p·DV·C, hidden)
        "bias": jnp.asarray(bias),        # (hidden,)
        "patch_size": patch_size,
        "compute_size": compute_size,
    }


def fused_resize_embed(consts: dict, raw: jnp.ndarray,
                       dtype=jnp.bfloat16) -> jnp.ndarray:
    """(B, in, in, C) raw images (any dtype; uint8 if input_scale folded the
    /255) -> (B, N, hidden) patch embeddings, equal to
    linear(patch_embed, patchify(normalize(resize(raw)))) up to fp
    association. Two contractions total: the row resize and the fused
    column-resize+normalize+projection."""
    p = consts["patch_size"]
    gp = consts["compute_size"] // p
    b, in_h, in_w, c = raw.shape
    dv = consts["vidx"].shape[1]

    # Row stage: (compute, in) × (B, in, in·C) — contraction over the major
    # axis, minor dims (in·C) stay MXU/lane-friendly.
    x = raw.astype(dtype)
    y = jnp.einsum("Hh,bhm->bHm", consts["wh"].astype(dtype),
                   x.reshape(b, in_h, in_w * c))
    y = y.reshape(b, gp, p, in_w, c)

    # Column windows: (B, gp, p, in, C) -> (B, gp_r, gp_c, p, DV, C).
    w = jnp.take(y, consts["vidx"], axis=3)    # (b, gp, p, gp_c, DV, c)
    w = w.transpose(0, 1, 3, 2, 4, 5)          # (b, pr, pc, ph, v', c)
    w = w.reshape(b, gp, gp, p * dv * c)

    # Fused column-resize + normalize + patch-embed, grouped by pc phase.
    tokens = jnp.einsum("brpk,pkj->brpj", w, consts["k"].astype(dtype))
    tokens = tokens + consts["bias"].astype(dtype)
    return tokens.reshape(b, gp * gp, -1)
