"""PAED (edge-aware / signed-distance-field) losses.

TPU-native reimplementation of the reference's PAED loss family
(reference model/PAED/classes.py):

- ``paed_loss_soft``            — Sobel-edge × exterior-SDF penalty minus
  interior-SDF occupancy reward (classes.py:623-661).
- ``paed_binary_total_loss``    — the live training composite
  BCE + 0.1·dice + 5.0·|paed_soft| (classes.py:679-681).
- ``paed_loss_multiclass_soft`` — Gaussian-smoothed one-hot difference with
  wrong-class penalty (classes.py:336-369). The 19×19 Gaussian (σ=3) is an
  exact outer product, so it is applied as two 1-D depthwise convolutions —
  identical math, ~10× fewer VPU ops than the reference's 2-D conv.
- ``paed_loss_hard``            — the historical skeleton×SDF variant
  (classes.py:550-577), host-side like the reference (whose skeletonize
  round-trips through numpy/skimage, reference model/PAED/segmentation.py:102-109).

Array layout is NHWC throughout ((B, H, W, 1) predictions, (B, H, W) SDFs).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp
from jax import lax

from visiontransformer_tpu.losses.basic import binary_cross_entropy, dice_loss
from visiontransformer_tpu.ops.resize import resize_bilinear

# numpy, not jnp: a module-level jnp.array would initialize the XLA backend
# at import time, breaking jax.distributed.initialize() for multi-host users
# who (correctly) import the package before joining the job.
_SOBEL_X = np.array([[1.0, 0.0, -1.0],
                     [2.0, 0.0, -2.0],
                     [1.0, 0.0, -1.0]], dtype=np.float32)


def _conv2d_single(x: jnp.ndarray, kernel2d: jnp.ndarray,
                   padding: int) -> jnp.ndarray:
    """(B, H, W, 1) ⊛ (kh, kw) cross-correlation with zero padding — torch
    F.conv2d semantics (XLA convs are cross-correlations too)."""
    k = kernel2d[:, :, None, None]  # HWIO
    return lax.conv_general_dilated(
        x, k, window_strides=(1, 1),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def paed_loss_soft(gt_sdf_ext: jnp.ndarray, gt_sdf_int: jnp.ndarray,
                   preds: jnp.ndarray) -> jnp.ndarray:
    """Soft PAED loss (reference model/PAED/classes.py:623-661).

    preds: (B, H, W, 1) probabilities in [0,1].
    gt_sdf_ext / gt_sdf_int: (B, Hs, Ws) normalized SDFs (resized here with
    bilinear align_corners=False, as the reference does at :635-636).
    """
    preds = preds.astype(jnp.float32)
    b, h, w, _ = preds.shape

    sdf_ext = resize_bilinear(gt_sdf_ext.astype(jnp.float32), (h, w))[..., None]
    sdf_int = resize_bilinear(gt_sdf_int.astype(jnp.float32), (h, w))[..., None]

    grad_x = _conv2d_single(preds, jnp.asarray(_SOBEL_X), padding=1)
    grad_y = _conv2d_single(preds, jnp.asarray(_SOBEL_X.T), padding=1)
    edge_map = jnp.sqrt(grad_x ** 2 + grad_y ** 2 + 1e-6)

    max_per_image = jnp.max(edge_map.reshape(b, -1), axis=1).reshape(b, 1, 1, 1)
    edge_map = edge_map / (max_per_image + 1e-6)

    external_term = jnp.mean(sdf_ext * edge_map)
    internal_term = jnp.mean(sdf_int * preds)
    return 1.0 * external_term - 0.5 * internal_term


def paed_binary_total_loss(preds: jnp.ndarray, masks: jnp.ndarray,
                           sdf_ext: jnp.ndarray, sdf_int: jnp.ndarray):
    """Training composite: BCE + 0.1·dice + 5.0·|paed|
    (reference model/PAED/classes.py:679-681). Returns (total, parts dict)."""
    paed = paed_loss_soft(sdf_ext, sdf_int, preds)
    bce = binary_cross_entropy(preds, masks)
    dce = dice_loss(preds, masks)
    total = bce + 0.1 * dce + 5.0 * jnp.abs(paed)
    return total, {"bce": bce, "dice": dce, "paed": paed}


def _gauss_1d(sigma: float) -> jnp.ndarray:
    size = int(6 * sigma + 1)
    x = jnp.arange(size, dtype=jnp.float32) - size // 2
    g = jnp.exp(-(x ** 2) / (2.0 * sigma ** 2))
    return g, size


def _depthwise_blur(x: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Separable Gaussian blur of (B, H, W, C), exactly equal to the
    reference's normalized 2-D kernel conv (outer(g,g)/sum(outer) factorizes
    as (g/sum g) ⊗ (g/sum g))."""
    g, size = _gauss_1d(sigma)
    g = g / jnp.sum(g)
    pad = size // 2
    c = x.shape[-1]
    kh = jnp.tile(g.reshape(size, 1, 1, 1), (1, 1, 1, c))  # HWIO, I=1 (depthwise)
    kw = jnp.tile(g.reshape(1, size, 1, 1), (1, 1, 1, c))
    x = lax.conv_general_dilated(
        x, kh, (1, 1), [(pad, pad), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)
    x = lax.conv_general_dilated(
        x, kw, (1, 1), [(0, 0), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)
    return x


def paed_loss_multiclass_soft(msk: jnp.ndarray, pred_mask: jnp.ndarray,
                              sigma: float = 3.0,
                              class_penalty: bool = True) -> jnp.ndarray:
    """Multiclass soft PAED (reference model/PAED/classes.py:336-369).

    msk: (B, H, W, C) one-hot ground truth; pred_mask: (B, H, W, C) softmax
    probabilities (NHWC — the reference uses NCHW).
    """
    msk = msk.astype(jnp.float32)
    pred_mask = pred_mask.astype(jnp.float32)

    msk_smooth = _depthwise_blur(msk, sigma)
    pred_smooth = _depthwise_blur(pred_mask, sigma)
    base_loss = jnp.abs(msk_smooth - pred_smooth)

    if class_penalty:
        class_mismatch = msk * (1.0 - pred_mask)
        penalty_map = class_mismatch * base_loss * 2.0
        dist = jnp.mean(penalty_map, axis=(1, 2))  # (B, C) spatial mean
    else:
        dist = jnp.mean(base_loss, axis=(1, 2))

    return jnp.mean(jnp.mean(dist, axis=1))


def paed_loss_hard(pred_probs: np.ndarray, sdf_ext: np.ndarray,
                   sdf_int: np.ndarray, threshold: float = 0.5) -> float:
    """Hard skeleton×SDF PAED (reference model/PAED/classes.py:550-577).

    Host-side (numpy): the reference's own implementation detaches and
    round-trips through skimage per image, so there is nothing to
    differentiate. pred_probs: (B, H, W); sdf_*: (B, Hs, Ws).
    """
    from visiontransformer_tpu import native

    b = pred_probs.shape[0]
    h, w = pred_probs.shape[1:3]
    total = 0.0
    for i in range(b):
        pred_bin = (pred_probs[i] > threshold).astype(np.float32)
        skel = native.skeletonize(pred_bin > 0.5).astype(np.float32)
        ext = np.asarray(resize_bilinear(jnp.asarray(sdf_ext[i]), (h, w)))
        interior = np.asarray(resize_bilinear(jnp.asarray(sdf_int[i]), (h, w)))
        total += float(np.sum(ext * skel - interior * pred_bin))
    return total / b
