"""MAnet segmentation family (Multi-scale Attention Network).

Another alternate architecture behind the reference's generic
`StructuralDamageModel(arch, encoder_name, ...)` wrapper — its
`smp.create_model(arch, ...)` accepts any smp architecture string
(reference model/CE/classes.py:106-110); "manet" (this module) is one of
the archs this package implements natively (models/registry.py).

TPU-native design, same conventions as the other conv families: the
shared residual GroupNorm encoder (models/unet.py), NHWC layout,
XLA-lowered convs on the MXU. Decoder topology follows the MAnet paper
(Fan et al. 2020): a Position-wise Attention Block (PAB) on the deepest
features — full self-attention over the stride-16 positions (N = hw ≤ a
few hundred here, so the N×N softmax is two small MXU matmuls, the exact
workload TPUs are built for) — then a UNet-shaped upsample path whose
skip fusions are Multi-scale Fusion Attention Blocks (MFAB):
concat-and-conv followed by squeeze-excite channel attention, so each
scale reweights its own fused channels before the next upsample.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from visiontransformer_tpu.models.unet import (
    ENCODER_PRESETS,
    IMAGENET_MEAN,
    IMAGENET_STD,
    _block_apply,
    _block_init,
    encoder_apply,
    encoder_init,
)
from visiontransformer_tpu.nn.layers import conv2d, conv2d_init
from visiontransformer_tpu.ops.resize import resize_bilinear


@dataclasses.dataclass(frozen=True)
class MAnetConfig:
    encoder_name: str = "resnet34"
    in_channels: int = 3
    num_classes: int = 17
    decoder_channels: Tuple[int, ...] = (256, 128, 64, 32)
    pab_reduction: int = 8   # q/k width = C / pab_reduction in the PAB
    se_reduction: int = 16   # squeeze-excite bottleneck in the MFABs
    groups: int = 8  # GroupNorm groups
    compute_dtype: str = "float32"
    normalize: bool = True  # smp-style input normalization in forward

    @property
    def stage_channels(self) -> Sequence[int]:
        return ENCODER_PRESETS[self.encoder_name][0]

    @property
    def stage_blocks(self) -> Sequence[int]:
        return ENCODER_PRESETS[self.encoder_name][1]

    @property
    def dtype(self):
        return jnp.dtype(self.compute_dtype)


def _pab_init(keys, c: int, reduction: int) -> dict:
    cr = max(c // reduction, 8)
    return {
        "query": conv2d_init(next(keys), c, cr, 1),
        "key": conv2d_init(next(keys), c, cr, 1),
        "value": conv2d_init(next(keys), c, c, 1),
        "gamma": jnp.zeros((), jnp.float32),  # residual gate, starts closed
    }


def _pab_apply(pab: dict, x: jnp.ndarray) -> jnp.ndarray:
    """Position-wise attention over the stride-16 spatial grid:
    out = x + gamma * softmax(QKᵀ/√d) V, all positions attending to all."""
    b, h, w, c = x.shape
    q = conv2d(pab["query"], x).reshape(b, h * w, -1)
    k = conv2d(pab["key"], x).reshape(b, h * w, -1)
    v = conv2d(pab["value"], x).reshape(b, h * w, c)
    scale = 1.0 / jnp.sqrt(jnp.asarray(q.shape[-1], jnp.float32))
    logits = jnp.einsum("bnd,bmd->bnm", q, k) * scale.astype(q.dtype)
    attn = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(x.dtype)
    out = jnp.einsum("bnm,bmc->bnc", attn, v).reshape(b, h, w, c)
    return x + pab["gamma"].astype(x.dtype) * out


def _se_init(keys, c: int, reduction: int) -> dict:
    cr = max(c // reduction, 8)
    return {"squeeze": conv2d_init(next(keys), c, cr, 1),
            "excite": conv2d_init(next(keys), cr, c, 1)}


def _se_apply(se: dict, x: jnp.ndarray) -> jnp.ndarray:
    pooled = jnp.mean(x, axis=(1, 2), keepdims=True)
    g = jax.nn.relu(conv2d(se["squeeze"], pooled))
    g = jax.nn.sigmoid(conv2d(se["excite"], g))
    return x * g


def manet_init(key: jax.Array, cfg: MAnetConfig) -> dict:
    channels = list(cfg.stage_channels)
    if len(cfg.decoder_channels) != len(channels) - 1:
        raise ValueError(
            f"decoder_channels must have {len(channels) - 1} entries, got "
            f"{len(cfg.decoder_channels)}")
    keys = iter(jax.random.split(key, 256))
    params = encoder_init(keys, cfg)
    params["pab"] = _pab_init(keys, channels[-1], cfg.pab_reduction)

    # MFAB decoder: deepest -> shallowest, skips from encoder stages.
    params["decoder"] = []
    skip_channels = channels[:-1][::-1]  # OS-8, OS-4, OS-2, full res
    cin = channels[-1]
    for dec_c, skip_c in zip(cfg.decoder_channels, skip_channels):
        params["decoder"].append({
            "fuse": _block_init(next(keys), cin + skip_c, dec_c),
            "se": _se_init(keys, dec_c, cfg.se_reduction),
        })
        cin = dec_c
    params["head"] = conv2d_init(next(keys), cin, cfg.num_classes, 1)
    params["norm_mean"] = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    params["norm_std"] = jnp.asarray(IMAGENET_STD, jnp.float32)
    return params


def manet_apply(params: dict, images: jnp.ndarray, cfg: MAnetConfig, *,
                deterministic: bool = True,
                rng: Optional[jax.Array] = None) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H, W, num_classes) logits at input resolution."""
    del deterministic, rng  # no dropout in this family
    x = images.astype(cfg.dtype)
    if cfg.normalize:
        x = (x - params["norm_mean"].astype(x.dtype)) / \
            params["norm_std"].astype(x.dtype)

    h, skips = encoder_apply(params, x, cfg.groups)
    h = _pab_apply(params["pab"], h)

    for mfab, skip in zip(params["decoder"], skips[::-1]):
        target = (skip.shape[1], skip.shape[2])
        h = resize_bilinear(h, target, h_axis=1, w_axis=2)
        h = jnp.concatenate([h, skip.astype(h.dtype)], axis=-1)
        h = _block_apply(mfab["fuse"], h, cfg.groups)
        h = _se_apply(mfab["se"], h)

    logits = conv2d(params["head"], h).astype(jnp.float32)
    if logits.shape[1] != images.shape[1]:
        logits = resize_bilinear(logits, (images.shape[1], images.shape[2]),
                                 h_axis=1, w_axis=2)
    return logits
