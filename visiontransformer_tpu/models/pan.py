"""PAN segmentation family (Pyramid Attention Network).

Another alternate architecture behind the reference's generic
`StructuralDamageModel(arch, encoder_name, ...)` wrapper — its
`smp.create_model(arch, ...)` accepts any smp architecture string
(reference model/CE/classes.py:106-110); "pan" (this module) is one of
the archs this package implements natively (models/registry.py).

TPU-native design, same conventions as the other conv families: the
shared residual GroupNorm encoder (models/unet.py), NHWC layout,
XLA-lowered convs on the MXU. Decoder topology follows the PAN paper
(Li et al. 2018): a Feature Pyramid Attention (FPA) module on the deepest
features — a 7/5/3-kernel stride-2 conv pyramid whose progressively
upsampled-and-summed output gates a 1×1 center branch, plus a
global-pool context branch added back — followed by Global Attention
Upsample (GAU) blocks that fuse each shallower encoder stage: the
high-level features' global-pooled channel vector (1×1 conv + sigmoid)
reweights the 3×3-convolved low-level features before the upsample-add.
Every attention here is channel/gate arithmetic on conv outputs — no
softmax over space — so the whole decoder is elementwise-fusable around
the convs and XLA keeps it on-chip.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from visiontransformer_tpu.models.unet import (
    ENCODER_PRESETS,
    IMAGENET_MEAN,
    IMAGENET_STD,
    _group_norm,
    _group_norm_init,
    encoder_apply,
    encoder_init,
)
from visiontransformer_tpu.nn.layers import conv2d, conv2d_init
from visiontransformer_tpu.ops.resize import resize_bilinear


@dataclasses.dataclass(frozen=True)
class PANConfig:
    encoder_name: str = "resnet34"
    in_channels: int = 3
    num_classes: int = 17
    decoder_channels: int = 64  # width of the FPA output and GAU stream
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


def _cgn_init(key, cin: int, cout: int, kernel: int):
    return {"conv": conv2d_init(key, cin, cout, kernel),
            "gn": _group_norm_init(cout)}


def _cgn(params, x, groups: int, *, stride: int = 1, relu: bool = True):
    y = conv2d(params["conv"], x, stride=stride)
    y = _group_norm(params["gn"], y, groups)
    return jax.nn.relu(y) if relu else y


def _fpa_init(keys, cin: int, c: int) -> dict:
    return {
        "mid": _cgn_init(next(keys), cin, c, 1),
        "global": _cgn_init(next(keys), cin, c, 1),
        "down7": _cgn_init(next(keys), cin, c, 7),
        "down5": _cgn_init(next(keys), c, c, 5),
        "down3": _cgn_init(next(keys), c, c, 3),
        "up7": _cgn_init(next(keys), c, c, 7),
        "up5": _cgn_init(next(keys), c, c, 5),
        "up3": _cgn_init(next(keys), c, c, 3),
    }


def _fpa_apply(fpa: dict, x: jnp.ndarray, groups: int) -> jnp.ndarray:
    """Feature Pyramid Attention: pyramid-gated center branch + global
    context. Input (B, h, w, C_in) -> (B, h, w, c)."""
    mid = _cgn(fpa["mid"], x, groups, relu=False)

    d1 = _cgn(fpa["down7"], x, groups, stride=2)   # h/2
    d2 = _cgn(fpa["down5"], d1, groups, stride=2)  # h/4
    d3 = _cgn(fpa["down3"], d2, groups, stride=2)  # h/8

    p3 = _cgn(fpa["up3"], d3, groups)
    p2 = _cgn(fpa["up5"], d2, groups) + \
        resize_bilinear(p3, (d2.shape[1], d2.shape[2]), h_axis=1, w_axis=2)
    p1 = _cgn(fpa["up7"], d1, groups) + \
        resize_bilinear(p2, (d1.shape[1], d1.shape[2]), h_axis=1, w_axis=2)
    pyr = resize_bilinear(p1, (x.shape[1], x.shape[2]), h_axis=1, w_axis=2)

    pooled = jnp.mean(x, axis=(1, 2), keepdims=True)
    glob = _cgn(fpa["global"], pooled, groups, relu=False)

    return mid * pyr + jnp.broadcast_to(
        glob, glob.shape[:1] + x.shape[1:3] + glob.shape[3:])


def _gau_init(keys, low_cin: int, c: int) -> dict:
    return {"low": _cgn_init(next(keys), low_cin, c, 3),
            "att": conv2d_init(next(keys), c, c, 1)}


def _gau_apply(gau: dict, high: jnp.ndarray, low: jnp.ndarray,
               groups: int) -> jnp.ndarray:
    """Global Attention Upsample: high-level global context reweights the
    low-level features channel-wise, then upsample-add."""
    low = _cgn(gau["low"], low, groups, relu=False)
    pooled = jnp.mean(high, axis=(1, 2), keepdims=True)
    att = jax.nn.sigmoid(conv2d(gau["att"], pooled))
    high = resize_bilinear(high, (low.shape[1], low.shape[2]),
                           h_axis=1, w_axis=2)
    return high + low * att


def pan_init(key: jax.Array, cfg: PANConfig) -> dict:
    keys = iter(jax.random.split(key, 256))
    params = encoder_init(keys, cfg)
    c = cfg.decoder_channels
    params["fpa"] = _fpa_init(keys, cfg.stage_channels[-1], c)
    # GAU fusion with the OS-8, OS-4 and OS-2 encoder stages
    # (encoder_apply's skips[3], skips[2], skips[1]).
    params["gau"] = [
        _gau_init(keys, cfg.stage_channels[3], c),
        _gau_init(keys, cfg.stage_channels[2], c),
        _gau_init(keys, cfg.stage_channels[1], c),
    ]
    params["head"] = conv2d_init(next(keys), c, cfg.num_classes, 1)
    params["norm_mean"] = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    params["norm_std"] = jnp.asarray(IMAGENET_STD, jnp.float32)
    return params


def pan_apply(params: dict, images: jnp.ndarray, cfg: PANConfig, *,
              deterministic: bool = True,
              rng: Optional[jax.Array] = None) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H, W, num_classes) logits at input resolution."""
    del deterministic, rng  # no dropout in this family
    x = images.astype(cfg.dtype)
    if cfg.normalize:
        x = (x - params["norm_mean"].astype(x.dtype)) / \
            params["norm_std"].astype(x.dtype)

    deepest, skips = encoder_apply(params, x, cfg.groups)

    h = _fpa_apply(params["fpa"], deepest, cfg.groups)
    for gau, skip in zip(params["gau"], (skips[3], skips[2], skips[1])):
        h = _gau_apply(gau, h, skip.astype(h.dtype), cfg.groups)

    logits = conv2d(params["head"], h).astype(jnp.float32)
    if logits.shape[1] != images.shape[1]:
        logits = resize_bilinear(logits, (images.shape[1], images.shape[2]),
                                 h_axis=1, w_axis=2)
    return logits
