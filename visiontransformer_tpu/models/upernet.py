"""UPerNet segmentation family (Unified Perceptual Parsing decoder).

Another alternate architecture behind the reference's generic
`StructuralDamageModel(arch, encoder_name, ...)` wrapper — its
`smp.create_model(arch, ...)` accepts any smp 0.4.0 architecture string
(reference model/CE/classes.py:106-110, requirements.txt:58); "upernet"
(this module) is one of the archs this package implements natively
(models/registry.py).

TPU-native design, same conventions as the other conv families: the
shared residual GroupNorm encoder (models/unet.py), NHWC layout,
XLA-lowered convs on the MXU. Decoder topology follows UPerNet (Xiao et
al. 2018): a PSPNet-style Pyramid Pooling Module on the deepest stage
(adaptive average pools at several bin counts, 1×1-projected and
upsampled back — lowered to matmuls exactly as models/pspnet.py does),
then an FPN top-down pathway over the remaining stages (1×1 laterals,
upsample-add, 3×3 smoothing), and finally a full-pyramid fusion: every
level upsampled to the finest one, concatenated, fused by a 3×3 conv
before the class head.
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
    _group_norm,
    _group_norm_init,
    encoder_apply,
    encoder_init,
)
from visiontransformer_tpu.models.pspnet import adaptive_avg_pool
from visiontransformer_tpu.nn.layers import conv2d, conv2d_init
from visiontransformer_tpu.ops.resize import resize_bilinear


@dataclasses.dataclass(frozen=True)
class UPerNetConfig:
    encoder_name: str = "resnet34"
    in_channels: int = 3
    num_classes: int = 17
    pool_bins: Tuple[int, ...] = (1, 2, 3, 6)  # PPM grid sizes
    pyramid_channels: int = 256
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


def _cgn(params, x, groups: int):
    return jax.nn.relu(_group_norm(params["gn"],
                                   conv2d(params["conv"], x), groups))


def upernet_init(key: jax.Array, cfg: UPerNetConfig) -> dict:
    keys = iter(jax.random.split(key, 256))
    params = encoder_init(keys, cfg)
    channels = list(cfg.stage_channels)
    c = cfg.pyramid_channels

    # PPM on the deepest stage.
    params["ppm"] = {
        "branches": [_cgn_init(next(keys), channels[-1], c, 1)
                     for _ in cfg.pool_bins],
        "project": _cgn_init(
            next(keys), channels[-1] + c * len(cfg.pool_bins), c, 3),
    }
    # FPN laterals for the shallower stages feeding the top-down path
    # (encoder_apply's skips[1..3]; skips[0] is stem-resolution and the
    # paper's UPerNet also stops at OS-4).
    params["lateral"] = [_cgn_init(next(keys), channels[i], c, 1)
                         for i in (1, 2, 3)]
    params["smooth"] = [_cgn_init(next(keys), c, c, 3) for _ in range(3)]
    params["fuse"] = _cgn_init(next(keys), c * 4, c, 3)
    params["head"] = conv2d_init(next(keys), c, cfg.num_classes, 1)
    params["norm_mean"] = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    params["norm_std"] = jnp.asarray(IMAGENET_STD, jnp.float32)
    return params


def upernet_apply(params: dict, images: jnp.ndarray, cfg: UPerNetConfig, *,
                  deterministic: bool = True,
                  rng: Optional[jax.Array] = None) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H, W, num_classes) logits at input resolution."""
    del deterministic, rng  # no dropout in this family
    x = images.astype(cfg.dtype)
    if cfg.normalize:
        x = (x - params["norm_mean"].astype(x.dtype)) / \
            params["norm_std"].astype(x.dtype)

    deepest, skips = encoder_apply(params, x, cfg.groups)

    # PPM: multi-bin pooled contexts upsampled back and fused.
    ppm = params["ppm"]
    branches = [deepest]
    for branch, bins in zip(ppm["branches"], cfg.pool_bins):
        pooled = adaptive_avg_pool(deepest, bins)
        pooled = _cgn(branch, pooled, cfg.groups)
        branches.append(resize_bilinear(
            pooled, (deepest.shape[1], deepest.shape[2]), h_axis=1, w_axis=2))
    top = _cgn(ppm["project"], jnp.concatenate(branches, axis=-1),
               cfg.groups)

    # FPN top-down: OS-16 (PPM output) -> OS-8 -> OS-4 -> OS-2.
    pyramid = [top]
    h = top
    for lat, smooth, skip in zip(params["lateral"][::-1],
                                 params["smooth"],
                                 (skips[3], skips[2], skips[1])):
        lateral = _cgn(lat, skip.astype(h.dtype), cfg.groups)
        h = lateral + resize_bilinear(
            h, (lateral.shape[1], lateral.shape[2]), h_axis=1, w_axis=2)
        h = _cgn(smooth, h, cfg.groups)
        pyramid.append(h)

    # Fuse the whole pyramid at the finest level.
    finest = pyramid[-1]
    target = (finest.shape[1], finest.shape[2])
    fused = jnp.concatenate(
        [resize_bilinear(p, target, h_axis=1, w_axis=2) for p in pyramid],
        axis=-1)
    fused = _cgn(params["fuse"], fused, cfg.groups)

    logits = conv2d(params["head"], fused).astype(jnp.float32)
    if logits.shape[1] != images.shape[1]:
        logits = resize_bilinear(logits, (images.shape[1], images.shape[2]),
                                 h_axis=1, w_axis=2)
    return logits
