"""FPN segmentation family (Feature Pyramid Network decoder).

Second alternate architecture behind the reference's generic
`StructuralDamageModel(arch, encoder_name, ...)` wrapper — its
`smp.create_model(arch, ...)` accepts any smp architecture string
(reference model/CE/classes.py:106-110), of which this package implements
"unet" (models/unet.py) and "fpn" (this module) natively.

TPU-native design, same conventions as the UNet family: the shared
residual GroupNorm encoder (models/unet.py:encoder_init/encoder_apply —
batch-independent normalization shards freely under data parallelism),
NHWC layout, XLA-lowered convs on the MXU. Decoder topology follows the
classic FPN-for-segmentation shape smp builds: 1×1 lateral projections
onto a fixed pyramid width, top-down upsample-and-add pathway,
per-level 3×3 segmentation blocks progressively upsampled to the finest
pyramid level, summed, then a 1×1 head and bilinear upsample to input
resolution.
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
from visiontransformer_tpu.nn.layers import conv2d, conv2d_init
from visiontransformer_tpu.ops.resize import resize_bilinear


@dataclasses.dataclass(frozen=True)
class FPNConfig:
    encoder_name: str = "resnet34"
    in_channels: int = 3
    num_classes: int = 17
    pyramid_channels: int = 256
    segmentation_channels: int = 128
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


def _seg_block_init(key, cin: int, cout: int):
    return {"conv": conv2d_init(key, cin, cout, 3),
            "gn": _group_norm_init(cout)}


def _seg_block_apply(params, x, groups: int):
    return jax.nn.relu(_group_norm(params["gn"],
                                   conv2d(params["conv"], x), groups))


def fpn_init(key: jax.Array, cfg: FPNConfig) -> dict:
    keys = iter(jax.random.split(key, 256))
    params = encoder_init(keys, cfg)

    # One lateral 1x1 per encoder stage output (shallowest..deepest), onto
    # the shared pyramid width.
    stage_outputs = list(cfg.stage_channels[1:])
    params["laterals"] = [
        conv2d_init(next(keys), c, cfg.pyramid_channels, 1)
        for c in stage_outputs
    ]
    # One segmentation branch per pyramid level: a 3x3 block to
    # segmentation_channels (upsampling to the finest level happens in
    # apply, between levels' sums).
    params["seg_blocks"] = [
        _seg_block_init(next(keys), cfg.pyramid_channels,
                        cfg.segmentation_channels)
        for _ in stage_outputs
    ]
    params["head"] = conv2d_init(next(keys), cfg.segmentation_channels,
                                 cfg.num_classes, 1)
    params["norm_mean"] = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    params["norm_std"] = jnp.asarray(IMAGENET_STD, jnp.float32)
    return params


def fpn_apply(params: dict, images: jnp.ndarray, cfg: FPNConfig, *,
              deterministic: bool = True,
              rng: Optional[jax.Array] = None) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H, W, num_classes) logits at input resolution."""
    del deterministic, rng  # no dropout in this family
    x = images.astype(cfg.dtype)
    if cfg.normalize:
        x = (x - params["norm_mean"].astype(x.dtype)) / \
            params["norm_std"].astype(x.dtype)

    deepest, skips = encoder_apply(params, x, cfg.groups)
    # Per-stage OUTPUTS, shallowest..deepest: stage i's output is stage
    # i+1's input; the deepest output comes back separately.
    features = skips[1:] + [deepest]

    # Top-down pathway: lateral project, upsample-and-add.
    pyramid = [None] * len(features)
    top = conv2d(params["laterals"][-1], features[-1])
    pyramid[-1] = top
    for i in range(len(features) - 2, -1, -1):
        lateral = conv2d(params["laterals"][i], features[i])
        top = lateral + resize_bilinear(
            top, (lateral.shape[1], lateral.shape[2]), h_axis=1, w_axis=2)
        pyramid[i] = top

    # Segmentation branches, merged by summation at the finest level.
    finest_hw = (pyramid[0].shape[1], pyramid[0].shape[2])
    merged = None
    for level, seg in zip(pyramid, params["seg_blocks"]):
        y = _seg_block_apply(seg, level, cfg.groups)
        if y.shape[1] != finest_hw[0]:
            y = resize_bilinear(y, finest_hw, h_axis=1, w_axis=2)
        merged = y if merged is None else merged + y

    logits = conv2d(params["head"], merged).astype(jnp.float32)
    if logits.shape[1] != images.shape[1]:
        logits = resize_bilinear(logits, (images.shape[1], images.shape[2]),
                                 h_axis=1, w_axis=2)
    return logits
