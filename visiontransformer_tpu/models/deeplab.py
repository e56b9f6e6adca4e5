"""DeepLabV3 and DeepLabV3+ segmentation families (atrous spatial
pyramid pooling, and its low-level-skip decoder variant).

Alternate architectures behind the reference's generic
`StructuralDamageModel(arch, encoder_name, ...)` wrapper — its
`smp.create_model(arch, ...)` accepts any smp architecture string
(reference model/CE/classes.py:106-110); "deeplabv3" and "deeplabv3plus"
(this module) are two of the archs this package implements natively (see
models/registry.py for the full set).

DeepLabV3+ adds the encoder-decoder refinement on top of the same ASPP:
the ASPP output is upsampled to the OS-4 (quarter-resolution) encoder
stage, concatenated with a 1×1-projected low-level feature (48 channels,
the paper's choice — wide enough to carry boundaries, narrow enough not
to drown the ASPP semantics), fused by two 3×3 convs, then classified and
upsampled to input resolution — recovering the object boundaries the
stride-16 pyramid blurs.

TPU-native design, same conventions as the other conv families: the
shared residual GroupNorm encoder (models/unet.py:encoder_init/
encoder_apply), NHWC layout, XLA-lowered convs on the MXU. Decoder
topology follows the ASPP shape smp builds — on the deepest features,
parallel branches of a 1×1 conv, three 3×3 atrous convs at increasing
dilation rates, and a global-average-pool + 1×1 conv image-level branch
(broadcast back over space), concatenated and fused by a 1×1 projection
before the class head. Atrous convolution is a single
`lax.conv_general_dilated` with `rhs_dilation` — the dilation is free on
the MXU (same FLOPs as the dense 3×3), so the multi-rate pyramid costs
exactly len(rates) dense convs.

Rate scaling: the DeepLab paper's OS-16 rates (6, 12, 18) are calibrated
for ~513² crops (33×33 feature maps); at this repo's standard 224² the
map is 14×14 and a fixed rate-18 tap falls entirely in SAME padding
(a dead branch). `atrous_rates` are therefore declared on the paper's
33×33 canvas and rescaled to the actual feature-map size at apply time —
shapes are static under jit, so each input size compiles with its own
exact integer rates and the pyramid keeps the paper's coverage geometry
at every resolution.
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
class DeepLabV3Config:
    encoder_name: str = "resnet34"
    in_channels: int = 3
    num_classes: int = 17
    atrous_rates: Tuple[int, ...] = (6, 12, 18)  # on the 33×33 canvas
    rate_canvas: int = 33  # feature size the rates are declared for
    aspp_channels: int = 256
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


def _branch_init(key, cin: int, cout: int, kernel: int):
    return {"conv": conv2d_init(key, cin, cout, kernel),
            "gn": _group_norm_init(cout)}


def _aspp_init(keys, cin: int, cfg) -> dict:
    c = cfg.aspp_channels
    return {
        "conv1x1": _branch_init(next(keys), cin, c, 1),
        "atrous": [_branch_init(next(keys), cin, c, 3)
                   for _ in cfg.atrous_rates],
        "image_pool": _branch_init(next(keys), cin, c, 1),
        "project": _branch_init(next(keys),
                                c * (2 + len(cfg.atrous_rates)), c, 1),
    }


def deeplabv3_init(key: jax.Array, cfg: DeepLabV3Config) -> dict:
    keys = iter(jax.random.split(key, 256))
    params = encoder_init(keys, cfg)
    params["aspp"] = _aspp_init(keys, cfg.stage_channels[-1], cfg)
    params["head"] = conv2d_init(next(keys), cfg.aspp_channels,
                                 cfg.num_classes, 1)
    params["norm_mean"] = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    params["norm_std"] = jnp.asarray(IMAGENET_STD, jnp.float32)
    return params


def _branch_apply(branch, x, groups: int, dilation: int = 1):
    y = conv2d(branch["conv"], x, dilation=dilation)
    return jax.nn.relu(_group_norm(branch["gn"], y, groups))


def _aspp_apply(aspp: dict, x: jnp.ndarray, cfg) -> jnp.ndarray:
    branches = [_branch_apply(aspp["conv1x1"], x, cfg.groups)]
    # Rescale the canonical rates to this feature-map size (static under
    # jit); distinct-ify so two branches never collapse onto one rate.
    scale = min(x.shape[1], x.shape[2]) / cfg.rate_canvas
    rates, seen = [], 0
    for rate in cfg.atrous_rates:
        r = max(int(round(rate * scale)), seen + 1)
        rates.append(r)
        seen = r
    for branch, rate in zip(aspp["atrous"], rates):
        branches.append(_branch_apply(branch, x, cfg.groups, dilation=rate))
    # Image-level branch: global average pool -> 1x1 conv -> broadcast.
    pooled = jnp.mean(x, axis=(1, 2), keepdims=True)
    pooled = _branch_apply(aspp["image_pool"], pooled, cfg.groups)
    branches.append(jnp.broadcast_to(
        pooled, pooled.shape[:1] + x.shape[1:3] + pooled.shape[3:]))

    x = jnp.concatenate(branches, axis=-1)
    return _branch_apply(aspp["project"], x, cfg.groups)


def deeplabv3_apply(params: dict, images: jnp.ndarray, cfg: DeepLabV3Config,
                    *, deterministic: bool = True,
                    rng: Optional[jax.Array] = None) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H, W, num_classes) logits at input resolution."""
    del deterministic, rng  # no dropout in this family
    x = images.astype(cfg.dtype)
    if cfg.normalize:
        x = (x - params["norm_mean"].astype(x.dtype)) / \
            params["norm_std"].astype(x.dtype)

    x, _ = encoder_apply(params, x, cfg.groups)  # deepest features only

    x = _aspp_apply(params["aspp"], x, cfg)
    logits = conv2d(params["head"], x).astype(jnp.float32)
    if logits.shape[1] != images.shape[1]:
        logits = resize_bilinear(logits, (images.shape[1], images.shape[2]),
                                 h_axis=1, w_axis=2)
    return logits


@dataclasses.dataclass(frozen=True)
class DeepLabV3PlusConfig:
    encoder_name: str = "resnet34"
    in_channels: int = 3
    num_classes: int = 17
    atrous_rates: Tuple[int, ...] = (6, 12, 18)  # on the 33×33 canvas
    rate_canvas: int = 33  # feature size the rates are declared for
    aspp_channels: int = 256
    low_level_channels: int = 48  # 1×1 projection width for the OS-4 skip
    decoder_channels: int = 256
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


def deeplabv3plus_init(key: jax.Array, cfg: DeepLabV3PlusConfig) -> dict:
    keys = iter(jax.random.split(key, 256))
    params = encoder_init(keys, cfg)
    params["aspp"] = _aspp_init(keys, cfg.stage_channels[-1], cfg)
    # Low-level skip: encoder_apply's skips[2] is the OS-4 feature map
    # (input to the third stage), channel width stage_channels[2].
    params["low_proj"] = _branch_init(
        next(keys), cfg.stage_channels[2], cfg.low_level_channels, 1)
    c = cfg.decoder_channels
    params["decoder"] = [
        _branch_init(next(keys), cfg.aspp_channels + cfg.low_level_channels,
                     c, 3),
        _branch_init(next(keys), c, c, 3),
    ]
    params["head"] = conv2d_init(next(keys), c, cfg.num_classes, 1)
    params["norm_mean"] = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    params["norm_std"] = jnp.asarray(IMAGENET_STD, jnp.float32)
    return params


def deeplabv3plus_apply(params: dict, images: jnp.ndarray,
                        cfg: DeepLabV3PlusConfig, *,
                        deterministic: bool = True,
                        rng: Optional[jax.Array] = None) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H, W, num_classes) logits at input resolution."""
    del deterministic, rng  # no dropout in this family
    x = images.astype(cfg.dtype)
    if cfg.normalize:
        x = (x - params["norm_mean"].astype(x.dtype)) / \
            params["norm_std"].astype(x.dtype)

    x, skips = encoder_apply(params, x, cfg.groups)

    x = _aspp_apply(params["aspp"], x, cfg)
    # Decoder: upsample the stride-16 ASPP output to the OS-4 skip, fuse
    # with the projected low-level features, refine with two 3×3 convs.
    low = _branch_apply(params["low_proj"], skips[2], cfg.groups)
    x = resize_bilinear(x, (low.shape[1], low.shape[2]), h_axis=1, w_axis=2)
    x = jnp.concatenate([x, low.astype(x.dtype)], axis=-1)
    for block in params["decoder"]:
        x = _branch_apply(block, x, cfg.groups)

    logits = conv2d(params["head"], x).astype(jnp.float32)
    if logits.shape[1] != images.shape[1]:
        logits = resize_bilinear(logits, (images.shape[1], images.shape[2]),
                                 h_axis=1, w_axis=2)
    return logits
