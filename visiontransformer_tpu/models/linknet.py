"""LinkNet segmentation family (additive-skip encoder-decoder).

Third alternate architecture behind the reference's generic
`StructuralDamageModel(arch, encoder_name, ...)` wrapper — its
`smp.create_model(arch, ...)` accepts any smp architecture string
(reference model/CE/classes.py:106-110); "linknet" (this module) is one
of the five archs this package implements natively (see
models/registry.py for the full set).

TPU-native design, same conventions as the other conv families: the
shared residual GroupNorm encoder (models/unet.py:encoder_init/
encoder_apply), NHWC layout, XLA-lowered convs on the MXU. Decoder
topology follows the LinkNet shape smp builds — per stage a channel
bottleneck (1×1 to c/4), a 2× upsample with a 3×3 conv, and a 1×1
projection onto the skip width, merged by ADDITION with the encoder
skip (LinkNet's defining difference from UNet's concatenation: the
decoder stays narrow, ~4× fewer decoder FLOPs at equal depth).
Divergences from smp's torch build, applied uniformly across the conv
families: GroupNorm instead of BatchNorm (batch-independent → shards
freely under data parallelism) and bilinear-resize+conv instead of
transposed conv (identical receptive field, no checkerboard artifacts,
and XLA lowers resize+conv onto the MXU without the transposed conv's
scatter).
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
class LinkNetConfig:
    encoder_name: str = "resnet34"
    in_channels: int = 3
    num_classes: int = 17
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


def _decoder_block_init(key, cin: int, cout: int):
    mid = max(cin // 4, 8)
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "reduce": conv2d_init(k1, cin, mid, 1),
        "gn1": _group_norm_init(mid),
        "up": conv2d_init(k2, mid, mid, 3),
        "gn2": _group_norm_init(mid),
        "expand": conv2d_init(k3, mid, cout, 1),
        "gn3": _group_norm_init(cout),
    }


def _decoder_block_apply(params, x, groups: int):
    """Bottleneck → 2× upsample + 3×3 conv → project to skip width."""
    y = jax.nn.relu(_group_norm(params["gn1"],
                                conv2d(params["reduce"], x), groups))
    y = resize_bilinear(y, (y.shape[1] * 2, y.shape[2] * 2),
                        h_axis=1, w_axis=2)
    y = jax.nn.relu(_group_norm(params["gn2"],
                                conv2d(params["up"], y), groups))
    return jax.nn.relu(_group_norm(params["gn3"],
                                   conv2d(params["expand"], y), groups))


def linknet_init(key: jax.Array, cfg: LinkNetConfig) -> dict:
    keys = iter(jax.random.split(key, 256))
    params = encoder_init(keys, cfg)

    # One decoder block per encoder stage, deepest → shallowest; each
    # projects onto the width of the skip it is summed with.
    channels = list(cfg.stage_channels)
    skip_channels = channels[:-1][::-1]  # deepest skip first
    cin = channels[-1]
    params["decoder"] = []
    for skip_c in skip_channels:
        params["decoder"].append(_decoder_block_init(next(keys), cin, skip_c))
        cin = skip_c

    params["head_conv"] = conv2d_init(next(keys), cin, cin, 3)
    params["head_gn"] = _group_norm_init(cin)
    params["head"] = conv2d_init(next(keys), cin, cfg.num_classes, 1)
    params["norm_mean"] = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    params["norm_std"] = jnp.asarray(IMAGENET_STD, jnp.float32)
    return params


def linknet_apply(params: dict, images: jnp.ndarray, cfg: LinkNetConfig, *,
                  deterministic: bool = True,
                  rng: Optional[jax.Array] = None) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H, W, num_classes) logits at input resolution."""
    del deterministic, rng  # no dropout in this family
    x = images.astype(cfg.dtype)
    if cfg.normalize:
        x = (x - params["norm_mean"].astype(x.dtype)) / \
            params["norm_std"].astype(x.dtype)

    x, skips = encoder_apply(params, x, cfg.groups)

    # Additive skip merge, deepest skip first.
    for dec, skip in zip(params["decoder"], skips[::-1]):
        y = _decoder_block_apply(dec, x, cfg.groups)
        if y.shape[1] != skip.shape[1]:
            y = resize_bilinear(y, (skip.shape[1], skip.shape[2]),
                                h_axis=1, w_axis=2)
        x = y + skip.astype(y.dtype)

    x = jax.nn.relu(_group_norm(params["head_gn"],
                                conv2d(params["head_conv"], x), cfg.groups))
    logits = conv2d(params["head"], x).astype(jnp.float32)
    if logits.shape[1] != images.shape[1]:
        logits = resize_bilinear(logits, (images.shape[1], images.shape[2]),
                                 h_axis=1, w_axis=2)
    return logits
