"""Segformer segmentation family (all-MLP decoder).

Another alternate architecture behind the reference's generic
`StructuralDamageModel(arch, encoder_name, ...)` wrapper — its
`smp.create_model(arch, ...)` accepts any smp 0.4.0 architecture string
(reference model/CE/classes.py:106-110, requirements.txt:58);
"segformer" (this module) is one of the archs this package implements
natively (models/registry.py).

TPU-native design, same conventions as the other conv families. smp's
Segformer pairs the SegFormer all-MLP decode head (Xie et al. 2021) with
ANY encoder, not just the paper's MiT transformer — this module does the
same on the shared residual GroupNorm encoder (models/unet.py): each of
the three deepest stages (OS-4/8/16) is linearly projected (1×1 conv —
the paper's per-token MLP) onto a common embedding width, everything is
bilinearly upsampled to the OS-4 grid, concatenated, fused by one more
1×1 MLP, and classified. The decoder is therefore almost entirely
channel-space matmuls — the most MXU-friendly decoder of the family set.
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
class SegformerConfig:
    encoder_name: str = "resnet34"
    in_channels: int = 3
    num_classes: int = 17
    embed_channels: int = 256  # smp's segmentation_channels default
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


def segformer_init(key: jax.Array, cfg: SegformerConfig) -> dict:
    keys = iter(jax.random.split(key, 256))
    params = encoder_init(keys, cfg)
    channels = list(cfg.stage_channels)
    c = cfg.embed_channels
    # Per-stage linear (1×1) projections: OS-4 (skips[2]), OS-8
    # (skips[3]), OS-16 (deepest).
    params["proj"] = [conv2d_init(next(keys), cin, c, 1)
                      for cin in (channels[2], channels[3], channels[4])]
    params["fuse"] = {"conv": conv2d_init(next(keys), c * 3, c, 1),
                      "gn": _group_norm_init(c)}
    params["head"] = conv2d_init(next(keys), c, cfg.num_classes, 1)
    params["norm_mean"] = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    params["norm_std"] = jnp.asarray(IMAGENET_STD, jnp.float32)
    return params


def segformer_apply(params: dict, images: jnp.ndarray, cfg: SegformerConfig,
                    *, deterministic: bool = True,
                    rng: Optional[jax.Array] = None) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H, W, num_classes) logits at input resolution."""
    del deterministic, rng  # no dropout in this family
    x = images.astype(cfg.dtype)
    if cfg.normalize:
        x = (x - params["norm_mean"].astype(x.dtype)) / \
            params["norm_std"].astype(x.dtype)

    deepest, skips = encoder_apply(params, x, cfg.groups)
    levels = (skips[2], skips[3], deepest)  # OS-4, OS-8, OS-16

    target = (levels[0].shape[1], levels[0].shape[2])
    projected = []
    for proj, feat in zip(params["proj"], levels):
        y = conv2d(proj, feat.astype(x.dtype))
        projected.append(resize_bilinear(y, target, h_axis=1, w_axis=2))

    fused = jnp.concatenate(projected, axis=-1)
    fused = jax.nn.relu(_group_norm(params["fuse"]["gn"],
                                    conv2d(params["fuse"]["conv"], fused),
                                    cfg.groups))
    logits = conv2d(params["head"], fused).astype(jnp.float32)
    if logits.shape[1] != images.shape[1]:
        logits = resize_bilinear(logits, (images.shape[1], images.shape[2]),
                                 h_axis=1, w_axis=2)
    return logits
