"""Segformer segmentation family (all-MLP decoder).

Another alternate architecture behind the reference's generic
`StructuralDamageModel(arch, encoder_name, ...)` wrapper — its
`smp.create_model(arch, ...)` accepts any smp 0.4.0 architecture string
(reference model/CE/classes.py:106-110, requirements.txt:58);
"segformer" (this module) is one of the archs this package implements
natively (models/registry.py).

TPU-native design, same conventions as the other conv families. smp's
Segformer pairs the SegFormer all-MLP decode head (Xie et al. 2021) with
ANY encoder — the paper's MiT transformer or a conv backbone. Both work
here: `encoder_name="mit_b0|b1|b2"` selects the native Mix Transformer
(models/mit.py — the authentic SegFormer, four stages at OS-4/8/16/32),
any other name selects the shared residual GroupNorm encoder
(models/unet.py, three levels at OS-4/8/16). Each stage is linearly
projected (1×1 conv — the paper's per-token MLP) onto a common embedding
width, everything is bilinearly upsampled to the OS-4 grid, concatenated,
fused by one more 1×1 MLP, and classified. The decoder is therefore
almost entirely channel-space matmuls — the most MXU-friendly decoder of
the family set.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from visiontransformer_tpu.models.mit import (
    MIT_PRESETS,
    mit_encoder_apply,
    mit_encoder_init,
)
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
    groups: int = 8  # GroupNorm groups (decoder fuse; conv encoder)
    compute_dtype: str = "float32"
    normalize: bool = True  # smp-style input normalization in forward
    # "gn" (default; batch-independent, shards freely) or "affine" — a
    # per-channel scale/bias, the inference-mode fold of the HF decode
    # head's BatchNorm2d. convert_hf_segformer_seg_state produces params
    # for the affine form so real pretrained SegFormer checkpoints serve
    # with exact numerics (tests/test_mit.py full-model parity).
    head_norm: str = "gn"

    @property
    def is_mit(self) -> bool:
        return self.encoder_name in MIT_PRESETS

    @property
    def level_channels(self) -> Sequence[int]:
        """Channel widths of the stages the decode head consumes."""
        if self.is_mit:
            return MIT_PRESETS[self.encoder_name][0]  # OS-4/8/16/32
        ch = ENCODER_PRESETS[self.encoder_name][0]
        return (ch[2], ch[3], ch[4])  # OS-4/8/16

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
    keys = iter(jax.random.split(key, 2048))
    if cfg.is_mit:
        params = mit_encoder_init(keys, cfg.encoder_name, cfg.in_channels)
    else:
        params = encoder_init(keys, cfg)
    levels = list(cfg.level_channels)
    c = cfg.embed_channels
    params["proj"] = [conv2d_init(next(keys), cin, c, 1) for cin in levels]
    norm = ({"affine": {"scale": jnp.ones((c,), jnp.float32),
                        "bias": jnp.zeros((c,), jnp.float32)}}
            if cfg.head_norm == "affine" else {"gn": _group_norm_init(c)})
    params["fuse"] = {"conv": conv2d_init(next(keys), c * len(levels), c, 1),
                      **norm}
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

    if cfg.is_mit:
        levels = mit_encoder_apply(params, x, cfg.encoder_name)
    else:
        deepest, skips = encoder_apply(params, x, cfg.groups)
        levels = (skips[2], skips[3], deepest)  # OS-4, OS-8, OS-16

    target = (levels[0].shape[1], levels[0].shape[2])
    projected = []
    for proj, feat in zip(params["proj"], levels):
        y = conv2d(proj, feat.astype(x.dtype))
        projected.append(resize_bilinear(y, target, h_axis=1, w_axis=2))

    fused = jnp.concatenate(projected, axis=-1)
    fused = conv2d(params["fuse"]["conv"], fused)
    if "affine" in params["fuse"]:  # folded inference BatchNorm (HF head)
        aff = params["fuse"]["affine"]
        fused = fused * aff["scale"].astype(fused.dtype) \
            + aff["bias"].astype(fused.dtype)
    else:
        fused = _group_norm(params["fuse"]["gn"], fused, cfg.groups)
    fused = jax.nn.relu(fused)
    logits = conv2d(params["head"], fused).astype(jnp.float32)
    if logits.shape[1] != images.shape[1]:
        logits = resize_bilinear(logits, (images.shape[1], images.shape[2]),
                                 h_axis=1, w_axis=2)
    return logits
