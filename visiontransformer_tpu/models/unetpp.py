"""UNet++ segmentation family (nested dense skip pathways).

Another alternate architecture behind the reference's generic
`StructuralDamageModel(arch, encoder_name, ...)` wrapper — its
`smp.create_model(arch, ...)` accepts any smp architecture string
(reference model/CE/classes.py:106-110); "unetplusplus" (this module) is
one of the archs this package implements natively (models/registry.py).

TPU-native design, same conventions as the other conv families: the
shared residual GroupNorm encoder (models/unet.py), NHWC layout,
XLA-lowered convs on the MXU. Decoder topology is the UNet++ nested grid
(Zhou et al. 2018): node X[i][j] fuses ALL previous nodes at its own
resolution level i (the dense skip chain X[i][0..j-1]) with the upsampled
node one level deeper (X[i+1][j-1]); the head reads the topmost node of
the last column. Every node is static under jit — the grid unrolls into
one XLA program, and the dense concats are free to fuse with the
following conv's im2col.
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
class UNetPlusPlusConfig:
    encoder_name: str = "resnet34"
    in_channels: int = 3
    num_classes: int = 17
    # Node width per resolution level (level 0 = input resolution).
    decoder_channels: Tuple[int, ...] = (32, 64, 128, 256)
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


def _node_in_channels(cfg: UNetPlusPlusConfig, i: int, j: int) -> int:
    """Input width of grid node X[i][j] (j >= 1): the encoder feature at
    level i, the j-1 previous decoder nodes at level i, and the upsampled
    node from level i+1, column j-1."""
    enc = list(cfg.stage_channels)
    dec = list(cfg.decoder_channels)
    below = enc[i + 1] if j == 1 else dec[i + 1]
    return enc[i] + (j - 1) * dec[i] + below


def unetplusplus_init(key: jax.Array, cfg: UNetPlusPlusConfig) -> dict:
    n_levels = len(cfg.stage_channels)  # 5: stem + 4 stages
    if len(cfg.decoder_channels) != n_levels - 1:
        raise ValueError(
            f"decoder_channels must have {n_levels - 1} entries "
            f"(one per resolution level above the deepest), got "
            f"{len(cfg.decoder_channels)}")
    keys = iter(jax.random.split(key, 256))
    params = encoder_init(keys, cfg)

    dec = list(cfg.decoder_channels)
    params["nodes"] = {}
    for j in range(1, n_levels):
        for i in range(n_levels - j):
            params["nodes"][f"x{i}_{j}"] = _block_init(
                next(keys), _node_in_channels(cfg, i, j), dec[i])
    params["head"] = conv2d_init(next(keys), dec[0], cfg.num_classes, 1)
    params["norm_mean"] = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    params["norm_std"] = jnp.asarray(IMAGENET_STD, jnp.float32)
    return params


def unetplusplus_apply(params: dict, images: jnp.ndarray,
                       cfg: UNetPlusPlusConfig, *,
                       deterministic: bool = True,
                       rng: Optional[jax.Array] = None) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H, W, num_classes) logits at input resolution."""
    del deterministic, rng  # no dropout in this family
    x = images.astype(cfg.dtype)
    if cfg.normalize:
        x = (x - params["norm_mean"].astype(x.dtype)) / \
            params["norm_std"].astype(x.dtype)

    deepest, skips = encoder_apply(params, x, cfg.groups)
    levels = skips + [deepest]  # X[i][0], i = 0..4, full res -> OS-16
    n_levels = len(levels)

    grid = {(i, 0): levels[i] for i in range(n_levels)}
    for j in range(1, n_levels):
        for i in range(n_levels - j):
            key = f"x{i}_{j}"
            same_level = [grid[(i, k)] for k in range(j)]
            below = grid[(i + 1, j - 1)]
            target = (same_level[0].shape[1], same_level[0].shape[2])
            below = resize_bilinear(below, target, h_axis=1, w_axis=2)
            fused = jnp.concatenate(
                [t.astype(x.dtype) for t in same_level] + [below], axis=-1)
            grid[(i, j)] = _block_apply(params["nodes"][key], fused,
                                        cfg.groups)

    top = grid[(0, n_levels - 1)]
    logits = conv2d(params["head"], top).astype(jnp.float32)
    if logits.shape[1] != images.shape[1]:
        logits = resize_bilinear(logits, (images.shape[1], images.shape[2]),
                                 h_axis=1, w_axis=2)
    return logits
