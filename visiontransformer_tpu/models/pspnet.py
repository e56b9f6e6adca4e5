"""PSPNet segmentation family (pyramid-pooling decoder).

Fourth alternate architecture behind the reference's generic
`StructuralDamageModel(arch, encoder_name, ...)` wrapper — its
`smp.create_model(arch, ...)` accepts any smp architecture string
(reference model/CE/classes.py:106-110); "pspnet" (this module) is one
of the five archs this package implements natively (see
models/registry.py for the full set).

TPU-native design, same conventions as the other conv families: the
shared residual GroupNorm encoder (models/unet.py:encoder_init/
encoder_apply), NHWC layout, XLA-lowered convs on the MXU. Decoder
topology follows the PSP shape smp builds — adaptive-average-pool the
deepest features to a small pyramid of grids (1², 2², 3², 6²), 1×1-conv
each pooled map to c/len(pyramid), upsample back and concatenate with
the input features, then fuse with a 3×3 conv before the class head.

The adaptive average pooling itself is implemented as two dense
pooling-matrix contractions (H→bins then W→bins einsums) instead of a
gather/reduce_window: the bin-overlap weights are computed at trace
time into small constant matrices, so the whole pyramid lowers onto the
MXU with static shapes for any input size — the same
interpolation-as-matmul trick ops/resize.resize_bilinear_mm uses for
the upsample path (torch AdaptiveAvgPool2d bin semantics:
bin i covers [floor(i·S/B), ceil((i+1)·S/B))).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

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
class PSPNetConfig:
    encoder_name: str = "resnet34"
    in_channels: int = 3
    num_classes: int = 17
    pool_sizes: Tuple[int, ...] = (1, 2, 3, 6)
    psp_out_channels: int = 512
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


def _adaptive_pool_matrix(size_in: int, bins: int) -> jnp.ndarray:
    """(bins, size_in) row-stochastic averaging matrix with torch
    AdaptiveAvgPool2d bin boundaries."""
    m = np.zeros((bins, size_in), np.float32)
    for i in range(bins):
        lo = math.floor(i * size_in / bins)
        hi = max(math.ceil((i + 1) * size_in / bins), lo + 1)
        m[i, lo:hi] = 1.0 / (hi - lo)
    return jnp.asarray(m)


def adaptive_avg_pool(x: jnp.ndarray, bins: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B, bins, bins, C) via two matmul contractions."""
    mh = _adaptive_pool_matrix(x.shape[1], bins).astype(x.dtype)
    mw = _adaptive_pool_matrix(x.shape[2], bins).astype(x.dtype)
    x = jnp.einsum("ph,bhwc->bpwc", mh, x)
    return jnp.einsum("qw,bpwc->bpqc", mw, x)


def pspnet_init(key: jax.Array, cfg: PSPNetConfig) -> dict:
    keys = iter(jax.random.split(key, 256))
    params = encoder_init(keys, cfg)

    cin = cfg.stage_channels[-1]
    branch_c = max(cin // len(cfg.pool_sizes), 8)
    params["psp"] = []
    for _ in cfg.pool_sizes:
        params["psp"].append({
            "conv": conv2d_init(next(keys), cin, branch_c, 1),
            "gn": _group_norm_init(branch_c),
        })

    fused_in = cin + branch_c * len(cfg.pool_sizes)
    params["fuse"] = conv2d_init(next(keys), fused_in, cfg.psp_out_channels, 3)
    params["fuse_gn"] = _group_norm_init(cfg.psp_out_channels)
    params["head"] = conv2d_init(next(keys), cfg.psp_out_channels,
                                 cfg.num_classes, 1)
    params["norm_mean"] = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    params["norm_std"] = jnp.asarray(IMAGENET_STD, jnp.float32)
    return params


def pspnet_apply(params: dict, images: jnp.ndarray, cfg: PSPNetConfig, *,
                 deterministic: bool = True,
                 rng: Optional[jax.Array] = None) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H, W, num_classes) logits at input resolution."""
    del deterministic, rng  # no dropout in this family
    x = images.astype(cfg.dtype)
    if cfg.normalize:
        x = (x - params["norm_mean"].astype(x.dtype)) / \
            params["norm_std"].astype(x.dtype)

    x, _ = encoder_apply(params, x, cfg.groups)  # deepest features only

    pyramid = [x]
    for branch, bins in zip(params["psp"], cfg.pool_sizes):
        y = adaptive_avg_pool(x, bins)
        y = jax.nn.relu(_group_norm(branch["gn"],
                                    conv2d(branch["conv"], y), cfg.groups))
        pyramid.append(resize_bilinear(y, (x.shape[1], x.shape[2]),
                                       h_axis=1, w_axis=2))

    x = jnp.concatenate(pyramid, axis=-1)
    x = jax.nn.relu(_group_norm(params["fuse_gn"],
                                conv2d(params["fuse"], x), cfg.groups))
    logits = conv2d(params["head"], x).astype(jnp.float32)
    if logits.shape[1] != images.shape[1]:
        logits = resize_bilinear(logits, (images.shape[1], images.shape[2]),
                                 h_axis=1, w_axis=2)
    return logits
