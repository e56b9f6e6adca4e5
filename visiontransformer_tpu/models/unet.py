"""UNet-style encoder-decoder segmentation family.

Capability-parity rebuild of the reference's alternate architecture
(`StructuralDamageModel` wrapping `smp.create_model(arch, encoder_name, ...)`
with per-encoder mean/std normalization buffers and CE loss, reference
model/CE/classes.py:105-219; identical copy model/PAED/classes.py:92-206).

TPU-native design choices (not a translation of smp internals):
- residual conv encoder with stride-2 downsampling, bilinear-upsample +
  skip-concat decoder — the classic UNet topology smp builds;
- GroupNorm instead of BatchNorm: batch statistics need cross-replica sync
  under data parallelism, while GN is batch-independent and shards freely
  (documented divergence);
- NHWC everywhere, convs lowered to the MXU by XLA;
- the encoder "preset" carries the normalization constants the way smp's
  get_preprocessing_params does (reference model/CE/classes.py:119-122).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from visiontransformer_tpu.nn.layers import (
    conv2d,
    conv2d_init,
    depthwise,
    depthwise_init,
)
from visiontransformer_tpu.ops.resize import resize_bilinear

# Encoder presets: (stage channels, blocks per stage, block kind). The
# channel/depth layouts mirror the torchvision/timm encoders smp wraps;
# "bottleneck" stages use the 1×1→3×3→1×1 residual block (expansion 4),
# "inverted" the MobileNetV2 expand→depthwise→project block (ReLU6, linear
# bottleneck, expansion 6), "mbconv" the EfficientNet variant (SiLU +
# squeeze-excitation). Structure-parity only — GroupNorm replaces BN
# (documented divergence) so these are not weight-compatible with timm.
ENCODER_PRESETS = {
    "resnet18": ((64, 64, 128, 256, 512), (2, 2, 2, 2), "basic"),
    "resnet34": ((64, 64, 128, 256, 512), (3, 4, 6, 3), "basic"),
    "resnet50": ((64, 256, 512, 1024, 2048), (3, 4, 6, 3), "bottleneck"),
    "mobilenetv2": ((32, 24, 32, 96, 320), (2, 3, 4, 3), "inverted"),
    "efficientnet_b0": ((32, 24, 40, 112, 320), (2, 2, 3, 4), "mbconv"),
    "small": ((32, 32, 64, 128, 256), (1, 1, 1, 1), "basic"),
}

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    encoder_name: str = "resnet34"
    in_channels: int = 3
    num_classes: int = 17
    decoder_channels: Tuple[int, ...] = (256, 128, 64, 32)
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


def _group_norm_init(channels: int):
    return {"scale": jnp.ones((channels,), jnp.float32),
            "bias": jnp.zeros((channels,), jnp.float32)}


def _group_norm(params, x, groups: int, eps: float = 1e-5):
    b, h, w, c = x.shape
    g = min(groups, c)
    while c % g:
        g -= 1
    orig = x.dtype
    x32 = x.astype(jnp.float32).reshape(b, h, w, g, c // g)
    mean = jnp.mean(x32, axis=(1, 2, 4), keepdims=True)
    var = jnp.var(x32, axis=(1, 2, 4), keepdims=True)
    x32 = (x32 - mean) * jax.lax.rsqrt(var + eps)
    x32 = x32.reshape(b, h, w, c) * params["scale"] + params["bias"]
    return x32.astype(orig)


def _block_init(key, cin: int, cout: int):
    k1, k2, k3 = jax.random.split(key, 3)
    params = {
        "conv1": conv2d_init(k1, cin, cout, 3),
        "gn1": _group_norm_init(cout),
        "conv2": conv2d_init(k2, cout, cout, 3),
        "gn2": _group_norm_init(cout),
    }
    if cin != cout:
        params["proj"] = conv2d_init(k3, cin, cout, 1)
    return params


def _bottleneck_init(key, cin: int, cout: int):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    mid = cout // 4
    params = {
        "conv1": conv2d_init(k1, cin, mid, 1),
        "gn1": _group_norm_init(mid),
        "conv2": conv2d_init(k2, mid, mid, 3),
        "gn2": _group_norm_init(mid),
        "conv3": conv2d_init(k3, mid, cout, 1),
        "gn3": _group_norm_init(cout),
    }
    if cin != cout:
        params["proj"] = conv2d_init(k4, cin, cout, 1)
    return params


def _inverted_init(key, cin: int, cout: int, *, se: bool = False,
                   expand: int = 6):
    """MobileNetV2 inverted-residual block params; with ``se`` the
    EfficientNet MBConv (squeeze-excitation on the expanded channels,
    reduction 0.25·cin as in the paper)."""
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    mid = cin * expand
    params = {
        "expand": conv2d_init(k1, cin, mid, 1),
        "gn_e": _group_norm_init(mid),
        "dw": depthwise_init(k2, mid, 3),
        "gn_d": _group_norm_init(mid),
        "project": conv2d_init(k3, mid, cout, 1),
        "gn_p": _group_norm_init(cout),
    }
    if se:
        hidden = max(1, cin // 4)
        params["se"] = {"fc1": conv2d_init(k4, mid, hidden, 1),
                        "fc2": conv2d_init(k5, hidden, mid, 1)}
    return params


def _inverted_apply(params, x, groups: int, stride: int):
    # SE presence selects the activation: MBConv (EfficientNet) is SiLU,
    # plain inverted residual (MobileNetV2) is ReLU6.
    act = jax.nn.silu if "se" in params else \
        (lambda v: jnp.minimum(jax.nn.relu(v), 6.0))
    y = act(_group_norm(params["gn_e"], conv2d(params["expand"], x), groups))
    y = act(_group_norm(params["gn_d"],
                        depthwise(params["dw"], y, stride=stride), groups))
    if "se" in params:
        s = jnp.mean(y, axis=(1, 2), keepdims=True)
        s = jax.nn.sigmoid(conv2d(params["se"]["fc2"],
                                  jax.nn.silu(conv2d(params["se"]["fc1"], s))))
        y = y * s
    y = _group_norm(params["gn_p"], conv2d(params["project"], y), groups)
    # Linear bottleneck: residual only at stride 1 / equal width, no
    # activation after the projection (MobileNetV2 §3.2).
    if stride == 1 and x.shape[-1] == y.shape[-1]:
        y = x + y
    return y


def _block_apply(params, x, groups: int, stride: int = 1):
    """Residual block. Dispatches structurally on the param dict: "dw"
    marks the inverted/MBConv variant, a third conv the bottleneck
    (1×1→3×3→1×1, stride on the 3×3 as in torchvision's ResNet v1.5);
    otherwise the basic 3×3→3×3."""
    if "dw" in params:
        return _inverted_apply(params, x, groups, stride)
    if "conv3" in params:
        y = conv2d(params["conv1"], x)
        y = jax.nn.relu(_group_norm(params["gn1"], y, groups))
        y = conv2d(params["conv2"], y, stride=stride)
        y = jax.nn.relu(_group_norm(params["gn2"], y, groups))
        y = conv2d(params["conv3"], y)
        y = _group_norm(params["gn3"], y, groups)
    else:
        y = conv2d(params["conv1"], x, stride=stride)
        y = jax.nn.relu(_group_norm(params["gn1"], y, groups))
        y = conv2d(params["conv2"], y)
        y = _group_norm(params["gn2"], y, groups)
    shortcut = x
    if "proj" in params:
        shortcut = conv2d(params["proj"], x, stride=stride)
    elif stride != 1:
        shortcut = x[:, ::stride, ::stride, :]
    return jax.nn.relu(y + shortcut)


def encoder_init(keys, cfg) -> dict:
    """Residual conv encoder (stem + stride-2 stages). ``keys`` is an
    iterator of PRNG keys; ``cfg`` any config with stage_channels /
    stage_blocks / in_channels (shared by all the conv families). The
    block kind (basic / bottleneck / inverted / mbconv) comes from the
    encoder preset."""
    channels = list(cfg.stage_channels)
    blocks = list(cfg.stage_blocks)
    kind = ENCODER_PRESETS[cfg.encoder_name][2]
    block_init = {
        "bottleneck": _bottleneck_init,
        "inverted": functools.partial(_inverted_init, se=False),
        "mbconv": functools.partial(_inverted_init, se=True),
    }.get(kind, _block_init)
    params = {"stem": conv2d_init(next(keys), cfg.in_channels, channels[0], 3),
              "stem_gn": _group_norm_init(channels[0]),
              "stages": []}
    cin = channels[0]
    for cout, n_blocks in zip(channels[1:], blocks):
        stage = []
        for b in range(n_blocks):
            stage.append(block_init(next(keys), cin if b == 0 else cout, cout))
            cin = cout
        params["stages"].append(stage)
    return params


def encoder_apply(params: dict, x: jnp.ndarray, groups: int):
    """Run the shared encoder; returns (deepest features, per-stage skip
    inputs, shallowest first)."""
    x = jax.nn.relu(_group_norm(params["stem_gn"],
                                conv2d(params["stem"], x), groups))
    skips = []
    for stage in params["stages"]:
        skips.append(x)
        for b_idx, block in enumerate(stage):
            x = _block_apply(block, x, groups,
                             stride=2 if b_idx == 0 else 1)
    return x, skips


def unet_init(key: jax.Array, cfg: UNetConfig) -> dict:
    channels = list(cfg.stage_channels)
    keys = iter(jax.random.split(key, 256))

    params = encoder_init(keys, cfg)
    params["decoder"] = []

    # Decoder: deepest -> shallowest, skip channels from encoder stages.
    skip_channels = channels[:-1][::-1] + [0]
    cin = channels[-1]
    for dec_c, skip_c in zip(cfg.decoder_channels, skip_channels):
        params["decoder"].append(
            _block_init(next(keys), cin + skip_c, dec_c))
        cin = dec_c
    params["head"] = conv2d_init(next(keys), cin, cfg.num_classes, 1)

    params["norm_mean"] = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    params["norm_std"] = jnp.asarray(IMAGENET_STD, jnp.float32)
    return params


def unet_apply(params: dict, images: jnp.ndarray, cfg: UNetConfig, *,
               deterministic: bool = True,
               rng: Optional[jax.Array] = None) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H, W, num_classes) logits at input resolution."""
    del deterministic, rng  # no dropout in this family
    x = images.astype(cfg.dtype)
    if cfg.normalize:
        x = (x - params["norm_mean"].astype(x.dtype)) / \
            params["norm_std"].astype(x.dtype)

    x, skips = encoder_apply(params, x, cfg.groups)

    skips = skips[::-1]
    for i, dec in enumerate(params["decoder"]):
        target = (x.shape[1] * 2, x.shape[2] * 2)
        x = resize_bilinear(x, target, h_axis=1, w_axis=2)
        if i < len(skips):
            skip = skips[i]
            if skip.shape[1] != x.shape[1]:
                skip = resize_bilinear(skip, (x.shape[1], x.shape[2]),
                                       h_axis=1, w_axis=2)
            x = jnp.concatenate([x, skip.astype(x.dtype)], axis=-1)
        x = _block_apply(dec, x, cfg.groups)

    logits = conv2d(params["head"], x).astype(jnp.float32)
    if logits.shape[1] != images.shape[1]:
        logits = resize_bilinear(logits, (images.shape[1], images.shape[2]),
                                 h_axis=1, w_axis=2)
    return logits
