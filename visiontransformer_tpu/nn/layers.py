"""Minimal pure-functional NN layers.

Every layer is a pair of functions: ``*_init(key, ...) -> params`` returning a
pytree of fp32 arrays, and an apply function taking ``(params, x, ...)``. No
module objects, no mutable state — parameters thread explicitly, which is what
makes jit/shard_map/pjit composition trivial and keeps the PyTorch-checkpoint
converter (ckpt/torch_convert.py) a plain key-mapping exercise.

Initializer semantics mirror HF transformers' ViT init so fresh models are
distributionally identical to the reference
(reference model/CE/classes.py:224-238 builds `ViTModel(ViTConfig(...))` whose
weights are trunc-normal(initializer_range), zero bias, LN weight=1 bias=0).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def trunc_normal(key, shape, std: float = 0.02, dtype=jnp.float32):
    """HF-style truncated normal: N(0, std) truncated to ±2 std."""
    return std * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)


def linear_init(key, in_features: int, out_features: int, std: float = 0.02,
                bias: bool = True):
    params = {"kernel": trunc_normal(key, (in_features, out_features), std)}
    if bias:
        params["bias"] = jnp.zeros((out_features,), jnp.float32)
    return params


def linear(params, x, *, dtype=None):
    """y = x @ W + b. Kernel stored (in, out) fp32; cast to the activation
    dtype (or an explicit ``dtype``) on use so bf16 compute stays bf16.

    Dispatches on the params form: a W8A8-quantized kernel (``kernel_q``,
    produced by ops/quant.py at model-load time) runs the int8 MXU path —
    inference-only, per-token dynamic activation scales."""
    if "kernel_q" in params:
        return _linear_w8a8(params, x, dtype=dtype)
    if dtype is not None:
        x = x.astype(dtype)
    kernel = params["kernel"].astype(x.dtype)
    y = jnp.dot(x, kernel, preferred_element_type=x.dtype)
    if "bias" in params:
        y = y + params["bias"].astype(y.dtype)
    return y


def _linear_w8a8(params, x, *, dtype=None):
    """int8 × int8 → int32 MXU contraction with per-token dynamic activation
    scales and per-output-channel weight scales (ops/quant.py docstring).
    Output dtype follows the activation dtype, like the fp path."""
    if dtype is not None:
        x = x.astype(dtype)
    out_dtype = x.dtype
    x32 = x.astype(jnp.float32)
    s_x = jnp.max(jnp.abs(x32), axis=-1, keepdims=True) / 127.0
    s_x = jnp.maximum(s_x, 1e-12)
    xq = jnp.clip(jnp.round(x32 / s_x), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, params["kernel_q"],
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * s_x * params["kernel_scale"]
    if "bias" in params:
        y = y + params["bias"]
    return y.astype(out_dtype)


def layer_norm_init(features: int):
    return {"scale": jnp.ones((features,), jnp.float32),
            "bias": jnp.zeros((features,), jnp.float32)}


def layer_norm(params, x, *, eps: float = 1e-12):
    """LayerNorm over the last axis, computed in fp32 for stability then cast
    back — matches torch LayerNorm numerics under bf16 activations."""
    orig_dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * params["scale"] + params["bias"]
    return y.astype(orig_dtype)


def gelu_exact(x):
    """Exact (erf) GELU — HF ViT uses ACT2FN['gelu'] which is the exact erf
    form, not the tanh approximation."""
    return jax.nn.gelu(x, approximate=False)


def conv2d_init(key, in_channels: int, out_channels: int, kernel_size: int,
                std: float = 0.02):
    """Conv kernel stored HWIO (JAX-native layout)."""
    shape = (kernel_size, kernel_size, in_channels, out_channels)
    return {"kernel": trunc_normal(key, shape, std),
            "bias": jnp.zeros((out_channels,), jnp.float32)}


def conv2d(params, x, *, stride: int = 1, padding="SAME", dilation: int = 1,
           dtype=None):
    """NHWC conv. XLA maps this straight onto the MXU for large channel
    counts. ``dilation`` is atrous kernel dilation (rhs_dilation); with
    SAME padding the output keeps the input's spatial size.

    Dispatches on the params form like ``linear``: a W8A8-quantized kernel
    (``kernel_q``, ops/quant.py) runs the int8 MXU conv path."""
    if "kernel_q" in params:
        return _conv2d_w8a8(params, x, stride=stride, padding=padding,
                            dilation=dilation, dtype=dtype)
    if dtype is not None:
        x = x.astype(dtype)
    kernel = params["kernel"].astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        x, kernel,
        window_strides=(stride, stride),
        padding=padding,
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype,
    )
    return y + params["bias"].astype(y.dtype)


def _conv2d_w8a8(params, x, *, stride, padding, dilation, dtype=None):
    """int8 × int8 → int32 MXU convolution with a dynamic PER-SAMPLE
    activation scale and per-output-channel weight scales.

    Per-sample (not per-token) activation scales: a conv reduction window
    spans H×W×C positions, so the dequantization factor must be uniform
    over everything one output pixel reduces — the finest legal dynamic
    granularity is one scale per batch element. Weight scales are
    per-output-channel like the linear path (reduction never crosses the
    O axis of an HWIO kernel)."""
    if dtype is not None:
        x = x.astype(dtype)
    out_dtype = x.dtype
    x32 = x.astype(jnp.float32)
    s_x = jnp.max(jnp.abs(x32), axis=(1, 2, 3), keepdims=True) / 127.0
    s_x = jnp.maximum(s_x, 1e-12)
    xq = jnp.clip(jnp.round(x32 / s_x), -127, 127).astype(jnp.int8)
    acc = jax.lax.conv_general_dilated(
        xq, params["kernel_q"],
        window_strides=(stride, stride),
        padding=padding,
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * s_x * params["kernel_scale"]
    return (y + params["bias"]).astype(out_dtype)


def dropout(key: Optional[jax.Array], x, rate: float, *, deterministic: bool):
    """Inverted dropout, matching torch nn.Dropout semantics."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x))


def depthwise_init(key, channels: int, kernel_size: int = 3,
                   std: float = 0.02):
    """Depthwise conv kernel, HWIO with I=1 and feature_group_count=C."""
    shape = (kernel_size, kernel_size, 1, channels)
    return {"kernel": trunc_normal(key, shape, std),
            "bias": jnp.zeros((channels,), jnp.float32)}


def depthwise(params, x, *, stride: int = 1, padding="SAME"):
    """Per-channel (grouped) conv on NHWC. The positional/spatial mixer of
    MobileNet-style blocks and SegFormer's Mix-FFN; runs on the VPU (no
    cross-channel contraction), so it is cheap next to the 1x1 MXU convs
    around it."""
    kernel = params["kernel"].astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        x, kernel, window_strides=(stride, stride), padding=padding,
        feature_group_count=x.shape[-1],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + params["bias"].astype(y.dtype)
