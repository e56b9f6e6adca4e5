"""MiT (Mix Transformer) hierarchical encoder — SegFormer's backbone.

The reference's alternate-architecture surface is `smp.create_model(arch,
encoder_name, ...)` (model/CE/classes.py:106-110); with smp 0.4.0 the
"segformer" arch is canonically paired with the `mit_b*` encoders. This
module implements that encoder natively (Xie et al. 2021): four stages of
overlapping patch embedding (7×7/s4 then 3×3/s2 convs), each running
transformer blocks with

- **efficient (spatial-reduction) attention** — keys/values are
  spatially reduced by an r×r strided conv before attention, so stage 1
  attends 3136 queries to 49 KV tokens instead of 3136² pairs. On TPU
  this is two skinny MXU matmuls per head — no flash kernel needed
  because the quadratic term is designed away;
- **Mix-FFN** — 1×1 expand, 3×3 depthwise conv (the positional signal —
  MiT has no position embeddings, so it serves any input size without
  interpolating learned tables), GELU, 1×1 project.

Pure-functional like every other model here: init/apply pairs over
pytrees, NHWC throughout, LayerNorm in f32. Numerics match HF
`transformers` SegformerModel exactly (fp32 parity proven in
tests/test_mit.py): embed convs pad symmetrically by kernel//2
(modeling_segformer.py SegformerOverlapPatchEmbeddings, padding =
patch_size // 2 — NOT XLA "SAME", which splits odd padding
asymmetrically for strided convs) and every LayerNorm uses the torch
default eps 1e-5 (HF constructs bare nn.LayerNorm throughout the
encoder). `ckpt/torch_convert.convert_hf_segformer_state` loads real
pretrained mit_b* weights from an HF state_dict.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from visiontransformer_tpu.nn.layers import (
    conv2d,
    conv2d_init,
    depthwise,
    depthwise_init,
    gelu_exact,
    layer_norm,
    layer_norm_init,
    linear,
    linear_init,
)

# SegFormer paper table 6: dims / depths / heads / KV spatial-reduction
# ratios per stage. MLP expansion is 4 everywhere (8 for b0's last stages
# in some repos; the paper's official code uses 4,4,4,4 for b0 too).
MIT_PRESETS = {
    "mit_b0": ((32, 64, 160, 256), (2, 2, 2, 2), (1, 2, 5, 8), (8, 4, 2, 1)),
    "mit_b1": ((64, 128, 320, 512), (2, 2, 2, 2), (1, 2, 5, 8), (8, 4, 2, 1)),
    "mit_b2": ((64, 128, 320, 512), (3, 4, 6, 3), (1, 2, 5, 8), (8, 4, 2, 1)),
    "mit_b3": ((64, 128, 320, 512), (3, 4, 18, 3), (1, 2, 5, 8), (8, 4, 2, 1)),
    "mit_b4": ((64, 128, 320, 512), (3, 8, 27, 3), (1, 2, 5, 8), (8, 4, 2, 1)),
    "mit_b5": ((64, 128, 320, 512), (3, 6, 40, 3), (1, 2, 5, 8), (8, 4, 2, 1)),
}

_LN_EPS = 1e-5  # torch nn.LayerNorm default, used bare by HF's encoder
_MLP_RATIO = 4


def _attn_init(keys, dim: int, sr_ratio: int):
    params = {
        "q": linear_init(next(keys), dim, dim),
        "k": linear_init(next(keys), dim, dim),
        "v": linear_init(next(keys), dim, dim),
        "proj": linear_init(next(keys), dim, dim),
    }
    if sr_ratio > 1:
        params["sr"] = conv2d_init(next(keys), dim, dim, sr_ratio)
        params["sr_ln"] = layer_norm_init(dim)
    return params


def _attn_apply(params, x, heads: int, sr_ratio: int):
    """Efficient self-attention on an NHWC feature map."""
    b, h, w, d = x.shape
    hd = d // heads
    q = linear(params["q"], x.reshape(b, h * w, d))

    kv_src = x
    if sr_ratio > 1:
        kv_src = conv2d(params["sr"], x, stride=sr_ratio)
        kv_src = layer_norm(params["sr_ln"], kv_src, eps=_LN_EPS)
    m = kv_src.shape[1] * kv_src.shape[2]
    k = linear(params["k"], kv_src.reshape(b, m, d))
    v = linear(params["v"], kv_src.reshape(b, m, d))

    q = q.reshape(b, h * w, heads, hd).transpose(0, 2, 1, 3)
    k = k.reshape(b, m, heads, hd).transpose(0, 2, 1, 3)
    v = v.reshape(b, m, heads, hd).transpose(0, 2, 1, 3)

    scale = jnp.asarray(hd, jnp.float32) ** -0.5
    logits = jnp.einsum("bhnd,bhmd->bhnm", q, k) * scale.astype(q.dtype)
    attn = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(x.dtype)
    out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
    out = out.transpose(0, 2, 1, 3).reshape(b, h * w, d)
    return linear(params["proj"], out).reshape(b, h, w, d)


def _mixffn_init(keys, dim: int):
    hidden = dim * _MLP_RATIO
    return {
        "fc1": linear_init(next(keys), dim, hidden),
        "dw": depthwise_init(next(keys), hidden, 3),
        "fc2": linear_init(next(keys), hidden, dim),
    }


def _mixffn_apply(params, x):
    y = linear(params["fc1"], x)
    y = gelu_exact(depthwise(params["dw"], y))
    return linear(params["fc2"], y)


def _block_init(keys, dim: int, sr_ratio: int):
    return {
        "ln1": layer_norm_init(dim),
        "attn": _attn_init(keys, dim, sr_ratio),
        "ln2": layer_norm_init(dim),
        "ffn": _mixffn_init(keys, dim),
    }


def _block_apply(params, x, heads: int, sr_ratio: int):
    x = x + _attn_apply(params["attn"],
                        layer_norm(params["ln1"], x, eps=_LN_EPS),
                        heads, sr_ratio)
    return x + _mixffn_apply(params["ffn"],
                             layer_norm(params["ln2"], x, eps=_LN_EPS))


def mit_encoder_init(keys, encoder_name: str, in_channels: int = 3) -> dict:
    dims, depths, _, srs = MIT_PRESETS[encoder_name]
    params = {"stages": []}
    cin = in_channels
    for i, (dim, depth, sr) in enumerate(zip(dims, depths, srs)):
        stage = {
            "embed": conv2d_init(next(keys), cin, dim, 7 if i == 0 else 3),
            "embed_ln": layer_norm_init(dim),
            "blocks": [_block_init(keys, dim, sr) for _ in range(depth)],
            "norm": layer_norm_init(dim),
        }
        params["stages"].append(stage)
        cin = dim
    return params


def mit_encoder_apply(params: dict, x: jnp.ndarray,
                      encoder_name: str) -> Sequence[jnp.ndarray]:
    """NHWC image -> [OS-4, OS-8, OS-16, OS-32] feature maps."""
    dims, depths, heads, srs = MIT_PRESETS[encoder_name]
    feats = []
    for i, stage in enumerate(params["stages"]):
        k = 7 if i == 0 else 3  # embed kernel; torch pads k//2 each side
        x = conv2d(stage["embed"], x, stride=4 if i == 0 else 2,
                   padding=[(k // 2, k // 2)] * 2)
        x = layer_norm(stage["embed_ln"], x, eps=_LN_EPS)
        for block in stage["blocks"]:
            x = _block_apply(block, x, heads[i], srs[i])
        x = layer_norm(stage["norm"], x, eps=_LN_EPS)
        feats.append(x)
    return feats
