"""Post-training W8A8 dynamic int8 quantization (ViT backbone + the full
conv-family model zoo).

Opt-in inference acceleration (like token merging, ops/token_merge.py): the
encoder's dense layers — fused QKV, attention output, MLP in/out, which
carry ~95% of a ViT forward's FLOPs — run on the MXU's int8 path, measured
1.2–1.6× the bf16 contraction rate at serving shapes on v5e (the part's
peak is 394 int8 TOPS vs 197 bf16 TFLOPS; docs/PERFORMANCE.md round 4).

Scheme (the standard near-lossless PTQ recipe for ViTs — see the survey
arXiv:2405.00314 §4: per-channel symmetric weights + dynamic per-token
activations):

- weights: symmetric per-OUTPUT-channel scales, ``s_w[o] = max|W[:,o]|/127``,
  quantized once offline (``quantize_vitseg_params``);
- activations: symmetric per-token dynamic scales computed inside the
  forward, ``s_x[t] = max|x[t,:]|/127`` — no calibration set needed, robust
  to ViT's long-tailed activation outliers because each token normalizes
  itself;
- accumulation in int32 on the MXU, dequantized as ``acc * s_x * s_w``
  (rank-1 outer product of scales), bias added in fp32.

Everything else (patch embed, LayerNorms, attention softmax/PV, seg head,
upsample) stays in the model's compute dtype: those ops are a few percent
of the FLOPs and carry the numerics that PTQ literature leaves unquantized.

The quantized form is a params-level transformation: ``linear()``
(nn/layers.py) dispatches on the presence of ``kernel_q``, so every model
path (vitseg, serving worker, sweep eval) picks it up with zero call-site
changes. Quantize at load time; checkpoints stay fp32.

Reference anchor: none — the reference serves fp32 eager torch
(model/CE/testViTModel.py:117-126). This is a beyond-reference serving
knob, registered per model like token_merge_r (serve/store.py).
"""

from __future__ import annotations

import jax.numpy as jnp

# The encoder-layer linears that carry the FLOPs (models/vit.py
# _encoder_layer). patch_embed is excluded: first-layer quantization is the
# classic PTQ accuracy cliff and its FLOP share is negligible.
QUANTIZED_LAYER_KEYS = ("qkv", "attn_out", "mlp_in", "mlp_out")


def quantize_linear_params(params: dict) -> dict:
    """{"kernel": (in, out) fp32, ["bias"]} -> W8A8 form
    {"kernel_q": int8, "kernel_scale": (out,) fp32, ["bias"]}."""
    w = jnp.asarray(params["kernel"], jnp.float32)
    scale = jnp.max(jnp.abs(w), axis=0) / 127.0
    scale = jnp.maximum(scale, 1e-12)
    wq = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    out = {"kernel_q": wq, "kernel_scale": scale}
    if "bias" in params:
        out["bias"] = params["bias"]
    return out


def quantize_conv_params(params: dict) -> dict:
    """{"kernel": (kh, kw, in, out) HWIO fp32, "bias"} -> W8A8 form
    {"kernel_q": int8, "kernel_scale": (out,) fp32, "bias"}. Scales are
    per-output-channel (reduction never crosses the O axis)."""
    w = jnp.asarray(params["kernel"], jnp.float32)
    scale = jnp.max(jnp.abs(w), axis=(0, 1, 2)) / 127.0
    scale = jnp.maximum(scale, 1e-12)
    wq = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    out = {"kernel_q": wq, "kernel_scale": scale}
    if "bias" in params:
        out["bias"] = params["bias"]
    return out


# Subtrees the generic quantizer leaves in the compute dtype wherever they
# appear: the logits head (classic last-layer PTQ cliff, negligible FLOPs
# at num_classes channels) and the input stem / patch embed (first-layer
# cliff; also caught structurally by the cin<=4 rule below).
QUANT_SKIP_KEYS = frozenset({"head", "stem", "patch_embed"})


def quantize_params_tree(params, *, skip_keys=QUANT_SKIP_KEYS):
    """Generic post-training W8A8 quantizer for any model-family pytree
    (models/registry.py): walks dicts/lists and rewrites every linear
    (2-D kernel) and every interior conv (4-D HWIO kernel) param dict to
    the quantized form that ``linear``/``conv2d`` (nn/layers.py) dispatch
    on. Left in the compute dtype:

    - ``skip_keys`` subtrees (logits head, input stem, patch embed);
    - depthwise convs (HWIO with I==1 — VPU-bound, no MXU win);
    - input-facing convs (cin <= 4, i.e. RGB/RGBA stems) — the
      first-layer quantization cliff, structurally detected.

    The vitseg family keeps its dedicated ``quantize_vitseg_params``
    (encoder-layer allowlist); this walk serves the conv families and the
    MiT/segformer encoders. Returns a new pytree; input unchanged."""
    def walk(node):
        if isinstance(node, dict):
            kernel = node.get("kernel")
            if kernel is not None and hasattr(kernel, "ndim"):
                if kernel.ndim == 2:
                    return quantize_linear_params(node)
                if kernel.ndim == 4 and kernel.shape[2] > 4:
                    return quantize_conv_params(node)
                return node
            return {k: (v if k in skip_keys else walk(v))
                    for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return type(node)(walk(v) for v in node)
        return node

    return walk(params)


def tree_is_quantized(params) -> bool:
    """True if any param dict in the tree is in the W8A8 form."""
    found = False

    def walk(node):
        nonlocal found
        if found:
            return
        if isinstance(node, dict):
            if "kernel_q" in node:
                found = True
                return
            for v in node.values():
                walk(v)
        elif isinstance(node, (list, tuple)):
            for v in node:
                walk(v)

    walk(params)
    return found


def quantize_vit_params(backbone: dict) -> dict:
    """Quantize every encoder layer's dense weights in a ViT backbone
    pytree (models/vit.py layout). Returns a new pytree; input unchanged."""
    if not isinstance(backbone.get("layers"), (list, tuple)):
        raise ValueError(
            "expected a plain per-layer list backbone; pipeline-stacked "
            "params must be unstacked before quantization (ckpt/io.py)")
    new = dict(backbone)
    new["layers"] = [
        {k: (quantize_linear_params(v) if k in QUANTIZED_LAYER_KEYS else v)
         for k, v in layer.items()}
        for layer in backbone["layers"]
    ]
    return new


def quantize_vitseg_params(params: dict) -> dict:
    """Quantize the backbone of a vitseg params pytree (models/vitseg.py);
    the conv seg head stays in the compute dtype."""
    new = dict(params)
    new["backbone"] = quantize_vit_params(params["backbone"])
    return new


def is_quantized(params: dict) -> bool:
    """True if any param dict in the tree is in the W8A8 form — alias of
    ``tree_is_quantized`` so the answer is layout-independent (vitseg
    backbones and conv-family trees alike)."""
    return tree_is_quantized(params)
