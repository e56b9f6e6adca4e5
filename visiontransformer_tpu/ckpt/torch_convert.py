"""PyTorch-checkpoint → JAX-pytree converter.

Loads the reference's Lightning checkpoints (written by ModelCheckpoint,
reference model/CE/trainCurrentViTmodel.py:69, loaded back via
``torch.load(ckpt)['state_dict']`` at model/CE/testViTModel.py:117-118) into
this package's param pytrees, for fp32-tolerance parity testing and for
serving reference-trained weights on TPU.

Weight-layout translations:
- torch Linear stores (out, in); ours is (in, out)          → transpose.
- torch Conv2d stores OIHW; ours is HWIO                    → transpose(2,3,1,0).
- HF's three q/k/v Linears fuse into one (H, 3H) kernel
  (models/vit.py reshapes the 3H axis as [3, heads, head_dim], so q/k/v
  concatenation order and HF's row-major head split line up exactly).
- The patch-embedding conv becomes a (p²·C, H) matmul kernel; torch's
  (O, C, p, p) transposes to (p, p, C, O) then flattens, matching
  models/vit.py:patchify's (ph, pw, C) pixel order.

HF ViTModel's pooler is deliberately dropped — the reference only consumes
`last_hidden_state` (reference model/CE/classes.py:248).
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np
import jax.numpy as jnp

from visiontransformer_tpu.configs import ViTConfig, ViTSegConfig


Array = np.ndarray


def _to_np(x) -> Array:
    if hasattr(x, "detach"):  # torch tensor without importing torch
        x = x.detach().cpu().numpy()
    return np.asarray(x, dtype=np.float32)


def _linear(state: Mapping[str, Array], prefix: str) -> Dict[str, jnp.ndarray]:
    out = {"kernel": jnp.asarray(_to_np(state[prefix + ".weight"]).T)}
    bias_key = prefix + ".bias"
    if bias_key in state:
        out["bias"] = jnp.asarray(_to_np(state[bias_key]))
    return out


def _layer_norm(state: Mapping[str, Array], prefix: str) -> Dict[str, jnp.ndarray]:
    return {"scale": jnp.asarray(_to_np(state[prefix + ".weight"])),
            "bias": jnp.asarray(_to_np(state[prefix + ".bias"]))}


def _conv(state: Mapping[str, Array], prefix: str) -> Dict[str, jnp.ndarray]:
    w = _to_np(state[prefix + ".weight"])  # OIHW
    return {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0)),
            "bias": jnp.asarray(_to_np(state[prefix + ".bias"]))}


def convert_hf_vit_state(state: Mapping[str, Array], cfg: ViTConfig,
                         prefix: str = "") -> dict:
    """HF ViTModel state_dict → models/vit.py param pytree."""
    p = prefix
    w = _to_np(state[p + "embeddings.patch_embeddings.projection.weight"])
    patch_kernel = w.transpose(2, 3, 1, 0).reshape(-1, cfg.hidden_size)
    params = {
        "patch_embed": {
            "kernel": jnp.asarray(patch_kernel),
            "bias": jnp.asarray(_to_np(
                state[p + "embeddings.patch_embeddings.projection.bias"])),
        },
        "cls_token": jnp.asarray(_to_np(state[p + "embeddings.cls_token"])),
        "pos_embed": jnp.asarray(_to_np(
            state[p + "embeddings.position_embeddings"])),
        "final_ln": _layer_norm(state, p + "layernorm"),
        "layers": [],
    }
    for i in range(cfg.num_hidden_layers):
        lp = f"{p}encoder.layer.{i}."
        q = _linear(state, lp + "attention.attention.query")
        k = _linear(state, lp + "attention.attention.key")
        v = _linear(state, lp + "attention.attention.value")
        qkv = {"kernel": jnp.concatenate(
            [q["kernel"], k["kernel"], v["kernel"]], axis=1)}
        if "bias" in q:
            qkv["bias"] = jnp.concatenate([q["bias"], k["bias"], v["bias"]])
        params["layers"].append({
            "ln1": _layer_norm(state, lp + "layernorm_before"),
            "qkv": qkv,
            "attn_out": _linear(state, lp + "attention.output.dense"),
            "ln2": _layer_norm(state, lp + "layernorm_after"),
            "mlp_in": _linear(state, lp + "intermediate.dense"),
            "mlp_out": _linear(state, lp + "output.dense"),
        })
    return params


def convert_vitseg_state(state: Mapping[str, Array], cfg: ViTSegConfig,
                         backbone_prefix: str = "model.backbone.",
                         head_prefix: str = "model.seg_head.") -> dict:
    """Full ViTSegmentationModel state_dict (Lightning `model.` prefixes,
    reference model/CE/classes.py:240-244 head indices 0 and 2) → pytree."""
    return {
        "backbone": convert_hf_vit_state(state, cfg.vit, backbone_prefix),
        "head_conv1": _conv(state, head_prefix + "0"),
        "head_conv2": _conv(state, head_prefix + "2"),
    }


def load_lightning_checkpoint(path: str, cfg: ViTSegConfig) -> dict:
    """Load a reference .ckpt file from disk (requires torch, CPU-only)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state = ckpt.get("state_dict", ckpt)
    return convert_vitseg_state(state, cfg)


# --------------------------------------------------------------------- export
# The inverse direction: TPU-trained pytrees exported as reference-format
# Lightning state_dicts, so models trained here load back into the
# reference's serving stack (torch.load(ckpt)['state_dict'] at reference
# model/CE/testViTModel.py:117-118) with the exact key names its
# ViTSegmentationModel produces (model/CE/classes.py:240-262).

def _np(leaf) -> Array:
    # copy=True: jax Arrays export as read-only numpy views, which
    # torch.from_numpy rejects with a warning.
    return np.array(leaf, dtype=np.float32, copy=True)


def _export_linear(p: dict, out: Dict[str, Array], prefix: str) -> None:
    out[prefix + ".weight"] = _np(p["kernel"]).T
    if "bias" in p:
        out[prefix + ".bias"] = _np(p["bias"])


def _export_layer_norm(p: dict, out: Dict[str, Array], prefix: str) -> None:
    out[prefix + ".weight"] = _np(p["scale"])
    out[prefix + ".bias"] = _np(p["bias"])


def _export_conv(p: dict, out: Dict[str, Array], prefix: str) -> None:
    out[prefix + ".weight"] = _np(p["kernel"]).transpose(3, 2, 0, 1)  # HWIO→OIHW
    out[prefix + ".bias"] = _np(p["bias"])


def export_hf_vit_state(params: dict, cfg: ViTConfig,
                        prefix: str = "",
                        include_pooler: bool = True) -> Dict[str, Array]:
    """models/vit.py param pytree → HF ViTModel state_dict (numpy values).

    include_pooler emits zero pooler weights so strict load_state_dict
    succeeds against an HF ViTModel(add_pooling_layer=True) — the pooler
    is not part of this framework's forward and the reference never uses
    it (it consumes only last_hidden_state, model/CE/classes.py:248)."""
    p, h = prefix, cfg.hidden_size
    out: Dict[str, Array] = {}
    patch = _np(params["patch_embed"]["kernel"])  # (p²·C, H)
    out[p + "embeddings.patch_embeddings.projection.weight"] = (
        patch.reshape(cfg.patch_size, cfg.patch_size, cfg.num_channels, h)
        .transpose(3, 2, 0, 1))  # → OIHW
    out[p + "embeddings.patch_embeddings.projection.bias"] = _np(
        params["patch_embed"]["bias"])
    out[p + "embeddings.cls_token"] = _np(params["cls_token"])
    out[p + "embeddings.position_embeddings"] = _np(params["pos_embed"])
    _export_layer_norm(params["final_ln"], out, p + "layernorm")

    for i, layer in enumerate(params["layers"]):
        lp = f"{p}encoder.layer.{i}."
        kernel = _np(layer["qkv"]["kernel"])  # (H, 3H), [q|k|v] columns
        for j, name in enumerate(("query", "key", "value")):
            dst = lp + f"attention.attention.{name}"
            out[dst + ".weight"] = kernel[:, j * h:(j + 1) * h].T
            if "bias" in layer["qkv"]:
                bias = _np(layer["qkv"]["bias"])
                out[dst + ".bias"] = bias[j * h:(j + 1) * h]
        _export_layer_norm(layer["ln1"], out, lp + "layernorm_before")
        _export_linear(layer["attn_out"], out, lp + "attention.output.dense")
        _export_layer_norm(layer["ln2"], out, lp + "layernorm_after")
        _export_linear(layer["mlp_in"], out, lp + "intermediate.dense")
        _export_linear(layer["mlp_out"], out, lp + "output.dense")

    if include_pooler:
        out[p + "pooler.dense.weight"] = np.zeros((h, h), np.float32)
        out[p + "pooler.dense.bias"] = np.zeros((h,), np.float32)
    return out


def export_vitseg_state(params: dict, cfg: ViTSegConfig,
                        backbone_prefix: str = "model.backbone.",
                        head_prefix: str = "model.seg_head.",
                        include_pooler: bool = True) -> Dict[str, Array]:
    """Full pytree → reference ViTSegmentationModel state_dict
    (Lightning `model.` prefixes, head Sequential indices 0 and 2,
    reference model/CE/classes.py:240-244)."""
    out = export_hf_vit_state(params["backbone"], cfg.vit, backbone_prefix,
                              include_pooler=include_pooler)
    _export_conv(params["head_conv1"], out, head_prefix + "0")
    _export_conv(params["head_conv2"], out, head_prefix + "2")
    return out


def save_lightning_checkpoint(path: str, params: dict, cfg: ViTSegConfig, *,
                              epoch: int = 0, global_step: int = 0) -> str:
    """Write a torch-loadable .ckpt with the reference's checkpoint shape:
    {"state_dict": ..., "epoch": N, "global_step": M} (the fields its
    eval harness reads, reference model/CE/datasetTestViTmodel.py:131
    parses epoch= from the filename, testViTModel.py:117 the dict).
    Requires torch (CPU-only)."""
    import torch

    state = {k: torch.from_numpy(np.ascontiguousarray(v))
             for k, v in export_vitseg_state(params, cfg).items()}
    torch.save({"state_dict": state, "epoch": epoch,
                "global_step": global_step}, path)
    return path


def convert_hf_segformer_state(state: Mapping[str, Array],
                               encoder_name: str) -> dict:
    """HF ``SegformerModel`` / ``SegformerForSemanticSegmentation``
    state_dict → the models/mit.py encoder pytree.

    Key layout per HF transformers modeling_segformer.py:
    ``encoder.patch_embeddings.{i}.{proj,layer_norm}``,
    ``encoder.block.{i}.{j}.{layer_norm_1,attention.self.(query|key|value|
    sr|layer_norm),attention.output.dense,layer_norm_2,mlp.(dense1|
    dwconv.dwconv|dense2)}``, ``encoder.layer_norm.{i}`` — the
    ``segformer.`` prefix (present on the ForSemanticSegmentation wrapper)
    is stripped if found. The depthwise Mix-FFN conv stores (C,1,3,3) in
    torch groups layout; transpose(2,3,1,0) yields our (3,3,1,C) HWIO
    feature-group kernel. fp32 parity vs the live HF module is asserted
    in tests/test_mit.py."""
    from visiontransformer_tpu.models.mit import MIT_PRESETS

    state = {k.removeprefix("segformer."): v for k, v in state.items()}
    dims, depths, _, srs = MIT_PRESETS[encoder_name]
    stages = []
    for i, (depth, sr) in enumerate(zip(depths, srs)):
        blocks = []
        for j in range(depth):
            b = f"encoder.block.{i}.{j}."
            attn = {
                "q": _linear(state, b + "attention.self.query"),
                "k": _linear(state, b + "attention.self.key"),
                "v": _linear(state, b + "attention.self.value"),
                "proj": _linear(state, b + "attention.output.dense"),
            }
            if sr > 1:
                attn["sr"] = _conv(state, b + "attention.self.sr")
                attn["sr_ln"] = _layer_norm(state,
                                            b + "attention.self.layer_norm")
            blocks.append({
                "ln1": _layer_norm(state, b + "layer_norm_1"),
                "attn": attn,
                "ln2": _layer_norm(state, b + "layer_norm_2"),
                "ffn": {
                    "fc1": _linear(state, b + "mlp.dense1"),
                    "dw": _conv(state, b + "mlp.dwconv.dwconv"),
                    "fc2": _linear(state, b + "mlp.dense2"),
                },
            })
        e = f"encoder.patch_embeddings.{i}."
        stages.append({
            "embed": _conv(state, e + "proj"),
            "embed_ln": _layer_norm(state, e + "layer_norm"),
            "blocks": blocks,
            "norm": _layer_norm(state, f"encoder.layer_norm.{i}"),
        })
    return {"stages": stages}


def convert_hf_segformer_seg_state(state: Mapping[str, Array],
                                   cfg) -> dict:
    """HF ``SegformerForSemanticSegmentation`` state_dict → the full
    models/segformer.py pytree (MiT encoder + all-MLP decode head).

    ``cfg`` is a SegformerConfig with a mit_* encoder and
    ``head_norm="affine"``. Decode-head translations (HF
    modeling_segformer.py SegformerDecodeHead):
    - per-stage ``linear_c.{i}.proj`` Linears become our 1×1 conv
      projections ((in,out).T reshaped to (1,1,in,out) HWIO);
    - HF concatenates the upsampled stages deepest-first while we keep
      encoder order (shallowest-first), so the bias-less ``linear_fuse``
      kernel's input-channel blocks are reversed at conversion;
    - ``batch_norm`` (inference mode) folds to a per-channel affine:
      scale = γ/√(var+ε), bias = β − mean·scale;
    - ``classifier`` is our 1×1 head conv.
    fp32 full-model parity vs the live HF module is asserted in
    tests/test_mit.py."""
    state = {k.removeprefix("segformer."): v for k, v in state.items()}
    if cfg.head_norm != "affine":
        raise ValueError("HF decode-head weights need head_norm='affine' "
                         "(folded BatchNorm); got %r" % cfg.head_norm)
    params = convert_hf_segformer_state(state, cfg.encoder_name)

    c = cfg.embed_channels
    n_levels = len(cfg.level_channels)
    params["proj"] = []
    for i in range(n_levels):
        w = _to_np(state[f"decode_head.linear_c.{i}.proj.weight"])  # (out,in)
        params["proj"].append({
            "kernel": jnp.asarray(w.T[None, None]),
            "bias": jnp.asarray(_to_np(
                state[f"decode_head.linear_c.{i}.proj.bias"])),
        })

    fuse_w = _to_np(state["decode_head.linear_fuse.weight"])  # (C,4C,1,1)
    blocks = fuse_w.reshape(c, n_levels, c, 1, 1)[:, ::-1]  # deep→shallow
    fuse_kernel = blocks.reshape(c, n_levels * c, 1, 1).transpose(2, 3, 1, 0)

    eps = 1e-5  # torch BatchNorm2d default
    gamma = _to_np(state["decode_head.batch_norm.weight"])
    beta = _to_np(state["decode_head.batch_norm.bias"])
    mean = _to_np(state["decode_head.batch_norm.running_mean"])
    var = _to_np(state["decode_head.batch_norm.running_var"])
    scale = gamma / np.sqrt(var + eps)
    params["fuse"] = {
        "conv": {"kernel": jnp.asarray(fuse_kernel),
                 "bias": jnp.zeros((c,), jnp.float32)},
        "affine": {"scale": jnp.asarray(scale),
                   "bias": jnp.asarray(beta - mean * scale)},
    }
    params["head"] = _conv(state, "decode_head.classifier")
    params["norm_mean"] = jnp.asarray((0.485, 0.456, 0.406), jnp.float32)
    params["norm_std"] = jnp.asarray((0.229, 0.224, 0.225), jnp.float32)
    return params
