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
