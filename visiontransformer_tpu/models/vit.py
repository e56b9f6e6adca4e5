"""ViT backbone — TPU-native reimplementation of the reference's HF ViTModel.

Semantics match `transformers.ViTModel(ViTConfig(...))` as instantiated at
reference model/CE/classes.py:221-238 (and its PAED copy classes.py:372-395):

- patch embedding: Conv(p×p, stride p) — implemented here as patchify-reshape +
  one big matmul, which is the MXU-native formulation (identical arithmetic to
  the strided conv, but XLA sees a single (B·N, p²C) @ (p²C, H) contraction);
- learned CLS token prepended, learned absolute position embeddings, dropout;
- pre-LN encoder blocks: x += MHA(LN(x)); x += MLP(LN(x)) with exact-erf GELU
  and intermediate size 3072;
- final LayerNorm (eps 1e-12, the HF default);
- fused QKV projection: one (H, 3H) matmul instead of HF's three separate
  linears (identical math; the torch-checkpoint converter concatenates the
  reference's q/k/v weights, see ckpt/torch_convert.py).

All activations flow NHWC / (B, N, H); params are a nested dict pytree of fp32
leaves, cast to ``cfg_dtype`` at use.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from visiontransformer_tpu.configs import ViTConfig
from visiontransformer_tpu.nn.layers import (
    dropout,
    gelu_exact,
    layer_norm,
    layer_norm_init,
    linear,
    linear_init,
    trunc_normal,
)
from visiontransformer_tpu.ops.attention import multi_head_attention


def vit_init(key: jax.Array, cfg: ViTConfig) -> dict:
    """Initialize backbone params (fp32), HF-ViT-distribution-identical."""
    keys = jax.random.split(key, 4 + cfg.num_hidden_layers)
    patch_dim = cfg.patch_size * cfg.patch_size * cfg.num_channels
    std = cfg.initializer_range

    params = {
        "patch_embed": linear_init(keys[0], patch_dim, cfg.hidden_size, std),
        "cls_token": trunc_normal(keys[1], (1, 1, cfg.hidden_size), std),
        "pos_embed": trunc_normal(keys[2], (1, cfg.seq_len, cfg.hidden_size), std),
        "final_ln": layer_norm_init(cfg.hidden_size),
        "layers": [],
    }
    for i in range(cfg.num_hidden_layers):
        lk = jax.random.split(keys[4 + i], 4)
        params["layers"].append({
            "ln1": layer_norm_init(cfg.hidden_size),
            "qkv": linear_init(lk[0], cfg.hidden_size, 3 * cfg.hidden_size, std,
                               bias=cfg.qkv_bias),
            "attn_out": linear_init(lk[1], cfg.hidden_size, cfg.hidden_size, std),
            "ln2": layer_norm_init(cfg.hidden_size),
            "mlp_in": linear_init(lk[2], cfg.hidden_size, cfg.intermediate_size, std),
            "mlp_out": linear_init(lk[3], cfg.intermediate_size, cfg.hidden_size, std),
        })
    return params


def patchify(images: jnp.ndarray, patch_size: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B, N, p*p*C) with (ph, pw, C) pixel order inside each
    patch — the layout the torch conv kernel transposes into."""
    b, h, w, c = images.shape
    gh, gw = h // patch_size, w // patch_size
    x = images.reshape(b, gh, patch_size, gw, patch_size, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # (B, gh, gw, ph, pw, C)
    return x.reshape(b, gh * gw, patch_size * patch_size * c)


def _encoder_layer(layer_params, x, cfg: ViTConfig, *, deterministic: bool,
                   rng: Optional[jax.Array], attn_impl: str):
    b, n, h = x.shape
    nh, hd = cfg.num_attention_heads, cfg.head_dim

    if rng is not None:
        r_attn_probs, r_attn_out, r_mlp = jax.random.split(rng, 3)
    else:
        r_attn_probs = r_attn_out = r_mlp = None

    # --- attention block (pre-LN) ---
    y = layer_norm(layer_params["ln1"], x, eps=cfg.layer_norm_eps)
    qkv = linear(layer_params["qkv"], y)  # (B, N, 3H)
    qkv = qkv.reshape(b, n, 3, nh, hd).transpose(2, 0, 3, 1, 4)  # (3, B, nh, N, hd)
    q, k, v = qkv[0], qkv[1], qkv[2]
    attn = multi_head_attention(
        q, k, v,
        implementation=attn_impl,
        dropout_rate=cfg.attention_probs_dropout_prob,
        dropout_key=r_attn_probs,
        deterministic=deterministic,
    )
    attn = attn.transpose(0, 2, 1, 3).reshape(b, n, h)
    attn = linear(layer_params["attn_out"], attn)
    attn = dropout(r_attn_out, attn, cfg.hidden_dropout_prob,
                   deterministic=deterministic)
    x = x + attn

    # --- MLP block (pre-LN) ---
    y = layer_norm(layer_params["ln2"], x, eps=cfg.layer_norm_eps)
    y = gelu_exact(linear(layer_params["mlp_in"], y))
    y = linear(layer_params["mlp_out"], y)
    y = dropout(r_mlp, y, cfg.hidden_dropout_prob, deterministic=deterministic)
    return x + y


def vit_embed(params: dict, images: jnp.ndarray, cfg: ViTConfig, *,
              deterministic: bool = True, rng: Optional[jax.Array] = None,
              dtype=jnp.float32):
    """Patchify + project + CLS + position embeddings + embedding dropout.

    Returns (tokens, remaining_rng); the encoder-layer loop consumes the
    remaining rng. Split out of vit_apply so the pipeline-parallel path
    (vit_apply_pipelined) shares the exact embedding arithmetic.
    """
    x = patchify(images.astype(dtype), cfg.patch_size)
    x = linear(params["patch_embed"], x, dtype=dtype)

    b = x.shape[0]
    cls = jnp.broadcast_to(params["cls_token"].astype(dtype),
                           (b, 1, cfg.hidden_size))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["pos_embed"].astype(dtype)

    if rng is not None:
        r_embed, rng = jax.random.split(rng)
    else:
        r_embed = None
    x = dropout(r_embed, x, cfg.hidden_dropout_prob,
                deterministic=deterministic)
    return x, rng


def vit_apply(params: dict, images: jnp.ndarray, cfg: ViTConfig, *,
              deterministic: bool = True, rng: Optional[jax.Array] = None,
              attn_impl: str = "auto", dtype=jnp.float32,
              act_sharding=None) -> jnp.ndarray:
    """Forward pass: (B, H, W, C) images -> (B, N+1, hidden) token states.

    Equivalent to `ViTModel(x).last_hidden_state` in the reference
    (reference model/CE/classes.py:247-248).

    act_sharding: optional NamedSharding for the (B, N, H) residual stream,
    re-asserted after the embedding and after every block. Passing
    P("data", "model") gives Megatron-style sequence parallelism: the
    LayerNorm/dropout/residual regions compute on a token shard per device
    (XLA all-gathers tokens only where attention/matmuls need them),
    cutting per-device activation memory for long sequences (P4: 3137
    tokens) under tensor parallelism.
    """
    x, rng = vit_embed(params, images, cfg, deterministic=deterministic,
                       rng=rng, dtype=dtype)
    return _vit_encode(params, x, rng, cfg, deterministic=deterministic,
                       attn_impl=attn_impl, act_sharding=act_sharding)


def vit_apply_from_patch_tokens(params: dict, patch_tokens: jnp.ndarray,
                                cfg: ViTConfig, *,
                                deterministic: bool = True,
                                rng: Optional[jax.Array] = None,
                                attn_impl: str = "auto", dtype=jnp.float32,
                                act_sharding=None) -> jnp.ndarray:
    """vit_apply, but starting from already-projected patch embeddings
    (B, N, hidden) — the entry point for fused preprocessing paths that
    compose resize/normalize/patchify/projection into one contraction
    (ops/fused_preproc.py). CLS + position embeddings + dropout + encoder
    run identically to vit_apply."""
    x = patch_tokens.astype(dtype)
    b = x.shape[0]
    cls = jnp.broadcast_to(params["cls_token"].astype(dtype),
                           (b, 1, cfg.hidden_size))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["pos_embed"].astype(dtype)
    if rng is not None:
        r_embed, rng = jax.random.split(rng)
        x = dropout(r_embed, x, cfg.hidden_dropout_prob,
                    deterministic=deterministic)
    return _vit_encode(params, x, rng, cfg, deterministic=deterministic,
                       attn_impl=attn_impl, act_sharding=act_sharding)


def _vit_encode(params: dict, x: jnp.ndarray, rng, cfg: ViTConfig, *,
                deterministic: bool, attn_impl: str,
                act_sharding=None) -> jnp.ndarray:
    """Shared encoder trunk: (B, N+1, hidden) embedded tokens -> final
    hidden states (block loop + final LN, with optional token merging /
    remat / sequence-parallel sharding)."""
    if act_sharding is not None:
        x = jax.lax.with_sharding_constraint(x, act_sharding)

    merge_state = None
    if cfg.token_merge_r:
        # ToMe-style acceleration (ops/token_merge.py): the sequence shrinks
        # by r per block — every per-layer shape is still static. The final
        # unmerge restores (B, N, H) so dense heads are unaffected.
        from visiontransformer_tpu.ops.token_merge import (
            init_merge_state,
            merge_step,
            unmerge,
        )
        merge_state = init_merge_state(x.shape[0], x.shape[1])

    layer_fn = _encoder_layer
    if cfg.remat:
        layer_fn = jax.checkpoint(
            lambda p, x, r: _encoder_layer(p, x, cfg,
                                           deterministic=deterministic,
                                           rng=r, attn_impl=attn_impl),
            static_argnums=())
    for i, layer_params in enumerate(params["layers"]):
        layer_rng = jax.random.fold_in(rng, i) if rng is not None else None
        if cfg.remat:
            x = layer_fn(layer_params, x, layer_rng)
        else:
            x = _encoder_layer(layer_params, x, cfg,
                               deterministic=deterministic,
                               rng=layer_rng, attn_impl=attn_impl)
        if merge_state is not None:
            x, merge_state = merge_step(x, merge_state, cfg.token_merge_r)
        if act_sharding is not None:
            x = jax.lax.with_sharding_constraint(x, act_sharding)

    x = layer_norm(params["final_ln"], x, eps=cfg.layer_norm_eps)
    if merge_state is not None:
        x = unmerge(x, merge_state)
    return x


def vit_apply_pipelined(params: dict, images: jnp.ndarray, cfg: ViTConfig, *,
                        mesh, n_microbatches: int, attn_impl: str = "auto",
                        dtype=jnp.float32, deterministic: bool = True,
                        rng: Optional[jax.Array] = None) -> jnp.ndarray:
    """vit_apply with the encoder layer stack run as a GPipe pipeline over
    the mesh's "stage" axis (parallel/pipeline.py): each stage holds 1/S of
    the transformer weights, activations hop stage-to-stage via ppermute.

    params["layers"] may be the usual per-layer list (stacked here on the
    fly) or an already-stacked pytree with a leading layer axis — the form
    the pipeline Trainer stores stage-sharded (pipeline_param_shardings).

    Embedding / final LN stay outside the pipeline (replicated, GSPMD-
    sharded over "data" like the rest of the model). Training: per-layer
    dropout keys are folded from (rng, layer, microbatch, data-shard)
    inside the stage ring (parallel/pipeline.py:pipeline_apply) — same
    distribution as the single-device trainer, schedule-specific bitstream."""
    from visiontransformer_tpu.parallel.pipeline import (
        pipeline_apply,
        stack_stage_params,
    )

    x, rng = vit_embed(params, images, cfg, deterministic=deterministic,
                       rng=rng, dtype=dtype)

    def layer_fn(layer_params, y, layer_rng=None):
        return _encoder_layer(layer_params, y, cfg,
                              deterministic=deterministic,
                              rng=layer_rng, attn_impl=attn_impl)

    layers = params["layers"]
    if isinstance(layers, (list, tuple)):
        layers = stack_stage_params(layers)
    x = pipeline_apply(x, layers, layer_fn, mesh=mesh,
                       n_microbatches=n_microbatches,
                       rng=None if deterministic else rng)
    return layer_norm(params["final_ln"], x, eps=cfg.layer_norm_eps)
