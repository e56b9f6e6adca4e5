"""ViT segmentation model: backbone + conv head + bilinear upsample.

Mirrors `ViTSegmentationModel` (reference model/CE/classes.py:221-262):
drop the CLS token, fold tokens back to a (√N, √N) feature map, run
Conv3×3(hidden→256) + ReLU + Conv1×1(256→num_classes), and bilinearly upsample
(align_corners=False) to the input resolution.

Activation layout is NHWC end-to-end (TPU-native); ``vitseg_logits_nchw``
transposes at the boundary for torch-parity tests and reference-format
consumers.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from visiontransformer_tpu.configs import ViTSegConfig
from visiontransformer_tpu.models.vit import vit_apply, vit_init
from visiontransformer_tpu.nn.layers import conv2d, conv2d_init
from visiontransformer_tpu.ops.resize import resize_bilinear_mm


def vitseg_init(key: jax.Array, cfg: ViTSegConfig) -> dict:
    k_backbone, k_head1, k_head2 = jax.random.split(key, 3)
    return {
        "backbone": vit_init(k_backbone, cfg.vit),
        "head_conv1": conv2d_init(k_head1, cfg.vit.hidden_size,
                                  cfg.head_channels, 3),
        "head_conv2": conv2d_init(k_head2, cfg.head_channels,
                                  cfg.num_classes, 1),
    }


def vitseg_head_logits(params: dict, images: jnp.ndarray, cfg: ViTSegConfig,
                       *, deterministic: bool = True,
                       rng: Optional[jax.Array] = None,
                       attn_impl: str = "auto",
                       act_sharding=None) -> jnp.ndarray:
    """(B, H, W, 3) images -> (B, √N, √N, num_classes) grid-resolution logits
    (the seg head's output BEFORE the bilinear upsample,
    reference model/CE/classes.py:246-257)."""
    dtype = cfg.dtype
    tokens = vit_apply(params["backbone"], images, cfg.vit,
                       deterministic=deterministic, rng=rng,
                       attn_impl=attn_impl, dtype=dtype,
                       act_sharding=act_sharding)

    # Drop CLS (reference model/CE/classes.py:250) and fold to a feature map.
    tokens = tokens[:, 1:, :]
    b = tokens.shape[0]
    g = cfg.vit.grid_size
    features = tokens.reshape(b, g, g, cfg.vit.hidden_size)

    x = conv2d(params["head_conv1"], features)
    x = jax.nn.relu(x)
    return conv2d(params["head_conv2"], x)


def vitseg_apply(params: dict, images: jnp.ndarray, cfg: ViTSegConfig, *,
                 deterministic: bool = True, rng: Optional[jax.Array] = None,
                 attn_impl: str = "auto", act_sharding=None) -> jnp.ndarray:
    """(B, H, W, 3) images -> (B, H, W, num_classes) logits (NHWC).

    act_sharding: optional sequence-parallel residual-stream sharding,
    forwarded to the backbone (see models/vit.py:vit_apply)."""
    x = vitseg_head_logits(params, images, cfg, deterministic=deterministic,
                           rng=rng, attn_impl=attn_impl,
                           act_sharding=act_sharding)
    # Upsample as two fp32 interpolation-matrix matmuls (MXU-native): the
    # gather-based lerp leaves num_classes in the minor dim where it pads to
    # the 128-lane tile — measured 1.9× slower at 512²×17 (scripts/tune_head).
    # Same align_corners=False arithmetic as reference model/CE/classes.py:260.
    return resize_bilinear_mm(x.astype(jnp.float32),
                              (images.shape[1], images.shape[2]))


def vitseg_predict(params: dict, images: jnp.ndarray, cfg: ViTSegConfig, *,
                   out_size=None, epilogue: str = "xla",
                   attn_impl: str = "auto") -> jnp.ndarray:
    """(B, H, W, 3) images -> (B, out_H, out_W) int32 argmax class map.

    The serving forward (reference testViTModel.py:124-126: upsample then
    argmax) with ONE direct grid→out_size upsample — for an output size
    other than the compute resolution this skips the intermediate resize a
    vitseg_apply-then-resize chain would do, and is the reference-parity
    semantics for "mask at out_size" (its upsample always goes straight from
    the token grid to the requested size, model/CE/classes.py:260).

    epilogue: "xla" (default) — mm-upsample then argmax, XLA-fused; measured
    1.74 ms/batch-32 at 14²→512²×17 on v5e, bandwidth-bound. "pallas" — the
    fused VMEM-resident kernel (ops/upsample_argmax.py); measured 3.27 ms on
    the same shape, kept as the measured-alternative (scripts/bench_preproc).
    """
    if out_size is None:
        out_size = (images.shape[1], images.shape[2])
    x = vitseg_head_logits(params, images, cfg, deterministic=True,
                           attn_impl=attn_impl)
    return _upsample_argmax_epilogue(x, tuple(out_size), epilogue)


def _upsample_argmax_epilogue(grid_logits: jnp.ndarray, out_size, epilogue):
    if epilogue == "pallas":
        from visiontransformer_tpu.ops.upsample_argmax import upsample_argmax

        return upsample_argmax(grid_logits.astype(jnp.float32), out_size)
    logits = resize_bilinear_mm(grid_logits.astype(jnp.float32), out_size)
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)


def vitseg_head_from_tokens(params: dict, tokens: jnp.ndarray,
                            cfg: ViTSegConfig) -> jnp.ndarray:
    """Final hidden states (B, N+1, hidden) -> grid logits (B, g, g, C):
    the CLS-drop + fold + conv head shared by every forward variant."""
    tokens = tokens[:, 1:, :]
    b = tokens.shape[0]
    g = cfg.vit.grid_size
    features = tokens.reshape(b, g, g, cfg.vit.hidden_size)
    x = conv2d(params["head_conv1"], features)
    x = jax.nn.relu(x)
    return conv2d(params["head_conv2"], x)


def vitseg_build_fused_preproc(params: dict, cfg: ViTSegConfig, *,
                               in_size: int, mean, std,
                               input_scale: float = 1.0) -> dict:
    """Precompute the fused resize→normalize→patch-embed constants for
    ``vitseg_predict_fused`` (ops/fused_preproc.py). ``in_size`` is the raw
    request resolution (512 for the headline pipeline); the compute
    resolution is the backbone's (cfg.vit.image_size = 224, the
    reference-parity semantics — model/CE/testViTModel.py:92-97)."""
    from visiontransformer_tpu.ops.fused_preproc import build_fused_embed

    return build_fused_embed(
        params["backbone"]["patch_embed"],
        patch_size=cfg.vit.patch_size, in_size=in_size,
        compute_size=cfg.vit.image_size, mean=mean, std=std,
        input_scale=input_scale)


def vitseg_predict_fused(params: dict, consts: dict, raw: jnp.ndarray,
                         cfg: ViTSegConfig, *, out_size,
                         attn_impl: str = "auto") -> jnp.ndarray:
    """The headline serving forward with the preprocessing stage folded into
    the patch embedding: (B, in, in, C) raw images (fp32 in [0,1], or uint8
    when the consts folded input_scale=1/255) -> (B, out_H, out_W) int32
    masks. Same semantics as resize→normalize→``vitseg_predict``; the
    resize/normalize programs disappear into the embed contraction
    (ops/fused_preproc.py; A/B in scripts/fuse_preproc_ab.py)."""
    from visiontransformer_tpu.ops.fused_preproc import fused_resize_embed
    from visiontransformer_tpu.models.vit import vit_apply_from_patch_tokens

    dtype = cfg.dtype
    patch_tokens = fused_resize_embed(consts, raw, dtype=dtype)
    tokens = vit_apply_from_patch_tokens(params["backbone"], patch_tokens,
                                         cfg.vit, dtype=dtype,
                                         attn_impl=attn_impl)
    grid = vitseg_head_from_tokens(params, tokens, cfg)
    return _upsample_argmax_epilogue(grid, tuple(out_size), "xla")


def vitseg_apply_pipelined(params: dict, images: jnp.ndarray,
                           cfg: ViTSegConfig, *, mesh, n_microbatches: int,
                           attn_impl: str = "auto",
                           deterministic: bool = True,
                           rng: Optional[jax.Array] = None) -> jnp.ndarray:
    """vitseg_apply with the backbone's encoder stack pipeline-parallelized
    over the mesh's "stage" axis (parallel/pipeline.py). Head and upsample
    run outside the pipeline, batch-sharded over "data". Supports training
    (dropout keys thread through the stage ring — models/vit.py docstring);
    signature-compatible with vitseg_apply so train/tasks.py drives it as
    the Trainer's apply_fn in pipeline mode."""
    from visiontransformer_tpu.models.vit import vit_apply_pipelined

    dtype = cfg.dtype
    tokens = vit_apply_pipelined(params["backbone"], images, cfg.vit,
                                 mesh=mesh, n_microbatches=n_microbatches,
                                 attn_impl=attn_impl, dtype=dtype,
                                 deterministic=deterministic, rng=rng)

    tokens = tokens[:, 1:, :]
    b = tokens.shape[0]
    g = cfg.vit.grid_size
    features = tokens.reshape(b, g, g, cfg.vit.hidden_size)

    x = conv2d(params["head_conv1"], features)
    x = jax.nn.relu(x)
    x = conv2d(params["head_conv2"], x)
    return resize_bilinear_mm(x.astype(jnp.float32),
                              (images.shape[1], images.shape[2]))


def vitseg_logits_nchw(params: dict, images_nchw: jnp.ndarray,
                       cfg: ViTSegConfig, **kwargs) -> jnp.ndarray:
    """Torch-layout wrapper: (B, 3, H, W) in -> (B, C, H, W) logits out."""
    images = jnp.transpose(images_nchw, (0, 2, 3, 1))
    logits = vitseg_apply(params, images, cfg, **kwargs)
    return jnp.transpose(logits, (0, 3, 1, 2))
