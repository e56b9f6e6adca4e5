"""Fused resize→normalize→patch-embed (ops/fused_preproc.py): the offline
fold must match the unfused chain (resize_bilinear_mm → (x−mean)/std →
patchify → linear) up to fp association, for both fp32 and uint8 inputs,
and the vitseg fused serving forward must agree with the unfused pipeline.

Reference anchor for the semantics being fused: the baseline resizes every
input to the backbone resolution before computing
(model/CE/testViTModel.py:92-97) and normalizes with the ImageNet constants.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from visiontransformer_tpu.configs import ViTConfig, ViTSegConfig
from visiontransformer_tpu.models import vitseg_init
from visiontransformer_tpu.models.vit import patchify
from visiontransformer_tpu.models.vitseg import (
    vitseg_build_fused_preproc,
    vitseg_predict,
    vitseg_predict_fused,
)
from visiontransformer_tpu.nn.layers import linear, linear_init
from visiontransformer_tpu.ops.fused_preproc import (
    build_fused_embed,
    fused_resize_embed,
)
from visiontransformer_tpu.ops.resize import resize_bilinear_mm

MEAN = np.array([0.485, 0.456, 0.406], np.float32)
STD = np.array([0.229, 0.224, 0.225], np.float32)


def _unfused_tokens(patch_embed, x, *, compute, patch):
    y = resize_bilinear_mm(x, (compute, compute))
    y = (y - jnp.asarray(MEAN)) / jnp.asarray(STD)
    return linear(patch_embed, patchify(y, patch))


@pytest.mark.parametrize("in_size,compute,patch", [
    (512, 224, 16),   # the headline pipeline's shapes
    (64, 32, 8),      # non-headline ratio, tiny
    (224, 224, 16),   # identity resize degenerates correctly
])
def test_fused_embed_matches_unfused_chain(in_size, compute, patch):
    hidden = 48
    pe = linear_init(jax.random.PRNGKey(0), patch * patch * 3, hidden)
    consts = build_fused_embed(pe, patch_size=patch, in_size=in_size,
                               compute_size=compute, mean=MEAN, std=STD)
    x = jnp.asarray(np.random.default_rng(0).random((2, in_size, in_size, 3)),
                    jnp.float32)
    ref = _unfused_tokens(pe, x, compute=compute, patch=patch)
    got = fused_resize_embed(consts, x, dtype=jnp.float32)
    assert got.shape == ref.shape
    err = float(jnp.max(jnp.abs(got - ref))
                / (jnp.max(jnp.abs(ref)) + 1e-9))
    assert err < 2e-5, err


def test_fused_embed_uint8_scale_fold():
    pe = linear_init(jax.random.PRNGKey(1), 16 * 16 * 3, 32)
    consts = build_fused_embed(pe, patch_size=16, in_size=128,
                               compute_size=64, mean=MEAN, std=STD,
                               input_scale=1.0 / 255.0)
    raw = np.random.default_rng(1).integers(0, 256, (2, 128, 128, 3),
                                            dtype=np.uint8)
    ref = _unfused_tokens(pe, jnp.asarray(raw, jnp.float32) / 255.0,
                          compute=64, patch=16)
    got = fused_resize_embed(consts, jnp.asarray(raw), dtype=jnp.float32)
    err = float(jnp.max(jnp.abs(got - ref))
                / (jnp.max(jnp.abs(ref)) + 1e-9))
    assert err < 2e-5, err


def test_vitseg_predict_fused_agrees_with_pipeline():
    cfg = ViTSegConfig(
        vit=ViTConfig(image_size=32, patch_size=8, hidden_size=64,
                      num_hidden_layers=2, num_attention_heads=2,
                      intermediate_size=128),
        num_classes=5, compute_dtype="float32")
    params = vitseg_init(jax.random.PRNGKey(0), cfg)
    consts = vitseg_build_fused_preproc(params, cfg, in_size=64,
                                        mean=MEAN, std=STD)
    raw = jnp.asarray(np.random.default_rng(2).random((2, 64, 64, 3)),
                      jnp.float32)

    x = resize_bilinear_mm(raw, (32, 32))
    x = (x - jnp.asarray(MEAN)) / jnp.asarray(STD)
    ref = vitseg_predict(params, x, cfg, out_size=(64, 64))
    got = vitseg_predict_fused(params, consts, raw, cfg, out_size=(64, 64))
    # fp32 end to end; random-init near-ties are the only divergence source.
    agree = float(jnp.mean(ref == got))
    assert agree > 0.999, agree
