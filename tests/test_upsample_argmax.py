"""Fused upsample+argmax kernel vs the XLA reference path (interpret mode).

The kernel must reproduce argmax(resize_bilinear_mm(x, size), -1) exactly:
same align_corners=False weights, fp32 accumulation, and first-index
tie-breaking (reference upsample semantics: model/CE/classes.py:260, argmax:
testViTModel.py:126).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from visiontransformer_tpu.ops.resize import resize_bilinear_mm
from visiontransformer_tpu.ops.upsample_argmax import upsample_argmax


@pytest.mark.parametrize("shape,size", [
    ((2, 14, 14, 17), (96, 96)),       # ViT-B/16 @224-compute head shape
    ((1, 7, 9, 5), (64, 96)),          # non-square, odd classes
    ((1, 8, 8, 3), (8, 8)),            # identity-size resize
    ((2, 16, 16, 17), (40, 40)),       # non-multiple output tiling
])
def test_matches_xla_reference(rng, shape, size):
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    ref = jnp.argmax(resize_bilinear_mm(x, size), axis=-1)
    got = upsample_argmax(x, size, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_vitseg_predict_matches_apply_argmax(rng):
    # vitseg_predict (the serving forward) must equal
    # argmax(vitseg_apply(...), -1) at the compute resolution, and its
    # out_size upsample goes straight from the token grid (one resize).
    import jax

    from visiontransformer_tpu.configs import ViTConfig, ViTSegConfig
    from visiontransformer_tpu.models import vitseg_apply, vitseg_init
    from visiontransformer_tpu.models.vitseg import vitseg_predict

    cfg = ViTSegConfig(
        vit=ViTConfig(image_size=32, patch_size=8, hidden_size=32,
                      num_hidden_layers=2, num_attention_heads=2,
                      intermediate_size=64),
        num_classes=5, compute_dtype="float32")
    params = vitseg_init(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(rng.random((2, 32, 32, 3)), jnp.float32)

    ref = jnp.argmax(vitseg_apply(params, x, cfg), axis=-1)
    got = vitseg_predict(params, x, cfg)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    # Larger out_size: both epilogues agree with each other.
    a = vitseg_predict(params, x, cfg, out_size=(64, 64))
    assert a.shape == (2, 64, 64)


def test_tie_breaking_first_index(rng):
    # Two identical class planes: argmax must pick the lower class index
    # everywhere (jnp.argmax first-max-wins semantics).
    plane = rng.standard_normal((1, 6, 6, 1)).astype(np.float32)
    x = jnp.asarray(np.concatenate([plane, plane - 1.0, plane], axis=-1))
    got = np.asarray(upsample_argmax(x, (24, 24), interpret=True))
    assert (got == 0).all()
