"""Token merging (ops/token_merge.py): unit math, model contract, quality.

ToMe-style opt-in inference acceleration (PAPERS.md ViT-acceleration
survey). r=0 must be bit-identical to the plain model; r>0 shrinks every
layer's static token count by r and unmerges at the end so dense heads see
all original positions.
"""

import numpy as np

import jax
import jax.numpy as jnp

from visiontransformer_tpu.configs import ViTConfig, ViTSegConfig
from visiontransformer_tpu.models import vitseg_apply, vitseg_init
from visiontransformer_tpu.ops.token_merge import (
    init_merge_state,
    merge_step,
    unmerge,
)

import dataclasses


def test_merge_step_hand_checked():
    """B=1, 7 tokens (CLS + 6 body), r=1: sources x1,x3,x5; dests x2,x4,x6.
    Source (1,0) merges into the colinear dest (3,0) (the 1e-6 norm eps
    makes larger-norm colinear dests score infinitesimally higher), giving
    the size-weighted mean (2,0); everything else is a reorder."""
    x = jnp.asarray(np.array([[
        [10, 0], [1, 0], [1.1, 0], [0, 5], [7, 7], [0, 1], [3, 0]]],
        np.float32))
    st = init_merge_state(1, 7)
    y, st2 = merge_step(x, st, 1)
    assert y.shape == (1, 6, 2)
    # new order: CLS, dests x2,x4,x6 (x6 now the merge), kept sources x3,x5
    np.testing.assert_allclose(np.asarray(y[0]), [
        [10, 0], [1.1, 0], [7, 7], [2, 0], [0, 5], [0, 1]], atol=1e-6)
    np.testing.assert_allclose(np.asarray(st2.sizes[0]),
                               [1, 1, 1, 2, 1, 1])
    np.testing.assert_array_equal(np.asarray(st2.assign[0]),
                                  [0, 3, 1, 4, 2, 5, 3])
    u = unmerge(y, st2)
    assert u.shape == (1, 7, 2)
    # merged positions share one vector; untouched positions round-trip
    np.testing.assert_allclose(np.asarray(u[0, 1]), [2, 0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(u[0, 6]), [2, 0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(u[0, 0]), [10, 0])
    np.testing.assert_allclose(np.asarray(u[0, 2]), [1.1, 0])


def test_merge_sizes_accumulate_and_assign_composes():
    """Two consecutive merges: sizes keep counting original tokens and
    assign always maps every original position to a live token."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (3, 17, 8)), jnp.float32)
    st = init_merge_state(3, 17)
    n_total = 17
    for _ in range(2):
        x, st = merge_step(x, st, 3)
    assert x.shape == (3, 11, 8)
    np.testing.assert_allclose(np.asarray(st.sizes.sum(axis=1)),
                               np.full(3, n_total))
    assert int(st.assign.max()) < 11 and int(st.assign.min()) == 0
    u = unmerge(x, st)
    assert u.shape == (3, 17, 8)


TINY = ViTSegConfig(
    vit=ViTConfig(image_size=48, patch_size=8, hidden_size=64,
                  num_hidden_layers=4, num_attention_heads=4,
                  intermediate_size=128),
    num_classes=5)


def test_vitseg_r0_bit_identical_and_r_shrinks():
    params = vitseg_init(jax.random.PRNGKey(0), TINY)
    x = jnp.asarray(np.random.default_rng(1).random((2, 48, 48, 3)),
                    jnp.float32)
    base = vitseg_apply(params, x, TINY)

    cfg_r0 = dataclasses.replace(
        TINY, vit=dataclasses.replace(TINY.vit, token_merge_r=0))
    np.testing.assert_array_equal(
        np.asarray(vitseg_apply(params, x, cfg_r0)), np.asarray(base))

    # r=4 over 4 layers on 37 tokens: output shape contract holds and the
    # result stays close to the exact model (smooth random init).
    cfg_r = dataclasses.replace(
        TINY, vit=dataclasses.replace(TINY.vit, token_merge_r=4))
    fast = vitseg_apply(params, x, cfg_r)
    assert fast.shape == base.shape
    # quality smoke: merged logits correlate strongly with exact logits
    a = np.asarray(base).ravel()
    b = np.asarray(fast).ravel()
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > 0.95, corr
    agree = float(np.mean(np.argmax(np.asarray(base), -1)
                          == np.argmax(np.asarray(fast), -1)))
    assert agree > 0.85, agree


def test_token_merge_static_shapes_under_jit():
    """The merged forward is one XLA program with static per-layer shapes
    (jit compiles and runs; no dynamic-shape errors)."""
    cfg = dataclasses.replace(
        TINY, vit=dataclasses.replace(TINY.vit, token_merge_r=2))
    params = vitseg_init(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(np.random.default_rng(2).random((2, 48, 48, 3)),
                    jnp.float32)
    out = jax.jit(lambda p, im: vitseg_apply(p, im, cfg))(params, x)
    assert out.shape == (2, 48, 48, 5)
    assert np.isfinite(np.asarray(out)).all()
