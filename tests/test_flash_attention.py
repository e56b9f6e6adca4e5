"""Flash-attention kernel vs the XLA reference path (interpret mode on CPU).

Covers the ViT sequence lengths: 197 (P16), 785 (P8), and a truncated-P4
proxy (the 3137-token case runs on TPU; interpret mode at that size is too
slow for CI on this single-core host).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from visiontransformer_tpu.ops.attention import _xla_attention
from visiontransformer_tpu.ops.flash_attention import flash_attention


def _rand_qkv(rng, b, h, n, d, dtype=np.float32):
    shape = (b, h, n, d)
    return (jnp.asarray(rng.standard_normal(shape), dtype),
            jnp.asarray(rng.standard_normal(shape), dtype),
            jnp.asarray(rng.standard_normal(shape), dtype))


@pytest.mark.parametrize("n", [197, 785, 128, 130])
def test_flash_forward_matches_xla(rng, n):
    q, k, v = _rand_qkv(rng, 1, 2, n, 64)
    expected = _xla_attention(q, k, v)
    got = flash_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               atol=2e-5, rtol=2e-5)


def test_flash_grads_match_xla(rng):
    n = 197
    q, k, v = _rand_qkv(rng, 1, 2, n, 64)

    def loss_flash(q, k, v):
        return jnp.sum(jnp.sin(flash_attention(q, k, v, interpret=True)))

    def loss_xla(q, k, v):
        return jnp.sum(jnp.sin(_xla_attention(q, k, v)))

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_xla = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for gf, gx, name in zip(g_flash, g_xla, "qkv"):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gx),
                                   atol=5e-5, rtol=5e-4,
                                   err_msg=f"d{name} mismatch")


def test_flash_bf16(rng):
    q, k, v = _rand_qkv(rng, 1, 1, 197, 64, dtype=jnp.bfloat16)
    expected = _xla_attention(q, k, v)
    got = flash_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(expected, np.float32),
                               atol=3e-2, rtol=3e-2)


def test_flash_dropout_deterministic_and_unbiased(rng):
    n = 130
    q, k, v = _rand_qkv(rng, 1, 2, n, 64)
    base = flash_attention(q, k, v, interpret=True)

    a = flash_attention(q, k, v, interpret=True, dropout_rate=0.3,
                        dropout_seed=7)
    b = flash_attention(q, k, v, interpret=True, dropout_rate=0.3,
                        dropout_seed=7)
    c = flash_attention(q, k, v, interpret=True, dropout_rate=0.3,
                        dropout_seed=8)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))  # same seed
    assert np.abs(np.asarray(a) - np.asarray(c)).max() > 1e-4    # diff seed
    assert np.abs(np.asarray(a) - np.asarray(base)).max() > 1e-4  # dropped

    # Unbiasedness: mean over many seeds approaches the no-dropout output.
    acc = np.zeros_like(np.asarray(base))
    n_seeds = 48
    for s in range(n_seeds):
        acc += np.asarray(flash_attention(q, k, v, interpret=True,
                                          dropout_rate=0.3, dropout_seed=s))
    mean = acc / n_seeds
    err = np.abs(mean - np.asarray(base)).mean()
    scale = np.abs(np.asarray(base)).mean()
    assert err < 0.12 * scale, f"dropout mean bias too large: {err/scale:.3f}"


def test_flash_dropout_gradients_match_finite_difference(rng):
    """custom-VJP backward with dropout vs central finite differences for
    the SAME seed (the mask is deterministic given the seed)."""
    n = 64
    q, k, v = _rand_qkv(rng, 1, 1, n, 64)
    w = jnp.asarray(rng.standard_normal((1, 1, n, 64)), jnp.float32)

    def f(q):
        out = flash_attention(q, k, v, interpret=True, dropout_rate=0.25,
                              dropout_seed=3, block_q=64, block_k=64)
        return jnp.sum(out * w)

    g = np.asarray(jax.grad(f)(q))
    # probe a handful of coordinates
    eps = 1e-3
    for (bi, hi, ni, di) in [(0, 0, 0, 0), (0, 0, 10, 5), (0, 0, 63, 63),
                             (0, 0, 31, 17)]:
        dq = np.zeros(q.shape, np.float32)
        dq[bi, hi, ni, di] = eps
        fp = float(f(q + jnp.asarray(dq)))
        fm = float(f(q - jnp.asarray(dq)))
        fd = (fp - fm) / (2 * eps)
        assert abs(fd - g[bi, hi, ni, di]) < 5e-2 * max(1.0, abs(fd)), \
            f"grad mismatch at {(bi, hi, ni, di)}: fd={fd} ad={g[bi,hi,ni,di]}"


def test_flash_q_chains_match_single_chain(rng):
    """q_chains > 1 (independent online-softmax chains per program — the
    MXU/VPU-overlap lever, scripts/tune_flash3.py) is bit-identical to the
    single-chain kernel: each chain computes exactly what a block_q-sized
    single-chain program computes."""
    q, k, v = _rand_qkv(rng, 1, 2, 130, 64)
    base = flash_attention(q, k, v, interpret=True, block_q=128,
                           block_k=128)
    for chains, bq in ((2, 64), (3, 64), (2, 128)):
        got = flash_attention(q, k, v, interpret=True, block_q=bq,
                              block_k=128, q_chains=chains)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(base))

    g1 = jax.grad(lambda a: jnp.sum(jnp.sin(flash_attention(
        a, k, v, interpret=True, block_q=128, block_k=128))))(q)
    g2 = jax.grad(lambda a: jnp.sum(jnp.sin(flash_attention(
        a, k, v, interpret=True, block_q=64, block_k=128,
        q_chains=2))))(q)
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))


def test_flash_q_chains_dropout_mask_convention(rng):
    """With dropout, a chained forward must regenerate the SAME masks as the
    single-chain kernel at per-chain block_q granularity (the backward
    kernels run at that granularity, so fwd/bwd mask consistency reduces to
    this equality)."""
    q, k, v = _rand_qkv(rng, 1, 2, 130, 64)
    chained = flash_attention(q, k, v, interpret=True, block_q=64,
                              block_k=64, q_chains=2, dropout_rate=0.3,
                              dropout_seed=7)
    single = flash_attention(q, k, v, interpret=True, block_q=64,
                             block_k=64, q_chains=1, dropout_rate=0.3,
                             dropout_seed=7)
    np.testing.assert_array_equal(np.asarray(chained), np.asarray(single))
    # and the chained grad path runs (per-chain block_q backward)
    g = jax.grad(lambda a: jnp.sum(flash_attention(
        a, k, v, interpret=True, block_q=64, block_k=64, q_chains=2,
        dropout_rate=0.3, dropout_seed=7)))(q)
    assert np.isfinite(np.asarray(g)).all()


def test_per_path_tables_agree_numerically(rng):
    """The inference and training tuned tables dispatch different tile
    shapes at N=1025 (3-chain no-lse vs 2-chain lse forward); both must
    produce the XLA result. Run at a truncated length that still exercises
    distinct multi-chain entries via explicit blocks (interpret mode at
    N=1025 is too slow for CI)."""
    from visiontransformer_tpu.ops.flash_attention import (
        _TUNED_BLOCKS_INFER,
        _TUNED_BLOCKS_TRAIN,
        choose_blocks,
    )

    # table wiring: the paths really select different entries at N=1025
    assert choose_blocks(1025, "infer") == _TUNED_BLOCKS_INFER[1152]
    assert choose_blocks(1025, "train") == _TUNED_BLOCKS_TRAIN[1152]
    assert choose_blocks(1025, "infer") != choose_blocks(1025, "train")
    # unknown lengths fall back identically
    assert choose_blocks(2049, "infer") == choose_blocks(2049, "train")

    q, k, v = _rand_qkv(rng, 1, 2, 130, 64)
    expected = _xla_attention(q, k, v)
    for bq, chains in [(64, 3), (96, 2)]:  # per-path style tile shapes
        got = flash_attention(q, k, v, interpret=True, block_q=bq,
                              block_k=128, q_chains=chains)
        np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                                   atol=2e-5, rtol=2e-5)
