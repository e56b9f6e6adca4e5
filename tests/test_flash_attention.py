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
