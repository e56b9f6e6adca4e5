"""Flash-attention inference-variant experiments (round 2).

The per-stage profile (docs/PERFORMANCE.md) puts the production kernel at
~15-16 TF vs the ~28 TF d=64 MXU ceiling at N=1025; the gap is VPU softmax
time serialized against the two matmuls. Variants measured here against the
production kernel, chained-in-jit, best-of-N (pool rules per CLAUDE.md):

  base      — production kernel (ops/flash_attention.py) as-is
  bf16exp   — softmax exp/max computed in bf16 (half the VPU bytes;
              numerics: exp args are <= 0, bf16 rel err ~1e-2 on probs)
  exp2      — exp(x) as exp2(x*log2e) (native VPU exp2, skips a scaling)
  kchunked  — (512, 576): two k-chunks so Mosaic can software-pipeline the
              chunk-i AV matmul against chunk-i+1 softmax

Run on the real TPU: python scripts/tune_flash2.py [N] [bh]
"""

import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from visiontransformer_tpu.ops.flash_attention import (
    NEG_INF,
    _round_up,
    flash_attention,
)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1025
BH = int(sys.argv[2]) if len(sys.argv) > 2 else 192
D = 64
ITERS = 12
ROUNDS = 4


def _variant_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, seq_len, block_k,
                    mode):
    q = q_ref[0]
    n_pad = k_ref.shape[1]
    num_kb = n_pad // block_k
    block_q, d = q.shape

    def body(i, carry):
        acc, m, l = carry
        k = k_ref[0, pl.ds(i * block_k, block_k), :]
        v = v_ref[0, pl.ds(i * block_k, block_k), :]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        col = i * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1)
        s = jnp.where(col < seq_len, s, NEG_INF)

        if mode == "bf16exp":
            m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
            x = (s - m_new).astype(jnp.bfloat16)
            p = jnp.exp(x)  # bf16 VPU exp
            alpha = jnp.exp((m - m_new).astype(jnp.bfloat16)).astype(
                jnp.float32)
            l = l * alpha + jnp.sum(p.astype(jnp.float32), axis=1,
                                    keepdims=True)
            p_use = p
        elif mode == "exp2":
            LOG2E = 1.4426950408889634
            m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
            p = jnp.exp2((s - m_new) * LOG2E)
            alpha = jnp.exp2((m - m_new) * LOG2E)
            l = l * alpha + jnp.sum(p, axis=1, keepdims=True)
            p_use = p
        else:
            m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
            alpha = jnp.exp(m - m_new)
            p = jnp.exp(s - m_new)
            l = l * alpha + jnp.sum(p, axis=1, keepdims=True)
            p_use = p

        acc = acc * alpha + jax.lax.dot_general(
            p_use.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return acc, m_new, l

    acc = jnp.zeros((block_q, d), jnp.float32)
    m0 = jnp.full((block_q, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    carry = (acc, m0, l0)
    for i in range(num_kb):
        carry = body(i, carry)
    acc, m, l = carry
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def variant(q, k, v, *, mode, block_q, block_k, n_pad):
    bh, n, d = q.shape
    scale = 1.0 / np.sqrt(d)
    pad = n_pad - n
    qp = jnp.pad(q, ((0, 0), (0, pad), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, pad), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, pad), (0, 0)))
    grid = (bh, n_pad // block_q)
    out = pl.pallas_call(
        functools.partial(_variant_kernel, scale=scale, seq_len=n,
                          block_k=block_k, mode=mode),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, n_pad, d), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, n_pad, d), lambda b, i: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, n_pad, d), q.dtype),
        interpret=jax.default_backend() != "tpu",
    )(qp, kp, vp)
    return out[:, :n]


def timed(name, fn, *args):
    chained = jax.jit(lambda a, b, c: functools.reduce(
        lambda q, _: fn(q, b, c) + 0 * q, range(ITERS), a))
    out = chained(*args)
    _ = float(jnp.sum(out[:2].astype(jnp.float32)))
    best = float("inf")
    flops = 4 * args[0].shape[0] * N * N * D
    for _ in range(ROUNDS):
        t0 = time.perf_counter()
        out = chained(*args)
        _ = float(jnp.sum(out[:2].astype(jnp.float32)))
        best = min(best, (time.perf_counter() - t0) / ITERS)
    print(f"{name:<34s} {best*1e3:7.2f} ms  {flops/best/1e12:6.1f} TF",
          flush=True)
    return best


def main():
    rng = np.random.default_rng(0)
    mk = lambda: jnp.asarray(rng.standard_normal((BH, N, D)), jnp.bfloat16)
    q, k, v = mk(), mk(), mk()

    print(f"N={N} bh={BH} d={D}, chained x{ITERS}, best of {ROUNDS}")
    timed("production kernel", lambda a, b, c: flash_attention(
        a[None], b[None], c[None])[0], q, k, v)

    n_pad = _round_up(N, 128)
    cases = []
    for mode in ("base", "bf16exp", "exp2"):
        cases.append((f"{mode} (384,{n_pad})", mode, 384, n_pad, n_pad))
    cases.append(("base (512,576) 2-chunk", "base", 512, 576, 1152))
    cases.append(("bf16exp (512,576) 2-chunk", "bf16exp", 512, 576, 1152))
    cases.append(("exp2 (512,576) 2-chunk", "exp2", 512, 576, 1152))
    cases.append(("base (384,384) 3-chunk", "base", 384, 384, 1152))

    ref = np.asarray(variant(q, k, v, mode="base", block_q=384,
                             block_k=n_pad, n_pad=n_pad), np.float32)
    for name, mode, bq, bk, npad in cases:
        if npad % bk or npad % bq:
            continue
        got = np.asarray(variant(q, k, v, mode=mode, block_q=bq,
                                 block_k=bk, n_pad=npad), np.float32)
        err = np.max(np.abs(got - ref)) / (np.max(np.abs(ref)) + 1e-9)
        timed(name, lambda a, b, c, mode=mode, bq=bq, bk=bk, npad=npad:
              variant(a, b, c, mode=mode, block_q=bq, block_k=bk,
                      n_pad=npad), q, k, v)
        print(f"{'':<34s} rel err vs base: {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
