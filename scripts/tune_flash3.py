"""Flash-attention round-3 experiments: change the CONTRACTION SHAPE.

The round-2 profile (docs/PERFORMANCE.md) pinned the production kernel at
~15 TF vs a ~28 TF d=64 ceiling and established the gap is the serialized
MXU<->VPU dependency per program, not tiles/softmax-dtype/exp (tune_flash2).
Round-2's sweeps never changed the contraction shapes themselves. Two levers
do:

  dualq — TWO q-tiles per program over the same K/V, two independent
          online-softmax chains interleaved: while chain A is in its VPU
          phase (max/exp/sum), chain B's QK^T/PV can occupy the MXU.
          (Mosaic schedules at op granularity, so independent chains are
          what give it freedom; a single 2x-taller q tile would not —
          every op would still depend on the whole previous op.)
  pvT   — compute scores and output TRANSPOSED: s^T = K @ q^T has the same
          d=64 contraction (inherent to attention), but o^T = V^T @ P^T
          contracts over block_k (>=128 rows, full) with block_q output
          lanes (full) instead of d=64 output lanes (half) — the PV matmul
          runs at 100% MXU instead of 50%. Output lands (d, n) and is
          transposed outside the kernel (XLA epilogue).
  dualq_pvT — both.

Run on the real TPU: python scripts/tune_flash3.py [N] [bh]
Correctness: every variant is rel-err-checked against the production kernel.
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


# -------------------------------------------------------------- multi-q
def _multiq_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, seq_len, block_k,
                   n_chains):
    """n_chains independent online-softmax chains per program (dualq=2)."""
    qall = q_ref[0]                       # (n_chains*bq, d)
    bq = qall.shape[0] // n_chains
    qs = [qall[c * bq:(c + 1) * bq] for c in range(n_chains)]
    n_pad = k_ref.shape[1]
    num_kb = n_pad // block_k

    def chunk(i, carry):
        accs, ms, ls = carry
        k = k_ref[0, pl.ds(i * block_k, block_k), :]
        v = v_ref[0, pl.ds(i * block_k, block_k), :]
        col = i * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (bq, block_k), 1)
        valid = col < seq_len
        # Independent MXU->VPU->MXU chains; Mosaic interleaves them.
        new_accs, new_ms, new_ls = [], [], []
        for c in range(n_chains):
            s = jax.lax.dot_general(qs[c], k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            s = jnp.where(valid, s * scale, NEG_INF)
            m_new = jnp.maximum(ms[c], jnp.max(s, axis=1, keepdims=True))
            alpha = jnp.exp(ms[c] - m_new)
            p = jnp.exp(s - m_new)
            new_ls.append(ls[c] * alpha + jnp.sum(p, axis=1, keepdims=True))
            new_accs.append(accs[c] * alpha + jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
            new_ms.append(m_new)
        return new_accs, new_ms, new_ls

    carry = ([jnp.zeros((bq, D), jnp.float32)] * n_chains,
             [jnp.full((bq, 1), NEG_INF, jnp.float32)] * n_chains,
             [jnp.zeros((bq, 1), jnp.float32)] * n_chains)
    for i in range(num_kb):
        carry = chunk(i, carry)
    accs, ms, ls = carry
    outs = [accs[c] / jnp.maximum(ls[c], 1e-30) for c in range(n_chains)]
    o_ref[0] = jnp.concatenate(outs, axis=0).astype(o_ref.dtype)


# ----------------------------------------------------------------------- pvT
def _pvt_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, seq_len, block_k):
    q = q_ref[0]                          # (bq, d)
    bq = q.shape[0]
    n_pad = k_ref.shape[1]
    num_kb = n_pad // block_k

    def chunk(i, carry):
        accT, m, l = carry                # accT: (d, bq); m,l: (1, bq)
        k = k_ref[0, pl.ds(i * block_k, block_k), :]
        v = v_ref[0, pl.ds(i * block_k, block_k), :]
        # s^T = K q^T: (bk, d) x (bq, d) contracting d -> (bk, bq).
        sT = jax.lax.dot_general(k, q, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32) * scale
        row = i * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_k, bq), 0)
        sT = jnp.where(row < seq_len, sT, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(sT, axis=0, keepdims=True))
        alpha = jnp.exp(m - m_new)
        pT = jnp.exp(sT - m_new)          # (bk, bq)
        l = l * alpha + jnp.sum(pT, axis=0, keepdims=True)
        # o^T = V^T P^T: contract over block_k (full MXU rows), output
        # lanes = bq (full) instead of d=64 (half).
        accT = accT * alpha + jax.lax.dot_general(
            v, pT.astype(v.dtype), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return accT, m_new, l

    accT = jnp.zeros((D, bq), jnp.float32)
    m0 = jnp.full((1, bq), NEG_INF, jnp.float32)
    l0 = jnp.zeros((1, bq), jnp.float32)
    carry = (accT, m0, l0)
    for i in range(num_kb):
        carry = chunk(i, carry)
    accT, m, l = carry
    o_ref[0] = (accT / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


# ----------------------------------------------------------------- dualq+pvT
def _dualq_pvt_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, seq_len,
                      block_k):
    q2 = q_ref[0]
    bq = q2.shape[0] // 2
    qA, qB = q2[:bq], q2[bq:]
    n_pad = k_ref.shape[1]
    num_kb = n_pad // block_k

    def chunk(i, carry):
        accA, mA, lA, accB, mB, lB = carry
        k = k_ref[0, pl.ds(i * block_k, block_k), :]
        v = v_ref[0, pl.ds(i * block_k, block_k), :]
        row = i * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_k, bq), 0)
        valid = row < seq_len
        sA = jax.lax.dot_general(k, qA, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32) * scale
        sB = jax.lax.dot_general(k, qB, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32) * scale
        sA = jnp.where(valid, sA, NEG_INF)
        sB = jnp.where(valid, sB, NEG_INF)
        mA_new = jnp.maximum(mA, jnp.max(sA, axis=0, keepdims=True))
        mB_new = jnp.maximum(mB, jnp.max(sB, axis=0, keepdims=True))
        alphaA = jnp.exp(mA - mA_new)
        alphaB = jnp.exp(mB - mB_new)
        pA = jnp.exp(sA - mA_new)
        pB = jnp.exp(sB - mB_new)
        lA = lA * alphaA + jnp.sum(pA, axis=0, keepdims=True)
        lB = lB * alphaB + jnp.sum(pB, axis=0, keepdims=True)
        accA = accA * alphaA + jax.lax.dot_general(
            v, pA.astype(v.dtype), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        accB = accB * alphaB + jax.lax.dot_general(
            v, pB.astype(v.dtype), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return accA, mA_new, lA, accB, mB_new, lB

    z = lambda: jnp.zeros((D, bq), jnp.float32)
    neg = lambda: jnp.full((1, bq), NEG_INF, jnp.float32)
    zl = lambda: jnp.zeros((1, bq), jnp.float32)
    carry = (z(), neg(), zl(), z(), neg(), zl())
    for i in range(num_kb):
        carry = chunk(i, carry)
    accA, mA, lA, accB, mB, lB = carry
    outA = accA / jnp.maximum(lA, 1e-30)
    outB = accB / jnp.maximum(lB, 1e-30)
    o_ref[0] = jnp.concatenate([outA, outB], axis=1).astype(o_ref.dtype)


KERNELS = {
    "dualq": (functools.partial(_multiq_kernel, n_chains=2), 2, False),
    "quadq": (functools.partial(_multiq_kernel, n_chains=4), 4, False),
    "pvT": (_pvt_kernel, 1, True),
    "dualq_pvT": (_dualq_pvt_kernel, 2, True),
}


def variant(q, k, v, *, name, block_q, block_k, n_pad):
    """block_q = per-chain q rows; dual variants fetch 2*block_q rows."""
    kern, nq, transposed = KERNELS[name]
    bh, n, d = q.shape
    scale = 1.0 / np.sqrt(d)
    pad = n_pad - n
    qp = jnp.pad(q, ((0, 0), (0, pad), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, pad), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, pad), (0, 0)))
    rows = nq * block_q
    grid = (bh, n_pad // rows)
    if transposed:
        out_spec = pl.BlockSpec((1, d, rows), lambda b, i: (b, 0, i))
        out_shape = jax.ShapeDtypeStruct((bh, d, n_pad), q.dtype)
    else:
        out_spec = pl.BlockSpec((1, rows, d), lambda b, i: (b, i, 0))
        out_shape = jax.ShapeDtypeStruct((bh, n_pad, d), q.dtype)
    out = pl.pallas_call(
        functools.partial(kern, scale=scale, seq_len=n, block_k=block_k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, rows, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, n_pad, d), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, n_pad, d), lambda b, i: (b, 0, 0)),
        ],
        out_specs=out_spec,
        out_shape=out_shape,
        interpret=jax.default_backend() != "tpu",
    )(qp, kp, vp)
    if transposed:
        return out.transpose(0, 2, 1)[:, :n]
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
    print(f"{name:<36s} {best*1e3:7.2f} ms  {flops/best/1e12:6.1f} TF",
          flush=True)
    return best


def main():
    rng = np.random.default_rng(0)
    mk = lambda: jnp.asarray(rng.standard_normal((BH, N, D)), jnp.bfloat16)
    q, k, v = mk(), mk(), mk()

    print(f"N={N} bh={BH} d={D}, chained x{ITERS}, best of {ROUNDS}")
    base = timed("production kernel", lambda a, b, c: flash_attention(
        a[None], b[None], c[None])[0], q, k, v)

    ref = np.asarray(flash_attention(q[None], k[None], v[None])[0],
                     np.float32)

    n128 = _round_up(N, 128)
    cases = []
    seen = set()

    def add(name, bq):
        """Smallest pad >= n128 that tiles (nq*bq rows, 128-lane outputs)
        with <=15% wasted rows; transposed outputs need rows % 128 == 0
        (Mosaic block-shape rule — the r3 first run crashed on rows=192)."""
        kern, nq, transposed = KERNELS[name]
        rows = nq * bq
        if transposed and rows % 128:
            return
        pad = _round_up(n128, rows)
        if pad % 128 or pad > n128 * 1.15 or (name, bq, pad) in seen:
            return
        seen.add((name, bq, pad))
        cases.append((name, bq, pad, pad))
        if pad % (2 * 128) == 0 and pad // 2 >= rows:
            cases.append((name, bq, pad // 2, pad))  # chunked-k pipelining

    for bq in (96, 112, 128, 144, 160, 192, 224, 256, 288):
        add("dualq", bq)
    for bq in (96, 112, 128, 144, 160):
        add("quadq", bq)
    add("pvT", 128)
    add("pvT", 256)
    add("dualq_pvT", 192)

    best = {}
    for name, bq, bk, npad in cases:
        got = np.asarray(variant(q, k, v, name=name, block_q=bq,
                                 block_k=bk, n_pad=npad), np.float32)
        err = np.max(np.abs(got - ref)) / (np.max(np.abs(ref)) + 1e-9)
        label = f"{name} (bq={bq},bk={bk},pad={npad})"
        t = timed(label, lambda a, b, c, name=name, bq=bq, bk=bk, npad=npad:
                  variant(a, b, c, name=name, block_q=bq, block_k=bk,
                          n_pad=npad), q, k, v)
        print(f"{'':<36s} rel err vs production: {err:.2e}", flush=True)
        best[label] = t
    if best:
        top = min(best, key=best.get)
        print(f"\nbest variant: {top}  {best[top]*1e3:.2f} ms "
              f"({base/best[top]:.2f}x the production kernel)")


if __name__ == "__main__":
    main()
