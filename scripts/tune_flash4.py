"""Measure q_chains configs through the PRODUCTION flash_attention path.

tune_flash3.py established (toy kernels, no lse output) that independent
online-softmax chains per program beat the single-chain kernel ~1.1-1.16x at
N=1025, and that transposed-PV loses. This script measures the LEGAL configs
— production constraints: the lse output block needs super_q % 128 == 0 and
the backward row blocks need block_q % 128 == 0 (Mosaic block-shape rule) —
through flash_attention itself (lse write included), plus the dropout
grad path so the chain-aware backward (per-chain block_q tiles) is costed.

Run: python scripts/tune_flash4.py [N] [bh]   (A/B in one process, CLAUDE.md
pool rules: chained iterations inside one jit, best-of-N, scalar readback).
"""

import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from visiontransformer_tpu.ops.flash_attention import flash_attention

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1025
BH = int(sys.argv[2]) if len(sys.argv) > 2 else 192
D = 64
ITERS = 12
ROUNDS = 4

# Per N: (block_q, block_k, q_chains) — first entry is the current tuned
# baseline. With the lse/delta buffers in SUBLANE layout (bh, n_pad, 1),
# any block_q % 8 == 0 is legal in fwd and both bwd kernels; the only
# constraints left are super_q | n_pad and block_k | n_pad.
CASES = {
    785: [(512, 1024, 1), (224, 896, 2), (112, 896, 4), (256, 1024, 2),
          (448, 896, 1)],
    1025: [(384, 1152, 1), (144, 1152, 2), (192, 1152, 2), (144, 1152, 4),
           (128, 1152, 3)],
    3137: [(640, 640, 1), (160, 640, 2), (320, 640, 2), (160, 640, 4),
           (128, 640, 5)],
}


def timed(name, fn, *args):
    chained = jax.jit(lambda a, b, c: functools.reduce(
        lambda q, _: fn(q, b, c) + 0 * q, range(ITERS), a))
    out = chained(*args)
    _ = float(jnp.sum(out[:2].astype(jnp.float32)))
    best = float("inf")
    flops = 4 * args[0].shape[0] * args[0].shape[1] * N * N * D
    for _ in range(ROUNDS):
        t0 = time.perf_counter()
        out = chained(*args)
        _ = float(jnp.sum(out[:2].astype(jnp.float32)))
        best = min(best, (time.perf_counter() - t0) / ITERS)
    print(f"{name:<40s} {best*1e3:7.2f} ms  {flops/best/1e12:6.1f} TF",
          flush=True)
    return best


def timed_grad(name, fn, q, k, v):
    """One grad dispatch per iteration (can't chain through 3-tuple grads
    cheaply); grad programs are ms-scale so dispatch overhead is <5%."""
    g = jax.jit(jax.grad(lambda a, b, c: jnp.sum(
        fn(a, b, c).astype(jnp.float32))))
    out = g(q, k, v)
    _ = float(jnp.sum(out[:2, :2].astype(jnp.float32)))
    best = float("inf")
    for _ in range(max(ROUNDS * 3, 8)):
        t0 = time.perf_counter()
        out = g(q, k, v)
        _ = float(jnp.sum(out[:2, :2].astype(jnp.float32)))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:<40s} {best*1e3:7.2f} ms", flush=True)
    return best


def main():
    rng = np.random.default_rng(0)
    mk = lambda: jnp.asarray(
        rng.standard_normal((BH, N, D)), jnp.bfloat16).reshape(1, BH, N, D)
    q, k, v = mk(), mk(), mk()
    print(f"N={N} bh={BH} d={D}, chained x{ITERS}, best of {ROUNDS}")

    ref = None
    results = {}
    for bq, bk, chains in CASES[N]:
        label = f"fwd bq={bq} bk={bk} chains={chains}"
        fn = lambda a, b, c, bq=bq, bk=bk, ch=chains: flash_attention(
            a, b, c, block_q=bq, block_k=bk, q_chains=ch)
        got = np.asarray(fn(q, k, v), np.float32)
        if ref is None:
            ref = got
        err = np.max(np.abs(got - ref)) / (np.max(np.abs(ref)) + 1e-9)
        results[(bq, bk, chains)] = timed(label, fn, q, k, v)
        if err > 0:
            print(f"{'':<40s} rel err vs baseline: {err:.2e}", flush=True)

    top = min(results, key=results.get)
    base = CASES[N][0]
    print(f"\nbest fwd: bq={top[0]} bk={top[1]} chains={top[2]}  "
          f"({results[base]/results[top]:.2f}x baseline)", flush=True)

    # Dropout grad: baseline vs best-chained config (backward runs per-chain
    # block_q tiles when dropout > 0 — this is the cost being checked).
    print("\ngrad+dropout (fwd+bwd, one dispatch):", flush=True)
    grad_cases = [base] + ([top] if top != base else [])
    for bq, bk, chains in grad_cases:
        fn = lambda a, b, c, bq=bq, bk=bk, ch=chains: flash_attention(
            a, b, c, block_q=bq, block_k=bk, q_chains=ch,
            dropout_rate=0.1, dropout_seed=7)
        timed_grad(f"grad bq={bq} bk={bk} chains={chains}", fn, q, k, v)


if __name__ == "__main__":
    main()
