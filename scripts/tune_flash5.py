"""Per-PATH flash block sweep (round-4 directive: split _TUNED_BLOCKS).

Round 3 measured chains=3 at N=1025 as 1.13x on the no-lse inference
forward but 3% slower on grad, and shipped one table keyed only by N —
leaving the inference win on the table. ops/flash_attention.py now carries
_TUNED_BLOCKS_INFER and _TUNED_BLOCKS_TRAIN; this script re-sweeps both
paths at every production length so each table holds its own optimum:

  - fwd-only = the production inference program (primal path, no lse
    store) — what the headline bench and every serving path dispatch;
  - grad+dropout = the production training program (lse-writing forward
    under custom-VJP + both backward kernels + in-kernel dropout).

Run: python scripts/tune_flash5.py [N ...]  (defaults to 785 1025 3137).
Measurement rules per CLAUDE.md: one process, A/B orderings only, chained
iterations inside one jit for fwd, best-of-N, scalar readback sync.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from visiontransformer_tpu.ops.flash_attention import flash_attention

D = 64
ITERS = 12
ROUNDS = 4

# realistic batch*heads per production length (docs/PERFORMANCE.md tables)
BH = {785: 128, 1025: 192, 3137: 32}

# (block_q, block_k, q_chains); first entry = round-3 shipped baseline.
CASES = {
    785: [(512, 1024, 1), (224, 896, 2), (112, 896, 4), (256, 1024, 2),
          (448, 896, 1)],
    1025: [(192, 1152, 2), (384, 1152, 1), (128, 1152, 3), (144, 1152, 4),
           (96, 1152, 3)],
    3137: [(320, 640, 2), (640, 640, 1), (160, 640, 2), (160, 640, 4),
           (128, 640, 5)],
}


def timed_fwd(name, fn, *args, n):
    chained = jax.jit(lambda a, b, c: functools.reduce(
        lambda q, _: fn(q, b, c) + 0 * q, range(ITERS), a))
    out = chained(*args)
    _ = float(jnp.sum(out[:2].astype(jnp.float32)))
    best = float("inf")
    flops = 4 * args[0].shape[0] * args[0].shape[1] * n * n * D
    for _ in range(ROUNDS):
        t0 = time.perf_counter()
        out = chained(*args)
        _ = float(jnp.sum(out[:2].astype(jnp.float32)))
        best = min(best, (time.perf_counter() - t0) / ITERS)
    print(f"  {name:<38s} {best*1e3:7.2f} ms  {flops/best/1e12:6.1f} TF",
          flush=True)
    return best


def timed_grad(name, fn, q, k, v):
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
    print(f"  {name:<38s} {best*1e3:7.2f} ms", flush=True)
    return best


def sweep(n):
    bh = BH[n]
    rng = np.random.default_rng(0)
    mk = lambda: jnp.asarray(
        rng.standard_normal((bh, n, D)), jnp.bfloat16).reshape(1, bh, n, D)
    q, k, v = mk(), mk(), mk()
    print(f"\n=== N={n} bh={bh} d={D} (chained x{ITERS}, best of {ROUNDS})",
          flush=True)

    print("fwd-only (inference path, no lse):", flush=True)
    ref, fwd = None, {}
    for bq, bk, ch in CASES[n]:
        fn = lambda a, b, c, bq=bq, bk=bk, ch=ch: flash_attention(
            a, b, c, block_q=bq, block_k=bk, q_chains=ch)
        got = np.asarray(fn(q, k, v), np.float32)
        if ref is None:
            ref = got
        err = np.max(np.abs(got - ref)) / (np.max(np.abs(ref)) + 1e-9)
        fwd[(bq, bk, ch)] = timed_fwd(
            f"bq={bq} bk={bk} chains={ch}", fn, q, k, v, n=n)
        if err > 1e-2:
            print(f"  {'':<38s} REL ERR vs baseline: {err:.2e}", flush=True)

    print("grad+dropout (training path):", flush=True)
    grads = {}
    for bq, bk, ch in CASES[n]:
        fn = lambda a, b, c, bq=bq, bk=bk, ch=ch: flash_attention(
            a, b, c, block_q=bq, block_k=bk, q_chains=ch,
            dropout_rate=0.1, dropout_seed=7)
        grads[(bq, bk, ch)] = timed_grad(
            f"bq={bq} bk={bk} chains={ch}", fn, q, k, v)

    base = CASES[n][0]
    bi = min(fwd, key=fwd.get)
    bt = min(grads, key=grads.get)
    print(f"N={n}: INFER best {bi} ({fwd[base]/fwd[bi]:.3f}x vs {base}); "
          f"TRAIN best {bt} ({grads[base]/grads[bt]:.3f}x vs {base})",
          flush=True)
    return bi, bt


def main():
    ns = [int(a) for a in sys.argv[1:]] or [785, 1025, 3137]
    print(f"backend={jax.default_backend()}")
    picks = {n: sweep(n) for n in ns}
    print("\nsummary (N -> infer pick / train pick):")
    for n, (bi, bt) in picks.items():
        print(f"  {n}: infer={bi}  train={bt}")


if __name__ == "__main__":
    main()
