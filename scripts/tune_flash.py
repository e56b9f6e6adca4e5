"""Flash-attention block-size tuning on the real TPU.

Sweeps (block_q, block_k, n_pad) for the three sweep sequence lengths
(N=197 patch-16, N=785 patch-8, N=3137 patch-4 at 224px; N=1025 patch-16 at
512px) and compares against the XLA einsum path, to populate
ops/flash_attention._TUNED_BLOCKS and justify the auto-dispatch threshold in
ops/attention.py with measured numbers (VERDICT round-1 item 5).

Chained-in-jit, best-of-N (pooled chip; see CLAUDE.md).

Companion: scripts/tune_flash2.py measures kernel-internal VARIANTS
(bf16 softmax, exp2, k-chunking) at fixed blocks rather than block sizes —
this file remains the canonical block-size sweep.
"""

import itertools
import time

import numpy as np

import jax
import jax.numpy as jnp

ROUNDS = 4
CHAIN = 12


def bench(fn, x, iters=CHAIN):
    out = fn(x)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(ROUNDS):
        t0 = time.perf_counter()
        out = fn(x)
        _ = float(jnp.sum(out).astype(jnp.float32))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def chain(f, iters=CHAIN):
    # Python-unrolled (fori_loop compiles pathologically slowly here).
    def g(x):
        for _ in range(iters):
            x = f(x)
        return x
    return jax.jit(g)


def main():
    from visiontransformer_tpu.ops.flash_attention import (
        flash_attention, _round_up)
    from visiontransformer_tpu.ops.attention import _xla_attention

    rng = np.random.default_rng(0)
    print(f"backend={jax.default_backend()}")

    # (N, batch, heads) for each sweep config at its native resolution.
    cases = [
        (197, 16, 8),     # P16 @224, H512A8
        (785, 16, 8),     # P8  @224, H512A8
        (1025, 16, 12),   # P16 @512 (bench workload, ViT-B)
        (3137, 4, 8),     # P4  @224, H512A8
    ]

    for n, b, h in cases:
        x = jnp.asarray(rng.random((b, h, n, 64)) - 0.5, jnp.bfloat16)
        flops = 4 * n * n * 64 * b * h
        t_xla = bench(chain(lambda t: _xla_attention(t, t, t)), x)
        print(f"\nN={n} bh={b*h}:  xla {t_xla*1e3:7.3f} ms "
              f"({flops/t_xla/1e12:5.1f} TF)")

        # flash_attention pads to round_up(n, max(bq, bk)); enumerate unique
        # (bq, bk, implied pad) combos. Tunnel compiles cost ~40s each, so
        # keep only the plausible shapes: square tiles, or full-K streaming.
        sizes = (128, 256, 384, 512, 576, 640, 768, 1024, 1152)
        seen, results = set(), []
        for bq, bk in itertools.product(sizes, sizes):
            n_pad = _round_up(n, max(bq, bk))
            if n_pad % bq or n_pad % bk:
                continue
            if not (bq == bk or bk == n_pad):
                continue
            if (bq, bk, n_pad) in seen:
                continue
            seen.add((bq, bk, n_pad))
            # VMEM guard: full K/V per (b,h) + q/o tiles + fp32 score tile.
            if (n_pad * 64 * 2 * 2 + (bq + bk) * 64 * 2 * 4
                    + bq * bk * 4 * 2 > 14e6):
                continue
            try:
                f = chain(lambda t, bq=bq, bk=bk:
                          flash_attention(t, t, t, block_q=bq, block_k=bk))
                t_f = bench(f, x)
                results.append((t_f, bq, bk, n_pad))
            except Exception as e:
                print(f"  bq={bq} bk={bk} pad={n_pad}: {type(e).__name__}")
        results.sort()
        for t_f, bq, bk, n_pad in results[:6]:
            mark = " <-- best" if t_f == results[0][0] else ""
            print(f"  bq={bq:4d} bk={bk:4d} pad={n_pad:4d}: "
                  f"{t_f*1e3:7.3f} ms ({flops/t_f/1e12:5.1f} TF) "
                  f"[{t_xla/t_f:4.2f}x xla]{mark}")


if __name__ == "__main__":
    main()
