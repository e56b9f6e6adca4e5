"""A/B the seg-head upsample+argmax variants in one process (pooled chip).

Candidates for the (B, 32, 32, 17) -> (B, 512, 512) argmax-mask path:
  gather   — current resize_bilinear (channel-minor gathers)
  mm       — dense interpolation-matrix matmuls (ops.resize.resize_bilinear_mm)
  mm_bf16  — same but bf16 matmuls
  mm_cmaj  — channel-major variant: argmax over a sublane axis
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

B, G, C, OUT = 16, 32, 17, 512
ROUNDS = 5
CHAIN = 10


def bench(name, f):
    x0 = jnp.asarray(np.random.default_rng(0).random((B, G, G, C)) - 0.5,
                     jnp.float32)

    @jax.jit
    def g(x):
        acc = jnp.zeros((B, OUT, OUT), jnp.int32)
        for i in range(CHAIN):
            acc = acc + f(x + jnp.float32(i) * 1e-6)
        return acc

    out = g(x0)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(ROUNDS):
        t0 = time.perf_counter()
        out = g(x0)
        _ = int(jnp.sum(out) % 1024)
        best = min(best, (time.perf_counter() - t0) / CHAIN)
    print(f"{name:<12s} {best*1e3:8.3f} ms")
    return best


def main():
    from visiontransformer_tpu.ops.resize import (
        resize_bilinear, resize_bilinear_mm, bilinear_matrix)

    print(f"backend={jax.default_backend()}")

    def gather(x):
        y = resize_bilinear(x, (OUT, OUT), h_axis=1, w_axis=2)
        return jnp.argmax(y, axis=-1).astype(jnp.int32)

    def mm(x):
        y = resize_bilinear_mm(x, (OUT, OUT))
        return jnp.argmax(y, axis=-1).astype(jnp.int32)

    wh = jnp.asarray(bilinear_matrix(OUT, G))

    def mm_bf16(x):
        y = jnp.einsum("Hh,bhwc->bHwc", wh.astype(jnp.bfloat16),
                       x.astype(jnp.bfloat16))
        y = jnp.einsum("Ww,bHwc->bHWc", wh.astype(jnp.bfloat16), y)
        return jnp.argmax(y, axis=-1).astype(jnp.int32)

    def mm_cmaj(x):
        xc = x.transpose(0, 3, 1, 2)  # (B, C, h, w)
        y = jnp.einsum("Hh,bchw->bcHw", wh, xc)
        y = jnp.einsum("Ww,bcHw->bcHW", wh, y)
        return jnp.argmax(y, axis=1).astype(jnp.int32)

    variants = [("gather", gather), ("mm", mm), ("mm_bf16", mm_bf16),
                ("mm_cmaj", mm_cmaj)]
    for name, f in variants:
        bench(name, f)

    # correctness: all variants agree with gather on random logits
    x = jnp.asarray(np.random.default_rng(1).random((2, G, G, C)), jnp.float32)
    ref = np.asarray(jnp.argmax(resize_bilinear(x, (OUT, OUT), h_axis=1,
                                                w_axis=2), -1))
    for name, f in variants[1:]:
        got = np.asarray(f(x))[:, :OUT, :OUT]
        agree = (got == ref).mean()
        print(f"{name}: argmax agreement vs gather = {agree:.6f}")


if __name__ == "__main__":
    main()
