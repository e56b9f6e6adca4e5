"""Stage profile v2 — everything chained-in-jit, dispatch overhead measured
explicitly and subtracted. Supersedes profile_stages.py's single-dispatch
numbers (those fold ~1 tunnel round-trip into each stage)."""

import time

import numpy as np

import jax
import jax.numpy as jnp

B, IMG, HID, LAYERS, HEADS = 16, 512, 768, 12, 12
G = IMG // 16
N = G * G + 1
ROUNDS = 5


def bench(name, g, x, iters, flops=None):
    out = g(x)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(ROUNDS):
        t0 = time.perf_counter()
        out = g(x)
        _ = float(jnp.sum(out).astype(jnp.float32))
        best = min(best, (time.perf_counter() - t0) / iters)
    tf = f"  {flops / best / 1e12:7.1f} TFLOPS" if flops else ""
    print(f"{name:<40s} {best * 1e3:8.3f} ms/iter{tf}")
    return best


def chain(f, iters):
    def g(x):
        for i in range(iters):
            x = f(x)
        return x
    return jax.jit(g)


def main():
    from visiontransformer_tpu.ops.flash_attention import flash_attention
    from visiontransformer_tpu.nn.layers import conv2d, conv2d_init

    rng = np.random.default_rng(0)
    print(f"backend={jax.default_backend()}")

    # dispatch overhead: trivial program, 1 dispatch
    t = jnp.zeros((8, 128), jnp.float32)
    triv = jax.jit(lambda x: x + 1.0)
    bench("dispatch overhead (trivial jit)", triv, t, 1)

    # pure matmul roofline
    a = jnp.asarray(rng.random((4096, 4096)), jnp.bfloat16)
    w = jnp.asarray(rng.random((4096, 4096)), jnp.bfloat16)
    bench("matmul 4096^3 bf16", chain(
        lambda x: jnp.dot(x, w, preferred_element_type=jnp.bfloat16), 16),
        a, 16, flops=2 * 4096**3)

    # attention per layer
    x = jnp.asarray(rng.random((B, HEADS, N, 64)) - 0.5, jnp.bfloat16)
    bench("flash/layer N=1025", chain(lambda t: flash_attention(t, t, t), 12),
          x, 12, flops=4 * N * N * 64 * B * HEADS)

    # layer matmuls per layer
    h = jnp.asarray(rng.random((B * N, HID)) - 0.5, jnp.bfloat16)
    wqkv = jnp.asarray(rng.random((HID, 3 * HID)) - 0.5, jnp.bfloat16) * 0.02
    wout = jnp.asarray(rng.random((HID, HID)) - 0.5, jnp.bfloat16) * 0.02
    w1 = jnp.asarray(rng.random((HID, 4 * HID)) - 0.5, jnp.bfloat16) * 0.02
    w2 = jnp.asarray(rng.random((4 * HID, HID)) - 0.5, jnp.bfloat16) * 0.02

    def layer_mm(t):
        qkv = jnp.dot(t, wqkv, preferred_element_type=jnp.bfloat16)
        o = jnp.dot(qkv[:, :HID], wout, preferred_element_type=jnp.bfloat16)
        m = jax.nn.gelu(jnp.dot(o, w1, preferred_element_type=jnp.bfloat16))
        return jnp.dot(m, w2, preferred_element_type=jnp.bfloat16)

    bench("matmuls/layer (qkv+out+mlp)", chain(layer_mm, 12), h, 12,
          flops=2 * B * N * HID * 12 * HID)

    # head convs (bf16, NHWC 32x32)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    p1 = conv2d_init(k1, HID, 256, 3)
    p2 = conv2d_init(k2, 256, 17, 1)
    feats = jnp.asarray(rng.random((B, G, G, HID)) - 0.5, jnp.bfloat16)

    def head(t):
        y = jax.nn.relu(conv2d(p1, t))
        y = conv2d(p2, y)
        # keep chain shape: pad channels back up to HID via broadcast-add
        return t + jnp.mean(y.astype(t.dtype))

    conv_flops = 2 * B * G * G * (9 * HID * 256 + 256 * 17)
    bench("head convs (3x3 768->256, 1x1->17)", chain(head, 10), feats, 10,
          flops=conv_flops)

    # conv as im2col matmul
    wk = jnp.asarray(rng.random((9 * HID, 256)) - 0.5, jnp.bfloat16) * 0.02

    def head_mm(t):
        patches = jnp.pad(t, ((0, 0), (1, 1), (1, 1), (0, 0)))
        cols = [patches[:, i:i + G, j:j + G, :] for i in range(3)
                for j in range(3)]
        pm = jnp.concatenate(cols, axis=-1).reshape(B * G * G, 9 * HID)
        y = jnp.dot(pm, wk, preferred_element_type=jnp.bfloat16)
        return t + jnp.mean(y.astype(t.dtype))

    bench("head conv as im2col matmul", chain(head_mm, 10), feats, 10,
          flops=2 * B * G * G * 9 * HID * 256)

    # upsample+argmax mm (from tune_head: ~2.9ms)


if __name__ == "__main__":
    main()
