"""Per-stage profile of the headline bench workload on the real TPU.

Times each stage of the serve path (backbone matmuls, attention, seg head,
upsample+argmax) separately, plus a pure-matmul roofline reference, to find
where the 272-masks/s batch actually spends its time.

Measurement rules per CLAUDE.md: the chip is pooled, so every number is
best-of-N, iterations are chained *inside* one jit program (a data
dependency defeats DCE), and sync is a scalar readback, not
block_until_ready.
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

BATCH = 16
IMG = 512
HID = 768
LAYERS = 12
HEADS = 12
N = (IMG // 16) ** 2 + 1  # 1025
ROUNDS = 5


def timed(name, fn, *args, iters=1, flops=None):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(ROUNDS):
        t0 = time.perf_counter()
        out = fn(*args)
        # scalar readback forces a full sync through the tunnel
        _ = float(jnp.sum(out[0] if isinstance(out, tuple) else out).astype(jnp.float32))
        dt = (time.perf_counter() - t0) / iters
        best = min(best, dt)
    tf = f"  {flops / best / 1e12:7.1f} TFLOPS" if flops else ""
    print(f"{name:<44s} {best * 1e3:8.2f} ms{tf}")
    return best


def chain(f, iters):
    """Run f iters times with a data dependency (defeats DCE).
    Python-unrolled: fori_loop compiles pathologically slowly on this
    runtime for large-carry bodies."""
    def g(x):
        for _ in range(iters):
            x = f(x)
        return x
    return jax.jit(g)


def main():
    rng = np.random.default_rng(0)
    print(f"backend={jax.default_backend()} devices={jax.devices()}")

    # --- roofline: pure bf16 matmul, MXU-friendly shapes ---
    M, K, Nw = 4096, 4096, 4096
    a = jnp.asarray(rng.random((M, K)), jnp.bfloat16)
    w = jnp.asarray(rng.random((K, Nw)), jnp.bfloat16)
    mm = chain(lambda x: jnp.dot(x, w, preferred_element_type=jnp.bfloat16), 16)
    timed("pure matmul 4096^3 bf16 (x16)", mm, a, iters=16,
          flops=2 * M * K * Nw)

    # --- attention stage at bench shapes: bh=192, N=1025, d=64 ---
    bh = BATCH * HEADS
    x = jnp.asarray(rng.random((BATCH, HEADS, N, 64)) - 0.5, jnp.bfloat16)
    attn_flops = 4 * N * N * 64 * bh  # qk^T + pv

    from visiontransformer_tpu.ops.flash_attention import flash_attention
    from visiontransformer_tpu.ops.attention import _xla_attention

    ours = chain(lambda t: flash_attention(t, t, t), LAYERS)
    timed("flash (ours) N=1025 x12", ours, x, iters=LAYERS, flops=attn_flops)

    xla = chain(lambda t: _xla_attention(t, t, t), LAYERS)
    timed("xla attention N=1025 x12", xla, x, iters=LAYERS, flops=attn_flops)

    try:
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            flash_attention as jax_flash)
        jf = chain(lambda t: jax_flash(t, t, t, causal=False), LAYERS)
        timed("flash (jax builtin) N=1025 x12", jf, x, iters=LAYERS,
              flops=attn_flops)
    except Exception as e:  # pragma: no cover
        print("jax builtin flash failed:", type(e).__name__, e)

    # --- non-attention transformer matmuls, one layer x12 ---
    h = jnp.asarray(rng.random((BATCH * N, HID)) - 0.5, jnp.bfloat16)
    wqkv = jnp.asarray(rng.random((HID, 3 * HID)) - 0.5, jnp.bfloat16) * 0.02
    wout = jnp.asarray(rng.random((HID, HID)) - 0.5, jnp.bfloat16) * 0.02
    w1 = jnp.asarray(rng.random((HID, 4 * HID)) - 0.5, jnp.bfloat16) * 0.02
    w2 = jnp.asarray(rng.random((4 * HID, HID)) - 0.5, jnp.bfloat16) * 0.02

    def layer_mm(t):
        qkv = jnp.dot(t, wqkv, preferred_element_type=jnp.bfloat16)
        o = jnp.dot(qkv[:, :HID], wout, preferred_element_type=jnp.bfloat16)
        m = jax.nn.gelu(jnp.dot(o, w1, preferred_element_type=jnp.bfloat16))
        return jnp.dot(m, w2, preferred_element_type=jnp.bfloat16)

    mm_flops = 2 * BATCH * N * HID * (3 * HID + HID + 4 * HID + 4 * HID) * LAYERS
    lmm = chain(layer_mm, LAYERS)
    timed("layer matmuls (qkv/out/mlp) x12", lmm, h, iters=1, flops=mm_flops)

    # --- full model stages ---
    from visiontransformer_tpu.configs import ViTConfig, ViTSegConfig
    from visiontransformer_tpu.models import vitseg_apply, vitseg_init
    from visiontransformer_tpu.models.vit import vit_apply
    from visiontransformer_tpu.nn.layers import conv2d
    from visiontransformer_tpu.ops.resize import resize_bilinear

    cfg = ViTSegConfig(
        vit=ViTConfig(image_size=IMG, patch_size=16, hidden_size=HID,
                      num_hidden_layers=LAYERS, num_attention_heads=HEADS),
        num_classes=17, compute_dtype="bfloat16")
    params = vitseg_init(jax.random.PRNGKey(0), cfg)
    images = jnp.asarray(rng.random((BATCH, IMG, IMG, 3)), jnp.float32)

    @jax.jit
    def full(params, images):
        logits = vitseg_apply(params, images, cfg, deterministic=True)
        return jnp.argmax(logits, axis=-1).astype(jnp.uint8)

    t_full = timed("FULL serve_step b16", full, params, images,
                   flops=218e9 * BATCH)

    @jax.jit
    def backbone(params, images):
        return vit_apply(params["backbone"], images, cfg.vit,
                         deterministic=True, dtype=cfg.dtype)

    t_bb = timed("backbone only b16", backbone, params, images,
                 flops=(174 + 39) * 1e9 * BATCH)

    tokens = backbone(params, images)
    g = cfg.vit.grid_size

    @jax.jit
    def head_up(params, tokens):
        feats = tokens[:, 1:, :].reshape(BATCH, g, g, HID)
        y = jax.nn.relu(conv2d(params["head_conv1"], feats))
        y = conv2d(params["head_conv2"], y)
        y = resize_bilinear(y.astype(jnp.float32), (IMG, IMG), h_axis=1, w_axis=2)
        return jnp.argmax(y, axis=-1).astype(jnp.uint8)

    t_head = timed("head+upsample+argmax b16", head_up, params, tokens,
                   flops=3.6e9 * BATCH)

    print(f"\nsum(backbone+head) = {(t_bb + t_head) * 1e3:.2f} ms "
          f"vs full = {t_full * 1e3:.2f} ms")
    print(f"masks/s at full: {BATCH / t_full:.1f}")

    # --- batch scaling ---
    for b in (32, 64):
        imgs_b = jnp.asarray(rng.random((b, IMG, IMG, 3)), jnp.float32)
        t = timed(f"FULL serve_step b{b}", full, params, imgs_b,
                  flops=218e9 * b)
        print(f"  masks/s at b{b}: {b / t:.1f}")


if __name__ == "__main__":
    main()
