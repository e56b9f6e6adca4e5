"""Layout experiments for the parity serving pipeline (512 in -> 224 compute
-> 512 mask out).

bench_parity.py's stage split showed the on-device 512->224 input resize
costing ~0.8x the whole ViT-B backbone — the NHWC einsum leaves C=3 in the
lane dimension where it pads to 128 (42x wasted bandwidth). This measures
resize layout variants, the fused upsample+argmax kernel vs the XLA mm+argmax
epilogue, and flash-vs-XLA attention at bs32/N=197, all in ONE process
(pool rules per CLAUDE.md).
"""

import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp

from visiontransformer_tpu.configs import ViTConfig, ViTSegConfig
from visiontransformer_tpu.models import vitseg_init
from visiontransformer_tpu.models.vit import vit_apply
from visiontransformer_tpu.nn.layers import conv2d
from visiontransformer_tpu.ops.resize import (
    bilinear_matrix,
    resize_bilinear,
    resize_bilinear_mm,
)
from visiontransformer_tpu.ops.upsample_argmax import upsample_argmax

BS = 32
ITERS = 20
ROUNDS = 4


def _sync(out):
    # Tiny dependent readback: forces completion through the tunnel without
    # hauling the full output back (a (32,224,224,3) fp32 readback is ~19 MB
    # and would dominate these measurements).
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jnp.ravel(leaf)[:16])


def bench_ms(fn, *args):
    _sync(fn(*args))
    best = float("inf")
    for _ in range(ROUNDS):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = fn(*args)
        _sync(out)
        best = min(best, (time.perf_counter() - t0) / ITERS * 1e3)
    return best


def main():
    rng = np.random.default_rng(0)
    x_nhwc = jnp.asarray(rng.random((BS, 512, 512, 3)), jnp.float32)
    x_nchw = jnp.asarray(np.transpose(np.asarray(x_nhwc), (0, 3, 1, 2)))
    wh = jnp.asarray(bilinear_matrix(224, 512))

    @jax.jit
    def mm_nhwc(x):
        return resize_bilinear_mm(x, (224, 224))

    @jax.jit
    def mm_merged(x):
        b = x.shape[0]
        y = jnp.einsum("Hh,bhm->bHm", wh, x.reshape(b, 512, 512 * 3))
        y = y.reshape(b, 224, 512, 3).transpose(0, 2, 1, 3)
        y = jnp.einsum("Wh,bhm->bWm", wh, y.reshape(b, 512, 224 * 3))
        return y.reshape(b, 224, 224, 3).transpose(0, 2, 1, 3)

    @jax.jit
    def mm_nchw(x):  # (B, 3, 512, 512) -> (B, 3, 224, 224)
        y = jnp.einsum("Hh,bchw->bcHw", wh, x)
        return jnp.einsum("Ww,bchw->bchW", wh, y)

    @jax.jit
    def gather_nhwc(x):
        return resize_bilinear(x, (224, 224), h_axis=1, w_axis=2)

    print(f"resize 512->224 variants, bs{BS} fp32 (ms/batch):", flush=True)
    for name, fn, arg in [("mm_nhwc  ", mm_nhwc, x_nhwc),
                          ("mm_merged", mm_merged, x_nhwc),
                          ("mm_nchw  ", mm_nchw, x_nchw),
                          ("gather   ", gather_nhwc, x_nhwc)]:
        print(f"  {name}: {bench_ms(fn, arg):7.2f}", flush=True)

    # ---- head epilogue: mm+argmax vs fused Pallas kernel ----
    logits = jnp.asarray(rng.standard_normal((BS, 14, 14, 17)), jnp.float32)

    @jax.jit
    def head_mm(z):
        return jnp.argmax(resize_bilinear_mm(z, (512, 512)), -1).astype(jnp.uint8)

    @jax.jit
    def head_fused(z):
        return upsample_argmax(z, (512, 512)).astype(jnp.uint8)

    ref = np.asarray(head_mm(logits))
    got = np.asarray(head_fused(logits))
    print(f"head epilogue agreement: {(ref == got).mean():.6f}", flush=True)
    print(f"  mm+argmax  : {bench_ms(head_mm, logits):7.2f} ms", flush=True)
    print(f"  fused pallas: {bench_ms(head_fused, logits):7.2f} ms", flush=True)

    # ---- backbone attention impl at bs32 / N=197 ----
    cfg = ViTSegConfig(
        vit=ViTConfig(image_size=224, patch_size=16, hidden_size=768,
                      num_hidden_layers=12, num_attention_heads=12),
        num_classes=17, compute_dtype="bfloat16")
    params = vitseg_init(jax.random.PRNGKey(0), cfg)
    x224 = jnp.asarray(rng.random((BS, 224, 224, 3)), jnp.float32)

    for impl in ("xla", "flash"):
        @jax.jit
        def bb(p, x, impl=impl):
            return vit_apply(p["backbone"], x, cfg.vit, deterministic=True,
                             dtype=jnp.bfloat16, attn_impl=impl)
        print(f"  backbone@224 attn={impl}: {bench_ms(bb, params, x224):7.2f} ms",
              flush=True)

    # ---- full parity pipeline, best layout + fused epilogue ----
    mean = jnp.asarray(np.array([0.485, 0.456, 0.406], np.float32))
    std = jnp.asarray(np.array([0.229, 0.224, 0.225], np.float32))

    @jax.jit
    def pipeline_nchw(p, raw):  # raw (B, 3, 512, 512)
        y = jnp.einsum("Hh,bchw->bcHw", wh, raw)
        y = jnp.einsum("Ww,bchw->bchW", wh, y)
        y = (y - mean[:, None, None]) / std[:, None, None]
        x = y.transpose(0, 2, 3, 1)  # NHWC for the backbone at 224 (cheap?)
        tokens = vit_apply(p["backbone"], x, cfg.vit, deterministic=True,
                           dtype=jnp.bfloat16)
        t = tokens[:, 1:, :].reshape(BS, 14, 14, 768)
        z = conv2d(p["head_conv1"], t)
        z = jax.nn.relu(z)
        z = conv2d(p["head_conv2"], z)
        return upsample_argmax(z.astype(jnp.float32), (512, 512)).astype(jnp.uint8)

    @jax.jit
    def pipeline_nhwc(p, raw):  # control: round-1 layout, fused head
        x = resize_bilinear_mm(raw, (224, 224))
        x = (x - mean) / std
        tokens = vit_apply(p["backbone"], x, cfg.vit, deterministic=True,
                           dtype=jnp.bfloat16)
        t = tokens[:, 1:, :].reshape(BS, 14, 14, 768)
        z = conv2d(p["head_conv1"], t)
        z = jax.nn.relu(z)
        z = conv2d(p["head_conv2"], z)
        return upsample_argmax(z.astype(jnp.float32), (512, 512)).astype(jnp.uint8)

    for name, fn, arg in [("nchw in", pipeline_nchw, x_nchw),
                          ("nhwc in", pipeline_nhwc, x_nhwc)]:
        ms = bench_ms(fn, params, arg)
        print(f"  full parity pipeline ({name}, fused head): {ms:7.2f} ms/batch"
              f" = {BS / ms * 1e3:7.1f} masks/s", flush=True)


if __name__ == "__main__":
    main()
