"""A/B: fused resize→patch-embed fold vs the round-2 pipeline, on-chip.

Round-4 VERDICT's prime headline lever: the 512→224 bilinear resize, the
ImageNet normalize, and the patch-embed projection are all linear, so they
compose offline (ops/fused_preproc.py) — deleting the resize stage
(~1.6 ms/batch-32 in the round-2 stage profile) and its HBM round trip
from the serving program. Also measures the uint8-input variants (the
serving worker ships uint8 over the tunnel already; /255 folds into the
row matrix for free) and re-sweeps batch size for the winner.

All variants in ONE process, interleaved, best-of-N, full uint8 mask
readback — the exact bench.py measurement conditions (CLAUDE.md pool rules).
"""

import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from visiontransformer_tpu.configs import ViTConfig, ViTSegConfig  # noqa: E402
from visiontransformer_tpu.models import vitseg_init  # noqa: E402
from visiontransformer_tpu.models.vitseg import (  # noqa: E402
    vitseg_build_fused_preproc,
    vitseg_predict,
    vitseg_predict_fused,
)
from visiontransformer_tpu.ops.resize import resize_bilinear_mm  # noqa: E402

IMAGE_SIZE = 512
COMPUTE = 224
ITERS = int(os.environ.get("FP_ITERS", 100))
ROUNDS = int(os.environ.get("FP_ROUNDS", 5))
BATCHES = [int(b) for b in os.environ.get("FP_BATCHES", "32").split(",")]

_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_STD = np.array([0.229, 0.224, 0.225], np.float32)


def bench(fn, *args):
    np.asarray(fn(*args))  # compile + sync
    best = float("inf")
    for _ in range(ROUNDS):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = fn(*args)
        np.asarray(out)
        best = min(best, (time.perf_counter() - t0) / ITERS)
    return best


def main():
    cfg = ViTSegConfig(
        vit=ViTConfig(image_size=COMPUTE, patch_size=16, hidden_size=768,
                      num_hidden_layers=12, num_attention_heads=12),
        num_classes=17, compute_dtype="bfloat16")
    params = vitseg_init(jax.random.PRNGKey(0), cfg)
    consts_f32 = vitseg_build_fused_preproc(params, cfg, in_size=IMAGE_SIZE,
                                            mean=_MEAN, std=_STD)
    consts_u8 = vitseg_build_fused_preproc(params, cfg, in_size=IMAGE_SIZE,
                                           mean=_MEAN, std=_STD,
                                           input_scale=1.0 / 255.0)

    @jax.jit
    def step_base(params, raw):  # the committed bench.py program
        x = resize_bilinear_mm(raw, (COMPUTE, COMPUTE))
        x = (x - jnp.asarray(_MEAN)) / jnp.asarray(_STD)
        m = vitseg_predict(params, x, cfg, out_size=(IMAGE_SIZE, IMAGE_SIZE))
        return m.astype(jnp.uint8)

    @jax.jit
    def step_fused(params, raw):
        m = vitseg_predict_fused(params, consts_f32, raw, cfg,
                                 out_size=(IMAGE_SIZE, IMAGE_SIZE))
        return m.astype(jnp.uint8)

    @jax.jit
    def step_base_u8(params, raw_u8):
        x = raw_u8.astype(jnp.float32) / 255.0
        x = resize_bilinear_mm(x, (COMPUTE, COMPUTE))
        x = (x - jnp.asarray(_MEAN)) / jnp.asarray(_STD)
        m = vitseg_predict(params, x, cfg, out_size=(IMAGE_SIZE, IMAGE_SIZE))
        return m.astype(jnp.uint8)

    @jax.jit
    def step_fused_u8(params, raw_u8):
        m = vitseg_predict_fused(params, consts_u8, raw_u8, cfg,
                                 out_size=(IMAGE_SIZE, IMAGE_SIZE))
        return m.astype(jnp.uint8)

    rng = np.random.default_rng(0)
    for batch in BATCHES:
        raw_u8 = rng.integers(0, 256, (batch, IMAGE_SIZE, IMAGE_SIZE, 3),
                              dtype=np.uint8)
        imgs_f32 = jnp.asarray(raw_u8, jnp.float32) / 255.0
        imgs_u8 = jnp.asarray(raw_u8)

        # Correctness: identical underlying images through all four paths.
        m_base = np.asarray(step_base(params, imgs_f32))
        for name, m in [("fused", np.asarray(step_fused(params, imgs_f32))),
                        ("base_u8", np.asarray(step_base_u8(params, imgs_u8))),
                        ("fused_u8", np.asarray(step_fused_u8(params, imgs_u8)))]:
            agree = (m == m_base).mean()
            print(f"bs{batch} agreement {name} vs base: {agree:.6f}",
                  flush=True)

        results = {}
        # Interleave A/B/C/D twice to ride out pool drift.
        for _ in range(2):
            for name, fn, arg in [("base_f32", step_base, imgs_f32),
                                  ("fused_f32", step_fused, imgs_f32),
                                  ("base_u8", step_base_u8, imgs_u8),
                                  ("fused_u8", step_fused_u8, imgs_u8)]:
                dt = bench(fn, params, arg)
                results[name] = min(results.get(name, float("inf")), dt)
                print(f"  bs{batch} {name}: {dt * 1e3:7.2f} ms/batch = "
                      f"{batch / dt:8.1f} masks/s", flush=True)
        base = results["base_f32"]
        for name, dt in results.items():
            print(f"bs{batch} BEST {name}: {batch / dt:8.1f} masks/s "
                  f"({base / dt:5.3f}x vs base_f32)", flush=True)


if __name__ == "__main__":
    main()
