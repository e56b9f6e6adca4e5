"""Token-merging throughput/quality sweep on the real TPU.

A/B within one process (pool rules per CLAUDE.md): the headline serving
workload (ViT-B/16 seg @512², bf16, batch 16, fused preproc→argmax) at
token_merge_r ∈ {0, 8, 16, 25}, reporting masks/s and mask agreement vs
the exact (r=0) model. 1025 tokens − 12·r: r=25 ends the stack at 725
tokens (~0.71× token count in late layers).

Usage: python scripts/bench_tome.py [img_size] [batch]
"""

import dataclasses
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from visiontransformer_tpu.configs import ViTConfig, ViTSegConfig
from visiontransformer_tpu.models import vitseg_apply, vitseg_init

IMG = int(sys.argv[1]) if len(sys.argv) > 1 else 512
BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 16
ITERS, ROUNDS = 20, 3

_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_STD = np.array([0.229, 0.224, 0.225], np.float32)


def main():
    base_cfg = ViTSegConfig(
        vit=ViTConfig(image_size=IMG, patch_size=16, hidden_size=768,
                      num_hidden_layers=12, num_attention_heads=12),
        num_classes=17, compute_dtype="bfloat16")
    params = vitseg_init(jax.random.PRNGKey(0), base_cfg)
    images = jnp.asarray(
        np.random.default_rng(0).random((BATCH, IMG, IMG, 3)), jnp.float32)

    def make_step(cfg):
        @jax.jit
        def step(p, raw):
            x = (raw - jnp.asarray(_MEAN)) / jnp.asarray(_STD)
            logits = vitseg_apply(p, x, cfg, deterministic=True)
            return jnp.argmax(logits, -1).astype(jnp.uint8)
        return step

    results = {}
    ref_masks = None
    for r in (0, 8, 16, 25):
        cfg = dataclasses.replace(
            base_cfg, vit=dataclasses.replace(base_cfg.vit,
                                              token_merge_r=r))
        step = make_step(cfg)
        masks = np.asarray(step(params, images))  # compile + sync
        if r == 0:
            ref_masks = masks
        best = 0.0
        for _ in range(ROUNDS):
            t0 = time.perf_counter()
            for _ in range(ITERS):
                out = step(params, images)
            np.asarray(out)  # full host readback = real sync (CLAUDE.md)
            best = max(best, BATCH * ITERS / (time.perf_counter() - t0))
        agree = float(np.mean(masks == ref_masks))
        results[r] = (best, agree)
        print(f"r={r:3d}: {best:8.1f} masks/s  "
              f"agreement vs exact: {agree:.4f}", flush=True)

    base = results[0][0]
    for r, (v, a) in results.items():
        if r:
            print(f"r={r}: {v / base:.2f}x speedup at {a:.4f} agreement")


if __name__ == "__main__":
    main()
