"""Reproduce BASELINE.md's 9-config inference table on TPU (SURVEY §7
step 9).

The reference's only published numbers are per-image inference times for
the 9 sweep configs at 224² (batch 4, most likely CPU — BASELINE.md note).
This measures the same nine models' serving forward (normalize → backbone →
head → upsample → argmax, bf16, batch 16) on one v5e chip: compile
excluded, ≥10 dispatches amortized, best-of-3, scalar-readback sync (pool
rules per CLAUDE.md). Prints a markdown table + one JSON line per config.
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from visiontransformer_tpu.configs import SWEEP_CONFIGS
from visiontransformer_tpu.models import vitseg_apply, vitseg_init

BATCH = 16
ITERS = 10
ROUNDS = 3

# BASELINE.md time-per-image seconds (reference committed CSVs, host
# hub-hpc) keyed by config name.
REFERENCE_S_PER_IMG = {
    "P16H512A8": 0.173, "P16H768A12": 0.349, "P16H1024A16": 0.611,
    "P8H512A8": 0.441, "P8H768A12": 0.893, "P8H1024A16": 1.455,
    "P4H512A8": 1.481, "P4H768A12": 3.144, "P4H1024A16": 5.873,
}


def main():
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.random((BATCH, 224, 224, 3)), jnp.float32)
    rows = []
    for entry in SWEEP_CONFIGS:
        cfg = entry.seg_config(num_classes=17, compute_dtype="bfloat16")
        params = vitseg_init(jax.random.PRNGKey(entry.id), cfg)

        @jax.jit
        def serve(params, x, cfg=cfg):
            logits = vitseg_apply(params, x, cfg, deterministic=True)
            return jnp.argmax(logits, axis=-1).astype(jnp.uint8)

        np.asarray(serve(params, images))  # compile + sync
        best = 0.0
        for _ in range(ROUNDS):
            t0 = time.perf_counter()
            for _ in range(ITERS):
                out = serve(params, images)
            np.asarray(out)
            best = max(best, BATCH * ITERS / (time.perf_counter() - t0))
        ref = REFERENCE_S_PER_IMG[entry.name]
        rows.append((entry.name, best, ref, best * ref))
        print(json.dumps({"config": entry.name,
                          "imgs_per_s": round(best, 1),
                          "ref_s_per_img": ref,
                          "speedup": round(best * ref, 1)}), flush=True)

    print("\n| Config | TPU imgs/s (bs16, bf16) | reference s/img | speedup |")
    print("|---|---|---|---|")
    for name, ips, ref, speed in rows:
        print(f"| {name} | {ips:.1f} | {ref:.3f} | {speed:,.0f}× |")


if __name__ == "__main__":
    main()
