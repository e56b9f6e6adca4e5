"""Inference throughput of the five conv segmentation families on TPU.

The reference's StructuralDamageModel can instantiate any smp arch
(model/CE/classes.py:106-110) but never published numbers for them; this
measures the native families' serving forward (normalize → encoder →
decoder → argmax, bf16, batch 16, 224²) on one chip with the same rules as
scripts/bench_sweep.py: compile excluded, ≥10 dispatches amortized,
best-of-3 in one process, scalar-readback sync (pool rules per CLAUDE.md).
Prints a markdown table + one JSON line per family.

Usage: python scripts/bench_families.py [encoder]   (default resnet34)
"""

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from visiontransformer_tpu.models.registry import MODEL_FAMILIES

BATCH = 16
ITERS = 10
ROUNDS = 3
FAMILIES = ("unet", "unetplusplus", "manet", "linknet", "fpn", "pan",
            "upernet", "segformer", "pspnet", "deeplabv3", "deeplabv3plus")


def main():
    encoder = sys.argv[1] if len(sys.argv) > 1 else "resnet34"
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.random((BATCH, 224, 224, 3)), jnp.float32)
    rows = []
    for name in FAMILIES:
        fam = MODEL_FAMILIES[name]
        cfg = fam.config_cls(encoder_name=encoder, num_classes=17,
                             compute_dtype="bfloat16")
        params = fam.init(jax.random.PRNGKey(0), cfg)
        n_params = sum(int(np.prod(p.shape))
                       for p in jax.tree.leaves(params))

        @jax.jit
        def serve(params, x, cfg=cfg, apply=fam.apply):
            logits = apply(params, x, cfg, deterministic=True)
            return jnp.argmax(logits, axis=-1).astype(jnp.uint8)

        np.asarray(serve(params, images))  # compile + sync
        best = 0.0
        for _ in range(ROUNDS):
            t0 = time.perf_counter()
            for _ in range(ITERS):
                out = serve(params, images)
            np.asarray(out)
            best = max(best, BATCH * ITERS / (time.perf_counter() - t0))
        rows.append((name, n_params, best))
        print(json.dumps({"family": name, "encoder": encoder,
                          "params_m": round(n_params / 1e6, 1),
                          "imgs_per_s": round(best, 1)}), flush=True)

    print(f"\n| Family ({encoder}) | params | TPU imgs/s (224², bs16, bf16) |")
    print("|---|---|---|")
    for name, n_params, ips in rows:
        print(f"| {name} | {n_params / 1e6:.1f}M | {ips:,.0f} |")


if __name__ == "__main__":
    main()
