"""Serving-forward throughput for the named ViT presets (vit_b_16 /
vit_l_16) — the BASELINE.json stretch config is a dynamic-batched worker
with ViT-L/16. Same measurement rules as bench_sweep.py: bf16, batch 16,
fused normalize->backbone->head->upsample->argmax, compile excluded,
amortized dispatches, best-of-N, scalar-readback sync (pool rules per
CLAUDE.md).

Env: PRESETS (comma list, default vit_b_16,vit_l_16),
     SIZES (comma list of input sizes, default 224,512), BATCH (default 16).
"""

import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from visiontransformer_tpu.configs import ViTSegConfig, vit_config_by_name
from visiontransformer_tpu.models import vitseg_apply, vitseg_init

PRESETS = os.environ.get("PRESETS", "vit_b_16,vit_l_16").split(",")
SIZES = [int(s) for s in os.environ.get("SIZES", "224,512").split(",")]
BATCH = int(os.environ.get("BATCH", "16"))
ITERS = 10
ROUNDS = 3


def main():
    rng = np.random.default_rng(0)
    for name in PRESETS:
        for size in SIZES:
            vit = vit_config_by_name(name, image_size=size)
            if size % vit.patch_size:
                continue
            cfg = ViTSegConfig(vit=vit, num_classes=17,
                               compute_dtype="bfloat16")
            params = vitseg_init(jax.random.PRNGKey(0), cfg)
            n_params = sum(int(np.prod(p.shape))
                           for p in jax.tree_util.tree_leaves(params))
            images = jnp.asarray(rng.random((BATCH, size, size, 3)),
                                 jnp.float32)

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
            print(json.dumps({"preset": name, "input": size,
                              "params_m": round(n_params / 1e6, 1),
                              "imgs_per_s": round(best, 1)}))


if __name__ == "__main__":
    main()
