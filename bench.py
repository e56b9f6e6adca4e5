"""Headline benchmark: 512×512 segmentation masks/sec/chip, batched inference.

Workload: ViT-B/16 backbone + conv seg head at 512×512 (1024 patches + CLS),
bf16 compute, fused normalize→patchify→transformer→head→bilinear→argmax in a
single XLA program — the serving-path forward (BASELINE.json config
"ViT-B/16 + seg head, batch-8 512×512 mask inference with fused preproc").

Baseline: the reference's closest published number is ViT-B-shape
P16H768A12 at 0.349 s/img → 2.86 img/s (224px, host 'hub-hpc'; BASELINE.md).
vs_baseline divides by that — conservative, since our masks are 512² (5.2×
the pixels). North star: ≥2000 masks/s/chip.

Timing amortizes ≥20 dispatches per measurement and repeats 3 rounds,
reporting the best (remote-tunnel dispatch makes single-call timing
meaningless — see .claude/skills/verify/SKILL.md).
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

BASELINE_IMGS_PER_SEC = 2.86  # reference P16H768A12, BASELINE.md
BATCH = 16
IMAGE_SIZE = 512
ITERS = 20
ROUNDS = 5  # the chip is pooled/shared; best-of-N rides out contention

# ImageNet normalization constants (standard for ViT preprocessing).
_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_STD = np.array([0.229, 0.224, 0.225], np.float32)


def main():
    from visiontransformer_tpu.configs import ViTConfig, ViTSegConfig
    from visiontransformer_tpu.models import vitseg_apply, vitseg_init

    cfg = ViTSegConfig(
        vit=ViTConfig(image_size=IMAGE_SIZE, patch_size=16, hidden_size=768,
                      num_hidden_layers=12, num_attention_heads=12),
        num_classes=17, compute_dtype="bfloat16")
    params = vitseg_init(jax.random.PRNGKey(0), cfg)

    @jax.jit
    def serve_step(params, raw_images):
        # Fused preprocessing: normalize on-device, straight into patchify.
        x = (raw_images - jnp.asarray(_MEAN)) / jnp.asarray(_STD)
        logits = vitseg_apply(params, x, cfg, deterministic=True)
        return jnp.argmax(logits, axis=-1).astype(jnp.uint8)

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.random((BATCH, IMAGE_SIZE, IMAGE_SIZE, 3)),
                         jnp.float32)

    np.asarray(serve_step(params, images))  # compile + full sync

    best = 0.0
    for _ in range(ROUNDS):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = serve_step(params, images)
        # Full host readback: block_until_ready alone returns early through
        # the remote-TPU tunnel and over-reports by ~1000x.
        np.asarray(out)
        dt = time.perf_counter() - t0
        best = max(best, BATCH * ITERS / dt)

    print(json.dumps({
        "metric": "512px masks/sec/chip (ViT-B/16 seg, bf16, batch %d, fused preproc)" % BATCH,
        "value": round(best, 2),
        "unit": "masks/s",
        "vs_baseline": round(best / BASELINE_IMGS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
