"""A/B the two readings of BASELINE.json's 512-mask serving config.

BASELINE.json config 2 is "ViT-B/16 + seg head, batch-8 512x512 mask
inference with fused preproc", and the north star defines the fused preproc
as "image decode/resize/normalize/patchify ... one XLA preprocessing graph"
with "mIoU and per-class accuracy parity vs the timm/PyTorch baseline".
The timm/PyTorch baseline (reference model/CE/testViTModel.py:92-97)
resizes EVERY input to 224 before the backbone — so the parity pipeline for
a 512x512 input is: fused resize(512->224) -> normalize -> ViT-B/16@224 ->
head -> bilinear logits->512 -> argmax. Round 1 instead ran the backbone at
512 native (1025 tokens, ~5x the FLOPs — a stricter workload than the
baseline defines; kept here as the control).

Measures, in ONE process on the real chip (pool rules per CLAUDE.md:
amortized dispatches, best-of-N, full readback sync):
  - native512 @ batch 16 (round-1 bench control)
  - parity224 @ batch 16/32/64
  - per-stage split of parity224 (resize+norm / backbone / head+up+argmax)
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

from visiontransformer_tpu.configs import ViTConfig, ViTSegConfig
from visiontransformer_tpu.models import vitseg_apply, vitseg_init
from visiontransformer_tpu.models.vit import vit_apply
from visiontransformer_tpu.ops.resize import resize_bilinear_mm

_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_STD = np.array([0.229, 0.224, 0.225], np.float32)

ITERS = 20
ROUNDS = 4


def bench(fn, args, n_items):
    np.asarray(fn(*args))  # compile + sync
    best = 0.0
    for _ in range(ROUNDS):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = fn(*args)
        np.asarray(out)
        best = max(best, n_items * ITERS / (time.perf_counter() - t0))
    return best


def main():
    cfg512 = ViTSegConfig(
        vit=ViTConfig(image_size=512, patch_size=16, hidden_size=768,
                      num_hidden_layers=12, num_attention_heads=12),
        num_classes=17, compute_dtype="bfloat16")
    cfg224 = ViTSegConfig(
        vit=ViTConfig(image_size=224, patch_size=16, hidden_size=768,
                      num_hidden_layers=12, num_attention_heads=12),
        num_classes=17, compute_dtype="bfloat16")
    p512 = vitseg_init(jax.random.PRNGKey(0), cfg512)
    p224 = vitseg_init(jax.random.PRNGKey(0), cfg224)

    @jax.jit
    def native512(params, raw):
        x = (raw - jnp.asarray(_MEAN)) / jnp.asarray(_STD)
        logits = vitseg_apply(params, x, cfg512, deterministic=True)
        return jnp.argmax(logits, axis=-1).astype(jnp.uint8)

    @jax.jit
    def parity224(params, raw):
        x = resize_bilinear_mm(raw, (224, 224))
        x = (x - jnp.asarray(_MEAN)) / jnp.asarray(_STD)
        logits = vitseg_apply(params, x, cfg224, deterministic=True)
        logits = resize_bilinear_mm(logits, (raw.shape[1], raw.shape[2]))
        return jnp.argmax(logits, axis=-1).astype(jnp.uint8)

    rng = np.random.default_rng(0)

    raw16 = jnp.asarray(rng.random((16, 512, 512, 3)), jnp.float32)
    print(f"native512 bs16:  {bench(native512, (p512, raw16), 16):8.1f} masks/s",
          flush=True)
    for bs in (16, 32, 64):
        raw = jnp.asarray(rng.random((bs, 512, 512, 3)), jnp.float32)
        v = bench(parity224, (p224, raw), bs)
        print(f"parity224 bs{bs}: {v:8.1f} masks/s", flush=True)

    # ---- per-stage split at bs 32 (each stage chained in its own jit) ----
    bs = 32
    raw = jnp.asarray(rng.random((bs, 512, 512, 3)), jnp.float32)

    @jax.jit
    def stage_pre(raw):
        x = resize_bilinear_mm(raw, (224, 224))
        return ((x - jnp.asarray(_MEAN)) / jnp.asarray(_STD)).astype(jnp.bfloat16)

    @jax.jit
    def stage_backbone(params, x):
        return vit_apply(params["backbone"], x.astype(jnp.float32), cfg224.vit,
                         deterministic=True, dtype=jnp.bfloat16)

    from visiontransformer_tpu.nn.layers import conv2d

    @jax.jit
    def stage_head(params, tokens):
        t = tokens[:, 1:, :].reshape(bs, 14, 14, cfg224.vit.hidden_size)
        x = conv2d(params["head_conv1"], t)
        x = jax.nn.relu(x)
        x = conv2d(params["head_conv2"], x)
        logits = resize_bilinear_mm(x.astype(jnp.float32), (512, 512))
        return jnp.argmax(logits, axis=-1).astype(jnp.uint8)

    x = stage_pre(raw)
    toks = stage_backbone(p224, x)
    for name, fn, args in [("pre(resize+norm)", stage_pre, (raw,)),
                           ("backbone@224", stage_backbone, (p224, x)),
                           ("head+up512+argmax", stage_head, (p224, toks))]:
        v = bench(fn, args, bs)
        print(f"stage {name:20s}: {bs / v * 1e3:7.2f} ms/batch{bs}", flush=True)


if __name__ == "__main__":
    main()
