"""Trained-model quality + throughput of W8A8 int8 quantization.

Mirrors scripts/tome_quality.py: random-init agreement is a meaningless
worst case (17-way argmax near-ties everywhere), so this trains the
headline ViT-B/16 seg model on the shipped synthetic multiclass set (real
TPU), then scores the quantized model (ops/quant.py) against the exact
bf16 model on the held-out test split: argmax agreement AND absolute
quality (pixel accuracy / mean IoU vs ground truth), plus a best-of-N
serving-pipeline throughput A/B in the same process.

Usage: python scripts/quant_quality.py
Env:   QUANTQ_SAMPLES (default 240), QUANTQ_EPOCHS (default 60)
"""

import dataclasses
import os
import sys
import tempfile
import time

import numpy as np

import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_SAMPLES = int(os.environ.get("QUANTQ_SAMPLES", 240))
MAX_EPOCHS = int(os.environ.get("QUANTQ_EPOCHS", 60))
IMG = 224
BATCH = 16


def main():
    from visiontransformer_tpu.configs import (
        CE_TRAIN_DEFAULTS,
        ViTConfig,
        ViTSegConfig,
    )
    from visiontransformer_tpu.data import (
        CESegmentationDataset,
        train_val_test_split,
    )
    from visiontransformer_tpu.data.synthetic import generate_multiclass
    from visiontransformer_tpu.metrics.segmentation import (
        per_class_iou,
        pixel_accuracy_percent,
    )
    from visiontransformer_tpu.models import vitseg_apply, vitseg_init
    from visiontransformer_tpu.models.vitseg import vitseg_predict
    from visiontransformer_tpu.ops.quant import quantize_vitseg_params
    from visiontransformer_tpu.ops.resize import resize_bilinear_mm
    from visiontransformer_tpu.train import Trainer

    root = tempfile.mkdtemp(prefix="quant_quality_")
    generate_multiclass(root, n_samples=N_SAMPLES, image_size=256)
    img_dir = os.path.join(root, "image_png")
    mask_dir = os.path.join(root, "mask_png")
    probe = CESegmentationDataset(img_dir, mask_dir, image_size=IMG)
    train_f, val_f, test_f = train_val_test_split(probe.images)
    mk = lambda sub: CESegmentationDataset(img_dir, mask_dir, image_size=IMG,
                                           subset=sub, cache=True)
    train_ds, val_ds, test_ds = mk(train_f), mk(val_f), mk(test_f)
    num_classes = probe.num_classes
    print(f"{len(train_f)}/{len(val_f)}/{len(test_f)} train/val/test, "
          f"{num_classes} classes", flush=True)

    seg_cfg = ViTSegConfig(
        vit=ViTConfig(image_size=IMG, patch_size=16, hidden_size=768,
                      num_hidden_layers=12, num_attention_heads=12),
        num_classes=num_classes, compute_dtype="bfloat16")
    tcfg = dataclasses.replace(
        CE_TRAIN_DEFAULTS, batch_size=BATCH, accumulate_grad_batches=1,
        learning_rate=1e-4, max_epochs=MAX_EPOCHS,
        early_stopping_monitor=None)
    trainer = Trainer(seg_cfg, tcfg, task="ce")
    state = trainer.fit(
        train_ds, val_dataset=val_ds,
        on_epoch_end=lambda e, m: print(
            f"epoch {e}: " + " ".join(f"{k}={v:.4f}"
                                      for k, v in sorted(m.items())),
            flush=True))
    params = jax.device_get(state.params)
    qparams = quantize_vitseg_params(params)

    test_imgs = np.stack([test_ds[i][0] for i in range(len(test_f))])
    test_masks = np.stack([test_ds[i][1] for i in range(len(test_f))])

    @jax.jit
    def step(p, x):
        logits = vitseg_apply(p, x, seg_cfg, deterministic=True)
        return jnp.argmax(logits, -1).astype(jnp.int32)

    def masks_for(p):
        out = []
        for i in range(0, len(test_imgs), BATCH):
            out.append(np.asarray(step(p, test_imgs[i:i + BATCH])))
        return np.concatenate(out)

    @jax.jit
    def score(pred, gt):
        acc = jax.vmap(pixel_accuracy_percent)(gt, pred)
        iou = jax.vmap(lambda g, p: jnp.nanmean(
            per_class_iou(g, p, num_classes)))(gt, pred)
        return jnp.mean(acc), jnp.nanmean(iou)

    gt = jnp.asarray(test_masks)
    exact = masks_for(params)
    quant = masks_for(qparams)
    print(f"\n{'model':>6} {'agree':>8} {'pix_acc%':>9} {'mIoU':>7}")
    for tag, pred in (("bf16", exact), ("int8", quant)):
        agree = float(np.mean(pred == exact))
        acc, miou = score(jnp.asarray(pred), gt)
        print(f"{tag:>6} {agree:>8.4f} {float(acc):>9.2f} "
              f"{float(miou):>7.4f}", flush=True)

    # Serving-pipeline throughput A/B (the bench.py workload) in-process.
    _MEAN = np.array([0.485, 0.456, 0.406], np.float32)
    _STD = np.array([0.229, 0.224, 0.225], np.float32)
    OUT = 512

    @jax.jit
    def serve_step(p, raw):
        x = resize_bilinear_mm(raw, (IMG, IMG))
        x = (x - jnp.asarray(_MEAN)) / jnp.asarray(_STD)
        return vitseg_predict(p, x, seg_cfg,
                              out_size=(OUT, OUT)).astype(jnp.uint8)

    raw = jnp.asarray(np.random.default_rng(0).random((32, OUT, OUT, 3)),
                      jnp.float32)
    for tag, p in (("bf16", params), ("int8", qparams)):
        np.asarray(serve_step(p, raw))
        best = 0.0
        for _ in range(5):
            t0 = time.perf_counter()
            for _ in range(50):
                out = serve_step(p, raw)
            np.asarray(out)
            best = max(best, 32 * 50 / (time.perf_counter() - t0))
        print(f"serve {tag}: {best:.1f} masks/s", flush=True)


if __name__ == "__main__":
    main()
