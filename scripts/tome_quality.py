"""Trained-model token-merging quality at the headline workload.

bench_tome.py measures ToMe throughput on a random-init model, where the
17-way argmax sits at near-ties everywhere and agreement is a meaningless
worst case. This script trains the headline ViT-B/16 seg model at 512² on
the shipped synthetic multiclass set (real TPU), then scores every merge
rate on the held-out test split: argmax agreement vs the exact model AND
absolute quality (pixel accuracy / mean IoU vs ground truth, the
reference's per-image metric semantics).

Usage: python scripts/tome_quality.py
Env:   TOMEQ_SAMPLES (default 160), TOMEQ_EPOCHS (default 40)
"""

import dataclasses
import os
import tempfile

import numpy as np

import jax
import jax.numpy as jnp

N_SAMPLES = int(os.environ.get("TOMEQ_SAMPLES", 160))
MAX_EPOCHS = int(os.environ.get("TOMEQ_EPOCHS", 40))
IMG = 512
BATCH = 8


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
    from visiontransformer_tpu.models import vitseg_apply
    from visiontransformer_tpu.train import Trainer

    root = tempfile.mkdtemp(prefix="tome_quality_")
    generate_multiclass(root, n_samples=N_SAMPLES, image_size=IMG)
    img_dir, mask_dir = os.path.join(root, "image_png"), os.path.join(root, "mask_png")
    probe = CESegmentationDataset(img_dir, mask_dir, image_size=IMG,
                                  mask_size=IMG)
    train_f, val_f, test_f = train_val_test_split(probe.images)
    mk = lambda sub: CESegmentationDataset(img_dir, mask_dir, image_size=IMG,
                                           mask_size=IMG, subset=sub,
                                           cache=True)
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
    params = state.params

    # Test batch (small set: evaluate in one host loop, metrics on device).
    test_imgs = np.stack([test_ds[i][0] for i in range(len(test_f))])
    test_masks = np.stack([test_ds[i][1] for i in range(len(test_f))])

    def masks_for(r):
        cfg = dataclasses.replace(
            seg_cfg, vit=dataclasses.replace(seg_cfg.vit, token_merge_r=r))

        @jax.jit
        def step(p, x):
            logits = vitseg_apply(p, x, cfg, deterministic=True)
            return jnp.argmax(logits, -1).astype(jnp.int32)

        out = []
        for i in range(0, len(test_imgs), BATCH):
            out.append(np.asarray(step(params, test_imgs[i:i + BATCH])))
        return np.concatenate(out)

    @jax.jit
    def score(pred, gt):
        acc = jax.vmap(pixel_accuracy_percent)(gt, pred)
        iou = jax.vmap(lambda g, p: jnp.nanmean(
            per_class_iou(g, p, num_classes)))(gt, pred)
        return jnp.mean(acc), jnp.nanmean(iou)

    gt = jnp.asarray(test_masks)
    exact = masks_for(0)
    print(f"\n{'r':>4} {'agree':>8} {'pix_acc%':>9} {'mIoU':>7}")
    for r in (0, 8, 16, 25):
        pred = exact if r == 0 else masks_for(r)
        agree = float(np.mean(pred == exact))
        acc, miou = score(jnp.asarray(pred), gt)
        print(f"{r:>4} {agree:>8.4f} {float(acc):>9.2f} {float(miou):>7.4f}",
              flush=True)


if __name__ == "__main__":
    main()
