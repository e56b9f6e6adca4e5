"""Per-config W8A8 int8 quality on the TRAINED sweep checkpoints.

Random-init agreement is a meaningless worst case (17-way argmax near-ties
everywhere), so this scores the int8 quantization (ops/quant.py) on the
nine trained sweep models from scripts/run_trained_sweep.sh: for each
config, argmax agreement vs the exact bf16 model plus absolute quality
(pixel accuracy / mean IoU vs ground truth) for both, on the same held-out
test split the convergence runs evaluated (the synthetic set regenerates
bit-identically from its seed, and the 70/15/15 split is seed-42
deterministic — data/split.py).

Usage: SWEEP_CKPT_DIR=/root/ckpts_sweep_r5 SWEEP_SAMPLES=1600 \
       python scripts/quant_quality_sweep.py [cfg1,cfg2,...]
"""

import json
import os
import sys
import tempfile

import numpy as np

import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_SAMPLES = int(os.environ.get("SWEEP_SAMPLES", 1600))
CKPT_DIR = os.environ.get("SWEEP_CKPT_DIR", "/root/ckpts_sweep_r5")
IMG = 224
BATCH = 16


def main():
    from visiontransformer_tpu.ckpt.io import (
        get_latest_checkpoint,
        restore_checkpoint,
    )
    from visiontransformer_tpu.configs import SWEEP_CONFIGS, sweep_by_name
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
    from visiontransformer_tpu.ops.quant import quantize_vitseg_params
    from visiontransformer_tpu.ops.resize import resize_nearest_pil

    names = (sys.argv[1].split(",") if len(sys.argv) > 1
             else [e.name for e in SWEEP_CONFIGS])

    root = tempfile.mkdtemp(prefix="quantq_sweep_")
    generate_multiclass(root, n_samples=N_SAMPLES, image_size=256)
    img_dir = os.path.join(root, "image_png")
    mask_dir = os.path.join(root, "mask_png")
    probe = CESegmentationDataset(img_dir, mask_dir, image_size=IMG)
    _, _, test_f = train_val_test_split(probe.images)
    test_ds = CESegmentationDataset(img_dir, mask_dir, image_size=IMG,
                                    subset=test_f)
    num_classes = probe.num_classes
    test_imgs = np.stack([test_ds[i][0] for i in range(len(test_f))])
    test_masks = np.stack([test_ds[i][1] for i in range(len(test_f))])
    # GT masks are stored at 256² (reference CE parity, data/dataset.py);
    # bring them to the 224² prediction grid the way the evaluator does
    # (PIL-NEAREST — evaluation/evaluate.py:76-79).
    gt = resize_nearest_pil(jnp.asarray(test_masks),
                            (IMG, IMG)).astype(jnp.int32)
    print(f"{len(test_f)} test images, {num_classes} classes", flush=True)

    @jax.jit
    def score(pred):
        acc = jax.vmap(pixel_accuracy_percent)(gt, pred)
        iou = jax.vmap(lambda g, p: jnp.nanmean(
            per_class_iou(g, p, num_classes)))(gt, pred)
        return jnp.mean(acc), jnp.nanmean(iou)

    print("| config | agree | bf16 acc% | int8 acc% | bf16 mIoU | int8 mIoU "
          "| ΔmIoU |")
    print("|---|---|---|---|---|---|---|")
    for name in names:
        entry = sweep_by_name(name)
        tag = "ce_" + name.lower()
        ckpt = get_latest_checkpoint(os.path.join(CKPT_DIR, tag))
        if not ckpt:
            print(f"| {name} | (no checkpoint under {CKPT_DIR}/{tag}) |")
            continue
        cfg = entry.seg_config(num_classes=num_classes,
                               compute_dtype="bfloat16")
        target = vitseg_init(jax.random.PRNGKey(0), cfg)
        params = restore_checkpoint(ckpt, {"params": target})["params"]
        qparams = quantize_vitseg_params(params)

        @jax.jit
        def step(p, x, cfg=cfg):
            logits = vitseg_apply(p, x, cfg, deterministic=True)
            return jnp.argmax(logits, -1).astype(jnp.int32)

        def masks_for(p, step=step):
            out = []
            for i in range(0, len(test_imgs), BATCH):
                out.append(np.asarray(step(p, test_imgs[i:i + BATCH])))
            return np.concatenate(out)

        exact = masks_for(params)
        quant = masks_for(qparams)
        agree = float(np.mean(exact == quant))
        acc_b, miou_b = (float(v) for v in score(jnp.asarray(exact)))
        acc_q, miou_q = (float(v) for v in score(jnp.asarray(quant)))
        print(f"| {name} | {agree:.4f} | {acc_b:.2f} | {acc_q:.2f} "
              f"| {miou_b:.4f} | {miou_q:.4f} | {miou_q - miou_b:+.4f} |",
              flush=True)
        print(json.dumps({"config": name, "agree": round(agree, 4),
                          "bf16": [round(acc_b, 2), round(miou_b, 4)],
                          "int8": [round(acc_q, 2), round(miou_q, 4)]}),
              file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
