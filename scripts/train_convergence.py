"""Convergence runs on the synthetic dataset (real TPU).

The reference publishes CE metrics for 9 configs on its (unshipped) damage
dataset but no PAED metrics at all (BASELINE.md note). This script
establishes the framework's own reference numbers on the shipped synthetic
generator: train to convergence, evaluate on the held-out test split, and
drop metrics.csv + summary into examples/convergence/ for the committed
curves.

Usage:
  python scripts/train_convergence.py ce
  python scripts/train_convergence.py paed_binary
  python scripts/train_convergence.py paed_multiclass
  python scripts/train_convergence.py smp_unet     # UNet family, smp task
  python scripts/train_convergence.py smp_<family> # any conv family in
                                                   # models/registry.py
"""

import dataclasses
import json
import os
import shutil
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
OUT_ROOT = os.path.join(REPO, "examples", "convergence")

N_SAMPLES = int(os.environ.get("CONV_SAMPLES", 240))
MAX_EPOCHS = int(os.environ.get("CONV_EPOCHS", 120))
BATCH = 16


def main(task: str):
    from visiontransformer_tpu.configs import (
        CE_TRAIN_DEFAULTS,
        PAED_TRAIN_DEFAULTS,
        sweep_by_name,
    )
    from visiontransformer_tpu.data import (
        CESegmentationDataset,
        PAEDBinaryDataset,
        train_val_test_split,
    )
    from visiontransformer_tpu.data.synthetic import (
        generate_binary,
        generate_multiclass,
    )
    from visiontransformer_tpu.train import Trainer
    from visiontransformer_tpu.utils import CSVLogger

    binary = task == "paed_binary"
    data_root = tempfile.mkdtemp(prefix=f"conv_{task}_")
    if binary:
        # half_width 2 -> 5 px cracks: visible to the P8 patch grid (the
        # reference's PAED scripts also train patch-8, ViTscript.py:66 —
        # patch-16 cannot resolve the default 3 px cracks and collapses to
        # all-background)
        generate_binary(data_root, n_samples=N_SAMPLES, image_size=224,
                        crack_half_width=2)
    else:
        generate_multiclass(data_root, n_samples=N_SAMPLES, image_size=256)

    img_dir = os.path.join(data_root, "image_png")
    mask_dir = os.path.join(data_root, "mask_png")
    ds_cls = PAEDBinaryDataset if binary else CESegmentationDataset
    probe = ds_cls(img_dir, mask_dir, image_size=224)
    train_f, val_f, test_f = train_val_test_split(probe.images)
    # cache=True: decoded samples are ~0.7 MB each at 224² and the synthetic
    # set is small — removes the per-epoch re-decode entirely (the dominant
    # epoch cost on this single-core host, docs/PERFORMANCE.md).
    mk = lambda sub: ds_cls(img_dir, mask_dir, image_size=224, subset=sub,
                            cache=True)
    train_ds, val_ds, test_ds = mk(train_f), mk(val_f), mk(test_f)
    print(f"{task}: {len(train_f)}/{len(val_f)}/{len(test_f)} "
          "train/val/test", flush=True)

    model = "vitseg"
    trainer_task = task
    if task.startswith("smp_"):
        # The reference's alternate architectures (StructuralDamageModel,
        # smp.create_model(arch, ...)) with the CE + smp-metrics contract;
        # any conv family in models/registry.py runs through this path.
        from visiontransformer_tpu.models.registry import get_model_family

        model = task[len("smp_"):]
        trainer_task = "smp_multiclass"
        entry_name = os.environ.get("CONV_ENCODER", "resnet18")
        seg_cfg = get_model_family(model).config_cls(
            encoder_name=entry_name, num_classes=probe.num_classes,
            compute_dtype="bfloat16")
        entry = None
    else:
        entry = sweep_by_name(os.environ.get(
            "CONV_CONFIG", "P8H512A8" if binary else "P16H512A8"))
        entry_name = entry.name
        num_classes = 1 if binary else probe.num_classes
        seg_cfg = entry.seg_config(num_classes=num_classes,
                                   compute_dtype="bfloat16")

    base = PAED_TRAIN_DEFAULTS if binary else CE_TRAIN_DEFAULTS
    overrides = {}
    if os.environ.get("CONV_LR"):
        overrides["learning_rate"] = float(os.environ["CONV_LR"])
    if os.environ.get("CONV_NO_EARLYSTOP"):
        overrides["early_stopping_monitor"] = None
    # CONV_ACCUM: micro-batching for configs whose full-batch backward
    # overflows HBM (P4H1024A16: 3137 tokens x H1024 x 16 layers at batch 16
    # measured RESOURCE_EXHAUSTED; micro-batch 4 fits). The reference trains
    # with accumulate_grad_batches=4 (model/CE/createViTmodel.py:74), and the
    # fused accumulate epilogue makes the extra dispatches ~free
    # (docs/PERFORMANCE.md round-4 A/B).
    accum = int(os.environ.get("CONV_ACCUM", 1))
    tcfg = dataclasses.replace(base, batch_size=BATCH,
                               accumulate_grad_batches=accum,
                               max_epochs=MAX_EPOCHS, **overrides)

    out_dir = os.path.join(OUT_ROOT, os.environ.get("CONV_TAG", task))
    os.makedirs(out_dir, exist_ok=True)
    log_root = tempfile.mkdtemp(prefix=f"conv_logs_{task}_")
    logger = CSVLogger(log_root)
    trainer = Trainer(seg_cfg, tcfg, task=trainer_task, model=model,
                      logger=logger)

    def report(epoch, metrics):
        line = " ".join(f"{k}={v:.4f}" for k, v in sorted(metrics.items()))
        print(f"epoch {epoch}: {line}", flush=True)

    state = trainer.fit(train_ds, val_dataset=val_ds, on_epoch_end=report)

    # Held-out test metrics.
    summary = {"task": task, "config": entry_name, "image_size": 224,
               "batch_size": BATCH, "learning_rate": tcfg.learning_rate,
               "splits": [len(train_f), len(val_f), len(test_f)],
               "synthetic_samples": N_SAMPLES}
    if binary or entry is None:
        test_metrics = trainer.evaluate(test_ds, state.params,
                                        batch_size=4)
        summary["test"] = {k: round(float(v), 4)
                           for k, v in test_metrics.items()}
    else:
        # The sweep evaluator: reference CSV schema, mIoU/dice/acc per image.
        import csv

        from visiontransformer_tpu.evaluation.evaluate import evaluate_model
        eval_out = os.path.join(log_root, "eval")
        csv_path = evaluate_model(state.params, seg_cfg, entry, test_ds,
                                  output_dir=eval_out, batch_size=4,
                                  num_batches=10**9)
        # Keep the reference-schema per-image CSV with the run artifacts —
        # it is what compareModels consumes (evaluation/compare.py).
        shutil.copy(csv_path,
                    os.path.join(out_dir, os.path.basename(csv_path)))
        with open(csv_path) as f:
            rows = list(csv.DictReader(f))
        acc = np.mean([float(r["Accuracy"]) for r in rows])
        miou = np.nanmean([float(r["Mean_IoU"]) for r in rows])
        mdice = np.nanmean([float(r["Mean_Dice"]) for r in rows])
        summary["test"] = {"pixel_accuracy": round(float(acc), 3),
                           "mean_iou": round(float(miou), 4),
                           "mean_dice": round(float(mdice), 4)}
        test_metrics = trainer.evaluate(test_ds, state.params,
                                        batch_size=4)
        summary["test"]["loss"] = round(float(test_metrics["loss"]), 4)

    shutil.copy(logger.path, os.path.join(out_dir, "metrics.csv"))
    # Optional trained-checkpoint keep (CONV_SAVE_CKPT=<dir>): the sweep
    # demo and compare report want the trained params back; checkpoints are
    # too large to commit, so they land outside the repo.
    if os.environ.get("CONV_SAVE_CKPT"):
        from visiontransformer_tpu.ckpt.io import save_checkpoint

        ckpt_dir = os.path.join(os.environ["CONV_SAVE_CKPT"],
                                os.environ.get("CONV_TAG", task))
        os.makedirs(ckpt_dir, exist_ok=True)
        path = save_checkpoint(ckpt_dir, {"params": state.params},
                               epoch=MAX_EPOCHS - 1, step=int(state.step))
        summary["checkpoint"] = path
    with open(os.path.join(out_dir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary, indent=2), flush=True)
    print(f"artifacts: {out_dir}", flush=True)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "ce")
