"""Evaluation sweep over the 9 model configurations.

TPU-native rebuild of the reference's sweep evaluator
(reference model/CE/datasetTestViTmodel.py, PAED mirror ViTscriptTest.py):
per image it records accuracy / mean IoU / mean Dice / inference time and the
GT/pred/missing/false-positive class sets, one CSV per model with the exact
reference schema (datasetTestViTmodel.py:166-172) so the reference's
aggregation tooling (compareModels.py) reads our outputs unchanged.

Differences by design (SURVEY.md §7 "bugs as spec questions"):
- the sweep instantiates the looped-over config (the reference's PAED sweep
  accidentally pins one config for all 9 rows, ViTscriptTest.py:126);
- checkpoint restore is a plain Orbax load, not the reference's
  fit-to-max-epochs resume trick (datasetTestViTmodel.py:131-137);
- metrics are computed on-device in one jitted+vmapped program per batch
  instead of per-image host numpy.
"""

from __future__ import annotations

import csv
import os
import time
from typing import Iterable, List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from visiontransformer_tpu.configs import SWEEP_CONFIGS, SweepEntry, ViTSegConfig
from visiontransformer_tpu.data.pipeline import batch_iterator
from visiontransformer_tpu.metrics.segmentation import (
    per_class_dice,
    per_class_iou,
    pixel_accuracy_percent,
)
from visiontransformer_tpu.models.vitseg import vitseg_apply
from visiontransformer_tpu.ops.resize import resize_nearest_pil

CSV_HEADER = [
    "Model_ID", "Model_Name", "Patch_Size", "Hidden_Size", "Layers", "Heads",
    "Batch_Num", "Image_Idx",
    "Accuracy", "Mean_IoU", "Mean_Dice", "Inference_Time",
    "GT_Classes", "Pred_Classes", "Missing_Classes", "False_Positive_Classes",
]


def _make_eval_fn(cfg: ViTSegConfig):
    """One jitted program: forward + argmax (or sigmoid-threshold for the
    binary PAED models) + per-image metric vector. The reference's PAED
    sweep (model/PAED/ViTscriptTest.py) reuses the CE metric loop; here the
    single-logit case thresholds at 0.5 and scores classes {0, 1}."""
    binary = cfg.num_classes == 1
    num_classes = 2 if binary else cfg.num_classes
    size = cfg.vit.image_size

    def per_image(gt, pred):
        acc = pixel_accuracy_percent(gt, pred)
        miou = jnp.nanmean(per_class_iou(gt, pred, num_classes))
        mdice = jnp.nanmean(per_class_dice(gt, pred, num_classes))
        gt_present = jnp.zeros(num_classes, bool).at[gt.reshape(-1)].set(True)
        pred_present = jnp.zeros(num_classes, bool).at[pred.reshape(-1)].set(True)
        return acc, miou, mdice, gt_present, pred_present

    from visiontransformer_tpu.metrics.segmentation import (
        pixel_confusion_matrix)

    @jax.jit
    def eval_batch(params, images, masks):
        logits = vitseg_apply(params, images, cfg, deterministic=True)
        if binary:
            preds = (jax.nn.sigmoid(logits[..., 0]) > 0.5).astype(jnp.int32)
        else:
            preds = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        # GT masks arrive at their stored resolution; resize to the prediction
        # grid with PIL-NEAREST semantics (the reference resizes GT with
        # PIL, datasetTestViTmodel.py:191).
        gt = resize_nearest_pil(masks, (size, size)).astype(jnp.int32)
        cm = pixel_confusion_matrix(gt, preds, num_classes)
        return preds, jax.vmap(per_image)(gt, preds), cm

    return eval_batch


def evaluate_model(params, cfg: ViTSegConfig, entry: SweepEntry, dataset, *,
                   output_dir: str, batch_size: int = 4,
                   num_batches: int = 125,
                   save_visualizations: bool = False,
                   class_names: Optional[Sequence[str]] = None,
                   rgb_to_class: Optional[dict] = None) -> str:
    """Evaluate one config over `num_batches` batches; returns the CSV path."""
    model_dir = os.path.join(output_dir, entry.name)
    os.makedirs(model_dir, exist_ok=True)
    csv_path = os.path.join(model_dir, f"{entry.name}_metrics.csv")

    eval_batch = _make_eval_fn(cfg)
    confusion = None

    with open(csv_path, "w", newline="") as f:
        writer = csv.writer(f)
        writer.writerow(CSV_HEADER)

        for batch_num, batch in enumerate(
                batch_iterator(dataset, batch_size, drop_last=False)):
            if batch_num >= num_batches:
                break
            images = jnp.asarray(batch["image"])
            masks = jnp.asarray(batch["mask"])

            t0 = time.perf_counter()
            preds, (acc, miou, mdice, gt_present, pred_present), cm = (
                eval_batch(params, images, masks))
            cm = np.asarray(cm, np.int64)
            confusion = cm if confusion is None else confusion + cm
            preds = np.asarray(preds)  # full sync (remote-tunnel honest time)
            avg_time = (time.perf_counter() - t0) / images.shape[0]

            acc, miou, mdice = map(np.asarray, (acc, miou, mdice))
            gt_present = np.asarray(gt_present)
            pred_present = np.asarray(pred_present)

            for idx in range(images.shape[0]):
                gt_cls = sorted(np.flatnonzero(gt_present[idx]).tolist())
                pr_cls = sorted(np.flatnonzero(pred_present[idx]).tolist())
                missing = sorted(set(gt_cls) - set(pr_cls))
                false_pos = sorted(set(pr_cls) - set(gt_cls))
                writer.writerow([
                    entry.id, entry.name, entry.patch_size, entry.hidden_size,
                    entry.hidden_layers, entry.attention_heads,
                    batch_num, idx,
                    float(acc[idx]), float(miou[idx]), float(mdice[idx]),
                    avg_time,
                    "|".join(map(str, gt_cls)),
                    "|".join(map(str, pr_cls)),
                    "|".join(map(str, missing)),
                    "|".join(map(str, false_pos)),
                ])

            if save_visualizations and batch_num <= 25:
                from visiontransformer_tpu.evaluation.visualize import (
                    save_eval_panels)
                save_eval_panels(
                    model_dir, entry.name, batch_num,
                    np.asarray(images), np.asarray(batch["mask"]), preds,
                    class_names=class_names, rgb_to_class=rgb_to_class)

    if confusion is not None:
        np.save(os.path.join(model_dir,
                             f"{entry.name}_pixel_confusion.npy"), confusion)

    return csv_path


def run_sweep(dataset, *, output_dir: str, num_classes: int,
              checkpoint_root: Optional[str] = None,
              entries: Iterable[SweepEntry] = SWEEP_CONFIGS,
              batch_size: int = 4, num_batches: int = 125,
              compute_dtype: str = "bfloat16", image_size: int = 224,
              **eval_kwargs) -> List[str]:
    """Run the full 9-config sweep. For each entry, restores the latest
    checkpoint from `<checkpoint_root>/<name>/` when present, else evaluates
    the freshly initialized model (useful for perf-only sweeps)."""
    from visiontransformer_tpu.ckpt.io import (
        get_latest_checkpoint,
        restore_checkpoint,
    )
    from visiontransformer_tpu.models.vitseg import vitseg_init

    import dataclasses

    paths = []
    for entry in entries:
        cfg = entry.seg_config(num_classes=num_classes,
                               compute_dtype=compute_dtype)
        cfg = dataclasses.replace(
            cfg, vit=dataclasses.replace(cfg.vit, image_size=image_size))
        params = vitseg_init(jax.random.PRNGKey(entry.id), cfg)
        if checkpoint_root:
            latest = get_latest_checkpoint(
                os.path.join(checkpoint_root, entry.name))
            if latest:
                params = restore_checkpoint(latest, {"params": params})["params"]
        paths.append(evaluate_model(params, cfg, entry, dataset,
                                    output_dir=output_dir,
                                    batch_size=batch_size,
                                    num_batches=num_batches, **eval_kwargs))
    return paths
