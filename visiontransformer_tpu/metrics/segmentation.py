"""Segmentation metrics with the reference's exact conventions.

Three metric families coexist in the reference and are all reproduced here:

1. The evaluation-sweep per-image metrics
   (reference model/CE/datasetTestViTmodel.py:188-227): accuracy as a percent
   of non-mismatched pixels, per-class IoU with NaN for empty union followed by
   np.nanmean, Dice with NaN when both masks are empty.
2. The binary PAED metrics (reference model/PAED/segmentation.py:38-86):
   pixel accuracy / IoU / Dice with eps=1e-6 smoothing.
3. The smp-style aggregate metrics used by StructuralDamageModel
   (reference model/CE/classes.py:145,182-196): per-image multiclass
   tp/fp/fn/tn and IoU under "micro" / "micro-imagewise" reduction.

Everything is jnp and jit-safe (NaN conventions expressed with jnp.where), so
metrics run on-device inside the eval step instead of on host like the
reference.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Sweep-eval per-image metrics (reference model/CE/datasetTestViTmodel.py)
# ---------------------------------------------------------------------------

def pixel_accuracy_percent(gt: jnp.ndarray, pred: jnp.ndarray) -> jnp.ndarray:
    """100 * (1 - mismatches/total), reference datasetTestViTmodel.py:193-196."""
    mismatches = jnp.sum(gt != pred)
    return 100.0 * (1.0 - mismatches / gt.size)


def per_class_iou(gt: jnp.ndarray, pred: jnp.ndarray,
                  num_classes: int) -> jnp.ndarray:
    """Per-class IoU over one image; NaN where the union is empty
    (reference datasetTestViTmodel.py:200-205)."""
    classes = jnp.arange(num_classes)
    gt_bin = gt[None] == classes[:, None, None]
    pred_bin = pred[None] == classes[:, None, None]
    inter = jnp.sum(gt_bin & pred_bin, axis=(1, 2)).astype(jnp.float32)
    union = jnp.sum(gt_bin | pred_bin, axis=(1, 2)).astype(jnp.float32)
    return jnp.where(union == 0, jnp.nan, inter / jnp.maximum(union, 1.0))


def per_class_dice(gt: jnp.ndarray, pred: jnp.ndarray,
                   num_classes: int) -> jnp.ndarray:
    """Per-class Dice; NaN where gt and pred are both empty for the class
    (reference datasetTestViTmodel.py:152-159)."""
    classes = jnp.arange(num_classes)
    gt_bin = gt[None] == classes[:, None, None]
    pred_bin = pred[None] == classes[:, None, None]
    inter = jnp.sum(gt_bin & pred_bin, axis=(1, 2)).astype(jnp.float32)
    size_sum = (jnp.sum(gt_bin, axis=(1, 2)) +
                jnp.sum(pred_bin, axis=(1, 2))).astype(jnp.float32)
    return jnp.where(size_sum == 0, jnp.nan,
                     2.0 * inter / jnp.maximum(size_sum, 1.0))


def per_image_eval_metrics(gt: jnp.ndarray, pred: jnp.ndarray,
                           num_classes: int):
    """(accuracy%, mean IoU, mean Dice) for one image — the three numeric
    columns of the reference's metrics CSV (datasetTestViTmodel.py:219-227)."""
    acc = pixel_accuracy_percent(gt, pred)
    miou = jnp.nanmean(per_class_iou(gt, pred, num_classes))
    mdice = jnp.nanmean(per_class_dice(gt, pred, num_classes))
    return acc, miou, mdice


# ---------------------------------------------------------------------------
# Binary PAED metrics (reference model/PAED/segmentation.py)
# ---------------------------------------------------------------------------

def pixel_accuracy_binary(gt: jnp.ndarray, pred: jnp.ndarray) -> jnp.ndarray:
    """Fraction of matching pixels (reference segmentation.py:38-51)."""
    gt = gt.astype(jnp.int32)
    pred = pred.astype(jnp.int32)
    return jnp.mean((gt == pred).astype(jnp.float32))


def iou_binary(gt: jnp.ndarray, pred: jnp.ndarray,
               eps: float = 1e-6) -> jnp.ndarray:
    """(I + eps)/(U + eps) (reference segmentation.py:54-69)."""
    gt = gt.astype(bool)
    pred = pred.astype(bool)
    inter = jnp.sum(gt & pred).astype(jnp.float32)
    union = jnp.sum(gt | pred).astype(jnp.float32)
    return (inter + eps) / (union + eps)


def dice_score_binary(gt: jnp.ndarray, pred: jnp.ndarray,
                      eps: float = 1e-6) -> jnp.ndarray:
    """(2I + eps)/(|gt| + |pred| + eps) (reference segmentation.py:72-86)."""
    gt = gt.astype(bool)
    pred = pred.astype(bool)
    inter = jnp.sum(gt & pred).astype(jnp.float32)
    total = jnp.sum(gt).astype(jnp.float32) + jnp.sum(pred).astype(jnp.float32)
    return (2.0 * inter + eps) / (total + eps)


def binary_stats(gt: jnp.ndarray, pred: jnp.ndarray):
    """Global tp/fp/fn/tn for binary masks — the basis for the torchmetrics
    precision/recall calls at reference model/PAED/classes.py:688-689
    (task='binary', multidim_average='global')."""
    gt = gt.astype(bool)
    pred = pred.astype(bool)
    tp = jnp.sum(pred & gt)
    fp = jnp.sum(pred & ~gt)
    fn = jnp.sum(~pred & gt)
    tn = jnp.sum(~pred & ~gt)
    return tp, fp, fn, tn


def precision_binary(gt: jnp.ndarray, pred: jnp.ndarray) -> jnp.ndarray:
    tp, fp, _, _ = binary_stats(gt, pred)
    denom = (tp + fp).astype(jnp.float32)
    return jnp.where(denom == 0, 0.0, tp / jnp.maximum(denom, 1.0))


def recall_binary(gt: jnp.ndarray, pred: jnp.ndarray) -> jnp.ndarray:
    tp, _, fn, _ = binary_stats(gt, pred)
    denom = (tp + fn).astype(jnp.float32)
    return jnp.where(denom == 0, 0.0, tp / jnp.maximum(denom, 1.0))


# ---------------------------------------------------------------------------
# smp-style multiclass stats (reference model/CE/classes.py:145, 182-196)
# ---------------------------------------------------------------------------

def multiclass_confusion_stats(pred: jnp.ndarray, gt: jnp.ndarray,
                               num_classes: int
                               ) -> Tuple[jnp.ndarray, jnp.ndarray,
                                          jnp.ndarray, jnp.ndarray]:
    """Per-image, per-class (tp, fp, fn, tn), matching
    smp.metrics.get_stats(mode='multiclass'). Shapes: (B, num_classes)."""
    classes = jnp.arange(num_classes)
    pred_oh = pred[..., None] == classes  # (B, H, W, C)
    gt_oh = gt[..., None] == classes
    axes = tuple(range(1, pred.ndim))
    tp = jnp.sum(pred_oh & gt_oh, axis=axes)
    fp = jnp.sum(pred_oh & ~gt_oh, axis=axes)
    fn = jnp.sum(~pred_oh & gt_oh, axis=axes)
    tn = jnp.sum(~pred_oh & ~gt_oh, axis=axes)
    return tp, fp, fn, tn


def smp_iou_micro(tp, fp, fn, tn) -> jnp.ndarray:
    """smp.metrics.iou_score(reduction='micro'): pool everything then IoU."""
    tp_s = jnp.sum(tp).astype(jnp.float32)
    fp_s = jnp.sum(fp).astype(jnp.float32)
    fn_s = jnp.sum(fn).astype(jnp.float32)
    return tp_s / (tp_s + fp_s + fn_s)


def smp_iou_micro_imagewise(tp, fp, fn, tn) -> jnp.ndarray:
    """smp 'micro-imagewise': pool classes per image, IoU per image, mean."""
    tp_i = jnp.sum(tp, axis=-1).astype(jnp.float32)
    fp_i = jnp.sum(fp, axis=-1).astype(jnp.float32)
    fn_i = jnp.sum(fn, axis=-1).astype(jnp.float32)
    return jnp.mean(tp_i / (tp_i + fp_i + fn_i))


def pixel_confusion_matrix(gt: jnp.ndarray, pred: jnp.ndarray,
                           num_classes: int) -> jnp.ndarray:
    """Pixel-level confusion matrix M[i, j] = #pixels with GT class i
    predicted as j. (The reference only reports set-level class confusion,
    compareModels.py:133-178; this is the strictly stronger pixel version,
    computed on-device as one scatter-add.)"""
    idx = (gt.astype(jnp.int32).reshape(-1) * num_classes
           + pred.astype(jnp.int32).reshape(-1))
    counts = jnp.zeros((num_classes * num_classes,), jnp.int32)
    counts = counts.at[idx].add(1)
    return counts.reshape(num_classes, num_classes)


# ---------------------------------------------------------------------------
# PAED-multiclass monitoring IoU (reference model/PAED/classes.py:430-447)
# ---------------------------------------------------------------------------

def soft_iou_score(preds: jnp.ndarray, targets: jnp.ndarray,
                   num_classes: int = 17) -> jnp.ndarray:
    """Mean over classes of mean-over-batch smoothed IoU, exactly as the
    reference's LightningViTModel.iou_score: per class,
    (I + 1e-6)/(clip(union,0,1).sum() + 1e-6) averaged over the batch."""
    classes = jnp.arange(num_classes)
    preds_oh = (preds[..., None] == classes).astype(jnp.float32)  # (B,H,W,C)
    targets_oh = (targets[..., None] == classes).astype(jnp.float32)
    inter = jnp.sum(preds_oh * targets_oh, axis=(1, 2))  # (B, C)
    union = jnp.sum(jnp.clip(preds_oh + targets_oh, 0.0, 1.0), axis=(1, 2))
    iou_pc = jnp.mean((inter + 1e-6) / (union + 1e-6), axis=0)  # (C,)
    return jnp.mean(iou_pc)
