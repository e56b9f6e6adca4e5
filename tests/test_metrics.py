"""Metrics vs independently-written numpy oracles (reference semantics)."""

import numpy as np
import jax.numpy as jnp

from visiontransformer_tpu.metrics.segmentation import (
    dice_score_binary,
    iou_binary,
    multiclass_confusion_stats,
    per_class_dice,
    per_class_iou,
    per_image_eval_metrics,
    pixel_accuracy_binary,
    pixel_accuracy_percent,
    precision_binary,
    recall_binary,
    smp_iou_micro,
    smp_iou_micro_imagewise,
    soft_iou_score,
)

NUM_CLASSES = 17


def _random_masks(rng, shape=(64, 64), num_classes=NUM_CLASSES):
    gt = rng.integers(0, num_classes, shape)
    pred = gt.copy()
    flip = rng.random(shape) < 0.3
    pred[flip] = rng.integers(0, num_classes, flip.sum())
    return gt, pred


def test_pixel_accuracy_percent(rng):
    gt, pred = _random_masks(rng)
    expected = 100.0 * (1 - (gt != pred).sum() / gt.size)
    got = float(pixel_accuracy_percent(jnp.asarray(gt), jnp.asarray(pred)))
    np.testing.assert_allclose(got, expected, rtol=1e-6)


def test_per_class_iou_nan_semantics(rng):
    gt, pred = _random_masks(rng, num_classes=5)
    ious = np.asarray(per_class_iou(jnp.asarray(gt), jnp.asarray(pred), NUM_CLASSES))
    # Classes 5..16 never appear in gt or pred -> union empty -> NaN.
    assert np.isnan(ious[5:]).all()
    for c in range(5):
        inter = np.logical_and(gt == c, pred == c).sum()
        union = np.logical_or(gt == c, pred == c).sum()
        expected = np.nan if union == 0 else inter / union
        if np.isnan(expected):
            assert np.isnan(ious[c])
        else:
            np.testing.assert_allclose(ious[c], expected, rtol=1e-6)


def test_per_class_dice_nan_semantics(rng):
    gt, pred = _random_masks(rng, num_classes=4)
    dices = np.asarray(per_class_dice(jnp.asarray(gt), jnp.asarray(pred), NUM_CLASSES))
    assert np.isnan(dices[4:]).all()
    for c in range(4):
        inter = np.logical_and(gt == c, pred == c).sum()
        total = (gt == c).sum() + (pred == c).sum()
        if total == 0:
            assert np.isnan(dices[c])
        else:
            np.testing.assert_allclose(dices[c], 2 * inter / total, rtol=1e-6)


def test_per_image_eval_metrics_nanmean(rng):
    gt, pred = _random_masks(rng, num_classes=6)
    acc, miou, mdice = per_image_eval_metrics(
        jnp.asarray(gt), jnp.asarray(pred), NUM_CLASSES)
    ious = np.asarray(per_class_iou(jnp.asarray(gt), jnp.asarray(pred), NUM_CLASSES))
    np.testing.assert_allclose(float(miou), np.nanmean(ious), rtol=1e-6)
    assert 0 <= float(acc) <= 100
    assert 0 <= float(mdice) <= 1


def test_binary_metrics(rng):
    gt = (rng.random((4, 32, 32)) > 0.7).astype(np.int32)
    pred = (rng.random((4, 32, 32)) > 0.7).astype(np.int32)
    gt_j, pred_j = jnp.asarray(gt), jnp.asarray(pred)

    np.testing.assert_allclose(
        float(pixel_accuracy_binary(gt_j, pred_j)), (gt == pred).mean(), rtol=1e-6)

    inter = np.logical_and(gt, pred).sum()
    union = np.logical_or(gt, pred).sum()
    np.testing.assert_allclose(
        float(iou_binary(gt_j, pred_j)), (inter + 1e-6) / (union + 1e-6), rtol=1e-5)
    np.testing.assert_allclose(
        float(dice_score_binary(gt_j, pred_j)),
        (2 * inter + 1e-6) / (gt.sum() + pred.sum() + 1e-6), rtol=1e-5)

    tp = np.logical_and(pred, gt).sum()
    fp = np.logical_and(pred, 1 - gt).sum()
    fn = np.logical_and(1 - pred, gt).sum()
    np.testing.assert_allclose(float(precision_binary(gt_j, pred_j)),
                               tp / (tp + fp), rtol=1e-5)
    np.testing.assert_allclose(float(recall_binary(gt_j, pred_j)),
                               tp / (tp + fn), rtol=1e-5)


def test_smp_stats(rng):
    gt = rng.integers(0, 4, (3, 16, 16))
    pred = rng.integers(0, 4, (3, 16, 16))
    tp, fp, fn, tn = multiclass_confusion_stats(
        jnp.asarray(pred), jnp.asarray(gt), 4)
    tp, fp, fn, tn = map(np.asarray, (tp, fp, fn, tn))
    assert tp.shape == (3, 4)
    # Per image and class, tp+fp+fn+tn == number of pixels.
    np.testing.assert_array_equal(tp + fp + fn + tn, 16 * 16)
    # tp summed over classes == number of correct pixels per image.
    np.testing.assert_array_equal(tp.sum(axis=1),
                                  (gt == pred).sum(axis=(1, 2)))

    micro = float(smp_iou_micro(tp, fp, fn, tn))
    expected_micro = tp.sum() / (tp.sum() + fp.sum() + fn.sum())
    np.testing.assert_allclose(micro, expected_micro, rtol=1e-6)

    imagewise = float(smp_iou_micro_imagewise(tp, fp, fn, tn))
    per_img = tp.sum(1) / (tp.sum(1) + fp.sum(1) + fn.sum(1))
    np.testing.assert_allclose(imagewise, per_img.mean(), rtol=1e-6)


def test_soft_iou_score(rng):
    gt = rng.integers(0, 3, (2, 8, 8))
    pred = rng.integers(0, 3, (2, 8, 8))
    got = float(soft_iou_score(jnp.asarray(pred), jnp.asarray(gt), 17))
    # Oracle: the reference formula, computed directly in numpy.
    per_class = []
    for c in range(17):
        p = (pred == c).astype(float)
        t = (gt == c).astype(float)
        inter = (p * t).sum(axis=(1, 2))
        union = np.clip(p + t, 0, 1).sum(axis=(1, 2))
        per_class.append(((inter + 1e-6) / (union + 1e-6)).mean())
    np.testing.assert_allclose(got, np.mean(per_class), rtol=1e-5)


def test_pixel_confusion_matrix(rng):
    from visiontransformer_tpu.metrics.segmentation import (
        pixel_confusion_matrix)
    gt = rng.integers(0, 4, (16, 16))
    pred = rng.integers(0, 4, (16, 16))
    cm = np.asarray(pixel_confusion_matrix(jnp.asarray(gt),
                                           jnp.asarray(pred), 4))
    assert cm.sum() == gt.size
    expected = np.zeros((4, 4), np.int64)
    for i, j in zip(gt.reshape(-1), pred.reshape(-1)):
        expected[i, j] += 1
    np.testing.assert_array_equal(cm, expected)
    # diagonal = correct pixels
    assert cm.trace() == (gt == pred).sum()
