"""Evaluation sweep: CSV schema, metric math, aggregation, demo contract."""

import csv
import os

import numpy as np
import pytest

import jax

from visiontransformer_tpu.configs import SweepEntry, ViTSegConfig, ViTConfig
from visiontransformer_tpu.data.synthetic import generate_multiclass
from visiontransformer_tpu.data.dataset import CESegmentationDataset
from visiontransformer_tpu.evaluation.evaluate import CSV_HEADER, evaluate_model
from visiontransformer_tpu.evaluation.compare import (
    aggregate_metrics,
    class_confusion_matrix,
    class_detection_summary,
    load_metrics,
)
from visiontransformer_tpu.evaluation.demo import make_predict_fn, predict_image
from visiontransformer_tpu.models.vitseg import vitseg_init

TINY = ViTConfig(image_size=32, patch_size=16, hidden_size=64,
                 num_hidden_layers=1, num_attention_heads=4,
                 intermediate_size=64)


@pytest.fixture(scope="module")
def sweep_output(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("data"))
    generate_multiclass(root, n_samples=6, image_size=64)
    ds = CESegmentationDataset(os.path.join(root, "image_png"),
                               os.path.join(root, "mask_png"),
                               image_size=32, mask_size=48)
    cfg = ViTSegConfig(vit=TINY, num_classes=ds.num_classes)
    entry = SweepEntry(0, 16, 64, 1, 4)
    params = vitseg_init(jax.random.PRNGKey(0), cfg)
    out_dir = str(tmp_path_factory.mktemp("eval"))
    csv_path = evaluate_model(params, cfg, entry, ds, output_dir=out_dir,
                              batch_size=2, num_batches=3)
    return out_dir, csv_path, ds.num_classes


def test_csv_schema(sweep_output):
    _, csv_path, _ = sweep_output
    with open(csv_path) as f:
        rows = list(csv.reader(f))
    assert rows[0] == CSV_HEADER
    assert len(rows) == 1 + 6  # 3 batches x batch 2
    header = {name: i for i, name in enumerate(rows[0])}
    for row in rows[1:]:
        acc = float(row[header["Accuracy"]])
        assert 0.0 <= acc <= 100.0
        assert row[header["Model_Name"]] == "P16H64A4"
        gt_classes = row[header["GT_Classes"]].split("|")
        assert all(c.isdigit() for c in gt_classes)
        # Missing = GT \ Pred, by definition.
        gt = set(map(int, gt_classes))
        pred = set(map(int, row[header["Pred_Classes"]].split("|")))
        missing_cell = row[header["Missing_Classes"]]
        missing = set(map(int, missing_cell.split("|"))) if missing_cell else set()
        assert missing == gt - pred


def test_aggregation(sweep_output):
    out_dir, _, num_classes = sweep_output
    metrics = load_metrics(out_dir)
    assert "P16H64A4" in metrics
    summary = aggregate_metrics(out_dir)
    assert summary.loc["P16H64A4", "images"] == 6
    assert 0 <= summary.loc["P16H64A4", "accuracy"] <= 100

    df = metrics["P16H64A4"]
    det = class_detection_summary(df, num_classes)
    assert (det["detected"] == det["present"] - det["missed"]).all()
    m = class_confusion_matrix(df, num_classes)
    assert m.shape == (num_classes, num_classes)


def test_predict_image_contract(rng):
    cfg = ViTSegConfig(vit=TINY, num_classes=6)
    params = vitseg_init(jax.random.PRNGKey(1), cfg)
    image = rng.random((32, 32, 3)).astype(np.float32)
    result = predict_image(params, cfg, image,
                           predict_fn=make_predict_fn(cfg))
    assert result["mask"].shape == (32, 32)
    assert result["mask_rgb"].shape == (32, 32, 3)
    for det in result["detections"]:
        y0, x0, y1, x1 = det["box_yxyx"]
        assert 0 <= y0 <= y1 < 32 and 0 <= x0 <= x1 < 32
        assert det["class_id"] in result["classes"]
        assert det["class_id"] != 0  # background skipped


def test_demo_composite_render(tmp_path, rng):
    from visiontransformer_tpu.evaluation.demo import (
        make_predict_fn,
        predict_image,
        render_demo_composite,
    )
    from visiontransformer_tpu.models.vitseg import vitseg_init

    cfg = ViTSegConfig(vit=TINY, num_classes=6)
    params = vitseg_init(jax.random.PRNGKey(2), cfg)
    image = rng.random((32, 32, 3)).astype(np.float32)
    result = predict_image(params, cfg, image,
                           predict_fn=make_predict_fn(cfg),
                           class_names=[f"c{i}" for i in range(6)])
    out = str(tmp_path / "demo.png")
    render_demo_composite(image, result, out,
                          class_names=[f"c{i}" for i in range(6)],
                          title="smoke")
    assert os.path.getsize(out) > 5000
