"""CSV logger, tfevents placement, training-curve plots, batch pipeline."""

import os

import numpy as np

from visiontransformer_tpu.data.pipeline import batch_iterator, num_batches, prefetch
from visiontransformer_tpu.utils.csvlog import CSVLogger


class _ArrayDs:
    def __init__(self, n=10):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return (np.full((4, 4, 3), i, np.float32),
                np.full((4, 4), i, np.int32))


def test_csvlogger_versioning_and_schema(tmp_path):
    root = str(tmp_path)
    l0 = CSVLogger(root)
    assert l0.version == 0
    l1 = CSVLogger(root)
    assert l1.version == 1  # auto-increment like Lightning's CSVLogger

    l0.log({"train_loss": 1.0}, epoch=0, step=1)
    l0.log({"train_loss": 0.5, "valid_loss": 0.7}, epoch=0, step=2)
    import csv
    rows = list(csv.DictReader(open(l0.path)))
    assert rows[0]["train_loss"] == "1.0"
    assert rows[0]["valid_loss"] == ""  # union schema, blank backfill
    assert rows[1]["valid_loss"] == "0.7"


def test_training_curves_plot(tmp_path):
    from visiontransformer_tpu.evaluation.visualize import save_training_curves

    logger = CSVLogger(str(tmp_path))
    for epoch in range(3):
        logger.log({"train_loss": 1.0 / (epoch + 1),
                    "valid_loss": 1.2 / (epoch + 1),
                    "train_iou": 0.2 * (epoch + 1)}, epoch=epoch,
                   step=epoch * 10)
    out = str(tmp_path / "curves.png")
    assert save_training_curves(logger.path, out, "demo-model")
    assert os.path.getsize(out) > 1000
    assert not save_training_curves(str(tmp_path / "missing.csv"), out, "x")


def test_batch_iterator_static_shapes_and_determinism():
    ds = _ArrayDs(10)
    batches = list(batch_iterator(ds, 4, shuffle=True, seed=1, epoch=0))
    assert len(batches) == 2 == num_batches(ds, 4)  # drop_last keeps shapes
    assert all(b["image"].shape == (4, 4, 4, 3) for b in batches)
    again = list(batch_iterator(ds, 4, shuffle=True, seed=1, epoch=0))
    np.testing.assert_array_equal(batches[0]["image"], again[0]["image"])
    other_epoch = list(batch_iterator(ds, 4, shuffle=True, seed=1, epoch=1))
    assert not np.array_equal(batches[0]["image"], other_epoch[0]["image"])


def test_prefetch_preserves_order_and_content():
    ds = _ArrayDs(9)
    direct = list(batch_iterator(ds, 3))
    fetched = list(prefetch(batch_iterator(ds, 3), depth=2))
    assert len(direct) == len(fetched) == 3
    for a, b in zip(direct, fetched):
        np.testing.assert_array_equal(a["mask"], b["mask"])


def test_dataset_cache_parity(tmp_path):
    """cache=True returns identical samples while skipping re-decode."""
    from visiontransformer_tpu.data.dataset import (
        CESegmentationDataset,
        PAEDBinaryDataset,
    )
    from visiontransformer_tpu.data.synthetic import (
        generate_binary,
        generate_multiclass,
    )

    root = str(tmp_path / "mc")
    generate_multiclass(root, n_samples=4, image_size=64)
    kw = dict(image_size=64)
    plain = CESegmentationDataset(root + "/image_png", root + "/mask_png",
                                  **kw)
    cached = CESegmentationDataset(root + "/image_png", root + "/mask_png",
                                   cache=True, **kw)
    for i in range(len(plain)):
        for a, b in zip(plain[i], cached[i]):
            np.testing.assert_array_equal(a, b)
    # second access is a cache hit returning the same arrays
    assert cached[1][0] is cached[1][0]

    rootb = str(tmp_path / "bin")
    generate_binary(rootb, n_samples=3, image_size=64)
    pb = PAEDBinaryDataset(rootb + "/image_png", rootb + "/mask_png",
                           image_size=64)
    cb = PAEDBinaryDataset(rootb + "/image_png", rootb + "/mask_png",
                           image_size=64, cache=True)
    for i in range(len(pb)):
        for a, b in zip(pb[i], cb[i]):
            np.testing.assert_array_equal(a, b)
