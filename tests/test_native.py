"""C++ native runtime kernels vs Python/scipy/PIL oracles."""

import numpy as np
import pytest

from visiontransformer_tpu import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not built")

scipy_ndimage = pytest.importorskip("scipy.ndimage")


def test_edt_matches_scipy(rng):
    mask = rng.random((64, 96)) > 0.7
    expected = scipy_ndimage.distance_transform_edt(mask)
    got = native.edt(mask)
    np.testing.assert_allclose(got, expected, atol=1e-4)


def test_label_matches_scipy(rng):
    mask = rng.random((48, 48)) > 0.6
    exp_labels, exp_n = scipy_ndimage.label(mask)
    labels, n = native.label(mask)
    assert n == exp_n
    # label ids may differ; compare partitions via relabeling match
    mapping = {}
    for a, b in zip(labels.reshape(-1), exp_labels.reshape(-1)):
        if a == 0 or b == 0:
            assert a == b == 0 or (a == 0) == (b == 0)
            continue
        assert mapping.setdefault(a, b) == b


def test_bounding_boxes_match_python(rng):
    from visiontransformer_tpu.ops.morphology import bounding_boxes_np
    mask = rng.random((40, 40)) > 0.8
    assert sorted(native.bounding_boxes(mask)) == sorted(bounding_boxes_np(mask))


def test_skeletonize_matches_numpy():
    mask = np.zeros((32, 32), np.uint8)
    mask[10:20, 4:28] = 1  # thick bar
    from visiontransformer_tpu.ops.morphology import skeletonize_np
    expected = skeletonize_np(mask.copy())
    got = native.skeletonize(mask)
    np.testing.assert_array_equal(got, expected)


def test_remap(rng):
    lut = rng.integers(0, 17, 256).astype(np.int32)
    vals = rng.integers(0, 256, (100, 70)).astype(np.uint8)
    np.testing.assert_array_equal(native.remap_u8(vals, lut), lut[vals])


def test_resize_nearest_pil(rng):
    from PIL import Image
    img = rng.integers(0, 255, (300, 500)).astype(np.uint8)
    expected = np.asarray(Image.fromarray(img).resize((224, 256),
                                                      Image.NEAREST))
    got = native.resize_nearest_pil_u8(img, (256, 224))
    np.testing.assert_array_equal(got, expected)


def test_pure_python_fallbacks_match_scipy(rng):
    """The no-native, no-scipy fallback path (ops/morphology) is correct."""
    from visiontransformer_tpu.ops.morphology import connected_components_np

    mask = rng.random((24, 24)) > 0.6
    exp_labels, exp_n = scipy_ndimage.label(mask)
    labels, n = connected_components_np(mask)
    assert n == exp_n
    mapping = {}
    for a, b in zip(labels.reshape(-1), exp_labels.reshape(-1)):
        if a == 0 or b == 0:
            assert (a == 0) == (b == 0)
            continue
        assert mapping.setdefault(int(a), int(b)) == b


def test_detections_single_pass_matches_per_class(rng):
    """vn_detections (one traversal, all classes) == per-class label+boxes."""
    from visiontransformer_tpu.ops.morphology import bounding_boxes_np

    for shape, n_cls in (((48, 64), 5), ((96, 96), 17)):
        mask = rng.integers(0, n_cls, shape).astype(np.int32)
        got = native.detections(mask)
        ref = []
        for cls in np.unique(mask):
            if cls == 0:
                continue
            for box in bounding_boxes_np(mask == cls):
                ref.append((int(cls),) + tuple(int(v) for v in box))
        assert got == sorted(ref)


def test_detections_empty_and_single_region():
    assert native.detections(np.zeros((8, 8), np.int32)) == []
    mask = np.zeros((8, 8), np.int32)
    mask[2:5, 3:7] = 4
    assert native.detections(mask) == [(4, 2, 3, 4, 6)]
