"""XLA Euclidean distance transform vs scipy oracle."""

import numpy as np
import pytest

import jax.numpy as jnp

from visiontransformer_tpu.ops.edt import edt
from visiontransformer_tpu.losses.sdf import compute_sdf

scipy_ndimage = pytest.importorskip("scipy.ndimage")


@pytest.mark.parametrize("shape", [(32, 32), (48, 24)])
def test_edt_matches_scipy(rng, shape):
    mask = rng.random(shape) > 0.6
    expected = scipy_ndimage.distance_transform_edt(mask)
    got = np.asarray(edt(jnp.asarray(mask)))
    np.testing.assert_allclose(got, expected, atol=1e-4)


def test_edt_blob(rng):
    mask = np.zeros((40, 40), bool)
    mask[10:30, 5:35] = True
    expected = scipy_ndimage.distance_transform_edt(mask)
    got = np.asarray(edt(jnp.asarray(mask)))
    np.testing.assert_allclose(got, expected, atol=1e-4)


def test_compute_sdf_matches_reference_semantics(rng):
    mask = (rng.random((64, 64)) > 0.8)
    ext_exp = scipy_ndimage.distance_transform_edt(~mask).astype(np.float32)
    int_exp = scipy_ndimage.distance_transform_edt(mask).astype(np.float32)
    if ext_exp.max() > 0:
        ext_exp /= ext_exp.max()
    if int_exp.max() > 0:
        int_exp /= int_exp.max()
    ext, interior = compute_sdf(jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(ext), ext_exp, atol=1e-5)
    np.testing.assert_allclose(np.asarray(interior), int_exp, atol=1e-5)


def test_compute_sdf_empty_mask():
    # All-background mask: interior EDT is identically 0, no normalization.
    mask = jnp.zeros((16, 16), bool)
    ext, interior = compute_sdf(mask)
    assert np.asarray(interior).max() == 0
    assert np.asarray(ext).max() > 0  # saturated-but-normalized exterior
