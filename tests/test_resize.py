"""Resize ops vs torch / PIL oracles."""

import numpy as np
import pytest

import jax.numpy as jnp

from visiontransformer_tpu.ops.resize import (
    resize_bilinear,
    resize_nearest_pil,
    resize_nearest_torch,
)

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402
from PIL import Image  # noqa: E402


@pytest.mark.parametrize("in_size,out_size", [(256, 224), (224, 256), (56, 224),
                                              (224, 224), (100, 37)])
def test_bilinear_matches_torch(rng, in_size, out_size):
    x = rng.standard_normal((2, 3, in_size, in_size)).astype(np.float32)
    expected = F.interpolate(torch.from_numpy(x), size=(out_size, out_size),
                             mode="bilinear", align_corners=False).numpy()
    got = np.asarray(resize_bilinear(jnp.asarray(x), (out_size, out_size)))
    np.testing.assert_allclose(got, expected, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("in_size,out_size", [(256, 224), (224, 256), (64, 224),
                                              (100, 37)])
def test_nearest_matches_torch(rng, in_size, out_size):
    x = rng.integers(0, 17, (2, 1, in_size, in_size)).astype(np.float32)
    expected = F.interpolate(torch.from_numpy(x), size=(out_size, out_size),
                             mode="nearest").numpy()
    got = np.asarray(resize_nearest_torch(jnp.asarray(x), (out_size, out_size)))
    np.testing.assert_array_equal(got, expected)


@pytest.mark.parametrize("in_size,out_size", [(512, 256), (512, 224), (300, 224),
                                              (128, 224)])
def test_nearest_matches_pil(rng, in_size, out_size):
    x = rng.integers(0, 255, (in_size, in_size)).astype(np.uint8)
    expected = np.asarray(
        Image.fromarray(x).resize((out_size, out_size), Image.NEAREST))
    got = np.asarray(resize_nearest_pil(jnp.asarray(x), (out_size, out_size)))
    np.testing.assert_array_equal(got, expected)


@pytest.mark.parametrize("in_size,out_size", [(224, 224), (256, 224),
                                              (1024, 224), (224, 512),
                                              (99, 101), (640, 480)])
def test_nearest_pil_fuzz(rng, in_size, out_size):
    """Bit-exactness across irregular ratios (incl. the incremental-
    accumulation boundary cases)."""
    x = rng.integers(0, 255, (in_size, in_size)).astype(np.uint8)
    expected = np.asarray(
        Image.fromarray(x).resize((out_size, out_size), Image.NEAREST))
    got = np.asarray(resize_nearest_pil(jnp.asarray(x), (out_size, out_size)))
    np.testing.assert_array_equal(got, expected)


@pytest.mark.parametrize("in_size,out_size", [(14, 224), (28, 448), (32, 512),
                                              (7, 99)])
def test_bilinear_upsample_fuzz(rng, in_size, out_size):
    """The seg-head upsample ratios used across the sweep configs."""
    x = rng.standard_normal((1, 17, in_size, in_size)).astype(np.float32)
    expected = F.interpolate(torch.from_numpy(x), size=(out_size, out_size),
                             mode="bilinear", align_corners=False).numpy()
    got = np.asarray(resize_bilinear(jnp.asarray(x), (out_size, out_size)))
    np.testing.assert_allclose(got, expected, atol=1e-5, rtol=1e-5)
