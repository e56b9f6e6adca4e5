"""Test configuration.

Tests run on CPU with 8 virtual XLA devices — the standard fake-backend trick
for exercising multi-chip sharding without hardware (the reference has no
distributed tests at all, SURVEY.md §4).

Note: this environment pre-registers a remote-TPU PJRT plugin via
sitecustomize and pins JAX_PLATFORMS, so a plain env-var override is not
enough — the platform must be forced through jax.config before the backend
initializes (set here, before any test module imports jax arrays).
"""

import os

# Must land before the first backend initialization.
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

# Filled by pytest_collection_finish; read by tests/test_meta.py to keep the
# README's advertised test count honest (it drifted in rounds 2, 3 and 4).
COLLECTION = {"n_items": 0, "n_files": 0}


def pytest_collection_finish(session):
    files = {item.path for item in session.items}
    COLLECTION["n_items"] = len(session.items)
    COLLECTION["n_files"] = len(files)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


@pytest.fixture(scope="session")
def eight_devices():
    devices = jax.devices()
    assert len(devices) == 8, f"expected 8 virtual devices, got {len(devices)}"
    return devices
