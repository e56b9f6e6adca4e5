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


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


@pytest.fixture(scope="session")
def eight_devices():
    devices = jax.devices()
    assert len(devices) == 8, f"expected 8 virtual devices, got {len(devices)}"
    return devices
