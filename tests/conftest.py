"""Test configuration: force CPU backend with 8 virtual devices.

Emulates an 8-chip TPU mesh on the host so sharding/collective paths are
exercised without hardware (the TPU-native analogue of multi-node tests).

Note: this environment pre-imports jax at interpreter startup (axon
sitecustomize), so env vars alone are too late — we must update the jax
config directly before the backend is instantiated. Set
SRIT_TEST_PLATFORM=axon to run the suite on the real chip instead.
"""
import os

_platform = os.environ.get("SRIT_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _platform
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", _platform)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(38107943)
