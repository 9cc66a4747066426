"""Test configuration: force CPU backend with 8 virtual devices.

Emulates an 8-chip TPU mesh on the host so sharding/collective paths are
exercised without hardware (the TPU-native analogue of multi-node tests).
Must run before jax is imported anywhere.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(38107943)
