"""Test environment: run everything on a virtual 8-device CPU mesh so sharded
code paths are exercised without TPU hardware."""

import os

# Force CPU: the ambient environment may point JAX at a tunneled TPU
# (JAX_PLATFORMS=axon), which is far too slow for unit tests.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
