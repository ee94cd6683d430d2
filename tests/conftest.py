"""Test configuration: force an 8-virtual-device CPU platform so that
multi-chip sharding paths are exercised without TPU hardware (SURVEY.md §4:
the reference has no distributed tests; we simulate a mesh on CPU)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture()
def rng():
    return np.random.RandomState(11)
