"""Test configuration: force an 8-virtual-device CPU platform so that
multi-chip sharding paths are exercised without TPU hardware (SURVEY.md §4:
the reference has no distributed tests; we simulate a mesh on CPU).

Note: this box pins ``JAX_PLATFORMS=axon`` (tunneled TPU) and the plugin
forces platform priority ``axon,cpu``, so the env var alone is not enough —
we must also update the jax config after import.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: interpret-mode Pallas / multi-minute tests (skipped by "
        "default; run with DS_RUN_SLOW=1 or -m slow)",
    )


def pytest_collection_modifyitems(config, items):
    """Default runs skip @pytest.mark.slow so the suite stays under ~5 min
    on this single-core box; DS_RUN_SLOW=1 (or an explicit -m selection)
    runs everything."""
    if os.environ.get("DS_RUN_SLOW") == "1" or config.getoption("-m"):
        return
    skip = pytest.mark.skip(reason="slow (set DS_RUN_SLOW=1 or -m slow)")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture()
def rng():
    return np.random.RandomState(11)
