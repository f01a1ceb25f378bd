"""Test harness: force JAX onto 8 virtual CPU devices.

The multi-chip path is validated on a CPU mesh (SURVEY.md §4: the TPU-native
answer to "test multi-node without a real cluster").  These env vars must be
set before jax initialises a backend; the axon TPU plugin (registered by
sitecustomize) is disabled by removing its pool address.
"""

import os

os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"
prev = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in prev:
    os.environ["XLA_FLAGS"] = (prev + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

try:  # if the axon plugin object was already registered, force cpu selection
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(0)


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu():
    assert jax.devices()[0].platform == "cpu", jax.devices()
    assert len(jax.devices()) == 8, jax.devices()


# ---------------------------------------------------------------------------
# Two-tier suite (VERDICT r4 #5): the default tier must stay fast enough for
# keep-green runs; the heavy HF-twin goldens and mesh-interpret tests carry
# @pytest.mark.slow and run in the full tier:
#   python -m pytest tests/ -q                  # fast tier (default)
#   python -m pytest tests/ -q --runslow        # full tier (CI cadence)
#   LC2IS_SLOW_TESTS=1 python -m pytest tests/  # full tier via env
# ---------------------------------------------------------------------------

def pytest_addoption(parser):
    parser.addoption("--runslow", action="store_true", default=False,
                     help="run @pytest.mark.slow tests (full tier)")


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: heavy HF-twin goldens / mesh-interpret / rehearsal tests "
        "(full tier: --runslow or LC2IS_SLOW_TESTS=1)")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow") or os.environ.get("LC2IS_SLOW_TESTS") == "1":
        return
    skip = pytest.mark.skip(
        reason="slow tier (pass --runslow or set LC2IS_SLOW_TESTS=1)")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
