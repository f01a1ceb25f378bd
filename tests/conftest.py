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
