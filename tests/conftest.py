"""Test configuration: force CPU JAX with 8 virtual devices.

Multi-chip sharding tests run on a virtual 8-device CPU mesh
(XLA_FLAGS=--xla_force_host_platform_device_count=8), as real multi-chip TPU
hardware is not available in CI. Must be set before jax is imported.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

# The axon sitecustomize force-sets jax_platforms="axon,cpu" at interpreter
# startup (before the env var is consulted); pin it back to CPU for tests.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu():
    assert jax.devices()[0].platform == "cpu", "tests must run on CPU"
    yield


@pytest.fixture()
def rng():
    # function-scoped on purpose: a session-scoped generator made every
    # test's data depend on how many draws ran before it, so tests passed
    # or failed based on suite composition (the win32 int32-range flake)
    return np.random.default_rng(42)
