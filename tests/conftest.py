"""Test harness config: force an 8-virtual-device CPU platform.

Tests exercise sharding on a virtual mesh (the driver separately dry-runs
the multi-chip path); the real-TPU numbers come from bench.py. Env must be
set before jax imports anywhere in the test process.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# The image's sitecustomize imports jax at interpreter startup with
# JAX_PLATFORMS=axon; override via the config API before any backend use.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
