"""Test configuration: CPU backend with 8 virtual devices + float64.

Tests run on the CPU backend (fast, deterministic, f64-capable) with a
virtual 8-device mesh so sharding paths are exercised without TPU hardware -
the standard JAX fake-backend trick. Must run before jax is imported.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The environment's sitecustomize may have imported jax with a TPU plugin
# platform already latched into the config; force CPU in-process.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
