"""Test harness: force an 8-device virtual CPU mesh before jax initializes.

Mirrors the SURVEY §4 implication: deterministic, seeded, CPU-runnable unit
tests, with multi-device sharding exercised via
``--xla_force_host_platform_device_count`` (no TPU needed in CI).
"""

import os

# The environment pre-sets JAX_PLATFORMS=axon (one real TPU chip) and the
# axon sitecustomize imports jax at interpreter start, so env vars alone are
# too late — jax.config.update is the reliable override.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
