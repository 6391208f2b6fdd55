"""Test configuration.

Tests run on CPU with an 8-device virtual mesh (to exercise multi-chip
sharding paths without TPU hardware) and in x64 mode (for 1e-8-level parity
with the float64 reference). These env vars must be set before JAX initializes.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin (sitecustomize) forces jax_platforms="axon,cpu" at
# interpreter start; override it so tests run on the virtual CPU mesh.
try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
