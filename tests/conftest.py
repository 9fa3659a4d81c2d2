"""Test configuration: run on a CPU backend with 8 virtual devices.

The container's sitecustomize registers the 'axon' TPU platform before
pytest starts, so the platform must be switched at runtime (env vars are
already latched). CPU gives true IEEE f64 (the TPU emulates f64 with f32
exponent range), which is what golden-value comparisons against scipy need;
the 8 virtual devices exercise the multi-chip sharding paths.
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)
