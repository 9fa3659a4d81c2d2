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


@pytest.fixture(scope="module", autouse=True)
def _release_executables_between_modules():
    """Drop compiled executables after each test module.

    A full-suite process otherwise accumulates every jitted program's
    executable mappings and crosses the kernel's ``vm.max_map_count``
    (65530 default): measured ~65k maps at ~80% of the suite, at which
    point mmap fails inside LLVM and the process segfaults
    (deterministically, mid-compile). Re-jits within a later module
    reload from the persistent compilation cache, so the cost is small.
    """
    yield
    jax.clear_caches()


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)
