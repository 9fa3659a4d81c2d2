"""Global numeric configuration.

The reference stack (scipy/numpy) is float64 end-to-end; kriging solves are
ill-conditioned enough that we keep f64 as the default solve dtype and make
it explicit here. On TPU, f64 is emulated — callers that want maximum MXU
throughput can pass ``dtype=jnp.float32`` to the hot entry points; accuracy
tests always run f64.
"""

import os

import jax

# Enable 64-bit before any array is created.
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: TPU (remote) compiles of the blocked
# pairwise programs run minutes cold; cache them across processes.
_cache_dir = os.environ.get("COKRIGING_TPU_CACHE", "/root/repo/.jax_cache")
try:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:  # older jax without these options
    pass

import jax.numpy as jnp  # noqa: E402

#: Default dtype for covariance assembly and linear solves.
SOLVE_DTYPE = jnp.float64

#: Earth radius in kilometers (reference: src/fields.py:17).
EARTH_RADIUS_KM = 6371.0
