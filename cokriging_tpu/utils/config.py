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
#
# The cache key does NOT capture the host CPU's target features, but CPU
# executables are AOT-compiled for them — entries written on one machine
# can SIGILL/segfault on another (observed: avx512/amx artifacts from a
# prior host crashing pjit calls here). Segregate the cache by a
# fingerprint of the local CPU flags so a machine swap starts clean.
_cache_root = os.environ.get("COKRIGING_TPU_CACHE", "/root/repo/.jax_cache")


def _cpu_fingerprint() -> str:
    import hashlib

    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.sha256(
                        " ".join(sorted(line.split()[2:])).encode()
                    ).hexdigest()[:12]
    except OSError:
        pass
    import platform

    return hashlib.sha256(platform.processor().encode()).hexdigest()[:12]


_cache_dir = os.path.join(_cache_root, _cpu_fingerprint())
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


def compute_dtype(backend: str = None):
    """THE framework-wide backend dtype policy (single source of truth).

    f32 on TPU, f64 elsewhere. TPU f64 is emulated with f32 exponent
    range: ~50x slower, and at large n the emulated programs have been
    observed to fault the TPU runtime outright (DESIGN.md §6). Every
    workflow script and fit driver that adapts to the ambient backend
    should take its dtype from here; f32-vs-f64 fit parity at bench scale
    is measured by tools/f32_parity.py. Override per process with
    ``COKRIGING_DTYPE=float32|float64``.
    """
    env = os.environ.get("COKRIGING_DTYPE")
    if env:
        return {"float32": jnp.float32, "float64": jnp.float64}[env]
    b = backend or jax.default_backend()
    return jnp.float32 if b == "tpu" else jnp.float64
