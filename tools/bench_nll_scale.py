"""NLL-at-scale measurement (VERDICT round-1 item 6): exact Gaussian NLL
value+grad at n = n1 + n2 ~ 25k on one TPU chip, f32, with the covariance
assembly rematerialized (estimate/nll.py) so memory stays O(n^2).

Prints one line per size: seconds per jitted value_and_grad eval (fresh
parameter vector each call — the axon runtime caches repeated identical
calls, see docs/DESIGN.md section 2).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from cokriging_tpu.cov.params import MaternParams
from cokriging_tpu.estimate.nll import (
    joint_distance_blocks,
    _nll_value_and_grad,
)

SIZES = [int(s) for s in os.environ.get("NLL_SIZES", "2500,6250,12500").split(",")]


def main():
    rng = np.random.default_rng(0)
    spec = MaternParams.default().spec
    base = np.array([1.0, 1.0, 1.5, 1.5, 1.5, 500.0, 500.0, 500.0, 0.01, 0.01, -0.3])
    for half in SIZES:
        n = 2 * half
        lat = rng.uniform(25, 50, half)
        lon = rng.uniform(-125, -65, half)
        coords = jnp.asarray(np.stack([lat, lon], 1), jnp.float32)
        dists = joint_distance_blocks([coords, coords], geodesic=True)
        z = jnp.asarray(rng.normal(size=n), jnp.float32)
        flat = jnp.asarray(base, jnp.float32)
        t0 = time.perf_counter()
        v, g = _nll_value_and_grad(flat, dists, z, spec, None, 1e-4)
        v = float(v)
        compile_s = time.perf_counter() - t0
        ts = []
        for k in range(3):
            f2 = jnp.asarray(base * (1.0 + 0.01 * (k + 1)), jnp.float32)
            t0 = time.perf_counter()
            v, g = _nll_value_and_grad(f2, dists, z, spec, None, 1e-4)
            v = float(v)
            ts.append(time.perf_counter() - t0)
        print(
            f"n={n:6d}  value+grad {min(ts):7.3f} s/eval "
            f"(compile+first {compile_s:6.1f} s)  nll={v:.1f} "
            f"finite_grad={bool(np.isfinite(np.asarray(g)).all())}",
            flush=True,
        )


if __name__ == "__main__":
    main()
