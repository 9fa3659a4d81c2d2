"""Exact-NLL throughput scaling: evals/sec vs n (the BASELINE.json metric's
second axis).

One NLL evaluation = assemble the (n1+n2) joint Matern covariance, one
Cholesky, two triangular solves, plus the reverse-mode gradient in the same
call. Distances are precomputed once (they are parameter-independent).
Runs at f32 on TPU (MXU Cholesky), f64 elsewhere.

Past this path's O(n^2)-memory ceiling (~25k obs on one v5e chip), see
examples/vecchia_scaling.py — the O(N m^3) Vecchia approximation.
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import time
import warnings

import numpy as np

warnings.filterwarnings("ignore")


def main():
    import jax
    import jax.numpy as jnp

    from cokriging_tpu.cov import MaternParams
    from cokriging_tpu.cov.params import ParamSpec
    from cokriging_tpu.estimate.nll import (
        _nll_value_and_grad,
        joint_distance_blocks,
    )

    dtype = jnp.float32 if jax.default_backend() == "tpu" else jnp.float64
    spec = ParamSpec(
        2, sigma_bounds=(0.1, 3.0), len_scale_bounds=(0.02, 1.0),
        nugget_bounds=(0.0, 0.5),
    )
    flat = jnp.asarray(
        np.array([1, 1, 1.5, 1.5, 1.5, 0.2, 0.2, 0.2, 0.05, 0.05, -0.5]), dtype
    )
    rng = np.random.default_rng(0)

    print(f"backend={jax.default_backend()} dtype={dtype.__name__}")
    # TPU carries the full n~25k north star (6.4 s/eval measured — fused
    # Pallas forward/backward Matern kernels + analytic dC VJP); CPU f64
    # stays small (the XLA chunked backward is the golden path there)
    sizes = [2500, 5000, 12500] if jax.default_backend() == "tpu" else [2500, 5000]
    for n_per in sizes:
        coords = [
            jnp.asarray(rng.uniform(0, 1, size=(n_per, 2)), dtype)
            for _ in range(2)
        ]
        z = jnp.asarray(rng.normal(size=2 * n_per), dtype)
        dists = joint_distance_blocks(coords, geodesic=False)
        # warm (force host materialization — the axon backend's
        # block_until_ready can return before remote execution finishes)
        v, g = _nll_value_and_grad(flat, dists, z, spec, None, 1e-6)
        float(v), np.asarray(g)
        reps = 5
        t0 = time.perf_counter()
        for k in range(reps):
            # perturb an argument so no layer can reuse the previous result
            fk = flat.at[0].add(1e-6 * (k + 1))
            v, g = _nll_value_and_grad(fk, dists, z, spec, None, 1e-6)
            float(v), np.asarray(g)
        dt = (time.perf_counter() - t0) / reps
        print(
            f"n = 2x{n_per:>6}: {dt * 1e3:8.1f} ms/eval+grad "
            f"({1 / dt:6.2f} evals/sec)  nll={float(v):.1f}"
        )


if __name__ == "__main__":
    main()
