"""Converged exact-NLL fit at the bench's north-star scale (VERDICT r2 #4).

Simulates bivariate observations at BENCH_N per process (default 12,500 —
the n ~ 25k joint system of BASELINE.md), then times one CONVERGED
on-device L-BFGS maximum-likelihood fit end to end (scaffold + compile
reported separately from the fit program itself). Prints the fitted
parameters so convergence is inspectable.

    python tools/bench_fit_nll.py           # n~25k on the ambient backend
    BENCH_N=2000 python tools/bench_fit_nll.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_PER = int(os.environ.get("BENCH_N", 12_500))
MAXITER = int(os.environ.get("BENCH_MAXITER", 100))


def main():
    import jax
    import jax.numpy as jnp

    from cokriging_tpu.cov.params import MaternParams
    from cokriging_tpu.estimate.nll import fit_nll_device
    from cokriging_tpu.fields.field import Field, MultiField

    dtype = np.float32 if jax.default_backend() == "tpu" else np.float64
    print(f"backend={jax.default_backend()} n={2 * N_PER} maxiter={MAXITER}")

    rng = np.random.default_rng(0)
    lat = rng.uniform(24.0, 50.0, N_PER)
    lon = rng.uniform(-124.0, -67.0, N_PER)
    c1 = np.column_stack([lat, lon]).astype(dtype)
    c2 = np.roll(c1, 1, axis=0) + rng.normal(scale=0.05, size=c1.shape).astype(dtype)
    s = np.sin(np.deg2rad(lat) * 6.0)
    v1 = (s + rng.normal(scale=0.3, size=N_PER)).astype(dtype)
    v2 = (-0.6 * s + rng.normal(scale=0.3, size=N_PER)).astype(dtype)
    v1 = (v1 - v1.mean()) / v1.std()
    v2 = (v2 - v2.mean()) / v2.std()

    fields = []
    for c, v, name in ((c1, v1, "Z0"), (c2, v2, "Z1")):
        f = Field.from_arrays(c, v, name)
        f.geodesic = True
        fields.append(f)
    mf = MultiField(fields=fields)

    init = MaternParams.default(2).astype(dtype)
    t0 = time.perf_counter()
    params, info = fit_nll_device(
        mf, init=init, maxiter=MAXITER, main=False, jitter=1e-6
    )
    jax.block_until_ready(params.to_flat())
    t_total = time.perf_counter() - t0
    print(
        f"fit_nll_device (incl. compile): {t_total:.1f} s  "
        f"nll={info['nll']:.2f}  iters={info['n_iter']}  "
        f"success={info['success']}"
    )

    # warm re-fit on fresh values (same shapes -> cached executable)
    v1b = np.roll(v1, 7)
    v2b = np.roll(v2, 7)
    fields_b = []
    for c, v, name in ((c1, v1b, "Z0"), (c2, v2b, "Z1")):
        f = Field.from_arrays(c, v, name)
        f.geodesic = True
        fields_b.append(f)
    mf_b = MultiField(fields=fields_b)
    t0 = time.perf_counter()
    params_b, info_b = fit_nll_device(
        mf_b, init=init, maxiter=MAXITER, main=False, jitter=1e-6
    )
    jax.block_until_ready(params_b.to_flat())
    t_warm = time.perf_counter() - t0
    print(
        f"fit_nll_device (warm): {t_warm:.1f} s  nll={info_b['nll']:.2f}  "
        f"iters={info_b['n_iter']}"
    )
    print("fitted rho:", float(params.rho[0, 1]))
    print("fitted flat:", np.round(np.asarray(params.to_flat(), np.float64), 4))


if __name__ == "__main__":
    main()
