"""f32-vs-f64 fit parity at the bench's north-star scale (VERDICT r2 #6).

Runs the bench workload (bench.py's synthetic n ~ 25k month: empirical
variograms -> moment init -> composite-WLS fit -> local cokriging at a
probe set) twice in ONE process — once in float64, once in float32 — and
reports per-parameter relative deltas plus prediction/err rtols. Run it
on CPU for a deterministic f32-vs-f64 comparison of the identical
algorithm, or on TPU to compare the TPU f32 path against the same
process's emulated-f64 fit:

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/f32_parity.py
    BENCH_N=2000 ... python tools/f32_parity.py     # smaller, faster

The measured deltas are recorded in docs/DESIGN.md §6; the framework-wide
dtype policy these numbers justify lives in utils.config.compute_dtype.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def fit_and_predict(dtype):
    import jax.numpy as jnp

    os.environ.setdefault("BENCH_N", "12500")
    import bench

    from cokriging_tpu.cov import MultivariateMatern
    from cokriging_tpu.estimate.empirical import (
        EmpiricalVariogram,
        VarioConfig,
        empirical_variograms_device,
    )
    from cokriging_tpu.estimate.wls import fit_wls, moment_init
    from cokriging_tpu.fields.field import Field, MultiField
    from cokriging_tpu.predict import LocalPredictor

    c1, v1, c2, v2 = bench.build_inputs(dtype, noise_seed=1)
    cfg = VarioConfig(max_dist=3_000.0, n_bins=15, geodesic=True)
    t0 = time.perf_counter()
    pairs, centers, means, counts = empirical_variograms_device(
        [c1, c2], [v1, v2], cfg
    )
    est = EmpiricalVariogram(
        df=None, config=cfg, timestamp=None, timedeltas=None, pairs=pairs,
        bin_centers=centers.astype(dtype), bin_means=means.astype(dtype),
        bin_counts=counts.astype(dtype),
    )
    params, _ = fit_wls(
        est, init=moment_init(est), method="adam", maxiter=600,
        theoretical=False,
    )

    n = int(os.environ["BENCH_N"])
    sub = max(1, n // 200)
    f1 = Field.from_arrays(np.asarray(c1)[::sub], np.asarray(v1)[::sub], "Z0")
    f1.geodesic = True
    f2 = Field.from_arrays(np.asarray(c2)[::sub], np.asarray(v2)[::sub], "Z1")
    f2.geodesic = True
    mf = MultiField(fields=[f1, f2])
    # an unconstrained WLS fit can land outside the spectral validity
    # region (every local system then indefinite -> NaN); predict with the
    # parsimonious projection, compare raw fitted params
    from cokriging_tpu.cov.spectral import project_to_valid

    pp = project_to_valid(params, parsimony=True).astype(dtype)
    lp = LocalPredictor(MultivariateMatern(params=pp), mf)
    rng = np.random.default_rng(7)
    probe = np.column_stack(
        [rng.uniform(28.0, 46.0, 400), rng.uniform(-120.0, -72.0, 400)]
    ).astype(np.float64)
    out = lp(0, probe, max_dist=1_000.0, postprocess=False)
    dt = time.perf_counter() - t0
    return (
        np.asarray(params.to_flat(), np.float64),
        out["pred"].to_numpy(),
        out["pred_err"].to_numpy(),
        dt,
    )


def main():
    import jax
    import jax.numpy as jnp

    print(f"backend={jax.default_backend()} n={os.environ.get('BENCH_N', 12500)}")
    flat64, pred64, err64, t64 = fit_and_predict(jnp.float64)
    flat32, pred32, err32, t32 = fit_and_predict(jnp.float32)

    names = [
        "sigma0", "sigma1", "nu00", "nu01", "nu11", "ls00", "ls01", "ls11",
        "nug0", "nug1", "rho01",
    ]
    print(f"\nfit+predict wall: f64 {t64:.1f} s, f32 {t32:.1f} s")
    print(f"{'param':>8} {'f64':>12} {'f32':>12} {'rel delta':>10}")
    worst = 0.0
    for k, nm in enumerate(names):
        denom = max(abs(flat64[k]), 1e-3)
        rd = abs(flat32[k] - flat64[k]) / denom
        worst = max(worst, rd)
        print(f"{nm:>8} {flat64[k]:>12.5f} {flat32[k]:>12.5f} {rd:>10.2e}")
    good = np.isfinite(pred64) & np.isfinite(pred32)
    dp = pred32[good] - pred64[good]
    de = err32[good] - err64[good]
    pr = np.linalg.norm(dp) / np.linalg.norm(pred64[good])
    er = np.linalg.norm(de) / np.linalg.norm(err64[good])
    print(f"\nworst param rel delta: {worst:.2e}")
    print(
        f"prediction rel-RMS delta: {pr:.2e} (max abs {np.abs(dp).max():.2e} "
        f"on std-scale preds)"
    )
    print(
        f"pred_err rel-RMS delta: {er:.2e} (max abs {np.abs(de).max():.2e})"
    )
    print(f"NaN preds: f64 {np.isnan(pred64).sum()}, f32 {np.isnan(pred32).sum()}")


if __name__ == "__main__":
    main()
