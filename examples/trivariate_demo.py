"""Trivariate cokriging demo: three co-varying processes end-to-end.

The reference is bivariate-only in practice — its cross-covariance uses an
``np.nanprod`` trick over the sigma matrix and an all-process sill that are
only correct at p = 2 (src/model.py:199-222). This framework generalizes
every stage to p processes (pair sill, p-wide simulator, p(p+1)/2 variogram
groups, p-block joint/local cokriging). This script exercises the full
workflow at p = 3:

  simulate -> semi-colocated sample -> empirical (cross-)variograms ->
  moment init -> composite WLS -> joint + local cokriging -> error ratio
  vs univariate kriging.

Writes figures to examples/out/.
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import warnings

import numpy as np

warnings.filterwarnings("ignore")

OUT = pathlib.Path(__file__).parent / "out"
OUT.mkdir(exist_ok=True)

# flat order for p=3: sigma(3), nu(6), len_scale(6), nugget(3), rho(01,02,12)
TRUE_RHO = (-0.6, 0.4, -0.2)
TRUTH = [1.0, 1.0, 1.0] + [1.5] * 6 + [0.2] * 6 + [0.05] * 3 + list(TRUE_RHO)
EPS = 0.1
NAMES = ["XCO2", "SIF", "EVI"]


def main():
    import time

    import matplotlib

    matplotlib.use("Agg")
    import jax.numpy as jnp

    t0 = time.perf_counter()

    def _mark(stage):
        print(f"[{time.perf_counter() - t0:7.1f}s] {stage}", flush=True)

    from cokriging_tpu.cov import MaternParams, MultivariateMatern
    from cokriging_tpu.cov.params import ParamSpec
    from cokriging_tpu.estimate import VarioConfig, empirical_variograms
    from cokriging_tpu.estimate.wls import fit_wls, moment_init
    from cokriging_tpu.predict import JointPredictor, LocalPredictor
    from cokriging_tpu.sim import CartesianGrid, MultivariateRandomField
    from cokriging_tpu.plot import plot_samples, plot_variograms

    spec = ParamSpec(
        n_procs=3, len_scale_bounds=(0.02, 2.0), sigma_bounds=(0.2, 3.0)
    )
    truth = MaternParams.from_flat(jnp.asarray(np.array(TRUTH)), spec=spec)
    mod_truth = MultivariateMatern(params=truth)

    _mark("simulate")
    grid = CartesianGrid(xcount=41, ycount=41)
    rf = MultivariateRandomField(mod_truth, grid, seed=11)
    samples = rf.sample(size=280, epsilon=(EPS,))
    fig = plot_samples(samples, titles=NAMES)
    fig.savefig(OUT / "trivariate_samples.png", dpi=120)

    _mark("empirical variograms")
    mf = rf.to_fields(samples)

    # --- estimate all six (cross-)variogram groups and fit by WLS -------
    # average the empirical curves over a few independent sample draws
    # (the reference's simulation experiment fits per-draw; pooling cuts
    # estimator variance so the recovery table below is representative)
    cfg = VarioConfig(max_dist=0.6, n_bins=12, geodesic=False)
    ests = [
        empirical_variograms(rf.to_fields(rf.sample(size=280, epsilon=(EPS,), seed=s)), cfg)
        for s in (11, 12, 13)
    ]
    est = ests[0]
    est.bin_means = np.mean([e.bin_means for e in ests], axis=0)
    est.bin_counts = np.sum([e.bin_counts for e in ests], axis=0)
    assert est.config.n_procs == 3 and len(est.pairs) == 6
    _mark("WLS fit")
    params, result = fit_wls(
        est, init=moment_init(est, spec=spec), method="scipy", maxiter=400
    )
    fig = plot_variograms(result, names=NAMES)
    fig.savefig(OUT / "trivariate_variograms.png", dpi=120)

    rho_hat = np.asarray(params.rho)[[0, 0, 1], [1, 2, 2]]
    print("true rho :", np.round(TRUE_RHO, 3))
    print("fitted   :", np.round(rho_hat, 3))

    # --- predict SIF (process 1) from all three processes ---------------
    _mark("joint prediction")
    pc = rf.coords.values[::3]
    tv = rf.truth_at(1, pc)
    jp = JointPredictor(mod_truth, mf)
    tri = jp(1, pc, postprocess=False)

    # univariate baseline: SIF alone
    from cokriging_tpu.fields import MultiField

    mf_uni = MultiField(fields=[mf.fields[1]])
    uni_params = MaternParams.default(1).with_flat(
        jnp.asarray(
            [
                float(truth.sigma[1]),
                float(truth.nu[1, 1]),
                float(truth.len_scale[1, 1]),
                float(truth.nugget[1]),
            ]
        )
    )
    _mark("univariate baseline")
    jp_uni = JointPredictor(MultivariateMatern(params=uni_params), mf_uni)
    uni = jp_uni(0, pc, postprocess=False)

    mspe_tri = float(np.mean((tri["pred"].values - tv) ** 2))
    mspe_uni = float(np.mean((uni["pred"].values - tv) ** 2))
    err_ratio = float(
        np.mean(tri["pred_err"].values) / np.mean(uni["pred_err"].values)
    )
    print(f"MSPE trivariate cokriging: {mspe_tri:.4f}")
    print(f"MSPE univariate kriging  : {mspe_uni:.4f}")
    print(f"mean pred-err ratio (tri/uni): {err_ratio:.3f}")
    assert mspe_tri <= mspe_uni * 1.02, "cokriging must not lose to kriging"

    # --- local predictor agrees with the exact joint solution -----------
    # (opt-in: the vmapped local-kriging program is a minutes-long XLA
    # compile on CPU-only hosts; tests/test_trivariate.py covers this
    # equivalence, so the demo skips it unless asked)
    import os

    if os.environ.get("TRIVARIATE_DEMO_LOCAL", "0") == "1":
        _mark("local prediction")
        lp = LocalPredictor(mod_truth, mf)
        loc = lp(1, pc, max_dist=0.5, postprocess=False)
        gap = float(np.mean((loc["pred"].values - tri["pred"].values) ** 2))
        print(f"local-vs-joint MSD (wide radius): {gap:.5f}")

    _mark("done")
    print(f"figures -> {OUT}")


if __name__ == "__main__":
    main()
