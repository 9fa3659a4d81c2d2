"""Reference-parity check on the simulation experiment (VERDICT r4 #3/#4).

Runs the REFERENCE implementation (/root/reference/src, via the same inert
stubs as gen_golden_reference.py) on the EXACT data of
examples/simulation_experiment.py — same simulated cofield (seed 42),
same semi-colocated sample (size=100, eps=0.1, seed 7) — and reports,
side by side with the repo's own numbers:

1. **WLS recovery** (reference: src/model.py:285-317, scipy L-BFGS-B with
   FD gradients over the reference's own empirical variograms,
   src/fields.py:192-252): does the reference's primary estimator land in
   the same place as the repo's WLS on identical data? (The repo's WLS on
   this setup pegs nu at the 3.5 bound and overshoots |rho|; if the
   reference does the same, that is estimator parity, not a repo bug.)

2. **Joint-LOOCV coverage** (reference: src/joint_prediction.py:207-257 —
   delete row/col per held-out point, full refactorization): the repo's
   committed coverage is 0.86 with z_std 1.306 at nominal 0.95; neither
   implementation adds the sampled measurement-error variance to the CV
   denominator (the reference comments it out,
   src/point_prediction.py:109-110), so an identical miss is parity.

The reference's LOOCV math is executed through its own Predictor methods
(_pred_cov/_pred_cross_cov/_joint_cov with cv_ix + cho_solve, i.e. the
body of __call__ minus the xarray wrapper, which cannot run against the
stubbed xarray). Data containers are minimal shims exposing the
attributes the reference reads (coords/values[_main]); every numerical
path is reference code.

Writes results/ref_parity_sim.json. Run on CPU (f64, matches the
reference's numpy): python tools/ref_parity_sim.py
"""

import pathlib
import sys
import warnings

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "tools"))

TRUTH = [1.0, 1.0, 1.5, 1.5, 1.5, 0.2, 0.2, 0.2, 0.0, 0.0, -0.6]
INIT = [1, 1, 1.5, 1.5, 1.5, 0.1, 0.1, 0.1, 0.01, 0.01, 0.0]
EPS = 0.1


def _simulate_repo_data():
    """The exact data of examples/simulation_experiment.py, on CPU f64."""
    from cokriging_tpu.cov import MaternParams, MultivariateMatern
    from cokriging_tpu.sim import BivariateRandomField, CartesianGrid

    mod = MultivariateMatern(params=MaternParams.from_flat(np.array(TRUTH)))
    grid = CartesianGrid(xcount=51, ycount=51)
    rf = BivariateRandomField(mod, grid, seed=42)
    samples = rf.sample(size=100, epsilon=[EPS, EPS], seed=7)
    mf = rf.to_fields(samples)
    return mod, mf


class _ShimField:
    def __init__(self, coords, values):
        self.coords = np.asarray(coords, float)
        self.coords_main = self.coords
        self.values = np.asarray(values, float)
        self.values_main = self.values


def _make_ref_mf(ref_fields_mod, coords_list, values_list):
    """Reference-MultiField stand-in: reference methods bound to a shim
    container (runs the REAL reference variogram/distance code)."""

    class _ShimMF:
        calc_dist_matrix = ref_fields_mod.MultiField.calc_dist_matrix
        _variogram_cloud = ref_fields_mod.MultiField._variogram_cloud
        get_variogram = ref_fields_mod.MultiField.get_variogram
        empirical_variograms = ref_fields_mod.MultiField.empirical_variograms

        def __init__(self, fields):
            self.fields = np.array(fields, dtype=object)
            self.n_procs = len(fields)
            self.timestamp = "sim"
            self.timedeltas = [0] * len(fields)

    return _ShimMF(
        [_ShimField(c, v) for c, v in zip(coords_list, values_list)]
    )


def run_reference(coords_list, values_list):
    from gen_golden_reference import _install_stubs

    _install_stubs()
    sys.path.insert(0, "/root/reference/src")
    from scipy.linalg import cho_factor, cho_solve

    import fields as ref_fields
    import model as ref_model

    mf = _make_ref_mf(ref_fields, coords_list, values_list)

    # --- reference WLS fit (src/model.py:285-317), repo-experiment
    # bounds/init (examples/simulation_experiment.py) ---
    config = ref_fields.VarioConfig(
        max_dist=1.0, n_bins=12, n_procs=2, dist_units=None, fast_dist=False
    )
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        est = mf.empirical_variograms(config)

    mod = ref_model.MultivariateMatern(n_procs=2)
    mod.params.set_values(np.array(INIT, float))
    guess = ref_model.MaternParams(n_procs=2)
    guess.sigma.bounds = (0.1, 3.0)
    guess.len_scale.bounds = (0.02, 1.0)
    guess.nugget.bounds = (0.0, 0.5)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        mod.fit(est, guess=guess)
    ref_wls_flat = np.asarray(mod.params.get_values(), float)
    ref_wls_cost = float(mod.fit_result.cost)

    # --- reference joint LOOCV with the truth model
    # (src/joint_prediction.py:207-257 semantics: per held-out point,
    # delete row/col cv_ix and refactorize; __call__'s solve verbatim) ---
    import joint_prediction as ref_joint

    mod_t = ref_model.MultivariateMatern(n_procs=2)
    mod_t.params.set_values(np.array(TRUTH, float))
    pred = ref_joint.Predictor(mod_t, mf, dist_units=None, fast_dist=False)
    pred.i = 0
    n0 = mf.fields[0].values_main.shape[0]
    zs = []
    for ix in range(n0):
        pc = mf.fields[0].coords_main[ix][None, :]
        pcov = pred._pred_cov(pc)
        pcc = pred._pred_cross_cov(pc, cv_ix=ix)
        jc = pred._joint_cov(cv_ix=ix)
        data_values = [f.values_main.copy() for f in mf.fields]
        held = data_values[0][ix]
        data_values[0] = np.delete(data_values[0], ix)
        stacked = np.hstack(data_values)
        w = cho_solve(cho_factor(jc, lower=True), pcc.copy()).T
        p_hat = float((w @ stacked)[0])
        p_var = float(pcov[0, 0] - (w @ pcc)[0, 0])
        p_err = float(np.sqrt(max(p_var, 0.0)))
        zs.append((held - p_hat) / p_err)
    zs = np.asarray(zs)
    return {
        "ref_wls_flat": [round(float(v), 4) for v in ref_wls_flat],
        "ref_wls_cost": round(ref_wls_cost, 2),
        "ref_loocv_coverage_95": round(float((np.abs(zs) < 1.96).mean()), 3),
        "ref_loocv_z_std": round(float(zs.std(ddof=1)), 3),
    }


def run_repo(mod, mf):
    from cokriging_tpu.cov import MaternParams
    from cokriging_tpu.cov.params import ParamSpec
    from cokriging_tpu.estimate import VarioConfig, empirical_variograms
    from cokriging_tpu.estimate.wls import fit_wls
    from cokriging_tpu.predict import JointPredictor

    spec = ParamSpec(
        2,
        sigma_bounds=(0.1, 3.0),
        len_scale_bounds=(0.02, 1.0),
        nugget_bounds=(0.0, 0.5),
    )
    init = MaternParams.from_flat(np.array(INIT), spec=spec)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        est = empirical_variograms(
            mf, VarioConfig(max_dist=1.0, n_bins=12, geodesic=False)
        )
        p_wls, res = fit_wls(est, init=init)
        cv = JointPredictor(mod, mf).cross_validation(0, postprocess=False)
    z = (
        (cv["residual"] / cv["pred_err"])
        .replace([np.inf, -np.inf], np.nan)
        .dropna()
    )
    return {
        "repo_wls_flat": [
            round(float(v), 4) for v in np.asarray(p_wls.to_flat())
        ],
        "repo_wls_cost": round(float(res.cost), 2),
        "repo_loocv_coverage_95": round(float((np.abs(z) < 1.96).mean()), 3),
        "repo_loocv_z_std": round(float(z.std()), 3),
    }


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    mod, mf = _simulate_repo_data()
    coords = [np.asarray(f.coords, float) for f in mf.fields]
    values = [np.asarray(f.values, float) for f in mf.fields]

    repo = run_repo(mod, mf)
    ref = run_reference(coords, values)

    out = {"truth_flat": TRUTH, **repo, **ref}
    names = [
        "sigma_1", "sigma_2", "nu_11", "nu_12", "nu_22",
        "ls_11", "ls_12", "ls_22", "nug_1", "nug_2", "rho",
    ]
    print(f"{'param':>8} {'truth':>8} {'repo WLS':>9} {'ref WLS':>9}")
    for k, n in enumerate(names):
        print(
            f"{n:>8} {TRUTH[k]:>8.3f} "
            f"{out['repo_wls_flat'][k]:>9.3f} {out['ref_wls_flat'][k]:>9.3f}"
        )
    print(
        f"LOOCV coverage@95: repo {out['repo_loocv_coverage_95']}"
        f" ref {out['ref_loocv_coverage_95']};"
        f" z_std repo {out['repo_loocv_z_std']} ref {out['ref_loocv_z_std']}"
    )
    from cokriging_tpu.utils.results import record_manifest

    record_manifest("ref_parity_sim", out)


if __name__ == "__main__":
    main()
