"""End-to-end simulation experiment: simulate a bivariate cofield from known
parameters, predict with the true model, and validate calibration — the
reference's de-facto integration test (research/simulation_experiment.ipynb)."""

import numpy as np
import pytest

from cokriging_tpu.cov import MaternParams, MultivariateMatern
from cokriging_tpu.sim import CartesianGrid, BivariateRandomField
from cokriging_tpu.predict import JointPredictor, LocalPredictor

# research/simulation_experiment.ipynb cell 3 truth values
SIM_FLAT = [1.0, 1.0, 1.5, 1.5, 1.5, 0.2, 0.2, 0.2, 0.0, 0.0, -0.6]
EPS = 0.1  # sqrt of the notebook's epsilon^2 = 0.01


@pytest.fixture(scope="module")
def experiment():
    mod = MultivariateMatern(params=MaternParams.from_flat(np.array(SIM_FLAT)))
    grid = CartesianGrid(xcount=31, ycount=31)
    rf = BivariateRandomField(mod, grid, seed=7)
    samples = rf.sample(size=120, epsilon=[EPS, EPS], seed=11)
    mf = rf.to_fields(samples)
    return mod, grid, rf, samples, mf


def test_simulated_field_statistics(experiment):
    _, grid, rf, _, _ = experiment
    v0 = rf.fields[0]["value"].values
    v1 = rf.fields[1]["value"].values
    assert v0.shape == (grid.count,)
    # marginal variance ~ sigma^2 + nugget = 1.2 (loose: spatially correlated)
    assert 0.3 < v0.var() < 3.0
    # strongly negatively correlated fields (rho = -0.6)
    r = np.corrcoef(v0, v1)[0, 1]
    assert r < -0.3


def _heldout_coords(grid, samples, step):
    """Prediction locations disjoint from every sample location (at a data
    location with zero nugget the predictor interpolates exactly and
    pred_err -> 0, as in the reference at data locations)."""
    taken = {
        (round(x, 12), round(y, 12))
        for s in samples
        for x, y in s[["x", "y"]].values
    }
    pts = grid.coords.values[::step]
    keep = [
        (round(x, 12), round(y, 12)) not in taken for x, y in pts
    ]
    return pts[np.array(keep)]


def test_joint_prediction_beats_prior_and_is_calibrated(experiment):
    mod, grid, rf, samples, mf = experiment
    pcoords = _heldout_coords(grid, samples, 7)
    df = JointPredictor(mod, mf)(0, pcoords, postprocess=False)
    truth = rf.truth_at(0, pcoords)
    resid = truth - df["pred"].values
    mspe = np.mean(resid**2)
    prior_var = 1.0 + 0.0  # sigma^2 + nugget
    assert mspe < 0.6 * prior_var  # conditioning must beat the prior
    # calibration: standardized residuals ~ N(0,1)
    zscores = resid / df["pred_err"].values
    assert abs(np.mean(zscores)) < 0.25
    assert 0.7 < np.std(zscores) < 1.3
    cover = np.mean(np.abs(zscores) < 1.96)
    assert cover > 0.85


def test_joint_loocv_fast_equals_naive(experiment):
    mod, _, _, _, mf = experiment
    pred = JointPredictor(mod, mf)
    fast = pred.cross_validation(0, postprocess=False, method="fast")
    naive = pred.cross_validation(0, postprocess=False, method="naive")
    np.testing.assert_allclose(
        fast["pred"].values, naive["pred"].values, rtol=1e-8, atol=1e-10
    )
    np.testing.assert_allclose(
        fast["pred_err"].values, naive["pred_err"].values, rtol=1e-8, atol=1e-10
    )


def test_local_approaches_joint_with_large_radius(experiment):
    mod, grid, rf, samples, mf = experiment
    pcoords = grid.coords.values[::11]
    joint = JointPredictor(mod, mf)(0, pcoords, postprocess=False)
    local = LocalPredictor(mod, mf)(0, pcoords, max_dist=10.0, postprocess=False)
    # radius covers the whole unit square -> identical systems
    np.testing.assert_allclose(
        local["pred"].values, joint["pred"].values, rtol=1e-7, atol=1e-10
    )
    # err atol is looser: sqrt amplifies rounding near the exact-interpolation
    # zero-variance points
    np.testing.assert_allclose(
        local["pred_err"].values, joint["pred_err"].values, rtol=1e-6, atol=1e-7
    )


def test_local_small_radius_sane(experiment):
    mod, grid, rf, samples, mf = experiment
    pcoords = _heldout_coords(grid, samples, 11)
    local = LocalPredictor(mod, mf)(0, pcoords, max_dist=0.4, postprocess=False)
    truth = rf.truth_at(0, pcoords)
    resid = truth - local["pred"].values
    assert np.mean(resid**2) < 0.6
    zs = resid / local["pred_err"].values
    assert 0.6 < np.std(zs) < 1.4


def test_local_cv_excludes_self(experiment):
    mod, _, _, _, mf = experiment
    lp = LocalPredictor(mod, mf)
    cv = lp.cross_validation(0, max_dist=0.5, postprocess=False)
    # with the self-datum withheld, residuals must not all collapse to ~0
    assert np.nanstd(cv["residual"].values) > 0.05
    assert np.isfinite(cv["pred"].values).all()


def test_cokriging_beats_univariate_kriging(experiment):
    """Error-ratio check (research/simulation_experiment.ipynb cells 20-21):
    with rho = -0.6, using both processes must shrink prediction variance."""
    mod, grid, rf, samples, mf = experiment
    pcoords = _heldout_coords(grid, samples, 13)
    biv = JointPredictor(mod, mf)(0, pcoords, postprocess=False)
    mf_uni = rf.to_fields(samples, i=0)
    mod_uni = MultivariateMatern(
        n_procs=1,
        params=_marginal_params(SIM_FLAT),
    )
    uni = JointPredictor(mod_uni, mf_uni)(0, pcoords, postprocess=False)
    ratio = biv["pred_err"].values / uni["pred_err"].values
    assert np.nanmean(ratio) < 1.0
    assert np.nanmax(ratio) < 1.05


def _marginal_params(flat):
    from cokriging_tpu.cov.params import ParamSpec
    import jax.numpy as jnp

    spec = ParamSpec(n_procs=1)
    # sigma_11, nu_11, len_scale_11, nugget_11 (no rho for p=1)
    return MaternParams.from_flat(
        jnp.array([flat[0], flat[2], flat[5], flat[8]]), spec=spec
    )
