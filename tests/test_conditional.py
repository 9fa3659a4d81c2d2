"""Conditional (posterior) simulation from the joint cokriging system.

The posterior sampled by ``JointPredictor.sample`` must be the same
distribution whose mean/diagonal the predictor already reports: sample
moments converge to (pred, pred_err), realizations honor the data exactly
in the zero-nugget/zero-noise limit, and prediction errors are spatially
correlated across realizations (the information pointwise ``pred_err``
cannot carry — the reason conditional simulation exists).
"""

import numpy as np
import pytest

from cokriging_tpu.cov import MaternParams, MultivariateMatern
from cokriging_tpu.predict import JointPredictor
from cokriging_tpu.sim import BivariateRandomField, CartesianGrid

SIM_FLAT = [1.0, 1.0, 1.5, 1.5, 1.5, 0.2, 0.2, 0.2, 0.0, 0.0, -0.6]


@pytest.fixture(scope="module")
def setup():
    mod = MultivariateMatern(params=MaternParams.from_flat(np.array(SIM_FLAT)))
    grid = CartesianGrid(xcount=25, ycount=25)
    rf = BivariateRandomField(mod, grid, seed=3)
    samples = rf.sample(size=80, epsilon=[0.0, 0.0], seed=5)
    mf = rf.to_fields(samples)
    return mod, grid, rf, samples, mf


def _heldout(grid, samples, step):
    taken = {
        (round(x, 12), round(y, 12))
        for s in samples
        for x, y in s[["x", "y"]].values
    }
    pts = grid.coords.values[::step]
    keep = [(round(x, 12), round(y, 12)) not in taken for x, y in pts]
    return pts[np.array(keep)]


def test_sample_moments_match_prediction(setup):
    mod, grid, rf, samples, mf = setup
    pcoords = _heldout(grid, samples, 17)
    jp = JointPredictor(mod, mf)
    df = jp(0, pcoords, postprocess=False)
    df_s, draws = jp.sample(0, pcoords, n_samples=4000, seed=1, postprocess=False)
    assert draws.shape == (4000, len(df))
    np.testing.assert_allclose(df_s["pred"], df["pred"], rtol=1e-8)
    np.testing.assert_allclose(df_s["pred_err"], df["pred_err"], rtol=1e-8)
    # Monte-Carlo moments -> posterior moments
    se_mean = df["pred_err"].values / np.sqrt(4000)
    assert np.all(np.abs(draws.mean(axis=0) - df["pred"].values) < 5 * se_mean)
    np.testing.assert_allclose(
        draws.std(axis=0), df["pred_err"].values, rtol=0.12
    )


def test_samples_interpolate_data_in_noise_free_limit(setup):
    # nugget = 0 and epsilon = 0: the posterior at a data location is a
    # point mass on the datum, so every realization passes through the data
    mod, grid, rf, samples, mf = setup
    data_coords = np.asarray(mf.fields[0].coords_main)[:20]
    data_vals = np.asarray(mf.fields[0].values_main)[:20]
    _, draws = JointPredictor(mod, mf).sample(
        0, data_coords, n_samples=50, seed=2, postprocess=False
    )
    assert np.max(np.abs(draws - data_vals[None, :])) < 1e-4


def test_prediction_errors_are_spatially_correlated(setup):
    mod, grid, rf, samples, mf = setup
    # two adjacent held-out locations: their posterior errors co-move
    pts = _heldout(grid, samples, 1)
    pair = pts[10:12]
    assert np.linalg.norm(pair[0] - pair[1]) < 0.1
    _, draws = JointPredictor(mod, mf).sample(
        0, pair, n_samples=3000, seed=4, postprocess=False
    )
    r = np.corrcoef(draws[:, 0], draws[:, 1])[0, 1]
    assert r > 0.5


def test_postprocessed_samples_align_with_frame(setup):
    mod, grid, rf, samples, mf = setup
    pcoords = _heldout(grid, samples, 23)
    jp = JointPredictor(mod, mf)
    out, draws = jp.sample(0, pcoords, n_samples=2000, seed=6, postprocess=True)
    assert draws.shape == (2000, len(out))
    se_mean = out["pred_err"].values / np.sqrt(2000)
    assert np.all(np.abs(draws.mean(axis=0) - out["pred"].values) < 5 * se_mean)
    # back-transform is affine: sample spread scales by scale_fact exactly
    _, draws_std = jp.sample(0, pcoords, n_samples=2000, seed=6, postprocess=False)
    trend = mf.fields[0].trend
    if trend is not None:
        np.testing.assert_allclose(
            draws.std(axis=0),
            draws_std.std(axis=0) * trend.scale_fact,
            rtol=1e-6,
        )
