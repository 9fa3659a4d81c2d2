"""Smoke tests: figures render, params round-trip (plot/ + utils/io)."""

import matplotlib

matplotlib.use("Agg")

import numpy as np
import pandas as pd
import pytest

from cokriging_tpu.cov import MaternParams, MultivariateMatern
from cokriging_tpu.cov.params import ParamSpec
from cokriging_tpu.utils.io import save_params, load_params, save_table, load_table


SIM_FLAT = [1.0, 1.0, 1.5, 1.5, 1.5, 0.2, 0.2, 0.2, 0.0, 0.0, -0.6]


def test_params_roundtrip(tmp_path):
    spec = ParamSpec(n_procs=2, len_scale_bounds=(0.02, 1.0))
    p = MaternParams.from_flat(np.array(SIM_FLAT), spec=spec)
    f = tmp_path / "params.npz"
    save_params(f, p, metadata={"timestamp": "2019-07-01"})
    q = load_params(f)
    np.testing.assert_allclose(np.asarray(q.to_flat()), SIM_FLAT)
    assert q.spec.len_scale_bounds == (0.02, 1.0)


def test_table_roundtrip(tmp_path):
    df = pd.DataFrame({"lat": [1.0, 2.0], "lon": [3.0, 4.0], "v": [5.0, 6.0]})
    f = tmp_path / "stage.parquet"
    save_table(f, df)
    out = load_table(f)
    pd.testing.assert_frame_equal(out, df)


@pytest.fixture(scope="module")
def sim_setup():
    from cokriging_tpu.sim import CartesianGrid, BivariateRandomField

    mod = MultivariateMatern(params=MaternParams.from_flat(np.array(SIM_FLAT)))
    grid = CartesianGrid(xcount=15, ycount=15)
    rf = BivariateRandomField(mod, grid, seed=0)
    samples = rf.sample(size=40, epsilon=[0.1, 0.1], seed=1)
    mf = rf.to_fields(samples)
    return mod, grid, rf, samples, mf


def test_figures_render(sim_setup):
    import warnings

    from cokriging_tpu.estimate import VarioConfig, empirical_variograms
    from cokriging_tpu.estimate.wls import fit_wls
    from cokriging_tpu.predict import JointPredictor
    from cokriging_tpu.plot import (
        plot_df,
        plot_fields,
        plot_variograms,
        plot_samples,
        plot_sim_pred,
        plot_err_ratio,
        plot_cv_resid,
        qq_plots,
    )

    mod, grid, rf, samples, mf = sim_setup
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        est = empirical_variograms(mf, VarioConfig(1.0, 6, geodesic=False))
        spec = ParamSpec(2, len_scale_bounds=(0.02, 1.0), nugget_bounds=(0.0, 0.5))
        init = MaternParams.from_flat(
            np.array([1, 1, 1.5, 1.5, 1.5, 0.1, 0.1, 0.1, 0.01, 0.01, 0.0]), spec=spec
        )
        params, result = fit_wls(est, init=init)

        assert plot_fields(mf) is not None
        assert plot_variograms(result, names=["Z0", "Z1"]) is not None
        assert plot_samples(samples) is not None
        assert qq_plots(mf) is not None

        pred = JointPredictor(mod, mf)(0, grid.coords.values[::5], postprocess=False)
        assert plot_sim_pred(rf, pred) is not None

        mf_uni = rf.to_fields(samples, i=0)
        spec1 = ParamSpec(n_procs=1)
        mod_uni = MultivariateMatern(
            1, MaternParams.from_flat(np.array([1.0, 1.5, 0.2, 0.0]), spec=spec1)
        )
        pred_uni = JointPredictor(mod_uni, mf_uni)(
            0, grid.coords.values[::5], postprocess=False
        )
        assert plot_err_ratio(pred, pred_uni) is not None

        cv = JointPredictor(mod, mf).cross_validation(0, postprocess=False)
        assert plot_cv_resid(cv, "Z0") is not None

    lat = np.random.default_rng(0).uniform(25, 50, 50)
    lon = np.random.default_rng(1).uniform(-120, -70, 50)
    df = pd.DataFrame({"lat": lat, "lon": lon, "v": lat + lon})
    assert plot_df(df, "v") is not None


def test_animate_monthly(tmp_path):
    """GIF animation of a gridded monthly field: one frame per month,
    fixed color scale (notebooks/1degree_monthly_animations[.variance])."""
    from PIL import Image

    from cokriging_tpu.plot import animate_monthly

    rng = np.random.default_rng(0)
    times = pd.date_range("2015-01-01", periods=4, freq="MS")
    lat, lon = np.meshgrid(np.arange(25.0, 50, 5), np.arange(-120.0, -70, 5))
    rows = []
    for t in times:
        rows.append(
            pd.DataFrame(
                {
                    "time": t,
                    "lat": lat.ravel(),
                    "lon": lon.ravel(),
                    "sif": rng.normal(size=lat.size),
                }
            )
        )
    df = pd.concat(rows, ignore_index=True)
    out = tmp_path / "anim.gif"
    anim = animate_monthly(df, "sif", out_path=str(out), vcenter=0.0, fps=4)
    assert anim is not None and out.exists()
    with Image.open(out) as im:
        assert im.n_frames == 4

    with pytest.raises(ValueError):
        animate_monthly(df.iloc[:0], "sif")
