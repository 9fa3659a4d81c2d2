"""Field/MultiField trend-removal pipeline vs a hand-rolled numpy/sklearn
oracle (reference semantics: src/fields.py:283-375)."""

import numpy as np
import pandas as pd
import pytest

from cokriging_tpu.fields import Field, MultiField
from cokriging_tpu.fields.field import apply_timedelta
from cokriging_tpu.predict.postprocess import (
    postprocess_predictions,
    inverse_transform_data,
)


@pytest.fixture
def monthly_frame(rng):
    """Three months x 40 cells with a known temporal trend and a linear
    spatial trend in the covariates."""
    lat = rng.uniform(25, 50, 40)
    lon = rng.uniform(-120, -70, 40)
    evi = rng.uniform(0.1, 0.6, 40)
    rows = []
    for k, t in enumerate(pd.date_range("2019-01-01", periods=3, freq="MS")):
        vals = (
            0.7 * k  # temporal trend in the spatial mean
            + 1.5 * evi  # spatial trend on the covariate
            + rng.normal(scale=0.2, size=40)
        )
        rows.append(
            pd.DataFrame(
                {
                    "time": t,
                    "lat": lat,
                    "lon": lon,
                    "z": vals,
                    "z_var": 0.01,
                    "evi": evi,
                }
            )
        )
    return pd.concat(rows, ignore_index=True)


def _oracle_field(df, timestamp):
    """Reference pipeline by hand with sklearn."""
    from sklearn.linear_model import LinearRegression

    df = df.copy()
    mean_series = df.groupby("time")["z"].mean()
    t_idx = np.arange(len(mean_series)).reshape(-1, 1)
    lr_t = LinearRegression().fit(t_idx, mean_series.values)
    trend = pd.Series(lr_t.predict(t_idx), index=mean_series.index)
    df["z"] = df["z"] - df["time"].map(trend)

    sel = df[df["time"] == pd.Timestamp(timestamp)].reset_index(drop=True)
    covs = sel[["evi"]].values
    means = covs.mean(axis=0)
    scales = covs.std(axis=0, ddof=1)
    z = (covs - means) / scales
    lr_s = LinearRegression().fit(z, sel["z"].values)
    fitted = lr_s.predict(z)
    resid = sel["z"].values - fitted
    mu, sd = np.nanmean(resid), np.nanstd(resid)
    return (resid - mu) / sd, float(trend.loc[pd.Timestamp(timestamp)]), mu, sd, fitted


def test_field_matches_oracle(monthly_frame):
    ts = "2019-02-01"
    f = Field.from_dataframe(monthly_frame, "z", ["evi"], ts)
    std_oracle, t_trend, mu, sd, fitted = _oracle_field(monthly_frame, ts)
    np.testing.assert_allclose(np.asarray(f.values), std_oracle, rtol=1e-9)
    np.testing.assert_allclose(f.trend.temporal_trend, t_trend, rtol=1e-9)
    np.testing.assert_allclose(f.trend.spatial_mean, mu, atol=1e-9)
    np.testing.assert_allclose(f.trend.scale_fact, sd, rtol=1e-9)
    np.testing.assert_allclose(np.asarray(f.spatial_trend), fitted, rtol=1e-8)
    # standardized residuals: mean 0, std 1
    v = np.asarray(f.values)
    assert abs(v.mean()) < 1e-10 and abs(v.std() - 1) < 1e-10


def test_inverse_transform_reconstructs_data(monthly_frame):
    ts = "2019-02-01"
    f = Field.from_dataframe(monthly_frame, "z", ["evi"], ts)
    # map standardized values back through the stored stats
    recon = inverse_transform_data(f)
    orig = (
        monthly_frame[monthly_frame.time == ts]
        .dropna(subset=["z"])["z"]
        .values
    )
    np.testing.assert_allclose(recon, orig, rtol=1e-8)


def test_postprocess_at_data_locations(monthly_frame):
    """postprocess(pred=values) must reproduce the original data when the
    prediction frame carries the fitting covariates."""
    ts = "2019-02-01"
    f = Field.from_dataframe(monthly_frame, "z", ["evi"], ts)
    sel = monthly_frame[monthly_frame.time == ts].reset_index(drop=True)
    df_pred = pd.DataFrame(
        {
            "lat": sel["lat"],
            "lon": sel["lon"],
            "pred": np.asarray(f.values),
            "pred_err": 0.5,
        }
    )
    covariates = sel[["lat", "lon", "evi"]]
    out = postprocess_predictions(df_pred, f, covariates)
    np.testing.assert_allclose(out["pred"].values, sel["z"].values, rtol=1e-8)
    np.testing.assert_allclose(
        out["pred_err"].values, 0.5 * f.trend.scale_fact, rtol=1e-12
    )


def test_multifield_timedeltas(monthly_frame, rng):
    df2 = monthly_frame.rename(columns={"z": "w", "z_var": "w_var"})
    mf = MultiField.from_dataframes(
        [monthly_frame, df2],
        ["z", "w"],
        [["evi"], ["evi"]],
        timestamp="2019-02-01",
        timedeltas=[0, -1],
    )
    assert mf.fields[0].timestamp == "2019-02-01"
    assert mf.fields[1].timestamp == "2019-01-01"  # lagged one month back
    assert apply_timedelta("2019-01-01", 1) == "2019-02-01"
    assert apply_timedelta("2019-03-31", -1) == "2019-02-28"
    assert mf.n_data == mf.fields[0].size + mf.fields[1].size


def test_field_missing_timestamp_raises(monthly_frame):
    with pytest.raises(ValueError, match="No data at timestamp"):
        Field.from_dataframe(monthly_frame, "z", ["evi"], "2030-01-01")


def test_local_predictor_no_data_in_radius(rng):
    """No data within max_dist -> NaN + warning
    (src/point_prediction.py:229-233 semantics)."""
    import warnings

    from cokriging_tpu.cov import MaternParams, MultivariateMatern
    from cokriging_tpu.cov.params import ParamSpec
    from cokriging_tpu.predict import LocalPredictor

    c = rng.uniform(0, 0.1, size=(20, 2))
    f = Field.from_arrays(c, rng.normal(size=20))
    mf = MultiField(fields=[f])
    spec1 = ParamSpec(n_procs=1)
    mod = MultivariateMatern(
        1, MaternParams.from_flat(np.array([1.0, 1.5, 0.05, 0.0]), spec=spec1)
    )
    lp = LocalPredictor(mod, mf)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = lp(0, np.array([[5.0, 5.0]]), max_dist=0.2, postprocess=False)
    assert np.isnan(out["pred"].iloc[0])
    assert any("No data within maximum distance" in str(x.message) for x in w)
