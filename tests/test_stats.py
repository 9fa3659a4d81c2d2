"""Space-time stats vs numpy/np.ma oracles (reference src/stat_tools.py)."""

import numpy as np
import pytest

from cokriging_tpu.stats import (
    simple_linear_regression,
    detrend,
    count_valid,
    xcor_1d,
    xcor_nd,
    optim_lag_nd,
    get_stats,
    get_stats_df,
)


def _oracle_slr(x):
    """sklearn-style masked linear trend (src/stat_tools.py:31-53)."""
    out = np.array(x, float, copy=True)
    good = ~np.isnan(x)
    if good.sum() == 0:
        return out
    t = np.arange(len(x))[good]
    b, a = np.polyfit(t, x[good], 1)
    out[good] = a + b * t
    return out


def _oracle_xcor(v1, v2, lag=0):
    x = np.ma.array(v1, mask=np.isnan(v1))
    y = np.ma.array(v2, mask=np.isnan(v2))
    x = x - x.mean()
    y = y - y.mean()
    if lag != 0:
        x = x[lag:]
        y = y[:-lag]
    xcor = np.sum(x * y) / (np.sqrt(np.sum(x * x)) * np.sqrt(np.sum(y * y)))
    return float(np.ma.filled(xcor.astype(float), np.nan))


def test_slr_matches_oracle(rng):
    x = rng.normal(size=40) + 0.3 * np.arange(40)
    x[[3, 7, 20]] = np.nan
    np.testing.assert_allclose(
        simple_linear_regression(x), _oracle_slr(x), rtol=1e-10, equal_nan=True
    )


def test_detrend_removes_trend(rng):
    x = 2.0 + 0.5 * np.arange(30) + rng.normal(scale=0.1, size=30)
    resid, slope = detrend(x)
    assert abs(float(slope) - 0.5) < 0.05
    assert abs(np.nanmean(np.asarray(resid))) < 1e-10


def test_detrend_all_nan():
    x = np.full(10, np.nan)
    resid, slope = detrend(x)
    assert np.isnan(np.asarray(resid)).all()


def test_xcor_matches_ma_oracle(rng):
    v1 = rng.normal(size=60)
    v2 = 0.7 * v1 + rng.normal(scale=0.5, size=60)
    v1[[5, 12]] = np.nan
    v2[[12, 30]] = np.nan
    for lag in [0, 1, 3]:
        got = xcor_1d(v1, v2, lag=lag)
        ref = _oracle_xcor(v1, v2, lag=lag)
        np.testing.assert_allclose(got, ref, rtol=1e-9)


def test_xcor_tau_threshold(rng):
    v1 = rng.normal(size=10)
    v2 = rng.normal(size=10)
    v1[:8] = np.nan
    assert np.isnan(xcor_1d(v1, v2, tau=5))


def test_xcor_nd_batches(rng):
    Z1 = rng.normal(size=(4, 5, 50))
    Z2 = 0.5 * Z1 + rng.normal(scale=0.7, size=(4, 5, 50))
    got = xcor_nd(Z1, Z2, lag=2)
    assert got.shape == (4, 5)
    ref = _oracle_xcor(Z1[1, 3], Z2[1, 3], lag=2)
    np.testing.assert_allclose(got[1, 3], ref, rtol=1e-9)


def test_optim_lag_finds_shift(rng):
    t = np.arange(120)
    base = np.sin(2 * np.pi * t / 24.0)
    true_lag = 4
    cells = []
    for _ in range(6):
        z1 = base + rng.normal(scale=0.05, size=120)
        z2 = np.roll(base, -true_lag) + rng.normal(scale=0.05, size=120)
        cells.append((z1, z2))
    Z1 = np.stack([c[0] for c in cells])
    Z2 = np.stack([c[1] for c in cells])
    out = optim_lag_nd(Z1, Z2, (0, 10))
    assert out["optim_lag"].shape == (6,)
    assert (out["optim_lag"] == true_lag).mean() > 0.8
    assert np.nanmin(np.abs(out["xcor"])) > 0.8


def test_get_stats_and_df(rng):
    Z = {"sif": rng.normal(size=(3, 3, 24)), "xco2": rng.normal(size=(3, 3, 24))}
    stats = get_stats(Z)
    assert stats["sif_count"].shape == (3, 3)
    assert (stats["sif_count"] == 24).all()

    import pandas as pd

    df = pd.DataFrame(
        {"sif": rng.normal(size=36), "xco2": rng.normal(size=36)}
    )
    out = get_stats_df(df, lags=[0, 1])
    assert {"sif_count", "xco2_slope", "xcor_lag0", "xcor_lag1"} <= set(out.columns)


# --- lagged cross-covariance (research/analysis_sif_xco2_crosscov.ipynb) ---


def _oracle_xcov_nd(Z1, Z2, lag):
    """Literal np.ma transcription of the notebook's compute_xcov_nd."""
    Z1_m = np.ma.array(Z1, mask=np.isnan(Z1))
    Z2_m = np.ma.array(Z2, mask=np.isnan(Z2))
    X = (Z1_m - Z1_m.mean(axis=-1, keepdims=True))[..., lag:]
    Y = (Z2_m - Z2_m.mean(axis=-1, keepdims=True))[..., :-lag]
    xcov = np.mean(X * Y, axis=-1)
    return np.ma.filled(xcov.astype(float), np.nan)


def test_xcov_nd_matches_notebook_oracle(rng):
    from cokriging_tpu.stats import xcov_nd

    Z1 = rng.normal(size=(4, 5, 60))
    Z2 = 0.4 * Z1 + rng.normal(scale=0.8, size=(4, 5, 60))
    Z1[rng.random(Z1.shape) < 0.15] = np.nan
    Z2[rng.random(Z2.shape) < 0.15] = np.nan
    got = xcov_nd(Z1, Z2, lag=3)
    ref = _oracle_xcov_nd(Z1, Z2, lag=3)
    np.testing.assert_allclose(got, ref, rtol=1e-9, atol=1e-12, equal_nan=True)


def test_xcov_1d_matches_notebook_oracle(rng):
    from cokriging_tpu.stats import xcov_1d

    v1 = rng.normal(size=80)
    v2 = rng.normal(size=80)
    got = xcov_1d(v1, v2, lag=5)
    # notebook compute_xcov_1d (no NaNs -> nanmean == mean)
    x = (v1 - np.nanmean(v1))[5:]
    y = (v2 - np.nanmean(v2))[:-5]
    np.testing.assert_allclose(got, np.nanmean(x * y), rtol=1e-9)


def test_optim_lag_1d_recovers_shift(rng):
    from cokriging_tpu.stats import optim_lag_1d

    t = np.arange(400)
    base = np.sin(2 * np.pi * t / 80.0)
    true_lag = 12
    v1 = base + rng.normal(scale=0.05, size=400)
    v2 = np.roll(base, -true_lag) + rng.normal(scale=0.05, size=400)
    out = optim_lag_1d(v1, v2, (0, 30))
    assert out["optim_lag"] == true_lag
    assert abs(out["xcor"]) > 0.9
