"""Regional/banded aggregation drivers for the lagged-xcov EDA suite
(reference notebooks/transcom_monthly_xcov.ipynb, hemisphere_monthly.ipynb,
5degree_monthly_xcov.ipynb)."""

import numpy as np
import pandas as pd
import pytest

from cokriging_tpu.stats import (
    gridded_stats,
    hemisphere_labels,
    lat_band_labels,
    map_transcom,
    regional_monthly,
    regional_stats,
    stats_to_grid,
    to_cubes,
)


@pytest.fixture()
def monthly_frame():
    """Two-cell frame: XCO2 anomaly = -SIF anomaly lagged 2 months in the
    north cell, 1 month in the south cell."""
    rng = np.random.default_rng(3)
    T = 48
    times = pd.date_range("2016-01-01", periods=T, freq="MS")
    rows = []
    for lat, lon, lag in [(42.5, -102.5, 2), (-37.5, 147.5, 1)]:
        anom = rng.normal(size=T)
        for t in range(1, T):
            anom[t] = 0.5 * anom[t - 1] + anom[t]
        sif = 0.7 + 0.3 * anom
        xco2 = np.full(T, 405.0)
        xco2[lag:] = 405.0 - 0.9 * anom[:-lag]
        rows.append(
            pd.DataFrame(
                {"time": times, "lat": lat, "lon": lon, "sif": sif,
                 "xco2": xco2}
            )
        )
    return pd.concat(rows, ignore_index=True)


def test_to_cubes_round_trip(monthly_frame):
    cubes, lats, lons, times = to_cubes(monthly_frame, ("sif", "xco2"))
    assert cubes["sif"].shape == (2, 2, 48)
    assert list(lats) == [-37.5, 42.5] and list(lons) == [-102.5, 147.5]
    # each cell's series lands in its (lat, lon) slot; the off-diagonal
    # combinations were never observed
    north = monthly_frame[monthly_frame.lat > 0]
    np.testing.assert_allclose(cubes["sif"][1, 0], north["sif"].values)
    assert np.isnan(cubes["sif"][1, 1]).all()
    assert np.isnan(cubes["sif"][0, 0]).all()


def test_gridded_stats_detects_cell_lags(monthly_frame):
    maps, lats, lons = gridded_stats(
        monthly_frame, ("sif", "xco2"), lags=(1, 2), tau=30
    )
    assert maps["sif_count"][1, 0] == 48
    # north cell (lat 42.5, lon -102.5): lag-2 coupling dominates
    assert maps["xcor_lag2"][1, 0] < -0.8
    assert abs(maps["xcor_lag2"][1, 0]) > abs(maps["xcor_lag1"][1, 0])
    # south cell: lag-1 coupling dominates
    assert maps["xcor_lag1"][0, 1] < -0.8
    assert abs(maps["xcor_lag1"][0, 1]) > abs(maps["xcor_lag2"][0, 1])
    # unobserved cells respect the tau threshold
    assert np.isnan(maps["xcor_lag1"][0, 0])


def test_hemisphere_and_band_labels(monthly_frame):
    hemi = hemisphere_labels(monthly_frame)
    assert set(hemi.unique()) == {"north", "south"}
    assert (hemi[monthly_frame.lat > 0] == "north").all()
    band = lat_band_labels(monthly_frame, width=30.0)
    assert set(band.unique()) == {45.0, -45.0}


def test_regional_monthly_and_stats(monthly_frame):
    df_m = regional_monthly(monthly_frame, hemisphere_labels(monthly_frame))
    assert set(df_m.columns) == {"hemisphere", "time", "sif", "xco2"}
    assert len(df_m) == 96
    stats = regional_stats(df_m, "hemisphere", lags=(1, 2))
    stats = stats.set_index("hemisphere")
    assert stats.loc["north", "xcor_lag2"] < -0.8
    assert stats.loc["south", "xcor_lag1"] < -0.8
    assert stats.loc["north", "sif_count"] == 48


def test_map_transcom_and_stats_to_grid(monthly_frame):
    # 1-degree region map: region 1 south of the equator, region 2 north
    lon = np.arange(-179.5, 180.0, 1.0)
    lat = np.arange(-89.5, 90.0, 1.0)
    lon_g, lat_g = np.meshgrid(lon, lat)
    df_tc = pd.DataFrame(
        {
            "lon": lon_g.ravel(),
            "lat": lat_g.ravel(),
            "region": np.where(lat_g.ravel() < 0, 1.0, 2.0),
        }
    )
    tagged = map_transcom(monthly_frame, df_tc)
    assert "region" in tagged.columns and "lat" not in tagged.columns
    assert len(tagged) == len(monthly_frame)
    north_rows = monthly_frame.lat > 0
    assert (tagged.loc[np.where(north_rows)[0], "region"] == 2.0).all()

    df_m = regional_monthly(tagged, "region")
    stats = regional_stats(df_m, "region", lags=(1, 2)).set_index("region")
    assert stats.loc[2.0, "xcor_lag2"] < -0.8  # north cell, lag 2
    assert stats.loc[1.0, "xcor_lag1"] < -0.8  # south cell, lag 1

    cells = stats_to_grid(stats.reset_index(), df_tc)
    assert {"lat", "lon", "region", "xcor_lag1"} <= set(cells.columns)
    assert len(cells) == len(df_tc)
