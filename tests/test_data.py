"""Gridding / land-mask / augmentation semantics (reference
src/data_utils.py:122-341)."""

import warnings

import numpy as np
import pandas as pd
import pytest

from cokriging_tpu.data.grids import (
    GridConfig,
    SpatialGrid,
    regrid,
    land_grid,
    monthly_avg,
    prep_gridded_df,
    augment_dataset,
    set_main_coords,
    main_coords_array,
    prediction_coords,
    CONUS_EXTENTS,
)
from cokriging_tpu.data.landmask import land_mask_fn
from cokriging_tpu.data.readers import prep_sif, prep_xco2


def test_grid_bins_and_centers():
    g = SpatialGrid(GridConfig(CONUS_EXTENTS, lon_res=5, lat_res=4))
    # centers span the extents exactly (bounds padded by half a cell)
    assert g.lon_centers[0] == -125.0 and g.lon_centers[-1] == -65.0
    assert g.lat_centers[0] == 22.0 and g.lat_centers[-1] == 58.0
    assert len(g.lon_centers) == 13 and len(g.lat_centers) == 10


def test_offset_grid_shifts_centers():
    g0 = SpatialGrid(GridConfig(CONUS_EXTENTS, lon_res=5, lat_res=4))
    g1 = SpatialGrid(
        GridConfig(CONUS_EXTENTS, lon_res=5, lat_res=4, lat_offset=0.5)
    )
    np.testing.assert_allclose(g1.lat_centers, g0.lat_centers + 0.5)


def test_regrid_assigns_cell_centers():
    df = pd.DataFrame({"lon": [-104.9, -97.2], "lat": [39.7, 36.1], "v": [1.0, 2.0]})
    out = regrid(df, GridConfig(CONUS_EXTENTS, lon_res=5, lat_res=4))
    assert set(out["lon"]) <= {-105.0, -95.0, -100.0}
    assert set(out["lat"]) <= {38.0, 34.0, 42.0}


def test_monthly_avg_groups_cells():
    t = pd.to_datetime(["2015-01-03", "2015-01-20", "2015-02-02"])
    df = pd.DataFrame(
        {"time": t, "lon": [-105.0] * 3, "lat": [38.0] * 3, "v": [1.0, 3.0, 5.0]}
    )
    out = monthly_avg(df)
    jan = out[out.time == "2015-01-01"]["v"].iloc[0]
    assert jan == 2.0 and len(out) == 2


def test_temporal_avg_weekly():
    """Weekly resampling — the notebooks' groupby-resample("1W") chain
    (notebooks/5degree_weekly_xcov.ipynb cell 5)."""
    from cokriging_tpu.data import temporal_avg

    t = pd.to_datetime(["2015-01-05", "2015-01-07", "2015-01-14"])
    df = pd.DataFrame(
        {"time": t, "lon": [-105.0] * 3, "lat": [38.0] * 3, "v": [1.0, 3.0, 7.0]}
    )
    out = temporal_avg(df, "1W")
    assert len(out) == 2  # two ISO weeks
    np.testing.assert_allclose(sorted(out["v"]), [2.0, 7.0])


def test_land_grid_conus_counts():
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        lg = land_grid(GridConfig(CONUS_EXTENTS, lon_res=5, lat_res=4))
    # nearly every 4x5-degree CONUS cell touches land
    assert 80 <= len(lg) <= 130
    pc = prediction_coords()
    assert 4000 <= len(pc) <= 8000  # reference ~5.3k at 0.5 degrees


def test_land_mask_known_points():
    assert land_mask_fn(np.array([39.7]), np.array([-104.9]))[0]  # Denver
    assert not land_mask_fn(np.array([25.0]), np.array([-90.0]))[0]  # Gulf
    assert not land_mask_fn(np.array([47.5]), np.array([-87.5]))[0]  # Superior


def test_augment_dataset_pools_offsets(rng):
    # two years of monthly synthetic obs over CONUS
    times = pd.date_range("2015-01-01", periods=4, freq="MS")
    rows = []
    for t in times:
        lat = rng.uniform(24, 50, 600)
        lon = rng.uniform(-120, -70, 600)
        rows.append(
            pd.DataFrame(
                {"time": t, "lat": lat, "lon": lon, "v": rng.normal(size=600)}
            )
        )
    df = pd.concat(rows, ignore_index=True)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        aug = augment_dataset(df)
    # 17 offset grids pooled; effective lattice is denser than the base grid
    base_cells = df.pipe(
        lambda d: prep_gridded_df(d, GridConfig(CONUS_EXTENTS, lon_res=5, lat_res=4))
    )
    assert aug[["lon", "lat"]].drop_duplicates().shape[0] > 5 * base_cells[
        ["lon", "lat"]
    ].drop_duplicates().shape[0]
    # every base-grid center appears in the augmented set
    mc = main_coords_array()
    aug_set = set(zip(aug.lat.round(6), aug.lon.round(6)))
    base_set = set(zip(base_cells.lat.round(6), base_cells.lon.round(6)))
    assert base_set <= aug_set


def test_main_coords():
    lon_c, lat_c = set_main_coords()
    assert lon_c[0] == -125.0 and lat_c[0] == 22.0
    mc = main_coords_array()
    assert mc.shape == (130, 2)


def test_prep_sif_filters():
    ds = {
        "Daily_SIF_740nm": np.array([1.0, -5.0, 0.5, 2.0]),
        "SIF_Uncertainty_740nm": np.array([0.3, 1.0, 0.2, 0.4]),
        "Quality_Flag": np.array([0, 0, 2, 1]),
        "Longitude": np.array([-100.0] * 4),
        "Latitude": np.array([40.0] * 4),
        "Delta_Time": pd.to_datetime(["2015-01-01"] * 4).values,
    }
    out = prep_sif(ds)
    # row 1 fails SIF+3sig>0, row 2 fails flag!=2
    assert len(out) == 2
    np.testing.assert_allclose(out["sif_var"].values, [0.09, 0.16])


def test_prep_xco2_filters():
    ds = {
        "xco2": np.array([400.0, 410.0, 405.0]),
        "xco2_uncertainty": np.array([0.5, 0.6, 0.7]),
        "xco2_quality_flag": np.array([0, 1, 0]),
        "longitude": np.array([-100.0] * 3),
        "latitude": np.array([40.0] * 3),
        "time": pd.to_datetime(["2015-01-01"] * 3).values,
    }
    out = prep_xco2(ds)
    assert len(out) == 2
    np.testing.assert_allclose(out["xco2_var"].values, [1.0, 1.4])

def test_open_mf_concurrent_matches_serial(tmp_path):
    """Thread-pooled multi-granule ingest preserves order and values
    exactly (the open_mfdataset(parallel=True) analog)."""
    import h5py

    from cokriging_tpu.data.readers import open_mf, prep_sif

    rng = np.random.default_rng(0)
    paths = []
    for g in range(6):
        p = tmp_path / f"granule_{g}.h5"
        n = 50 + 10 * g
        with h5py.File(p, "w") as f:
            f["Daily_SIF_740nm"] = rng.normal(0.5, 0.3, n)
            f["SIF_Uncertainty_740nm"] = np.full(n, 0.3)
            f["Quality_Flag"] = rng.choice([0, 1, 2], size=n)
            f["Longitude"] = rng.uniform(-120, -70, n)
            f["Latitude"] = rng.uniform(25, 50, n)
            # real SIF Lite convention: float seconds since 1993-01-01
            f["Delta_Time"] = np.full(n, 8.3e8, "f8")
        paths.append(p)
    serial = open_mf(paths, prep_sif, workers=1)
    conc = open_mf(paths, prep_sif, workers=4)
    pd.testing.assert_frame_equal(conc, serial)
