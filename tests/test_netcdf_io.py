"""NetCDF staged-artifact round trip (reference interchange format:
src/data_utils.py:363-372 to_xarray + scripts/process_lite_files.ipynb
cell 4 — every ETL stage writes NetCDF and downstream stages re-read it)."""

import numpy as np
import pandas as pd

from cokriging_tpu.utils.io import load_dataset, save_dataset


def _monthly_frame():
    rng = np.random.default_rng(0)
    times = pd.date_range("2018-01-01", periods=6, freq="MS")
    lats = np.array([32.0, 36.0, 40.0])
    lons = np.array([-110.0, -105.0, -100.0, -95.0])
    rows = []
    for t in times:
        for lat in lats:
            for lon in lons:
                if rng.random() < 0.2:  # irregular coverage
                    continue
                rows.append(
                    {
                        "time": t,
                        "lat": lat,
                        "lon": lon,
                        "xco2": 400 + rng.normal(),
                        "xco2_var": float(rng.random()),
                    }
                )
    return pd.DataFrame(rows)


def test_round_trip(tmp_path):
    df = _monthly_frame()
    path = tmp_path / "OCO2_monthly_test.nc"
    save_dataset(path, df)

    back = load_dataset(path)
    merged = df.merge(
        back, on=["time", "lat", "lon"], suffixes=("", "_rt"), how="left"
    )
    assert len(merged) == len(df)
    np.testing.assert_allclose(merged["xco2"], merged["xco2_rt"])
    np.testing.assert_allclose(merged["xco2_var"], merged["xco2_var_rt"])
    # unobserved cell-months come back as NaN holes, not fabricated rows
    assert len(back) == len(df)


def test_cube_view_and_dimension_scales(tmp_path):
    df = _monthly_frame()
    path = tmp_path / "artifact.nc"
    save_dataset(path, df, data_vars=["xco2"])

    cubes, coords = load_dataset(path, as_frame=False)
    assert cubes["xco2"].shape == (6, 3, 4)
    assert list(np.asarray(coords["lat"])) == [32.0, 36.0, 40.0]
    assert pd.DatetimeIndex(coords["time"])[0] == pd.Timestamp("2018-01-01")

    # the artifact is genuinely netCDF4-shaped: coordinate variables are
    # HDF5 dimension scales attached to the data variable's dims
    import h5py

    with h5py.File(path, "r") as f:
        assert f["lat"].is_scale and f["time"].is_scale
        assert f["xco2"].dims[0][0] == f["time"]


def test_stage_pipeline_through_netcdf(tmp_path):
    """Gridded stage -> .nc -> re-read -> field construction works, i.e.
    the artifact really is a pipeline checkpoint."""
    from cokriging_tpu.fields import MultiField

    df = _monthly_frame()
    path = tmp_path / "stage.nc"
    save_dataset(path, df)
    back = load_dataset(path)
    mf = MultiField.from_dataframes(
        [back], ["xco2"], [["lon", "lat"]],
        timestamp="2018-03-01", timedeltas=[0],
    )
    assert mf.fields[0].size > 0
    assert np.isfinite(np.asarray(mf.fields[0].values)).all()
