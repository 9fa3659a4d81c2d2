"""Satellite granule readers (OCO-2 SIF/XCO2 Lite, MODIS EVI, TransCom).

Long-format pandas re-design of the reference's xarray readers
(src/data_utils.py:21-118). Each reader returns a DataFrame with columns
[time, lat, lon, <name>, <name>_var] after the reference's quality filters:

- SIF: drop Quality_Flag == 2 and SIF + 3 sigma <= 0; measurement-error
  variance = uncertainty^2 (src/data_utils.py:21-58);
- XCO2: keep xco2_quality_flag == 0; conservative error variance =
  2 x posterior uncertainty (src/data_utils.py:61-93).

Inputs may be h5py/netCDF4-style mappings, xarray Datasets (if installed),
or plain dict-of-arrays — anything indexable by variable name.
"""

from typing import Sequence

import numpy as np
import pandas as pd


def _get(ds, name):
    """Fetch a variable as a numpy array from dict / h5py / xarray inputs."""
    v = ds[name]
    for attr in ("values", "__array__"):
        if hasattr(v, attr):
            return np.asarray(v)
    return np.asarray(v)


def _parse_time(t, epoch: str):
    """Granule timestamps -> pandas datetimes.

    Real OCO-2 Lite files store numeric seconds since an instrument epoch
    (SIF Lite ``Delta_Time``: seconds since 1993-01-01; FP Lite ``time``:
    seconds since 1970-01-01) — a raw ``pd.to_datetime`` would read those
    floats as *nanoseconds* since 1970. Numeric input is converted from
    the named epoch; datetime64/string input passes through unchanged
    (synthetic frames and pre-parsed datasets).
    """
    t = pd.Series(np.asarray(t).ravel())
    if np.issubdtype(t.dtype, np.number):
        out = pd.Timestamp(epoch) + pd.to_timedelta(t, unit="s")
    else:
        out = pd.to_datetime(t)
    # positional values: the caller assigns into an already-QC-filtered
    # frame whose index has gaps — a fresh-indexed Series would align to
    # NaT there
    return out.to_numpy()


def prep_sif(ds) -> pd.DataFrame:
    """Clean an OCO-2 SIF Lite granule (src/data_utils.py:21-58)."""
    df = pd.DataFrame(
        {
            "sif": _get(ds, "Daily_SIF_740nm"),
            "sif_sigma": _get(ds, "SIF_Uncertainty_740nm"),
            "flag": _get(ds, "Quality_Flag"),
            "lon": _get(ds, "Longitude"),
            "lat": _get(ds, "Latitude"),
            "time": _get(ds, "Delta_Time"),
        }
    )
    df = df[df["flag"] != 2]
    df = df[df["sif"] + 3.0 * df["sif_sigma"] > 0]
    df["sif_var"] = df["sif_sigma"] ** 2
    # SIF Lite Delta_Time: seconds since the 1993-01-01 instrument epoch
    df["time"] = _parse_time(df["time"], "1993-01-01")
    return df[["time", "lat", "lon", "sif", "sif_var"]].reset_index(drop=True)


def prep_xco2(ds) -> pd.DataFrame:
    """Clean an OCO-2 FP Lite granule (src/data_utils.py:61-93)."""
    df = pd.DataFrame(
        {
            "xco2": _get(ds, "xco2"),
            "xco2_uncert": _get(ds, "xco2_uncertainty"),
            "flag": _get(ds, "xco2_quality_flag"),
            "lon": _get(ds, "longitude"),
            "lat": _get(ds, "latitude"),
            "time": _get(ds, "time"),
        }
    )
    df = df[df["flag"] == 0]
    df["xco2_var"] = df["xco2_uncert"] * 2.0
    # FP Lite time: seconds since the unix epoch
    df["time"] = _parse_time(df["time"], "1970-01-01")
    return df[["time", "lat", "lon", "xco2", "xco2_var"]].reset_index(drop=True)


def prep_evi(ds, extents=(-130, 18, -60, 62), date: str = None) -> pd.DataFrame:
    """Clip a MODIS monthly EVI grid to the study box
    (src/data_utils.py:96-108). Expects 'evi' plus 1-d 'lon'/'lat' axes."""
    evi = _get(ds, "evi")
    lon = _get(ds, "lon")
    lat = _get(ds, "lat")
    lon_g, lat_g = np.meshgrid(lon, lat, indexing="ij")
    df = pd.DataFrame(
        {"lon": lon_g.ravel(), "lat": lat_g.ravel(), "evi": np.asarray(evi).ravel()}
    )
    minx, miny, maxx, maxy = extents
    df = df[(df.lon >= minx) & (df.lon <= maxx) & (df.lat >= miny) & (df.lat <= maxy)]
    if date is not None:
        df["time"] = pd.Timestamp(date)
    return df.reset_index(drop=True)


def read_transcom(ds_or_df) -> pd.DataFrame:
    """TransCom-3 region map filtered to land regions 1..11
    (src/data_utils.py:111-118)."""
    if isinstance(ds_or_df, pd.DataFrame):
        df = ds_or_df.copy()
    else:
        df = pd.DataFrame(
            {
                "lon": _get(ds_or_df, "lon"),
                "lat": _get(ds_or_df, "lat"),
                "region": _get(ds_or_df, "region"),
            }
        )
    df = df[(df.region < 12) & (df.region != 0)]
    return df.reset_index(drop=True)


def read_transcom_binary(path: str) -> pd.DataFrame:
    """Read the raw TransCom-3 region map from its big-endian IDL binary
    (360 x 180 int32 grid; the reference converts it with an R script,
    scripts/convert_bin_file.R:20-90) and return the land-region frame."""
    raw = np.fromfile(path, dtype=">i4")
    # IDL unformatted files wrap records in 4-byte length markers
    if raw.size == 360 * 180 + 2:
        raw = raw[1:-1]
    if raw.size != 360 * 180:
        raise ValueError(f"Unexpected TransCom binary size: {raw.size}")
    region = raw.reshape(180, 360).astype(np.int32)
    lon = np.arange(-179.5, 180.0, 1.0)
    lat = np.arange(-89.5, 90.0, 1.0)
    lon_g, lat_g = np.meshgrid(lon, lat)
    df = pd.DataFrame(
        {
            "lon": lon_g.ravel(),
            "lat": lat_g.ravel(),
            "region": region.ravel().astype(float),
        }
    )
    return read_transcom(df)


def open_mf(paths: Sequence[str], prep_fn, workers: int = 8) -> pd.DataFrame:
    """Multi-granule ingest: apply a reader across files and concatenate
    (the reference's ``open_mfdataset(parallel=True)`` + preprocess
    pattern, scripts/process_lite_files.ipynb cell 2). Supports .nc/.h5
    via h5py.

    Granules load CONCURRENTLY on a thread pool (h5py releases the GIL
    during I/O/decompression) — the archive-scale ingest the reference
    delegates to dask; ``workers=1`` restores the serial loop. Frame
    order matches the input path order either way.
    """
    from concurrent.futures import ThreadPoolExecutor

    import h5py

    def load(p):
        with h5py.File(p, "r") as f:
            return prep_fn(f)

    paths = list(paths)
    if workers <= 1 or len(paths) <= 1:
        frames = [load(p) for p in paths]
    else:
        with ThreadPoolExecutor(max_workers=min(workers, len(paths))) as ex:
            frames = list(ex.map(load, paths))
    return pd.concat(frames, ignore_index=True)
