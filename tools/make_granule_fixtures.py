"""Generate tiny real-format granule fixtures for the reader e2e test.

OCO-2 Lite files are HDF5 containers (NetCDF-4); these fixtures are
genuine HDF5 files carrying the real variable names, dtypes, and epoch
conventions the reference's readers consume (src/data_utils.py:21-93):

- ``oco2_sif_lite_*.nc4``: Daily_SIF_740nm, SIF_Uncertainty_740nm,
  Quality_Flag, Longitude, Latitude, Delta_Time (f32/i8; Delta_Time =
  float seconds since 1993-01-01, the SIF Lite epoch). Includes
  QC-flagged soundings (Quality_Flag == 2) and soundings failing the
  SIF + 3 sigma > 0 screen, so the filters are exercised on file data.
- ``oco2_xco2_lite_*.nc4``: xco2, xco2_uncertainty, xco2_quality_flag,
  longitude, latitude, time (time = float seconds since 1970-01-01, the
  FP Lite convention). Includes flagged (quality_flag == 1) soundings.
- ``modis_evi_200km.nc4``: a 2-d monthly EVI cutout with 1-d lon/lat
  axes. (The real MOD13C2 archive is HDF4, which no library in this
  image can write; HDF5 with the same array layout is the closest
  producible stand-in — the reader consumes either via h5py/dicts.)

Values carry a smooth CONUS-scale spatial signal plus noise so the
downstream variogram fit in tests/test_granule_integration.py is
well-posed. Total size: a few hundred KB, committed under
tests/fixtures/.
"""

import pathlib

import h5py
import numpy as np

OUT = pathlib.Path(__file__).resolve().parents[1] / "tests" / "fixtures"

_SIF_EPOCH_OFFSET = (
    np.datetime64("2019-07-01") - np.datetime64("1993-01-01")
) / np.timedelta64(1, "s")
_UNIX_OFFSET = (
    np.datetime64("2019-07-01") - np.datetime64("1970-01-01")
) / np.timedelta64(1, "s")


def _signal(lat, lon):
    return (
        np.sin(np.deg2rad(lat) * 6.0)
        + 0.5 * np.cos(np.deg2rad(lon) * 4.0)
    )


def _soundings(rng, n, day_offset):
    """Orbit-track-like soundings over CONUS for one granule (one day)."""
    # a few ascending swaths: tight in lon, spanning lat
    swath_lon = rng.uniform(-120, -75, size=4)
    lat = rng.uniform(26.0, 48.0, n)
    lon = (
        np.repeat(swath_lon, n // 4 + 1)[:n]
        + 0.15 * (lat - 37.0)  # orbit inclination tilt
        + rng.normal(scale=0.8, size=n)
    )
    secs = day_offset * 86400.0 + np.sort(rng.uniform(0, 86400.0, n))
    return lat.astype(np.float32), lon.astype(np.float32), secs


def write_sif(path, seed, day_offset):
    rng = np.random.default_rng(seed)
    n = 700
    lat, lon, secs = _soundings(rng, n, day_offset)
    sif = 0.4 + 0.35 * _signal(lat, lon) + rng.normal(scale=0.1, size=n)
    sigma = np.abs(rng.normal(0.3, 0.05, n))
    flag = np.zeros(n, np.int8)
    flag[rng.choice(n, n // 10, replace=False)] = 2  # cloudy/failed QC
    # force some soundings to fail the SIF + 3 sigma > 0 screen
    dark = rng.choice(n, n // 20, replace=False)
    sif[dark] = -3.5 * sigma[dark]
    with h5py.File(path, "w") as f:
        f["Daily_SIF_740nm"] = sif.astype(np.float32)
        f["SIF_Uncertainty_740nm"] = sigma.astype(np.float32)
        f["Quality_Flag"] = flag
        f["Longitude"] = lon
        f["Latitude"] = lat
        f["Delta_Time"] = (_SIF_EPOCH_OFFSET + secs).astype(np.float64)


def write_xco2(path, seed, day_offset):
    rng = np.random.default_rng(seed)
    n = 700
    lat, lon, secs = _soundings(rng, n, day_offset)
    xco2 = 405.0 - 1.2 * _signal(lat, lon) + rng.normal(scale=0.4, size=n)
    uncert = np.abs(rng.normal(0.5, 0.08, n))
    flag = np.zeros(n, np.int8)
    flag[rng.choice(n, n // 8, replace=False)] = 1
    with h5py.File(path, "w") as f:
        f["xco2"] = xco2.astype(np.float32)
        f["xco2_uncertainty"] = uncert.astype(np.float32)
        f["xco2_quality_flag"] = flag
        f["longitude"] = lon
        f["latitude"] = lat
        f["time"] = (_UNIX_OFFSET + secs).astype(np.float64)


def write_evi(path):
    lon = np.arange(-126.0, -66.0, 0.5, dtype=np.float32)
    lat = np.arange(22.0, 58.0, 0.5, dtype=np.float32)
    lon_g, lat_g = np.meshgrid(lon, lat, indexing="ij")
    evi = (0.35 + 0.2 * _signal(lat_g, lon_g)).astype(np.float32)
    with h5py.File(path, "w") as f:
        f["evi"] = evi
        f["lon"] = lon
        f["lat"] = lat


def main():
    OUT.mkdir(exist_ok=True)
    for k in range(2):
        write_sif(OUT / f"oco2_sif_lite_2019070{k + 1}.nc4", seed=10 + k,
                  day_offset=k)
        write_xco2(OUT / f"oco2_xco2_lite_2019070{k + 1}.nc4", seed=20 + k,
                   day_offset=k)
    write_evi(OUT / "modis_evi_200km.nc4")
    for p in sorted(OUT.glob("*.nc4")):
        print(p.name, p.stat().st_size, "bytes")


if __name__ == "__main__":
    main()
