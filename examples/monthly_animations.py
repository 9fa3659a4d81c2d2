"""Monthly spatial animations — parity with the reference's
notebooks/1degree_monthly_animations.ipynb (global monthly-mean SIF and
XCO2 maps animated over time, fixed TwoSlopeNorm color scale) and
1degree_monthly_animations_variance.ipynb (the per-cell within-month
variance variant).

The reference regrids the Lite granule archives to a 1-degree grid,
resamples "1MS" per cell, and renders each month as one FuncAnimation
frame. Raw archives are not present here, so daily soundings are
synthesized on a 1-degree global grid; the gridding + monthly averaging
goes through the same `data.grids` path the real pipeline uses
(`GridConfig`/`regrid`/`monthly_avg`), and `plot.animate_monthly` writes
the GIFs.

Run: python examples/monthly_animations.py  (writes examples/out/*.gif)
"""

import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np
import pandas as pd

import matplotlib

matplotlib.use("Agg")

from cokriging_tpu.data.grids import GridConfig, monthly_avg, regrid
from cokriging_tpu.plot import animate_monthly

OUT = os.path.join(os.path.dirname(__file__), "out")


def synthesize_daily_soundings(seed=0, months=8, res=4.0):
    """Global daily SIF/XCO2 soundings: seasonal cycle + trend + noise,
    with noise variance growing toward the poles (so the variance
    animation has structure)."""
    rng = np.random.default_rng(seed)
    lats = np.arange(-88.0, 90, res)
    lons = np.arange(-178.0, 180, res)
    lon_g, lat_g = np.meshgrid(lons, lats)
    lat_f, lon_f = lat_g.ravel(), lon_g.ravel()
    days = pd.date_range("2015-01-01", periods=months * 30, freq="D")
    rows = []
    for d in days:
        # each day observes a random ~35% swath of cells
        keep = rng.random(lat_f.size) < 0.35
        la, lo = lat_f[keep], lon_f[keep]
        month_frac = (d.dayofyear - 1) / 365.0
        season = np.sin(2 * np.pi * month_frac) * np.sign(la + 1e-9)
        noise_sd = 0.15 + 0.5 * (np.abs(la) / 90.0)
        sif = 0.8 + 0.45 * season + rng.normal(scale=noise_sd)
        xco2 = (
            400.0
            + 0.02 * (d - days[0]).days / 30.0
            - 2.0 * season
            + rng.normal(scale=2.0 * noise_sd)
        )
        rows.append(
            pd.DataFrame(
                {"time": d, "lat": la, "lon": lo, "sif": sif, "xco2": xco2}
            )
        )
    return pd.concat(rows, ignore_index=True)


def main():
    os.makedirs(OUT, exist_ok=True)
    df = synthesize_daily_soundings()
    cfg = GridConfig(lat_res=4.0, lon_res=4.0)
    gridded = regrid(df, cfg)

    # monthly means per cell (reference animations notebook, cells 3-5)
    mean_m = monthly_avg(gridded)
    animate_monthly(
        mean_m, "sif",
        out_path=os.path.join(OUT, "animation_sif_monthly.gif"),
        vcenter=0.8, cmap="RdYlGn", title="SIF 740nm monthly mean",
    )
    animate_monthly(
        mean_m, "xco2",
        out_path=os.path.join(OUT, "animation_xco2_monthly.gif"),
        vcenter=float(mean_m["xco2"].median()), cmap="RdYlBu_r",
        title="XCO2 monthly mean",
    )

    # per-cell within-month variance (the _variance notebook variant)
    var_m = (
        gridded.assign(month=gridded["time"].values.astype("datetime64[M]"))
        .groupby(["month", "lat", "lon"], as_index=False)[["sif", "xco2"]]
        .var()
        .rename(columns={"month": "time"})
    )
    animate_monthly(
        var_m, "sif",
        out_path=os.path.join(OUT, "animation_sif_variance.gif"),
        cmap="magma", title="SIF within-month variance",
    )
    print(f"wrote 3 GIFs to {OUT}")


if __name__ == "__main__":
    main()
