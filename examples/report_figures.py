"""Report figure set — parity with the reference's conference/first-year-
review decks (notebooks/conference_figures.ipynb and FYR_figures.ipynb):

  Figure 1: daily and monthly domain-average climatologies of SIF and XCO2;
  Figure 2: the gridded datasets for one demo month, side by side;
  Figure 3/4: fitted (cross-)semivariograms AND (cross-)covariograms of the
              bivariate Matern model on the same estimate.

The notebooks read the staged gridded NetCDF artifacts; granule archives
are absent here, so the same figure set is produced from synthetic daily
soundings pushed through the real gridding/averaging/fields/fit pipeline.

Run: python examples/report_figures.py   (writes examples/out/report_*.png)
"""

import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import matplotlib

matplotlib.use("Agg")

import numpy as np
import pandas as pd

OUT = os.path.join(os.path.dirname(__file__), "out")


def synthesize_conus_daily(seed=0, years=2):
    """Daily CONUS SIF/XCO2 soundings with coupled seasonal cycles."""
    rng = np.random.default_rng(seed)
    days = pd.date_range("2018-01-01", periods=365 * years, freq="D")
    rows = []
    for d in days:
        n = 220
        lat = rng.uniform(24.0, 50.0, n)
        lon = rng.uniform(-124.0, -67.0, n)
        phase = 2 * np.pi * (d.dayofyear - 1) / 365.0
        season = np.sin(phase)
        sif = (
            0.6
            + 0.5 * season * np.cos(np.deg2rad(lat) * 2)
            + rng.normal(scale=0.25, size=n)
        )
        xco2 = (
            405.0
            + 0.006 * (d - days[0]).days
            - 2.5 * season
            + 0.8 * np.cos(np.deg2rad(lon))
            + rng.normal(scale=0.8, size=n)
        )
        rows.append(
            pd.DataFrame({"time": d, "lat": lat, "lon": lon, "sif": sif, "xco2": xco2})
        )
    return pd.concat(rows, ignore_index=True)


def main():
    from cokriging_tpu.data.grids import GridConfig, monthly_avg, regrid
    from cokriging_tpu.estimate import VarioConfig, empirical_variograms
    from cokriging_tpu.estimate.wls import fit_wls, moment_init
    from cokriging_tpu.fields import MultiField
    from cokriging_tpu.plot import plot_df, plot_variograms, raw_climatology

    os.makedirs(OUT, exist_ok=True)
    df = synthesize_conus_daily()

    # --- Figure 1: daily + monthly climatologies (deck figure 1) ---
    daily = df.groupby("time", as_index=False)[["sif", "xco2"]].mean()
    fig = raw_climatology(daily, ["sif"])
    fig.axes[0].set_title("daily domain-average SIF climatology")
    fig.savefig(os.path.join(OUT, "report_fig1_daily_sif.png"), dpi=110)
    monthly = (
        df.assign(time=df["time"].values.astype("datetime64[M]"))
        .groupby("time", as_index=False)[["sif", "xco2"]]
        .mean()
    )
    fig = raw_climatology(monthly, ["xco2"])
    fig.axes[0].set_title("monthly domain-average XCO2 climatology")
    fig.savefig(os.path.join(OUT, "report_fig1_monthly_xco2.png"), dpi=110)

    # --- Figure 2: gridded datasets for the demo month ---
    cfg = GridConfig(extents=(-125, -65, 22, 58), lon_res=5.0, lat_res=4.0)
    gridded = monthly_avg(regrid(df, cfg))
    month = gridded[gridded["time"] == gridded["time"].iloc[-7]]
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 2, figsize=(15, 4.5))
    plot_df(month, "sif", ax=axes[0], title="gridded SIF", cmap="RdYlGn")
    plot_df(month, "xco2", ax=axes[1], title="gridded XCO2", cmap="RdYlBu_r")
    fig.savefig(os.path.join(OUT, "report_fig2_gridded.png"), dpi=110)

    # --- Figures 3/4: fitted semivariograms and covariograms ---
    ts = str(pd.Timestamp(month["time"].iloc[0]).date())
    df_xco2 = gridded[["time", "lat", "lon", "xco2"]].assign(xco2_var=0.01)
    df_sif = gridded[["time", "lat", "lon", "sif"]].assign(sif_var=0.01)
    mf = MultiField.from_dataframes(
        [df_xco2, df_sif],
        ["xco2", "sif"],
        [["lon", "lat"], ["lon", "lat"]],
        timestamp=ts,
        timedeltas=[0, -1],
    )
    for kind, tag in (("Semivariogram", "fig3_semivariograms"),
                      ("Covariogram", "fig4_covariograms")):
        est = empirical_variograms(
            mf, VarioConfig(max_dist=1800.0, n_bins=12, kind=kind)
        )
        params, result = fit_wls(est, init=moment_init(est))
        fig = plot_variograms(result, kind=kind, names=["XCO2", "SIF"])
        fig.savefig(os.path.join(OUT, f"report_{tag}.png"), dpi=110)

    print(f"wrote report figures to {OUT}")


if __name__ == "__main__":
    main()
