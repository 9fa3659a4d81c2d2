"""Lagged cross-covariance EDA suite — the reference's multi-resolution
reporting workflows (notebooks/5degree_monthly_xcov.ipynb cells 5-7,
transcom_monthly_xcov.ipynb cells 4-6, hemisphere_monthly.ipynb,
30-degree-band and global variants) reproduced with the regional
aggregation drivers in cokriging_tpu.stats.regional:

    1. 5-degree per-cell maps: observation counts, trend slopes, residual
       stds, and detrended lag-1/lag-2 cross-correlations;
    2. optimal-lag map (argmax |xcor| over a lag range, research/
       optimal_lag.ipynb);
    3. hemisphere / 30-degree-band / TransCom-region monthly aggregation
       -> get_stats_df summary tables, region stats mapped back to cells.

Real OCO-2 Lite archives are absent here, so the script synthesizes a
multi-year global 5-degree monthly dataset in which SIF leads XCO2 by a
known, hemisphere-dependent lag — the structure these workflows exist to
detect. Writes figures + CSV tables to examples/out/.
"""

import pathlib
import sys
import warnings

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np
import pandas as pd

warnings.filterwarnings("ignore")

OUT = pathlib.Path(__file__).parent / "out"


def synthesize_global_monthly(seed=0, years=5, res=5.0):
    """Global land-ish 5-degree monthly sif/xco2 frame: seasonal cycles +
    linear trends + an anomaly channel where XCO2 at month t reflects SIF
    at t-2 in the north and t-1 in the south (negative coupling)."""
    rng = np.random.default_rng(seed)
    lats = np.arange(-87.5, 90, res)
    lons = np.arange(-177.5, 180, res)
    T = years * 12
    times = pd.date_range("2015-01-01", periods=T, freq="MS")
    lon_g, lat_g = np.meshgrid(lons, lats)
    n_cells = lon_g.size
    lat_flat = lat_g.ravel()
    lon_flat = lon_g.ravel()

    month = np.arange(T)
    season = np.sin(2 * np.pi * (month[None, :] / 12.0)) * np.sign(
        lat_flat[:, None] + 1e-9
    )
    # SIF anomalies: AR-smooth, hemispherically coherent (a shared
    # hemisphere driver + per-cell noise) so regional averaging preserves
    # the lag signal instead of cancelling it
    def ar1(x, phi=0.6):
        for t in range(1, x.shape[-1]):
            x[..., t] = phi * x[..., t - 1] + 0.8 * x[..., t]
        return x

    shared = ar1(rng.normal(size=(2, T)))  # [north, south]
    cell = ar1(rng.normal(size=(n_cells, T)))
    hemi_ix = (lat_flat < 0).astype(int)
    anom = 0.75 * shared[hemi_ix] + 0.55 * cell
    sif = 0.8 + 0.4 * season + 0.002 * month[None, :] + 0.25 * anom
    # XCO2 carries no seasonal cycle of its own here: its anomalies follow
    # SIF's with a hemisphere-dependent lag (2 months north, 1 south)
    lag_cell = np.where(lat_flat >= 0, 2, 1)
    xco2_anom = np.zeros_like(anom)
    for lag in (1, 2):
        sel = lag_cell == lag
        xco2_anom[sel, lag:] = -0.9 * anom[sel, :-lag]
    xco2 = (
        400.0
        + 0.2 * month[None, :]
        + 0.5 * xco2_anom
        + 0.1 * rng.normal(size=(n_cells, T))
    )
    # irregular coverage: drop ~25% of cell-months
    keep = rng.random((n_cells, T)) > 0.25
    rows = {
        "time": np.repeat(times.values[None, :], n_cells, 0)[keep],
        "lat": np.repeat(lat_flat[:, None], T, 1)[keep],
        "lon": np.repeat(lon_flat[:, None], T, 1)[keep],
        "sif": sif[keep],
        "xco2": xco2[keep],
    }
    return pd.DataFrame(rows)


def synthesize_transcom():
    """A TransCom-3-shaped 1-degree region map (11 land regions laid out as
    latitude/longitude blocks — a stand-in for the IDL binary the reference
    converts with scripts/convert_bin_file.R)."""
    lon = np.arange(-179.5, 180.0, 1.0)
    lat = np.arange(-89.5, 90.0, 1.0)
    lon_g, lat_g = np.meshgrid(lon, lat)
    band = np.clip(((lat_g + 90) // 30).astype(int), 0, 5)
    half = (lon_g >= 0).astype(int)
    region = np.minimum(band * 2 + half + 1, 11)
    return pd.DataFrame(
        {
            "lon": lon_g.ravel(),
            "lat": lat_g.ravel(),
            "region": region.ravel().astype(float),
        }
    )


def main():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from cokriging_tpu.data.readers import read_transcom
    from cokriging_tpu.stats import (
        gridded_stats,
        hemisphere_labels,
        lat_band_labels,
        map_transcom,
        optim_lag_nd,
        regional_monthly,
        regional_stats,
        stats_to_grid,
        to_cubes,
    )

    OUT.mkdir(exist_ok=True)
    df = synthesize_global_monthly()

    # ---- 1. per-cell 5-degree maps (5degree_monthly_xcov cell 6) ----
    maps, lats, lons = gridded_stats(df, ("sif", "xco2"), lags=(1, 2), tau=30)
    panels = [
        "sif_count", "xco2_count", "sif_slope", "xco2_slope",
        "sif_std", "xco2_std", "xcor_lag1", "xcor_lag2",
    ]
    fig, axes = plt.subplots(4, 2, figsize=(14, 16))
    for ax, name in zip(axes.ravel(), panels):
        cmap = "RdBu_r" if name.startswith("xcor") else "viridis"
        kw = {"vmin": -1, "vmax": 1} if name.startswith("xcor") else {}
        pc = ax.pcolormesh(lons, lats, maps[name], cmap=cmap, **kw)
        plt.colorbar(pc, ax=ax, shrink=0.8)
        ax.set_title(name)
    fig.suptitle("5-degree monthly EDA maps")
    fig.savefig(OUT / "xcov_eda_maps.png", dpi=110)

    # ---- 2. optimal-lag map (research/optimal_lag.ipynb) ----
    cubes, lats, lons, _ = to_cubes(df, ("sif", "xco2"))
    best = optim_lag_nd(cubes["xco2"], cubes["sif"], lag_bnds=(0, 4), tau=30)
    fig, axes = plt.subplots(1, 2, figsize=(14, 4.5))
    pc = axes[0].pcolormesh(lons, lats, best["optim_lag"], cmap="viridis")
    plt.colorbar(pc, ax=axes[0], shrink=0.8)
    axes[0].set_title("optimal lag (months)")
    pc = axes[1].pcolormesh(
        lons, lats, best["xcor"], cmap="RdBu_r", vmin=-1, vmax=1
    )
    plt.colorbar(pc, ax=axes[1], shrink=0.8)
    axes[1].set_title("xcor at optimal lag")
    fig.savefig(OUT / "xcov_eda_optimal_lag.png", dpi=110)

    # ---- 3. regional aggregations ----
    df_hemi = regional_monthly(df, hemisphere_labels(df))
    stats_hemi = regional_stats(df_hemi, "hemisphere", lags=(0, 1, 2, 3))
    stats_hemi.to_csv(OUT / "xcov_eda_hemisphere.csv", index=False)
    print("hemisphere stats:")
    print(stats_hemi.to_string(index=False))

    df_band = regional_monthly(df, lat_band_labels(df, width=30.0))
    stats_band = regional_stats(df_band, "lat_band", lags=(0, 1, 2, 3))
    stats_band.to_csv(OUT / "xcov_eda_lat_bands.csv", index=False)
    print("30-degree-band stats:")
    print(stats_band.to_string(index=False))

    df_tc = read_transcom(synthesize_transcom())
    df_regional = map_transcom(df, df_tc)
    df_tc_monthly = regional_monthly(df_regional, "region")
    stats_tc = regional_stats(df_tc_monthly, "region", lags=(1, 2))
    stats_tc.to_csv(OUT / "xcov_eda_transcom.csv", index=False)
    print("TransCom-region stats:")
    print(stats_tc.to_string(index=False))

    # region stats back onto the map (transcom_monthly_xcov cell 6)
    cells = stats_to_grid(stats_tc, df_tc)
    fig, ax = plt.subplots(figsize=(9, 4.5))
    sc = ax.scatter(
        cells["lon"], cells["lat"], c=cells["xcor_lag2"], s=2,
        cmap="RdBu_r", vmin=-1, vmax=1,
    )
    plt.colorbar(sc, ax=ax, shrink=0.85, label="xcor_lag2")
    ax.set_title("TransCom-region lag-2 cross-correlation")
    fig.savefig(OUT / "xcov_eda_transcom_map.png", dpi=110)
    print(f"figures + tables written to {OUT}")


if __name__ == "__main__":
    # Runs on the ambient backend (TPU: f32 via utils.config.compute_dtype;
    # CPU: f64). COKRIGING_FORCE_CPU=1 pins the CPU backend for a true-f64
    # run. Must be decided before first JAX device use.
    import os

    if os.environ.get("COKRIGING_FORCE_CPU") == "1":
        import jax

        jax.config.update("jax_platforms", "cpu")
    main()
