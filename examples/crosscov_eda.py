"""Global SIF/XCO2 cross-covariance EDA — the reference's
research/analysis_sif_xco2_crosscov.ipynb workflow:

    1. global daily mean series of both processes on a shared dual-axis
       plot (cells 7-8);
    2. anomaly series via linear detrending (cells 9-11);
    3. the scalar optimal-lag search over 0..360 days on the global
       anomaly series (cells 12-15, minimize_scalar + grid sweep ->
       stats.optim_lag_1d);
    4. one-region lagged cross-covariance at the optimal lag (cell 22);
    5. 5-degree monthly gridding + per-cell lag-3 cross-covariance and
       observation-count maps (cells 29-39, apply_cross_covariance).

Real OCO-2 archives are absent here, so the script synthesizes a global
daily dataset in which XCO2 anomalies follow SIF anomalies by a known
~90-day lag with negative coupling — the structure the notebook hunts.
Writes figures to examples/out/.
"""

import pathlib
import sys
import warnings

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np
import pandas as pd

warnings.filterwarnings("ignore")

OUT = pathlib.Path(__file__).parent / "out"

TRUE_LAG_DAYS = 90


def synthesize_daily(seed=0, years=5, res=5.0):
    """Global 5-degree daily sif/xco2 cubes: seasonal cycle + trend + an
    AR-smooth anomaly channel where XCO2 at day t reflects -SIF at
    t - TRUE_LAG_DAYS; ~70% of cell-days missing (sparse soundings)."""
    rng = np.random.default_rng(seed)
    lats = np.arange(-87.5, 90, res)
    lons = np.arange(-177.5, 180, res)
    T = years * 365
    lon_g, lat_g = np.meshgrid(lons, lats)
    n_cells = lon_g.size
    lat_flat = lat_g.ravel()

    day = np.arange(T)
    season = np.sin(2 * np.pi * day[None, :] / 365.0) * np.sign(
        lat_flat[:, None] + 1e-9
    )

    def ar1(x, phi=0.97):
        for t in range(1, x.shape[-1]):
            x[..., t] = phi * x[..., t - 1] + 0.25 * x[..., t]
        return x

    shared = ar1(rng.normal(size=T))  # one global slow driver
    cell = ar1(rng.normal(size=(n_cells, T)), phi=0.9)
    anom = 0.8 * shared[None, :] + 0.4 * cell
    sif = 0.8 + 0.4 * season + 0.0005 * day[None, :] + 0.3 * anom
    xco2_anom = np.zeros_like(anom)
    xco2_anom[:, TRUE_LAG_DAYS:] = -0.9 * anom[:, :-TRUE_LAG_DAYS]
    xco2 = (
        400.0
        + 0.006 * day[None, :]
        - 0.8 * season
        + 0.5 * xco2_anom
        + 0.05 * rng.normal(size=(n_cells, T))
    )
    keep = rng.random((n_cells, T)) > 0.7
    sif = np.where(keep, sif, np.nan)
    xco2 = np.where(keep, xco2, np.nan)
    times = pd.date_range("2015-01-01", periods=T, freq="D")
    return sif, xco2, lat_g, lon_g, times


def main():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from cokriging_tpu.stats import (
        apply_cross_covariance,
        count_valid,
        detrend,
        optim_lag_1d,
        xcov_1d,
    )

    OUT.mkdir(exist_ok=True)
    sif, xco2, lat_g, lon_g, times = synthesize_daily()

    # ---- 1. global daily mean series, dual axis (cells 7-8) ----
    sif_glob = np.nanmean(sif, axis=0)
    xco2_glob = np.nanmean(xco2, axis=0)
    fig, ax1 = plt.subplots(figsize=(10, 5))
    ax1.plot(times, sif_glob, color="tab:green", lw=0.8, label="SIF")
    ax1.set_ylabel("SIF (W/m2/sr/um)", color="tab:green")
    ax2 = ax1.twinx()
    ax2.plot(times, xco2_glob, color="tab:blue", lw=0.8, label="XCO2")
    ax2.set_ylabel("XCO2 (ppm)", color="tab:blue")
    ax1.set_title("global daily means")
    fig.savefig(OUT / "crosscov_eda_series.png", dpi=110)

    # ---- 2. anomalies by linear detrend (cells 9-11) ----
    sif_anom, _ = detrend(sif_glob)
    xco2_anom, _ = detrend(xco2_glob)
    fig, ax = plt.subplots(figsize=(10, 4))
    ax.plot(times, np.asarray(sif_anom), lw=0.7, label="SIF anomaly")
    ax.plot(times, np.asarray(xco2_anom), lw=0.7, label="XCO2 anomaly")
    ax.legend()
    ax.set_title("global anomaly series (linear trend removed)")
    fig.savefig(OUT / "crosscov_eda_anomalies.png", dpi=110)

    # ---- 3. scalar optimal-lag search 0..360 days (cells 12-15) ----
    # convention: optim_lag_1d(v1, v2, lag) correlates v1[t+lag] with
    # v2[t]; XCO2 follows SIF here, so v1 = xco2 (same order get_stats_df
    # uses, src/stat_tools.py:250-271)
    best = optim_lag_1d(np.asarray(xco2_anom), np.asarray(sif_anom), (0, 360))
    print(
        f"optimal lag (days): {best['optim_lag']}  "
        f"xcor: {best['xcor']:.3f}  (truth: {TRUE_LAG_DAYS})"
    )
    assert abs(best["optim_lag"] - TRUE_LAG_DAYS) <= 10, best

    # ---- 4. one-region xcov at the found lag (cell 22) ----
    region = (np.abs(lat_g.ravel() - 42.5) < 5) & (
        np.abs(lon_g.ravel() + 92.5) < 10
    )
    reg_sif = np.nanmean(sif[region], axis=0)
    reg_xco2 = np.nanmean(xco2[region], axis=0)
    reg_xcov = xcov_1d(reg_xco2, reg_sif, lag=int(best["optim_lag"]))
    print(f"region (42.5N, -92.5E) xcov at lag {best['optim_lag']}: {reg_xcov:.4f}")

    # ---- 5. monthly gridding + lag-3 xcov map + count maps (29-39) ----
    months = times.to_period("M")
    uniq = months.unique()
    T_m = len(uniq)
    shape = lat_g.shape
    sif_m = np.full(shape + (T_m,), np.nan)
    xco2_m = np.full(shape + (T_m,), np.nan)
    codes = months.factorize()[0]
    for k in range(T_m):
        sel = codes == k
        sif_m[..., k] = np.nanmean(
            sif[:, sel], axis=1
        ).reshape(shape)
        xco2_m[..., k] = np.nanmean(xco2[:, sel], axis=1).reshape(shape)

    # both processes carry strong positive linear trends that would swamp
    # the anomaly coupling; remove them per cell before the lagged map
    sif_r, _ = detrend(sif_m)
    xco2_r, _ = detrend(xco2_m)
    xcov_map = apply_cross_covariance(
        np.asarray(xco2_r), np.asarray(sif_r), lag=3, tau=24
    )
    counts = np.asarray(count_valid(sif_m))
    fig, axes = plt.subplots(1, 2, figsize=(15, 4.5))
    vmax = np.nanpercentile(np.abs(xcov_map), 98)
    pc = axes[0].pcolormesh(
        lon_g[0], lat_g[:, 0], xcov_map, cmap="RdBu_r", vmin=-vmax, vmax=vmax
    )
    plt.colorbar(pc, ax=axes[0], shrink=0.85)
    axes[0].set_title("lag-3 monthly cross-covariance C(XCO2_t+3, SIF_t)")
    pc = axes[1].pcolormesh(lon_g[0], lat_g[:, 0], counts, cmap="viridis")
    plt.colorbar(pc, ax=axes[1], shrink=0.85)
    axes[1].set_title("months with data per cell")
    fig.savefig(OUT / "crosscov_eda_maps.png", dpi=110)

    # the engineered negative coupling must show up in the global map
    assert np.nanmedian(xcov_map) < 0.0
    print(f"figures written to {OUT}")


if __name__ == "__main__":
    # Runs on the ambient backend (TPU: f32 via utils.config.compute_dtype;
    # CPU: f64). COKRIGING_FORCE_CPU=1 pins the CPU backend for a true-f64
    # run. Must be decided before first JAX device use.
    import os

    if os.environ.get("COKRIGING_FORCE_CPU") == "1":
        import jax

        jax.config.update("jax_platforms", "cpu")
    main()
