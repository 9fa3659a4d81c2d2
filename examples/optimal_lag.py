"""Space-time lagged cross-correlation + optimal-lag search (parity with
research/optimal_lag.ipynb and the notebooks/*_xcov.ipynb EDA suite).

Builds a synthetic daily SIF/XCO2 cube where XCO2 lags SIF by a known
number of days per cell, then recovers the lag map with
stats.optim_lag_nd. Writes a lag map to examples/out/.
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import warnings

import numpy as np

warnings.filterwarnings("ignore")

OUT = pathlib.Path(__file__).parent / "out"
OUT.mkdir(exist_ok=True)


def main():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from cokriging_tpu.stats import optim_lag_nd, xcor_nd, get_stats

    rng = np.random.default_rng(0)
    nlon, nlat, T = 24, 16, 360
    t = np.arange(T)
    season = np.sin(2 * np.pi * t / 120.0)

    true_lag = rng.integers(0, 60, size=(nlon, nlat))
    sif = np.empty((nlon, nlat, T))
    xco2 = np.empty((nlon, nlat, T))
    for i in range(nlon):
        for j in range(nlat):
            s = np.roll(season, -int(true_lag[i, j]))
            sif[i, j] = s + rng.normal(scale=0.2, size=T)
            xco2[i, j] = -0.7 * season + rng.normal(scale=0.2, size=T)
    # mask some cells to exercise tau
    sif[0, 0, :300] = np.nan

    stats = get_stats({"sif": sif, "xco2": xco2})
    print("per-cell stats:", {k: v.shape for k, v in stats.items()})

    out = optim_lag_nd(xco2, sif, (0, 90), tau=30)
    err = np.abs(out["optim_lag"] - true_lag)
    print(
        f"optimal-lag recovery: median |error| = {np.median(err):.1f} days,"
        f" within 5 days at {(err <= 5).mean() * 100:.0f}% of cells"
    )

    fig, axes = plt.subplots(1, 2, figsize=(11, 4))
    im0 = axes[0].imshow(true_lag.T, origin="lower", cmap="magma")
    plt.colorbar(im0, ax=axes[0], shrink=0.8)
    axes[0].set_title("true lag (days)")
    im1 = axes[1].imshow(out["optim_lag"].T, origin="lower", cmap="magma")
    plt.colorbar(im1, ax=axes[1], shrink=0.8)
    axes[1].set_title("recovered optimal lag")
    fig.savefig(OUT / "optimal_lag.png", dpi=120)

    xc = xcor_nd(xco2, sif, lag=30, tau=30)
    print("lag-30 xcor field:", np.nanmin(xc).round(2), "..", np.nanmax(xc).round(2))


if __name__ == "__main__":
    main()
