"""Empirical semivariogram / cross-covariogram + WLS Matern fit at 5-degree
weekly AND monthly temporal bins (BASELINE config[2]; parity with the
reference's 5degree_weekly_xcov / 5degree_monthly_xcov notebooks feeding
the variography workflow of research/variography_compare_tlag.ipynb).

Builds daily synthetic SIF/XCO2 observations on a 5-degree CONUS grid,
aggregates them per cell at weekly ("1W") and monthly ("1MS") frequency
(data.grids.temporal_avg — the reference's groupby-resample chains), then
runs the full estimation stack at each resolution:

- empirical (cross-)semivariograms (estimate.empirical);
- the cross-COVARIOGRAM estimate as well (VarioConfig kind, reference
  src/fields.py:20-46 supports both);
- composite-WLS bivariate Matern fits (estimate.wls).

Weekly bins average ~7x fewer observations per cell, so the weekly fit
must show the larger nugget — asserted below. Writes comparison variogram
panels to examples/out/.
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import warnings

import numpy as np
import pandas as pd

warnings.filterwarnings("ignore")

OUT = pathlib.Path(__file__).parent / "out"
OUT.mkdir(exist_ok=True)


RHO = -0.6


def synthesize_daily(rng, days=180):
    """Daily obs on a 5-degree CONUS grid: smooth correlated fields with
    heavy daily measurement noise (what temporal averaging suppresses).

    The smooth components use spatial frequencies high enough that the
    Field pipeline's linear (lon/lat OLS) trend removal leaves them
    intact, and XCO2 carries an independent smooth component so the true
    smooth-field cross-correlation is RHO, not -1."""
    lats = np.arange(22.5, 52.6, 5.0)
    lons = np.arange(-125.0, -64.9, 5.0)
    glat, glon = np.meshgrid(lats, lons, indexing="ij")
    lat, lon = glat.ravel(), glon.ravel()
    times = pd.date_range("2019-01-01", periods=days, freq="D")
    season = np.sin(2 * np.pi * np.arange(days) / 365.0)

    def unit(f):
        return (f - f.mean()) / f.std()

    shared = unit(
        np.sin(np.deg2rad(lat) * 8.0)
        + 0.6 * np.cos(np.deg2rad(lon) * 6.0)
        + 0.4 * np.sin(np.deg2rad(lat * 3 + lon * 2))
    )
    own = unit(
        np.cos(np.deg2rad(lat) * 7.0) + 0.5 * np.sin(np.deg2rad(lon) * 5.0)
    )
    frames = []
    for k, t in enumerate(times):
        mod = 1.0 + 0.3 * season[k]
        sif = shared * mod + rng.normal(scale=0.6, size=len(lat))
        xco2 = (RHO * shared + np.sqrt(1 - RHO**2) * own) * mod + rng.normal(
            scale=0.6, size=len(lat)
        )
        frames.append(
            pd.DataFrame(
                {
                    "time": t,
                    "lat": lat,
                    "lon": lon,
                    "sif": sif,
                    "sif_var": 0.01,
                    "xco2": xco2,
                    "xco2_var": 0.01,
                }
            )
        )
    return pd.concat(frames, ignore_index=True)


def main():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from cokriging_tpu.data.grids import temporal_avg
    from cokriging_tpu.estimate import VarioConfig, empirical_variograms
    from cokriging_tpu.estimate.wls import fit_wls, moment_init
    from cokriging_tpu.fields import MultiField

    rng = np.random.default_rng(11)
    df = synthesize_daily(rng)

    results = {}
    for label, freq in (("weekly", "1W"), ("monthly", "1MS")):
        avg = temporal_avg(df, freq)
        # pick a timestamp mid-record at this resolution
        stamps = sorted(avg["time"].unique())
        ts = str(pd.Timestamp(stamps[len(stamps) // 2]).date())
        mf = MultiField.from_dataframes(
            [avg, avg],
            ["xco2", "sif"],
            [["lon", "lat"], ["lon", "lat"]],
            timestamp=ts,
            timedeltas=[0, 0],
        )
        est = empirical_variograms(
            mf, VarioConfig(max_dist=2.5e3, n_bins=12)
        )
        est_cov = empirical_variograms(
            mf, VarioConfig(max_dist=2.5e3, n_bins=12, kind="Covariogram")
        )
        params, res = fit_wls(est, init=moment_init(est))
        results[label] = (est, est_cov, params, res)
        nuggets = np.asarray(params.nugget)
        print(
            f"{label:8s} @ {ts}: WLS cost {res.cost:9.1f}, "
            f"nuggets {nuggets.round(3)}, "
            f"rho {float(np.asarray(params.rho[0, 1])):+.3f}, "
            f"cross-covariogram range "
            f"[{np.nanmin(est_cov.bin_means[1]):+.2f}, "
            f"{np.nanmax(est_cov.bin_means[1]):+.2f}]"
        )

    # weekly cells average ~7x fewer obs -> more residual measurement noise
    # -> larger fitted nugget overall
    nug_w = np.asarray(results["weekly"][2].nugget)
    nug_m = np.asarray(results["monthly"][2].nugget)
    assert nug_w.mean() >= nug_m.mean(), (nug_w, nug_m)
    # both resolutions must agree on the sign of the cross-correlation
    assert float(np.asarray(results["weekly"][2].rho[0, 1])) < 0
    assert float(np.asarray(results["monthly"][2].rho[0, 1])) < 0

    fig, axes = plt.subplots(2, 3, figsize=(15, 8), sharex=True)
    for r, label in enumerate(("weekly", "monthly")):
        est, _, params, res = results[label]
        theo = res.df_theoretical
        for k, (i, j) in enumerate(est.pairs):
            ax = axes[r, k]
            ax.plot(
                est.bin_centers[k], est.bin_means[k], "o", ms=4,
                label="empirical",
            )
            sub = theo.loc[(i, j)]  # (i, j) live in the multi-index
            ax.plot(sub["distance"], sub["variogram"], "-", label="fitted")
            ax.set_title(f"{label} ({i},{j})")
            if k == 0:
                ax.set_ylabel("semivariance")
        axes[r, 0].legend()
    for ax in axes[1]:
        ax.set_xlabel("distance (km)")
    fig.savefig(OUT / "weekly_monthly_variography.png", dpi=120, bbox_inches="tight")
    print(f"wrote {OUT / 'weekly_monthly_variography.png'}")


if __name__ == "__main__":
    main()
