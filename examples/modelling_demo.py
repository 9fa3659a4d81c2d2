"""Bivariate SIF-XCO2 modelling workflow (parity with
research/modelling_demo_sif.ipynb):

    gridded monthly frames -> MultiField (trend removal, month offsets)
    -> empirical (cross-)semivariograms -> composite WLS Matern fit
    -> local cokriging with uncertainty on the 0.5-degree CONUS land grid
    -> back-transform to data scale.

Real OCO-2/MODIS archives are not present in this container, so the script
synthesizes gridded monthly observations with the same schema the data
layer produces (pass --sif/--xco2 parquet paths from data.readers +
data.grids to run on real artifacts). Writes figures to examples/out/.
"""

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import warnings

import numpy as np
import pandas as pd

warnings.filterwarnings("ignore")

OUT = pathlib.Path(__file__).parent / "out"
OUT.mkdir(exist_ok=True)


def synthesize_monthly(name, rng, months=6, correlate_with=None, rho=-0.6):
    """Augmented-style monthly CONUS frame with a smooth field + noise."""
    from cokriging_tpu.data.grids import main_coords_array

    coords = main_coords_array()  # base 4x5-degree CONUS centers
    times = pd.date_range("2019-01-01", periods=months, freq="MS")
    rows = []
    for k, t in enumerate(times):
        lat, lon = coords[:, 0], coords[:, 1]
        base = np.sin(np.deg2rad(lat) * 5 + k / 3) + 0.5 * np.cos(
            np.deg2rad(lon) * 3
        )
        if correlate_with is not None:
            base = rho * correlate_with[k] + np.sqrt(1 - rho**2) * base
        vals = 0.05 * k + base + rng.normal(scale=0.3, size=len(lat))
        rows.append(
            pd.DataFrame(
                {
                    "time": t,
                    "lat": lat,
                    "lon": lon,
                    name: vals,
                    f"{name}_var": 0.01,
                    "base": base,
                }
            )
        )
    return pd.concat(rows, ignore_index=True)


def main():
    import matplotlib

    matplotlib.use("Agg")

    from cokriging_tpu.cov import MaternParams, MultivariateMatern
    from cokriging_tpu.data.grids import main_coords_array, prediction_coords
    from cokriging_tpu.estimate import VarioConfig, empirical_variograms
    from cokriging_tpu.estimate.wls import fit_wls
    from cokriging_tpu.fields import MultiField
    from cokriging_tpu.predict import LocalPredictor
    from cokriging_tpu.plot import plot_fields, plot_variograms, plot_df

    parser = argparse.ArgumentParser()
    parser.add_argument("--sif", default=None, help="staged SIF parquet")
    parser.add_argument("--xco2", default=None, help="staged XCO2 parquet")
    parser.add_argument("--timestamp", default="2019-04-01")
    args = parser.parse_args()

    rng = np.random.default_rng(0)
    if args.sif and args.xco2:
        from cokriging_tpu.utils.io import load_table

        df_xco2 = load_table(args.xco2)
        df_sif = load_table(args.sif)
    else:
        df_xco2 = synthesize_monthly("xco2", rng)
        shared = {
            k: df_xco2[df_xco2.time == t]["base"].values
            for k, t in enumerate(sorted(df_xco2.time.unique()))
        }
        df_sif = synthesize_monthly("sif", rng, correlate_with=shared)
        df_sif["evi"] = 0.3 + 0.1 * np.cos(np.deg2rad(df_sif["lat"] * 4))

    # SIF lagged one month behind XCO2 (timedeltas=[0, -1], the space-time
    # lag mechanism, src/fields.py:135-176); XCO2 detrended on lon/lat,
    # SIF on EVI when present (research/modelling_demo.ipynb cell 2).
    sif_covs = ["evi"] if "evi" in df_sif.columns else ["lon", "lat"]
    mf = MultiField.from_dataframes(
        [df_xco2, df_sif],
        ["xco2", "sif"],
        [["lon", "lat"], sif_covs],
        timestamp=args.timestamp,
        timedeltas=[0, -1],
        main_coords=main_coords_array(),
    )
    plot_fields(mf).savefig(OUT / "demo_fields.png", dpi=120)

    from cokriging_tpu.estimate.wls import moment_init

    est = empirical_variograms(mf, VarioConfig(max_dist=1.5e3, n_bins=15))
    params, result = fit_wls(est, init=moment_init(est))
    print("fitted params:")
    print(params.to_dataframe().to_string(index=False))
    plot_variograms(result, names=["xco2", "sif"]).savefig(
        OUT / "demo_variograms.png", dpi=120
    )

    # local cokriging of SIF (process 1) on the 0.5-degree land grid
    mod = MultivariateMatern(params=params)
    pcoords = prediction_coords()
    lp = LocalPredictor(mod, mf)
    ds = lp(1, pcoords, max_dist=1e3, postprocess=False)
    print(ds[["pred", "pred_err"]].describe().to_string())
    plot_df(ds.dropna(), "pred", title="SIF cokriging (standardized)").get_figure().savefig(
        OUT / "demo_prediction.png", dpi=120
    )
    plot_df(ds.dropna(), "pred_err", title="prediction std").get_figure().savefig(
        OUT / "demo_prediction_err.png", dpi=120
    )

    # LOOCV diagnostics (modelling_comparison.ipynb cells 34-35)
    cv = lp.cross_validation(1, max_dist=1e3, postprocess=False)
    resid = cv["residual"].dropna()
    print(f"LOOCV MSPE {np.mean(resid**2):.4f} MAPE {np.mean(np.abs(resid)):.4f}")


if __name__ == "__main__":
    main()
