"""Univariate SIF kriging demo — BASELINE config[0], parity with
research/univariate_demo_sif.ipynb:

    monthly 4x5-degree SIF frame -> Field (trend removal: temporal trend,
    OLS on the standardized EVI covariate, residual standardization)
    -> empirical semivariogram -> WLS Matern fit -> local simple kriging
    with uncertainty on the 0.5-degree CONUS land grid -> back-transform
    -> LOOCV diagnostics.

CPU-runnable: sizes are the reference's own (one month, ~10^2 main-grid
cells, ~6k prediction cells). Synthetic data comes from the same
augmented-CONUS-shaped generator the kriging-vs-cokriging comparison
uses (examples/modelling_comparison.py); pass --sif staged parquet to run
on a real artifact.

Run: python examples/univariate_demo.py   (writes examples/out/uni_*.png)
"""

import argparse
import pathlib
import sys
import warnings

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

import matplotlib

matplotlib.use("Agg")

import numpy as np
import pandas as pd

warnings.filterwarnings("ignore")

OUT = pathlib.Path(__file__).parent / "out"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sif", default=None, help="staged parquet of monthly SIF")
    ap.add_argument("--timestamp", default="2019-04-01")
    ap.add_argument("--max-dist", type=float, default=1.0e3)
    ap.add_argument("--maxiter", type=int, default=400)
    args = ap.parse_args()

    from modelling_comparison import _evi_surface, synthesize_conus_months

    from cokriging_tpu.cov import MultivariateMatern
    from cokriging_tpu.data.grids import main_coords_array, prediction_coords
    from cokriging_tpu.estimate import VarioConfig, empirical_variograms
    from cokriging_tpu.estimate.wls import fit_wls, moment_init
    from cokriging_tpu.fields import MultiField
    from cokriging_tpu.plot import plot_cv_resid, plot_df, plot_variograms
    from cokriging_tpu.utils.io import load_table, save_table

    OUT.mkdir(exist_ok=True)
    if args.sif:
        df_sif = load_table(args.sif)
    else:
        _, df_sif = synthesize_conus_months(seed=0, months=6)

    # one-process field with EVI spatial-trend covariate
    mf = MultiField.from_dataframes(
        [df_sif], ["sif"], [["evi"]], timestamp=args.timestamp,
        timedeltas=[0], main_coords=main_coords_array(),
    )

    # empirical semivariogram + WLS Matern fit
    est = empirical_variograms(
        mf, VarioConfig(max_dist=1.5e3, n_bins=15, n_procs=1)
    )
    params, result = fit_wls(
        est, init=moment_init(est), method="adam", maxiter=args.maxiter
    )
    print("fitted params:\n", params.to_dataframe())
    print("WLS cost:", float(result.cost))
    plot_variograms(result, names=["SIF"]).savefig(
        OUT / "uni_variogram.png", dpi=110
    )

    # local simple kriging on the 0.5-degree land grid, back-transformed
    pcoords = prediction_coords()
    cov_pred = pcoords.copy()
    cov_pred["evi"] = _evi_surface(cov_pred["lat"].values, cov_pred["lon"].values)
    from cokriging_tpu.predict import LocalPredictor

    krig = LocalPredictor(MultivariateMatern(1, params), mf, covariates=cov_pred)
    df_pred = krig(0, pcoords, max_dist=args.max_dist)
    save_table(OUT / "uni_predictions.parquet", df_pred)
    plot_df(df_pred, "pred", title="SIF kriging prediction", cmap="RdYlGn").figure.savefig(
        OUT / "uni_pred.png", dpi=110
    )
    plot_df(df_pred, "pred_err", title="SIF kriging std. error", cmap="magma").figure.savefig(
        OUT / "uni_pred_err.png", dpi=110
    )

    # LOOCV diagnostics (MSPE/MAPE as in plot_cv_resid, src/plot.py:524-538)
    cv = krig.cross_validation(0, max_dist=args.max_dist)
    plot_cv_resid(cv, "SIF").savefig(OUT / "uni_cv_resid.png", dpi=110)
    r = cv["residual"].dropna()
    print(f"LOOCV MSPE={np.mean(r**2):.4f}  MAPE={np.mean(np.abs(r)):.4f}")
    print(f"wrote figures + predictions to {OUT}")


if __name__ == "__main__":
    main()
