"""L2 North America case study: fine-resolution (0.05-degree) gridding of
raw L2-style soundings, OLS residuals (sif ~ lat + lon + evi), and a
standalone empirical semivariogram (parity with l2_north_america/*.ipynb).

Raw OCO-2 L2 archives are not present, so soundings are synthesized with a
smooth spatial field + noise; pass staged parquet via --soundings to run on
real data.
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


def main():
    import matplotlib

    matplotlib.use("Agg")

    from cokriging_tpu.data.grids import GridConfig, regrid
    from cokriging_tpu.estimate.empirical import (
        VarioConfig,
        empirical_variogram_pair,
    )
    from cokriging_tpu.fields.field import fit_ols

    parser = argparse.ArgumentParser()
    parser.add_argument("--soundings", default=None)
    args = parser.parse_args()

    if args.soundings:
        from cokriging_tpu.utils.io import load_table

        df = load_table(args.soundings)
    else:
        rng = np.random.default_rng(0)
        n = 60_000
        lat = rng.uniform(30, 50, n)
        lon = rng.uniform(-110, -80, n)
        evi = 0.3 + 0.2 * np.sin(np.deg2rad(lat) * 7) + rng.normal(0, 0.03, n)
        sif = (
            0.02 * lat
            - 0.01 * lon
            + 1.2 * evi
            + 0.4 * np.sin(np.deg2rad(lat * 3 + lon * 2))
            + rng.normal(0, 0.25, n)
        )
        df = pd.DataFrame(
            {"time": pd.Timestamp("2019-07-01"), "lat": lat, "lon": lon,
             "sif": sif, "evi": evi}
        )

    # 0.05-degree gridding (the notebooks' xesmf grid equivalent)
    cfg = GridConfig(extents=(-110, -80, 30, 50), lon_res=0.05, lat_res=0.05)
    grid_df = (
        regrid(df, cfg)
        .groupby(["lat", "lon"], as_index=False)[["sif", "evi"]]
        .mean()
    )
    print(f"{len(df)} soundings -> {len(grid_df)} cells at 0.05 degrees")

    # OLS residuals: sif ~ lat + lon + evi (standardized covariates)
    covs = grid_df[["lat", "lon", "evi"]].values
    fitted, icpt, coefs, means, scales = fit_ols(grid_df["sif"].values, covs)
    grid_df["resid"] = grid_df["sif"].values - fitted
    print("OLS coefs (std. lat, lon, evi):", np.round(coefs, 4))
    print("resid std:", grid_df["resid"].std().round(4))

    # standalone empirical semivariogram of the residuals (subsampled:
    # the full 0.05-deg cell set squares into billions of pairs)
    if len(grid_df) > 8000:
        grid_df = grid_df.sample(8000, random_state=0)
    coords = grid_df[["lat", "lon"]].values
    resid = grid_df["resid"].values
    vc = VarioConfig(max_dist=500.0, n_bins=20)
    centers, means_v, counts = empirical_variogram_pair(
        coords, resid, coords, resid, vc, marginal=True
    )
    print("semivariogram (km -> gamma):")
    for c, m in zip(centers[::4], means_v[::4]):
        print(f"  {c:7.1f}  {m:.4f}")

    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(6, 4))
    ax.scatter(centers, means_v, s=16)
    ax.set_xlabel("separation (km)")
    ax.set_ylabel("semivariance")
    ax.set_title("0.05-deg residual semivariogram (N. America)")
    fig.savefig(OUT / "l2_na_semivariogram.png", dpi=120)


if __name__ == "__main__":
    main()
