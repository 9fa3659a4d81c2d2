"""Staged-artifact ETL pipeline, end to end (L0 granules -> fitted model).

Parity with the reference's scripts/ layer and its checkpoint-by-artifact
design (SURVEY §5): each stage writes a file and the next stage consumes
ONLY that file — scripts/process_lite_files.ipynb (Lite ingest) ->
process_gridded_conus45_microadjust.ipynb (17-offset augmented monthly
grid) -> research/modelling_demo_sif.ipynb (field construction + fit).

1. L0: synthetic OCO-2 "Lite granules" as HDF5 files, including QC-flagged
   and negative-SIF soundings that the readers must drop
   (src/data_utils.py:21-93 semantics);
2. Lite ingest: open_mf + prep_sif / prep_xco2; the point-cloud stage is
   checkpointed as parquet (save_table — point clouds don't pivot onto a
   dense grid, a documented deviation from the reference's NetCDF here);
3. augmented gridded monthly stage: augment_dataset 17-offset pooling ->
   save_dataset NetCDF (the reference's
   OCO2_4x5deg_monthly_conus_augmented.nc artifact);
4. model stage: load_dataset -> MultiField -> empirical variograms ->
   WLS fit -> save_params npz.

Run: python examples/etl_pipeline.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import warnings

import numpy as np
import pandas as pd

warnings.filterwarnings("ignore")

OUT = pathlib.Path(__file__).parent / "out" / "etl"
OUT.mkdir(parents=True, exist_ok=True)

RHO = -0.6
N_MONTHS = 3
GRANULES_PER_MONTH = 8
SOUNDINGS = 1500


def _smooth_field(lat, lon, rng=None, seed_feats=None):
    """Unit-variance smooth CONUS field from a trig dictionary."""
    feats = []
    for f in range(2, 8):
        feats += [
            np.sin(np.deg2rad(lat) * f),
            np.cos(np.deg2rad(lon) * f),
            np.sin(np.deg2rad(lat + lon) * f / 1.5),
        ]
    D = np.stack(feats)
    w = seed_feats if seed_feats is not None else rng.normal(size=D.shape[0])
    v = D.T @ w / np.sqrt(D.shape[0])
    return (v - v.mean()) / v.std()


def stage0_write_granules(rng):
    """L0: daily Lite granules with realistic QC structure."""
    import h5py

    w_shared = rng.normal(size=18)
    w_own = rng.normal(size=18)
    sif_paths, xco2_paths = [], []
    day0 = pd.Timestamp("2019-04-01")
    for g in range(N_MONTHS * GRANULES_PER_MONTH):
        t = day0 + pd.DateOffset(days=int(g * 30 / GRANULES_PER_MONTH))
        t_ns = np.full(SOUNDINGS, t.value, dtype="i8")
        lat = rng.uniform(24.0, 50.0, SOUNDINGS)
        lon = rng.uniform(-124.0, -67.0, SOUNDINGS)
        shared = _smooth_field(lat, lon, seed_feats=w_shared)
        own = _smooth_field(lat, lon, seed_feats=w_own)

        sif = shared + rng.normal(scale=0.4, size=SOUNDINGS)
        sif_sigma = np.full(SOUNDINGS, 0.3)
        flag = rng.choice([0, 0, 0, 0, 1, 2], size=SOUNDINGS)
        # a few strongly negative soundings fail the SIF + 3 sigma > 0 QC
        sif[: SOUNDINGS // 50] = -5.0
        p = OUT / f"oco2_LtSIF_{g:03d}.h5"
        with h5py.File(p, "w") as f:
            f["Daily_SIF_740nm"] = sif
            f["SIF_Uncertainty_740nm"] = sif_sigma
            f["Quality_Flag"] = flag
            f["Longitude"] = lon
            f["Latitude"] = lat
            f["Delta_Time"] = t_ns
        sif_paths.append(p)

        xco2 = (
            400.0
            + RHO * shared
            + np.sqrt(1 - RHO**2) * own
            + rng.normal(scale=0.4, size=SOUNDINGS)
        )
        p = OUT / f"oco2_LtCO2_{g:03d}.h5"
        with h5py.File(p, "w") as f:
            f["xco2"] = xco2
            f["xco2_uncertainty"] = np.full(SOUNDINGS, 0.5)
            f["xco2_quality_flag"] = rng.choice([0, 0, 0, 1], size=SOUNDINGS)
            f["longitude"] = lon
            f["latitude"] = lat
            f["time"] = t_ns
        xco2_paths.append(p)
    print(f"stage 0: wrote {len(sif_paths)} SIF + {len(xco2_paths)} XCO2 granules")
    return sif_paths, xco2_paths


def stage1_lite_ingest(sif_paths, xco2_paths):
    """Lite ingest with the reference QC filters; parquet checkpoint."""
    from cokriging_tpu.data.readers import open_mf, prep_sif, prep_xco2
    from cokriging_tpu.utils.io import save_table

    df_sif = open_mf(sif_paths, prep_sif)
    df_xco2 = open_mf(xco2_paths, prep_xco2)
    n_raw = N_MONTHS * GRANULES_PER_MONTH * SOUNDINGS
    assert len(df_sif) < n_raw and len(df_xco2) < n_raw  # QC dropped rows
    save_table(OUT / "OCO2_Lite_SIF740.parquet", df_sif)
    save_table(OUT / "OCO2_Lite_XCO2.parquet", df_xco2)
    print(
        f"stage 1: Lite ingest {len(df_sif)}/{n_raw} SIF, "
        f"{len(df_xco2)}/{n_raw} XCO2 soundings pass QC"
    )


def stage2_augmented_grid():
    """17-offset augmented 4x5-degree monthly CONUS grid -> NetCDF."""
    from cokriging_tpu.data.grids import augment_dataset
    from cokriging_tpu.utils.io import load_table, save_dataset

    for name in ("SIF740", "XCO2"):
        df = load_table(OUT / f"OCO2_Lite_{name}.parquet")
        aug = augment_dataset(df)
        save_dataset(OUT / f"OCO2_4x5deg_monthly_conus_augmented_{name}.nc", aug)
        cells = aug[["lat", "lon"]].drop_duplicates().shape[0]
        print(
            f"stage 2: {name} augmented grid — {cells} distinct cells, "
            f"{len(aug)} rows -> NetCDF"
        )


def stage3_fit():
    """Artifact -> fields -> empirical variograms -> WLS fit -> params.npz."""
    from cokriging_tpu.data.grids import main_coords_array
    from cokriging_tpu.estimate import VarioConfig, empirical_variograms
    from cokriging_tpu.estimate.wls import fit_wls, moment_init
    from cokriging_tpu.fields import MultiField
    from cokriging_tpu.utils.io import load_dataset, save_params

    df_sif = load_dataset(
        OUT / "OCO2_4x5deg_monthly_conus_augmented_SIF740.nc"
    ).dropna(subset=["sif"])
    df_xco2 = load_dataset(
        OUT / "OCO2_4x5deg_monthly_conus_augmented_XCO2.nc"
    ).dropna(subset=["xco2"])
    mf = MultiField.from_dataframes(
        [df_xco2, df_sif],
        ["xco2", "sif"],
        [["lon", "lat"], ["lon", "lat"]],
        timestamp="2019-05-01",
        timedeltas=[0, 0],
        main_coords=main_coords_array(),
    )
    est = empirical_variograms(mf, VarioConfig(max_dist=2.0e3, n_bins=12))
    params, res = fit_wls(est, init=moment_init(est))
    save_params(OUT / "fitted_params.npz", params, metadata={"cost": res.cost})
    rho = float(np.asarray(params.rho[0, 1]))
    print(
        f"stage 3: fit on n={mf.n_data} augmented cells — WLS cost "
        f"{res.cost:.1f}, rho {rho:+.3f} (truth {RHO:+.1f})"
    )
    assert rho < -0.2, "fit failed to recover the negative cross-correlation"
    return params


def main():
    rng = np.random.default_rng(42)
    sif_paths, xco2_paths = stage0_write_granules(rng)
    stage1_lite_ingest(sif_paths, xco2_paths)
    stage2_augmented_grid()
    params = stage3_fit()
    print("ETL pipeline complete; artifacts in", OUT)
    return params


if __name__ == "__main__":
    main()
