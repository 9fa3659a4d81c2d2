"""Per-dataset exploration EDA — parity with the reference's
research/explore_sif.ipynb and research/explore_evi.ipynb (the last
unported row of SURVEY §2.2's EDA suite):

explore_sif parity:
    1. single-granule sounding scatter map (cells 5-9);
    2. multi-granule ingest with the QC readers — concurrent open_mf,
       the open_mfdataset(parallel=True) analog (cell 11), serial-vs-
       concurrent timing printed;
    3. global monthly-mean SIF climatology series (cells 17-18);
    4. one month aggregated to a 1-degree grid and mapped (cells 20-22).

explore_evi parity:
    5. EVI spatial-mean time series (explore_evi cells 4, 8);
    6. one augmented-grid month snapshot + its main-coords subset
       (cells 9-10, get_main_coords);
    7. the 0.5-degree prediction-covariate EVI snapshot (cells 12-13).

Real OCO-2/MODIS archives are absent in this container; granules are the
same synthetic Lite files the ETL pipeline writes (examples/etl_pipeline).
"""

import pathlib
import sys
import time
import warnings

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np
import pandas as pd

warnings.filterwarnings("ignore")

OUT = pathlib.Path(__file__).parent / "out"


def sif_eda(rng):
    import matplotlib.pyplot as plt

    from cokriging_tpu.data.grids import GridConfig, regrid
    from cokriging_tpu.data.readers import open_mf, prep_sif
    from cokriging_tpu.plot import plot_df
    from etl_pipeline import stage0_write_granules

    sif_paths, _ = stage0_write_granules(rng)

    # 1. single-granule scatter (explore_sif cells 5-9)
    df_one = open_mf(sif_paths[:1], prep_sif)
    ax = plot_df(df_one, "sif", title="Daily SIF 740nm — one Lite granule",
                 coastlines=True)
    ax.get_figure().savefig(OUT / "explore_sif_granule.png", dpi=120)
    print(f"single granule: {len(df_one)} soundings pass QC")

    # 2. archive ingest, serial vs concurrent (cell 11's parallel=True)
    t0 = time.perf_counter()
    df_serial = open_mf(sif_paths, prep_sif, workers=1)
    t_serial = time.perf_counter() - t0
    t0 = time.perf_counter()
    df = open_mf(sif_paths, prep_sif, workers=8)
    t_conc = time.perf_counter() - t0
    pd.testing.assert_frame_equal(df, df_serial)  # order-stable parity
    print(
        f"ingest {len(sif_paths)} granules: serial {t_serial:.2f} s, "
        f"concurrent {t_conc:.2f} s ({t_serial / max(t_conc, 1e-9):.1f}x)"
    )

    # 3. monthly climatology of the global average (cells 17-18)
    clim = (
        df.set_index("time")["sif"].resample("1MS").mean().rename("sif")
    )
    fig, ax = plt.subplots(figsize=(7, 4))
    clim.plot(ax=ax, marker="o")
    ax.set_ylabel("SIF 740nm")
    ax.set_title("Monthly climatology of SIF (global average)")
    fig.tight_layout()
    fig.savefig(OUT / "explore_sif_climatology.png", dpi=120)
    print("monthly climatology:")
    print(clim.to_string())

    # 4. one month on a 1-degree grid (cells 20-22)
    month = df[df["time"].dt.to_period("M") == df["time"].dt.to_period("M").iloc[0]]
    grid = regrid(month, GridConfig(lon_res=1.0, lat_res=1.0))
    cell_means = (
        grid.groupby(["lat", "lon"], as_index=False)["sif"].mean()
    )
    ax = plot_df(cell_means, "sif", title="SIF, one month on the 1-degree grid",
                 coastlines=True)
    ax.get_figure().savefig(OUT / "explore_sif_1deg_month.png", dpi=120)
    print(f"1-degree month grid: {len(cell_means)} nonempty cells")


def evi_eda(rng):
    import matplotlib.pyplot as plt

    from cokriging_tpu.data.grids import (
        augment_dataset,
        augment_dataset_pred,
        main_coords_array,
    )
    from cokriging_tpu.plot import plot_df

    # synthetic monthly EVI on the 4x5-degree CONUS grid (stand-in for
    # MODIS_EVI_conus.nc); seasonal cycle + spatial structure
    main = main_coords_array()
    months = pd.date_range("2019-01-01", periods=6, freq="MS")
    rows = []
    for k, t in enumerate(months):
        evi = (
            0.3
            + 0.15 * np.sin(2 * np.pi * (k - 2) / 12.0)
            + 0.1 * np.cos(np.deg2rad(main[:, 0]) * 4)
            + 0.02 * rng.normal(size=len(main))
        )
        rows.append(
            pd.DataFrame(
                {"time": t, "lat": main[:, 0], "lon": main[:, 1], "evi": evi}
            )
        )
    df = pd.concat(rows, ignore_index=True)

    # 5. spatial-mean series (explore_evi cells 4, 8)
    series = df.groupby("time")["evi"].mean()
    fig, ax = plt.subplots(figsize=(7, 4))
    series.plot(ax=ax, marker="o")
    ax.set_ylabel("EVI")
    ax.set_title("EVI spatial mean by month")
    fig.tight_layout()
    fig.savefig(OUT / "explore_evi_series.png", dpi=120)
    print("EVI monthly spatial means:")
    print(series.round(4).to_string())

    # 6. augmented month snapshot + main-coords subset (cells 9-10)
    aug = augment_dataset(df)
    snap = aug[aug["time"] == months[3]]
    ax = plot_df(snap, "evi", title="Augmented EVI, one month", coastlines=True)
    ax.get_figure().savefig(OUT / "explore_evi_augmented.png", dpi=120)
    main_set = {(round(a, 6), round(b, 6)) for a, b in main}
    is_main = [
        (round(a, 6), round(b, 6)) in main_set
        for a, b in snap[["lat", "lon"]].values
    ]
    snap_main = snap[np.asarray(is_main)]
    ax = plot_df(
        snap_main, "evi", title="Augmented EVI, main 4x5-degree subset",
        coastlines=True,
    )
    ax.get_figure().savefig(OUT / "explore_evi_main.png", dpi=120)
    print(
        f"augmented month: {len(snap)} cells, main subset {len(snap_main)}"
    )

    # 7. 0.5-degree prediction-covariate snapshot (cells 12-13)
    pred = augment_dataset_pred(df[df["time"] == months[3]])
    ax = plot_df(pred, "evi", title="EVI on the 0.5-degree prediction mesh",
                 coastlines=True)
    ax.get_figure().savefig(OUT / "explore_evi_halfdeg.png", dpi=120)
    print(f"0.5-degree covariate mesh: {len(pred)} cells")


def main():
    import matplotlib

    matplotlib.use("Agg")
    OUT.mkdir(exist_ok=True)
    rng = np.random.default_rng(0)
    sif_eda(rng)
    evi_eda(rng)
    print(f"figures written to {OUT}")


if __name__ == "__main__":
    main()
