"""Variography study: fit quality as a function of binning and space-time
lag (parity with research/variography_*.ipynb and
variogram_microlag_demo.ipynb).

Sweeps n_bins and the per-process month offset (timedelta) on synthetic
monthly data and reports the composite WLS cost of each configuration —
the reference's month/season/timedelta comparisons as one batched run.
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
    import pandas as pd

    from cokriging_tpu.data.grids import main_coords_array
    from cokriging_tpu.estimate import VarioConfig, empirical_variograms
    from cokriging_tpu.estimate.wls import fit_wls
    from cokriging_tpu.fields import MultiField
    from examples.modelling_demo import synthesize_monthly

    rng = np.random.default_rng(3)
    df_xco2 = synthesize_monthly("xco2", rng, months=8)
    shared = {
        k: df_xco2[df_xco2.time == t]["base"].values
        for k, t in enumerate(sorted(df_xco2.time.unique()))
    }
    df_sif = synthesize_monthly("sif", rng, months=8, correlate_with=shared)

    results = []
    for timedelta in [0, -1, -2]:
        mf = MultiField.from_dataframes(
            [df_xco2, df_sif],
            ["xco2", "sif"],
            [["lon", "lat"], ["lon", "lat"]],
            timestamp="2019-05-01",
            timedeltas=[0, timedelta],
            main_coords=main_coords_array(),
        )
        for n_bins in [10, 15, 20]:
            est = empirical_variograms(
                mf, VarioConfig(max_dist=1.5e3, n_bins=n_bins)
            )
            params, res = fit_wls(est)
            results.append(
                {
                    "timedelta": timedelta,
                    "n_bins": n_bins,
                    "cost": res.cost,
                    "cost_per_pair": res.cost / est.bin_counts.sum(),
                    "rho": float(np.asarray(params.rho[0, 1])),
                    "cs_valid": res.cs_valid,
                }
            )
            print(results[-1])

    df = pd.DataFrame(results)
    fig, ax = plt.subplots(figsize=(7, 4))
    for td, g in df.groupby("timedelta"):
        ax.plot(g["n_bins"], g["cost_per_pair"], marker="o", label=f"timedelta {td}")
    ax.set_xlabel("n_bins")
    ax.set_ylabel("WLS cost per pair")
    ax.legend()
    ax.set_title("fit quality vs binning and space-time lag")
    fig.savefig(OUT / "variography_study.png", dpi=120)


if __name__ == "__main__":
    main()
