"""Full-record workflow: the reference's 71-month science span in one
mesh-sharded batched fit.

The reference's record runs 2014-09 -> 2020-07 (~71 monthly grids,
scripts/process_lite_files.ipynb cell 2) but every notebook fits ONE month
per run (src/model.py:285-317). Here the whole record is processed as a
batch: per-month empirical (cross-)variograms through one cached fused
device program, then `fit_wls_batch` — a single vmapped on-device L-BFGS
program over all 71 months, sharded over the device mesh when one is
available — and finally multi-month cokriging maps whose pow2-bucketed
neighborhoods reuse one compiled prediction program across months.

Data are synthetic at the real record's shape (4x5-degree CONUS main grid,
bivariate Matern residual cross-structure, month-varying amplitude), since
the OCO-2/MODIS archives are not bundled. Writes a results/ manifest with
the per-stage wall-clock and the fitted-parameter seasonal track.
"""

import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import warnings

import numpy as np
import pandas as pd

warnings.filterwarnings("ignore")

OUT = pathlib.Path(__file__).parent / "out"

N_MONTHS = 71  # 2014-09 .. 2020-07, the reference record's span


def main():
    import jax

    from cokriging_tpu.cov import MultivariateMatern
    from cokriging_tpu.data.grids import main_coords_array, prediction_coords
    from cokriging_tpu.estimate import (
        VarioConfig,
        empirical_variograms,
        fit_wls_batch,
    )
    from cokriging_tpu.estimate.wls import moment_init
    from cokriging_tpu.fields import MultiField
    from cokriging_tpu.predict import LocalPredictor
    from cokriging_tpu.utils.config import compute_dtype
    from cokriging_tpu.utils.results import record_manifest

    from modelling_comparison import synthesize_conus_months, _evi_surface

    on_tpu = jax.default_backend() == "tpu"
    dtype = compute_dtype()
    months = int(os.environ.get("FULL_RECORD_MONTHS", N_MONTHS if on_tpu else 8))
    n_pred_months = 3 if on_tpu else 1
    pred_stride = 1 if on_tpu else 8
    wall = {}
    print(f"backend={jax.default_backend()} months={months}")

    # ------------------------------------------------------------------
    # synthetic record at the real shape
    # ------------------------------------------------------------------
    t0 = time.perf_counter()
    df_xco2, df_sif = synthesize_conus_months(seed=0, months=months)
    main_c = main_coords_array()
    wall["synthesize"] = time.perf_counter() - t0

    # ------------------------------------------------------------------
    # per-month fields + empirical variograms (one cached fused program)
    # ------------------------------------------------------------------
    t0 = time.perf_counter()
    stamps = sorted(df_xco2.time.unique())[1:]  # SIF needs month k-1
    cfg = VarioConfig(max_dist=1.5e3, n_bins=15, n_procs=2)
    mfs, ests, used_stamps = [], [], []
    for ts in stamps:
        ts = pd.Timestamp(ts)
        try:
            mf = MultiField.from_dataframes(
                [df_xco2, df_sif],
                ["xco2", "sif"],
                [["lon", "lat"], ["evi"]],
                timestamp=str(ts.date()),
                timedeltas=[0, -1],
                main_coords=main_c,
            ).astype(dtype)
        except (KeyError, ValueError):
            continue  # month missing from one process (record edges)
        mfs.append(mf)
        ests.append(empirical_variograms(mf, cfg))
        used_stamps.append(str(ts.date()))
    wall["variograms_all_months"] = time.perf_counter() - t0
    print(
        f"{len(ests)} monthly variogram sets in "
        f"{wall['variograms_all_months']:.1f}s"
    )

    # ------------------------------------------------------------------
    # ONE batched fit over the whole record (mesh-sharded when available)
    # ------------------------------------------------------------------
    from cokriging_tpu.cov.params import ParamSpec
    from cokriging_tpu.parallel import make_mesh

    mesh = make_mesh() if len(jax.devices()) > 1 else None
    # Thin monthly estimates (~55 SIF cells at 0.55 coverage) often have
    # their raw composite-WLS minimum AT |rho| = 1, where the joint model
    # is singular and every downstream prediction NaNs out — the
    # reference's unchecked-validity failure mode (its cs_check is an
    # unimplemented stub, src/model.py:172, 336-343). The record workflow
    # therefore (a) bounds rho inside the singular boundary, (b) adds the
    # Cauchy-Schwarz validity penalty, and (c) starts each month from its
    # own moment init; months that still land on the rho bound are
    # reported in the manifest rather than silently mapped.
    spec = ParamSpec(n_procs=2, rho_bounds=(-0.95, 0.95))
    t0 = time.perf_counter()
    # project_validity="parsimony": thin monthly cross-variograms routinely
    # fit nu12 below the Gneiting floor (nu11+nu22)/2, where the EXACT
    # spectral rho bound is 0 — the box-bounded rho and the pointwise
    # Cauchy-Schwarz penalty cannot see that, and every local Cholesky at
    # prediction time NaNs. Snapping the cross structure onto the
    # parsimonious Matern (Gneiting et al. 2010 Sec 3) keeps the fitted
    # marginals and rho while guaranteeing a PD joint covariance.
    params_list, costs, conv = fit_wls_batch(
        ests, init=moment_init(ests[0], spec=spec), maxiter=300, mesh=mesh,
        validity_weight=1.0, per_month_init=True,
        project_validity="parsimony",
    )
    conv = np.asarray(conv)
    wall["batched_fit"] = time.perf_counter() - t0
    rhos = np.array([float(p.rho[0, 1]) for p in params_list])
    n_pegged = int((np.abs(rhos) > 0.94).sum())
    print(
        f"batched WLS fit: {len(params_list)} months in one dispatch, "
        f"{wall['batched_fit']:.1f}s; rho range "
        f"[{rhos.min():+.2f}, {rhos.max():+.2f}], "
        f"median cost {np.median(costs):.1f}, "
        f"{conv.sum()}/{len(conv)} converged, {n_pegged} on the rho bound"
    )

    # ------------------------------------------------------------------
    # multi-month cokriging maps (shared compiled prediction program)
    # ------------------------------------------------------------------
    pcoords = prediction_coords().iloc[::pred_stride]
    cov_pred = pcoords.copy()
    cov_pred["evi"] = _evi_surface(
        cov_pred["lat"].values, cov_pred["lon"].values
    )
    pick = np.linspace(0, len(mfs) - 1, n_pred_months).astype(int)
    t0 = time.perf_counter()
    preds = {}
    for k in pick:
        lp = LocalPredictor(
            MultivariateMatern(2, params_list[k].astype(dtype)), mfs[k],
            covariates=cov_pred,
        )
        preds[used_stamps[k]] = lp(1, pcoords, max_dist=1e3)
    wall["predict_months"] = time.perf_counter() - t0
    finite = {
        ts: float(np.isfinite(df["pred"].values).mean())
        for ts, df in preds.items()
    }
    print(
        f"cokriged {len(pick)} months x {len(pcoords)} cells in "
        f"{wall['predict_months']:.1f}s; finite fractions {finite}"
    )

    # multi-month map figure
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from cokriging_tpu.plot import plot_df

    OUT.mkdir(exist_ok=True)
    fig, axes = plt.subplots(
        1, len(preds), figsize=(5.5 * len(preds), 3.6), squeeze=False
    )
    for ax, (ts, df) in zip(axes[0], preds.items()):
        plot_df(df.dropna(subset=["pred"]), "pred", ax=ax, title=f"SIF {ts}")
    fig.tight_layout()
    fig.savefig(OUT / "full_record_months.png", dpi=120)

    record_manifest(
        "full_record",
        {
            "months_fit": len(params_list),
            "record_span": [used_stamps[0], used_stamps[-1]],
            "mesh_devices": int(mesh.devices.size) if mesh else 1,
            "rho_track": [round(float(r), 3) for r in rhos],
            "n_converged": int(conv.sum()),
            "n_rho_bound": n_pegged,
            "median_cost": round(float(np.median(costs)), 2),
            "pred_months": list(preds.keys()),
            "pred_cells_per_month": int(len(pcoords)),
            "pred_finite_frac": finite,
            "wall_s": {k: round(v, 1) for k, v in wall.items()},
            "wall_total_s": round(sum(wall.values()), 1),
        },
    )
    assert np.isfinite(costs).all()
    assert min(finite.values()) > 0.9


if __name__ == "__main__":
    if os.environ.get("COKRIGING_FORCE_CPU") == "1":
        import jax

        jax.config.update("jax_platforms", "cpu")
    main()
