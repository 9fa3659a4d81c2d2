"""Space-time lagged cross-covariance -> exact joint cokriging pipeline
(BASELINE config[3]; parity with research/optimal_lag.ipynb feeding the
timedeltas choice of research/modelling_demo_sif.ipynb, then
joint prediction as in research/modelling_comparison.ipynb cell 14).

1. synthetic monthly SIF/XCO2 cubes on the 4x5-degree CONUS grid where
   XCO2 anomalies follow SIF anomalies with a known 2-month lag;
2. the optimal-lag search (stats.optim_lag_nd, reference
   src/stat_tools.py:181-233) recovers the lag from the cubes alone; the
   modal lag sets the MultiField month offset (timedeltas, the reference's
   space-time-lag mechanism, src/fields.py:173-176);
3. bivariate Matern WLS fit at the recovered lag vs lag 0 (the lag must
   strictly improve the cross-structure), then exact joint cokriging with
   uncertainty on the 0.5-degree CONUS land grid
   (src/joint_prediction.py:35-92).

Writes prediction / uncertainty maps to examples/out/.
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

TRUE_LAG = 2  # months: XCO2 follows SIF by 2 months
RHO = -0.6


def synthesize_lagged_cubes(rng, months=48):
    """Monthly (cell, T) cubes on the 4x5-degree CONUS grid with a known
    SIF -> XCO2 lag, plus long-format frames for the field pipeline."""
    from cokriging_tpu.data.grids import main_coords_array

    coords = main_coords_array()
    n = len(coords)
    t = np.arange(months + TRUE_LAG)
    lat, lon = coords[:, 0], coords[:, 1]
    # Broadband smooth temporal signals (moving-average noise), NOT a pure
    # seasonal sinusoid: a single-frequency signal makes the lag
    # unidentifiable once XCO2 carries any phase-shifted component of its
    # own. The cross-correlation of broadband signals peaks exactly at the
    # physical lag. XCO2 also gets an independent smooth component so the
    # true smooth-field cross-correlation is RHO, not -1 (a perfectly
    # anti-correlated pair makes the joint covariance singular). Both
    # fields draw on a ~24-mode trig dictionary: with few spatial modes,
    # two independent snapshots of the same basis are strongly correlated
    # by chance (any single realized amplitude can also collapse,
    # re-pinning rho at -1); many modes keep per-month amplitudes stable
    # and chance correlations ~1/sqrt(n_modes).
    T = months + TRUE_LAG

    def smooth_series(m):
        raw = rng.normal(size=(m, T + 2))
        return (raw[:, :-2] + raw[:, 1:-1] + raw[:, 2:]) / np.sqrt(3.0)

    feats = []
    for f in range(2, 8):
        feats += [
            np.sin(np.deg2rad(lat) * f),
            np.cos(np.deg2rad(lon) * f),
            np.sin(np.deg2rad(lat + lon) * f / 1.5),
            np.cos(np.deg2rad(lat - lon) * f / 1.5),
        ]
    D = np.stack([(x - x.mean()) / x.std() for x in feats])  # (24, n)
    K = D.shape[0]
    base = D.T @ smooth_series(K) / np.sqrt(K)  # (n, T)
    own = D.T @ smooth_series(K) / np.sqrt(K)  # independent coefficients
    sif_full = base + 0.25 * rng.normal(size=(n, T))
    # XCO2 at month t responds to SIF's smooth field at month t - TRUE_LAG
    xco2 = (
        RHO * base[:, : -TRUE_LAG if TRUE_LAG else None]
        + np.sqrt(1.0 - RHO**2) * own[:, TRUE_LAG:]
        + 0.25 * rng.normal(size=(n, months))
    )
    sif = sif_full[:, TRUE_LAG:]  # align: column k = month k for both

    times = pd.date_range("2016-01-01", periods=months, freq="MS")

    def to_frame(cube, name):
        rows = []
        for k, ts in enumerate(times):
            rows.append(
                pd.DataFrame(
                    {
                        "time": ts,
                        "lat": lat,
                        "lon": lon,
                        name: cube[:, k],
                        f"{name}_var": 0.01,
                    }
                )
            )
        return pd.concat(rows, ignore_index=True)

    return sif, xco2, to_frame(sif, "sif"), to_frame(xco2, "xco2"), coords


def main():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from cokriging_tpu.cov import MultivariateMatern
    from cokriging_tpu.data.grids import main_coords_array, prediction_coords
    from cokriging_tpu.estimate import VarioConfig, empirical_variograms
    from cokriging_tpu.estimate.wls import fit_wls, moment_init
    from cokriging_tpu.fields import MultiField
    from cokriging_tpu.predict import JointPredictor
    from cokriging_tpu.stats import optim_lag_nd

    rng = np.random.default_rng(7)
    sif, xco2, df_sif, df_xco2, coords = synthesize_lagged_cubes(rng)

    # --- 1. optimal-lag search on the raw cubes ---
    # Convention (reference compute_xcor_1d, src/stat_tools.py:98-125):
    # xcor(Z1, Z2, lag) correlates Z1[t + lag] with Z2[t]. XCO2 at month t
    # responds to SIF at t - TRUE_LAG, so xco2[t + lag] tracks
    # sif[t + lag - TRUE_LAG] and the scan over optim_lag_nd(xco2, sif, ...)
    # peaks at lag = TRUE_LAG.
    lagres = optim_lag_nd(xco2, sif, (0, 6), tau=24)
    lags = lagres["optim_lag"]
    vals, counts = np.unique(lags[np.isfinite(lagres["xcor"])], return_counts=True)
    modal_lag = int(vals[np.argmax(counts)])
    print(
        f"optimal-lag search: modal lag = {modal_lag} months "
        f"(true {TRUE_LAG}); per-cell agreement "
        f"{(lags == TRUE_LAG).mean() * 100:.0f}%"
    )
    assert modal_lag == TRUE_LAG, "lag search failed to recover the true lag"

    # --- 2. fit at the recovered lag vs lag 0 ---
    # timedeltas=[0, -modal_lag]: pair this month's XCO2 with SIF
    # modal_lag months earlier (reference convention: [0, -1] = SIF lagged
    # one month behind XCO2).
    cfg = VarioConfig(max_dist=1.5e3, n_bins=12)
    timestamp = "2019-06-01"
    fits = {}
    for delta in (0, -modal_lag):
        mf = MultiField.from_dataframes(
            [df_xco2, df_sif],
            ["xco2", "sif"],
            [["lon", "lat"], ["lon", "lat"]],
            timestamp=timestamp,
            timedeltas=[0, delta],
            main_coords=main_coords_array(),
        )
        est = empirical_variograms(mf, cfg)
        params, res = fit_wls(est, init=moment_init(est))
        fits[delta] = (mf, est, params, res)
        print(
            f"timedelta {delta:+d}: WLS cost {res.cost:9.1f}, "
            f"rho {float(np.asarray(params.rho[0, 1])):+.3f}"
        )
    rho_lagged = abs(float(np.asarray(fits[-modal_lag][2].rho[0, 1])))
    rho_zero = abs(float(np.asarray(fits[0][2].rho[0, 1])))
    assert rho_lagged > rho_zero, (
        "the recovered lag must strengthen the fitted cross-correlation"
    )

    # --- 3. exact joint cokriging on the 0.5-degree CONUS land grid ---
    mf, est, params, res = fits[-modal_lag]
    # Unconstrained WLS (like the reference, whose validity check is a TODO
    # stub, src/model.py:172) can land on a non-PD bivariate Matern, which
    # makes the joint system Cholesky NaN. Project the fit onto the exact
    # spectral validity region (Gneiting 2010 Thm 3 bound on |rho|).
    from cokriging_tpu.cov.spectral import params_rho_max, project_to_valid

    nu12_raw = float(np.asarray(params.nu[0, 1]))
    # parsimony: unconstrained WLS can run nu12 to its bound (3.5), where
    # the exact |rho| bound collapses and plain clipping would erase the
    # cross-structure; the parsimonious choice nu12 = (nu11 + nu22)/2
    # keeps the admissible region wide (Gneiting et al. 2010 §3)
    params = project_to_valid(params, parsimony=True)
    bound = float(np.asarray(params_rho_max(params, 0, 1)))
    rho_v = float(np.asarray(params.rho[0, 1]))
    print(
        f"validity projection: nu12 {nu12_raw:.2f} -> "
        f"{float(np.asarray(params.nu[0, 1])):.2f}, |rho| bound {bound:.3f}, "
        f"rho -> {rho_v:+.3f}"
    )
    assert abs(rho_v) > 0.2, "projection erased the cross-structure"
    mod = MultivariateMatern(params=params)
    jp = JointPredictor(mod, mf)
    pcoords = prediction_coords()
    out = jp(0, pcoords, postprocess=False)
    assert np.isfinite(out["pred"]).all() and np.isfinite(out["pred_err"]).all()
    print(
        f"joint cokriging at {len(out)} half-degree land cells: "
        f"pred in [{out['pred'].min():.2f}, {out['pred'].max():.2f}], "
        f"mean pred_err {out['pred_err'].mean():.3f}"
    )

    fig, axes = plt.subplots(1, 2, figsize=(13, 4.5))
    for ax, col, cmap in ((axes[0], "pred", "RdBu_r"), (axes[1], "pred_err", "magma")):
        sc = ax.scatter(out["lon"], out["lat"], c=out[col], s=4, cmap=cmap)
        plt.colorbar(sc, ax=ax, shrink=0.85)
        ax.set_title(f"joint cokriging {col} (XCO2, lag {modal_lag} mo)")
    fig.savefig(OUT / "xcov_joint_pipeline.png", dpi=120, bbox_inches="tight")
    print(f"wrote {OUT / 'xcov_joint_pipeline.png'}")


if __name__ == "__main__":
    main()
