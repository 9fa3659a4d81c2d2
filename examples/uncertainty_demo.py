"""Parameter uncertainty + conditional simulation — the two quantifications
the reference never produced.

On a simulated bivariate cofield (truth known), this workflow:
- fits by composite WLS, then attaches a parametric-bootstrap sampling
  distribution (`estimate.parametric_bootstrap`: simulate -> re-estimate ->
  refit, all as batched device programs);
- fits by exact maximum likelihood and attaches asymptotic standard errors
  from the NLL Hessian (`estimate.nll_std_errors`);
- checks both uncertainty reports against the truth (the generator should
  land inside ~95% intervals for the well-identified parameters);
- draws conditional simulations from the joint posterior
  (`JointPredictor.sample`) and contrasts three equiprobable realizations
  with the posterior mean/err maps — spatially correlated uncertainty that
  pointwise pred_err cannot carry.

Writes figures and parameter tables to examples/out/.
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import warnings

import numpy as np

warnings.filterwarnings("ignore")

OUT = pathlib.Path(__file__).parent / "out"
OUT.mkdir(exist_ok=True)

TRUTH = [1.0, 1.0, 1.5, 1.5, 1.5, 0.2, 0.2, 0.2, 0.05, 0.05, -0.6]


def main():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from cokriging_tpu.cov import MaternParams, MultivariateMatern
    from cokriging_tpu.cov.params import ParamSpec
    from cokriging_tpu.estimate import (
        VarioConfig,
        empirical_variograms,
        fit_nll,
        nll_std_errors,
        parametric_bootstrap,
    )
    from cokriging_tpu.estimate.wls import fit_wls, moment_init
    from cokriging_tpu.predict import JointPredictor
    from cokriging_tpu.sim import BivariateRandomField, CartesianGrid

    spec = ParamSpec(
        n_procs=2,
        sigma_bounds=(0.1, 3.0),
        len_scale_bounds=(0.02, 1.0),
        nugget_bounds=(0.0, 0.5),
    )
    truth = MaternParams.from_flat(np.array(TRUTH), spec=spec)
    mod_truth = MultivariateMatern(params=truth)
    grid = CartesianGrid(xcount=41, ycount=41)
    rf = BivariateRandomField(mod_truth, grid, seed=42)
    mf = rf.to_fields(rf.sample(size=120, epsilon=[0.05, 0.05], seed=43))

    # --- WLS fit + parametric bootstrap ---
    config = VarioConfig(max_dist=0.85, n_bins=12, geodesic=False)
    est = empirical_variograms(mf, config)
    # project onto the exact spectral validity region: the bootstrap (and
    # prediction) need a PD generating model
    p_wls, _ = fit_wls(
        est, init=moment_init(est, spec=spec), method="scipy",
        project_validity=True,
    )
    mod = MultivariateMatern(params=p_wls)
    boot = parametric_bootstrap(mod, mf, config, n_rep=200, seed=3, maxiter=200)
    wls_df = boot.summary()
    wls_df["truth"] = TRUTH
    wls_df["covered"] = (wls_df["q025"] <= wls_df["truth"]) & (
        wls_df["truth"] <= wls_df["q975"]
    )
    wls_df.to_csv(OUT / "uncertainty_wls_bootstrap.csv", index=False)
    print("WLS + parametric bootstrap (200 replicates):")
    print(wls_df.to_string(index=False))

    # --- exact-NLL fit + observed-information standard errors ---
    params_ml, info = fit_nll(mf, init=p_wls, maxiter=200)
    ml_df = nll_std_errors(params_ml, mf)
    ml_df["truth"] = TRUTH
    ml_df["z_to_truth"] = (ml_df["value"] - ml_df["truth"]) / ml_df[
        "std_err"
    ].replace(0.0, np.nan)
    ml_df.to_csv(OUT / "uncertainty_nll_hessian.csv", index=False)
    print(f"\nExact-NLL fit (nll={info['nll']:.2f}) + Hessian SEs:")
    print(ml_df.to_string(index=False))

    # --- bootstrap sampling distributions vs truth ---
    names = list(spec.names())
    fig, axes = plt.subplots(3, 4, figsize=(14, 9))
    for k, ax in enumerate(axes.ravel()):
        if k >= len(names):
            ax.axis("off")
            continue
        ax.hist(boot.flats[:, k], bins=24, color="#4878a8", alpha=0.8)
        ax.axvline(TRUTH[k], color="k", lw=1.5, label="truth")
        ax.axvline(
            float(np.asarray(p_wls.to_flat())[k]),
            color="#c44e52",
            lw=1.2,
            ls="--",
            label="estimate",
        )
        ax.set_title(names[k], fontsize=9)
        if k == 0:
            ax.legend(fontsize=7)
    fig.suptitle("Parametric-bootstrap sampling distribution of the WLS estimator")
    fig.tight_layout()
    fig.savefig(OUT / "uncertainty_bootstrap_hists.png", dpi=120)

    # --- conditional simulation at the full grid ---
    jp = JointPredictor(mod, mf)
    pc = grid.coords.values
    df, draws = jp.sample(0, pc, n_samples=3, seed=8, postprocess=False)
    nx = int(np.sqrt(len(pc)))
    fig, axes = plt.subplots(1, 5, figsize=(18, 3.6), sharey=True)
    panels = [("posterior mean", df["pred"].values), ("pred err", df["pred_err"].values)]
    panels += [(f"realization {r}", draws[r]) for r in range(3)]
    for ax, (title, vals) in zip(axes, panels):
        im = ax.imshow(
            vals.reshape(nx, nx),
            origin="lower",
            extent=[0, 1, 0, 1],
            cmap="RdBu_r" if title != "pred err" else "viridis",
        )
        ax.set_title(title, fontsize=10)
        fig.colorbar(im, ax=ax, shrink=0.85)
    fig.suptitle("Conditional simulation from the joint cokriging posterior")
    fig.tight_layout()
    fig.savefig(OUT / "uncertainty_conditional_sim.png", dpi=120)

    n_cov = int(wls_df["covered"].sum())
    print(f"\nbootstrap 95% intervals cover truth on {n_cov}/11 parameters")
    print(f"figures/tables in {OUT}")


if __name__ == "__main__":
    # Runs on the ambient backend (TPU: f32 via utils.config.compute_dtype;
    # CPU: f64). COKRIGING_FORCE_CPU=1 pins the CPU backend for a true-f64
    # run. Must be decided before first JAX device use.
    import os

    if os.environ.get("COKRIGING_FORCE_CPU") == "1":
        import jax

        jax.config.update("jax_platforms", "cpu")
    main()
