"""Million-observation end-to-end workflow: simulate -> fit -> predict.

The round-3 record measured per-EVAL Vecchia cost at N = 1M (37 s warm
value+grad, examples/vecchia_scaling.py); this script runs the whole
WORKFLOW at that scale and commits the evidence (results/ manifest):

  1. simulate a bivariate Gaussian cofield with known parameters on a
     1024 x 1024 grid by circulant embedding (sim/spectral.py — exact
     draws; the dense reference simulator, src/sim.py:30-65, caps at a
     few thousand cells);
  2. sample 500k semi-colocated observations per process (N = 1M);
  3. fit the 11-parameter bivariate Matern by maximum Vecchia likelihood:
     a warm-start fit on a 60k subsample, then the full-N fit driven by
     the HOST L-BFGS-B loop — each objective eval is one bounded device
     dispatch, so the remote worker's ~40-60 s deadman (which a single
     whole-fit dispatch would trip at this scale) never fires;
  4. verify parameter recovery against the known truth;
  5. cokrige a ~16k-cell held-out block of the grid from the fitted model
     (LocalPredictor, direct neighborhood assembly — no n^2 object
     anywhere in the pipeline) and score MSPE + 95% interval coverage
     against the simulated truth.

This extends the reference's fit axis (WLS at n ~ 10^2-10^3 grid cells,
src/model.py:285-317) three orders of magnitude, with the simulation-as-
ground-truth methodology of research/simulation_experiment.ipynb applied
at scale. Sizes auto-shrink on CPU so the script doubles as a smoke test.
"""

import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import warnings

import numpy as np

warnings.filterwarnings("ignore", category=DeprecationWarning)
warnings.filterwarnings("ignore", category=FutureWarning)


def main():
    import jax
    import jax.numpy as jnp

    from cokriging_tpu.cov import MaternParams, MultivariateMatern
    from cokriging_tpu.cov.params import ParamSpec
    from cokriging_tpu.estimate.vecchia import fit_vecchia
    from cokriging_tpu.fields.field import Field, MultiField
    from cokriging_tpu.predict import LocalPredictor
    from cokriging_tpu.sim import CartesianGrid, SpectralRandomField
    from cokriging_tpu.utils.results import record_manifest

    on_tpu = jax.default_backend() == "tpu"
    dtype = np.float32 if on_tpu else np.float64
    n_per = int(os.environ.get("MPW_N", 500_000 if on_tpu else 1_200))
    g = int(os.environ.get("MPW_GRID", 1024 if on_tpu else 64))
    m = int(os.environ.get("MPW_M", 20 if on_tpu else 10))
    n_hold = int(os.environ.get("MPW_HOLD", 16_384 if on_tpu else 300))
    maxiter_warm = 100 if on_tpu else 30
    maxiter_full = int(os.environ.get("MPW_MAXITER", 30))
    wall = {}
    print(
        f"backend={jax.default_backend()} N={2 * n_per} grid={g}x{g} m={m}"
    )

    # ------------------------------------------------------------------
    # 1-2. simulate truth + sample N observations
    # ------------------------------------------------------------------
    # reference simulation-experiment truth (cell 3) rescaled to a
    # [0, 100]^2 domain; nuggets nonzero so the fit must separate scales
    TRUTH = [1.0, 1.0, 1.5, 1.5, 1.5, 5.0, 5.0, 5.0, 0.05, 0.05, -0.6]
    spec = ParamSpec(
        2,
        sigma_bounds=(0.2, 3.0),
        nu_bounds=(0.4, 3.0),
        len_scale_bounds=(0.5, 25.0),
        nugget_bounds=(0.0, 0.5),
    )
    truth = MaternParams.from_flat(np.asarray(TRUTH, dtype), spec=spec)
    mod_truth = MultivariateMatern(params=truth)

    t0 = time.perf_counter()
    grid = CartesianGrid(xbounds=(0, 100), ybounds=(0, 100), xcount=g, ycount=g)
    rf = SpectralRandomField(mod_truth, grid, seed=11)
    samples = rf.sample(size=n_per, seed=7)
    wall["simulate"] = time.perf_counter() - t0
    print(f"simulated {g * g} cells/process in {wall['simulate']:.1f}s "
          f"(min_rel_eig {rf.min_rel_eig:.1e})")

    fields = [
        Field.from_arrays(
            s[["x", "y"]].values.astype(dtype),
            s[f"Z{k}"].values.astype(dtype),
            name=f"Z{k}",
        )
        for k, s in enumerate(samples)
    ]
    mf = MultiField(fields=fields)

    # ------------------------------------------------------------------
    # 3. Vecchia fit: warm start on a subsample, then full N
    # ------------------------------------------------------------------
    init = MaternParams.from_flat(
        np.asarray(
            [1.0, 1.0, 1.0, 1.0, 1.0, 8.0, 8.0, 8.0, 0.1, 0.1, 0.0], dtype
        ),
        spec=spec,
    )
    n_sub = min(n_per, 30_000)
    rng = np.random.default_rng(3)
    sub_fields = []
    for f in fields:
        pick = rng.choice(len(f.values), size=n_sub, replace=False)
        sub_fields.append(
            Field.from_arrays(
                np.asarray(f.coords)[pick], np.asarray(f.values)[pick], f.name
            )
        )
    t0 = time.perf_counter()
    p_warm, info_warm = fit_vecchia(
        MultiField(fields=sub_fields), init=init, m=m,
        maxiter=maxiter_warm, main=False,
    )
    wall["fit_warm"] = time.perf_counter() - t0
    print(
        f"warm-start fit (N={info_warm['n']}): nll={info_warm['nll']:.1f} "
        f"evals={info_warm['n_obj_evals']} in {wall['fit_warm']:.1f}s"
    )

    t0 = time.perf_counter()
    params, info = fit_vecchia(
        mf, init=p_warm, m=m, maxiter=maxiter_full, main=False,
    )
    wall["fit_full"] = time.perf_counter() - t0
    s_per_eval = wall["fit_full"] / max(info["n_obj_evals"], 1)
    print(
        f"full fit (N={info['n']}): nll={info['nll']:.1f} "
        f"iters={info['n_iter']} evals={info['n_obj_evals']} "
        f"success={info['success']} in {wall['fit_full']:.1f}s "
        f"({s_per_eval:.1f}s/eval)"
    )

    flat_hat = np.asarray(params.to_flat(), np.float64)
    delta = flat_hat - np.asarray(TRUTH)
    names = spec.names()
    for nm, tv, hv in zip(names, TRUTH, flat_hat):
        print(f"  {nm:>12}: truth {tv:7.3f}  fitted {hv:7.3f}")
    # recovery tolerances: amplitude-ish params tight, shape params loose
    # (nu and len_scale are weakly identified jointly; what must hold is
    # the cross-correlation and the total-sill structure). Gates scale
    # with N — tiny CPU smoke runs are estimation-noise dominated.
    at_scale = info["n"] >= 100_000
    rho_tol, sig_tol = (0.12, 0.3) if at_scale else (0.25, 0.5)
    assert abs(delta[-1]) < rho_tol, f"rho off by {delta[-1]:+.3f}"
    assert np.all(np.abs(delta[:2]) < sig_tol), f"sigma off by {delta[:2]}"

    # ------------------------------------------------------------------
    # 4. held-out cokriging from the fitted model
    # ------------------------------------------------------------------
    used = np.unique(np.concatenate(rf._split_samp_coords(n_per, 7)))
    free = np.setdiff1d(np.arange(grid.count), used)
    hold = np.sort(np.random.default_rng(5).choice(
        free, size=min(n_hold, len(free)), replace=False
    ))
    pc = grid.coords.values[hold].astype(dtype)
    z_true = rf.fields[1]["value"].values[hold]

    mod_fit = MultivariateMatern(params=params)
    lp = LocalPredictor(mod_fit, mf, materialize_cov=False)
    t0 = time.perf_counter()
    out = lp(1, pc, max_dist=0.8 if on_tpu else 12.0, postprocess=False)
    wall["predict"] = time.perf_counter() - t0
    ok = np.isfinite(out["pred"].values)
    resid = z_true - out["pred"].values
    mspe = float(np.nanmean(resid**2))
    zscore = resid[ok] / out["pred_err"].values[ok]
    cover = float(np.mean(np.abs(zscore) < 1.96))
    print(
        f"held-out cokriging: {len(pc)} cells in {wall['predict']:.1f}s, "
        f"{int(ok.sum())} finite, MSPE {mspe:.4f}, 95% coverage {cover:.3f}"
    )
    assert ok.mean() > 0.95
    lo_cov = 0.90 if at_scale else 0.80
    assert lo_cov < cover < 0.995, f"coverage {cover:.3f}"

    # ------------------------------------------------------------------
    # 5. evidence
    # ------------------------------------------------------------------
    trace = info.pop("nll_trace", [])
    info_warm.pop("nll_trace", None)
    record_manifest(
        "million_point_workflow",
        {
            "n_total": int(info["n"]),
            "m": m,
            "grid": [g, g],
            "dtype": np.dtype(dtype).name,
            "truth_flat": TRUTH,
            "fitted_flat": [round(float(v), 4) for v in flat_hat],
            "param_names": list(names),
            "recovery_max_abs_delta": float(np.max(np.abs(delta))),
            "warm_fit": info_warm,
            "full_fit": info,
            "s_per_eval_full": round(s_per_eval, 2),
            "nll_trace_full": [round(v, 1) for v in trace],
            "predict_cells": int(len(pc)),
            "predict_finite_frac": float(ok.mean()),
            "mspe": mspe,
            "coverage_95": cover,
            "wall_s": {k: round(v, 1) for k, v in wall.items()},
            "wall_total_s": round(sum(wall.values()), 1),
        },
    )


if __name__ == "__main__":
    # the container registers the TPU platform before env vars are read;
    # COKRIGING_FORCE_CPU=1 pins the CPU backend at runtime (true f64)
    if os.environ.get("COKRIGING_FORCE_CPU") == "1":
        import jax

        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
    main()
