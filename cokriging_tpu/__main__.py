"""Thin CLI: ``python -m cokriging_tpu <command>``.

The reference has no CLI (everything lives in notebooks, SURVEY.md
section 5); this exposes the canonical workflows:

    sim        simulation experiment (recovery + coverage validation)
    fit        fit a staged dataset for one month (WLS/NLL/Vecchia),
               save params; optional bootstrap / Hessian uncertainty
    predict    cokrige a fitted month onto the 0.5-degree land grid
               (local-neighborhood or exact joint; optional
               conditional-simulation realizations)
    loocv      leave-one-out cross-validation diagnostics
               (MSPE/MAPE/coverage; local or joint predictor)
    bench      run the north-star benchmark
"""

import argparse
import sys


def main(argv=None):
    parser = argparse.ArgumentParser(prog="cokriging_tpu")
    sub = parser.add_subparsers(dest="cmd", required=True)

    sub.add_parser("sim", help="run the simulation validation experiment")
    sub.add_parser("bench", help="run the north-star benchmark")

    p_fit = sub.add_parser("fit", help="fit one month of staged data by WLS")
    p_fit.add_argument("--data", nargs="+", required=True, metavar="DATASET",
                       help="one staged table per process (e.g. XCO2 SIF)")
    p_fit.add_argument("--timestamp", required=True)
    p_fit.add_argument("--timedeltas", nargs="+", type=int, default=None,
                       help="per-process month offsets (default: 0 -1 for two "
                            "processes, all zeros otherwise)")
    p_fit.add_argument("--max-dist", type=float, default=1.5e3,
                       help="variogram range cutoff, km (--method wls only)")
    p_fit.add_argument("--n-bins", type=int, default=15,
                       help="variogram bin count (--method wls only)")
    p_fit.add_argument("--method", choices=["wls", "nll", "vecchia"],
                       default="wls",
                       help="estimator: composite variogram WLS (the "
                            "reference's), exact Gaussian NLL, or the "
                            "Vecchia-approximation NLL (large n)")
    p_fit.add_argument("--m-neighbors", type=int, default=30,
                       help="Vecchia conditioning-set size")
    p_fit.add_argument("--maxiter", type=int, default=200)
    p_fit.add_argument("--project-validity", action="store_true",
                       help="project the fitted optimum (any --method) onto "
                            "the exact spectral validity region (guarantees a "
                            "PD joint covariance for prediction; pairwise "
                            "Gneiting bound)")
    p_fit.add_argument("--bootstrap", type=int, default=0, metavar="N",
                       help="(--method wls) attach a parametric bootstrap of "
                            "N replicates: simulate from the fitted model at "
                            "the data coordinates, re-estimate + refit every "
                            "replicate on device; writes <out>.bootstrap.csv")
    p_fit.add_argument("--std-errors", action="store_true",
                       help="attach asymptotic standard errors from the "
                            "exact-NLL Hessian at the fitted parameters "
                            "(exact MLE theory under --method nll; a "
                            "curvature diagnostic for the other estimators); "
                            "writes <out>.std_errors.csv")
    p_fit.add_argument("--out", default="params.npz")

    p_pred = sub.add_parser("predict", help="cokrige a fitted month")
    p_pred.add_argument("--data", nargs="+", required=True, metavar="DATASET",
                        help="one staged table per process (e.g. XCO2 SIF)")
    p_pred.add_argument("--params", required=True)
    p_pred.add_argument("--timestamp", required=True)
    p_pred.add_argument("--timedeltas", nargs="+", type=int, default=None,
                        help="per-process month offsets (default: 0 -1 for two "
                             "processes, all zeros otherwise)")
    p_pred.add_argument("--process", type=int, default=1)
    p_pred.add_argument("--max-dist", type=float, default=1e3)
    p_pred.add_argument("--pred-grid", default=None,
                        help="staged table of prediction locations (lat/lon "
                             "columns); default: the 0.5-degree CONUS land grid")
    p_pred.add_argument("--joint", action="store_true",
                        help="exact joint cokriging (one global system, "
                             "src/joint_prediction.py) instead of the "
                             "local-neighborhood predictor")
    p_pred.add_argument("--solver", choices=["dense", "cg"], default="dense",
                        help="(--joint) dense Cholesky factorization, or the "
                             "matrix-free blocked-CG solver "
                             "(predict/iterative.py) for observation counts "
                             "past one chip's O(N^2) covariance memory")
    p_pred.add_argument("--conditional-sims", type=int, default=0, metavar="N",
                        help="(--joint) also draw N conditional-simulation "
                             "realizations from the full joint posterior; "
                             "writes <out>.samples.npz")
    p_pred.add_argument("--seed", type=int, default=0,
                        help="PRNG seed for --conditional-sims")
    p_pred.add_argument("--out", default="predictions.parquet")

    p_cv = sub.add_parser(
        "loocv",
        help="leave-one-out cross-validation diagnostics for a fitted month",
    )
    p_cv.add_argument("--data", nargs="+", required=True, metavar="DATASET",
                      help="one staged table per process (e.g. XCO2 SIF)")
    p_cv.add_argument("--params", required=True)
    p_cv.add_argument("--timestamp", required=True)
    p_cv.add_argument("--timedeltas", nargs="+", type=int, default=None,
                      help="per-process month offsets (default: 0 -1 for two "
                           "processes, all zeros otherwise)")
    p_cv.add_argument("--process", type=int, default=1)
    p_cv.add_argument("--predictor", choices=["local", "joint"],
                      default="local",
                      help="local-neighborhood LOOCV (self-datum withheld by "
                           "d > 0, src/point_prediction.py:303-346) or exact "
                           "joint LOOCV (one-factorization precision "
                           "identity, src/joint_prediction.py:207-257)")
    p_cv.add_argument("--max-dist", type=float, default=1e3,
                      help="neighborhood radius, km (--predictor local)")
    p_cv.add_argument("--out", default="loocv.parquet")

    args = parser.parse_args(argv)

    if args.cmd == "sim":
        from examples.simulation_experiment import main as sim_main

        sim_main()
    elif args.cmd == "bench":
        import bench

        bench.main()
    elif args.cmd in ("fit", "predict", "loocv"):
        from cokriging_tpu.data.grids import main_coords_array, prediction_coords
        from cokriging_tpu.fields import MultiField
        from cokriging_tpu.utils.io import load_table, save_params, load_params, save_table

        dfs = [load_table(p) for p in args.data]
        if args.timedeltas is None:
            args.timedeltas = [0, -1] if len(dfs) == 2 else [0] * len(dfs)
        if len(args.timedeltas) != len(dfs):
            parser.error("--timedeltas must give one offset per --data table")
        names = []
        for df in dfs:
            var_cols = [c for c in df.columns if c.endswith("_var")]
            names.append(var_cols[0][: -len("_var")] if var_cols else
                         [c for c in df.columns if c not in ("time", "lat", "lon")][0])
        mf = MultiField.from_dataframes(
            dfs,
            names,
            [["lon", "lat"]] * len(dfs),
            timestamp=args.timestamp,
            timedeltas=list(args.timedeltas),
            main_coords=main_coords_array(),
        )
        if args.cmd == "fit":
            if args.bootstrap and args.method != "wls":
                parser.error("--bootstrap requires --method wls")
            if args.method == "wls":
                from cokriging_tpu.estimate import (
                    VarioConfig,
                    empirical_variograms,
                )
                from cokriging_tpu.estimate.wls import fit_wls, moment_init

                est = empirical_variograms(
                    mf, VarioConfig(max_dist=args.max_dist, n_bins=args.n_bins)
                )
                params, result = fit_wls(
                    est, init=moment_init(est), maxiter=args.maxiter,
                    project_validity=args.project_validity,
                )
                quality = f"cost {result.cost:.6g}"
            elif args.method == "nll":
                from cokriging_tpu.estimate.nll import fit_nll

                params, info = fit_nll(mf, maxiter=args.maxiter)
                quality = f"nll {info['nll']:.6g}"
            else:
                from cokriging_tpu.estimate.vecchia import fit_vecchia

                params, info = fit_vecchia(
                    mf, m=args.m_neighbors, maxiter=args.maxiter
                )
                quality = f"vecchia nll {info['nll']:.6g} (m={info['m']})"
            if args.method != "wls" and args.project_validity:
                # the WLS driver projects inside fit_wls; for the
                # likelihood estimators project the optimum here so the
                # flag means the same thing for every --method
                from cokriging_tpu.cov.spectral import project_to_valid

                params = project_to_valid(params)
            save_params(args.out, params, metadata={"timestamp": args.timestamp})
            print(params.to_dataframe().to_string(index=False))
            print(f"{quality} -> {args.out}")
            if args.bootstrap:
                from cokriging_tpu.cov import MultivariateMatern
                from cokriging_tpu.estimate import (
                    VarioConfig,
                    parametric_bootstrap,
                )

                boot = parametric_bootstrap(
                    MultivariateMatern(params=params),
                    mf,
                    VarioConfig(max_dist=args.max_dist, n_bins=args.n_bins),
                    n_rep=args.bootstrap,
                    maxiter=args.maxiter,
                    main=True,
                )
                bdf = boot.summary()
                bdf.to_csv(f"{args.out}.bootstrap.csv", index=False)
                print(bdf.to_string(index=False))
                print(f"bootstrap ({args.bootstrap} replicates) -> "
                      f"{args.out}.bootstrap.csv")
            if args.std_errors:
                from cokriging_tpu.estimate import nll_std_errors

                sedf = nll_std_errors(params, mf)
                sedf.to_csv(f"{args.out}.std_errors.csv", index=False)
                print(sedf.to_string(index=False))
                print(f"NLL-Hessian standard errors -> {args.out}.std_errors.csv")
        elif args.cmd == "predict":
            from cokriging_tpu.cov import MultivariateMatern
            from cokriging_tpu.predict import JointPredictor, LocalPredictor

            if args.conditional_sims and not args.joint:
                parser.error("--conditional-sims requires --joint")
            if args.solver == "cg" and args.conditional_sims:
                parser.error(
                    "--conditional-sims requires the dense solver "
                    "(posterior covariance); drop --solver cg"
                )
            params = load_params(args.params)
            mod = MultivariateMatern(params=params)
            if args.pred_grid is not None:
                pgrid = load_table(args.pred_grid)[["lat", "lon"]]
            else:
                pgrid = prediction_coords()
            if args.joint:
                if args.solver == "cg":
                    from cokriging_tpu.predict import IterativeJointPredictor

                    jp = IterativeJointPredictor(mod, mf)
                else:
                    jp = JointPredictor(mod, mf)
                if args.conditional_sims:
                    out, samples = jp.sample(
                        args.process, pgrid,
                        n_samples=args.conditional_sims,
                        seed=args.seed, postprocess=False,
                    )
                    import numpy as _np

                    _np.savez_compressed(
                        f"{args.out}.samples.npz", samples=_np.asarray(samples)
                    )
                    print(f"{args.conditional_sims} conditional realizations "
                          f"-> {args.out}.samples.npz")
                else:
                    out = jp(args.process, pgrid, postprocess=False)
            else:
                out = LocalPredictor(mod, mf)(
                    args.process, pgrid, max_dist=args.max_dist,
                    postprocess=False,
                )
            save_table(args.out, out)
            print(out[["pred", "pred_err"]].describe().to_string())
            print(f"-> {args.out}")
        else:  # loocv
            from cokriging_tpu.cov import MultivariateMatern
            from cokriging_tpu.predict import JointPredictor, LocalPredictor

            params = load_params(args.params)
            mod = MultivariateMatern(params=params)
            if args.predictor == "local":
                cv = LocalPredictor(mod, mf).cross_validation(
                    args.process, max_dist=args.max_dist
                )
            else:
                cv = JointPredictor(mod, mf).cross_validation(args.process)
            save_table(args.out, cv)
            import numpy as _np

            resid = cv["residual"].to_numpy()
            finite = _np.isfinite(resid)
            mspe = float(_np.mean(resid[finite] ** 2))
            mape = float(_np.mean(_np.abs(resid[finite])))
            zscore = (
                cv["residual"] / cv["pred_err"].where(cv["pred_err"] > 0)
            ).to_numpy()
            cover = float(
                _np.mean(_np.abs(zscore[_np.isfinite(zscore)]) <= 1.96)
            )
            print(cv[["data", "pred", "residual", "pred_err"]].describe().to_string())
            print(f"MSPE {mspe:.6g}  MAPE {mape:.6g}  "
                  f"95% coverage {cover:.3f}  "
                  f"({int(finite.sum())}/{len(cv)} locations)")
            print(f"-> {args.out}")


if __name__ == "__main__":
    sys.exit(main())
