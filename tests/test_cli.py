"""CLI round-trip: ``python -m cokriging_tpu fit`` -> params.npz ->
``predict`` -> predictions table, exercised in-process via main(argv).

The reference has no CLI (SURVEY.md section 5 — notebooks only); this is
the staged-artifact workflow (fit saves parameters, predict re-loads them)
that replaces its notebook cells. Also covers the p = 3 generalization:
the CLI accepts one staged table per process.
"""

import numpy as np
import pandas as pd
import pytest

from cokriging_tpu.__main__ import main
from cokriging_tpu.data.grids import main_coords_array
from cokriging_tpu.utils.io import load_params, load_table, save_table

TIMES = ["2018-04-01", "2018-05-01", "2018-06-01"]


def _staged_table(name, rng, scale=1.0, own_seed=123):
    """Long-format staged frame [time, lat, lon, <name>, <name>_var] on the
    base 4x5-degree grid, three months, smooth partially-correlated signals
    (a shared smooth component plus per-process structure, so the fitted
    cross-correlation stays well inside (-1, 1))."""
    mc = main_coords_array()
    srng = np.random.default_rng(own_seed)
    base = (
        np.sin(np.deg2rad(mc[:, 0]) * 5)
        + 0.5 * np.cos(np.deg2rad(mc[:, 1]) * (3 + own_seed % 3))
        + 0.6 * srng.normal(size=len(mc))
    )
    rows = []
    for k, t in enumerate(TIMES):
        vals = scale * (base + 0.15 * rng.normal(size=len(mc))) + 0.05 * k
        rows.append(
            pd.DataFrame(
                {
                    "time": pd.Timestamp(t),
                    "lat": mc[:, 0],
                    "lon": mc[:, 1],
                    name: vals,
                    f"{name}_var": 0.01,
                }
            )
        )
    return pd.concat(rows, ignore_index=True)


@pytest.mark.parametrize("n_procs", [2, 3])
def test_cli_fit_predict_roundtrip(tmp_path, n_procs):
    rng = np.random.default_rng(0)
    names = ["xco2", "sif", "evi"][:n_procs]
    paths = []
    for k, name in enumerate(names):
        df = _staged_table(name, rng, scale=1.0 + 0.3 * k, own_seed=123 + k)
        p = tmp_path / f"{name}.parquet"
        save_table(p, df)
        paths.append(str(p))

    params_path = tmp_path / "params.npz"
    main(
        ["fit", "--data", *paths, "--timestamp", TIMES[1],
         "--timedeltas", *(["0"] * n_procs),
         "--max-dist", "3000", "--n-bins", "10", "--project-validity",
         "--out", str(params_path)]
    )
    assert params_path.exists()
    params = load_params(params_path)
    assert params.n_procs == n_procs
    assert np.isfinite(np.asarray(params.to_flat())).all()

    # small prediction grid: a subset of base-grid cells, staged as a table
    mc = main_coords_array()
    pgrid_path = tmp_path / "pgrid.parquet"
    save_table(pgrid_path, pd.DataFrame({"lat": mc[::3, 0], "lon": mc[::3, 1]}))

    pred_path = tmp_path / "pred.parquet"
    main(
        ["predict", "--data", *paths, "--params", str(params_path),
         "--timestamp", TIMES[1], "--timedeltas", *(["0"] * n_procs),
         "--process", str(n_procs - 1), "--max-dist", "2000",
         "--pred-grid", str(pgrid_path), "--out", str(pred_path)]
    )
    out = load_table(pred_path)
    assert len(out) == len(mc[::3])
    assert np.isfinite(out["pred"].values).all()
    assert (out["pred_err"].values >= 0).all()


def test_cli_fit_method_vecchia(tmp_path):
    """--method vecchia fits by the Vecchia-approximation likelihood and
    saves a loadable parameter file (the large-n estimator behind the same
    staged-artifact CLI surface)."""
    rng = np.random.default_rng(2)
    paths = []
    for k, name in enumerate(["xco2", "sif"]):
        p = tmp_path / f"{name}.parquet"
        save_table(p, _staged_table(name, rng, own_seed=200 + k))
        paths.append(str(p))
    out = tmp_path / "pv.npz"
    main(
        ["fit", "--data", *paths, "--timestamp", TIMES[1],
         "--timedeltas", "0", "0", "--method", "vecchia",
         "--m-neighbors", "12", "--maxiter", "25", "--out", str(out)]
    )
    params = load_params(out)
    assert params.n_procs == 2
    assert np.isfinite(np.asarray(params.to_flat())).all()


def test_cli_timedeltas_length_mismatch_errors(tmp_path):
    rng = np.random.default_rng(1)
    p = tmp_path / "a.parquet"
    save_table(p, _staged_table("xco2", rng))
    with pytest.raises(SystemExit):
        main(
            ["fit", "--data", str(p), str(p), "--timestamp", TIMES[1],
             "--timedeltas", "0", "--out", str(tmp_path / "x.npz")]
        )


def test_cli_fit_bootstrap_and_std_errors(tmp_path):
    """--bootstrap N and --std-errors attach both uncertainty reports to a
    WLS fit and write them as staged CSV artifacts."""
    rng = np.random.default_rng(3)
    paths = []
    for k, name in enumerate(["xco2", "sif"]):
        p = tmp_path / f"{name}.parquet"
        save_table(p, _staged_table(name, rng, own_seed=300 + k))
        paths.append(str(p))
    out = tmp_path / "pu.npz"
    main(
        ["fit", "--data", *paths, "--timestamp", TIMES[1],
         "--timedeltas", "0", "0", "--max-dist", "3000", "--n-bins", "8",
         "--maxiter", "60", "--project-validity",
         "--bootstrap", "8", "--std-errors", "--out", str(out)]
    )
    bdf = pd.read_csv(f"{out}.bootstrap.csv")
    assert len(bdf) == 11
    assert (bdf["std_err"].values >= 0).all()
    assert np.isfinite(bdf[["q025", "q975"]].values).all()
    sedf = pd.read_csv(f"{out}.std_errors.csv")
    assert len(sedf) == 11
    assert np.isfinite(sedf["std_err"].values).all()


def test_cli_predict_joint_with_conditional_sims(tmp_path):
    """--joint switches to the exact joint predictor; --conditional-sims N
    writes an (N, n_pred) realization stack whose mean tracks the
    predictions."""
    rng = np.random.default_rng(5)
    paths = []
    for k, name in enumerate(["xco2", "sif"]):
        p = tmp_path / f"{name}.parquet"
        save_table(p, _staged_table(name, rng, own_seed=500 + k))
        paths.append(str(p))
    pfile = tmp_path / "p.npz"
    main(
        ["fit", "--data", *paths, "--timestamp", TIMES[1],
         "--timedeltas", "0", "0", "--max-dist", "3000", "--n-bins", "8",
         "--maxiter", "60", "--project-validity", "--out", str(pfile)]
    )
    # small prediction grid so the joint system stays tiny
    mc = main_coords_array()
    pgrid = pd.DataFrame({"lat": mc[::7, 0] + 0.5, "lon": mc[::7, 1] + 0.5})
    gfile = tmp_path / "grid.parquet"
    save_table(gfile, pgrid)
    out = tmp_path / "jpred.parquet"
    main(
        ["predict", "--data", *paths, "--params", str(pfile),
         "--timestamp", TIMES[1], "--timedeltas", "0", "0",
         "--joint", "--conditional-sims", "64", "--seed", "7",
         "--pred-grid", str(gfile), "--out", str(out)]
    )
    pred = load_table(out)
    assert len(pred) == len(pgrid)
    assert np.isfinite(pred["pred"].values).all()
    samples = np.load(f"{out}.samples.npz")["samples"]
    assert samples.shape == (64, len(pgrid))
    # realization mean ~ prediction (Monte-Carlo error ~ pred_err/8)
    mc_err = np.abs(samples.mean(axis=0) - pred["pred"].values)
    assert (mc_err < 4.0 * pred["pred_err"].values / np.sqrt(64) + 1e-3).all()


def test_cli_predict_joint_cg_solver(tmp_path):
    """--solver cg routes through the matrix-free iterative joint predictor
    and agrees with the dense solver."""
    rng = np.random.default_rng(8)
    paths = []
    for k, name in enumerate(["xco2", "sif"]):
        p = tmp_path / f"{name}.parquet"
        save_table(p, _staged_table(name, rng, own_seed=800 + k))
        paths.append(str(p))
    pfile = tmp_path / "p.npz"
    main(
        ["fit", "--data", *paths, "--timestamp", TIMES[1],
         "--timedeltas", "0", "0", "--max-dist", "3000", "--n-bins", "8",
         "--maxiter", "60", "--project-validity", "--out", str(pfile)]
    )
    mc = main_coords_array()
    pgrid = pd.DataFrame({"lat": mc[::9, 0] + 0.5, "lon": mc[::9, 1] + 0.5})
    gfile = tmp_path / "grid.parquet"
    save_table(gfile, pgrid)
    outs = {}
    for solver in ["dense", "cg"]:
        out = tmp_path / f"pred_{solver}.parquet"
        main(
            ["predict", "--data", *paths, "--params", str(pfile),
             "--timestamp", TIMES[1], "--timedeltas", "0", "0",
             "--joint", "--solver", solver,
             "--pred-grid", str(gfile), "--out", str(out)]
        )
        outs[solver] = load_table(out)
    np.testing.assert_allclose(
        outs["cg"]["pred"], outs["dense"]["pred"], rtol=1e-4, atol=1e-6
    )
    np.testing.assert_allclose(
        outs["cg"]["pred_err"], outs["dense"]["pred_err"], rtol=1e-4, atol=1e-6
    )
    # conditional sims need the dense posterior
    with pytest.raises(SystemExit):
        main(
            ["predict", "--data", *paths, "--params", str(pfile),
             "--timestamp", TIMES[1], "--joint", "--solver", "cg",
             "--conditional-sims", "4", "--out", str(tmp_path / "x.parquet")]
        )


def test_cli_loocv(tmp_path):
    """loocv writes a residual table and prints MSPE/MAPE/coverage for both
    predictor flavors."""
    rng = np.random.default_rng(6)
    paths = []
    for k, name in enumerate(["xco2", "sif"]):
        p = tmp_path / f"{name}.parquet"
        save_table(p, _staged_table(name, rng, own_seed=600 + k))
        paths.append(str(p))
    pfile = tmp_path / "p.npz"
    main(
        ["fit", "--data", *paths, "--timestamp", TIMES[1],
         "--timedeltas", "0", "0", "--max-dist", "3000", "--n-bins", "8",
         "--maxiter", "60", "--project-validity", "--out", str(pfile)]
    )
    for flavor in ["local", "joint"]:
        out = tmp_path / f"cv_{flavor}.parquet"
        main(
            ["loocv", "--data", *paths, "--params", str(pfile),
             "--timestamp", TIMES[1], "--timedeltas", "0", "0",
             "--predictor", flavor, "--max-dist", "3000",
             "--out", str(out)]
        )
        cv = load_table(out)
        assert {"data", "pred", "residual", "pred_err"} <= set(cv.columns)
        assert np.isfinite(cv["pred"].values).any()


def test_cli_conditional_sims_requires_joint(tmp_path):
    rng = np.random.default_rng(7)
    p = tmp_path / "a.parquet"
    save_table(p, _staged_table("xco2", rng, own_seed=700))
    with pytest.raises(SystemExit):
        main(
            ["predict", "--data", str(p), "--params", "x.npz",
             "--timestamp", TIMES[1], "--conditional-sims", "4",
             "--out", str(tmp_path / "x.parquet")]
        )


def test_cli_bootstrap_requires_wls(tmp_path):
    rng = np.random.default_rng(4)
    p = tmp_path / "a.parquet"
    save_table(p, _staged_table("xco2", rng, own_seed=400))
    with pytest.raises(SystemExit):
        main(
            ["fit", "--data", str(p), "--timestamp", TIMES[1],
             "--method", "vecchia", "--bootstrap", "4",
             "--maxiter", "10", "--out", str(tmp_path / "x.npz")]
        )
