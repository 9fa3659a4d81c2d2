"""Build and execute the Jupyter notebook deliverables in notebooks/.

The reference's user surface is Jupyter (research/*.ipynb); this repo's
primary surface is the package + example scripts, but the two flagship
workflows are also shipped as executed notebooks so a reference user finds
the familiar form (parity: research/modelling_demo_sif.ipynb,
research/simulation_experiment.ipynb).

Each notebook is generated from the cell lists below, executed top to
bottom with a fresh kernel (CPU/f64 by default for deterministic committed
outputs; delete the first cell's env pin to run on the ambient TPU
backend), and written with outputs embedded.

Usage: python tools/make_notebooks.py [--no-exec]
"""

import argparse
import pathlib
import sys

import nbformat
from nbclient import NotebookClient

ROOT = pathlib.Path(__file__).resolve().parents[1]
OUT = ROOT / "notebooks"


def build(cells):
    nb = nbformat.v4.new_notebook()
    nb.metadata["kernelspec"] = {
        "name": "python3",
        "display_name": "Python 3",
        "language": "python",
    }
    for kind, src in cells:
        if kind == "md":
            nb.cells.append(nbformat.v4.new_markdown_cell(src.strip()))
        else:
            nb.cells.append(nbformat.v4.new_code_cell(src.strip()))
    return nb


SETUP = '''
# CPU/f64 pin for deterministic committed outputs. The env var alone is
# NOT enough in environments whose sitecustomize registers an accelerator
# platform at interpreter startup (the env is latched before this cell
# runs), so the backend is forced through jax.config and then asserted.
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
assert jax.default_backend() == "cpu", jax.default_backend()

%matplotlib inline
import sys, pathlib, warnings
sys.path.insert(0, str(pathlib.Path.cwd().parent))
# silence only known-benign churn; science warnings (optimizer
# non-convergence, thin variogram bins) must stay visible
warnings.filterwarnings("ignore", category=DeprecationWarning)
warnings.filterwarnings("ignore", category=FutureWarning)
import numpy as np, pandas as pd
'''

MODELLING = [
    ("md", """
# Bivariate SIF–XCO₂ cokriging — modelling demo

The flagship workflow (parity with the reference's
`research/modelling_demo_sif.ipynb`): gridded monthly observations →
`MultiField` (3-stage trend removal + month offsets) → empirical
(cross-)semivariograms → composite-WLS bivariate Matérn fit → local
cokriging with uncertainty on the 0.5° CONUS land grid.

Real OCO-2/MODIS archives are not bundled, so this notebook synthesizes
gridded monthly frames with the exact schema the data layer produces
(`cokriging_tpu.data`); point the loaders at staged parquet artifacts from
`examples/etl_pipeline.py` to run on real data.
"""),
    ("code", SETUP),
    ("code", '''
# Synthetic monthly CONUS frames on the 4x5-degree base grid, negatively
# correlated across processes (same generator as examples/modelling_demo.py).
sys.path.insert(0, str(pathlib.Path.cwd().parent / "examples"))
from modelling_demo import synthesize_monthly

rng = np.random.default_rng(0)
df_xco2 = synthesize_monthly("xco2", rng)
shared = {k: df_xco2[df_xco2.time == t]["base"].values
          for k, t in enumerate(sorted(df_xco2.time.unique()))}
df_sif = synthesize_monthly("sif", rng, correlate_with=shared)
df_sif["evi"] = 0.3 + 0.1 * np.cos(np.deg2rad(df_sif["lat"] * 4))
df_sif.head()
'''),
    ("md", """
## Fields and trend removal

`MultiField` applies the reference's 3-stage pipeline per process
(temporal linear trend of the spatial mean → OLS spatial trend on
standardized covariates → residual standardization; `src/fields.py:345-375`)
and the month-offset mechanism (`timedeltas=[0, -1]`: SIF lagged one month
behind XCO₂, `src/fields.py:173-176`). XCO₂ is detrended on lon/lat, SIF
on EVI (`research/modelling_demo.ipynb` cell 2).
"""),
    ("code", '''
from cokriging_tpu.data.grids import main_coords_array, prediction_coords
from cokriging_tpu.fields import MultiField
from cokriging_tpu.plot import plot_fields

mf = MultiField.from_dataframes(
    [df_xco2, df_sif], ["xco2", "sif"], [["lon", "lat"], ["evi"]],
    timestamp="2019-04-01", timedeltas=[0, -1],
    main_coords=main_coords_array(),
)
plot_fields(mf);
'''),
    ("md", """
## Empirical variograms and composite WLS fit

All-pairs variogram clouds are binned in a single fused device pass
(`estimate/empirical.py` — the cloud is never materialized), then the
11-parameter bivariate Matérn is fitted by Cressie-weighted composite WLS
(`src/model.py:277-317` semantics) with a jit+grad cost and bounded
L-BFGS-B.
"""),
    ("code", '''
from cokriging_tpu.estimate import VarioConfig, empirical_variograms
from cokriging_tpu.estimate.wls import fit_wls, moment_init
from cokriging_tpu.plot import plot_variograms

est = empirical_variograms(mf, VarioConfig(max_dist=1.5e3, n_bins=15))
params, result = fit_wls(est, init=moment_init(est))
params.to_dataframe()
'''),
    ("code", 'plot_variograms(result, names=["xco2", "sif"]);'),
    ("md", """
## Local cokriging on the 0.5° CONUS land grid

For every prediction cell, the `max_dist`-neighborhood of both processes
is gathered into fixed-size masked batches and solved by vmapped Cholesky
on device (`predict/local.py`; replaces the reference's
`multiprocessing.Pool` over row partitions,
`src/point_prediction.py:69-81`).
"""),
    ("code", '''
from cokriging_tpu.cov import MultivariateMatern
from cokriging_tpu.predict import LocalPredictor
from cokriging_tpu.plot import plot_df

mod = MultivariateMatern(params=params)
lp = LocalPredictor(mod, mf)
ds = lp(1, prediction_coords(), max_dist=1e3, postprocess=False)
ds[["pred", "pred_err"]].describe()
'''),
    ("code", 'plot_df(ds.dropna(), "pred", title="SIF cokriging (standardized)");'),
    ("code", 'plot_df(ds.dropna(), "pred_err", title="prediction std");'),
    ("md", """
## Leave-one-out cross-validation

LOOCV withholds each observation's own datum (self-exclusion,
`src/point_prediction.py:303-346`) and re-predicts it from its neighbors.
"""),
    ("code", '''
cv = lp.cross_validation(1, max_dist=1e3, postprocess=False)
resid = cv["residual"].dropna()
print(f"LOOCV MSPE {np.mean(resid**2):.4f}  MAPE {np.mean(np.abs(resid)):.4f}")
'''),
]

SIMULATION = [
    ("md", """
# Simulation experiment — cokriging vs kriging on a known truth

Parity with `research/simulation_experiment.ipynb`: simulate a bivariate
Gaussian cofield from known Matérn parameters, sample it semi-colocated
with measurement error, recover the parameters (WLS and exact NLL), then
predict with the truth model and verify cokriging beats univariate
kriging (MSPE, error-ratio map) and that LOOCV standardized residuals
show ~95% coverage.
"""),
    ("code", SETUP),
    ("code", '''
from cokriging_tpu.cov import MaternParams, MultivariateMatern
from cokriging_tpu.sim import CartesianGrid, BivariateRandomField
from cokriging_tpu.plot import plot_samples

# truth parameters (research/simulation_experiment.ipynb cell 3)
TRUTH = [1.0, 1.0, 1.5, 1.5, 1.5, 0.2, 0.2, 0.2, 0.0, 0.0, -0.6]
mod_truth = MultivariateMatern(params=MaternParams.from_flat(np.array(TRUTH)))
grid = CartesianGrid(xcount=51, ycount=51)
rf = BivariateRandomField(mod_truth, grid, seed=42)
samples = rf.sample(size=100, epsilon=[0.1, 0.1], seed=7)
mf = rf.to_fields(samples)
plot_samples(samples);
'''),
    ("md", """
## Parameter recovery

Composite WLS on the empirical (cross-)variograms, then the exact
Gaussian likelihood (Cholesky log-det NLL with analytic gradients —
the estimator the reference aspired to but did not implement).
"""),
    ("code", '''
from cokriging_tpu.cov.params import ParamSpec
from cokriging_tpu.estimate import VarioConfig, empirical_variograms
from cokriging_tpu.estimate.wls import fit_wls
from cokriging_tpu.plot import plot_variograms

spec = ParamSpec(2, sigma_bounds=(0.1, 3.0), len_scale_bounds=(0.02, 1.0),
                 nugget_bounds=(0.0, 0.5))
init = MaternParams.from_flat(
    np.array([1, 1, 1.5, 1.5, 1.5, 0.1, 0.1, 0.1, 0.01, 0.01, 0.0]), spec=spec)
est = empirical_variograms(mf, VarioConfig(max_dist=1.0, n_bins=12, geodesic=False))
p_wls, res_wls = fit_wls(est, init=init)
print("WLS fit:", np.round(np.asarray(p_wls.to_flat()), 3).tolist())
print("truth:  ", TRUTH)
plot_variograms(res_wls, names=["Z0", "Z1"]);
'''),
    ("code", '''
from cokriging_tpu.estimate.nll import fit_nll

p_nll, info = fit_nll(mf, init=init, jitter=1e-8, maxiter=100)
print("NLL fit:", np.round(np.asarray(p_nll.to_flat()), 3).tolist())
print("truth:  ", TRUTH, f"(NLL {info['nll']:.2f}, {info['n_iter']} iters)")
'''),
    ("md", """
## Truth-model prediction: cokriging vs univariate kriging

Exact joint cokriging solves one global system by blocked Cholesky
(`predict/joint.py`; `src/joint_prediction.py:35-153` semantics). The
univariate comparison drops the second process; the error-ratio map shows
where the negatively-correlated companion field reduces prediction error.
"""),
    ("code", '''
from cokriging_tpu.predict import JointPredictor
from cokriging_tpu.plot import plot_sim_pred, plot_err_ratio

pcoords = grid.coords.values
jp = JointPredictor(mod_truth, mf)
pred_biv = jp(0, pcoords, postprocess=False)
truth_vals = rf.fields[0]["value"].values
diff = truth_vals - pred_biv["pred"].values
print(f"cokriging MSPE {np.nanmean(diff**2):.4f}  MAPE {np.nanmean(np.abs(diff)):.4f}")

spec1 = ParamSpec(n_procs=1)
mod_uni = MultivariateMatern(1, MaternParams.from_flat(
    np.array([TRUTH[0], TRUTH[2], TRUTH[5], TRUTH[8]]), spec=spec1))
pred_uni = JointPredictor(mod_uni, rf.to_fields(samples, i=0))(0, pcoords, postprocess=False)
diff_u = truth_vals - pred_uni["pred"].values
print(f"kriging   MSPE {np.nanmean(diff_u**2):.4f}  MAPE {np.nanmean(np.abs(diff_u)):.4f}")
plot_sim_pred(rf, pred_biv);
'''),
    ("code", 'plot_err_ratio(pred_biv, pred_uni);'),
    ("md", """
## LOOCV coverage

Joint LOOCV uses the precision-matrix identity (one factorization, exact
per-datum held-out predictions) instead of the reference's O(n) full
refactorizations (`src/joint_prediction.py:207-257`).
"""),
    ("code", '''
from cokriging_tpu.plot import plot_cv_resid

cv = jp.cross_validation(0, postprocess=False)
z = (cv["residual"] / cv["pred_err"]).replace([np.inf, -np.inf], np.nan).dropna()
print(f"LOOCV 95% coverage: {float((np.abs(z) < 1.96).mean()):.3f} (z std {z.std():.3f})")
plot_cv_resid(cv, "Z0");
'''),
]

COMPARISON = [
    ("md", """
# Kriging vs cokriging — modelling comparison

The reference's flagship scientific comparison
(`research/modelling_comparison.ipynb` cells 14-35): fit a univariate SIF
model and a bivariate XCO₂+SIF model on the same month, predict the same
0.5° CONUS land grid with both, and compare via the error-ratio map
(cokriging variance / kriging variance, `src/plot.py:474-521`) and LOOCV
MSPE/MAPE (`src/plot.py:524-538`).

Data are synthesized at the augmented-CONUS pipeline's exact schema with
a known bivariate-Matérn cross-structure (ρ = −0.6) and sparser SIF
coverage — the regime where cokriging pays. The notebook subsamples the
prediction grid (`pred_stride=4`) to keep the committed CPU execution
fast; `examples/modelling_comparison.py` runs the full grid.
"""),
    ("code", SETUP),
    ("code", '''
sys.path.insert(0, str(pathlib.Path.cwd().parent / "examples"))
from modelling_comparison import run_comparison

out = run_comparison(pred_stride=4, maxiter=300)
out["scores"]
'''),
    ("md", """
## Fitted models

The univariate fit sees only SIF semivariograms; the bivariate fit adds
the XCO₂ marginal and the cross-semivariogram, whose negative colocated
correlation is what lets XCO₂ observations inform SIF predictions.
"""),
    ("code", '''
from cokriging_tpu.plot import plot_variograms

print("bivariate XCO2+SIF fit:")
print(out["params_biv"].to_dataframe().to_string(index=False))
plot_variograms(out["fit_biv"], names=["xco2", "sif"]);
'''),
    ("md", """
## Error-ratio map

Ratio < 1 = cokriging's prediction variance beats kriging's at that cell
(reference `plot_err_ratio`, `src/plot.py:474-521`).
"""),
    ("code", '''
from cokriging_tpu.plot import plot_err_ratio

frac = float((out["ratio"]["ratio"].dropna() < 1).mean())
print(f"error ratio < 1 at {100 * frac:.1f}% of prediction locations")
plot_err_ratio(out["df_cokrig"], out["df_krig"], coords=("lat", "lon"));
'''),
    ("md", """
## LOOCV comparison

Self-exclusion LOOCV for both models on the data locations
(`src/point_prediction.py:303-346`); MSPE/MAPE summarize the held-out
residuals.
"""),
    ("code", '''
from cokriging_tpu.plot import plot_cv_resid

print(out["scores"].to_string(index=False))
plot_cv_resid(out["cv_cokrig"], "sif");
'''),
]

NOTEBOOKS = {
    "modelling_demo.ipynb": MODELLING,
    "simulation_experiment.ipynb": SIMULATION,
    "modelling_comparison.ipynb": COMPARISON,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--no-exec", action="store_true")
    args = ap.parse_args()
    OUT.mkdir(exist_ok=True)
    for name, cells in NOTEBOOKS.items():
        nb = build(cells)
        if not args.no_exec:
            client = NotebookClient(
                nb, timeout=3000, resources={"metadata": {"path": str(OUT)}}
            )
            client.execute()
        path = OUT / name
        nbformat.write(nb, path)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
