"""Kriging-vs-cokriging comparison workflow on the augmented-CONUS-shaped
data path (reference research/modelling_comparison.ipynb cells 14-35).

The synthetic month's residuals are a bivariate-Matern draw with
rho = -0.6 and sparser SIF coverage, so the bivariate model has real
information to gain — the test asserts it does: cokriging variance below
kriging variance where the cross-correlation is material, and LOOCV MSPE
no worse.
"""

import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1] / "examples"))

from modelling_comparison import run_comparison  # noqa: E402


def test_cokriging_beats_kriging_on_conus_path():
    out = run_comparison(seed=0, pred_stride=6, maxiter=250)

    # fitted cross-correlation is material (truth rho = -0.6)
    rho = float(np.asarray(out["params_biv"].rho)[0, 1])
    assert rho < -0.15, rho

    # error-ratio map: cokriging variance < kriging variance at the vast
    # majority of prediction locations (reference cell 31 criterion)
    ratio = out["ratio"]["ratio"].dropna()
    assert len(ratio) > 100
    assert float((ratio < 1.0).mean()) > 0.8
    assert float(ratio.median()) < 0.95

    # LOOCV: cokriging strictly beats kriging on this rho = -0.6 path
    # (measured margin ~16%: 0.0375 vs 0.0447)
    mspe = dict(zip(out["scores"]["method"], out["scores"]["MSPE"]))
    assert mspe["cokriging"] <= mspe["kriging"]

    # postprocessed predictions land on the data scale (SIF ~ 0.6-1.4,
    # not the standardized N(0,1) scale)
    pred = out["df_cokrig"]["pred"].dropna()
    assert 0.0 < pred.mean() < 2.0
