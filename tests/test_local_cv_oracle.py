"""Local-predictor LOOCV vs a brute-force numpy oracle (reference
semantics: self-datum withheld via d > 0 within max_dist,
src/point_prediction.py:127-222, 303-346)."""

import numpy as np
import pytest
from scipy.linalg import cho_factor, cho_solve
from scipy.spatial.distance import cdist

from cokriging_tpu.cov import MaternParams, MultivariateMatern
from cokriging_tpu.cov.matern import (
    covariance,
    cross_covariance,
)
from cokriging_tpu.fields import Field, MultiField
from cokriging_tpu.predict import LocalPredictor
import jax.numpy as jnp

SIM_FLAT = [1.1, 0.9, 1.5, 1.5, 1.5, 0.25, 0.2, 0.22, 0.02, 0.03, -0.5]


def _oracle_local_cv(params, coords, values, i, max_dist):
    """Per-location brute force: gather all data within max_dist (self
    excluded for process i), solve the local simple-kriging system."""
    p = len(coords)
    c0 = float(covariance(params, i, jnp.zeros(1))[0])
    # full covariance blocks
    blocks = {}
    for a in range(p):
        for b in range(p):
            d = cdist(coords[a], coords[b])
            d[d < 1e-6] = 0.0
            if a == b:
                blocks[(a, b)] = np.asarray(covariance(params, a, jnp.asarray(d)))
            else:
                blocks[(a, b)] = np.asarray(
                    cross_covariance(params, a, b, jnp.asarray(d))
                )
    preds, errs = [], []
    for k in range(len(coords[i])):
        s0 = coords[i][k : k + 1]
        ixs, cvecs, zs = [], [], []
        for j in range(p):
            d = cdist(s0, coords[j])[0]
            d[d < 1e-6] = 0.0
            sel = d <= max_dist
            if j == i:
                sel &= d > 0
            ixs.append(np.where(sel)[0])
            dj = jnp.asarray(d[sel])
            if j == i:
                cvecs.append(np.asarray(covariance(params, i, dj)))
            else:
                cvecs.append(np.asarray(cross_covariance(params, i, j, dj)))
            zs.append(values[j][sel])
        A = np.block(
            [
                [blocks[(a, b)][np.ix_(ixs[a], ixs[b])] for b in range(p)]
                for a in range(p)
            ]
        )
        cvec = np.concatenate(cvecs)
        z = np.concatenate(zs)
        w = cho_solve(cho_factor(A, lower=True), cvec)
        preds.append(w @ z)
        errs.append(np.sqrt(max(c0 - w @ cvec, 0.0)))
    return np.array(preds), np.array(errs)


def test_local_cv_matches_bruteforce(rng):
    n1, n2 = 35, 30
    c1 = rng.uniform(0, 1, size=(n1, 2))
    c2 = rng.uniform(0, 1, size=(n2, 2))
    c2[:8] = c1[:8]  # colocated points exercise the d==0 handling
    v1 = rng.normal(size=n1)
    v2 = rng.normal(size=n2)
    params = MaternParams.from_flat(np.array(SIM_FLAT))
    mod = MultivariateMatern(params=params)
    mf = MultiField(
        fields=[Field.from_arrays(c1, v1, "Z0"), Field.from_arrays(c2, v2, "Z1")]
    )
    lp = LocalPredictor(mod, mf)
    cv = lp.cross_validation(0, max_dist=0.45, postprocess=False)

    preds, errs = _oracle_local_cv(params, [c1, c2], [v1, v2], 0, 0.45)
    np.testing.assert_allclose(cv["pred"].values, preds, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(cv["pred_err"].values, errs, rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(cv["residual"].values, v1 - preds, rtol=1e-7)
