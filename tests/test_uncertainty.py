"""Observed-information parameter uncertainty (estimate/uncertainty.py).

Validates the NLL Hessian against finite differences, and the standard
errors against the real sampling distribution of the MLE over simulation
replicates — the calibration the asymptotics promise.
"""

import jax
import numpy as np
import pytest

from cokriging_tpu.cov import MaternParams, MultivariateMatern
from cokriging_tpu.cov.params import ParamSpec
from cokriging_tpu.estimate import nll_std_errors, observed_information
from cokriging_tpu.estimate.nll import joint_distance_blocks, neg_log_likelihood
from cokriging_tpu.sim import BivariateRandomField, CartesianGrid

TRUTH = np.array([1.0, 1.0, 1.5, 1.5, 1.5, 0.2, 0.2, 0.2, 0.05, 0.05, -0.6])
SPEC = ParamSpec(
    n_procs=2,
    sigma_bounds=(0.1, 3.0),
    len_scale_bounds=(0.02, 1.0),
    nugget_bounds=(0.0, 0.5),
)


def _make_mf(seed, size=60, nx=13):
    mod = MultivariateMatern(params=MaternParams.from_flat(TRUTH, spec=SPEC))
    grid = CartesianGrid(xcount=nx, ycount=nx)
    rf = BivariateRandomField(mod, grid, seed=seed)
    samples = rf.sample(size=size, epsilon=[0.0, 0.0], seed=seed + 1000)
    return rf.to_fields(samples)


def test_hessian_matches_finite_difference():
    mf = _make_mf(0)
    params = MaternParams.from_flat(TRUTH, spec=SPEC)
    info = observed_information(params, mf)
    assert info.shape == (11, 11)
    np.testing.assert_allclose(info, info.T, rtol=1e-12)

    coords = [f.coords_main for f in mf.fields]
    dists = joint_distance_blocks(coords, geodesic=False)
    z = np.concatenate([np.asarray(f.values_main) for f in mf.fields])

    nll_grad = jax.jit(
        jax.grad(
            lambda f: neg_log_likelihood(
                f, dists, z, SPEC, None, 0.0, analytic_grad=False
            )
        )
    )

    flat = np.asarray(params.to_flat(), np.float64)
    eps = 1e-5
    fd = np.zeros((11, 11))
    for k in range(11):
        e = np.zeros(11)
        e[k] = eps
        fd[:, k] = (
            np.asarray(nll_grad(flat + e)) - np.asarray(nll_grad(flat - e))
        ) / (2 * eps)
    fd = 0.5 * (fd + fd.T)
    # nu-involving curvature goes through the kv custom JVP's dK/dnu
    # central-difference stencil -> O(h^2) ~ 1% relative; everything else
    # is exact AD (see observed_information docstring)
    nu_ix = np.zeros(11, bool)
    nu_ix[2:5] = True
    soft = nu_ix[:, None] & nu_ix[None, :]
    soft |= nu_ix[:, None] | nu_ix[None, :]
    np.testing.assert_allclose(info[~soft], fd[~soft], rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(info, fd, rtol=3e-2, atol=1e-6)


def test_std_errors_frame_and_bound_flag():
    mf = _make_mf(1)
    # nugget exactly at its lower bound must be flagged
    flat = TRUTH.copy()
    flat[8] = 0.0
    params = MaternParams.from_flat(flat, spec=SPEC)
    df = nll_std_errors(params, mf)
    assert list(df["name"]) == list(SPEC.names())
    assert df["at_bound"].values[8]
    assert not df["at_bound"].values[0]
    assert np.isfinite(df["std_err"].values).all()
    assert (df["std_err"].values >= 0).all()
    corr = df.attrs["correlation"]
    diag = np.diagonal(corr)
    ok = np.isfinite(diag)
    assert ok.any()
    np.testing.assert_allclose(diag[ok], 1.0, atol=1e-9)


def test_information_matches_iid_closed_form():
    """Closed-form anchor: with a length scale far below the minimum site
    spacing the field is iid N(0, sigma^2), where the observed information
    for sigma is exact: I(sigma) = -n/sigma^2 + 3*sum(z^2)/sigma^4 (= 2n at
    sigma = 1 with unit-standardized values, which Field guarantees)."""
    spec = ParamSpec(
        n_procs=1,
        sigma_bounds=(0.1, 3.0),
        len_scale_bounds=(1e-4, 1.0),
        nugget_bounds=(0.0, 0.5),
    )
    # nu = 0.5, len = 5e-3 on a 13x13 unit grid (spacing 1/12): nearest-
    # neighbor correlation exp(-spacing/len) ~ e^-16 — numerically iid
    truth = np.array([1.0, 0.5, 5e-3, 0.0])
    mod = MultivariateMatern(params=MaternParams.from_flat(truth, spec=spec))
    grid = CartesianGrid(xcount=13, ycount=13)
    rf = BivariateRandomField(mod, grid, seed=9)
    mf = rf.to_fields(rf.sample(size=80, epsilon=[0.0], seed=10), i=0)
    params = MaternParams.from_flat(truth, spec=spec)
    info = observed_information(params, mf)
    z = np.asarray(mf.fields[0].values_main, np.float64)
    n = z.shape[0]
    expected = -n / 1.0 + 3.0 * np.sum(z**2)
    np.testing.assert_allclose(info[0, 0], expected, rtol=1e-6)
    # and the SE it implies, with the rest of the matrix in play
    df = nll_std_errors(params, mf, information=info)
    assert np.isfinite(df["std_err"].values[0])
