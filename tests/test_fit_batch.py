"""Batched multi-month WLS fitting + Cauchy-Schwarz validity check."""

import warnings

import numpy as np
import pytest

from cokriging_tpu.cov import MaternParams, MultivariateMatern
from cokriging_tpu.cov.params import ParamSpec
from cokriging_tpu.estimate import VarioConfig, empirical_variograms
from cokriging_tpu.estimate.wls import fit_wls_batch, cauchy_schwarz_check
from cokriging_tpu.sim import CartesianGrid, BivariateRandomField

SIM_FLAT = [1.0, 1.0, 1.5, 1.5, 1.5, 0.2, 0.2, 0.2, 0.0, 0.0, -0.6]


def _spec():
    return ParamSpec(
        2, sigma_bounds=(0.1, 3.0), len_scale_bounds=(0.02, 1.0),
        nugget_bounds=(0.0, 0.5),
    )


@pytest.mark.slow
def test_fit_batch_many_months():
    mod = MultivariateMatern(params=MaternParams.from_flat(np.array(SIM_FLAT)))
    grid = CartesianGrid(xcount=17, ycount=17)
    estimates = []
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        for seed in range(3):  # three "months"
            rf = BivariateRandomField(mod, grid, seed=seed)
            mf = rf.to_fields(rf.sample(size=60, epsilon=[0.1, 0.1], seed=seed + 10))
            estimates.append(
                empirical_variograms(mf, VarioConfig(1.0, 8, geodesic=False))
            )
    init = MaternParams.from_flat(
        np.array([1, 1, 1.5, 1.5, 1.5, 0.1, 0.1, 0.1, 0.01, 0.01, 0.0]),
        spec=_spec(),
    )
    fits, costs, conv = fit_wls_batch(estimates, init=init, maxiter=120)
    assert len(fits) == 3 and costs.shape == (3,)
    assert np.isfinite(costs).all()
    # every month's fitted sigma lands in a sane range around truth
    for p in fits:
        s = np.asarray(p.sigma)
        assert (0.3 < s).all() and (s < 2.5).all()


@pytest.mark.slow
def test_fit_batch_sharded_converges():
    """'Fit every month across the mesh' (SURVEY §7 step 10): >= 8 months
    sharded over the 8-device mesh, each fit converging to the same optimum
    as its unsharded counterpart."""
    from cokriging_tpu.parallel import make_mesh

    mod = MultivariateMatern(params=MaternParams.from_flat(np.array(SIM_FLAT)))
    grid = CartesianGrid(xcount=17, ycount=17)
    estimates = []
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        for seed in range(9):  # nine "months" (not divisible by 8)
            rf = BivariateRandomField(mod, grid, seed=seed)
            mf = rf.to_fields(
                rf.sample(size=60, epsilon=[0.1, 0.1], seed=seed + 10)
            )
            estimates.append(
                empirical_variograms(mf, VarioConfig(1.0, 8, geodesic=False))
            )
    init = MaternParams.from_flat(
        np.array([1, 1, 1.5, 1.5, 1.5, 0.1, 0.1, 0.1, 0.01, 0.01, 0.0]),
        spec=_spec(),
    )
    fits_mesh, costs_mesh, _ = fit_wls_batch(
        estimates, init=init, maxiter=120, mesh=make_mesh()
    )
    fits_single, costs_single, _ = fit_wls_batch(
        estimates, init=init, maxiter=120
    )
    assert len(fits_mesh) == 9 and np.isfinite(costs_mesh).all()
    # The mesh changes the layout, not the problem: both runs converge to
    # the same optimum up to L-BFGS trajectory noise (the sharded layout
    # reorders XLA reductions, and 120 line-search iterations amplify the
    # last-ulp differences — bitwise equality is not the right bar here).
    np.testing.assert_allclose(costs_mesh, costs_single, rtol=2e-2)
    # converged: every month recovers sigma in a sane range around truth
    for p in fits_mesh:
        s = np.asarray(p.sigma)
        assert (0.3 < s).all() and (s < 2.5).all()


def test_cauchy_schwarz_check():
    good = MaternParams.from_flat(np.array(SIM_FLAT))
    assert cauchy_schwarz_check(good)
    # rho exceeding the Gneiting bound: make cross smoothness much rougher
    # than marginals with |rho| = 1 -> C-S violated at some h
    bad_flat = [1.0, 1.0, 2.5, 0.3, 2.5, 0.2, 0.6, 0.2, 0.0, 0.0, 1.0]
    bad = MaternParams.from_flat(np.array(bad_flat))
    assert not cauchy_schwarz_check(bad)
