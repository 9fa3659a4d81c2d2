"""Parametric bootstrap of the WLS estimator (estimate/bootstrap.py).

The values-batched variogram pass is checked exactly against the standard
per-replicate device pass; the end-to-end bootstrap is checked for
statistical sanity (truth inside the replicate cloud, positive SEs).
"""

import numpy as np
import pytest

from cokriging_tpu.cov import MaternParams, MultivariateMatern
from cokriging_tpu.cov.params import ParamSpec
from cokriging_tpu.estimate import (
    VarioConfig,
    batched_variograms,
    empirical_variograms,
    parametric_bootstrap,
    simulate_replicates,
)
from cokriging_tpu.estimate.empirical import empirical_variograms_device
from cokriging_tpu.sim import BivariateRandomField, CartesianGrid

TRUTH = np.array([1.0, 1.0, 1.5, 1.5, 1.5, 0.2, 0.2, 0.2, 0.05, 0.05, -0.6])
SPEC = ParamSpec(
    n_procs=2,
    sigma_bounds=(0.1, 3.0),
    len_scale_bounds=(0.02, 1.0),
    nugget_bounds=(0.0, 0.5),
)


@pytest.fixture(scope="module")
def setup():
    mod = MultivariateMatern(params=MaternParams.from_flat(TRUTH, spec=SPEC))
    grid = CartesianGrid(xcount=17, ycount=17)
    rf = BivariateRandomField(mod, grid, seed=21)
    mf = rf.to_fields(rf.sample(size=70, epsilon=[0.0, 0.0], seed=22))
    return mod, mf


def test_batched_variograms_match_per_replicate_pass(setup):
    mod, mf = setup
    coords = [np.asarray(f.coords) for f in mf.fields]
    config = VarioConfig(max_dist=0.9, n_bins=10, geodesic=False)
    rng = np.random.default_rng(5)
    B = 3
    values_rep = [rng.normal(size=(B, c.shape[0])) for c in coords]

    pairs, centers, means, counts = batched_variograms(coords, values_rep, config)
    assert means.shape == (B, len(pairs), config.n_bins)
    for b in range(B):
        p1, c1, m1, n1 = empirical_variograms_device(
            coords, [v[b] for v in values_rep], config
        )
        assert p1 == pairs
        np.testing.assert_allclose(centers, c1, rtol=1e-12)
        np.testing.assert_array_equal(counts, n1)
        np.testing.assert_allclose(
            means[b], m1, rtol=1e-9, atol=1e-12, equal_nan=True
        )


def test_simulate_replicates_marginal_moments(setup):
    mod, mf = setup
    coords = [np.asarray(f.coords_main)[:40] for f in mf.fields]
    reps = simulate_replicates(mod.params, coords, 3000, seed=1, geodesic=False)
    assert reps[0].shape == (3000, 40)
    # marginal variance = sigma^2 + nugget
    np.testing.assert_allclose(reps[0].var(axis=0), 1.05, rtol=0.15)
    np.testing.assert_allclose(reps[1].var(axis=0), 1.05, rtol=0.15)
    # cross-correlation at colocated sites has the sign of rho
    shared = min(coords[0].shape[0], coords[1].shape[0])
    colocated = np.all(coords[0][:shared] == coords[1][:shared], axis=1)
    if colocated.any():
        k = np.argmax(colocated)
        r = np.corrcoef(reps[0][:, k], reps[1][:, k])[0, 1]
        assert r < -0.3


def test_parametric_bootstrap_end_to_end(setup):
    mod, mf = setup
    config = VarioConfig(max_dist=0.9, n_bins=10, geodesic=False)
    result = parametric_bootstrap(
        mod, mf, config, n_rep=32, seed=7, maxiter=120
    )
    assert result.flats.shape == (32, 11)
    assert np.isfinite(result.flats).all()
    assert np.isfinite(result.costs).all()
    df = result.summary()
    assert (df["std_err"].values > 0).all()
    # the generator's own parameters must sit inside the replicate cloud
    # for the well-identified marginals
    for k in [0, 1, 10]:  # sigma_0, sigma_1, rho
        lo = result.flats[:, k].min() - 3 * df["std_err"].values[k]
        hi = result.flats[:, k].max() + 3 * df["std_err"].values[k]
        assert lo < TRUTH[k] < hi, (k, lo, TRUTH[k], hi)
    cov = df.attrs["covariance"]
    assert cov.shape == (11, 11)
    assert np.all(np.linalg.eigvalsh(0.5 * (cov + cov.T)) > -1e-10)


def test_parametric_bootstrap_sharded(setup):
    from cokriging_tpu.parallel import make_mesh

    mod, mf = setup
    config = VarioConfig(max_dist=0.9, n_bins=10, geodesic=False)
    mesh = make_mesh(8)
    r_mesh = parametric_bootstrap(
        mod, mf, config, n_rep=8, seed=3, maxiter=60, mesh=mesh
    )
    r_one = parametric_bootstrap(
        mod, mf, config, n_rep=8, seed=3, maxiter=60
    )
    # Identical math, but compilation differences (reduction
    # reassociation across the sharded layout) perturb each objective
    # eval at float-eps scale, and iterated nonconvex optimization
    # amplifies that chaotically. Replicates whose WLS surface is
    # BISTABLE (two basins within a few percent in cost) can land in
    # different basins between layouts — that is a property of the
    # problem, not a sharding bug. A genuine layout bug corrupts every
    # row, so the invariant is: all but at most one replicate agree to a
    # few percent, and the one allowed flip must still be a comparable
    # optimum (cost within 15%).
    row_ok = (
        np.abs(r_mesh.flats - r_one.flats)
        <= 0.05 + 0.1 * np.abs(r_one.flats)
    ).all(axis=1)
    assert row_ok.sum() >= len(row_ok) - 1, row_ok
    np.testing.assert_allclose(r_mesh.costs, r_one.costs, rtol=0.15)
