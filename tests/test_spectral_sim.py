"""Circulant-embedding simulator: exactness vs the dense covariance,
statistical correctness of draws, and API interop with the harness."""

import jax.numpy as jnp
import numpy as np
import pytest

from cokriging_tpu.cov import MaternParams, MultivariateMatern
from cokriging_tpu.cov.matern import block_covariance
from cokriging_tpu.kernels.distance import euclidean_matrix
from cokriging_tpu.sim import CartesianGrid, SpectralRandomField


@pytest.fixture(scope="module")
def model():
    # Gneiting-valid with margin: nu12 strictly above the (nu1 + nu2)/2
    # floor (AT the floor, det S(w) -> 0 as w -> inf, and fine grids reach
    # frequencies where rounding flips it negative), l12 = min(l1, l2),
    # |rho| < rho_max (= 0.652 here, cov.spectral.rho_max)
    # flat nu entries are triu order (nu11, nu12, nu22): nu11=1.5,
    # nu12=1.4 > (1.5 + 1.0)/2 = 1.25 floor, nu22=1.0
    flat = jnp.array([1.0, 0.8, 1.5, 1.4, 1.0, 0.15, 0.1, 0.1, 0.05, 0.02, -0.4])
    return MultivariateMatern(params=MaternParams.from_flat(flat))


@pytest.fixture(scope="module")
def rf(model):
    return SpectralRandomField(
        model, CartesianGrid(xcount=12, ycount=9), seed=3
    )


def test_embedding_is_psd_and_unclipped(rf):
    assert rf.min_rel_eig >= -1e-9


def test_realized_covariance_matches_dense_blocks(rf, model):
    """The torus covariance the sampler realizes, gathered at every grid
    pair's minimal-image lag, must equal the dense joint covariance the
    reference simulator factorizes (src/sim.py:45-50) — the deterministic
    exactness proof that needs no sampling."""
    grid = rf.grid
    pts = grid.coords[["x", "y"]].values
    dist = euclidean_matrix(jnp.asarray(pts), jnp.asarray(pts))
    p = model.n_procs
    dense = block_covariance(model.params, [[dist] * p for _ in range(p)])

    xs = np.unique(pts[:, 0])
    ys = np.unique(pts[:, 1])
    dx, dy = xs[1] - xs[0], ys[1] - ys[0]
    ix = np.rint((pts[:, 0] - xs[0]) / dx).astype(int)
    iy = np.rint((pts[:, 1] - ys[0]) / dy).astype(int)
    lag_x = (ix[:, None] - ix[None, :]) % rf._mx
    lag_y = (iy[:, None] - iy[None, :]) % rf._my

    n = len(pts)
    for i in range(p):
        for j in range(p):
            c_emb = np.asarray(rf.embedded_covariance(i, j))[lag_x, lag_y]
            got = np.asarray(dense)[i * n : (i + 1) * n, j * n : (j + 1) * n]
            np.testing.assert_allclose(c_emb, got, rtol=1e-8, atol=1e-10)


def test_ensemble_sample_covariance(model):
    """4k draws on a small grid reproduce the dense covariance to Monte
    Carlo accuracy — validates the complex-normal / FFT normalization."""
    grid = CartesianGrid(xcount=6, ycount=5)
    rf = SpectralRandomField(model, grid, seed=0)
    ns = 4000
    ens = np.asarray(rf.sample_ensemble(ns, seed=11))  # (ns, p, nx, ny)
    p, n = model.n_procs, grid.count
    flat = ens.reshape(ns, p * n)
    emp = flat.T @ flat / ns

    dist = euclidean_matrix(
        jnp.asarray(grid.coords.values), jnp.asarray(grid.coords.values)
    )
    dense = np.asarray(
        block_covariance(model.params, [[dist] * p for _ in range(p)])
    )
    err = np.abs(emp - dense).max()
    assert err < 6.0 / np.sqrt(ns), f"max covariance error {err:.4f}"
    # Re/Im of one complex pass are independent: draw s and its twin land
    # at indices s and s + n_draw (concatenated halves in _draw), so pair
    # the halves elementwise across the concatenation boundary.
    cross = np.abs(flat[: ns // 2].T @ flat[ns // 2 :]) / (ns // 2)
    assert cross.max() < 10.0 / np.sqrt(ns)


def test_sampling_harness_interop(rf):
    """Inherited semi-colocated sampling + measurement error + to_fields
    feed the estimation/prediction stack unchanged (src/sim.py:67-137)."""
    samples = rf.sample(size=40, epsilon=[0.1, 0.1], seed=7)
    assert len(samples) == 2 and all(len(s) == 40 for s in samples)
    mf = rf.to_fields(samples)
    assert mf.n_procs == 2
    truth = rf.truth_at(0, samples[0][["x", "y"]].values)
    noise = samples[0]["Z0"].values - truth
    assert 0.03 < noise.std() < 0.3  # epsilon-scale, not field-scale


def test_large_grid_fast_smoke(model):
    """A 128x128 bivariate cofield (dense equivalent: 32.8k-dim Cholesky)
    simulates without materializing anything quadratic."""
    rf = SpectralRandomField(model, CartesianGrid(xcount=128, ycount=128))
    vals = rf.fields[0]["value"].values
    assert vals.shape == (128 * 128,) and np.isfinite(vals).all()
    assert 0.3 < vals.std() < 3.0
