"""Vecchia-approximation NLL (estimate/vecchia.py).

The scalable companion to the exact likelihood: N batched (m+1)-point
conditionals instead of one N x N Cholesky. Oracles:

- with m = N - 1 the telescoping product is EXACT for any ordering, so
  the Vecchia NLL must equal estimate.nll.neg_log_likelihood to float
  precision;
- with modest m it must stay within a fraction of a percent of exact on
  a smooth field, and its gradients must be finite;
- fitting simulated data must recover parameters about as well as the
  exact-NLL fit.

The reference has no likelihood estimator at all (SURVEY.md section 2);
these tests validate the added axis against our own exact NLL.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cokriging_tpu.cov import MaternParams
from cokriging_tpu.cov.matern import block_covariance
from cokriging_tpu.estimate.nll import joint_distance_blocks, neg_log_likelihood
from cokriging_tpu.estimate.vecchia import (
    VecchiaLikelihood,
    fit_vecchia,
    maxmin_order,
    nearest_previous_neighbors,
)

FLAT = jnp.asarray(
    [1.1, 0.9, 1.5, 1.2, 1.4, 0.25, 0.3, 0.27, 0.04, 0.06, -0.55]
)


@pytest.fixture(scope="module")
def sim_data():
    """Bivariate cofield on a grid, semi-colocated-ish irregular sample."""
    truth = MaternParams.default(2).with_flat(FLAT)
    rng = np.random.default_rng(3)
    c1 = rng.uniform(0, 1, (90, 2))
    c2 = np.concatenate([c1[:45], rng.uniform(0, 1, (45, 2))])
    from cokriging_tpu.kernels.distance import euclidean_matrix

    dists = [
        [euclidean_matrix(a, b) for b in (c1, c2)] for a in (c1, c2)
    ]
    C = np.asarray(block_covariance(truth, dists, h_grad=False))
    L = np.linalg.cholesky(C + 1e-10 * np.eye(len(C)))
    z = L @ rng.normal(size=len(C))
    return truth, [c1, c2], [z[:90], z[90:]]


def test_maxmin_order_is_permutation_and_spreads():
    rng = np.random.default_rng(0)
    coords = rng.uniform(0, 1, (200, 2))
    perm = maxmin_order(coords, geodesic=False)
    assert sorted(perm.tolist()) == list(range(200))
    # the first 10 maxmin points must be far more spread out than a
    # random 10: their min pairwise distance is large
    from scipy.spatial.distance import pdist

    d_first = pdist(coords[perm[:10]]).min()
    d_rand = np.median(
        [pdist(coords[rng.choice(200, 10, replace=False)]).min() for _ in range(20)]
    )
    assert d_first > 2.0 * d_rand


def test_neighbors_are_previous_and_nearest():
    rng = np.random.default_rng(1)
    coords = rng.uniform(0, 1, (60, 2))
    nbr, mask = nearest_previous_neighbors(coords, m=5, geodesic=False, block=16)
    assert nbr.shape == (60, 5) and mask.shape == (60, 5)
    assert not mask[0].any()  # first point: no predecessors
    for i in (7, 25, 59):
        d = np.linalg.norm(coords[:i] - coords[i], axis=1)
        want = set(np.argsort(d)[: min(5, i)])
        got = set(nbr[i][mask[i]].tolist())
        assert got == want


def test_full_conditioning_equals_exact_nll(sim_data):
    truth, coords, values = sim_data
    n = sum(len(v) for v in values)
    lik = VecchiaLikelihood(coords, values, m=n - 1, geodesic=False)
    got = float(lik.nll(FLAT, truth.spec))
    dists = joint_distance_blocks([jnp.asarray(c) for c in coords], geodesic=False)
    want = float(
        neg_log_likelihood(
            FLAT, dists, jnp.concatenate([jnp.asarray(v) for v in values]),
            truth.spec,
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-8)


def test_modest_m_close_to_exact_and_grad_finite(sim_data):
    truth, coords, values = sim_data
    dists = joint_distance_blocks([jnp.asarray(c) for c in coords], geodesic=False)
    exact = float(
        neg_log_likelihood(
            FLAT, dists, jnp.concatenate([jnp.asarray(v) for v in values]),
            truth.spec,
        )
    )
    prev_err = None
    for m in (10, 25):
        lik = VecchiaLikelihood(coords, values, m=m, geodesic=False, chunk=64)
        got = float(lik.nll(FLAT, truth.spec))
        err = abs(got - exact) / abs(exact)
        assert err < 0.05, (m, got, exact)
        if prev_err is not None:
            assert err <= prev_err * 1.5  # roughly improving in m
        prev_err = err
        g = jax.grad(lambda f: lik.nll(f, truth.spec))(FLAT)
        assert np.isfinite(np.asarray(g)).all()


def test_gradient_finite_at_non_pd_parameters(sim_data):
    """At a non-PD parameter point (|rho| ~ 1 with colocated cross-process
    samples) each term's Cholesky is NaN. The value must be the finite
    penalty AND the gradient must be finite: jnp.where alone does not
    stop reverse-mode from evaluating the NaN branch, so the factor is
    sanitized before use (the bug that silently stalled the host L-BFGS
    near its init — cross-parameters never moved)."""
    truth, coords, values = sim_data
    lik = VecchiaLikelihood(coords, values, m=15, geodesic=False, chunk=64)
    bad_flat = jnp.asarray(
        [1.1, 0.9, 1.5, 1.5, 1.4, 0.25, 0.25, 0.27, 0.0, 0.0, 0.9999]
    )
    v, g = jax.value_and_grad(lambda f: lik.nll(f, truth.spec))(bad_flat)
    assert np.isfinite(float(v))
    assert float(v) > 1e5  # penalty regime
    assert np.isfinite(np.asarray(g)).all()


def test_fit_vecchia_matches_exact_nll_optimum(sim_data):
    """The Vecchia fit must land where the exact-likelihood fit lands.

    Individual sigma/len_scale are NOT the oracle here: at fixed domain
    only the microergodic ratio sigma^2 / l^(2 nu) is consistently
    estimable (Zhang 2004), so any likelihood method may wander along
    that ridge with n = 180. The correct check is that the Vecchia
    optimum is (a) as good as the exact-NLL optimum under the EXACT
    likelihood, and (b) agrees on the identifiable quantities (cross-
    correlation sign/magnitude, microergodic ratios)."""
    truth, coords, values = sim_data
    from cokriging_tpu.fields.field import Field, MultiField

    fields = []
    for k in range(2):
        f = Field.from_arrays(coords[k], values[k], f"Z{k}")
        f.geodesic = False
        fields.append(f)
    mf = MultiField(fields=fields)

    from cokriging_tpu.cov.params import ParamSpec
    from cokriging_tpu.estimate.nll import fit_nll

    spec = ParamSpec(
        n_procs=2, len_scale_bounds=(0.05, 2.0), sigma_bounds=(0.2, 3.0)
    )
    # mid-box init: MaternParams.default's len_scale = 500 km clips to the
    # 2.0 upper bound, i.e. a *saturated* start under the sigmoid box
    # transform (u0 ~ +14, near-zero gradients) — pathological for any of
    # the likelihood drivers
    init = MaternParams.default(2, spec).with_flat(
        jnp.asarray([1.0, 1.0, 1.5, 1.5, 1.5, 0.5, 0.5, 0.5, 0.05, 0.05, 0.0])
    )
    params_v, info = fit_vecchia(mf, init=init, m=25, maxiter=60, main=False)
    params_e, _ = fit_nll(mf, init=init, maxiter=60, main=False)
    assert float(params_v.rho[0, 1]) < -0.2

    dists = joint_distance_blocks(
        [jnp.asarray(c) for c in coords], geodesic=False
    )
    z = jnp.concatenate([jnp.asarray(v) for v in values])
    nll_at = lambda p: float(neg_log_likelihood(p.to_flat(), dists, z, spec))
    nv, ne = nll_at(params_v), nll_at(params_e)
    # (a) near-optimal under the exact likelihood (within 2% or 2 nats)
    assert nv <= ne + max(2.0, 0.02 * abs(ne)), (nv, ne)
    # (b) identifiable quantities agree between the two fits
    np.testing.assert_allclose(
        float(params_v.rho[0, 1]), float(params_e.rho[0, 1]), atol=0.15
    )
    for k in range(2):
        def micro(p):
            return float(
                p.sigma[k] ** 2 / p.len_scale[k, k] ** (2.0 * p.nu[k, k])
            )

        ratio = micro(params_v) / micro(params_e)
        assert 0.5 < ratio < 2.0, (k, ratio)


def test_fit_vecchia_device_matches_host(sim_data):
    """The one-dispatch on-device L-BFGS fitter reaches the same Vecchia
    optimum as the host scipy driver (companion to
    tests/test_nll.py::test_device_lbfgs_matches_scipy_optimum)."""
    truth, coords, values = sim_data
    from cokriging_tpu.cov.params import ParamSpec
    from cokriging_tpu.estimate.vecchia import fit_vecchia_device
    from cokriging_tpu.fields.field import Field, MultiField

    fields = []
    for k in range(2):
        f = Field.from_arrays(coords[k], values[k], f"Z{k}")
        f.geodesic = False
        fields.append(f)
    mf = MultiField(fields=fields)
    spec = ParamSpec(
        n_procs=2, len_scale_bounds=(0.05, 2.0), sigma_bounds=(0.2, 3.0)
    )
    init = MaternParams.default(2, spec).with_flat(
        jnp.asarray([1.0, 1.0, 1.5, 1.5, 1.5, 0.5, 0.5, 0.5, 0.05, 0.05, 0.0])
    )
    kw = dict(init=init, m=15, maxiter=80, main=False, chunk=64)
    p_dev, i_dev = fit_vecchia_device(mf, **kw)
    p_host, i_host = fit_vecchia(mf, **kw)
    assert i_dev["nll"] <= i_host["nll"] + max(0.5, 5e-3 * abs(i_host["nll"]))
    np.testing.assert_allclose(
        float(p_dev.rho[0, 1]), float(p_host.rho[0, 1]), atol=0.1
    )
    # n_iter is the real L-BFGS step count, not the maxiter ceiling echoed
    assert 0 < i_dev["n_iter"] <= 80


def test_fit_vecchia_host_f32_fields(sim_data):
    """The host driver must trace cleanly when the fields are float32 (the
    TPU data path): f64 parameters against f32 windows used to promote the
    scan carry mid-trace and crash with a carry-dtype mismatch."""
    truth, coords, values = sim_data
    from cokriging_tpu.cov.params import ParamSpec
    from cokriging_tpu.fields.field import Field, MultiField

    fields = []
    for k in range(2):
        f = Field.from_arrays(
            np.asarray(coords[k], np.float32),
            np.asarray(values[k], np.float32),
            f"Z{k}",
        )
        f.geodesic = False
        fields.append(f)
    mf = MultiField(fields=fields)
    spec = ParamSpec(
        n_procs=2, len_scale_bounds=(0.05, 2.0), sigma_bounds=(0.2, 3.0)
    )
    init = MaternParams.default(2, spec).with_flat(
        jnp.asarray([1.0, 1.0, 1.5, 1.5, 1.5, 0.5, 0.5, 0.5, 0.05, 0.05, 0.0])
    )
    params, info = fit_vecchia(
        mf, init=init, m=10, maxiter=3, main=False, chunk=64
    )
    assert np.isfinite(info["nll"])


def test_coarse_to_fine_order_is_permutation_and_spreads():
    from scipy.spatial.distance import pdist

    from cokriging_tpu.estimate.vecchia import coarse_to_fine_order

    rng = np.random.default_rng(0)
    coords = rng.uniform(0, 1, (500, 2))
    perm = coarse_to_fine_order(coords, geodesic=False)
    assert sorted(perm.tolist()) == list(range(500))
    # coarse-first structure: the first 10 points spread far better than
    # random (grid decimation's random in-cell representatives spread
    # slightly less than exact farthest-point, hence 1.5x not maxmin's 2x)
    d_first = pdist(coords[perm[:10]]).min()
    d_rand = np.median(
        [pdist(coords[rng.choice(500, 10, replace=False)]).min() for _ in range(20)]
    )
    assert d_first > 1.5 * d_rand
    # geodesic embedding path + exact-duplicate coords terminate
    lat = rng.uniform(25, 50, 300)
    lon = rng.uniform(-120, -70, 300)
    c = np.column_stack([lat, lon])
    c[10] = c[200]  # duplicate
    perm_g = coarse_to_fine_order(c, geodesic=True)
    assert sorted(perm_g.tolist()) == list(range(300))


def test_kd_neighbors_valid_and_near_exact():
    """kd search: exact below the device prefix; above it, strictly
    previous, duplicate-free, and distance-quality close to the exact
    blocked top-k (same-block predecessors beyond the global m+1 nearest
    may be approximated away — by design, see the docstring)."""
    from cokriging_tpu.estimate.vecchia import (
        coarse_to_fine_order,
        nearest_previous_neighbors_kd,
    )
    from cokriging_tpu.kernels.distance import haversine_matrix

    rng = np.random.default_rng(2)
    lat = rng.uniform(25, 50, 400)
    lon = rng.uniform(-120, -70, 400)
    coords = np.column_stack([lat, lon])
    # colocated pair late in the ordering: the global-query merge must
    # recover the distance-0 partner even when it is a same-block row
    coords[390] = coords[391]
    perm = coarse_to_fine_order(coords, geodesic=True)
    c_ord = coords[perm]
    m = 8
    nbr_d, mask_d = nearest_previous_neighbors(c_ord, m=m, geodesic=True)
    nbr_k, mask_k = nearest_previous_neighbors_kd(
        c_ord, m=m, geodesic=True, exact_prefix=64
    )
    # exact below the prefix (masked padding slots may differ)
    np.testing.assert_array_equal(mask_k[:64], mask_d[:64])
    for i in range(64):
        assert set(nbr_k[i][mask_k[i]].tolist()) == set(
            nbr_d[i][mask_d[i]].tolist()
        ), i
    for i in range(64, 400):
        got = nbr_k[i][mask_k[i]]
        assert (got < i).all()  # strictly previous
        assert len(set(got.tolist())) == len(got)  # no duplicates
        assert mask_k[i].sum() == m  # plenty of predecessors here
    # aggregate distance quality: mean kd-neighbor distance within 10%
    # of the exact search's
    def mean_dist(nbr, mask):
        tot = 0.0
        for i in range(64, 400):
            d = np.asarray(
                haversine_matrix(c_ord[i][None], c_ord[nbr[i][mask[i]]])
            )[0]
            tot += d.mean()
        return tot
    assert mean_dist(nbr_k, mask_k) < 1.10 * mean_dist(nbr_d, mask_d)
    # the colocated partner (distance 0) is found
    late = max(np.flatnonzero(perm == 390)[0], np.flatnonzero(perm == 391)[0])
    early = min(np.flatnonzero(perm == 390)[0], np.flatnonzero(perm == 391)[0])
    assert early in nbr_k[late][mask_k[late]]


def test_coarse_ordering_nll_close_to_maxmin(sim_data):
    """The approximate ordering must give a Vecchia NLL about as close to
    exact as the exact maxmin ordering does (Guinness 2018: accuracy is
    driven by the coarse-to-fine structure, not exact farthest-point)."""
    truth, coords, values = sim_data
    dists = joint_distance_blocks([jnp.asarray(c) for c in coords], geodesic=False)
    exact = float(
        neg_log_likelihood(
            FLAT, dists, jnp.concatenate([jnp.asarray(v) for v in values]),
            truth.spec,
        )
    )
    lik_mm = VecchiaLikelihood(coords, values, m=30, geodesic=False)
    lik_cf = VecchiaLikelihood(
        coords, values, m=30, geodesic=False,
        ordering="coarse", neighbor_method="kd",
    )
    err_mm = abs(float(lik_mm.nll(FLAT, truth.spec)) - exact)
    err_cf = abs(float(lik_cf.nll(FLAT, truth.spec)) - exact)
    # within a fraction of a percent of exact, and within a small factor
    # of the exact-maxmin ordering's own approximation error (measured
    # 0.58 vs 0.22 nats on |exact| = 105 at this n)
    assert err_cf < 0.01 * abs(exact)
    assert err_cf < 5.0 * max(err_mm, 1e-3 * abs(exact))
