"""Covariance model vs the reference semantics (golden values computed by
re-deriving src/model.py:173-247 formulas with scipy)."""

import numpy as np
import jax.numpy as jnp
import scipy.special as sps

from cokriging_tpu.cov import (
    MaternParams,
    matern_correlation,
    covariance,
    cross_covariance,
    semivariance,
    cross_semivariance,
    MultivariateMatern,
)

# Simulation-experiment truth parameters
# (reference: research/simulation_experiment.ipynb cell 3)
SIM_PARAMS = [1.0, 1.0, 1.5, 1.5, 1.5, 0.2, 0.2, 0.2, 0.0, 0.0, -0.6]


def _scipy_matern(nu, ell, h):
    h = np.atleast_1d(np.abs(np.asarray(h, float)))
    out = np.ones_like(h)
    pos = h > 0
    hs = h[pos] / ell
    arg = np.sqrt(2 * nu) * hs
    val = np.exp((1 - nu) * np.log(2) - sps.gammaln(nu) + nu * np.log(arg)) * sps.kv(
        nu, arg
    )
    val[~np.isfinite(val)] = 0.0
    out[pos] = np.maximum(val, 0.0)
    return out


def test_flat_roundtrip():
    p = MaternParams.from_flat(np.array(SIM_PARAMS))
    np.testing.assert_allclose(np.asarray(p.to_flat()), SIM_PARAMS)
    assert p.spec.n_params == 11
    assert p.nu[0, 1] == p.nu[1, 0] == 1.5
    assert p.rho[0, 1] == -0.6
    assert p.sigma.shape == (2,)


def test_param_names_and_bounds():
    p = MaternParams.default()
    names = p.spec.names()
    assert names == [
        "sigma_11", "sigma_22",
        "nu_11", "nu_12", "nu_22",
        "len_scale_11", "len_scale_12", "len_scale_22",
        "nugget_11", "nugget_22",
        "rho_12",
    ]
    lo, hi = p.spec.bounds()
    assert lo[0] == 0.4 and hi[0] == 3.5  # sigma
    assert lo[-1] == -1.0 and hi[-1] == 1.0  # rho


def test_matern_correlation_matches_scipy():
    h = np.concatenate([[0.0], np.logspace(-3, 3.5, 200)])
    for nu, ell in [(0.5, 300.0), (1.5, 500.0), (2.5, 1000.0), (3.49, 150.0)]:
        ref = _scipy_matern(nu, ell, h)
        got = np.asarray(matern_correlation(nu, ell, jnp.array(h)))
        np.testing.assert_allclose(got, ref, rtol=1e-11, atol=1e-14)
    assert float(matern_correlation(1.5, 500.0, 0.0)) == 1.0


def test_covariance_nugget_only_at_zero():
    flat = list(SIM_PARAMS)
    flat[8] = 0.05  # nugget_11
    p = MaternParams.from_flat(np.array(flat))
    h = jnp.array([0.0, 1e-9, 0.3])
    c = np.asarray(covariance(p, 0, h))
    # exact zero gets nugget
    assert np.isclose(c[0], 1.0**2 + 0.05)
    # tiny-but-nonzero does not (reference: cov[h == 0] += nugget)
    assert c[1] < 1.0 + 1e-6


def test_cross_covariance_symmetric_and_scaled():
    flat = list(SIM_PARAMS)
    flat[0], flat[1] = 1.3, 0.7  # distinct sigmas
    p = MaternParams.from_flat(np.array(flat))
    h = jnp.array([0.0, 0.1, 0.5])
    c01 = np.asarray(cross_covariance(p, 0, 1, h))
    c10 = np.asarray(cross_covariance(p, 1, 0, h))
    np.testing.assert_allclose(c01, c10)
    # at h=0: rho * sigma1 * sigma2
    np.testing.assert_allclose(c01[0], -0.6 * 1.3 * 0.7)


def test_semivariance_and_sill():
    flat = list(SIM_PARAMS)
    flat[8], flat[9] = 0.04, 0.09
    p = MaternParams.from_flat(np.array(flat))
    # far field: semivariance -> sigma^2 + nugget
    far = float(semivariance(p, 0, jnp.array([50.0]))[0])
    assert np.isclose(far, 1.0 + 0.04, atol=1e-6)
    # cross-semivariance at h=0 = sill - rho*sig1*sig2
    sill = 0.5 * (1 + 0.04 + 1 + 0.09)
    got = float(cross_semivariance(p, 0, 1, jnp.array([0.0]))[0])
    assert np.isclose(got, sill - (-0.6), atol=1e-12)


def test_oo_wrapper_variograms():
    mod = MultivariateMatern(params=MaternParams.from_flat(np.array(SIM_PARAMS)))
    h = np.linspace(0, 1.0, 50)
    df = mod.variograms(h)
    assert set(df.index.get_level_values("i")) == {0, 1}
    assert len(df) == 150  # three (i,j) groups
    # semivariogram starts at nugget (0 here) and increases
    g00 = df.loc[(0, 0)]["variogram"].values
    assert g00[0] == 0.0 and g00[-1] > g00[1]


def test_matern_correlation_custom_vjp_matches_raw_ad():
    """The chunk-bounded custom VJP (cov/matern.py:_matern_corr_cvjp_bwd)
    must reproduce plain reverse-mode through the K_nu kernel exactly —
    including the forced multi-chunk scan path and gradients w.r.t. h."""
    import jax

    import cokriging_tpu.cov.matern as M

    rng = np.random.default_rng(3)
    h = jnp.asarray(np.abs(rng.normal(size=(23, 19))) * 900.0)
    h = h.at[0, 0].set(0.0)
    ct = jnp.asarray(rng.normal(size=(23, 19)))
    p0 = jnp.array([1.37, 612.0])

    def loss(fn):
        return lambda p: jnp.sum(ct * fn(p[0], p[1], h))

    saved = M.BWD_CHUNK_ELEMS
    try:
        M.BWD_CHUNK_ELEMS = 37  # force the padded multi-chunk scan
        v1, g1 = jax.value_and_grad(loss(M.matern_correlation))(p0)
        gh1 = jax.grad(
            lambda hh: jnp.sum(ct * M.matern_correlation(1.37, 612.0, hh))
        )(h)
    finally:
        M.BWD_CHUNK_ELEMS = saved
    v2, g2 = jax.value_and_grad(loss(M._matern_corr_raw))(p0)
    gh2 = jax.grad(
        lambda hh: jnp.sum(ct * M._matern_corr_raw(1.37, 612.0, hh))
    )(h)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-8)
    np.testing.assert_allclose(np.asarray(gh1), np.asarray(gh2), rtol=1e-8)


def test_matern_correlation_h_grad_false_matches():
    """The h_grad=False reverse pass (cov/matern.py:_matern_corr_nh_bwd —
    slice-scanned scalar-only accumulation, 437-element tail exercised)
    must produce the same nu/len_scale gradients as full AD, and a zero
    h-cotangent."""
    import jax

    import cokriging_tpu.cov.matern as M

    rng = np.random.default_rng(7)
    h = jnp.asarray(np.abs(rng.normal(size=(31, 17))) * 700.0)
    h = h.at[0, 0].set(0.0)
    ct = jnp.asarray(rng.normal(size=(31, 17)))
    p0 = jnp.array([2.1, 480.0])

    saved = M.BWD_CHUNK_ELEMS
    try:
        M.BWD_CHUNK_ELEMS = 45  # multi-chunk loop + ragged tail
        v1, g1 = jax.value_and_grad(
            lambda p: jnp.sum(ct * M.matern_correlation(p[0], p[1], h, h_grad=False))
        )(p0)
        gh = jax.grad(
            lambda hh: jnp.sum(
                ct * M.matern_correlation(2.1, 480.0, hh, h_grad=False)
            )
        )(h)
    finally:
        M.BWD_CHUNK_ELEMS = saved
    v2, g2 = jax.value_and_grad(
        lambda p: jnp.sum(ct * M._matern_corr_raw(p[0], p[1], h))
    )(p0)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-12)
    # 5e-8: the two paths sum identical per-element contributions in
    # different orders (45-element scan chunks vs one fused reduction);
    # f64 accumulation-order noise on the nu component sits at ~2e-8
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=5e-8)
    assert np.all(np.asarray(gh) == 0.0)


def test_block_covariance_h_grad_false_grads_match():
    """block_covariance(h_grad=False) routes whole blocks (scale + nugget
    included) through the scalar-cotangent chunked VJP
    (cov/matern.py:_scaled_matern_nh_bwd); gradients w.r.t. the full flat
    parameter vector must match plain AD through the default path."""
    import jax

    from cokriging_tpu.cov.matern import block_covariance
    from cokriging_tpu.cov.params import MaternParams

    rng = np.random.default_rng(11)
    n0, n1 = 13, 9
    d00 = np.abs(rng.normal(size=(n0, n0))) * 500.0
    d00[np.diag_indices(n0)] = 0.0
    d11 = np.abs(rng.normal(size=(n1, n1))) * 500.0
    d11[np.diag_indices(n1)] = 0.0
    d01 = np.abs(rng.normal(size=(n0, n1))) * 500.0
    dists = [
        [jnp.asarray(d00), jnp.asarray(d01)],
        [jnp.asarray(d01).T, jnp.asarray(d11)],
    ]
    ct = jnp.asarray(rng.normal(size=(n0 + n1, n0 + n1)))
    flat = jnp.asarray(
        [1.2, 0.8, 1.5, 1.7, 2.1, 400.0, 500.0, 600.0, 0.05, 0.1, -0.5]
    )
    spec = MaternParams.default().spec

    def loss(h_grad):
        def f(x):
            p = MaternParams.from_flat(x, spec=spec)
            return jnp.sum(ct * block_covariance(p, dists, h_grad=h_grad))

        return f

    v1, g1 = jax.value_and_grad(loss(False))(flat)
    v2, g2 = jax.value_and_grad(loss(True))(flat)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-8)
