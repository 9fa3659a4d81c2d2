"""Matern spectral densities: normalization, roundtrip to correlation, and
parameterization conversions (research/matern_spectrum.ipynb parity)."""

import numpy as np
import jax
import jax.numpy as jnp

from cokriging_tpu.cov.spectral import (
    matern_spectral_density_1d,
    classic_to_rw_len_scale,
    rw_to_classic_len_scale,
    spectral_correlation_roundtrip,
)
from cokriging_tpu.cov.matern import matern_correlation


def test_spectral_density_integrates_to_variance():
    # 2 * int_0^inf S(w) dw = sigma2 for d=1
    nu, ell, sigma2 = 1.5, 0.3, 1.7
    w = np.linspace(0, 400.0, 400_000)
    s = np.asarray(matern_spectral_density_1d(jnp.asarray(w), nu, ell, sigma2))
    total = 2.0 * np.trapezoid(s, w)
    np.testing.assert_allclose(total, sigma2, rtol=1e-4)


def test_spectral_roundtrip_matches_correlation():
    nu, ell = 1.5, 0.25
    h = np.array([0.0, 0.05, 0.1, 0.2, 0.4, 0.8])
    corr_direct = np.asarray(matern_correlation(nu, ell, jnp.asarray(h)))
    corr_spectral = np.asarray(
        spectral_correlation_roundtrip(nu, ell, h, n_freq=200_000, w_max=600.0)
    )
    np.testing.assert_allclose(corr_spectral, corr_direct, atol=2e-4)


def test_spectral_roundtrip_matches_correlation_2d():
    """d=2 Hankel-transform inversion — the dimensionality of the
    reference's spectral cross-checks (research/matern_spectrum.ipynb
    cells 7-14)."""
    h = np.linspace(0.01, 2.0, 10)
    for nu, ell in [(0.5, 0.3), (1.5, 0.25), (2.5, 1.0)]:
        corr_direct = np.asarray(matern_correlation(nu, ell, jnp.asarray(h)))
        corr_spectral = np.asarray(
            spectral_correlation_roundtrip(nu, ell, h, d=2, n_freq=8192)
        )
        np.testing.assert_allclose(
            corr_spectral, corr_direct, atol=5e-4, err_msg=f"nu={nu} ell={ell}"
        )


def test_bessel_j0_accuracy():
    import scipy.special as sps

    from cokriging_tpu.cov.spectral import bessel_j0

    x = np.concatenate([np.linspace(0.0, 7.99, 300), np.linspace(8.0, 80.0, 300)])
    np.testing.assert_allclose(
        np.asarray(bessel_j0(x)), sps.j0(x), atol=1e-8
    )


def test_parameterization_roundtrip():
    nu = 2.3
    ell = 0.7
    classic = rw_to_classic_len_scale(ell, nu)
    np.testing.assert_allclose(float(classic_to_rw_len_scale(classic, nu)), ell)
    # classic form K_nu(h / scale): evaluating RW matern at its own ell
    # equals classic matern at scale = ell / sqrt(2 nu) by construction
    h = jnp.asarray([0.1, 0.5, 1.0])
    import scipy.special as sps

    hs = np.asarray(h) / float(classic)
    classic_corr = (
        2 ** (1 - nu) / sps.gamma(nu) * hs**nu * sps.kv(nu, hs)
    )
    np.testing.assert_allclose(
        np.asarray(matern_correlation(nu, ell, h)), classic_corr, rtol=1e-10
    )


def test_rho_max_validity_bound():
    """Gneiting Thm-3 spectral bound: 1 for identical structures, 0 when
    the cross-smoothness condition fails, and empirically tight — the
    joint covariance is PD just inside the bound and indefinite above it."""
    from cokriging_tpu.cov.spectral import rho_max, project_to_valid
    from cokriging_tpu.cov.params import MaternParams
    from cokriging_tpu.cov.matern import block_covariance
    from cokriging_tpu.estimate.nll import joint_distance_blocks

    assert float(rho_max(1.5, 500.0, 1.5, 500.0, 1.5, 500.0)) == 1.0
    # nu12 < (nu1 + nu2) / 2 -> no nonzero rho is valid
    assert float(rho_max(1.5, 500.0, 2.5, 500.0, 1.5, 500.0)) == 0.0

    rng = np.random.default_rng(0)
    coords = [rng.uniform(0, 2000, size=(80, 2)) for _ in range(2)]
    dists = joint_distance_blocks(
        [jnp.asarray(c) for c in coords], geodesic=False
    )

    def with_rho(rho_val, nu12, l12):
        p = MaternParams.default(2)
        nu = p.nu.at[0, 0].set(0.6).at[1, 1].set(1.8)
        nu = nu.at[0, 1].set(nu12).at[1, 0].set(nu12)
        ls = p.len_scale.at[0, 0].set(300.0).at[1, 1].set(600.0)
        ls = ls.at[0, 1].set(l12).at[1, 0].set(l12)
        rho = p.rho.at[0, 1].set(rho_val).at[1, 0].set(rho_val)
        return p.replace(nu=nu, len_scale=ls, rho=rho)

    for nu12, l12 in ((1.3, 400.0), (1.5, 450.0), (2.0, 500.0)):
        b = float(rho_max(0.6, 300.0, 1.8, 600.0, nu12, l12))
        assert 0.0 < b < 1.0
        inside = with_rho(0.95 * b, nu12, l12)
        outside = with_rho(min(1.0, 1.25 * b), nu12, l12)
        e_in = np.linalg.eigvalsh(np.asarray(block_covariance(inside, dists))).min()
        e_out = np.linalg.eigvalsh(np.asarray(block_covariance(outside, dists))).min()
        assert e_in > -1e-10, (nu12, l12, e_in)
        assert e_out < -1e-3, (nu12, l12, e_out)

        # projection pulls an invalid rho inside the bound; eigs recover
        proj = project_to_valid(outside)
        r = float(np.asarray(proj.rho[0, 1]))
        assert abs(r) <= b
        e_proj = np.linalg.eigvalsh(np.asarray(block_covariance(proj, dists))).min()
        assert e_proj > -1e-10


def test_project_to_valid_lifts_cross_smoothness():
    """nu12 below the Gneiting floor has bound 0; the projection lifts it
    to (nu1 + nu2) / 2 and the projected model is PD with nonzero rho."""
    from cokriging_tpu.cov.spectral import project_to_valid, params_rho_max
    from cokriging_tpu.cov.params import MaternParams
    from cokriging_tpu.cov.matern import block_covariance
    from cokriging_tpu.estimate.nll import joint_distance_blocks

    p = MaternParams.default(2)
    nu = p.nu.at[0, 0].set(0.6).at[1, 1].set(1.8).at[0, 1].set(1.0).at[1, 0].set(1.0)
    ls = p.len_scale.at[0, 0].set(300.0).at[1, 1].set(600.0)
    ls = ls.at[0, 1].set(400.0).at[1, 0].set(400.0)
    rho = p.rho.at[0, 1].set(-0.7).at[1, 0].set(-0.7)
    p = p.replace(nu=nu, len_scale=ls, rho=rho)
    assert float(params_rho_max(p, 0, 1)) == 0.0

    proj = project_to_valid(p)
    assert float(np.asarray(proj.nu[0, 1])) == 1.2
    r = float(np.asarray(proj.rho[0, 1]))
    assert r < -0.2  # meaningful cross-structure survives

    rng = np.random.default_rng(1)
    coords = [rng.uniform(0, 2000, size=(70, 2)) for _ in range(2)]
    dists = joint_distance_blocks(
        [jnp.asarray(c) for c in coords], geodesic=False
    )
    e = np.linalg.eigvalsh(np.asarray(block_covariance(proj, dists))).min()
    assert e > -1e-10


def test_project_to_valid_parsimony_rescues_collapsed_bound():
    """The failure mode the xcov_joint_pipeline workflow hit: an
    unconstrained WLS fit with all nus at the 3.5 bound and a cross scale
    ~half the marginal scales has an exact |rho| bound crushed by the
    high-frequency spectral ratio (sqrt(l11 l22)/l12)^(-2 nu) — plain
    projection clips rho to ~0, the parsimonious projection (nu12 = floor,
    l12 = geometric mean) keeps the fitted cross-structure and stays PD."""
    from cokriging_tpu.cov.spectral import project_to_valid, params_rho_max
    from cokriging_tpu.cov.params import MaternParams
    from cokriging_tpu.cov.matern import block_covariance
    from cokriging_tpu.estimate.nll import joint_distance_blocks

    p = MaternParams.default(2)
    nu = jnp.full((2, 2), 3.5)
    ls = p.len_scale.at[0, 0].set(1020.0).at[1, 1].set(1078.0)
    ls = ls.at[0, 1].set(561.0).at[1, 0].set(561.0)
    rho = p.rho.at[0, 1].set(-0.58).at[1, 0].set(-0.58)
    p = p.replace(nu=nu, len_scale=ls, rho=rho)
    assert float(params_rho_max(p, 0, 1)) < 0.05  # collapsed

    plain = project_to_valid(p)
    assert abs(float(np.asarray(plain.rho[0, 1]))) < 0.05  # rho erased

    pars = project_to_valid(p, parsimony=True)
    # marginals untouched
    np.testing.assert_allclose(np.asarray(pars.nu)[[0, 1], [0, 1]], 3.5)
    np.testing.assert_allclose(
        np.asarray(pars.len_scale)[[0, 1], [0, 1]], [1020.0, 1078.0]
    )
    # parsimonious cross: nu floor + geometric-mean scale, rho survives
    assert float(np.asarray(pars.nu[0, 1])) == 3.5
    np.testing.assert_allclose(
        float(np.asarray(pars.len_scale[0, 1])),
        float(np.sqrt(1020.0 * 1078.0)),
    )
    np.testing.assert_allclose(float(np.asarray(pars.rho[0, 1])), -0.58)

    rng = np.random.default_rng(2)
    coords = [rng.uniform(0, 3000, size=(60, 2)) for _ in range(2)]
    dists = joint_distance_blocks(
        [jnp.asarray(c) for c in coords], geodesic=False
    )
    e = np.linalg.eigvalsh(np.asarray(block_covariance(pars, dists))).min()
    assert e > -1e-10


def test_rho_max_f32_parsimonious_tolerance():
    """f32 regression (advisor r2, high): nu12 = (nu1+nu2)/2 computed in
    f32 rounds the tail exponent 2*nu12-nu1-nu2 to ~±2.4e-7, which a fixed
    f64-calibrated -1e-9 tolerance misreads as 'below the Gneiting floor',
    flipping rho_max to 0 and silently erasing the cross-correlation. The
    tolerance must be dtype-aware."""
    from cokriging_tpu.cov.spectral import rho_max, project_to_valid
    from cokriging_tpu.cov.params import MaternParams

    rng = np.random.default_rng(7)
    for _ in range(40):
        nu1 = np.float32(rng.uniform(0.3, 3.5))
        nu2 = np.float32(rng.uniform(0.3, 3.5))
        l1 = np.float32(rng.uniform(200.0, 1500.0))
        l2 = np.float32(rng.uniform(200.0, 1500.0))
        nu12 = (nu1 + nu2) / np.float32(2.0)  # f32 parsimonious midpoint
        l12 = np.sqrt(l1 * l2).astype(np.float32)
        b = float(
            rho_max(
                jnp.float32(nu1), jnp.float32(l1),
                jnp.float32(nu2), jnp.float32(l2),
                jnp.float32(nu12), jnp.float32(l12),
            )
        )
        assert b > 0.05, (nu1, nu2, b)

    # full f32 parsimonious projection keeps a nonzero rho
    p = MaternParams.default(2)
    nu = p.nu.at[0, 0].set(1.12345).at[1, 1].set(2.76543)
    ls = p.len_scale.at[0, 0].set(700.0).at[1, 1].set(900.0)
    rho = p.rho.at[0, 1].set(-0.5).at[1, 0].set(-0.5)
    p = p.replace(nu=nu, len_scale=ls, rho=rho)
    p32 = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.float32) if hasattr(a, "astype") else a, p
    )
    proj = project_to_valid(p32, parsimony=True)
    assert float(np.asarray(proj.rho[0, 1])) < -0.2
