"""Matern spectral densities: normalization, roundtrip to correlation, and
parameterization conversions (research/matern_spectrum.ipynb parity)."""

import numpy as np
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
