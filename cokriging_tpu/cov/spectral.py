r"""Matern spectral densities and parameterization cross-checks.

Parity with the reference's spectral analysis
(research/matern_spectrum.ipynb cells 7-14), which validates the
Rasmussen-Williams parameterization used by the model against the classic
and Cressie-Wikle forms. d-dimensional isotropic spectral density of the
Matern correlation with unit variance:

    f(w) = sigma^2 * C_d(nu, ell) * (2 nu / ell^2 + 4 pi^2 w^2)^-(nu + d/2)

with the normalization that integrates back to sigma^2 (Stein 1999 /
R&W 2006 ch. 4). These are host-side analysis utilities (numpy-compatible
jnp), not hot-path kernels.
"""

import jax
import jax.numpy as jnp


def matern_spectral_density(w, nu, len_scale, sigma2=1.0, d=2):
    r"""Isotropic R&W Matern spectral density in d dimensions.

    S(w) = sigma2 * 2^d pi^{d/2} Gamma(nu + d/2) (2 nu)^nu /
           (Gamma(nu) ell^{2 nu}) * (2 nu / ell^2 + 4 pi^2 |w|^2)^{-(nu+d/2)}

    (Rasmussen & Williams 2006, eq. 4.15 adapted to frequency w in cycles.)
    """
    w = jnp.asarray(w, jnp.result_type(float))
    log_c = (
        d * jnp.log(2.0)
        + 0.5 * d * jnp.log(jnp.pi)
        + jax.lax.lgamma(nu + 0.5 * d)
        + nu * jnp.log(2.0 * nu)
        - jax.lax.lgamma(nu)
        - 2.0 * nu * jnp.log(len_scale)
    )
    base = 2.0 * nu / len_scale**2 + 4.0 * jnp.pi**2 * w**2
    return sigma2 * jnp.exp(log_c - (nu + 0.5 * d) * jnp.log(base))


def matern_spectral_density_1d(w, nu, len_scale, sigma2=1.0):
    """1-d marginal spectral density (for line-transect checks)."""
    return matern_spectral_density(w, nu, len_scale, sigma2, d=1)


def classic_to_rw_len_scale(classic_scale, nu):
    """Convert the 'classic' Matern range parameter (kappa = 1/scale inside
    K_nu(kappa h)) to the R&W length scale ell = sqrt(2 nu) * scale —
    the parameterization cross-check from matern_spectrum.ipynb."""
    return jnp.sqrt(2.0 * nu) * classic_scale


def rw_to_classic_len_scale(len_scale, nu):
    return len_scale / jnp.sqrt(2.0 * nu)


def spectral_correlation_roundtrip(nu, len_scale, h, n_freq=4096, w_max=None, d=1):
    """Numerically invert the 1-d spectral density back to a correlation
    and evaluate it at lags h — the self-consistency check mirroring the
    notebook's spectral/covariance comparisons. Only d=1 supported (the
    cosine-transform pair)."""
    if d != 1:
        raise NotImplementedError("roundtrip check implemented for d=1")
    if w_max is None:
        w_max = 40.0 / len_scale
    w = jnp.linspace(0.0, w_max, n_freq)
    s = matern_spectral_density_1d(w, nu, len_scale)
    h = jnp.atleast_1d(jnp.asarray(h, jnp.result_type(float)))
    # C(h) = 2 * int_0^inf S(w) cos(2 pi w h) dw  (even spectrum)
    integrand = s[None, :] * jnp.cos(2.0 * jnp.pi * w[None, :] * h[:, None])
    cov = 2.0 * jnp.trapezoid(integrand, w, axis=1)
    return cov
