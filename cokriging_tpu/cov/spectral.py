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


def _log_spectral_density_unit(w, nu, len_scale, d):
    """log of the unit-variance Matern spectral density (stable for the
    validity-bound ratios, where the densities under/overflow)."""
    log_c = (
        d * jnp.log(2.0)
        + 0.5 * d * jnp.log(jnp.pi)
        + jax.lax.lgamma(nu + 0.5 * d)
        + nu * jnp.log(2.0 * nu)
        - jax.lax.lgamma(nu)
        - 2.0 * nu * jnp.log(len_scale)
    )
    base = 2.0 * nu / len_scale**2 + 4.0 * jnp.pi**2 * w**2
    return log_c - (nu + 0.5 * d) * jnp.log(base)


def rho_max(nu1, l1, nu2, l2, nu12, l12, d=2, n_freq=2048):
    r"""Exact validity bound on |rho| for the full bivariate Matern.

    Gneiting, Kleiber & Schlather (2010), Thm 3: the model is a valid
    (positive-definite) bivariate covariance iff

        rho^2 * S12(w)^2 <= S11(w) * S22(w)   for all frequencies w,

    with S_ij the unit-variance Matern spectral densities at (nu_ij,
    ell_ij) — the sigmas cancel. This evaluates the infimum of
    sqrt(S11 S22) / S12 on a wide log frequency grid (plus the exact
    w -> 0 and w -> infinity limits) in log space.

    The w -> infinity tail behaves like w^{2(2 nu12 - nu1 - nu2)}: if
    nu12 < (nu1 + nu2) / 2 the infimum is 0 (no rho != 0 is valid) —
    the smoothness condition the reference's TODO stub never checked
    (src/model.py:172, 336-343).

    Returns the bound clipped to [0, 1].
    """
    # tail-exponent tolerance keys off the dtype the nus ARRIVED in:
    # a parsimonious nu12 = (nu1+nu2)/2 computed upstream in f32 carries
    # ~eps32*(nu1+nu2) rounding even if we promote to f64 here.
    in_eps = max(
        jnp.finfo(jnp.asarray(v).dtype).eps for v in (nu1, nu2, nu12)
    )
    nu1, l1, nu2, l2, nu12, l12 = (
        jnp.asarray(v, jnp.result_type(float))
        for v in (nu1, l1, nu2, l2, nu12, l12)
    )
    l_ref = jnp.minimum(jnp.minimum(l1, l2), l12)
    w = jnp.concatenate(
        [jnp.zeros((1,)), jnp.logspace(-8.0, 8.0, n_freq) / l_ref]
    )
    log_ratio = (
        _log_spectral_density_unit(w, nu1, l1, d)
        + _log_spectral_density_unit(w, nu2, l2, d)
        - 2.0 * _log_spectral_density_unit(w, nu12, l12, d)
    )
    min_log = jnp.min(log_ratio)
    # exact w -> infinity limit: exponent 2 (2 nu12 - nu1 - nu2) on w^2.
    # Tolerance, not a strict < 0: nu12 == (nu1 + nu2) / 2 must not flip to
    # -inf on rounding (the parsimonious case lands exactly on it). The
    # tolerance is input-dtype-aware (advisor r2): an f32 parsimonious
    # midpoint carries ~eps32*(nu1+nu2) rounding, far above the old fixed
    # f64-calibrated 1e-9 — which misread it as 'below the floor' and
    # silently clipped rho to 0 on the TPU path.
    tail_exp = 2.0 * nu12 - nu1 - nu2
    tol = 100.0 * in_eps * (nu1 + nu2)
    min_log = jnp.where(tail_exp < -tol, -jnp.inf, min_log)
    return jnp.clip(jnp.exp(0.5 * min_log), 0.0, 1.0)


def params_rho_max(params, i: int, j: int, d=2):
    """Validity bound for the (i, j) pair of a MaternParams pytree."""
    return rho_max(
        params.nu[i, i],
        params.len_scale[i, i],
        params.nu[j, j],
        params.len_scale[j, j],
        params.nu[i, j],
        params.len_scale[i, j],
        d=d,
    )


def project_to_valid(
    params,
    margin: float = 0.99,
    d=2,
    lift_nu: bool = True,
    parsimony: bool = False,
):
    """Project a fitted MaternParams onto the spectral validity region.

    Two moves, both preserving the marginal structure exactly:

    1. if ``lift_nu`` and a cross-smoothness sits below the Gneiting floor
       nu_ij < (nu_ii + nu_jj) / 2 — where NO nonzero rho is valid, so the
       exact bound is 0 — raise it to the floor (the parsimonious-model
       choice, Gneiting et al. 2010 §3), which guarantees a strictly
       positive bound;
    2. clip every cross-correlation to +/- margin * rho_max (its exact
       spectral validity bound).

    ``parsimony=True`` snaps the cross-structure onto the parsimonious
    bivariate Matern (Gneiting et al. 2010 §3), leaving marginals exactly
    as fitted: nu_ij = (nu_ii + nu_jj)/2 from BOTH directions, and
    len_scale_ij = sqrt(len_scale_ii * len_scale_jj). An unconstrained
    WLS fit can land on cross parameters that are technically valid only
    with |rho| near 0 — e.g. nu_ij far above the floor, or a cross scale
    well below the marginal scales, where the high-frequency spectral
    ratio (sqrt(l_ii l_jj)/l_ij)^(-2 nu) crushes the exact bound — and
    clipping rho there erases the cross-structure the fit found; the
    parsimonious cross keeps the admissible region wide.

    The reference warns and lets the prediction go NaN when a fitted model
    is non-PD at the data locations (src/joint_prediction.py:60-66);
    projecting the WLS fit instead guarantees a usable joint covariance.
    """
    p = params.n_procs
    nu = params.nu
    if lift_nu or parsimony:
        for i in range(p):
            for j in range(i + 1, p):
                floor = 0.5 * (params.nu[i, i] + params.nu[j, j])
                if parsimony:
                    v = floor
                else:
                    v = jnp.maximum(params.nu[i, j], floor)
                nu = nu.at[i, j].set(v).at[j, i].set(v)
        params = params.replace(nu=nu)
    if parsimony:
        ls = params.len_scale
        for i in range(p):
            for j in range(i + 1, p):
                v = jnp.sqrt(params.len_scale[i, i] * params.len_scale[j, j])
                ls = ls.at[i, j].set(v).at[j, i].set(v)
        params = params.replace(len_scale=ls)
    rho = params.rho
    for i in range(p):
        for j in range(i + 1, p):
            bound = margin * params_rho_max(params, i, j, d=d)
            # rho_max promotes to the default float; cast back so the
            # scatter into an f32 rho array stays dtype-clean on TPU
            r = jnp.clip(params.rho[i, j], -bound, bound).astype(rho.dtype)
            rho = rho.at[i, j].set(r).at[j, i].set(r)
    return params.replace(rho=rho)


def bessel_j0(x):
    """J_0(x), Bessel function of the first kind, order zero.

    Abramowitz & Stegun 9.4.1 (|x| < 8, rational polynomial) and 9.4.3
    (|x| >= 8, modulus/phase asymptotic); ~1e-8 absolute accuracy —
    plenty for the spectral round-trip quadrature whose discretization
    error dominates. jax.scipy.special.bessel_jn's downward recurrence is
    NaN-unstable at small arguments, hence this standalone form.
    """
    x = jnp.abs(jnp.asarray(x, jnp.result_type(float)))
    # |x| < 8: rational P(y)/Q(y) in y = x^2
    y = x * x
    p_small = (
        57568490574.0
        + y * (-13362590354.0 + y * (651619640.7
        + y * (-11214424.18 + y * (77392.33017 + y * (-184.9052456)))))
    )
    q_small = (
        57568490411.0
        + y * (1029532985.0 + y * (9494680.718
        + y * (59272.64853 + y * (267.8532712 + y))))
    )
    small = p_small / q_small
    # |x| >= 8: modulus-phase form
    ax = jnp.maximum(x, 1e-30)
    z = 8.0 / ax
    y2 = z * z
    xx = ax - 0.785398164
    p1 = (
        1.0
        + y2 * (-0.1098628627e-2 + y2 * (0.2734510407e-4
        + y2 * (-0.2073370639e-5 + y2 * 0.2093887211e-6)))
    )
    p2 = (
        -0.1562499995e-1
        + y2 * (0.1430488765e-3 + y2 * (-0.6911147651e-5
        + y2 * (0.7621095161e-6 + y2 * (-0.934935152e-7))))
    )
    large = jnp.sqrt(0.636619772 / ax) * (
        jnp.cos(xx) * p1 - z * jnp.sin(xx) * p2
    )
    return jnp.where(x < 8.0, small, large)


def spectral_correlation_roundtrip(nu, len_scale, h, n_freq=4096, w_max=None, d=1):
    """Numerically invert the d-dimensional spectral density back to a
    correlation and evaluate it at lags h — the self-consistency check
    mirroring the notebook's spectral/covariance comparisons
    (research/matern_spectrum.ipynb cells 7-14, whose cross-checks are
    2-d). d=1 is the cosine-transform pair; d=2 the Hankel transform

        C(h) = 2 pi * int_0^inf S(w) J_0(2 pi w h) w dw.
    """
    if d not in (1, 2):
        raise NotImplementedError("roundtrip check implemented for d in (1, 2)")
    if w_max is None:
        w_max = 40.0 / len_scale
    w = jnp.linspace(0.0, w_max, n_freq)
    s = matern_spectral_density(w, nu, len_scale, d=d)
    h = jnp.atleast_1d(jnp.asarray(h, jnp.result_type(float)))
    if d == 1:
        # C(h) = 2 * int_0^inf S(w) cos(2 pi w h) dw  (even spectrum)
        integrand = s[None, :] * jnp.cos(
            2.0 * jnp.pi * w[None, :] * h[:, None]
        )
        cov = 2.0 * jnp.trapezoid(integrand, w, axis=1)
    else:
        integrand = (
            s[None, :]
            * bessel_j0(2.0 * jnp.pi * w[None, :] * h[:, None])
            * w[None, :]
        )
        cov = 2.0 * jnp.pi * jnp.trapezoid(integrand, w, axis=1)
    return cov
