r"""Modified Bessel function of the second kind :math:`K_\nu(x)` for real
order, in pure JAX.

``jax.scipy.special`` has no ``kv``; the reference stack leans on
``scipy.special.kv`` (reference: src/model.py:349-350), evaluated inside the
Matern correlation (src/model.py:354-385). Everything downstream — variogram
fits, kriging weights, exact likelihoods — funnels through this function, so
it must be (a) accurate to ~1e-13 in f64 over the parameter box the model
optimizes (nu in (0.2, 3.5), src/model.py:123), and (b) differentiable in
*both* arguments so NLL/WLS objectives can be jit+grad'd end to end.

Algorithm (Temme 1975; the classic ``bessik`` structure):

- reduce order to ``mu = nu - round(nu)`` with ``|mu| <= 1/2``;
- ``x <= 2``: Temme's power series for ``K_mu`` and ``K_{mu+1}``;
- ``x > 2``: Steed's continued fraction CF2 for ``K_mu``, ``K_{mu+1}``;
- forward recurrence ``K_{r+1} = (2r/x) K_r + K_{r-1}`` up to ``nu``.

Series/CF2 trip counts are fixed per dtype (measured convergence floors;
TPU/XLA friendly), the order recurrence runs to a dynamic max(nl) bound,
and both branches are evaluated on clamped inputs and selected with
``jnp.where`` so no NaNs leak into either primal or tangent values.
Gradients flow through custom JVPs (exact forward-mode tangents), never
reverse-mode through the loops.

Supported domain: ``x > 0``, ``0 < nu <= NU_MAX`` (= 30). The Matern model
clamps to its own bounds well inside this.
"""

import jax
import jax.numpy as jnp

# Euler-Mascheroni constant and the mu^2-coefficient of the odd Taylor part
# of 1/Gamma(1+mu) (= gamma^3/6 - gamma*pi^2/12 + zeta(3)/3), used to evaluate
# gam1(mu) = (1/Gamma(1-mu) - 1/Gamma(1+mu)) / (2 mu) without cancellation
# as mu -> 0.
_EULER_GAMMA = 0.5772156649015328606
_ZETA3 = 1.2020569031595942854
_PI = 3.141592653589793238462643383279502884

_A1 = _EULER_GAMMA
_A3 = _EULER_GAMMA**3 / 6.0 - _EULER_GAMMA * _PI**2 / 12.0 + _ZETA3 / 3.0
# NOTE: gam1 only needs ~1e-13 near mu=0; the switch point below keeps the
# truncation error of the 2-term series under 1e-14, so no mu^4 term needed.

# Taylor coefficients of 1/Gamma(1+z) = sum_k c_{k+1} z^k (DLMF 5.7.1/5.7.2,
# shifted): used on |z| <= 0.502 where 13 terms reach f32 roundoff (measured
# max abs err 7.8e-8). TPU's hardware lgamma approximation carries ~1e-4
# absolute error — two orders worse than this polynomial — and exp(-lgamma)
# is how the f32 gamma constants were previously formed.
_INV_GAMMA1P_COEF = (
    1.0000000000000000, 0.5772156649015329, -0.6558780715202538,
    -0.0420026350340952, 0.1665386113822915, -0.0421977345555443,
    -0.0096219715278770, 0.0072189432466630, -0.0011651675918591,
    -0.0002152416741149, 0.0001280502823882, -0.0000201348547807,
    -0.0000012504934821,
)

_LN2 = 0.6931471805599453


def inv_gamma1p(z):
    """1/Gamma(1+z) for |z| <= 0.502, by Taylor polynomial (f32-exact).

    Pure multiply-adds — safe inside Pallas kernels and immune to the TPU's
    low-precision lgamma/exp hardware approximations."""
    z = jnp.asarray(z)
    acc = jnp.full_like(z, _INV_GAMMA1P_COEF[-1])
    for c in _INV_GAMMA1P_COEF[-2::-1]:
        acc = acc * z + c
    return acc


def dinv_gamma1p(z):
    """d/dz of ``inv_gamma1p``'s Taylor polynomial — exact within the
    polynomial, so tangents through the f32 gamma constants carry no
    hardware-approximation error (TPU digamma is ~1e-4 absolute)."""
    z = jnp.asarray(z)
    n = len(_INV_GAMMA1P_COEF)
    acc = jnp.full_like(z, (n - 1) * _INV_GAMMA1P_COEF[-1])
    for k in range(n - 2, 0, -1):
        acc = acc * z + k * _INV_GAMMA1P_COEF[k]
    return acc


def gam12_tangent(mu):
    """d/dmu of ``_gam12``: (dgam1, dgam2, dinv_gp, dinv_gm).

    Feeds exact forward-mode dK/dnu through the Temme series (the
    gradient kernels' replacement for the former central-difference
    rows). f32 differentiates the Taylor polynomial directly; f64 uses
    the digamma identities d(1/Gamma(1+mu)) = -psi(1+mu)/Gamma(1+mu),
    d(1/Gamma(1-mu)) = +psi(1-mu)/Gamma(1-mu).
    """
    mu = jnp.asarray(mu)
    gam1, gam2, inv_gp, inv_gm = _gam12(mu)
    if mu.dtype == jnp.float32:
        d_gp = dinv_gamma1p(mu)
        d_gm = -dinv_gamma1p(-mu)
    else:
        d_gp = -jax.lax.digamma(1.0 + mu) * inv_gp
        d_gm = jax.lax.digamma(1.0 - mu) * inv_gm
    d_gam2 = 0.5 * (d_gm + d_gp)
    # gam1 = (inv_gm - inv_gp) / (2 mu): quotient rule away from 0, odd
    # Taylor series d(-(A1 + A3 mu^2 + ...)) = -2 A3 mu at the removable
    # singularity
    small = jnp.abs(mu) < 1e-3
    mu_safe = jnp.where(small, 1.0, mu)
    d_gam1 = jnp.where(
        small,
        -2.0 * _A3 * mu,
        ((d_gm - d_gp) - 2.0 * gam1) / (2.0 * mu_safe),
    )
    return d_gam1, d_gam2, d_gp, d_gm


def inv_gamma(nu):
    """1/Gamma(nu) for 0 < nu <= NU_MAX + 0.5, f32-accurate on TPU.

    Decomposes nu = mu + nl (|mu| <= 1/2, same split as ``_kv_positive``),
    evaluates 1/Gamma(1+mu) by Taylor polynomial, and removes the integer
    part with the exact recurrence Gamma(z+1) = z Gamma(z):
    1/Gamma(mu+nl) = inv_gamma1p(mu) / prod_{k=1}^{nl-1}(mu+k), and
    1/Gamma(mu) = mu * inv_gamma1p(mu) when nl == 0."""
    nu = jnp.asarray(nu)
    nl = jnp.floor(nu + 0.5)
    mu = nu - nl
    out = inv_gamma1p(mu)
    out = jnp.where(nl == 0, out * mu, out)
    denom = jnp.ones_like(out)
    for k in range(1, _N_RECUR):
        denom = denom * jnp.where(k <= nl - 1, mu + k, 1.0)
    return out / denom


def lgamma_precise(nu):
    """log(Gamma(nu)) for 0 < nu <= NU_MAX + 0.5 with ~3e-6 absolute
    accuracy in f32 on TPU (= -log_precise(inv_gamma(nu))).

    The TPU's lgamma hardware approximation has ~1e-4 absolute error —
    directly visible as relative error in the Matern prefactor
    exp((1-nu) ln2 - lgamma(nu) + nu log(a)). f64 falls through to
    ``jax.lax.lgamma``."""
    nu = jnp.asarray(nu)
    if nu.dtype != jnp.float32:
        return jax.lax.lgamma(nu)
    return -log_precise(inv_gamma(nu))


@jax.custom_jvp
def log_precise(x):
    """Natural log with ~1-ulp f32 accuracy on TPU.

    The TPU's f32 ``log`` hardware approximation has absolute error up to
    1e-4 (measured on v5e over (0, 1]; ~1.3e-5 even near 1). That error,
    divided by the central-difference step, was the dominant noise in every
    f32 dK/dnu gradient, and it directly limited Temme-series K_nu values
    to ~2.5e-3 relative. This routine extracts the exponent/mantissa by
    int32 bit manipulation and evaluates log(m) by the atanh series on
    |t| <= 0.172 — pure VPU mul/adds, Mosaic/Pallas-lowerable, measured
    max abs err 6.1e-8 for x in (0.5, 2) and ~1e-7 relative elsewhere.

    f64 inputs fall through to ``jnp.log`` (accurate on CPU, and the f64
    path is not TPU-hot). Domain: x > 0 (callers pre-clamp). Subnormal
    inputs are clamped to the smallest normal (XLA arithmetic flushes
    subnormals to zero anyway, so they cannot carry meaning here —
    everything downstream already treats them as exact zeros).
    """
    x = jnp.asarray(x)
    if x.dtype != jnp.float32:
        return jnp.log(x)
    xn = jnp.maximum(x, jnp.float32(2.0**-126))
    xi = jax.lax.bitcast_convert_type(xn, jnp.int32)
    e = ((xi >> 23) & 0xFF) - 127
    m = jax.lax.bitcast_convert_type(
        (xi & 0x007FFFFF) | 0x3F800000, jnp.float32
    )  # mantissa in [1, 2)
    big = m > jnp.float32(1.4142135)
    m = jnp.where(big, jnp.float32(0.5) * m, m)
    e = (e + big.astype(jnp.int32)).astype(jnp.float32)
    t = (m - 1.0) / (m + 1.0)
    t2 = t * t
    p = 2.0 * t * (
        1.0 + t2 * (1.0 / 3.0 + t2 * (0.2 + t2 * (1.0 / 7.0 + t2 / 9.0)))
    )
    return e * jnp.float32(_LN2) + p


@log_precise.defjvp
def _log_precise_jvp(primals, tangents):
    # the bit-manipulation body is not AD-traceable (bitcast); the
    # derivative is exactly 1/x
    (x,), (dx,) = primals, tangents
    return log_precise(x), dx / x

#: Largest supported order. Recurrence steps are statically unrolled.
NU_MAX = 30
_N_RECUR = NU_MAX  # static unroll count for the order recurrence

# Iteration counts by dtype: the loops are sequential-latency-bound on
# TPU, so trip count is wall-clock. The f32 counts are the measured
# convergence floors + ~50% margin (tools-level sweep vs scipy over
# mu in [-1/2, 1/2], x in (0, 30]: the series' worst-case error is
# trip-independent from n = 8 — it is set by f32 log/exp precision, not
# truncation — and CF2's |dels/s| < eps freeze triggers everywhere by
# n = 14). f64 keeps the conservative counts: it is the CPU golden path
# where wall-clock is irrelevant and the 1e-12 bar needs the full tail.
_SERIES_ITERS = {jnp.dtype(jnp.float64): 40, jnp.dtype(jnp.float32): 12}
_CF2_ITERS = {jnp.dtype(jnp.float64): 80, jnp.dtype(jnp.float32): 18}


def _gam12(mu):
    """Return (gam1, gam2, 1/Gamma(1+mu), 1/Gamma(1-mu)) for |mu| <= 1/2.

    gam1 = (1/Gamma(1-mu) - 1/Gamma(1+mu)) / (2 mu)   (limit -A1 at mu=0)
    gam2 = (1/Gamma(1-mu) + 1/Gamma(1+mu)) / 2

    f32 uses the Taylor polynomial (TPU's lgamma carries ~1e-4 absolute
    error; the polynomial is f32-exact). f64 keeps exp(-lgamma) — on CPU
    (the f64 golden path) libm lgamma is correctly rounded and the
    polynomial's own truncation (~3e-13) would be the larger error.
    """
    mu = jnp.asarray(mu)
    if mu.dtype == jnp.float32:
        inv_gp = inv_gamma1p(mu)
        inv_gm = inv_gamma1p(-mu)
    else:
        inv_gp = jnp.exp(-jax.lax.lgamma(1.0 + mu))  # 1/Gamma(1+mu) > 0
        inv_gm = jnp.exp(-jax.lax.lgamma(1.0 - mu))  # 1/Gamma(1-mu) > 0
    gam2 = 0.5 * (inv_gm + inv_gp)
    small = jnp.abs(mu) < 1e-3
    mu_safe = jnp.where(small, 1.0, mu)
    gam1_direct = (inv_gm - inv_gp) / (2.0 * mu_safe)
    gam1_series = -(_A1 + _A3 * mu * mu)
    gam1 = jnp.where(small, gam1_series, gam1_direct)
    return gam1, gam2, inv_gp, inv_gm


def _temme_series(mu, x, gam_consts=None):
    """K_mu(x), K_{mu+1}(x) for 0 < x <= 2, |mu| <= 1/2 (Temme's series).

    ``gam_consts`` = precomputed (gam1, gam2, inv_gp, inv_gm) scalars —
    used by the Pallas kernel, whose TPU lowering has no lgamma primitive
    (they depend only on mu, so the host computes them once per call)."""
    x2 = 0.5 * x
    mu2 = mu * mu
    d = -log_precise(x2)  # TPU hw log: 1e-4 abs err -> was the top K_nu error
    e = mu * d
    pimu = _PI * mu

    # pimu / sin(pimu), sinh(e)/e, with removable singularities. The
    # literal `one` is dtype-anchored: a bare python 1.0 in a SCALAR
    # where traces as a weak-f64 argument under x64, which Mosaic's
    # scalar lowering inside lax.cond branches cannot squeeze.
    one = jnp.ones((), x.dtype)
    small_p = jnp.abs(pimu) < 1e-4
    fact = jnp.where(
        small_p,
        1.0 + pimu * pimu / 6.0,
        pimu / jnp.sin(jnp.where(small_p, one, pimu)),
    )
    # sinh/cosh via exp (Pallas TPU lowering has no sinh/cosh primitive);
    # |e| <= ~0.5 * |ln(x/2)| keeps exp(e) far from overflow
    e_exp = jnp.exp(e)
    sinh_e = 0.5 * (e_exp - 1.0 / e_exp)
    cosh_e = 0.5 * (e_exp + 1.0 / e_exp)
    small_e = jnp.abs(e) < 1e-4
    fact2 = jnp.where(
        small_e,
        1.0 + e * e / 6.0,
        sinh_e / jnp.where(small_e, one, e),
    )

    if gam_consts is None:
        gam1, gam2, inv_gp, inv_gm = _gam12(mu)
    else:
        gam1, gam2, inv_gp, inv_gm = gam_consts
    ff = fact * (gam1 * cosh_e + gam2 * fact2 * d)
    p = 0.5 * e_exp / inv_gp
    q = 0.5 / (e_exp * inv_gm)
    c = jnp.ones_like(x)
    dd = x2 * x2
    ksum = ff
    ksum1 = p

    def body(i, carry):
        ff, p, q, c, ksum, ksum1 = carry
        fi = jnp.asarray(i, x.dtype)
        ff = (fi * ff + p + q) / (fi * fi - mu2)
        c = c * dd / fi
        p = p / (fi - mu)
        q = q / (fi + mu)
        ksum = ksum + c * ff
        ksum1 = ksum1 + c * (p - fi * ff)
        return ff, p, q, c, ksum, ksum1

    n_iters = _SERIES_ITERS[jnp.dtype(x.dtype)]
    # int32 bounds: under x64 the default i64 loop index cannot be lowered
    # by Mosaic inside Pallas kernels
    ff, p, q, c, ksum, ksum1 = jax.lax.fori_loop(
        jnp.int32(1), jnp.int32(n_iters + 1), body, (ff, p, q, c, ksum, ksum1)
    )
    k_mu = ksum
    k_mu1 = ksum1 * (2.0 / x)
    return k_mu, k_mu1


def _steed_cf2(mu, x):
    """K_mu(x), K_{mu+1}(x) for x >= 2, |mu| <= 1/2 (Steed's CF2).

    ``mu`` may be a scalar (Pallas tile path) or broadcast to x's shape;
    the `+ 0.0 * x` anchors the mu-derived loop carries to x's shape AND
    layout (Mosaic rejects mixing replicated and tiled vector layouts)."""
    mu2 = mu * mu
    a1 = 0.25 - mu2 + 0.0 * x
    b = 2.0 * (1.0 + x)
    d = 1.0 / b
    h = d
    delh = d
    q1 = jnp.zeros_like(x)
    q2 = jnp.ones_like(x)
    q = a1
    c = a1
    a = -a1
    s = 1.0 + q * delh
    # float 0/1 convergence mask: Mosaic cannot legalize scf.for loops
    # with vector-of-bool carries
    done = jnp.zeros_like(x)
    eps = jnp.finfo(x.dtype).eps
    # HALF-INTEGER orders are degenerate: a1 = 0.25 - mu^2 == 0 makes
    # every series term c_k (and hence dels) exactly zero, so the freeze
    # would fire after one step. The PRIMAL is right either way (s = 1,
    # the closed-form K_{1/2} family), but forward-mode TANGENTS — the
    # exact dK/dnu of the gradient kernels — are d(c_k)/dmu-driven and
    # need the full recursion; a frozen lane truncates them (measured
    # 4e-3 relative d2K/dnu2 error at nu = 1.5). Degenerate lanes are
    # therefore never frozen: their unfrozen evolution is benign (c
    # stays 0, h's own delh decays geometrically, renormalization
    # bounds q1/q2).
    not_degenerate = (a1 != 0.0).astype(x.dtype)

    def body(i, carry):
        # Two guards for a fixed trip count:
        # 1. freeze all state once converged (otherwise post-convergence
        #    iterations keep evolving the recurrence for nothing);
        # 2. renormalize (q1, q2, c) every step — only the product c*qnew
        #    and the q1:q2 ratio enter the result, and unnormalized c grows
        #    factorially, overflowing the TPU's f64 emulation (which only
        #    has f32 exponent range, ~1e38).
        a, b, c, d, h, delh, q, q1, q2, s, done = carry
        fi = jnp.asarray(i, x.dtype)
        a_n = a - 2.0 * (fi - 1.0)
        c_n = -a_n * c / fi
        qnew = (q1 - b * q2) / a_n
        q_n = q + c_n * qnew
        b_n = b + 2.0
        d_n = 1.0 / (b_n + a_n * d)
        delh_n = (b_n * d_n - 1.0) * delh
        h_n = h + delh_n
        dels = q_n * delh_n
        s_n = s + dels
        done_n = jnp.maximum(
            done,
            (jnp.abs(dels / s_n) < eps).astype(x.dtype) * not_degenerate,
        )

        scale = jnp.maximum(jnp.abs(qnew), 1e-30)
        q1_n = q2 / scale
        q2_n = qnew / scale
        c_n = c_n * scale

        keep = lambda new, old: jnp.where(done > 0.0, old, new)
        return (
            keep(a_n, a), keep(b_n, b), keep(c_n, c), keep(d_n, d),
            keep(h_n, h), keep(delh_n, delh), keep(q_n, q),
            keep(q1_n, q1), keep(q2_n, q2), keep(s_n, s), done_n,
        )

    n_iters = _CF2_ITERS[jnp.dtype(x.dtype)]
    a, b, c, d, h, delh, q, q1, q2, s, done = jax.lax.fori_loop(
        jnp.int32(2), jnp.int32(n_iters + 2), body,
        (a, b, c, d, h, delh, q, q1, q2, s, done)
    )
    h = a1 * h
    k_mu = jnp.sqrt(_PI / (2.0 * x)) * jnp.exp(-x) / s
    k_mu1 = k_mu * (mu + x + 0.5 - h) / x
    return k_mu, k_mu1


def _kv_positive(nu, x):
    """K_nu(x) for x > 0 (elementwise; nu, x broadcastable)."""
    nu, x = jnp.broadcast_arrays(nu, x)
    nl = jnp.floor(nu + 0.5)
    mu = nu - nl  # |mu| <= 1/2; d(mu)/d(nu) = 1 a.e.
    return _kv_from_munl(mu, nl, x)


def order_recurrence(mu, nl, x, k_mu, k_mu1):
    """Forward recurrence K_{r+1} = (2 r / x) K_r + K_{r-1}, r = mu + i,
    up to order mu + nl — with a DYNAMIC trip bound max(nl) instead of
    the old static NU_MAX(=30)-step masked unroll. The model's nu <= 3.5
    needs at most 4 steps, and every step is serialized VPU work riding
    inside optimizer scans, so 26 masked no-op steps were pure
    wall-clock. ``nl`` may be an array (elementwise path) or a scalar
    (Pallas tile path, where the bound reduce is free)."""
    two_over_x = 2.0 / x
    nl_max = jnp.max(nl).astype(jnp.int32)

    def body(i, carry):
        k_mu, k_mu1 = carry
        fi = i.astype(x.dtype)
        step = fi <= nl
        k_next = (mu + fi) * two_over_x * k_mu1 + k_mu
        return (
            jnp.where(step, k_mu1, k_mu),
            jnp.where(step, k_next, k_mu1),
        )

    return jax.lax.fori_loop(
        jnp.int32(1), nl_max + jnp.int32(1), body, (k_mu, k_mu1)
    )


def kv_triple_from_pair(mu, nl, x, k_mu, k_mu1):
    """(K_{nu-1}, K_nu, K_{nu+1}) at nu = mu + nl from ONE series/CF2
    pair (K_mu, K_{mu+1}) — the three analytic orders of dK/dx share the
    same fractional part, so the upward recurrence (the stable direction
    for K) replaces two of the three serialized series/CF2 evaluations
    the gradient kernels used to pay. nl == 0 (nu < 1/2) takes one exact
    downward step K_{nu-1} = K_{nu+1} - (2 nu / x) K_nu instead; its
    mild cancellation at small x only touches the K_{nu-1} term, which
    dK/dx = -(K_{nu-1} + K_{nu+1})/2 never lets dominate."""
    km, km1 = order_recurrence(mu, jnp.maximum(nl - 1.0, 0.0), x, k_mu, k_mu1)
    nu = mu + nl
    up_next = (2.0 * nu / x) * km1 + km
    dn_prev = km1 - (2.0 * mu / x) * km
    is0 = nl < 0.5
    k_prev = jnp.where(is0, dn_prev, km)
    k_mid = jnp.where(is0, km, km1)
    k_next = jnp.where(is0, km1, up_next)
    return k_prev, k_mid, k_next


def _kv_from_munl(mu, nl, x):
    """K_{mu+nl}(x) with the order decomposition supplied by the caller.

    Lets the central-difference rows of ``_kv_jvp`` pin ``nl`` and perturb
    only ``mu`` (to |mu| <= 0.5 + h, still inside the series'/CF2's
    domain): both FD evaluations then run the *identical* branch and
    recurrence depth, so branch-systematic evaluation error cancels in
    the difference — without this, a half-integer nu puts nu-h and nu+h
    on different recurrence branches and the FD inherits their error gap.
    """
    x_lo = jnp.minimum(x, 2.0)  # clamp each branch into its stable domain
    x_hi = jnp.maximum(x, 2.0)
    ks_mu, ks_mu1 = _temme_series(mu, x_lo)
    kc_mu, kc_mu1 = _steed_cf2(mu, x_hi)
    use_series = x < 2.0
    k_mu = jnp.where(use_series, ks_mu, kc_mu)
    k_mu1 = jnp.where(use_series, ks_mu1, kc_mu1)
    k_mu, _ = order_recurrence(mu, nl, x, k_mu, k_mu1)
    return k_mu


@jax.custom_jvp
def kv(nu, x):
    r"""Modified Bessel function of the second kind, :math:`K_\nu(x)`.

    Matches ``scipy.special.kv`` on ``x > 0``, ``0 < nu <= NU_MAX``
    (symmetric in nu: K_{-nu} = K_nu). ``x <= 0`` returns ``inf`` at 0 and
    ``nan`` for negative x, like scipy.

    Differentiable in both arguments: d/dx is analytic
    (:math:`K_\nu' = -(K_{\nu-1}+K_{\nu+1})/2`); d/dnu uses a central finite
    difference (the order-derivative has no closed form; f64 central
    differences give ~1e-9 relative accuracy, ample for L-BFGS).
    """
    nu = jnp.abs(jnp.asarray(nu))
    x = jnp.asarray(x)
    # unify dtypes: a mixed f32/f64 pair would make the fixed-point loop
    # carries disagree between init (nu-derived) and body (x-derived)
    dtype = jnp.result_type(nu.dtype, x.dtype, jnp.float32)
    nu = nu.astype(dtype)
    x = x.astype(dtype)
    x_safe = jnp.where(x > 0.0, x, 1.0)
    out = _kv_positive(nu, x_safe)
    out = jnp.where(x > 0.0, out, jnp.where(x == 0.0, jnp.inf, jnp.nan))
    return out


@kv.defjvp
def _kv_jvp(primals, tangents):
    nu, x = primals
    dnu, dx = tangents
    nu = jnp.abs(jnp.asarray(nu))
    x = jnp.asarray(x)
    dtype = jnp.result_type(nu.dtype, x.dtype, jnp.float32)
    nu, x = jnp.broadcast_arrays(nu.astype(dtype), x.astype(dtype))

    # ONE jvp-augmented series/CF2 pass serves the primal and every
    # derivative term — the inner Temme/CF2 loops are sequential
    # latency-bound, so separate calls would multiply the wall clock.
    # The pass yields (K_{nu-1}, K_nu, K_{nu+1}) via the shared pair +
    # stable upward recurrence (kv_triple_from_pair);
    # dK/dx = -(K_{nu-1} + K_{nu+1})/2 (analytic);
    # dK/dnu is the EXACT forward-mode tangent through the same pass
    # with nl pinned (the order decomposition that used to anchor the
    # central-difference rows — now with zero FD error; AD handles the
    # gamma constants, which are smooth in mu on both dtype branches).
    x_safe = jnp.where(x > 0.0, x, 1.0)
    nl0 = jnp.floor(nu + 0.5)
    mu0 = nu - nl0
    x_lo = jnp.minimum(x_safe, 2.0)
    x_hi = jnp.maximum(x_safe, 2.0)
    use_series = x_safe < 2.0

    def f(m):
        ks_mu, ks_mu1 = _temme_series(m, x_lo)
        kc_mu, kc_mu1 = _steed_cf2(m, x_hi)
        k_mu = jnp.where(use_series, ks_mu, kc_mu)
        k_mu1 = jnp.where(use_series, ks_mu1, kc_mu1)
        return kv_triple_from_pair(m, nl0, x_safe, k_mu, k_mu1)

    (k_prev, k_mid, k_next), (_, dk_dnu, _) = jax.jvp(
        f, (mu0,), (jnp.ones_like(mu0),)
    )
    bad = jnp.where(x > 0.0, jnp.nan, jnp.where(x == 0.0, jnp.inf, jnp.nan))
    primal_out = jnp.where(x > 0.0, k_mid, bad)
    dk_dx = -0.5 * (k_prev + k_next)

    dnu = jnp.zeros_like(primal_out) if dnu is None else dnu
    dx = jnp.zeros_like(primal_out) if dx is None else dx
    tangent_out = jnp.where(x > 0.0, dk_dnu * dnu + dk_dx * dx, jnp.nan)
    return primal_out, tangent_out


def kv_ratio(nu, x):
    """K_{nu+1}(x) / K_nu(x) — handy for Matern gradient identities."""
    return kv(nu + 1.0, x) / kv(nu, x)


def kv_exact_grad(nu, x):
    """K_nu(x) with *exact* AD gradients in both arguments.

    Differentiates straight through the Temme/CF2 recurrences (matches
    scipy finite differences to full precision, including d/dnu, which the
    default `kv` approximates by central difference). Costs roughly 2x the
    sequential loop trips of `kv` under reverse-mode, so prefer `kv` inside
    latency-bound optimizer scans and this in accuracy-critical fits.
    Domain: x > 0 (no scipy-style edge-value handling)."""
    nu = jnp.abs(jnp.asarray(nu))
    x = jnp.asarray(x)
    dtype = jnp.result_type(nu.dtype, x.dtype, jnp.float32)
    return _kv_positive(nu.astype(dtype), x.astype(dtype))
