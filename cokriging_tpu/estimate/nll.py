"""Exact Gaussian negative log-likelihood for the joint bivariate field.

The reference only estimates parameters by variogram WLS; the exact
likelihood (Cholesky log-det) is the estimator the rebuild adds
(BASELINE.json north star: "exact-likelihood NLL with Cholesky log-det ...
jit+grad'd end to end"). The joint covariance uses the same conventions as
prediction (src/joint_prediction.py:124-153): Matern blocks with the
nugget on exact-zero distances, plus optional per-observation measurement
error variance on the diagonal.

    nll(theta) = 0.5 * (z^T C^-1 z + logdet C + n log 2pi)

computed via one Cholesky factorization (MXU path on TPU) and two
triangular solves; gradients flow through the factorization and the
K_nu kernel by reverse-mode AD.
"""

import warnings
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cokriging_tpu.cov.params import MaternParams, ParamSpec
from cokriging_tpu.cov.matern import block_covariance
from cokriging_tpu.kernels.distance import haversine_matrix, euclidean_matrix


def joint_distance_blocks(coords_list, geodesic=True):
    """(p, p) nested list of cross-distance matrices between field
    coordinate sets (upper triangle computed, lower mirrored)."""
    p = len(coords_list)
    dist = haversine_matrix if geodesic else euclidean_matrix
    blocks = [[None] * p for _ in range(p)]
    for i in range(p):
        for j in range(p):
            if i <= j:
                blocks[i][j] = dist(coords_list[i], coords_list[j])
            else:
                blocks[i][j] = blocks[j][i].T
    return blocks


def neg_log_likelihood(
    flat,
    dists,
    z,
    spec: ParamSpec,
    measurement_var=None,
    jitter: float = 0.0,
    analytic_grad=None,
):
    """Jittable exact NLL of stacked residuals ``z`` under flat params.

    Memory: the reverse pass uses the analytic Gaussian-likelihood gradient
    d(nll)/dC = 0.5 (C^-1 - alpha alpha^T) via a custom VJP (one explicit
    triangular inverse + one MXU matmul) instead of AD through the Cholesky
    factorization — AD's transpose/remat pipeline held a full extra
    covariance copy plus six block-sized temps and OOM'd one v5e chip by
    235 MB at the n = 25k north star. The single cotangent matrix then
    flows into the covariance assembly, whose own reverse pass through the
    K_nu kernel is chunk-bounded (cov/matern.py:_matern_corr_cvjp_bwd).
    Peak memory is O(n^2) in a handful of buffers regardless of n.

    Args:
        flat: flat parameter vector (reference ordering).
        dists: (p, p) nested list of distance blocks (precomputed, static
            across optimizer iterations).
        z: (n,) stacked residual vector over all processes.
        measurement_var: optional (n,) measurement-error variances added to
            the diagonal (prep_sif/prep_xco2 semantics,
            src/data_utils.py:28, 68).
        jitter: optional diagonal regularization.
        analytic_grad: route gradients through the closed-form d(nll)/dC
            custom VJP. ``False`` differentiates straight through the
            factorization. Default ``None`` decides by static problem
            size: the analytic path only pays off once the n^2 buffers
            matter (n > 4096) — below that, plain AD compiles far faster
            (the custom bwd's fori_loops inside optimizer while_loops
            blew small-fit compile times up ~10x) and runs just as fast.
    """
    if analytic_grad is None:
        analytic_grad = z.shape[0] > 4096

    def _assemble(f):
        params = MaternParams.from_flat(f, spec=spec)
        cov = block_covariance(params, dists, h_grad=not analytic_grad)
        n = cov.shape[0]
        diag_extra = jnp.full(n, jitter, cov.dtype)
        if measurement_var is not None:
            diag_extra = diag_extra + measurement_var
        return cov + jnp.diag(diag_extra)

    def _factor(f, ad_safe=False):
        cov = jax.checkpoint(_assemble)(f)
        n = cov.shape[0]
        # Non-PD parameter points (e.g. rho at +-1 with colocated samples)
        # make the factorization NaN; return a large finite penalty with
        # clean gradients instead so line searches can back off rather
        # than abort. ``ad_safe`` (the plain-AD small-n branch) must
        # sanitize the factorization INPUT: replacing the NaN factor after
        # the fact leaves cholesky's VJP computing with its NaN primal
        # (0 * nan = nan), which poisons L-BFGS curvature memory. The
        # analytic-gradient branch never differentiates through the
        # factorization, so it skips the extra probe Cholesky.
        if ad_safe:
            probe = jnp.linalg.cholesky(jax.lax.stop_gradient(cov))
            bad = jnp.any(jnp.isnan(probe))
            chol = jnp.linalg.cholesky(
                jnp.where(bad, jnp.eye(n, dtype=cov.dtype), cov)
            )
        else:
            chol = jnp.linalg.cholesky(cov)
            bad = jnp.any(jnp.isnan(chol))
            chol = jnp.where(bad, jnp.eye(n, dtype=cov.dtype), chol)
        alpha = jax.scipy.linalg.solve_triangular(chol, z, lower=True)
        # log_precise: TPU's f32 hw log has ~1e-4 abs error per element,
        # which a 25k-term logdet sum turns into O(1) absolute NLL error
        from cokriging_tpu.kernels.bessel import log_precise

        logdet = 2.0 * jnp.sum(log_precise(jnp.diagonal(chol)))
        nll = 0.5 * (alpha @ alpha + logdet + n * jnp.log(2.0 * jnp.pi))
        # Penalty magnitude matters: too large (1e12) and the line-search
        # quadratic interpolation after hitting it produces a step below
        # float resolution, stalling L-BFGS at the previous iterate.
        penalty = jnp.asarray(1e6, cov.dtype) * (1.0 + 0.5 * n)
        return jnp.where(bad, penalty, nll), (chol, alpha, bad)

    if not analytic_grad:
        return _factor(flat, ad_safe=True)[0]

    @jax.custom_vjp
    def _nll(f):
        return _factor(f)[0]

    def _fwd(f):
        out, (chol, alpha, bad) = _factor(f)
        return out, (f, chol, alpha, bad)

    def _bwd(res, ct):
        from cokriging_tpu.kernels.linalg import spd_inverse_from_chol

        f, chol, alpha, bad = res
        # C^-1 via the divide-and-conquer triangular inverse + triangular
        # product (kernels/linalg.py) — XLA's square-RHS triangular-solve
        # expander holds ~n/256 live matrix-sized temps (32.5 GB measured
        # at n = 12.5k), so solve_triangular(L, eye(n)) is not usable
        # here, and the dense L^-T @ L^-1 matmul pays 3x the FLOPs.
        cinv = spd_inverse_from_chol(chol)
        beta = jax.scipy.linalg.solve_triangular(
            chol, alpha, lower=True, trans=1
        )  # C^-1 z
        g_cov = 0.5 * (cinv - jnp.outer(beta, beta))
        # At penalty (non-PD) points the objective is locally constant.
        g_cov = jnp.where(bad, jnp.zeros_like(g_cov), g_cov) * ct
        _, avjp = jax.vjp(_assemble, f)
        (g_flat,) = avjp(g_cov)
        return (g_flat,)

    _nll.defvjp(_fwd, _bwd)
    return _nll(flat)


def _clean_grad(g):
    """Zero non-finite gradient entries. At penalty (non-PD) points the
    objective is locally constant, so a zero gradient is the consistent
    value; the NaNs would otherwise leak out of cholesky's VJP, whose
    forward primals are NaN there even though `where` discards them
    (0 * NaN = NaN)."""
    return jnp.where(jnp.isfinite(g), g, 0.0)


@partial(jax.jit, static_argnames=("spec",))
def _nll_value_and_grad(flat, dists, z, spec, measurement_var, jitter):
    v, g = jax.value_and_grad(neg_log_likelihood)(
        flat, dists, z, spec, measurement_var, jitter
    )
    return v, _clean_grad(g)


@partial(jax.jit, static_argnames=("spec",))
def _nll_u_value_and_grad(u, lo, hi, dists, z, spec, measurement_var, jitter):
    """Value+grad of the NLL under the sigmoid box transform
    x = lo + (hi - lo) * sigmoid(u)."""

    def obj(u):
        x = lo + (hi - lo) * jax.nn.sigmoid(u)
        return neg_log_likelihood(x, dists, z, spec, measurement_var, jitter)

    v, g = jax.value_and_grad(obj)(u)
    return v, _clean_grad(g)


def sigmoid_box_lbfgs(
    raw, x0, lo, hi, maxiter: int = 200, tol: float = 1e-6,
    memory_size: int = 10, n_starts: int = 1,
):
    """Minimize ``raw(x)`` over the box [lo, hi] with an on-device L-BFGS
    (two-loop recursion + Armijo backtracking) under the sigmoid
    reparameterization x = lo + (hi - lo) * sigmoid(u) — ONE
    `lax.while_loop` program whose body evaluates the objective at
    EXACTLY ONE call site.

    Why hand-rolled rather than optax.lbfgs + zoom linesearch: each
    *textual* instance of the objective in the traced program embeds a
    full NLL graph (covariance assembly through the K_nu series plus a
    Cholesky — ~8 MB of generated TPU code at n = 200), and the optax
    update duplicates it ~6x (value_and_grad_from_state, the
    linesearch's value_fn re-traces, the final re-evaluation). The
    compiled fitter was 53 MB and cost ~70 s of trace+compile per
    process — for 0.2 s of actual device runtime. Folding the weak-Wolfe
    line search INTO the outer while-loop body (one trial point, one
    value+grad, accept / bracket-and-interpolate) leaves exactly one
    objective instance; same-or-better optima (tests/test_nll.py pins
    agreement with the host scipy driver), ~6x smaller program.

    Gradients are cleaned (non-finite entries zeroed) so penalty-region
    probes cannot poison the curvature memory. A curvature pair is only
    stored when s.y > 0 (standard skip rule), keeping the implicit
    inverse Hessian positive definite.

    ``n_starts > 1`` adds deterministic box-fraction restarts mapped
    through the same loop body (no program growth) and returns the best
    basin — multimodal WLS costs need this to match scipy's basin.

    Returns (x, value, n_iter, converged) — n_iter counts objective
    evaluations (accepts + line-search probes, summed over starts);
    converged is True iff the winning start exited on the gradient
    tolerance or the ftol test at a genuine (non-penalty) point.
    A cleaned gradient of exactly zero means the iterate is stranded on
    the non-PD penalty plateau (the penalty is constant, so its cleaned
    gradient is identically zero — a real optimum's float gradient is
    tiny but nonzero); that exit reports converged=False, matching the
    host driver, which also cannot certify such a point.
    """
    m = memory_size
    d = x0.shape[0]
    dt = x0.dtype
    c1 = jnp.asarray(1e-4, dt)
    c2 = jnp.asarray(0.9, dt)
    # scipy L-BFGS-B's second stopping test (factr = 1e7): declare
    # convergence when accepted steps' relative improvement stays below
    # ftol — the gradient-norm test alone leaves stiff NLL surfaces
    # (flat nu directions) polishing a converged optimum until maxiter.
    # scipy's one-shot version assumes Wolfe-quality steps; Armijo-only
    # acceptance can take a tiny backtracked step mid-run, so require
    # THREE consecutive small-improvement accepts before stopping.
    ftol = jnp.asarray(
        2.2e-9 if jnp.dtype(dt) == jnp.float64 else 1e-6, dt
    )

    def raw_u(u):
        return raw(lo + (hi - lo) * jax.nn.sigmoid(u))

    def value_and_clean_grad(u):
        v, g = jax.value_and_grad(raw_u)(u)
        return v, _clean_grad(g)

    def direction(g, S, Y, rho, head):
        """L-BFGS two-loop recursion over the (masked, circular) history."""
        order = (head - 1 - jnp.arange(m)) % m  # newest first
        So, Yo = S[order], Y[order]
        ro = rho[order]
        valid = ro > 0.0
        q = g
        alphas = []
        for k in range(m):
            a = jnp.where(valid[k], ro[k] * (So[k] @ q), 0.0)
            q = q - a * Yo[k]
            alphas.append(a)
        # initial Hessian scale from the newest valid pair
        any_valid = jnp.any(valid)
        knew = jnp.argmax(valid)  # first True in newest-first order
        yy = Yo[knew] @ Yo[knew]
        gamma = jnp.where(
            any_valid, (So[knew] @ Yo[knew]) / jnp.maximum(yy, 1e-30), 1.0
        )
        q = gamma * q
        for k in range(m - 1, -1, -1):
            b = jnp.where(valid[k], ro[k] * (Yo[k] @ q), 0.0)
            q = q + jnp.where(valid[k], alphas[k] - b, 0.0) * So[k]
        return -q

    S0 = jnp.zeros((m, d), dt)
    Y0 = jnp.zeros((m, d), dt)
    rho0 = jnp.zeros((m,), dt)

    # carry: u, f, g, S, Y, rho, head, dir, alpha, alo, ahi, evals,
    #        accepts, backtracks, fail, n_small (consecutive ftol-small)
    def body(carry):
        (u, f, g, S, Y, rho, head, dvec, alpha, alo, ahi, evals, accepts,
         bt, fail, n_small) = carry
        ut = u + alpha * dvec
        ft, gt = value_and_clean_grad(ut)  # the ONE objective instance
        slope = g @ dvec
        armijo = ft <= f + c1 * alpha * slope
        # weak Wolfe curvature condition: the trial slope must have
        # flattened (slope < 0, c2 = 0.9). An Armijo-only rule can accept
        # arbitrarily short steps whose (s, y) pairs are skipped (s.y <=
        # 0), starving the curvature memory and stalling the fit far from
        # the optimum. Steps are searched by Lewis-Overton bracketing
        # bisection (armijo fail -> shrink ahi; curvature fail -> grow
        # alo, doubling while unbracketed), which provably lands in the
        # weak-Wolfe window; after 20 probes without an accept, any
        # Armijo point is taken (the s.y > 0 skip rule below still
        # protects the curvature memory).
        curv_ok = gt @ dvec >= c2 * slope
        accept_good = armijo & curv_ok
        accept = armijo & (curv_ok | (bt >= 20))
        small = (f - ft) <= ftol * jnp.maximum(jnp.abs(ft), 1.0)
        # only clean Wolfe accepts count toward the ftol stop: a forced
        # accept (20 probes without a Wolfe point) makes tiny progress by
        # construction and must not masquerade as convergence
        n_small_n = jnp.where(
            accept_good, jnp.where(small, n_small + 1, 0), n_small
        )

        # --- accept branch state ---
        s = ut - u
        y = gt - g
        curv = s @ y
        store = accept & (curv > 1e-10 * jnp.sqrt((s @ s) * (y @ y)))
        pos = head % m
        S_n = jnp.where(store, S.at[pos].set(s), S)
        Y_n = jnp.where(store, Y.at[pos].set(y), Y)
        rho_n = jnp.where(
            store, rho.at[pos].set(1.0 / jnp.maximum(curv, 1e-30)), rho
        )
        head_n = jnp.where(store, head + 1, head)
        d_acc = direction(gt, S_n, Y_n, rho_n, head_n)

        # --- reject: bracketing bisection; >40 probes without an
        # --- Armijo point = line-search failure
        u_n = jnp.where(accept, ut, u)
        f_n = jnp.where(accept, ft, f)
        g_n = jnp.where(accept, gt, g)
        dvec_n = jnp.where(accept, d_acc, dvec)
        alo_n = jnp.where(accept | ~armijo, alo, alpha)   # curv fail grows lo
        ahi_n = jnp.where(accept | armijo, ahi, alpha)    # armijo fail caps hi
        # quadratic-interpolation candidate from (f, slope, ft) — the
        # minimizer of the 1-d quadratic through the three facts; far
        # better steps than blind midpoints. Safeguarded into the open
        # bracket; falls back to bisection when degenerate.
        denom = 2.0 * (ft - f - slope * alpha)
        alpha_q = jnp.where(
            denom > 0.0, -slope * alpha * alpha / jnp.maximum(denom, 1e-30),
            0.5 * (alo_n + jnp.minimum(ahi_n, 2.0 * alpha)),
        )
        span_lo = alo_n + 0.1 * (jnp.minimum(ahi_n, 4.0 * alpha) - alo_n)
        span_hi = alo_n + 0.9 * (jnp.minimum(ahi_n, 4.0 * alpha) - alo_n)
        alpha_q = jnp.clip(alpha_q, span_lo, span_hi)
        alpha_next = jnp.where(
            jnp.isfinite(ahi_n), alpha_q, 2.0 * alpha
        )
        alpha_n = jnp.where(accept, jnp.asarray(1.0, dt), alpha_next)
        alo_n = jnp.where(accept, jnp.asarray(0.0, dt), alo_n)
        ahi_n = jnp.where(accept, jnp.asarray(jnp.inf, dt), ahi_n)
        bt_n = jnp.where(accept, 0, bt + 1)
        fail_n = fail | (~accept & (bt_n > 40))
        return (
            u_n, f_n, g_n,
            jnp.where(accept, S_n, S), jnp.where(accept, Y_n, Y),
            jnp.where(accept, rho_n, rho), jnp.where(accept, head_n, head),
            dvec_n, alpha_n, alo_n, ahi_n, evals + 1,
            accepts + accept.astype(jnp.int32), bt_n, fail_n, n_small_n,
        )

    def continuing(carry):
        _, _, g, *_, evals, _, _, fail, n_small = carry
        err = jnp.sqrt(g @ g)
        return (evals < maxiter) & (err >= tol) & (~fail) & (n_small < 3)

    def run_one(u0):
        f0, g0 = value_and_clean_grad(u0)
        d0 = -g0
        gnorm0 = jnp.sqrt(g0 @ g0)
        alpha0 = jnp.minimum(1.0, 1.0 / jnp.maximum(gnorm0, 1e-12)).astype(dt)
        init = (
            u0, f0, g0, S0, Y0, rho0, jnp.int32(0), d0, alpha0,
            jnp.asarray(0.0, dt), jnp.asarray(jnp.inf, dt),
            jnp.int32(0), jnp.int32(0), jnp.int32(0), jnp.asarray(False),
            jnp.int32(0),
        )
        u, v, g, *_, evals, accepts, _, fail, n_small = jax.lax.while_loop(
            continuing, body, init
        )
        err = jnp.sqrt(g @ g)
        genuine = (err > 0.0) & jnp.isfinite(v) & (~fail)
        converged = ((err < tol) | (n_small >= 3)) & genuine
        return u, v, evals + 1, converged

    def to_u(x):
        z = jnp.clip((x - lo) / (hi - lo), 1e-6, 1 - 1e-6)
        return jnp.log(z) - jnp.log1p(-z)

    if n_starts <= 1:
        u, v, evals, converged = run_one(to_u(x0))
    else:
        # Deterministic multistart against multimodal cost surfaces (WLS
        # costs routinely have a secondary basin ~100x above the real
        # optimum): the caller's x0 plus (n_starts - 1) box-fraction
        # starts, run sequentially through lax.map — the loop body (and
        # its single objective instance) is shared, so program size does
        # not grow with n_starts.
        fr = jnp.linspace(0.25, 0.75, n_starts - 1, dtype=dt)
        xs = jnp.concatenate(
            [jnp.asarray(x0, dt)[None], lo + fr[:, None] * (hi - lo)]
        )
        u_all, v_all, e_all, c_all = jax.lax.map(run_one, jax.vmap(to_u)(xs))
        # prefer the caller's start unless a restart is better by a REAL
        # margin (0.1% relative): near-ties between basins would otherwise
        # let reduction-order noise (e.g. sharded vs single-device
        # layouts) flip the winner and return a different parameter
        # vector for the same problem
        v0 = v_all[0]
        margin = jnp.maximum(1e-3 * jnp.abs(v0), 1e-6)
        thresh = jnp.where(jnp.isfinite(v0), v0 - margin, jnp.inf)
        beats = jnp.isfinite(v_all) & (v_all < thresh)
        k = jnp.where(
            jnp.any(beats),
            jnp.argmin(jnp.where(beats, v_all, jnp.inf)),
            0,
        )
        u, v = u_all[k], v_all[k]
        evals = jnp.sum(e_all)
        converged = c_all[k]
    return lo + (hi - lo) * jax.nn.sigmoid(u), v, evals, converged


def make_device_nll_lbfgs_fitter(
    spec: ParamSpec, maxiter=200, tol=1e-6, memory_size=15
):
    """Fully on-device L-BFGS maximum-likelihood fitter: optax.lbfgs with
    zoom linesearch on the sigmoid-box-transformed NLL, one
    `lax.while_loop` program. Unlike the Adam fitter this converges to the
    same tight optima as the host scipy driver (tests/test_nll.py asserts
    agreement) while paying ONE dispatch instead of per-eval host relay
    latency — the right default on TPU.

    Returns fit(x0, dists, z, measurement_var, jitter)
    -> (x, nll, n_iter, converged).
    """
    lo_np, hi_np = spec.bounds()

    def fit(x0, dists, z, measurement_var, jitter):
        dt = z.dtype
        lo = jnp.asarray(lo_np, dt)
        hi = jnp.asarray(hi_np, dt)

        def raw(x):
            return neg_log_likelihood(
                x, dists, z, spec, measurement_var, jitter
            )

        return sigmoid_box_lbfgs(
            raw, jnp.asarray(x0, dt), lo, hi,
            maxiter=maxiter, tol=tol, memory_size=memory_size,
        )

    return fit


def make_device_nll_fitter(spec: ParamSpec, maxiter=500, lr=0.1):
    """Fully on-device maximum-likelihood fitter: Adam + cosine decay on
    the sigmoid-box-transformed NLL, one `lax.scan` program (one dispatch
    instead of a host-driven optimizer paying relay latency per eval).

    NOTE: first-order Adam trades optimum tightness for dispatch count on
    the stiff NLL surface — prefer `make_device_nll_lbfgs_fitter` (tight
    optima, still one dispatch) or `fit_nll` (scipy driver) when optimum
    quality matters; Adam remains useful for heavily batched fits where a
    fixed-trip scan is easier to vmap.

    Returns fit(x0, dists, z, measurement_var, jitter) -> (x, nll).
    """
    import optax

    lo_np, hi_np = spec.bounds()
    opt = optax.adam(optax.cosine_decay_schedule(lr, maxiter))

    def fit(x0, dists, z, measurement_var, jitter):
        dt = z.dtype
        lo = jnp.asarray(lo_np, dt)
        hi = jnp.asarray(hi_np, dt)

        def objective(u):
            x = lo + (hi - lo) * jax.nn.sigmoid(u)
            return neg_log_likelihood(x, dists, z, spec, measurement_var, jitter)

        z0 = jnp.clip((jnp.asarray(x0, dt) - lo) / (hi - lo), 1e-6, 1 - 1e-6)
        u0 = jnp.log(z0) - jnp.log1p(-z0)

        # Track the best iterate: the non-PD penalty plateau has zero
        # gradient, so momentum can strand the *last* iterate there even
        # though earlier steps were fine.
        def step(carry, _):
            u, state, best_u, best_v = carry
            value, grad = jax.value_and_grad(objective)(u)
            grad = _clean_grad(grad)
            better = value < best_v
            best_u = jnp.where(better, u, best_u)
            best_v = jnp.where(better, value, best_v)
            updates, state = opt.update(grad, state, u)
            u = optax.apply_updates(u, updates)
            return (u, state, best_u, best_v), value

        init_v = objective(u0)
        (u, _, best_u, best_v), _ = jax.lax.scan(
            step, (u0, opt.init(u0), u0, init_v), None, length=maxiter
        )
        final_v = objective(u)
        better = final_v < best_v
        u = jnp.where(better, u, best_u)
        v = jnp.where(better, final_v, best_v)
        return lo + (hi - lo) * jax.nn.sigmoid(u), v

    return fit


_DEVICE_FITTER_CACHE = {}


def _cached_device_fitter(method, spec, maxiter):
    """One jitted fitter per (method, spec, maxiter): a fresh jax.jit
    wrapper per call would re-trace and re-load the executable every
    call (~70 s for 0.2 s of runtime on the remote backend)."""
    key = (method, spec, maxiter)
    if key not in _DEVICE_FITTER_CACHE:
        maker = {
            "lbfgs": make_device_nll_lbfgs_fitter,
            "adam": make_device_nll_fitter,
        }[method]
        _DEVICE_FITTER_CACHE[key] = jax.jit(maker(spec, maxiter))
    return _DEVICE_FITTER_CACHE[key]


def fit_nll_device(
    mf,
    init: Optional[MaternParams] = None,
    use_measurement_var: bool = False,
    jitter: float = 1e-8,
    maxiter: int = 200,
    main: bool = True,
    method: str = "lbfgs",
) -> Tuple[MaternParams, dict]:
    """Maximum-likelihood fit entirely on device as ONE compiled program.

    ``method="lbfgs"`` (default) uses on-device L-BFGS with zoom linesearch
    and matches the host scipy driver's optima; ``method="adam"`` is the
    fixed-trip first-order fallback (vmap-friendly, looser optimum).
    """
    init = init or MaternParams.default(mf.n_procs)
    spec = init.spec
    coords = [f.coords_main if main else f.coords for f in mf.fields]
    values = [f.values_main if main else f.values for f in mf.fields]
    dists = joint_distance_blocks(coords, geodesic=mf.geodesic)
    z = jnp.concatenate(values)
    mvar = None
    if use_measurement_var:
        mvar = jnp.concatenate(
            [
                f.measurement_var
                if f.measurement_var is not None
                else jnp.zeros(f.size)
                for f in mf.fields
            ]
        )
    if method == "lbfgs":
        fitter = _cached_device_fitter("lbfgs", spec, maxiter)
        x, nll, n_iter, conv = fitter(init.to_flat(), dists, z, mvar, jitter)
        n_iter = int(n_iter)
        success = bool(conv)
    elif method == "adam":
        fitter = _cached_device_fitter("adam", spec, maxiter)
        x, nll = fitter(init.to_flat(), dists, z, mvar, jitter)
        n_iter = maxiter
        # fixed-trip Adam has no stopping test; finite objective is the
        # only convergence signal available
        success = bool(np.isfinite(float(nll)))
    else:
        raise ValueError(f"unknown device NLL method: {method!r}")
    params = MaternParams.from_flat(x, spec=spec)
    return params, {
        "nll": float(nll),
        "success": success,
        "n_iter": n_iter,
        "n_obj_evals": n_iter,
    }


def fit_nll(
    mf,
    init: Optional[MaternParams] = None,
    use_measurement_var: bool = False,
    jitter: float = 1e-8,
    maxiter: int = 200,
    main: bool = True,
) -> Tuple[MaternParams, dict]:
    """Maximum-likelihood fit of the Matern parameters to a MultiField.

    The box constraint is enforced by a sigmoid reparameterization and the
    unconstrained problem solved with scipy L-BFGS over the jit'd
    value_and_grad. (A bound-constrained L-BFGS-B in raw space stalls here:
    its first Cauchy step projects onto a bound corner — e.g. rho = -1 with
    colocated samples — where the covariance is exactly singular, and the
    enormous penalty value collapses the line-search interpolation to a
    zero step. Under the transform those corners sit at u = +-inf and are
    unreachable.) Distance blocks are assembled once and live on device
    across all objective evaluations.
    """
    from scipy.optimize import minimize

    init = init or MaternParams.default(mf.n_procs)
    spec = init.spec
    coords = [f.coords_main if main else f.coords for f in mf.fields]
    values = [f.values_main if main else f.values for f in mf.fields]
    dists = joint_distance_blocks(coords, geodesic=mf.geodesic)
    z = jnp.concatenate(values)
    mvar = None
    if use_measurement_var:
        mvar = jnp.concatenate(
            [
                f.measurement_var
                if f.measurement_var is not None
                else jnp.zeros(f.size)
                for f in mf.fields
            ]
        )

    lo_np, hi_np = spec.bounds()
    lo = jnp.asarray(lo_np)
    hi = jnp.asarray(hi_np)
    x0 = np.clip(
        np.asarray(init.to_flat(), np.float64),
        lo_np + 1e-6 * (hi_np - lo_np),
        hi_np - 1e-6 * (hi_np - lo_np),
    )
    z0 = (x0 - lo_np) / (hi_np - lo_np)
    u0 = np.log(z0) - np.log1p(-z0)

    evals = {"n": 0}

    def fun(u):
        evals["n"] += 1
        v, g = _nll_u_value_and_grad(
            jnp.asarray(u), lo, hi, dists, z, spec, mvar, jitter
        )
        return float(v), np.asarray(g)

    res = minimize(
        fun,
        u0,
        jac=True,
        method="L-BFGS-B",
        options={"maxiter": maxiter},
    )
    if not res.success:
        warnings.warn("NLL optimization did not converge.")
    x_fit = lo_np + (hi_np - lo_np) / (1.0 + np.exp(-res.x))
    # params come back in the residuals' dtype: f64 params handed to an
    # f32/TPU pipeline silently promote every downstream covariance op to
    # emulated f64 (~50x slower)
    params = MaternParams.from_flat(jnp.asarray(x_fit, z.dtype), spec=spec)
    info = {
        "nll": float(res.fun),
        "success": bool(res.success),
        "n_iter": int(res.nit),
        "n_obj_evals": evals["n"],
    }
    return params, info
