"""Composite weighted-least-squares variogram fitting.

The cost is Cressie (1985)'s weighted relative squared error summed over
all (i, j) variogram groups (reference: src/model.py:266-283, 388-391):

    cost = sum over bins with yfit != 0 of count * ((emp - fit) / fit)^2

where ``fit`` is the *semivariogram* model at the bin centers regardless of
the empirical kind (the reference's _map_fit always evaluates
semivariance / cross_semivariance, src/model.py:266-275).

Unlike the reference — scipy L-BFGS-B with finite-difference gradients,
one pandas groupby per objective eval (src/model.py:285-317) — the cost
here is a single jit'd function over stacked (n_pairs, n_bins) arrays with
exact reverse-mode gradients through the Matern/K_nu kernel. Two drivers:

- ``method='scipy'``: scipy L-BFGS-B with the jit'd value_and_grad
  (default; matches the reference's optimizer semantics incl. box bounds);
- ``method='jax'``: fully on-device optax L-BFGS under a sigmoid box
  reparameterization — jit/vmap-able, so many months/bands can be fit in
  one compiled program across a device mesh.
"""

import warnings
from dataclasses import dataclass
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cokriging_tpu.cov.params import MaternParams, ParamSpec


@dataclass
class FitResult:
    """Fitted parameters + diagnostics (reference FittedVariogram,
    src/model.py:320-343)."""

    params: MaternParams
    cost: float
    success: bool
    n_iter: int
    estimate: object = None  # the EmpiricalVariogram fit against
    df_theoretical: object = None

    @property
    def df_empirical(self):
        return None if self.estimate is None else self.estimate.df

    @property
    def cs_valid(self) -> bool:
        """Cauchy-Schwarz validity of the fitted cross-covariances — the
        check the reference stubbed out (src/model.py:336-343)."""
        return cauchy_schwarz_check(self.params)


def cauchy_schwarz_check(params: MaternParams, n_h: int = 256) -> bool:
    """|C_ij(h)| <= sqrt(C_ii(h) C_jj(h)) for all pairs on an h grid.

    A necessary validity condition for the multivariate Matern; the
    sufficient Gneiting et al. (2010) parameter constraints imply it. The
    h grid spans [0, 4 max len_scale], where violations (if any) live.
    """
    from cokriging_tpu.cov.matern import covariance, cross_covariance

    p = params.n_procs
    h_max = 4.0 * float(jnp.max(params.len_scale))
    h = jnp.linspace(0.0, h_max, n_h)
    ok = True
    for i in range(p):
        for j in range(i + 1, p):
            cij = cross_covariance(params, i, j, h)
            cii = covariance(params, i, h, use_nugget=False)
            cjj = covariance(params, j, h, use_nugget=False)
            ok = ok and bool(
                jnp.all(jnp.abs(cij) <= jnp.sqrt(cii * cjj) + 1e-12)
            )
    return ok


def composite_wls_cost(flat, centers, means, counts, pairs, spec: ParamSpec):
    """Jittable composite WLS cost over stacked per-pair bin arrays.

    ``pairs`` is a static tuple of (i, j); rows of the arrays align to it.
    Bins with zero count, NaN mean, or zero model value are excluded
    (src/model.py:277-283 drops yfit == 0).

    Both marginal and cross groups reduce to fit = A - B * M(nu, ls, h):
    semivariance  = (sigma_i^2 + tau_i^2) - sigma_i^2 M    (src/model.py:209)
    cross-semivar = sill - rho sigma_i sigma_j M           (src/model.py:215)
    so ALL pairs evaluate through ONE stacked Matern/K_nu call — the K_nu
    inner loops are sequential-latency-bound, making call count (not FLOPs)
    the cost driver inside on-device optimizer scans.
    """
    from cokriging_tpu.cov.matern import matern_correlation

    params = MaternParams.from_flat(flat, spec=spec)
    ii = np.array([i for i, _ in pairs])
    jj = np.array([j for _, j in pairs])
    marginal = jnp.asarray(ii == jj)
    # pair sill 0.5 (C_ii(0) + C_jj(0)); == the reference's all-process sum
    # at p = 2, and the correct generalization for p > 2 (cov/matern.py
    # cross_semivariance).
    sill = 0.5 * (
        params.sigma[ii] ** 2
        + params.nugget[ii]
        + params.sigma[jj] ** 2
        + params.nugget[jj]
    )
    a_coef = jnp.where(
        marginal, params.sigma[ii] ** 2 + params.nugget[ii], sill
    )
    b_coef = jnp.where(
        marginal,
        params.sigma[ii] ** 2,
        params.rho[ii, jj] * params.sigma[ii] * params.sigma[jj],
    )
    m = matern_correlation(
        params.nu[ii, jj][:, None], params.len_scale[ii, jj][:, None], centers
    )
    fit = a_coef[:, None] - b_coef[:, None] * m

    valid = (counts > 0) & jnp.isfinite(means) & (fit != 0.0)
    fit_safe = jnp.where(fit == 0.0, 1.0, fit)
    r = (means - fit_safe) / fit_safe
    return jnp.sum(jnp.where(valid, counts * r * r, 0.0))


def validity_penalty(params: MaternParams, centers, n_h: int = 96):
    """Smooth Cauchy-Schwarz violation penalty on a dense lag grid from 0
    to the largest fitting lag: sum relu(|C_ij| - sqrt(C_ii C_jj))^2.
    Violations typically live BELOW the smallest bin center (a cross
    smoothness rougher than the marginals makes C_ij decay slower near 0),
    so the grid must reach h -> 0, not just the bin centers. Zero inside
    the valid region, so it never biases an already-valid fit. (The
    reference never enforced validity — src/model.py:172, 336-343 are
    TODO stubs.)"""
    from cokriging_tpu.cov.matern import covariance, cross_covariance

    p = params.n_procs
    h = jnp.linspace(0.0, 1.0, n_h).astype(centers.dtype) * jnp.max(centers)
    total = jnp.zeros((), h.dtype)
    for i in range(p):
        for j in range(i + 1, p):
            cij = cross_covariance(params, i, j, h)
            cii = covariance(params, i, h, use_nugget=False)
            cjj = covariance(params, j, h, use_nugget=False)
            gap = jnp.abs(cij) - jnp.sqrt(cii * cjj)
            total = total + jnp.sum(jnp.maximum(gap, 0.0) ** 2)
    return total


@partial(jax.jit, static_argnames=("pairs", "spec"))
def _cost_and_grad(flat, centers, means, counts, pairs, spec):
    return jax.value_and_grad(composite_wls_cost)(
        flat, centers, means, counts, pairs, spec
    )


# Memoized jitted fitters. make_device_*_fitter returns a fresh closure per
# call, and jax.jit caches traces by function identity — so without this
# cache every fit_wls call re-traces the whole optimizer scan through the
# K_nu graph (~6.5 s on TPU) even when the compiled executable is already
# in XLA's cache. One entry serves every fit with the same configuration.
_FITTER_CACHE = {}


def _cached_fitter(kind, pairs, spec, maxiter, **kw):
    key = (kind, pairs, spec, maxiter, tuple(sorted(kw.items())))
    if key not in _FITTER_CACHE:
        maker = {
            "adam": make_device_adam_fitter,
            "lbfgs": make_device_wls_fitter,
        }[kind]
        _FITTER_CACHE[key] = jax.jit(maker(pairs, spec, maxiter, **kw))
    return _FITTER_CACHE[key]


def moment_init(estimate, spec: Optional[ParamSpec] = None) -> MaternParams:
    """Method-of-moments initial values from the empirical variograms:
    sigma^2 + tau^2 from the far-field sill, tau^2 from the first bin's
    intercept, the length scale from the 63%-of-sill crossing lag, and rho
    from the colocated cross-covariance implied by the cross sill. Starting
    the WLS optimizer here cuts the on-device iteration count ~3x versus
    the defaults (and avoids the zero-cross-gradient trap at rho = 0)."""
    if spec is None:
        # Size the parameter vector from the pairs actually estimated, not
        # the (possibly default-bivariate) config — robust for p > 2.
        n_procs = 1 + max(j for _, j in estimate.pairs)
        spec = ParamSpec(n_procs=n_procs)
    lo, hi = spec.bounds()
    flat = np.array(MaternParams.default(spec.n_procs, spec).to_flat())
    p = spec.n_procs
    t = p * (p + 1) // 2
    iu = [(i, j) for i in range(p) for j in range(p) if i <= j]

    sills = {}
    for k, (i, j) in enumerate(estimate.pairs):
        centers = np.asarray(estimate.bin_centers[k], float)
        means = np.asarray(estimate.bin_means[k], float)
        good = np.isfinite(means)
        if good.sum() < 3:
            continue
        c, m = centers[good], means[good]
        tail = m[-max(3, len(m) // 3):].mean()
        sills[(i, j)] = tail
        if i == j:
            # nugget ~ first-bin value extrapolated toward h=0 (clipped)
            nug = max(0.0, 2 * m[0] - m[1]) if len(m) > 1 else 0.0
            nug = min(nug, 0.5 * tail)
            sig2 = max(tail - nug, 1e-6)
            # length scale: lag where gamma reaches 63% of (sill - nugget)
            target = nug + 0.632 * sig2
            above = np.where(m >= target)[0]
            ell = c[above[0]] if above.size else c[-1]
            flat[i] = np.sqrt(sig2)  # sigma_i
            diag_k = iu.index((i, i))
            flat[p + t + diag_k] = ell  # len_scale_ii
            flat[p + 2 * t + i] = nug  # nugget_i
    # rho from the cross sill: gamma_x(h->0) = sill_all - rho sig_i sig_j
    s = 0
    for i in range(p):
        for j in range(i + 1, p):
            if (i, j) in sills:
                k = estimate.pairs.index((i, j))
                m0 = np.asarray(estimate.bin_means[k], float)
                m0 = m0[np.isfinite(m0)]
                if m0.size:
                    # gamma_x(h->0) = pair_sill - rho sig_i sig_j, with the
                    # model's pair sill (cov/matern.py cross_semivariance)
                    pair_sill = 0.5 * (
                        sills.get((i, i), 1.0) + sills.get((j, j), 1.0)
                    )
                    rho = (pair_sill - m0[0]) / max(flat[i] * flat[j], 1e-6)
                    flat[2 * p + 2 * t + s] = np.clip(rho, -0.9, 0.9)
            # cross length scale: mean of the marginals
            ki, kj = iu.index((i, i)), iu.index((j, j))
            kx = iu.index((i, j))
            flat[p + t + kx] = 0.5 * (flat[p + t + ki] + flat[p + t + kj])
            s += 1
    flat = np.clip(flat, lo, hi)
    return MaternParams.from_flat(jnp.asarray(flat), spec=spec)


def fit_wls(
    estimate,
    init: Optional[MaternParams] = None,
    method: str = "scipy",
    maxiter: int = 500,
    validity_weight: float = 0.0,
    theoretical: bool = True,
    project_validity: bool = False,
) -> Tuple[MaternParams, FitResult]:
    """Fit Matern parameters to an EmpiricalVariogram by composite WLS.

    Mirrors MultivariateMatern.fit (src/model.py:285-317): L-BFGS-B from
    the default (or supplied) initial values under the spec's box bounds,
    warning on non-convergence. ``theoretical=False`` skips building the
    100-point theoretical-curve frame (a host-side convenience the hot
    path doesn't need). ``project_validity=True`` projects the optimum
    onto the exact spectral validity region (cov.spectral.project_to_valid
    — lifts cross-smoothness to the Gneiting floor and clips rho to its
    rho_max bound), guaranteeing a PD joint covariance for prediction.
    """
    spec = (init or MaternParams.default(estimate.config.n_procs)).spec
    if spec.n_procs != estimate.config.n_procs:
        raise ValueError(
            "Number of theoretical processes different from empirical processes."
        )
    init = init or MaternParams.default(spec.n_procs)
    x0 = np.asarray(init.to_flat(), dtype=np.float64)
    centers = jnp.asarray(estimate.bin_centers)
    means = jnp.asarray(estimate.bin_means)
    counts = jnp.asarray(estimate.bin_counts, centers.dtype)
    pairs = tuple(estimate.pairs)

    if method == "scipy":
        from scipy.optimize import minimize

        def fun(x):
            v, g = _cost_and_grad(jnp.asarray(x), centers, means, counts, pairs, spec)
            return float(v), np.asarray(g)

        lo, hi = spec.bounds()
        res = minimize(
            fun,
            x0,
            jac=True,
            method="L-BFGS-B",
            bounds=list(zip(lo, hi)),
            options={"maxiter": maxiter},
        )
        if not res.success:
            warnings.warn("ERROR: optimization did not converge.")
        # cast back to the estimate's compute dtype: f64 params handed to
        # an f32/TPU pipeline silently promote every downstream covariance
        # op to emulated f64 (~50x slower)
        params = MaternParams.from_flat(
            jnp.asarray(res.x, centers.dtype), spec=spec
        )
        cost, n_iter, success = float(res.fun), int(res.nit), bool(res.success)
    elif method == "jax":
        x, cost, n_iter, success = _fit_lbfgs_box(
            x0, centers, means, counts, pairs, spec, maxiter
        )
        params = MaternParams.from_flat(x, spec=spec)
        success = success and bool(np.isfinite(cost))
    elif method == "adam":
        fitter = _cached_fitter(
            "adam", pairs, spec, maxiter, validity_weight=validity_weight
        )
        # x0 in the estimate's dtype: an f64 argument would compile a
        # separate (emulated-f64-input) program variant on TPU
        x, cost = fitter(jnp.asarray(x0, centers.dtype), centers, means, counts)
        params = MaternParams.from_flat(x, spec=spec)
        cost, n_iter = float(cost), maxiter
        success = bool(np.isfinite(cost))
    else:
        raise ValueError(f"Unknown method {method!r}")

    if project_validity:
        from cokriging_tpu.cov.spectral import project_to_valid

        params = project_to_valid(params)

    result = FitResult(
        params=params,
        cost=cost,
        success=success,
        n_iter=n_iter,
        estimate=estimate,
    )
    if theoretical:
        result.df_theoretical = _theoretical_df(params, estimate)
    return params, result


def _theoretical_df(params, estimate):
    """Theoretical curves on a 100-point grid (src/model.py:330-331).

    ``h`` is evaluated in the parameters' dtype: a float64 grid against
    f32 fitted params promotes the whole K_nu evaluation to emulated f64
    on TPU — tens of seconds of recurring compile for a convenience frame.
    """
    from cokriging_tpu.cov.matern import MultivariateMatern

    dt = np.asarray(params.sigma).dtype
    h = np.linspace(0, float(np.max(estimate.bin_centers)), 100, dtype=dt)
    return MultivariateMatern(params.n_procs, params).variograms(h)


# ---------------------------------------------------------------------------
# On-device bounded L-BFGS via sigmoid box transform
# ---------------------------------------------------------------------------


def _box_forward(u, lo, hi):
    return lo + (hi - lo) * jax.nn.sigmoid(u)


def _box_inverse(x, lo, hi):
    z = jnp.clip((x - lo) / (hi - lo), 1e-6, 1 - 1e-6)
    return jnp.log(z) - jnp.log1p(-z)


def make_device_adam_fitter(pairs, spec, maxiter=800, lr=0.3, validity_weight=0.0):
    """Small-graph on-device fitter: Adam with a cosine-decayed learning
    rate under the sigmoid box transform.

    Compiles in seconds (unlike the L-BFGS line-search graph, which the
    remote TPU compile service can take many minutes over) and reaches or
    beats the L-BFGS-B optimum on variogram problems — the right trade for
    latency-sensitive or massively-batched fits. ``lr`` is the schedule
    peak.
    """
    import optax

    lo_np, hi_np = spec.bounds()
    opt = optax.adam(optax.cosine_decay_schedule(lr, maxiter))

    def fit(x0, centers, means, counts):
        # run the whole fit in the estimate's dtype (f32 on TPU halves the
        # sequential K_nu loop trips, which bound the per-step wall clock)
        dt = centers.dtype
        lo = jnp.asarray(lo_np, dt)
        hi = jnp.asarray(hi_np, dt)

        def objective(u):
            x = _box_forward(u, lo, hi)
            cost = composite_wls_cost(x, centers, means, counts, pairs, spec)
            if validity_weight:
                params_x = MaternParams.from_flat(x, spec=spec)
                cost = cost + validity_weight * jnp.sum(counts) * validity_penalty(
                    params_x, centers
                )
            return cost

        u0 = _box_inverse(jnp.asarray(x0, dt), lo, hi)

        def step(carry, _):
            u, state = carry
            value, grad = jax.value_and_grad(objective)(u)
            updates, state = opt.update(grad, state, u)
            u = optax.apply_updates(u, updates)
            return (u, state), value

        (u, _), _ = jax.lax.scan(step, (u0, opt.init(u0)), None, length=maxiter)
        return _box_forward(u, lo, hi), objective(u)

    return fit


def make_device_wls_fitter(pairs, spec, maxiter=300, validity_weight=0.0):
    """Build a jit/vmap-able fitter:
    (x0, centers, means, counts) -> (x, cost, n_evals, converged).

    The box constraint is enforced by a sigmoid reparameterization and
    the unconstrained problem is solved with the shared single-instance
    L-BFGS driver (estimate.nll.sigmoid_box_lbfgs: two-loop recursion +
    Armijo backtracking folded into one while-loop body) entirely on
    device — this is the path that lets pjit fan a fit over every month
    in a dataset at once, and the driver's one-objective-instance
    property keeps the vmapped program compile-light (the previous optax
    zoom-linesearch build embedded the K_nu cost graph ~6x).

    ``validity_weight`` adds the Cauchy-Schwarz validity_penalty to the
    cost (scaled by total pair count, like the adam fitter) — thin
    monthly estimates otherwise happily minimize at |rho| = 1, where the
    joint model is singular and every downstream prediction NaNs out.
    """
    from cokriging_tpu.estimate.nll import sigmoid_box_lbfgs

    lo_np, hi_np = spec.bounds()

    def fit(x0, centers, means, counts):
        # run the whole fit in the estimate's dtype (f32 on TPU halves
        # the sequential K_nu loop trips bounding per-step wall clock)
        dt = centers.dtype
        lo = jnp.asarray(lo_np, dt)
        hi = jnp.asarray(hi_np, dt)

        def raw(x):
            cost = composite_wls_cost(x, centers, means, counts, pairs, spec)
            if validity_weight:
                params_x = MaternParams.from_flat(x, spec=spec)
                cost = cost + validity_weight * jnp.sum(counts) * (
                    validity_penalty(params_x, centers)
                )
            return cost

        # 3 deterministic starts: WLS cost surfaces are multimodal (a
        # secondary basin ~100x above the optimum catches default and
        # moment inits on oracle problems); the box-fraction restarts
        # reuse the same compiled loop body
        return sigmoid_box_lbfgs(
            raw, jnp.asarray(x0, dt), lo, hi, maxiter=maxiter, n_starts=3
        )

    return fit


def _fit_lbfgs_box(x0, centers, means, counts, pairs, spec, maxiter):
    fitter = _cached_fitter("lbfgs", pairs, spec, maxiter)
    x, cost, n_evals, conv = fitter(jnp.asarray(x0), centers, means, counts)
    return x, float(cost), int(n_evals), bool(conv)


def fit_wls_batch(
    estimates,
    init: Optional[MaternParams] = None,
    maxiter: int = 300,
    mesh=None,
    validity_weight: float = 0.0,
    per_month_init: bool = False,
    project_validity=False,
):
    """Fit MANY months/bands at once: one compiled on-device L-BFGS program
    vmapped over the batch and (optionally) sharded over a device mesh.

    The reference fits one month per notebook run (src/model.py:285-317);
    here an entire record of monthly estimates is a single XLA call.

    Args:
        estimates: list of EmpiricalVariogram with identical pairs/n_bins.
        init: shared initial MaternParams (also fixes spec/bounds).
        mesh: optional jax.sharding.Mesh; batch axis is sharded over it.
        validity_weight: Cauchy-Schwarz penalty weight (see
            make_device_wls_fitter) — recommended > 0 for thin monthly
            estimates, whose raw WLS optimum often sits at |rho| = 1.
        per_month_init: start each month from its own moment_init
            instead of the shared ``init`` (better-conditioned starts on
            long heterogeneous records).
        project_validity: project each fitted month onto the exact
            spectral validity region (cov.spectral.project_to_valid).
            ``True`` lifts cross-smoothness to the Gneiting floor and
            clips rho to its exact rho_max bound; ``"parsimony"``
            additionally snaps the cross structure onto the parsimonious
            bivariate Matern (nu_ij = mean of marginals, l_ij = geometric
            mean), which keeps the admissible rho region wide — the right
            choice for thin monthly estimates whose unconstrained cross
            fit lands where rho_max ~ 0 and every downstream local
            Cholesky would NaN (the reference's unchecked failure mode,
            src/model.py:172, 336-343).

    Returns:
        (list of MaternParams, costs ndarray, converged bool ndarray),
        all in estimate order.
    """
    if not estimates:
        return [], np.zeros(0)
    pairs = tuple(estimates[0].pairs)
    n_procs = estimates[0].config.n_procs
    init = init or MaternParams.default(n_procs)
    spec = init.spec

    centers = np.stack([e.bin_centers for e in estimates])
    means = np.nan_to_num(
        np.stack([e.bin_means for e in estimates]), nan=0.0
    )
    counts = np.stack([e.bin_counts for e in estimates])
    # zero-count bins are excluded by the cost mask; NaN means zeroed above
    B = len(estimates)
    if per_month_init:
        x0 = jnp.stack(
            [moment_init(e, spec=spec).to_flat() for e in estimates]
        )
    else:
        x0 = jnp.tile(init.to_flat()[None], (B, 1))

    xs, costs, conv = fit_wls_batch_arrays(
        x0, centers, means, counts, pairs, spec, maxiter=maxiter, mesh=mesh,
        validity_weight=validity_weight,
    )
    params_list = [
        MaternParams.from_flat(jnp.asarray(x), spec=spec) for x in xs
    ]
    if project_validity:
        from cokriging_tpu.cov.spectral import project_to_valid

        parsimony = project_validity == "parsimony"
        params_list = [
            project_to_valid(p, parsimony=parsimony) for p in params_list
        ]
    return params_list, costs, conv


def fit_wls_batch_arrays(
    x0, centers, means, counts, pairs, spec, maxiter: int = 300, mesh=None,
    validity_weight: float = 0.0,
):
    """Array-level core of ``fit_wls_batch``: one vmapped on-device L-BFGS
    program over a batch of (centers, means, counts) variogram stacks.

    Also the engine of the parametric bootstrap (estimate/bootstrap.py),
    whose replicates arrive as stacked arrays rather than
    ``EmpiricalVariogram`` objects.

    Args:
        x0: (B, n_params) initial flat vectors.
        centers/means/counts: (B, n_pairs, n_bins) stacks (means must be
            NaN-free; zero-count bins are masked by the cost).
        mesh: optional jax.sharding.Mesh; batch axis sharded over it.

    Returns:
        (xs, costs, converged): (B, n_params) fitted flats, (B,) final
        costs, (B,) bool convergence flags (the driver's own stopping
        test, scipy L-BFGS-B semantics).
    """
    pairs = tuple(pairs)
    B = int(x0.shape[0])

    batch_key = ("lbfgs_batch", pairs, spec, maxiter, validity_weight)
    if batch_key not in _FITTER_CACHE:
        _FITTER_CACHE[batch_key] = jax.jit(
            jax.vmap(
                make_device_wls_fitter(
                    pairs, spec, maxiter, validity_weight=validity_weight
                )
            )
        )
    batched = _FITTER_CACHE[batch_key]

    args = [
        jnp.asarray(x0),
        jnp.asarray(centers),
        jnp.asarray(means),
        jnp.asarray(counts),
    ]
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        n_dev = mesh.devices.size
        pad = (-B) % n_dev
        if pad:
            args = [jnp.concatenate([a, a[:pad]]) for a in args]
        axis = mesh.axis_names[0]
        args = [
            jax.device_put(a, NamedSharding(mesh, P(axis)))
            for a in args
        ]
    xs, costs, _, conv = batched(*args)
    return np.asarray(xs)[:B], np.asarray(costs)[:B], np.asarray(conv)[:B]
