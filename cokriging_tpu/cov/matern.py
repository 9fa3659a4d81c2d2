r"""Multivariate (bivariate) Matern cross-covariance model.

Pure jittable functions implementing the Gneiting et al. (2010) full
bivariate Matern in the Rasmussen-Williams parameterization, with exactly
the reference's conventions (reference: src/model.py:173-247):

- ``correlation``: log-space Matern correlation with K_nu
  (src/model.py:354-385); h == 0 -> 1; non-finite -> 0; clamped >= 0.
- ``covariance(i, h)`` = sigma_i^2 * M_ii(h), nugget added *only at
  exactly h == 0* (src/model.py:193-197).
- ``cross_covariance(i, j, h)`` = rho_ij * sigma_i * sigma_j * M_ij(h)
  (src/model.py:199-207; the reference's ``np.nanprod(sigma)`` equals
  sigma_i * sigma_j for p = 2).
- ``semivariance(i, h)`` = sigma_i^2 (1 - M_ii(h)) + tau_i^2
  (src/model.py:209-213).
- ``cross_semivariance(i, j, h)`` = sill - C_ij(h) with the PAIR sill
  0.5 (sigma_i^2 + tau_i^2 + sigma_j^2 + tau_j^2). At p = 2 this is
  bitwise-equal to the reference's all-process sum (src/model.py:215-222);
  for p > 2 the pair sill is the statistically correct generalization
  (the reference is bivariate-only there).

A thin ``MultivariateMatern`` class provides the reference's OO surface
(correlation/covariance/.../variograms/fit) on top of these functions.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from cokriging_tpu.cov.params import MaternParams
from cokriging_tpu.kernels.bessel import kv, lgamma_precise, log_precise


def _matern_corr_raw(nu, len_scale, h):
    """Elementwise Matern correlation body (see matern_correlation).

    log/lgamma go through kernels.bessel's precise f32 routines: the TPU
    hardware approximations carry ~1e-4 absolute error, which dominated
    both the f32 correlation values and (divided by the FD step) the
    dK/dnu gradients. f64 inputs fall through to the stock primitives.
    """
    h = jnp.abs(h)
    positive = h > 0.0
    hs = jnp.where(positive, h, 1.0) / len_scale
    arg = jnp.sqrt(2.0 * nu) * hs
    log_pref = (
        (1.0 - nu) * jnp.log(2.0) - lgamma_precise(nu) + nu * log_precise(arg)
    )
    corr = jnp.exp(log_pref) * kv(nu, arg)
    corr = jnp.where(jnp.isfinite(corr), corr, 0.0)
    corr = jnp.maximum(corr, 0.0)
    return jnp.where(positive, corr, 1.0)


#: Elements per backward chunk of the custom-VJP correlation (~16 MB f32
#: per plain buffer, 5x that for the stacked K_nu rows the inner vjp saves).
BWD_CHUNK_ELEMS = 1 << 22


def _matern_corr_cvjp_bwd(res, ct):
    """Explicitly chunked reverse pass.

    Reverse-mode through ``kv``'s stacked 5-row JVP otherwise saves
    f32[5, n, n] residuals for the whole matrix at once — 745 MB per block
    at n = 12.5k; XLA's own remat left ~19 GB of HLO temps live at the
    n~25k north-star NLL and OOM'd one v5e chip. Scanning the backward
    over flat element chunks bounds residual memory at
    O(5 * BWD_CHUNK_ELEMS) regardless of matrix size.
    """
    nu, ls, h = res
    shape = h.shape
    n = h.size
    hf = jnp.ravel(h)
    ctf = jnp.ravel(jnp.asarray(ct))
    chunk = min(n, BWD_CHUNK_ELEMS) or 1

    def one(hc, cc):
        out, vjp = jax.vjp(_matern_corr_raw, nu, ls, hc)
        # mixed-precision callers (f32 distances, f64 params) promote the
        # primal output; the cotangent must match its dtype exactly
        return vjp(cc.astype(out.dtype))

    if n <= chunk:
        g_nu, g_ls, g_hf = one(hf, ctf)
        return g_nu, g_ls, g_hf.reshape(shape)

    pad = (-n) % chunk
    # pad h with 1.0 (positive, away from the h == 0 branch) and the
    # cotangent with 0 so padded lanes contribute nothing
    hc = jnp.concatenate([hf, jnp.ones(pad, hf.dtype)]).reshape(-1, chunk)
    cc = jnp.concatenate([ctf, jnp.zeros(pad, ctf.dtype)]).reshape(-1, chunk)

    def body(carry, xs):
        g_nu, g_ls = carry
        gn, gl, gh = one(*xs)
        return (g_nu + gn, g_ls + gl), gh

    zero = (jnp.zeros_like(nu), jnp.zeros_like(ls))
    (g_nu, g_ls), ghs = jax.lax.scan(body, zero, (hc, cc))
    return g_nu, g_ls, ghs.reshape(-1)[:n].reshape(shape)


@jax.custom_vjp
def _matern_corr_cvjp(nu, len_scale, h):
    return _matern_corr_raw(nu, len_scale, h)


_matern_corr_cvjp.defvjp(
    lambda nu, ls, h: (_matern_corr_raw(nu, ls, h), (nu, ls, h)),
    _matern_corr_cvjp_bwd,
)


def _matern_corr_nh_bwd(res, ct):
    """Reverse pass that skips the h-cotangent entirely.

    Distances are *data* everywhere in this framework — only nu/len_scale
    are optimized — yet the generic chunked bwd still materializes
    reshape copies of h/ct plus a stacked matrix-sized g_h scan output.
    At the n~25k NLL those dead buffers (and XLA's remat clones of them)
    cost ~8 GB. Here the scan reads dynamic slices of the *input* buffers
    and carries two scalars; g_h is a broadcast zero the consumer DCEs.
    """
    nu, ls, h = res
    shape = h.shape
    n = h.size
    hf = jnp.ravel(h)
    ctf = jnp.ravel(jnp.asarray(ct))
    chunk = min(n, BWD_CHUNK_ELEMS) or 1

    def grads_of(hc, cc):
        out, vjp = jax.vjp(lambda a, b: _matern_corr_raw(a, b, hc), nu, ls)
        return vjp(cc.astype(out.dtype))

    n_full = (n // chunk) * chunk
    g_nu, g_ls = jnp.zeros_like(nu), jnp.zeros_like(ls)
    if n_full >= chunk:

        def body(k, carry):
            gn_acc, gl_acc = carry
            hc = jax.lax.dynamic_slice(hf, (k * chunk,), (chunk,))
            cc = jax.lax.dynamic_slice(ctf, (k * chunk,), (chunk,))
            gn, gl = grads_of(hc, cc)
            return gn_acc + gn, gl_acc + gl

        g_nu, g_ls = jax.lax.fori_loop(0, n // chunk, body, (g_nu, g_ls))
    if n - n_full:
        gn, gl = grads_of(hf[n_full:], ctf[n_full:])
        g_nu, g_ls = g_nu + gn, g_ls + gl
    return g_nu, g_ls, jnp.zeros(shape, h.dtype)


@jax.custom_vjp
def _matern_corr_cvjp_nh(nu, len_scale, h):
    return _matern_corr_raw(nu, len_scale, h)


_matern_corr_cvjp_nh.defvjp(
    lambda nu, ls, h: (_matern_corr_raw(nu, ls, h), (nu, ls, h)),
    _matern_corr_nh_bwd,
)


def _use_pallas(h) -> bool:
    """Static trace-time gate for the fused Pallas Matern kernels: TPU
    backend, f32 matrix data, and a matrix big enough to amortize the
    tile grid. (CPU f64 golden tests never take this path.)"""
    import jax as _jax

    return (
        h.ndim == 2
        and h.dtype == jnp.float32
        and h.size >= 512 * 512
        and _jax.default_backend() == "tpu"
    )


def _scaled_matern_raw(
    scale, nugget, nu, ls, h, pallas: bool = False, symmetric: bool = False
):
    """scale * M(nu, ls, h) + nugget at exactly h == 0 — one covariance
    block (marginal: scale = sigma^2; cross: scale = rho sigma_i sigma_j,
    nugget = 0). Conventions per src/model.py:193-207.

    ``pallas=True`` evaluates M through the fused VMEM kernel
    (kernels.pallas_ops) — forward value only; callers guard with
    _use_pallas. ``symmetric=True`` (square symmetric h, e.g. marginal
    self-distance blocks) engages the triangle-gated kernel — half the
    K_nu work, bit-identical output; a no-op on the XLA path."""
    if pallas:
        from cokriging_tpu.kernels.pallas_ops import matern_correlation_pallas

        m = matern_correlation_pallas(nu, ls, h, symmetric=symmetric)
    else:
        m = _matern_corr_raw(nu, ls, h)
    out = scale * m
    return out + jnp.where(jnp.asarray(h) == 0.0, nugget, jnp.zeros_like(out))


def _scaled_matern_nh_bwd(res, ct, symmetric: bool = False):
    """Chunked reverse pass for a whole covariance block, scalars only.

    Keeping the scale/nugget prefactors *outside* the chunked correlation
    VJP forces AD to rematerialize the full M block per parameter (a
    matrix-sized fusion per block per parameter: +8 GB at the n~25k NLL,
    measured). Folding them in makes every cotangent a scalar, so the
    backward is one fori_loop over input slices with a 4-scalar carry.
    """
    scale, nugget, nu, ls, h = res
    shape = h.shape
    if _use_pallas_scaled(scale, nugget, nu, ls, h):
        from cokriging_tpu.kernels.pallas_ops import matern_block_grad_pallas

        gs, gn, gnu, gls = matern_block_grad_pallas(
            scale, nugget, nu, ls, h, ct, symmetric=symmetric
        )
        return (
            gs.astype(scale.dtype), gn.astype(nugget.dtype),
            gnu.astype(nu.dtype), gls.astype(ls.dtype),
            jnp.zeros(shape, h.dtype),
        )
    n = h.size
    hf = jnp.ravel(h)
    ctf = jnp.ravel(jnp.asarray(ct))
    chunk = min(n, BWD_CHUNK_ELEMS) or 1

    def grads_of(hc, cc):
        out, vjp = jax.vjp(
            lambda s, t, a, b: _scaled_matern_raw(s, t, a, b, hc),
            scale, nugget, nu, ls,
        )
        return vjp(cc.astype(out.dtype))

    n_full = (n // chunk) * chunk
    zeros = (
        jnp.zeros_like(scale), jnp.zeros_like(nugget),
        jnp.zeros_like(nu), jnp.zeros_like(ls),
    )
    if n_full >= chunk:

        def body(k, carry):
            hc = jax.lax.dynamic_slice(hf, (k * chunk,), (chunk,))
            cc = jax.lax.dynamic_slice(ctf, (k * chunk,), (chunk,))
            return jax.tree.map(jnp.add, carry, grads_of(hc, cc))

        acc = jax.lax.fori_loop(0, n // chunk, body, zeros)
    else:
        acc = zeros
    if n - n_full:
        acc = jax.tree.map(
            jnp.add, acc, grads_of(hf[n_full:], ctf[n_full:])
        )
    return (*acc, jnp.zeros(shape, h.dtype))


def _use_pallas_scaled(scale, nugget, nu, ls, h) -> bool:
    """Forward gate for the fused kernels: the matrix gate plus f32
    *parameters* — f64 params with f32 distances must take the promoting
    XLA path (plain AD does), not silently downcast through the f32-only
    Pallas kernel. The backward gate applies the same rule."""
    return _use_pallas(h) and jnp.result_type(scale, nugget, nu, ls) == jnp.float32


def _make_scaled_cvjp(symmetric: bool):
    """custom_vjp for one whole covariance block with scalar-only
    cotangents (see _scaled_matern_nh_bwd). ``symmetric=True`` is the
    marginal self-distance variant: on the TPU f32 Pallas path both the
    forward assembly and the backward evaluate only tiles touching the
    lower triangle — half the K_nu work; off the Pallas path it is the
    identical full evaluation (bit-identical because h is symmetric)."""

    def primal(scale, nugget, nu, ls, h):
        return _scaled_matern_raw(
            scale, nugget, nu, ls, h,
            pallas=_use_pallas_scaled(scale, nugget, nu, ls, h),
            symmetric=symmetric,
        )

    cvjp = jax.custom_vjp(primal)
    cvjp.defvjp(
        lambda scale, nugget, nu, ls, h: (
            primal(scale, nugget, nu, ls, h),
            (scale, nugget, nu, ls, h),
        ),
        lambda res, ct: _scaled_matern_nh_bwd(res, ct, symmetric=symmetric),
    )
    return cvjp


_scaled_matern_cvjp_nh = _make_scaled_cvjp(symmetric=False)
_scaled_matern_cvjp_nh_sym = _make_scaled_cvjp(symmetric=True)


def matern_correlation(nu, len_scale, h, h_grad: bool = True):
    r"""Matern correlation :math:`\rho(h)` in log space (src/model.py:354-385).

    .. math::
        \rho(h) = \frac{2^{1-\nu}}{\Gamma(\nu)}
                  (\sqrt{2\nu} h/\ell)^{\nu} K_\nu(\sqrt{2\nu} h/\ell)

    h == 0 maps to 1 exactly; non-finite intermediate values map to 0
    (far-field underflow for large nu); result clamped to [0, inf).

    Differentiable in all arguments. For scalar nu/len_scale the reverse
    pass runs through an explicitly chunked custom VJP
    (_matern_corr_cvjp_bwd) so NLL/WLS gradients over large distance
    matrices stay memory-bounded. ``h_grad=False`` additionally drops the
    h-cotangent computation (_matern_corr_nh_bwd) — the right call when h
    is data, which saves several matrix-sized backward buffers at large n.
    """
    h = jnp.asarray(h)
    if not jnp.issubdtype(h.dtype, jnp.floating):
        h = h.astype(jnp.result_type(float))
    nu = jnp.asarray(nu)
    len_scale = jnp.asarray(len_scale)
    if nu.ndim == 0 and len_scale.ndim == 0:
        fn = _matern_corr_cvjp if h_grad else _matern_corr_cvjp_nh
        return fn(nu, len_scale, h)
    return _matern_corr_raw(nu, len_scale, h)


def correlation(params: MaternParams, i: int, j: int, h, h_grad: bool = True):
    """Pairwise Matern correlation M_ij(h) (src/model.py:188-191)."""
    return matern_correlation(
        params.nu[i, j], params.len_scale[i, j], h, h_grad=h_grad
    )


def covariance(
    params: MaternParams, i: int, h, use_nugget: bool = True,
    h_grad: bool = True, symmetric: bool = False,
):
    """Marginal covariance of process i; nugget only at h == 0
    (src/model.py:193-197).

    ``h_grad=False`` evaluates the whole block (scale, nugget included)
    through the chunk-bounded scalar-cotangent VJP — see
    _scaled_matern_nh_bwd for why the prefactors must live inside it.
    ``symmetric=True`` promises h is a square SYMMETRIC matrix (true for
    any self-distance block) and halves the TPU Pallas K_nu work on the
    h_grad=False path; output is bit-identical.
    """
    if not h_grad:
        nugget = params.nugget[i] if use_nugget else jnp.zeros_like(
            params.nugget[i]
        )
        fn = _scaled_matern_cvjp_nh_sym if symmetric else _scaled_matern_cvjp_nh
        return fn(
            params.sigma[i] ** 2, nugget,
            params.nu[i, i], params.len_scale[i, i], jnp.asarray(h),
        )
    cov = params.sigma[i] ** 2 * correlation(params, i, i, h)
    if use_nugget:
        cov = cov + jnp.where(jnp.asarray(h) == 0.0, params.nugget[i], 0.0)
    return cov


def cross_covariance(
    params: MaternParams, i: int, j: int, h, h_grad: bool = True
):
    """Cross-covariance between processes i and j (src/model.py:199-207)."""
    scale = params.rho[i, j] * params.sigma[i] * params.sigma[j]
    if not h_grad:
        return _scaled_matern_cvjp_nh(
            scale, jnp.zeros_like(scale),
            params.nu[i, j], params.len_scale[i, j], jnp.asarray(h),
        )
    return scale * correlation(params, i, j, h)


def semivariance(params: MaternParams, i: int, h):
    """Marginal semivariogram (src/model.py:209-213)."""
    return (
        params.sigma[i] ** 2 * (1.0 - correlation(params, i, i, h))
        + params.nugget[i]
    )


def cross_semivariance(params: MaternParams, i: int, j: int, h):
    """Cross-semivariogram = sill - C_ij(h) (src/model.py:215-222).

    The sill is the pair sill 0.5 (C_ii(0) + C_jj(0)). For p = 2 (the only
    case the reference exercises) this equals the reference's sum over the
    whole sigma/nugget matrix; for p > 2 the pair sill is the statistically
    correct generalization (the reference's bivariate-only nanprod/nansum
    tricks do not extend)."""
    sill = 0.5 * (
        params.sigma[i] ** 2
        + params.nugget[i]
        + params.sigma[j] ** 2
        + params.nugget[j]
    )
    return sill - cross_covariance(params, i, j, h)


def variogram_value(params: MaternParams, i: int, j: int, h, covariogram=False):
    """Theoretical (cross-)variogram of the given kind (src/model.py:224-237)."""
    if covariogram:
        if i == j:
            return covariance(params, i, h)
        return cross_covariance(params, i, j, h)
    if i == j:
        return semivariance(params, i, h)
    return cross_semivariance(params, i, j, h)


# jitted entry for host-facing curve evaluation: un-jitted K_nu on a
# remote-TPU backend executes EAGERLY — hundreds of per-primitive
# dispatches through the tunnel, ~40 s for one 100-point curve (measured
# in the flagship comparison); one compiled (and persistently cached)
# program per (i, j, kind) makes it milliseconds
_variogram_value_jit = jax.jit(
    variogram_value, static_argnums=(1, 2), static_argnames=("covariogram",)
)


def gathered_covariance(params: MaternParams, d, procs_a, procs_b=None):
    """Pointwise mixed-process covariance from gathered process ids.

    Entry (a, b) applies the reference's conventions to the process pair
    (procs_a[a], procs_b[b]) at distance d[a, b]: sigma_i^2 M_ii for same-
    process pairs with the nugget on exact-zero distances, and
    rho_ij sigma_i sigma_j M_ij across processes (src/model.py:193-207).

    This is the single gather-indexed formulation shared by the matrix-
    free CG matvec (predict.iterative) and the direct-assembly local
    predictor (predict.local, materialize_cov=False);
    ``windows_covariance`` is the batched symmetric-window variant
    (Vecchia) and ``block_covariance`` the block-structured counterpart
    for process-sorted stacks. Broadcasts over leading batch dimensions.
    The Matern correlations route through ``matern_corr_pairs``: large
    f32 TPU tiles take the fused Pallas pair kernels (the CG matvec's
    (block, N) rows qualify), small/f64 shapes the plain elementwise
    path — identical values either way.
    """
    if procs_b is None:
        procs_b = procs_a
    d = jnp.asarray(d)
    pa = procs_a[..., :, None]
    pb = procs_b[..., None, :]
    same = pa == pb
    sig = params.sigma

    p = params.n_procs
    pair_list = [(i, j) for i in range(p) for j in range(i, p)]
    table = np.zeros((p, p), np.int32)
    for k, (i, j) in enumerate(pair_list):
        table[i, j] = table[j, i] = k
    idx = jnp.broadcast_to(jnp.asarray(table)[pa, pb], d.shape)
    nu_pairs = jnp.stack([params.nu[i, j] for i, j in pair_list])
    ls_pairs = jnp.stack([params.len_scale[i, j] for i, j in pair_list])
    corr = matern_corr_pairs(nu_pairs, ls_pairs, idx.astype(d.dtype), d)

    amp = jnp.where(
        same, sig[pa] ** 2, params.rho[pa, pb] * sig[pa] * sig[pb]
    )
    return amp * corr + jnp.where(
        same & (d == 0.0), params.nugget[pa], 0.0
    )


def _use_pallas_pairs(nu_pairs, ls_pairs, h) -> bool:
    """Trace-time gate for the gathered-pairs Pallas kernels: TPU backend,
    f32 data AND parameters, enough entries to amortize the tile grid, and
    few enough distinct pairs for the kernel's static select unroll."""
    from cokriging_tpu.kernels.pallas_ops import MAX_PAIRS

    return (
        h.dtype == jnp.float32
        and jnp.result_type(nu_pairs, ls_pairs) == jnp.float32
        and h.size >= (1 << 17)
        and nu_pairs.shape[0] <= MAX_PAIRS
        and jax.default_backend() == "tpu"
    )


@jax.custom_vjp
def _matern_corr_pairs_cvjp(nu_pairs, ls_pairs, idx_f, h):
    from cokriging_tpu.kernels.pallas_ops import matern_corr_pairs_pallas

    return matern_corr_pairs_pallas(nu_pairs, ls_pairs, idx_f, h)


def _matern_corr_pairs_bwd(res, ct):
    from cokriging_tpu.kernels.pallas_ops import matern_corr_pairs_grad_pallas

    nu_pairs, ls_pairs, idx_f, h = res
    g_nu, g_ls = matern_corr_pairs_grad_pallas(nu_pairs, ls_pairs, idx_f, h, ct)
    return (
        g_nu.astype(nu_pairs.dtype),
        g_ls.astype(ls_pairs.dtype),
        jnp.zeros_like(idx_f),
        jnp.zeros_like(h),
    )


_matern_corr_pairs_cvjp.defvjp(
    lambda nu_pairs, ls_pairs, idx_f, h: (
        _matern_corr_pairs_cvjp(nu_pairs, ls_pairs, idx_f, h),
        (nu_pairs, ls_pairs, idx_f, h),
    ),
    _matern_corr_pairs_bwd,
)


def matern_corr_pairs(nu_pairs, ls_pairs, idx_f, h):
    """Matern correlation over gathered entries whose (nu, len_scale) take
    one of ``n_pairs`` values, selected per entry by the float index plane
    ``idx_f`` (0.0 .. n_pairs-1.0).

    On the TPU f32 fast path this runs the fused Pallas pair kernels
    (VMEM-resident Temme/CF2 with per-entry order; backward contracts the
    cotangent to per-pair scalars in place — kernels/pallas_ops.py);
    elsewhere it selects per-entry parameters and evaluates the plain
    elementwise correlation under ordinary AD. Differentiable in
    nu_pairs/ls_pairs; idx_f and h are data (zero cotangent).
    """
    nu_pairs = jnp.asarray(nu_pairs)
    ls_pairs = jnp.asarray(ls_pairs)
    h = jnp.asarray(h)
    if _use_pallas_pairs(nu_pairs, ls_pairs, h):
        return _matern_corr_pairs_cvjp(nu_pairs, ls_pairs, idx_f, h)
    nu_e = nu_pairs[0]
    ls_e = ls_pairs[0]
    for k in range(1, nu_pairs.shape[0]):
        in_k = idx_f == float(k)
        nu_e = jnp.where(in_k, nu_pairs[k], nu_e)
        ls_e = jnp.where(in_k, ls_pairs[k], ls_e)
    return _matern_corr_raw(nu_e, ls_e, h)


def windows_covariance(params: MaternParams, d, procs, mvar=None):
    """Batched mixed-process covariance over symmetric gathered windows.

    Same per-entry conventions as ``gathered_covariance`` (nugget on
    exact-zero same-process distances, rho sigma_a sigma_b cross
    amplitude; src/model.py:193-207), specialized to a BATCH of square
    symmetric distance windows (..., w, w) — the Vecchia term layout
    (estimate/vecchia.py). Only the lower triangle of each window is
    evaluated (the windows are symmetric: d[a, i, j] == d[a, j, i]), and
    the Matern correlations route through ``matern_corr_pairs`` — on TPU
    f32 a fused Pallas kernel, ~1.91x less K_nu work than the full-window
    gathered path on top of its VMEM-residency win.

    Args:
        params: MaternParams for p processes.
        d: (..., w, w) symmetric per-window distance matrices.
        procs: (..., w) int process ids of each window slot.
        mvar: optional (..., w) per-slot measurement-error variances
            added to window diagonals.

    Returns:
        (..., w, w) covariance windows.
    """
    d = jnp.asarray(d)
    w = d.shape[-1]
    p = params.n_procs
    pair_list = [(i, j) for i in range(p) for j in range(i, p)]
    table = np.zeros((p, p), np.int32)
    for k, (i, j) in enumerate(pair_list):
        table[i, j] = table[j, i] = k
    pt = jnp.asarray(table)

    pa = procs[..., :, None]
    pb = procs[..., None, :]
    same = pa == pb
    idx = pt[pa, pb]

    nu_pairs = jnp.stack([params.nu[i, j] for i, j in pair_list])
    ls_pairs = jnp.stack([params.len_scale[i, j] for i, j in pair_list])

    ti, tj = np.tril_indices(w)
    d_t = d[..., ti, tj]
    idx_t = idx[..., ti, tj].astype(d.dtype)
    corr_t = matern_corr_pairs(nu_pairs, ls_pairs, idx_t, d_t)
    low = jnp.zeros_like(d).at[..., ti, tj].set(corr_t)
    eye = jnp.eye(w, dtype=d.dtype)
    corr = low + jnp.swapaxes(low, -1, -2) - low * eye

    sig = params.sigma
    amp = jnp.where(same, sig[pa] ** 2, params.rho[pa, pb] * sig[pa] * sig[pb])
    cov = amp * corr + jnp.where(same & (d == 0.0), params.nugget[pa], 0.0)
    if mvar is not None:
        cov = cov + mvar[..., None] * eye
    return cov


def joint_covariance_from_coords(
    params: MaternParams, coords_tuple, geodesic, use_pallas: bool = False
):
    """One jit'd program: cross-distance blocks + joint block covariance.

    Eager assembly dispatches hundreds of small ops through the device
    relay (seconds of pure latency on remote TPU); this fuses the whole
    build into a single call.

    ``use_pallas=True`` evaluates the Matern correlations through the
    fused VMEM kernel (kernels.pallas_ops) — forward-only, f32, TPU;
    ~4.5x faster than the XLA path for large matrices.
    """
    if use_pallas:
        from cokriging_tpu.estimate.nll import joint_distance_blocks

        dists = joint_distance_blocks(list(coords_tuple), geodesic=geodesic)
        return block_covariance_pallas(params, dists)
    return _joint_cov_impl(params, tuple(coords_tuple), bool(geodesic))


def block_covariance_pallas(params: MaternParams, dists):
    """Joint block covariance with Matern correlations evaluated by the
    fused Pallas kernel (forward-only; for prediction/simulation paths on
    TPU at f32). Same conventions as ``block_covariance``."""
    from cokriging_tpu.kernels.pallas_ops import matern_correlation_pallas

    p = params.n_procs
    blocks = {}
    for i in range(p):
        for j in range(p):
            if i <= j:
                h = dists[i][j]
                m = matern_correlation_pallas(
                    params.nu[i, j], params.len_scale[i, j], h,
                    symmetric=(i == j),
                )
                if i == j:
                    blocks[(i, j)] = params.sigma[i] ** 2 * m + jnp.where(
                        jnp.asarray(h) == 0.0, params.nugget[i], 0.0
                    )
                else:
                    blocks[(i, j)] = (
                        params.rho[i, j] * params.sigma[i] * params.sigma[j] * m
                    )
            else:
                blocks[(i, j)] = blocks[(j, i)].T
    return jnp.block([[blocks[(i, j)] for j in range(p)] for i in range(p)])


@partial(jax.jit, static_argnames=("geodesic",))
def _joint_cov_impl(params, coords_tuple, geodesic):
    from cokriging_tpu.estimate.nll import joint_distance_blocks

    dists = joint_distance_blocks(list(coords_tuple), geodesic=geodesic)
    return block_covariance(params, dists)


def block_covariance(params: MaternParams, dists, h_grad: bool = True):
    """Assemble the joint block covariance for p processes.

    Args:
        params: MaternParams for p processes.
        dists: (p, p) nested list (or dict-like indexable) where
            dists[i][j] is the (n_i, n_j) distance matrix between the
            observation sets of processes i and j; only i <= j entries
            are read (lower blocks are transposes, as in
            src/joint_prediction.py:124-153).
        h_grad: pass ``False`` when the distances are data (not
            differentiated) to skip the matrix-sized h-cotangent buffers
            in the reverse pass (see matern_correlation).

    Returns:
        (sum n_i, sum n_i) joint covariance (nugget on exact-zero
        distances of the marginal blocks).
    """
    p = params.n_procs
    blocks = {}
    for i in range(p):
        for j in range(p):
            if i <= j:
                h = dists[i][j]
                if i == j:
                    # marginal blocks are self-distance matrices —
                    # symmetric by construction, so the TPU path may
                    # evaluate the lower triangle only
                    blocks[(i, j)] = covariance(
                        params, i, h, h_grad=h_grad, symmetric=True
                    )
                else:
                    blocks[(i, j)] = cross_covariance(
                        params, i, j, h, h_grad=h_grad
                    )
            else:
                blocks[(i, j)] = blocks[(j, i)].T
    return jnp.block([[blocks[(i, j)] for j in range(p)] for i in range(p)])


class MultivariateMatern:
    """OO surface mirroring the reference model class (src/model.py:173-317).

    Stateless math delegates to the module functions; ``fit`` delegates to
    ``cokriging_tpu.estimate.wls.fit_wls``.
    """

    def __init__(self, n_procs: int = None, params: MaternParams = None) -> None:
        if n_procs is None:
            n_procs = params.n_procs if params is not None else 2
        self.n_procs = n_procs
        self.params = params if params is not None else MaternParams.default(n_procs)
        if self.params.n_procs != n_procs:
            raise ValueError(
                f"params are for {self.params.n_procs} processes, "
                f"n_procs={n_procs} requested."
            )
        self.fit_result = None

    def correlation(self, i, j, h):
        return correlation(self.params, i, j, h)

    def covariance(self, i, h, use_nugget: bool = True):
        return covariance(self.params, i, h, use_nugget=use_nugget)

    def cross_covariance(self, i, j, h):
        return cross_covariance(self.params, i, j, h)

    def semivariance(self, i, h):
        return semivariance(self.params, i, h)

    def cross_semivariance(self, i, j, h):
        return cross_semivariance(self.params, i, j, h)

    def set_values(self, x):
        self.params = self.params.with_flat(jnp.asarray(x))
        return self

    def get_values(self):
        return np.asarray(self.params.to_flat())

    def variograms(self, h, kind: str = "semivariogram"):
        """Theoretical variogram curves for all i <= j pairs as a DataFrame
        (multi-index (i, j, idx), columns distance/variogram), matching
        src/model.py:239-247."""
        import pandas as pd

        cov = kind == "covariogram"
        frames = []
        h = jnp.asarray(h)
        for i in range(self.n_procs):
            for j in range(self.n_procs):
                if i <= j:
                    v = np.asarray(
                        _variogram_value_jit(
                            self.params, i, j, h, covariogram=cov
                        )
                    )
                    df = pd.DataFrame(
                        {"distance": np.asarray(h), "variogram": v, "i": i, "j": j}
                    )
                    frames.append(df.set_index(["i", "j", df.index]))
        return pd.concat(frames)

    def fit(self, estimate, guess: MaternParams = None, method: str = "scipy"):
        """Composite-WLS fit to an EmpiricalVariogram; see estimate.wls."""
        from cokriging_tpu.estimate.wls import fit_wls

        self.params, self.fit_result = fit_wls(
            estimate, self.params if guess is None else guess, method=method
        )
        return self
