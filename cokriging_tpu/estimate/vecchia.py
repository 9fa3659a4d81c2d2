"""Vecchia approximation of the multivariate Gaussian NLL.

The exact likelihood (estimate/nll.py) factorizes the joint density over a
single N x N Cholesky — O(N^2) memory, O(N^3) flops, practical to N ~ 25k
on one chip. The Vecchia approximation (Vecchia 1988; Katzfuss & Guinness
2021) replaces each conditional in the telescoping product

    p(z) = prod_i p(z_i | z_1, ..., z_{i-1})

with conditioning on only the m nearest *previous* observations in a
maxmin ordering:

    p(z) ~= prod_i p(z_i | z_{N(i)}),   |N(i)| <= m.

Every term is one (m+1) x (m+1) Cholesky — N independent tiny dense
factorizations, i.e. a batched vmap workload that maps straight onto the
MXU. Cost is O(N m^3) flops and O(N m) memory: linear in N, so this
estimator extends the exact-NLL axis from n ~ 25k to millions of
observations. With m = N-1 the product is exact for ANY ordering, which is
the oracle test (tests/test_vecchia.py).

The reference has no likelihood estimator at all (SURVEY.md section 2:
WLS on empirical variograms is its only fitting path); this module is
the scalable companion to the exact NLL the rebuild added. The
multivariate extension conditions across processes: all p processes'
observations are stacked, maxmin-ordered jointly, and each conditioning
set may mix processes (the (a, b) entry of a term covariance is the
bivariate-Matern cross-covariance with the reference's conventions —
nugget on exact-zero marginal distances, rho sigma_a sigma_b cross
amplitude; src/model.py:193-207).

TPU design notes:
- ordering: exact maxmin is a jittable fori_loop with scalar carries —
  N sequential steps, so wall-clock-linear in N (~100 s at 80k); above
  20k points the auto default is coarse_to_fine_order, an O(N log N)
  host-side nested-grid decimation with the same coarse-first structure
  (~3 s at N = 1M);
- neighbor search: exact blocked masked top-k on device to ~1e5; above,
  nearest_previous_neighbors_kd (doubling-block kd-trees, O(N log N)
  host);
- the NLL scans fixed-size term chunks; each chunk is processed BATCHED,
  gathering only the lower triangle of its symmetric (m+1)-wide windows,
  with the Matern correlations routed through the gathered-pairs Pallas
  kernels on the TPU f32 path (kernels/pallas_ops.py) and the
  conditional read off the LAST component of the whitened vector
  u = L^{-1} z (for the ordering [neighbors, self],
  -2 log p(z_i | nbrs) = u_m^2 + 2 log L_mm + log 2pi);
- masked lanes (terms with fewer than m predecessors) are identity
  rows/columns with z = 0, contributing nothing to u_m;
- measured (examples/vecchia_scaling.py, m=20, f32, one v5e chip): warm
  value+grad 3.9 s at 100k terms, 18.4 s at 500k, 37.0 s at 1M — the
  linear axis holds to a million observations.
"""

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cokriging_tpu.cov.params import MaternParams, ParamSpec
from cokriging_tpu.kernels.distance import haversine_matrix, euclidean_matrix


def _dist(a, b, geodesic):
    return haversine_matrix(a, b) if geodesic else euclidean_matrix(a, b)


# ---------------------------------------------------------------------------
# maxmin ordering
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("geodesic",))
def _maxmin_order_program(coords, geodesic):
    n = coords.shape[0]
    centroid = jnp.mean(coords, axis=0, keepdims=True)
    d0 = _dist(centroid, coords, geodesic)[0]
    first = jnp.argmin(d0)

    def body(k, carry):
        order, mindist = carry
        prev = order[k - 1]
        drow = _dist(coords[prev][None, :], coords, geodesic)[0]
        mindist = jnp.minimum(mindist, drow)
        nxt = jnp.argmax(mindist).astype(jnp.int32)
        order = order.at[k].set(nxt)
        return order, mindist

    order0 = jnp.zeros(n, jnp.int32).at[0].set(first.astype(jnp.int32))
    mind0 = jnp.full(n, jnp.inf, coords.dtype).at[first].set(-jnp.inf)

    def body_masked(k, carry):
        order, mindist = body(k, carry)
        # freeze already-selected points at -inf so they are never re-picked
        return order, mindist.at[order[k]].set(-jnp.inf)

    order, _ = jax.lax.fori_loop(1, n, body_masked, (order0, mind0))
    return order


def maxmin_order(coords, geodesic: bool = True) -> np.ndarray:
    """Maxmin (farthest-point) permutation: start near the centroid, then
    repeatedly pick the point farthest from all previously picked points.
    The standard Vecchia ordering (Guinness 2018) — early points spread
    coarsely over the domain so later conditioning sets are informative.

    Exact but sequential: N fori_loop steps of O(N) work (~100 s at
    N = 80k on one chip, latency-bound). For large N use
    ``coarse_to_fine_order`` — O(N log N) host-side with the same
    coarse-first structure."""
    return np.asarray(_maxmin_order_program(jnp.asarray(coords), geodesic))


def _sphere_embed(coords):
    """[lat, lon] degrees -> 3-D unit-sphere points. Chordal distance is
    monotone in great-circle distance, so nearest-neighbor SETS under the
    Euclidean kd-tree metric match the haversine ones exactly."""
    c = np.asarray(coords, np.float64)
    lat = np.deg2rad(c[:, 0])
    lon = np.deg2rad(c[:, 1])
    cl = np.cos(lat)
    return np.column_stack([cl * np.cos(lon), cl * np.sin(lon), np.sin(lat)])


def coarse_to_fine_order(coords, geodesic: bool = True, seed: int = 0) -> np.ndarray:
    """Approximate maxmin permutation by nested-grid decimation, O(N log N).

    Level l hashes points to a grid of cell size domain/2^l and appends one
    random representative per newly-resolved cell (randomly shuffled within
    the level). Early points are spread coarsely over the domain — the
    property maxmin ordering exists to provide (Guinness 2018 shows Vecchia
    accuracy is driven by this coarse-to-fine structure, not the exact
    farthest-point choice) — at host-side hashing cost instead of the exact
    algorithm's N sequential device steps. Duplicate coordinates (which no
    grid refinement can separate) are appended shuffled once the cell size
    reaches ~1e-9 of the domain.
    """
    pts = _sphere_embed(coords) if geodesic else np.asarray(coords, np.float64)
    n = pts.shape[0]
    rng = np.random.default_rng(seed)
    lo = pts.min(axis=0)
    span = float((pts.max(axis=0) - lo).max()) or 1.0
    centroid = pts.mean(axis=0)
    first = int(np.argmin(((pts - centroid) ** 2).sum(axis=1)))
    remaining = np.ones(n, bool)
    remaining[first] = False
    chunks = [np.array([first], np.int64)]
    for level in range(31):
        if not remaining.any():
            break
        cells = np.floor((pts - lo) / span * (1 << level)).astype(np.int64)
        key = cells[:, 0]
        for d in range(1, cells.shape[1]):
            key = key * 2097169 + cells[:, d]  # prime-mixed row hash
        # cells already containing a picked point are covered at this
        # resolution; only uncovered cells get a (random) representative
        covered = np.unique(key[~remaining])
        idx = np.flatnonzero(remaining)
        kr = key[idx]
        open_cell = ~np.isin(kr, covered)
        idx, kr = idx[open_cell], kr[open_cell]
        if idx.size:
            order = np.lexsort((rng.random(idx.size), kr))
            ko = kr[order]
            first_in_cell = np.ones(order.size, bool)
            first_in_cell[1:] = ko[1:] != ko[:-1]
            picked = idx[order[first_in_cell]]
            rng.shuffle(picked)
            chunks.append(picked)
            remaining[picked] = False
    if remaining.any():  # exact-duplicate coordinates
        dup = np.flatnonzero(remaining)
        rng.shuffle(dup)
        chunks.append(dup)
    out = np.concatenate(chunks)
    assert out.size == n
    return out


# ---------------------------------------------------------------------------
# nearest previous neighbors under an ordering
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("m", "geodesic", "block"))
def _neighbors_program(coords_ord, m, geodesic, block):
    n = coords_ord.shape[0]
    n_blocks = -(-n // block)
    pad = n_blocks * block - n
    rows = jnp.concatenate(
        [jnp.arange(n), jnp.zeros(pad, jnp.int32)]
    ).reshape(n_blocks, block)

    def one_block(r):
        c = coords_ord[r]
        d = _dist(c, coords_ord, geodesic)
        # strictly-previous mask: column index < global row index
        prev = jnp.arange(n)[None, :] < r[:, None]
        score = jnp.where(prev, d, jnp.inf)
        neg, idx = jax.lax.top_k(-score, m)
        return idx.astype(jnp.int32), jnp.isfinite(-neg)

    idxs, masks = jax.lax.map(one_block, rows)
    return idxs.reshape(-1, m)[:n], masks.reshape(-1, m)[:n]


def nearest_previous_neighbors(
    coords_ord, m: int, geodesic: bool = True, block: int = 512
) -> Tuple[np.ndarray, np.ndarray]:
    """(n, m) indices of each point's m nearest predecessors in the
    ordering, plus a validity mask (early points have fewer than m).

    Exact blocked masked top-k on device: O(N^2 / block) passes — right up
    to N ~ 1e5; use ``nearest_previous_neighbors_kd`` past that."""
    idx, mask = _neighbors_program(jnp.asarray(coords_ord), m, geodesic, block)
    return np.asarray(idx), np.asarray(mask)


def nearest_previous_neighbors_kd(
    coords_ord,
    m: int,
    geodesic: bool = True,
    exact_prefix: int = 4096,
) -> Tuple[np.ndarray, np.ndarray]:
    """kd-tree nearest-previous-neighbor search, O(N log N) host-side.

    The first ``exact_prefix`` rows use the exact device top-k (their
    predecessors are the sparse coarse levels any local tree query
    misses). Later rows are processed in DOUBLING blocks [B, 2B): a
    kd-tree over the prefix [0, B) — all guaranteed predecessors — serves
    the m nearest prefix points, and a small global query (m+1 nearest
    overall, filtered to index < row) recovers close same-block
    predecessors (e.g. a colocated cross-process partner adjacent in the
    ordering); the merged candidate set's m closest win. Geodesic
    coordinates use the 3-D sphere embedding (chordal distance is
    order-isomorphic to great-circle, so nearest SETS match haversine's).

    Same-block predecessors beyond the global m+1 nearest can be missed —
    a conditioning-set approximation, not an error (any predecessor
    subset yields a valid Vecchia likelihood; Katzfuss & Guinness 2021
    §2.2); with doubling blocks the affected fraction shrinks as the
    prefix grows, and the NLL-quality test pins the aggregate effect.
    """
    from scipy.spatial import cKDTree

    coords_ord = np.asarray(coords_ord)
    n = coords_ord.shape[0]
    pts = _sphere_embed(coords_ord) if geodesic else np.asarray(
        coords_ord, np.float64
    )
    nbr = np.zeros((n, m), np.int32)
    mask = np.zeros((n, m), bool)

    # exact prefix, brute-force in numpy: chordal distance is
    # order-isomorphic to great-circle, so argsort matches the haversine
    # top-k exactly. Host-side on purpose — a device program here would
    # pay a fresh remote compile per (prefix, m) shape on the TPU tunnel,
    # which dwarfs the O(prefix^2) flops (measured minutes vs ~0.2 s).
    p = min(n, max(exact_prefix, m + 1))
    for i in range(1, p):
        d2 = ((pts[:i] - pts[i]) ** 2).sum(axis=1)
        k = min(i, m)
        best = np.argpartition(d2, k - 1)[:k] if k < i else np.arange(i)
        best = best[np.argsort(d2[best], kind="stable")]
        nbr[i, :k] = best
        mask[i, :k] = True
    if p >= n:
        return nbr, mask

    tree_all = cKDTree(pts)
    col = np.arange(m)[None, :]
    b = p
    while b < n:
        hi = min(n, 2 * b)
        rows = np.arange(b, hi)
        tree_b = cKDTree(pts[:b])
        k_b = min(m, b)
        _, ii_b = tree_b.query(pts[rows], k=k_b, workers=-1)
        ii_b = ii_b.reshape(rows.size, k_b)
        _, ii_g = tree_all.query(pts[rows], k=m + 1, workers=-1)
        ii_g = ii_g.reshape(rows.size, m + 1)
        cand = np.concatenate([ii_b, ii_g], axis=1)
        valid = cand < rows[:, None]
        d2 = ((pts[cand] - pts[rows][:, None, :]) ** 2).sum(axis=-1)
        d2 = np.where(valid, d2, np.inf)
        # drop duplicate candidates (global hits already in the prefix set)
        o = np.argsort(cand, axis=1, kind="stable")
        c_sorted = np.take_along_axis(cand, o, axis=1)
        dup_sorted = np.zeros_like(valid)
        dup_sorted[:, 1:] = c_sorted[:, 1:] == c_sorted[:, :-1]
        dup = np.zeros_like(valid)
        np.put_along_axis(dup, o, dup_sorted, axis=1)
        d2 = np.where(dup, np.inf, d2)
        sel = np.argsort(d2, axis=1, kind="stable")[:, :m]
        nbr_rows = np.take_along_axis(cand, sel, axis=1)
        msk = np.isfinite(np.take_along_axis(d2, sel, axis=1))
        nbr[rows] = np.where(msk, nbr_rows, 0).astype(np.int32)
        mask[rows] = msk
        b = hi
    return nbr, mask


# ---------------------------------------------------------------------------
# the Vecchia NLL
# ---------------------------------------------------------------------------


def _term_windows(coords_ord, values_ord, procs_ord, mvar_ord, nbr, nbr_mask):
    """Gather the per-term (m+1)-wide windows: [neighbors..., self].

    Pure numpy (host scaffold prep): device fancy-gathers here would pay
    a fresh remote compile per shape on the TPU tunnel; the arrays go to
    device once, as the finished window tensors.
    """
    coords_ord = np.asarray(coords_ord)
    values_ord = np.asarray(values_ord)
    procs_ord = np.asarray(procs_ord)
    nbr = np.asarray(nbr)
    nbr_mask = np.asarray(nbr_mask)
    n, m = nbr.shape
    self_idx = np.arange(n, dtype=nbr.dtype)[:, None]
    idx = np.concatenate([nbr, self_idx], axis=1)  # (n, m+1)
    mask = np.concatenate([nbr_mask, np.ones((n, 1), bool)], axis=1)
    win_coords = coords_ord[idx]  # (n, m+1, 2)
    win_z = np.where(mask, values_ord[idx], 0.0).astype(values_ord.dtype)
    win_p = procs_ord[idx]  # (n, m+1)
    if mvar_ord is None:
        mvar_ord = np.zeros(n, values_ord.dtype)
    win_mv = np.asarray(mvar_ord)[idx]
    return (
        jnp.asarray(win_coords),
        jnp.asarray(win_z),
        jnp.asarray(win_p),
        jnp.asarray(win_mv),
        jnp.asarray(mask),
    )


def _chunk_nll(flat, spec, win, geodesic):
    """Sum of -2 log p(z_i | nbrs) contributions over one chunk of terms.

    Batched (not vmapped) over the chunk so the Matern evaluation sees the
    whole chunk's gathered windows at once: cov.matern.windows_covariance
    evaluates only the lower triangle of each symmetric window and, on the
    TPU f32 path, routes the K_nu work through the fused Pallas pair
    kernels (kernels/pallas_ops.py) — the restructure that took one warm
    80k-term value+grad from 32 s to seconds (VERDICT r2 item 1). The
    tiny (m+1)^3 factorizations stay on XLA's batched cholesky.
    """
    params = MaternParams.from_flat(flat, spec=spec)
    coords, z, procs, mvar, mask = win
    m1 = z.shape[-1]

    from cokriging_tpu.cov.matern import windows_covariance
    from cokriging_tpu.kernels.bessel import log_precise

    d = jax.vmap(lambda c: _dist(c, c, geodesic))(coords)
    # mixed-process conventions (nugget on exact-zero same-process
    # distances, rho sigma_a sigma_b cross amplitude) live in ONE place
    cov = windows_covariance(params, d, procs, mvar)
    # identity lanes for masked (absent) neighbors
    m2 = mask[..., :, None] & mask[..., None, :]
    eye = jnp.eye(m1, dtype=cov.dtype)
    cov = jnp.where(m2, cov, eye)
    # Non-PD parameter points must yield a finite penalty AND finite
    # gradients. Selecting after the fact is not enough: even with a
    # zero cotangent, cholesky's VJP computes with its NaN primal
    # (0 * nan = nan), which poisons L-BFGS curvature memory and
    # silently stalls fits near their init. So: detect badness on a
    # stop_gradient probe, then sanitize the *input* of the
    # differentiable factorization (identity when bad -> the AD path
    # never sees a failed factor; gradients are exactly zero there).
    probe = jax.lax.linalg.cholesky(jax.lax.stop_gradient(cov))
    bad = jnp.any(jnp.isnan(probe), axis=(-2, -1))
    chol = jax.lax.linalg.cholesky(
        jnp.where(bad[..., None, None], eye, cov)
    )
    u = jax.lax.linalg.triangular_solve(
        chol, z[..., None], left_side=True, lower=True
    )[..., 0]
    ll = u[..., -1] ** 2 + 2.0 * log_precise(chol[..., -1, -1])
    ll = jnp.where(bad, jnp.asarray(2e6, cov.dtype), ll)
    return jnp.sum(ll)


def vecchia_nll(
    flat,
    win_coords,
    win_z,
    win_procs,
    win_mvar,
    win_mask,
    spec: ParamSpec,
    geodesic: bool = True,
    chunk: int = 4096,
):
    """Jittable Vecchia NLL over precomputed term windows.

    0.5 * sum_i (u_m^2 + 2 log L_mm + log 2pi) with per-term (m+1)-point
    Cholesky factorizations, scanned over ``chunk``-sized batches of terms
    (the scan body is checkpointed, so reverse-mode memory is bounded by
    one chunk's K_nu residuals regardless of N).
    """
    total = _windows_nll_sum(
        flat,
        (win_coords, win_z, win_procs, win_mvar, win_mask),
        spec,
        geodesic,
        chunk,
    )
    n = win_coords.shape[0]
    return 0.5 * (total + n * jnp.log(2.0 * jnp.pi))


def _windows_nll_sum(flat, windows, spec, geodesic, chunk):
    """Sum of -2 log p terms over the windows, scanned in checkpointed
    ``chunk``-sized batches (bounds reverse-mode memory to one chunk's
    K_nu residuals). Fully-masked windows contribute exactly 0, so padded
    term rows (e.g. mesh padding in parallel.sharded_vecchia_nll) are free.
    """
    win_coords, win_z, win_procs, win_mvar, win_mask = windows
    n = win_coords.shape[0]
    chunk = min(chunk, n)
    n_full = (n // chunk) * chunk

    body_fn = jax.checkpoint(lambda f, w: _chunk_nll(f, spec, w, geodesic))

    total = jnp.asarray(0.0, win_coords.dtype)
    if n_full:
        def stack(a):
            return a[:n_full].reshape(n // chunk, chunk, *a.shape[1:])

        chunks = tuple(stack(a) for a in windows)

        def scan_body(acc, xs):
            return acc + body_fn(flat, xs), None

        total, _ = jax.lax.scan(scan_body, total, chunks)
    if n_full < n:
        tail = tuple(a[n_full:] for a in windows)
        total = total + body_fn(flat, tail)
    return total


@partial(jax.jit, static_argnames=("spec", "geodesic", "chunk"))
def vecchia_nll_value_and_grad(flat, windows, spec, geodesic=True, chunk=4096):
    """Jitted (value, grad) of the Vecchia NLL with windows as ARGUMENTS.

    Closing a jitted objective over a VecchiaLikelihood's window tensors
    embeds them as HLO constants — at N = 1M that is ~570 MB of program
    payload, which the remote TPU compile service rejects outright
    (HTTP 413). Passing them as arguments keeps the program small and
    shape-cached across datasets of the same size.
    """

    def obj(x):
        n = windows[0].shape[0]
        total = _windows_nll_sum(x, windows, spec, geodesic, chunk)
        return 0.5 * (total + n * jnp.log(2.0 * jnp.pi))

    return jax.value_and_grad(obj)(flat)


class VecchiaLikelihood:
    """Precomputed Vecchia scaffold (ordering + neighbor windows) exposing
    a jittable ``nll(flat)`` and its gradient for a fixed dataset.

    Args:
        coords_list: per-process (n_j, 2) coordinate arrays.
        values_list: per-process (n_j,) residual arrays.
        m: conditioning-set size (typically 10-40; accuracy increases and
            cost grows as O(m^3) per term).
        geodesic: haversine (km) vs Euclidean distances.
        measurement_var_list: optional per-process measurement-error
            variances added to term diagonals.
        ordering: "maxmin" (exact, N sequential device steps),
            "coarse" (coarse_to_fine_order, O(N log N) host), or "auto"
            (maxmin up to 20k points, coarse beyond — the exact ordering's
            sequential scan is wall-clock-linear in N, ~100 s at 80k).
        neighbor_method: "device" (exact blocked top-k, O(N^2/block)),
            "kd" (nearest_previous_neighbors_kd, O(N log N) host), or
            "auto" (device up to 20k, kd beyond).
        kd_exact_prefix: rows below this index use the exact device
            top-k on the kd path (see nearest_previous_neighbors_kd);
            exposed so quality tests can force the doubling-block regime
            at sizes where the exact scaffold still runs.
    """

    def __init__(
        self,
        coords_list,
        values_list,
        m: int = 30,
        geodesic: bool = True,
        measurement_var_list=None,
        chunk: int = 4096,
        ordering: str = "auto",
        neighbor_method: str = "auto",
        kd_exact_prefix: int = 4096,
    ) -> None:
        coords = np.concatenate([np.asarray(c) for c in coords_list])
        values = np.concatenate([np.asarray(v) for v in values_list])
        procs = np.concatenate(
            [np.full(len(c), j, np.int32) for j, c in enumerate(coords_list)]
        )
        mvar = None
        if measurement_var_list is not None:
            mvar = np.concatenate(
                [np.asarray(v, values.dtype) for v in measurement_var_list]
            )
        n = coords.shape[0]
        m = int(min(m, n - 1))
        self.n, self.m, self.geodesic, self.chunk = n, m, geodesic, chunk
        if (
            coords.dtype == np.float64
            and n > 20_000
            and jax.default_backend() == "tpu"
        ):
            import warnings

            warnings.warn(
                "VecchiaLikelihood got float64 inputs on a TPU backend: "
                "f64 is emulated there (~50x slower), and at this size "
                "the emulated programs have been observed to fault the "
                "TPU runtime. Cast coords/values to float32 for the TPU "
                "fast path (DESIGN.md §6)."
            )

        if ordering == "auto":
            ordering = "maxmin" if n <= 20_000 else "coarse"
        if neighbor_method == "auto":
            neighbor_method = "device" if n <= 20_000 else "kd"
        self.ordering, self.neighbor_method = ordering, neighbor_method
        if ordering == "coarse":
            perm = coarse_to_fine_order(coords, geodesic)
        elif ordering == "maxmin":
            perm = maxmin_order(coords, geodesic)
        else:
            raise ValueError(f"unknown ordering {ordering!r}")
        self.perm = perm
        coords, values, procs = coords[perm], values[perm], procs[perm]
        if mvar is not None:
            mvar = mvar[perm]
        if neighbor_method == "kd":
            nbr, nbr_mask = nearest_previous_neighbors_kd(
                coords, m, geodesic, exact_prefix=kd_exact_prefix
            )
        elif neighbor_method == "device":
            nbr, nbr_mask = nearest_previous_neighbors(coords, m, geodesic)
        else:
            raise ValueError(f"unknown neighbor_method {neighbor_method!r}")

        win = _term_windows(
            jnp.asarray(coords),
            jnp.asarray(values),
            jnp.asarray(procs),
            jnp.asarray(mvar) if mvar is not None else None,
            jnp.asarray(nbr),
            jnp.asarray(nbr_mask),
        )
        self._win = win

    def nll(self, flat, spec: ParamSpec):
        c, z, p, mv, mk = self._win
        return vecchia_nll(
            flat, c, z, p, mv, mk, spec, self.geodesic, self.chunk
        )


def make_device_vecchia_lbfgs_fitter(
    spec: ParamSpec,
    geodesic: bool,
    maxiter: int = 200,
    tol: float = 1e-6,
    memory_size: int = 15,
    chunk: int = 4096,
):
    """Fully on-device L-BFGS Vecchia-likelihood fitter: the shared
    sigmoid-box driver (estimate.nll.sigmoid_box_lbfgs) over the
    Vecchia NLL in ONE `lax.while_loop` program (on TPU the host scipy
    driver pays a device-relay round trip per objective eval; this pays
    one dispatch for the whole fit).

    Returns fit(x0, windows) -> (x, nll, n_iter, converged) where
    ``windows`` is a VecchiaLikelihood's ``_win`` tuple.
    """
    from cokriging_tpu.estimate.nll import sigmoid_box_lbfgs

    lo_np, hi_np = spec.bounds()

    def fit(x0, windows):
        n = windows[0].shape[0]
        dt = windows[0].dtype
        lo = jnp.asarray(lo_np, dt)
        hi = jnp.asarray(hi_np, dt)

        def raw(x):
            total = _windows_nll_sum(x, windows, spec, geodesic, chunk)
            return 0.5 * (total + n * jnp.log(2.0 * jnp.pi))

        return sigmoid_box_lbfgs(
            raw, jnp.asarray(x0, dt), lo, hi,
            maxiter=maxiter, tol=tol, memory_size=memory_size,
        )

    return fit


_DEVICE_FITTER_CACHE = {}


def fit_vecchia_device(
    mf,
    init: Optional[MaternParams] = None,
    m: int = 30,
    use_measurement_var: bool = False,
    maxiter: int = 200,
    main: bool = True,
    chunk: int = 4096,
) -> Tuple[MaternParams, dict]:
    """Vecchia-likelihood fit entirely on device as ONE compiled program
    (companion to estimate.nll.fit_nll_device). Same optimum as the host
    fit_vecchia driver; one dispatch instead of per-eval relay latency."""
    init = init or MaternParams.default(mf.n_procs)
    spec = init.spec
    coords = [f.coords_main if main else f.coords for f in mf.fields]
    values = [f.values_main if main else f.values for f in mf.fields]
    mvl = None
    if use_measurement_var:
        mvl = [
            f.measurement_var
            if f.measurement_var is not None
            else np.zeros(f.size)
            for f in mf.fields
        ]
    lik = VecchiaLikelihood(
        coords, values, m=m, geodesic=mf.geodesic,
        measurement_var_list=mvl, chunk=chunk,
    )
    key = (spec, lik.geodesic, maxiter, chunk)
    if key not in _DEVICE_FITTER_CACHE:
        # one jitted fitter per configuration: a fresh jax.jit wrapper
        # per call would re-trace and re-load the executable every call
        _DEVICE_FITTER_CACHE[key] = jax.jit(
            make_device_vecchia_lbfgs_fitter(
                spec, lik.geodesic, maxiter=maxiter, chunk=chunk
            )
        )
    x, nll, n_iter, conv = _DEVICE_FITTER_CACHE[key](init.to_flat(), lik._win)
    params = MaternParams.from_flat(x, spec=spec)
    return params, {
        "nll": float(nll),
        # the optimizer's own stopping test (gradient tolerance), same
        # semantics as the host driver's res.success — not merely a
        # finite objective (VERDICT r3 weak #8)
        "success": bool(conv),
        "n_iter": int(n_iter),
        "m": lik.m,
        "n": lik.n,
    }


def fit_vecchia(
    mf,
    init: Optional[MaternParams] = None,
    m: int = 30,
    use_measurement_var: bool = False,
    maxiter: int = 200,
    main: bool = True,
    chunk: int = 4096,
    mesh=None,
    ordering: str = "auto",
    neighbor_method: str = "auto",
) -> Tuple[MaternParams, dict]:
    """Maximum Vecchia-likelihood fit of the Matern parameters.

    Same driver shape as estimate.nll.fit_nll (sigmoid box
    reparameterization + scipy L-BFGS over the jit'd value_and_grad), with
    the exact N x N factorization replaced by the O(N m^3) Vecchia sum —
    the fit path for datasets beyond the exact-NLL's n ~ 25k ceiling.

    ``mesh``: optional jax.sharding.Mesh; the objective (and its gradient)
    then evaluates term-parallel across the mesh via
    parallel.sharded_vecchia_nll — identical values, N-way throughput.
    ``ordering``/``neighbor_method`` pass through to VecchiaLikelihood
    (exact vs O(N log N) scaffold; "auto" switches on N).
    """
    from scipy.optimize import minimize

    init = init or MaternParams.default(mf.n_procs)
    spec = init.spec
    coords = [f.coords_main if main else f.coords for f in mf.fields]
    values = [f.values_main if main else f.values for f in mf.fields]
    mvl = None
    if use_measurement_var:
        mvl = [
            f.measurement_var
            if f.measurement_var is not None
            else np.zeros(f.size)
            for f in mf.fields
        ]
    lik = VecchiaLikelihood(
        coords, values, m=m, geodesic=mf.geodesic,
        measurement_var_list=mvl, chunk=chunk,
        ordering=ordering, neighbor_method=neighbor_method,
    )

    lo_np, hi_np = spec.bounds()
    # Trace the objective in the windows' dtype: f64 params against f32
    # windows would otherwise promote mid-scan and crash at trace time
    # (lax.scan carry dtype mismatch), exactly as fit_vecchia_device casts.
    win_dt = lik._win[0].dtype
    lo, hi = jnp.asarray(lo_np, win_dt), jnp.asarray(hi_np, win_dt)
    geo_flag = lik.geodesic

    if mesh is not None:
        from cokriging_tpu.parallel import sharded_vecchia_nll

        # mesh path: the sharded objective manages its own window
        # placement; closure is fine at the mesh path's problem sizes
        @jax.jit
        def value_and_grad_u(u, _windows):
            def obj(uu):
                x = lo + (hi - lo) * jax.nn.sigmoid(uu)
                return sharded_vecchia_nll(lik, x, spec, mesh=mesh, chunk=chunk)

            return jax.value_and_grad(obj)(u)
    else:
        # windows as jit ARGUMENTS, not closure constants: closed-over
        # window tensors serialize into the compiled program's payload
        # (~570 MB at N = 1M -> remote-compile HTTP 413)
        @jax.jit
        def value_and_grad_u(u, windows):
            def obj(uu):
                x = lo + (hi - lo) * jax.nn.sigmoid(uu)
                n = windows[0].shape[0]
                total = _windows_nll_sum(x, windows, spec, geo_flag, chunk)
                return 0.5 * (total + n * jnp.log(2.0 * jnp.pi))

            return jax.value_and_grad(obj)(u)

    x0 = np.clip(
        np.asarray(init.to_flat(), np.float64),
        lo_np + 1e-6 * (hi_np - lo_np),
        hi_np - 1e-6 * (hi_np - lo_np),
    )
    z0 = (x0 - lo_np) / (hi_np - lo_np)
    u0 = np.log(z0) - np.log1p(-z0)

    evals = {"n": 0}
    trace = []

    def fun(u):
        evals["n"] += 1
        v, g = value_and_grad_u(jnp.asarray(u, win_dt), lik._win)
        g = np.asarray(g)
        # zero any non-finite gradient entries (penalty-region probes)
        # instead of feeding them to L-BFGS, whose curvature memory a
        # single NaN poisons permanently (estimate/nll.py:_clean_grad)
        g = np.where(np.isfinite(g), g, 0.0)
        v = float(v) if np.isfinite(v) else 1e10
        trace.append(v)
        return v, g

    # tight ftol/gtol: under the sigmoid box reparameterization the
    # objective flattens near saturated bounds, and the scipy defaults
    # declare victory mid-ridge (seen: stop at +3 nats after 25 iters
    # while the same surface admits -3 more; exact-NLL parity test)
    res = minimize(
        fun, u0, jac=True, method="L-BFGS-B",
        options={"maxiter": maxiter, "ftol": 1e-13, "gtol": 1e-9,
                 "maxcor": 20},
    )
    x = np.asarray(lo_np + (hi_np - lo_np) / (1.0 + np.exp(-res.x)))
    # return params in the dtype the likelihood computed in: the host
    # optimizer works in f64, but handing f64 params to an f32/TPU
    # pipeline silently promotes every downstream covariance op to
    # emulated f64 (~50x slower; observed stalling the large-n example's
    # prediction stage for half an hour)
    params = MaternParams.from_flat(jnp.asarray(x, win_dt), spec=spec)
    return params, {
        "nll": float(res.fun),
        "success": bool(res.success),
        "n_iter": int(res.nit),
        "n_obj_evals": evals["n"],
        "m": lik.m,
        "n": lik.n,
        # per-eval objective values, in evaluation order — the committed
        # convergence evidence for large-N runs (results/ manifests)
        "nll_trace": trace,
    }
