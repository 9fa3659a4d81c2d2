"""Empirical (cross-)variograms as a fused, blocked pairwise pass.

The reference materializes the full n x n distance matrix and variogram
cloud, then bins with pandas (src/fields.py:192-232, 378-403). Here the
pair space is streamed in row blocks — distances, cloud values, and bin
accumulation fused per block — so memory is O(block x n) regardless of n.
Two passes:

1. min nonzero / max distance over the (<= max_dist)-filtered cloud, which
   the reference's bin construction needs (src/fields.py:389-403:
   bin centers linspace(min_dist, max_dist_actual, n_bins), first edge
   pulled to 0);
2. per-bin sums and counts via a static unroll of masked reductions that
   XLA fuses into the distance/cloud stream (measured fastest on TPU —
   615 ms vs 801 ms one-hot matmul vs 12 s segment_sum at n=25.6k,
   n_bins=15; see tools/bench_binning.py and docs/DESIGN.md).

Conventions preserved exactly:
- marginal variogram uses strict-upper-triangle pairs; the cross variogram
  uses the full n_i x n_j rectangle (src/fields.py:196-203);
- values are centered by the field mean before the cloud calc
  (src/fields.py:378-386);
- semivariogram cloud 0.5 (z_i - z_j)^2, covariogram cloud z_i z_j;
- pandas-cut right-closed bins with include_lowest (src/fields.py:213-216);
- a warning when any bin holds < 30 pairs (src/fields.py:225-229).
"""

import warnings
import dataclasses
from dataclasses import dataclass
from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from cokriging_tpu.kernels.distance import haversine_matrix, euclidean_matrix

_BLOCK = 512  # row-block size for the streamed pair pass


@dataclass(frozen=True)
class VarioConfig:
    """Empirical variogram configuration (src/fields.py:20-46).

    ``geodesic=True`` -> haversine kilometers (the reference's
    ``fast_dist=True``); ``False`` -> Euclidean (simulation path).
    """

    max_dist: float
    n_bins: int
    n_procs: int = 2
    kind: str = "Semivariogram"
    geodesic: bool = True

    @property
    def covariogram(self) -> bool:
        return self.kind == "Covariogram"


@dataclass
class EmpiricalVariogram:
    """Binned empirical variograms for all i <= j pairs.

    ``df`` mirrors the reference's multi-index frame
    (src/fields.py:230-252); the stacked arrays are the jit-side view
    consumed by the WLS objective: row k corresponds to ``pairs[k]``.
    """

    df: pd.DataFrame
    config: VarioConfig
    timestamp: Optional[str]
    timedeltas: Optional[List[int]]
    pairs: List[tuple]  # [(i, j), ...] for i <= j
    bin_centers: np.ndarray  # (n_pairs, n_bins)
    bin_means: np.ndarray  # (n_pairs, n_bins) NaN where empty
    bin_counts: np.ndarray  # (n_pairs, n_bins)


def _pad_rows(arr, block):
    n = arr.shape[0]
    pad = (-n) % block
    if pad:
        arr = jnp.concatenate([arr, jnp.zeros((pad,) + arr.shape[1:], arr.dtype)])
    return arr, n


@partial(jax.jit, static_argnames=("geodesic", "block"))
def _pass_min_max(
    ca, cb, marginal, max_dist, n_rows, n_cols, geodesic, block, row_offset=0
):
    """Blocked pass 1: (min nonzero dist, max dist) over filtered pairs.

    ``marginal``, ``n_rows``, ``n_cols`` are *runtime* values so one
    compiled program serves every (i, j) pair — the axon remote-compile
    service costs minutes per program, so program-count is a first-order
    performance concern. ``row_offset`` holds the global index of this
    shard's first row when the row axis is sharded across devices (the
    triu mask and n_rows bound are global-index conditions).
    """
    nb = cb.shape[0]
    n_blocks = ca.shape[0] // block
    col_ids = jnp.arange(nb)[None, :]

    def body(k, carry):
        dmin, dmax = carry
        rows = jax.lax.dynamic_slice_in_dim(ca, k * block, block)
        d = (
            haversine_matrix(rows, cb)
            if geodesic
            else euclidean_matrix(rows, cb)
        )
        row_ids = row_offset + k * block + jnp.arange(block)[:, None]
        valid = (row_ids < n_rows) & (col_ids < n_cols) & (d <= max_dist)
        valid = valid & (~marginal | (row_ids < col_ids))
        dmin = jnp.minimum(
            dmin, jnp.min(jnp.where(valid & (d > 0.0), d, jnp.inf))
        )
        dmax = jnp.maximum(dmax, jnp.max(jnp.where(valid, d, -jnp.inf)))
        return dmin, dmax

    return jax.lax.fori_loop(0, n_blocks, body, (jnp.inf, -jnp.inf))


@partial(jax.jit, static_argnames=("geodesic", "n_bins", "block"))
def _pass_bin(
    ca, va, cb, vb, edges, marginal, covariogram, max_dist, n_rows, n_cols,
    geodesic, n_bins, block, row_offset=0
):
    """Blocked pass 2: per-bin cloud sums and pair counts.

    Bin assignment replicates right-closed pandas cut with include_lowest:
    idx = clip(searchsorted(edges, d, 'left') - 1, 0, n_bins - 1).
    Per-bin accumulation is a static unroll of masked reductions that XLA
    fuses into the distance/cloud computation (no intermediate buffers).
    ``marginal``/``covariogram`` are runtime flags (see _pass_min_max).
    """
    nb = cb.shape[0]
    n_blocks = ca.shape[0] // block
    col_ids = jnp.arange(nb)[None, :]

    def body(k, carry):
        sums, counts = carry
        rows = jax.lax.dynamic_slice_in_dim(ca, k * block, block)
        vals = jax.lax.dynamic_slice_in_dim(va, k * block, block)
        d = (
            haversine_matrix(rows, cb)
            if geodesic
            else euclidean_matrix(rows, cb)
        )
        diff = vals[:, None] - vb[None, :]
        cloud = jnp.where(
            covariogram, vals[:, None] * vb[None, :], 0.5 * diff * diff
        )
        row_ids = row_offset + k * block + jnp.arange(block)[:, None]
        valid = (row_ids < n_rows) & (col_ids < n_cols) & (d <= max_dist)
        valid = valid & (~marginal | (row_ids < col_ids))
        idx = jnp.clip(jnp.searchsorted(edges, d, side="left") - 1, 0, n_bins - 1)
        bin_sums = []
        bin_counts = []
        for b in range(n_bins):
            sel = valid & (idx == b)
            bin_sums.append(jnp.sum(jnp.where(sel, cloud, 0.0)))
            # int32 accumulation: f32 loses count exactness past 2^24
            # (~17M pairs/bin, reached at the n~25k all-pairs stream)
            bin_counts.append(jnp.sum(sel, dtype=jnp.int32))
        sums = sums + jnp.stack(bin_sums)
        counts = counts + jnp.stack(bin_counts)
        return sums, counts

    init = (jnp.zeros(n_bins, ca.dtype), jnp.zeros(n_bins, jnp.int32))
    return jax.lax.fori_loop(0, n_blocks, body, init)


def _point_features(coords, geodesic):
    """Per-point features that make the pairwise distance surrogate pure
    multiply-adds (no per-pair transcendentals).

    Geodesic: [sin(lat/2), cos(lat/2), sin(lon/2), cos(lon/2), cos(lat)]
    (radians), so the haversine term
    h = sin^2(dlat/2) + cos(lat_a) cos(lat_b) sin^2(dlon/2)
    follows from the angle-difference identity
    sin(dx/2) = sin(xa/2) cos(xb/2) - cos(xa/2) sin(xb/2).
    This difference form is numerically stable for small separations
    (unlike the unit-vector dot product 0.5 (1 - p_a . p_b), whose f32
    cancellation corrupts km-scale distances).

    Euclidean: the coordinates themselves; h = squared distance.
    """
    if not geodesic:
        return coords
    r = jnp.deg2rad(coords)
    hl, hm = 0.5 * r[:, 0], 0.5 * r[:, 1]
    return jnp.stack(
        [jnp.sin(hl), jnp.cos(hl), jnp.sin(hm), jnp.cos(hm), jnp.cos(r[:, 0])],
        axis=1,
    )


def _h_block(fa, fb, geodesic):
    """Pairwise distance surrogate h for a (rows, cols) block: haversine h
    (monotone in great-circle distance, d = 2R asin(sqrt(h))) or squared
    Euclidean distance. ~10 VPU flops per pair, no transcendentals."""
    if geodesic:
        x = fa[:, 0:1] * fb[:, 1:2].T - fa[:, 1:2] * fb[:, 0:1].T
        y = fa[:, 2:3] * fb[:, 3:4].T - fa[:, 3:4] * fb[:, 2:3].T
        return x * x + (fa[:, 4:5] * fb[:, 4:5].T) * (y * y)
    dx = fa[:, 0:1] - fb[:, 0:1].T
    dy = fa[:, 1:2] - fb[:, 1:2].T
    return dx * dx + dy * dy


def _h_of_d(d, geodesic):
    from cokriging_tpu.utils.config import EARTH_RADIUS_KM

    if geodesic:
        s = jnp.sin(d / (2.0 * EARTH_RADIUS_KM))
        return s * s
    return d * d


def _d_of_h(h, geodesic):
    from cokriging_tpu.utils.config import EARTH_RADIUS_KM

    if geodesic:
        return (
            2.0
            * EARTH_RADIUS_KM
            * jnp.arcsin(jnp.sqrt(jnp.clip(h, 0.0, 1.0)))
        )
    return jnp.sqrt(h)


@partial(
    jax.jit,
    static_argnames=("pair_list", "geodesic", "covariogram", "n_bins", "block"),
)
def _all_pairs_program(
    coords, values, n_valid, max_dist, pair_list, geodesic, covariogram,
    n_bins, block,
):
    """Every (i, j) binned variogram in ONE compiled program.

    The per-pair two-pass stream (min/max -> bin construction -> bin sums)
    runs entirely on device, including the reference's data-dependent bin
    edges (src/fields.py:389-403) via jnp.linspace on the traced dmin/dmax.
    Two designs beyond the per-pair path:

    1. one dispatch: through the axon TPU relay every eager op outside jit
       is a dispatch round-trip; the three-pair stage spent ~790 ms on
       dispatch overhead around the device compute;
    2. all comparisons (max_dist filter, zero-snap, bin assignment, min/max)
       run on the monotone surrogate h (haversine h / squared Euclidean)
       with the *edges* transformed once, so the O(n^2) stream does ~10
       multiply-adds per pair and zero transcendentals — measured 52 ms ->
       ~8 ms for the 164M-pair distance stream on a v5e chip. Marginal
       pairs additionally skip strictly-lower-triangle blocks via a 2-D
       block loop + lax.cond (the reference uses triu pairs only,
       src/fields.py:196-203).

    Args:
        coords: (p, N, 2) stacked padded coordinates.
        values: (p, N) stacked padded values (padded lanes ignored via
            ``n_valid`` masks).
        n_valid: (p,) true observation counts.
        pair_list: static tuple of (i, j) with i <= j.

    Returns:
        (centers, sums, counts), each (n_pairs, n_bins).
    """
    from cokriging_tpu.kernels.distance import ZERO_SNAP, ZERO_SNAP_F32_KM

    n_pad = coords.shape[1]
    nb = n_pad // block
    lane = jnp.arange(n_pad)
    # dtype-aware snap, mirroring haversine_matrix's default (f32 jit
    # fusion noise reaches ~1e-3 km on the geodesic path)
    snap = (
        ZERO_SNAP_F32_KM
        if (geodesic and coords.dtype == jnp.float32)
        else ZERO_SNAP
    )
    h_max = _h_of_d(jnp.asarray(max_dist, coords.dtype), geodesic)
    h_snap = _h_of_d(jnp.asarray(snap, coords.dtype), geodesic)
    feats = [_point_features(coords[k], geodesic) for k in range(coords.shape[0])]

    def block_ids(t):
        rb, cb_ = t // nb, t % nb
        row_ids = rb * block + jnp.arange(block)[:, None]
        col_ids = cb_ * block + jnp.arange(block)[None, :]
        return rb, cb_, row_ids, col_ids

    all_centers, all_sums, all_counts = [], [], []
    for (i, j) in pair_list:
        fa, fb = feats[i], feats[j]
        # center by the valid-lane field means (src/fields.py:378-381)
        va = values[i] - jnp.sum(
            jnp.where(lane < n_valid[i], values[i], 0.0)
        ) / n_valid[i]
        vb = values[j] - jnp.sum(
            jnp.where(lane < n_valid[j], values[j], 0.0)
        ) / n_valid[j]
        marginal = i == j
        n_rows, n_cols = n_valid[i], n_valid[j]

        def mm_body(t, carry, fa=fa, fb=fb, marginal=marginal,
                    n_rows=n_rows, n_cols=n_cols):
            rb, cb_, row_ids, col_ids = block_ids(t)

            def compute(c):
                hmin, hmax = c
                ra = jax.lax.dynamic_slice_in_dim(fa, rb * block, block)
                rb_ = jax.lax.dynamic_slice_in_dim(fb, cb_ * block, block)
                h = _h_block(ra, rb_, geodesic)
                valid = (row_ids < n_rows) & (col_ids < n_cols) & (h <= h_max)
                if marginal:
                    valid = valid & (row_ids < col_ids)
                hmin = jnp.minimum(
                    hmin, jnp.min(jnp.where(valid & (h > h_snap), h, jnp.inf))
                )
                hmax = jnp.maximum(
                    hmax, jnp.max(jnp.where(valid, h, -jnp.inf))
                )
                return hmin, hmax

            if marginal:
                return jax.lax.cond(cb_ >= rb, compute, lambda c: c, carry)
            return compute(carry)

        hmin, hmax = jax.lax.fori_loop(
            0,
            nb * nb,
            mm_body,
            (
                jnp.asarray(jnp.inf, coords.dtype),
                jnp.asarray(-jnp.inf, coords.dtype),
            ),
        )
        dmin = _d_of_h(hmin, geodesic)
        dmax = _d_of_h(hmax, geodesic)
        # snap to exact 0 below the tolerance, as haversine_matrix does
        dmin = jnp.where(dmin > snap, dmin, 0.0)
        dmax = jnp.where(dmax > snap, dmax, 0.0)
        # No pairs within max_dist leaves hmin/hmax at +-inf. The geodesic
        # _d_of_h clips them to finite [0, pi R], which would silently pass
        # the host-side finiteness guard and hand the fit decreasing bin
        # centers with all-NaN means; propagate NaN so the guard fires for
        # both coordinate systems (the Euclidean sqrt(inf)=inf already does).
        empty = ~(jnp.isfinite(hmin) & jnp.isfinite(hmax))
        dmin = jnp.where(empty, jnp.nan, dmin)
        dmax = jnp.where(empty, jnp.nan, dmax)

        centers = jnp.linspace(dmin, dmax, n_bins)
        width = centers[1] - centers[0]
        edges = jnp.concatenate(
            [centers - 0.5 * width, centers[-1:] + 0.5 * width]
        )
        edges = edges.at[0].set(0.0)
        h_edges = _h_of_d(edges, geodesic)

        def bin_body(t, carry, fa=fa, fb=fb, va=va, vb=vb, marginal=marginal,
                     n_rows=n_rows, n_cols=n_cols, h_edges=h_edges):
            rb, cb_, row_ids, col_ids = block_ids(t)

            def compute(c):
                sums, counts = c
                ra = jax.lax.dynamic_slice_in_dim(fa, rb * block, block)
                rb_ = jax.lax.dynamic_slice_in_dim(fb, cb_ * block, block)
                vra = jax.lax.dynamic_slice_in_dim(va, rb * block, block)
                vrb = jax.lax.dynamic_slice_in_dim(vb, cb_ * block, block)
                h = _h_block(ra, rb_, geodesic)
                diff = vra[:, None] - vrb[None, :]
                cloud = jnp.where(
                    covariogram, vra[:, None] * vrb[None, :], 0.5 * diff * diff
                )
                valid = (row_ids < n_rows) & (col_ids < n_cols) & (h <= h_max)
                if marginal:
                    valid = valid & (row_ids < col_ids)
                idx = jnp.clip(
                    jnp.searchsorted(h_edges, h, side="left") - 1, 0, n_bins - 1
                )
                bs, bc = [], []
                for b in range(n_bins):
                    sel = valid & (idx == b)
                    bs.append(jnp.sum(jnp.where(sel, cloud, 0.0)))
                    # int32 accumulation: f32 loses count exactness past
                    # 2^24 pairs/bin (reached at the n~25k all-pairs stream)
                    bc.append(jnp.sum(sel, dtype=jnp.int32))
                return sums + jnp.stack(bs), counts + jnp.stack(bc)

            if marginal:
                return jax.lax.cond(cb_ >= rb, compute, lambda c: c, carry)
            return compute(carry)

        init = (jnp.zeros(n_bins, coords.dtype), jnp.zeros(n_bins, jnp.int32))
        sums, counts = jax.lax.fori_loop(0, nb * nb, bin_body, init)
        all_centers.append(centers)
        all_sums.append(sums)
        all_counts.append(counts)
    return (
        jnp.stack(all_centers),
        jnp.stack(all_sums),
        jnp.stack(all_counts),
    )


def empirical_variograms_device(
    coords_list, values_list, config: VarioConfig, pairs=None
):
    """All i <= j empirical (cross-)variograms as one device dispatch.

    The fast path behind both ``empirical_variograms`` and the benchmark:
    host work is limited to padding/stacking the inputs and one final sync.

    Returns (pairs, bin_centers, bin_means, bin_counts) with the stacked
    arrays shaped (n_pairs, n_bins).
    """
    p = len(coords_list)
    if pairs is None:
        pairs = [(i, j) for i in range(p) for j in range(p) if i <= j]
    sizes = [int(np.shape(c)[0]) for c in coords_list]
    target = -(-max(sizes) // _BLOCK) * _BLOCK
    dtype = np.asarray(coords_list[0]).dtype
    cs = np.zeros((p, target, 2), dtype)
    vs = np.zeros((p, target), dtype)
    for k in range(p):
        cs[k, : sizes[k]] = np.asarray(coords_list[k])
        vs[k, : sizes[k]] = np.asarray(values_list[k])
    centers, sums, counts = _all_pairs_program(
        jnp.asarray(cs),
        jnp.asarray(vs),
        jnp.asarray(sizes, dtype),
        config.max_dist,
        tuple(pairs),
        config.geodesic,
        config.covariogram,
        config.n_bins,
        _BLOCK,
    )
    centers = np.asarray(centers)
    counts = np.asarray(counts)
    if not np.isfinite(centers).all():
        raise ValueError("No pairs within max_dist; cannot build variogram bins.")
    sums = np.asarray(sums)
    # keep the compute dtype: np.where with a python-float NaN promotes to
    # f64 under legacy numpy scalar rules, and f64 bin means silently turn
    # every downstream WLS fit program into emulated f64 on TPU (~40 s of
    # recurring compile per fit in the flagship comparison)
    means = np.where(
        counts > 0, sums / np.maximum(counts, 1), np.nan
    ).astype(sums.dtype)
    if (counts < 30).any():
        warnings.warn(
            "WARNING: Fewer than 30 pairs used for at least one bin in"
            " variogram calculation."
        )
    return pairs, centers, means, counts


def variogram_bins(min_dist: float, max_dist: float, n_bins: int):
    """Bin centers/edges exactly as the reference constructs them
    (src/fields.py:389-403): centers linspaced [min_dist, max_dist],
    uniform edges straddling them, first edge pulled to zero."""
    centers = np.linspace(min_dist, max_dist, n_bins)
    width = centers[1] - centers[0]
    edges = np.concatenate([centers - 0.5 * width, centers[-1:] + 0.5 * width])
    edges[0] = 0.0
    return centers, edges


def empirical_variogram_pair(
    coords_a,
    values_a,
    coords_b,
    values_b,
    config: VarioConfig,
    marginal: bool,
    pad_rows_to: int = None,
    pad_cols_to: int = None,
):
    """One (i, j) binned variogram; returns (centers, means, counts).

    ``pad_rows_to``/``pad_cols_to`` let callers force common padded shapes
    across pairs so every pair reuses the same two compiled programs.
    """
    ca = jnp.asarray(coords_a)
    va = jnp.asarray(values_a)
    cb = jnp.asarray(coords_b)
    vb = jnp.asarray(values_b)
    n_rows = int(ca.shape[0])
    n_cols = int(cb.shape[0])

    # Center values by their field means (src/fields.py:378-381).
    va = va - jnp.mean(va)
    vb = vb - jnp.mean(vb)

    target_rows = max(pad_rows_to or 0, n_rows)
    target_rows = -(-target_rows // _BLOCK) * _BLOCK
    target_cols = max(pad_cols_to or 0, n_cols)

    def pad_to(arr, target):
        pad = target - arr.shape[0]
        if pad:
            arr = jnp.concatenate(
                [arr, jnp.zeros((pad,) + arr.shape[1:], arr.dtype)]
            )
        return arr

    ca, va = pad_to(ca, target_rows), pad_to(va, target_rows)
    cb, vb = pad_to(cb, target_cols), pad_to(vb, target_cols)

    dmin, dmax = _pass_min_max(
        ca, cb, marginal, config.max_dist, n_rows, n_cols, config.geodesic, _BLOCK
    )
    dmin, dmax = float(dmin), float(dmax)
    if not np.isfinite(dmin) or not np.isfinite(dmax):
        raise ValueError("No pairs within max_dist; cannot build variogram bins.")
    centers, edges = variogram_bins(dmin, dmax, config.n_bins)

    sums, counts = _pass_bin(
        ca,
        va,
        cb,
        vb,
        jnp.asarray(edges, ca.dtype),
        marginal,
        config.covariogram,
        config.max_dist,
        n_rows,
        n_cols,
        config.geodesic,
        config.n_bins,
        _BLOCK,
    )
    counts = np.asarray(counts)
    sums = np.asarray(sums)
    means = np.where(
        counts > 0, sums / np.maximum(counts, 1), np.nan
    ).astype(sums.dtype)
    return centers, means, counts


def empirical_variograms(mf, config: VarioConfig) -> EmpiricalVariogram:
    """All i <= j empirical (cross-)variograms for a MultiField
    (src/fields.py:234-252). One device dispatch for every pair."""
    pairs, all_c, all_m, all_n = empirical_variograms_device(
        [f.coords for f in mf.fields],
        [f.values for f in mf.fields],
        config,
    )
    frames = []
    for k, (i, j) in enumerate(pairs):
        df = pd.DataFrame(
            {
                "bin_center": all_c[k],
                "bin_mean": all_m[k],
                "bin_count": all_n[k],
                "i": i,
                "j": j,
            }
        )
        frames.append(df.set_index(["i", "j", df.index]))
    if config.n_procs != len(mf.fields):
        # Record the process count actually estimated: downstream consumers
        # (moment_init, fit_wls spec construction) size the parameter vector
        # from config.n_procs, and the default VarioConfig is bivariate.
        config = dataclasses.replace(config, n_procs=len(mf.fields))
    return EmpiricalVariogram(
        df=pd.concat(frames),
        config=config,
        timestamp=mf.timestamp,
        timedeltas=mf.timedeltas,
        pairs=pairs,
        bin_centers=np.asarray(all_c),
        bin_means=np.asarray(all_m),
        bin_counts=np.asarray(all_n),
    )
