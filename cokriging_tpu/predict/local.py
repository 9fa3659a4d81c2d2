"""Local-neighborhood cokriging, vmapped over prediction locations.

Re-design of the reference point Predictor (src/point_prediction.py:21-346).
The reference loops prediction locations in Python (df.apply) and ships row
partitions to a multiprocessing pool; here every location is one lane of a
single compiled program:

1. the joint data covariance on the main grid is assembled once
   (reference _cov_blocks, src/point_prediction.py:98-113);
2. per location, the neighborhood is every datum within ``max_dist``
   (LOOCV additionally drops the self-datum via d > 0,
   src/point_prediction.py:140-142), realized as a *fixed-width* index set:
   the K nearest candidates per process, with lanes beyond the true
   neighborhood masked;
3. the local system solve is a masked Cholesky — masked rows/columns are
   replaced by identity lanes so one (K_tot x K_tot) factorization per
   location serves every neighborhood size;
4. ``jax.vmap`` batches locations; sharding the location axis over a device
   mesh replaces the reference's process pool (see parallel.shard_map_local).

Fixed width K is chosen from the data (max neighborhood size, rounded up),
so results are exactly the all-neighbors-within-max_dist semantics of the
reference, not a top-K approximation.
"""

import warnings
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from cokriging_tpu.cov.matern import covariance, cross_covariance
from cokriging_tpu.kernels.distance import haversine_matrix, euclidean_matrix
from cokriging_tpu.kernels.linalg import blocked_spd_solve
from cokriging_tpu.predict.postprocess import (
    postprocess_predictions,
    inverse_transform_data,
)


def _dist(a, b, geodesic):
    return haversine_matrix(a, b) if geodesic else euclidean_matrix(a, b)


def _round_up(n, m=8):
    return int(-(-n // m) * m)


def _bucket_pow2(n, floor=8):
    """Round a width up to the next bucket in {2^k, 1.5 * 2^k} (>= floor).

    ``k_each`` and ``sizes`` are static jit arguments, so every distinct
    value compiles a fresh program — minutes each on the remote TPU compile
    service. Coarse buckets make one compile serve a whole month sweep
    whose true max-neighborhood sizes jitter with the data. The 1.5 * 2^k
    intermediates cap the padding waste at 33% (pure powers of two cost up
    to 2x the Cholesky FLOPs right above a boundary).
    """
    m = floor
    while m < n:
        if m + m // 2 >= n:
            return m + m // 2
        m *= 2
    return m


@partial(jax.jit, static_argnames=("i", "geodesic", "cv"))
def _kmax_program(pcoords, coords_tuple, n_valid, max_dist, i, geodesic, cv):
    """Max neighborhood count per process over all prediction locations
    (the data-dependent input to the static top-k width)."""
    ks = []
    for j, cj in enumerate(coords_tuple):
        d = _dist(pcoords, cj, geodesic)
        within = (d <= max_dist) & (
            jnp.arange(d.shape[1])[None, :] < n_valid[j]
        )
        if cv and j == i:
            within = within & (d > 0.0)
        ks.append(jnp.max(jnp.sum(within.astype(jnp.int32), axis=1)))
    return jnp.stack(ks)


@partial(jax.jit, static_argnames=("i", "geodesic", "cv"))
def _local_predict_gathered(
    params, gc, gz, pid, mask, s0, i, geodesic, cv
):
    """Vmapped local prediction from HOST-GATHERED neighborhoods.

    The companion program to `_local_predict_batch` for the large-N
    regime: neighbor INDICES come from a host kd-tree query (O(log N)
    per location) instead of an on-device masked top-k over an N-wide
    distance row (whose sort-based lowering dominates wall-clock once N
    reaches ~10^5-10^6). The device sees only the gathered (B, K)
    windows — coordinates, values, per-lane process ids — and computes
    true distances, the reference-convention local covariance, and the
    masked Cholesky solve exactly as the device-search path does
    (tests pin the two paths equal).

    Args:
        gc: (B, K, 2) gathered neighbor coordinates.
        gz: (B, K) gathered neighbor values (masked lanes zeroed here).
        pid: (K,) static-per-lane process ids.
        mask: (B, K) true-neighbor mask (radius + validity from the host
            query).
        s0: (B, 2) prediction locations.
        cv: LOOCV mode — additionally drops zero-distance process-i lanes
            (the reference's d > 0 self-exclusion,
            src/point_prediction.py:140-142), computed on true distances
            so semantics match the device-search path exactly.
    """
    c0 = covariance(params, i, jnp.zeros(1), use_nugget=True)[0]

    def one_location(s0_k, gc_k, gz_k, mask_k):
        dvec = _dist(s0_k[None, :], gc_k, geodesic)[0]
        if cv:
            mask_k = mask_k & ((pid != i) | (dvec > 0.0))
        k_tot = gc_k.shape[0]
        from cokriging_tpu.cov.matern import gathered_covariance

        dm = _dist(gc_k, gc_k, geodesic)
        eye = jnp.eye(k_tot, dtype=gz_k.dtype)
        m2 = mask_k[:, None] & mask_k[None, :]
        a = jnp.where(m2, gathered_covariance(params, dm, pid).astype(eye.dtype), eye)

        cvec = jnp.zeros_like(dvec)
        for j in range(params.sigma.shape[0]):
            cj = (
                covariance(params, i, dvec, use_nugget=True)
                if j == i
                else cross_covariance(params, i, j, dvec)
            )
            cvec = jnp.where(pid == j, cj, cvec)
        cvec = cvec * mask_k
        z = gz_k * mask_k
        w, chol_diag = blocked_spd_solve(a, cvec)
        pred = w @ z
        var = c0 - w @ cvec
        err = jnp.sqrt(jnp.maximum(var, 0.0))
        ok = (jnp.sum(mask_k) > 0) & jnp.all(~jnp.isnan(chol_diag))
        nan = jnp.nan
        return (
            jnp.where(ok, pred, nan),
            jnp.where(ok, err, nan),
            jnp.sum(mask_k),
        )

    return jax.vmap(one_location)(s0, gc, gz, mask)


@partial(
    jax.jit,
    static_argnames=("i", "geodesic", "sizes", "k_each", "cv", "direct_cov"),
)
def _local_predict_batch(
    params,
    coords_tuple,
    values_tuple,
    joint_cov,
    pcoords,
    max_dist,
    i,
    geodesic,
    sizes,
    k_each,
    cv,
    n_valid=None,
    direct_cov=False,
):
    """Vmapped local prediction at all pcoords.

    k_each[j] is the static per-process neighborhood width. ``sizes`` are
    the (possibly padded) static array lengths; ``n_valid`` optionally
    carries the *runtime* number of real data lanes per process, so months
    with different observation counts share one compiled program (padded
    lanes can never enter a neighborhood). ``direct_cov=True`` assembles
    each local covariance from the gathered neighborhood coordinates
    instead of gathering entries out of the precomputed n x n ``joint_cov``
    (which is then unused) — O(K^2) Matern work per location, but no n^2
    matrix anywhere: the prediction path for data sizes past one chip's
    joint-covariance memory (the same regime as estimate.vecchia). Returns
    (pred, pred_err, n_neighbors).
    """
    p = len(coords_tuple)
    offsets = np.concatenate([[0], np.cumsum(sizes)])[:-1]
    c0 = covariance(params, i, jnp.zeros(1), use_nugget=True)[0]
    if n_valid is None:
        n_valid = tuple(jnp.asarray(s) for s in sizes)
    # static per-lane process ids for the direct-assembly path
    pid = jnp.asarray(
        np.concatenate([np.full(k_each[j], j) for j in range(p)]), jnp.int32
    )

    def one_location(s0):
        idx_local, dist_parts, mask_parts = [], [], []
        for j in range(p):
            d = _dist(s0[None, :], coords_tuple[j], geodesic)[0]
            within = (d <= max_dist) & (jnp.arange(d.shape[0]) < n_valid[j])
            if cv and j == i:
                within = within & (d > 0.0)
            # K nearest candidates; lanes outside the radius are masked out,
            # so as long as k_each[j] >= true neighborhood size this is
            # exactly "all data within max_dist".
            score = jnp.where(within, d, jnp.inf)
            neg, idx = jax.lax.top_k(-score, k_each[j])
            dj = -neg
            mask = jnp.isfinite(dj)
            idx_local.append(idx)
            dist_parts.append(jnp.where(mask, dj, 0.0))
            mask_parts.append(mask)

        idx = jnp.concatenate(
            [idx_local[j] + offsets[j] for j in range(p)]
        )
        mask = jnp.concatenate(mask_parts)
        m2 = mask[:, None] & mask[None, :]
        k_tot = idx.shape[0]
        eye = jnp.eye(k_tot, dtype=joint_cov.dtype)

        if direct_cov:
            # Assemble the local covariance from the gathered coordinates —
            # identical conventions to the materialized joint matrix
            # (shared helper cov.matern.gathered_covariance).
            from cokriging_tpu.cov.matern import gathered_covariance

            gc = jnp.concatenate(
                [coords_tuple[j][idx_local[j]] for j in range(p)]
            )
            dm = _dist(gc, gc, geodesic)
            a = gathered_covariance(params, dm, pid).astype(eye.dtype)
        else:
            # Local covariance gathered from the precomputed joint matrix.
            # Two row-gathers with a transpose between them instead of one
            # 2-D fancy gather: XLA lowers C[ix[:,None], ix[None,:]] to a
            # scalarized scatter/gather that costs ~1.9 s for the bench's
            # 6k x 160 x 160 batch on a v5e chip, while row-gathers stay
            # contiguous (~90 ms measured for the same batch).
            rows = jnp.take(joint_cov, idx, axis=0)
            a = jnp.take(rows.T, idx, axis=0).T
        a = jnp.where(m2, a, eye)

        # prediction covariance vector (src/point_prediction.py:115-125)
        cvec_parts = []
        for j in range(p):
            dj = dist_parts[j]
            if j == i:
                cvec_parts.append(covariance(params, i, dj, use_nugget=True))
            else:
                cvec_parts.append(cross_covariance(params, i, j, dj))
        cvec = jnp.concatenate(cvec_parts) * mask

        z = jnp.concatenate(
            [values_tuple[j][idx_local[j]] for j in range(p)]
        )
        z = z * mask

        # blocked MXU Cholesky solve: XLA's batched cholesky+triangular
        # solve ran at ~25 GFLOP/s on this (6k, 160, 160) batch (~360 ms);
        # the blocked kernel keeps the flops in einsums (see
        # kernels/linalg.blocked_spd_solve)
        w, chol_diag = blocked_spd_solve(a, cvec)
        pred = w @ z
        var = c0 - w @ cvec
        err = jnp.sqrt(jnp.maximum(var, 0.0))
        ok = (jnp.sum(mask) > 0) & jnp.all(~jnp.isnan(chol_diag))
        nan = jnp.nan
        return (
            jnp.where(ok, pred, nan),
            jnp.where(ok, err, nan),
            jnp.sum(mask),
        )

    return jax.vmap(one_location)(pcoords)


class LocalPredictor:
    """OO surface mirroring the reference point Predictor
    (src/point_prediction.py:21-346)."""

    #: data size beyond which the direct-assembly path switches to the
    #: host kd-tree neighborhood search by default: the device masked
    #: top-k scans an N-wide distance row per location, whose sort-based
    #: lowering dominates wall-clock once N reaches ~10^5
    KD_AUTO_THRESHOLD = 100_000

    def __init__(
        self,
        mod,
        mf,
        covariates: Optional[pd.DataFrame] = None,
        materialize_cov: bool = True,
        neighbor_method: str = "auto",
    ) -> None:
        """``materialize_cov=False`` skips precomputing the n x n joint
        data covariance; each local system is instead assembled from its
        gathered neighborhood coordinates inside the vmapped program.
        Slightly more flops per location, O(n) memory total — use it when
        the data no longer fits as an n x n matrix (n >~ 50k on one chip;
        the estimation-side analog is estimate.vecchia).

        ``neighbor_method``: "device" (masked top-k over the full
        distance row — exact, O(N) per location on chip), "kd" (host
        kd-tree query feeding `_local_predict_gathered` — same
        all-within-max_dist semantics, O(log N) per location, the
        large-N path), or "auto" (kd once the data outgrows
        KD_AUTO_THRESHOLD on the direct-assembly path)."""
        if mod.n_procs != mf.n_procs:
            raise ValueError(
                "Number of theoretical processes different from empirical processes."
            )
        self.n_procs = mod.n_procs
        self.mod = mod
        self.mf = mf
        self.covariates = covariates
        self.materialize_cov = bool(materialize_cov)
        # joint covariance on the main grid, assembled once in one jit'd
        # program (reference _cov_blocks, src/point_prediction.py:98-113)
        from cokriging_tpu.cov.matern import joint_covariance_from_coords

        # Pad each process's data to a power-of-two profile: the padded
        # length is the static jit shape, the true count is a runtime
        # argument, so successive months (whose observation counts jitter)
        # reuse one compiled program. Padded lanes duplicate the first
        # coordinate (finite covariances) and are excluded from every
        # neighborhood by the n_valid mask.
        coords, values, n_valid = [], [], []
        for f in mf.fields:
            c = np.asarray(f.coords_main)
            v = np.asarray(f.values_main)
            n = int(c.shape[0])
            m = _bucket_pow2(n, floor=64)
            if m > n:
                c = np.concatenate([c, np.repeat(c[:1], m - n, axis=0)])
                v = np.concatenate([v, np.zeros(m - n, v.dtype)])
            coords.append(jnp.asarray(c))
            values.append(jnp.asarray(v))
            n_valid.append(n)
        if self.materialize_cov:
            self.joint_cov = joint_covariance_from_coords(
                mod.params, coords, mf.geodesic
            )
        else:
            # dtype-carrying placeholder (matches what the materialized
            # matrix's dtype would be); the direct_cov program never
            # reads its values
            self.joint_cov = jnp.zeros(
                (1, 1), jnp.asarray(mod.params.sigma).dtype
            )
        self._coords = tuple(coords)
        self._values = tuple(values)
        self._sizes = tuple(int(v.shape[0]) for v in self._values)
        self._n_valid = tuple(n_valid)
        if neighbor_method not in ("auto", "device", "kd"):
            raise ValueError(f"unknown neighbor_method {neighbor_method!r}")
        self.neighbor_method = neighbor_method
        self._trees = None  # built lazily by the kd path

    def _neighborhood_widths(self, pcoords, max_dist, cv, i):
        """Static per-process K: max neighborhood size over all locations,
        bucketed to a power of two so jit programs are reused across months
        (masked lanes make any K >= the true width exact). One device
        program returning p ints — shipping the full n_pred x n_data
        distance matrix to the host cost ~370 ms through the axon relay.

        Prediction locations are processed in chunks sized so the
        chunk x n_data distance buffer stays ~1 GB: one unchunked program
        at n_pred = 16k, N = 1M would allocate a 20+ GB matrix and OOM the
        chip (the large-N regime of examples/million_point_workflow.py).
        """
        n_data = max(self._sizes)
        chunk = max(64, _bucket_pow2(int(2.5e8 // max(n_data, 1))))
        n_pred = int(np.asarray(pcoords).shape[0])
        chunk = min(chunk, _bucket_pow2(max(n_pred, 1)))
        pad = (-n_pred) % chunk
        pc = np.asarray(pcoords)
        if pad:
            # padded lanes repeat the first location: real data, so they
            # can only repeat (never exceed) a real row's neighborhood
            pc = np.concatenate([pc, np.repeat(pc[:1], pad, axis=0)])
        n_valid = jnp.asarray(self._n_valid)
        kmax = np.zeros(len(self._coords), np.int64)
        for s in range(0, pc.shape[0], chunk):
            k = np.asarray(
                _kmax_program(
                    jnp.asarray(pc[s : s + chunk]),
                    self._coords,
                    n_valid,
                    max_dist,
                    i,
                    self.mf.geodesic,
                    cv,
                )
            )
            kmax = np.maximum(kmax, k)
        return tuple(
            min(_bucket_pow2(max(int(k), 1)), self._sizes[j])
            for j, k in enumerate(kmax)
        )

    def _embed(self, c):
        """Query/data points in the kd metric space: 3-D unit-sphere
        embedding for geodesic coords (chordal distance is monotone in
        great-circle, so neighbor SETS and radius filters match
        haversine's exactly), raw Euclidean otherwise."""
        if self.mf.geodesic:
            from cokriging_tpu.estimate.vecchia import _sphere_embed

            return _sphere_embed(c)
        return np.asarray(c, np.float64)

    def _kd_radius(self, max_dist):
        from cokriging_tpu.kernels.distance import EARTH_RADIUS_KM

        if self.mf.geodesic:
            half = min(max_dist / (2.0 * EARTH_RADIUS_KM), np.pi / 2)
            return 2.0 * np.sin(half)
        return float(max_dist)

    def _predict_kd(self, p_arr, max_dist, i, cv):
        """Large-N prediction: host kd-tree neighbor search + the
        gathered-window device program (`_local_predict_gathered`).

        Exact all-within-max_dist semantics: per-process neighborhood
        widths come from an exact radius count (`query_ball_point`), so
        the k-nearest query can never truncate a true neighborhood.
        Prediction locations stream through in bounded host chunks so
        gather buffers stay O(chunk * K) at any N.
        """
        from scipy.spatial import cKDTree

        if self._trees is None:
            pts = [
                self._embed(np.asarray(c)[: self._n_valid[j]])
                for j, c in enumerate(self._coords)
            ]
            self._trees = [cKDTree(p) for p in pts]
        r = self._kd_radius(max_dist)
        q_all = self._embed(np.asarray(p_arr))
        # exact per-process neighborhood widths over ALL locations first,
        # so every host chunk shares one compiled device program
        k_each = []
        for j, tree in enumerate(self._trees):
            counts = tree.query_ball_point(
                q_all, r * (1 + 1e-12), return_length=True, workers=-1
            )
            kmax = int(np.max(counts)) if len(counts) else 0
            k_each.append(
                min(_bucket_pow2(max(kmax, 1)), self._n_valid[j])
            )
        k_tot = max(sum(k_each), 1)
        pid = jnp.asarray(
            np.concatenate(
                [np.full(k, j) for j, k in enumerate(k_each)]
            ).astype(np.int32)
        )

        params = self.mod.params
        dt = np.asarray(self._values[0]).dtype
        dev_chunk = max(16, _bucket_pow2(int(6.7e7 // (k_tot * k_tot))))
        n_pred = int(p_arr.shape[0])
        dev_chunk = min(dev_chunk, _bucket_pow2(max(n_pred, 1)))
        host_chunk = dev_chunk * max(1, 65536 // dev_chunk)

        vals_np = [
            np.asarray(v)[: self._n_valid[j]]
            for j, v in enumerate(self._values)
        ]
        coords_np = [
            np.asarray(c)[: self._n_valid[j]]
            for j, c in enumerate(self._coords)
        ]
        out_pred, out_err, out_nnb = [], [], []
        for s in range(0, n_pred, host_chunk):
            pc = np.asarray(p_arr[s : s + host_chunk])
            q = q_all[s : s + host_chunk]
            gcs, gzs, masks = [], [], []
            for j, tree in enumerate(self._trees):
                k = k_each[j]
                dd, ii = tree.query(q, k=k, workers=-1)
                dd = dd.reshape(len(q), k)
                ii = ii.reshape(len(q), k)
                ok = dd <= r * (1 + 1e-12)  # also False for inf (k > n_j)
                ii = np.where(ok, ii, 0)
                gcs.append(coords_np[j][ii])
                gzs.append(np.where(ok, vals_np[j][ii], 0.0))
                masks.append(ok)
            gc = np.concatenate(gcs, axis=1).astype(dt)
            gz = np.concatenate(gzs, axis=1).astype(dt)
            mask = np.concatenate(masks, axis=1)
            # pad to the device chunk so all dispatches share one program
            pad = (-len(pc)) % dev_chunk
            if pad:
                gc = np.concatenate([gc, np.repeat(gc[:1], pad, axis=0)])
                gz = np.concatenate([gz, np.zeros((pad, k_tot), dt)])
                mask = np.concatenate(
                    [mask, np.zeros((pad, k_tot), bool)]
                )
                pc = np.concatenate([pc, np.repeat(pc[:1], pad, axis=0)])
            n_rows = len(pc)
            n_real = n_rows - pad
            cp, ce, cn = [], [], []
            for t in range(0, n_rows, dev_chunk):
                sl = slice(t, t + dev_chunk)
                pr, er, nb = _local_predict_gathered(
                    params,
                    jnp.asarray(gc[sl]),
                    jnp.asarray(gz[sl]),
                    pid,
                    jnp.asarray(mask[sl]),
                    jnp.asarray(pc[sl].astype(dt)),
                    i,
                    self.mf.geodesic,
                    cv,
                )
                cp.append(np.asarray(pr))
                ce.append(np.asarray(er))
                cn.append(np.asarray(nb))
            # trim THIS chunk's padding before accumulating: padded rows
            # are mask-less (all-NaN) and must not shift later chunks
            out_pred.append(np.concatenate(cp)[:n_real])
            out_err.append(np.concatenate(ce)[:n_real])
            out_nnb.append(np.concatenate(cn)[:n_real])
        pred = np.concatenate(out_pred)
        err = np.concatenate(out_err)
        n_nb = np.concatenate(out_nnb)
        return pred, err, n_nb

    def __call__(
        self,
        i: int,
        pcoords,
        max_dist: float = 1e3,
        postprocess: bool = True,
        _cv: bool = False,
    ) -> pd.DataFrame:
        params = self.mod.params
        p_arr = jnp.asarray(
            pcoords.values if isinstance(pcoords, pd.DataFrame) else np.atleast_2d(pcoords)
        )
        use_kd = not self.materialize_cov and (
            self.neighbor_method == "kd"
            or (
                self.neighbor_method == "auto"
                and max(self._sizes) > self.KD_AUTO_THRESHOLD
            )
        )
        if use_kd:
            pred, err, n_nb = self._predict_kd(
                np.asarray(p_arr), max_dist, i, _cv
            )
            return self._format_output(
                p_arr, pred, err, n_nb, max_dist, i, postprocess
            )
        k_each = self._neighborhood_widths(np.asarray(p_arr), max_dist, _cv, i)
        n_valid = tuple(jnp.asarray(n, jnp.int32) for n in self._n_valid)

        def run_batch(pc):
            return _local_predict_batch(
                params,
                self._coords,
                self._values,
                self.joint_cov,
                pc,
                max_dist,
                i,
                self.mf.geodesic,
                self._sizes,
                k_each,
                _cv,
                n_valid,
                direct_cov=not self.materialize_cov,
            )

        n_pred = int(p_arr.shape[0])
        if self.materialize_cov:
            pred, err, n_nb = run_batch(p_arr)
        else:
            # The direct-assembly path evaluates a (B, K, K) elementwise
            # Matern per dispatch whose fixed-point recurrences carry ~11
            # live K^2-sized buffers per location — vmapping every
            # location at once is O(n_pred * K^2) HBM and stalls/OOMs at
            # large n (observed: 4k cells x 1024-wide neighborhoods needs
            # >60 GB). Chunk locations so the live set stays a few GB; all
            # chunks share one compiled program (the last is padded).
            k_tot = max(sum(k_each), 1)
            chunk = max(16, _bucket_pow2(int(6.7e7 // (k_tot * k_tot))))
            # second ceiling: each lane's neighborhood search materializes
            # an n_data-wide distance row, so chunk x n_data must also be
            # bounded (~0.6 GB of rows; several live copies under top_k)
            n_data = max(self._sizes)
            chunk = min(chunk, max(16, _bucket_pow2(int(1.5e8 // n_data))))
            chunk = min(chunk, _bucket_pow2(n_pred))
            pad = (-n_pred) % chunk
            pc_all = jnp.concatenate(
                [p_arr, jnp.repeat(p_arr[:1], pad, axis=0)]
            ) if pad else p_arr
            parts = [
                run_batch(pc_all[s : s + chunk])
                for s in range(0, n_pred + pad, chunk)
            ]
            pred, err, n_nb = (
                jnp.concatenate([p[k] for p in parts])[:n_pred]
                for k in range(3)
            )
        return self._format_output(
            p_arr, pred, err, n_nb, max_dist, i, postprocess
        )

    def _format_output(self, p_arr, pred, err, n_nb, max_dist, i, postprocess):
        pred, err = np.asarray(pred), np.asarray(err)
        nan_mask = np.isnan(pred)
        if nan_mask.any():
            # Distinguish the reference's two NaN-and-continue lanes:
            # empty neighborhood (point_prediction.py:229-233) vs singular
            # local covariance (point_prediction.py:218-222).
            nb = np.asarray(n_nb)
            no_data = nan_mask & (nb == 0)
            singular = nan_mask & (nb > 0)
            if no_data.any():
                warnings.warn(
                    f"No data within maximum distance {max_dist} for"
                    f" {int(no_data.sum())} location(s); returning NaN."
                )
            if singular.any():
                warnings.warn(
                    f"Local covariance matrix is not positive definite for"
                    f" {int(singular.sum())} location(s) (invalid model"
                    f" parameters?); returning NaN."
                )
        c1, c2 = ("lat", "lon") if self.mf.geodesic else ("x", "y")
        df = pd.DataFrame(
            {
                c1: np.asarray(p_arr[:, 0]),
                c2: np.asarray(p_arr[:, 1]),
                "pred": pred,
                "pred_err": err,
            }
        )
        if postprocess:
            return postprocess_predictions(df, self.mf.fields[i], self.covariates)
        return df

    def cross_validation(
        self, i: int, max_dist: float = 1e3, postprocess: bool = True
    ) -> pd.DataFrame:
        """LOOCV at each data location, withholding the self-datum by the
        d > 0 rule (src/point_prediction.py:303-346)."""
        field = self.mf.fields[i]
        data_coords = np.asarray(field.coords_main)
        df = self.__call__(
            i, data_coords, max_dist=max_dist, postprocess=False, _cv=True
        )
        c1, c2 = ("lat", "lon") if self.mf.geodesic else ("d1", "d2")
        df.columns = [c1, c2, "pred", "pred_err"]
        if postprocess and field.trend is not None:
            trend = field.trend
            surf = np.asarray(field.spatial_trend_main)
            df["pred"] = (
                df["pred"] * trend.scale_fact
                + trend.spatial_mean
                + surf
                + trend.temporal_trend
            )
            df["pred_err"] = df["pred_err"] * trend.scale_fact
            df["data"] = inverse_transform_data(field)
        else:
            df["data"] = np.asarray(field.values_main)
        df["residual"] = df["data"] - df["pred"]
        return df[[c1, c2, "data", "pred", "residual", "pred_err"]]
