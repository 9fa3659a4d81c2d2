"""Matrix-free exact joint cokriging at scale (blocked preconditioned CG).

``JointPredictor`` (predict/joint.py) answers the reference's one-global-
system formulation (src/joint_prediction.py:35-153) by materializing and
factorizing the full (sum n_i)^2 joint covariance — O(N^2) memory, which
caps N around ~30k per chip at f32. This module solves the *identical*
simple-kriging system without ever holding the matrix:

    W   = C^-1 K          (K = data-to-prediction cross-covariance)
    mu  = K^T (C^-1 z)
    var = diag(K*) - colsum(K * C^-1 K)

Covariance rows are re-assembled on the fly one row block at a time — a
distance tile plus ``gathered_covariance`` (the same mixed-process
conventions as the dense path: nugget on exact-zero same-process
distances, rho sigma_i sigma_j cross blocks; src/model.py:193-207) — and
immediately folded into an MXU matmul against the batch of CG vectors.
Peak memory is O(block x N + N x rhs_batch); flops remain O(N^2) per CG
sweep but ride the MXU at the working precision.

The conjugate-gradient solver is Jacobi-preconditioned and runs every
right-hand side of a chunk in one program with *per-column* step sizes.
With ``mesh=`` the row-block loop runs under ``shard_map`` with rows
sharded across the device mesh; a tiled ``all_gather`` of the partial
matvec is the only collective, so the whole CG iteration stays on ICI.

This is the TPU-native replacement for "just buy more RAM": exact joint
cokriging at n ~ 100k+ where the reference (and the dense JointPredictor)
cannot assemble the system at all. Agreement with JointPredictor is
validated to solver tolerance in tests/test_iterative.py.
"""

import warnings
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
from jax.sharding import PartitionSpec as P

from cokriging_tpu.cov.matern import gathered_covariance
from cokriging_tpu.kernels.distance import euclidean_matrix, haversine_matrix
from cokriging_tpu.predict.postprocess import postprocess_predictions


def _dist(a, b, geodesic):
    return haversine_matrix(a, b) if geodesic else euclidean_matrix(a, b)


def _tiled_rows_matvec(
    params, row_coords, row_procs, col_coords, col_procs, V, geodesic, block
):
    """y = C[rows, cols] @ V, assembling C one (block, n_cols) tile at a
    time inside a scan so the row set's covariance never materializes.

    ``row_coords.shape[0]`` must be a multiple of ``block`` (callers pad).
    """
    n_rows = row_coords.shape[0]

    def body(carry, k):
        ca = jax.lax.dynamic_slice_in_dim(row_coords, k * block, block)
        pa = jax.lax.dynamic_slice_in_dim(row_procs, k * block, block)
        cov = gathered_covariance(
            params, _dist(ca, col_coords, geodesic), pa, col_procs
        )
        return carry, cov @ V

    _, tiles = jax.lax.scan(body, 0, jnp.arange(n_rows // block))
    return tiles.reshape(n_rows, V.shape[1])


def _matvec_fn(geodesic, block, mesh):
    """Build V -> C V for the stacked joint system, masked on padded rows.

    Padded lanes stay identically zero through CG: the right-hand sides are
    masked, x starts at zero, and every matvec output is re-masked — so the
    effective operator is the SPD restriction of C to the real rows.
    """
    if mesh is None:

        def matvec(params, coords, procs, mask, V):
            y = _tiled_rows_matvec(
                params, coords, procs, coords, procs, V, geodesic, block
            )
            return y * mask[:, None]

        return matvec

    from jax import shard_map

    axis = mesh.axis_names[0]

    def matvec(params, coords, procs, mask, V):
        @partial(
            shard_map,
            mesh=mesh,
            in_specs=(P(), P(axis), P(axis), P(axis), P(), P(), P()),
            out_specs=P(),
            check_vma=False,
        )
        def inner(prm, c_loc, p_loc, m_loc, c_full, p_full, v_full):
            y = _tiled_rows_matvec(
                prm, c_loc, p_loc, c_full, p_full, v_full, geodesic, block
            )
            y = y * m_loc[:, None]
            return jax.lax.all_gather(y, axis, axis=0, tiled=True)

        return inner(params, coords, procs, mask, coords, procs, V)

    return matvec


@partial(jax.jit, static_argnames=("geodesic", "block", "mesh"))
def _pcg_init_core(params, coords, procs, mask, B, *, geodesic, block, mesh):
    """Initial CG state for the masked system (one small program)."""
    diag = params.sigma[procs] ** 2 + params.nugget[procs]
    B = B * mask[:, None]
    bnorm = jnp.maximum(jnp.linalg.norm(B, axis=0), jnp.finfo(B.dtype).tiny)
    x = jnp.zeros_like(B)
    r = B
    z = r / diag[:, None]
    p = z
    rz = jnp.sum(r * z, axis=0)
    return (x, r, p, rz), diag, bnorm


@partial(jax.jit, static_argnames=("geodesic", "block", "mesh", "seg"))
def _pcg_segment_core(
    params, coords, procs, mask, diag, bnorm, state, tol,
    *, geodesic, block, mesh, seg,
):
    """Up to ``seg`` CG iterations from ``state`` (one bounded dispatch)."""
    matvec = _matvec_fn(geodesic, block, mesh)

    def mv(v):
        return matvec(params, coords, procs, mask, v)

    def cond(s):
        k, _, r, _, _ = s
        rel = jnp.linalg.norm(r, axis=0) / bnorm
        return (k < seg) & (jnp.max(rel) > tol)

    def body(s):
        k, x, r, p, rz = s
        ap = mv(p)
        den = jnp.sum(p * ap, axis=0)
        alpha = jnp.where(den > 0, rz / jnp.where(den > 0, den, 1.0), 0.0)
        x = x + alpha[None, :] * p
        r = r - alpha[None, :] * ap
        z = r / diag[:, None]
        rz_new = jnp.sum(r * z, axis=0)
        beta = jnp.where(rz > 0, rz_new / jnp.where(rz > 0, rz, 1.0), 0.0)
        p = z + beta[None, :] * p
        return k + 1, x, r, p, rz_new

    x, r, p, rz = state
    k, x, r, p, rz = jax.lax.while_loop(
        cond, body, (jnp.int32(0), x, r, p, rz)
    )
    rel = jnp.max(jnp.linalg.norm(r, axis=0) / bnorm)
    return (x, r, p, rz), k, rel


#: Per-dispatch wall-clock budget for a CG segment (seconds). The remote
#: TPU worker kills dispatches running much past ~40-60 s (deadman);
#: segments re-enter with state carried on device, so the budget costs
#: only dispatch latency.
SEG_BUDGET_S = 20.0
_SEG_CHOICES = (1, 2, 4, 8, 16, 32)  # pow2: bounds distinct compiles


def _pcg_host(
    params, coords, procs, mask, B, tol, maxiter,
    *, geodesic, block, mesh,
):
    """Segmented CG driver: bounded dispatches, device-resident state.

    Runs `_pcg_segment_core` repeatedly, adapting the per-dispatch
    iteration count to SEG_BUDGET_S from the measured per-iteration wall
    (snapped to powers of two so at most ~6 distinct programs compile).
    Segmentation exists because a single dispatch whose while_loop runs
    much past ~40 s trips the remote TPU worker's deadman and kills the
    worker outright (measured: 15 iterations x 2.6 s fine, 40 fatal,
    n = 8k); the segmented form is semantically one Jacobi-preconditioned
    CG with per-column step sizes (converged columns are frozen by the
    zero-guarded alpha/beta).
    """
    import time as _time

    statics = dict(geodesic=geodesic, block=block, mesh=mesh)
    state, diag, bnorm = _pcg_init_core(
        params, coords, procs, mask, B, **statics
    )
    total = 0
    rel = np.inf
    seg = 2
    while total < maxiter:
        seg_eff = min(seg, max(maxiter - total, 1))
        # snap to the pow2 menu (<= seg_eff) to reuse compiled programs
        seg_eff = max(s for s in _SEG_CHOICES if s <= max(seg_eff, 1))
        t0 = _time.perf_counter()
        state, k, rel_j = _pcg_segment_core(
            params, coords, procs, mask, diag, bnorm, state, tol,
            seg=seg_eff, **statics,
        )
        k = int(k)
        rel = float(rel_j)
        dt = _time.perf_counter() - t0
        total += k
        if rel <= tol or k < seg_eff:
            break
        per_iter = max(dt / max(k, 1), 1e-3)
        seg = max(1, int(SEG_BUDGET_S / per_iter))
    return state[0], total, rel


def _solve_core(
    params, coords, procs, mask, B, tol, maxiter, *, geodesic, block, mesh
):
    """X = C^-1 B for the (padded, masked) stacked joint system
    (segmented host driver; see _pcg_host)."""
    return _pcg_host(
        params, coords, procs, mask, B, tol, maxiter,
        geodesic=geodesic, block=block, mesh=mesh,
    )


@partial(jax.jit, static_argnames=("i", "geodesic"))
def _predict_K_core(params, coords, procs, mask, a, pchunk, *, i, geodesic):
    """(K, pred) for one prediction chunk.

    K follows src/joint_prediction.py:104-122 exactly: marginal rows carry
    the nugget at exact-zero distance (use_nugget=True), cross rows do not
    — both fall out of ``gathered_covariance`` with the prediction side's
    process ids all equal to i.
    """
    pprocs = jnp.full((pchunk.shape[0],), i, dtype=procs.dtype)
    d = _dist(coords, pchunk, geodesic)
    K = gathered_covariance(params, d, procs, pprocs) * mask[:, None]
    pred = K.T @ a[:, 0]
    return K, pred


def _predict_chunk_core(
    params, coords, procs, mask, a, pchunk, tol, maxiter,
    *, i, geodesic, block, mesh, compute_err,
):
    """(pred, pred_err, cg_iters, cg_resid) for one prediction chunk —
    cross-covariance assembly in one jit, the error solves through the
    SEGMENTED CG driver (bounded dispatches, see _pcg_host)."""
    K, pred = _predict_K_core(
        params, coords, procs, mask, a, pchunk, i=i, geodesic=geodesic
    )
    if not compute_err:
        nan = jnp.full_like(pred, jnp.nan)
        return pred, nan, 0, 0.0
    X, iters, resid = _pcg_host(
        params, coords, procs, mask, K, tol, maxiter,
        geodesic=geodesic, block=block, mesh=mesh,
    )
    # diag(K*) = sigma_i^2 M(0) + nugget_i (prediction-grid covariance
    # diagonal, src/joint_prediction.py:94-102)
    sill0 = params.sigma[i] ** 2 + params.nugget[i]
    var = sill0 - jnp.sum(K * X, axis=0)
    return pred, jnp.sqrt(jnp.maximum(var, 0.0)), iters, resid


@jax.jit
def _unit_cols_core(rows, mask, dtype_probe):
    """(N, q) unit-vector columns for the given rows (tiny program)."""
    q = rows.shape[0]
    return (
        jnp.zeros((mask.shape[0], q), dtype_probe.dtype)
        .at[rows, jnp.arange(q)]
        .set(1.0)
    )


def _loocv_chunk_core(
    params, coords, procs, mask, z, rows, tol, maxiter,
    *, geodesic, block, mesh,
):
    """LOOCV for one chunk of data rows via unit-vector precision columns.

    Solves X = C^-1 E_rows (one multi-RHS segmented CG); by symmetry of
    C^-1, column j of X is row ``rows[j]`` of the precision matrix, so

        pkk_j = X[rows_j, j],   (C^-1 z)_{rows_j} = X[:, j]^T z,

    which feed the standard LOOCV identity (predict/joint.py:_loocv_core,
    src/joint_prediction.py:207-257 semantics):

        pred_j = z_j - (C^-1 z)_j / pkk_j,   var_j = 1 / pkk_j.

    Cost per chunk equals one error-bearing prediction chunk of
    ``__call__`` (same multi-RHS CG through the same matvec), so LOOCV at
    every main-grid point costs what predicting that many points costs —
    vs the reference's O(n) full refactorizations.
    """
    q = rows.shape[0]
    e = _unit_cols_core(rows, mask, z)
    X, iters, resid = _pcg_host(
        params, coords, procs, mask, e, tol, maxiter,
        geodesic=geodesic, block=block, mesh=mesh,
    )
    pkk = X[rows, jnp.arange(q)]
    cz = X.T @ (z * mask)
    pred = z[rows] - cz / pkk
    var = 1.0 / pkk
    return pred, jnp.sqrt(jnp.maximum(var, 0.0)), iters, resid


class IterativeJointPredictor:
    """Exact joint cokriging without materializing the joint covariance.

    Drop-in for ``JointPredictor.__call__`` semantics (same system, same
    conventions, results equal to solver tolerance) at observation counts
    where the dense path cannot allocate the matrix. Not a new
    approximation: CG run to ``tol`` *is* the exact solve.

    Args:
        mod / mf / covariates: as JointPredictor.
        block: row-tile height of the matrix-free matvec. Peak memory per
            matvec is O(block x N); raise it until VMEM/HBM pushes back.
        rhs_batch: prediction points solved per CG program. Each chunk
            reuses one compiled program (the last chunk is padded to size).
        tol: relative-residual CG stopping tolerance.
        maxiter: CG iteration cap; a non-converged solve warns (the
            reference's optimization warning analog, src/model.py:313-314).
        mesh: optional ``jax.sharding.Mesh`` — shards the matvec's row
            blocks across devices (tiled all_gather is the only
            collective).
    """

    def __init__(
        self,
        mod,
        mf,
        covariates: Optional[pd.DataFrame] = None,
        *,
        block: int = 512,
        rhs_batch: int = 256,
        tol: float = 1e-6,
        maxiter: int = 1000,
        mesh=None,
    ) -> None:
        if mod.n_procs != mf.n_procs:
            raise ValueError(
                "Number of theoretical processes different from empirical processes."
            )
        self.n_procs = mod.n_procs
        self.mod = mod
        self.mf = mf
        self.covariates = covariates
        self.block = int(block)
        self.rhs_batch = int(rhs_batch)
        self.tol = float(tol)
        self.maxiter = int(maxiter)
        self.mesh = mesh
        self.last_diagnostics = None

    def _stacked(self):
        """Stack per-process main-grid data into one (N, 2) coordinate
        array + process-id vector, padded so the row-block scan (and, under
        a mesh, every per-device shard) tiles evenly."""
        coords = np.concatenate(
            [np.asarray(f.coords_main) for f in self.mf.fields]
        )
        procs = np.concatenate(
            [
                np.full(f.coords_main.shape[0], k, dtype=np.int32)
                for k, f in enumerate(self.mf.fields)
            ]
        )
        z = np.concatenate([np.asarray(f.values_main) for f in self.mf.fields])
        n = coords.shape[0]
        mult = self.block * (self.mesh.devices.size if self.mesh is not None else 1)
        pad = (-n) % mult
        if pad:
            coords = np.concatenate([coords, np.repeat(coords[-1:], pad, 0)])
            procs = np.concatenate([procs, np.repeat(procs[-1:], pad)])
            z = np.concatenate([z, np.zeros(pad, z.dtype)])
        mask = np.zeros(n + pad, dtype=coords.dtype)
        mask[:n] = 1.0
        return (
            jnp.asarray(coords),
            jnp.asarray(procs),
            jnp.asarray(z),
            jnp.asarray(mask),
            n,
        )

    def __call__(
        self,
        i: int,
        pcoords,
        postprocess: bool = True,
        compute_err: bool = True,
    ) -> pd.DataFrame:
        """Predict process i at pcoords ([lat, lon] rows, DataFrame or
        array). ``compute_err=False`` skips the per-point variance solves
        (one 1-RHS CG total instead of one ``rhs_batch``-RHS CG per chunk)
        and returns NaN ``pred_err``."""
        params = self.mod.params
        coords, procs, z, mask, n = self._stacked()
        geo = self.mf.geodesic
        p_arr = np.asarray(
            pcoords.values if isinstance(pcoords, pd.DataFrame) else np.atleast_2d(pcoords)
        ).astype(np.asarray(coords).dtype)
        statics = dict(geodesic=geo, block=self.block, mesh=self.mesh)

        a, it0, res0 = _solve_core(
            params, coords, procs, mask, z[:, None], self.tol, self.maxiter,
            **statics,
        )
        diags = [(int(it0), float(res0))]

        npred = p_arr.shape[0]
        q = self.rhs_batch
        preds, errs = [], []
        for lo in range(0, npred, q):
            chunk = p_arr[lo : lo + q]
            npad = q - chunk.shape[0]
            if npad:
                chunk = np.concatenate([chunk, np.repeat(chunk[-1:], npad, 0)])
            pred_c, err_c, it_c, res_c = _predict_chunk_core(
                params, coords, procs, mask, a, jnp.asarray(chunk),
                self.tol, self.maxiter, i=i, compute_err=compute_err,
                **statics,
            )
            diags.append((int(it_c), float(res_c)))
            keep = q - npad
            preds.append(np.asarray(pred_c)[:keep])
            errs.append(np.asarray(err_c)[:keep])
        self.last_diagnostics = diags
        worst = max(r for _, r in diags)
        if worst > 10.0 * self.tol:
            warnings.warn(
                f"iterative joint solve did not converge (relative residual "
                f"{worst:.2e} > tol {self.tol:.0e} after maxiter="
                f"{self.maxiter}); results are approximate."
            )

        c1, c2 = ("lat", "lon") if geo else ("x", "y")
        df = pd.DataFrame(
            {
                c1: p_arr[:, 0],
                c2: p_arr[:, 1],
                "pred": np.concatenate(preds),
                "pred_err": np.concatenate(errs),
            }
        )
        if postprocess:
            return postprocess_predictions(df, self.mf.fields[i], self.covariates)
        return df

    def cross_validation(
        self, i: int, postprocess: bool = True
    ) -> pd.DataFrame:
        """Matrix-free LOOCV at every data location of process i — the
        capability the dense ``JointPredictor.cross_validation`` provides
        but cannot scale (its precision identity materializes C^-1). Exact
        to CG tolerance: chunks of unit-vector solves recover the needed
        precision rows through the same matrix-free matvec (see
        _loocv_chunk_core); results match the dense fast identity to
        solver tolerance (tests/test_iterative.py)."""
        params = self.mod.params
        coords, procs, z, mask, n = self._stacked()
        geo = self.mf.geodesic
        sizes = [int(f.coords_main.shape[0]) for f in self.mf.fields]
        offset = sum(sizes[:i])
        ni = sizes[i]
        statics = dict(geodesic=geo, block=self.block, mesh=self.mesh)

        q = self.rhs_batch
        preds, errs, diags = [], [], []
        for lo in range(0, ni, q):
            rows = np.arange(lo, min(lo + q, ni), dtype=np.int32) + offset
            npad = q - rows.shape[0]
            if npad:  # duplicate columns solve the same system; discarded
                rows = np.concatenate([rows, np.repeat(rows[-1:], npad)])
            pred_c, err_c, it_c, res_c = _loocv_chunk_core(
                params, coords, procs, mask, z, jnp.asarray(rows),
                self.tol, self.maxiter, **statics,
            )
            diags.append((int(it_c), float(res_c)))
            keep = q - npad
            preds.append(np.asarray(pred_c)[:keep])
            errs.append(np.asarray(err_c)[:keep])
        self.last_diagnostics = diags
        worst = max(r for _, r in diags)
        if worst > 10.0 * self.tol:
            warnings.warn(
                f"iterative LOOCV solves did not converge (relative residual "
                f"{worst:.2e} > tol {self.tol:.0e} after maxiter="
                f"{self.maxiter}); results are approximate."
            )

        from cokriging_tpu.predict.postprocess import loocv_frame

        return loocv_frame(
            self.mf.fields[i], geo, np.concatenate(preds),
            np.concatenate(errs), postprocess,
        )
