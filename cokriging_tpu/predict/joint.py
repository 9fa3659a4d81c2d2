"""Exact joint cokriging (one global simple-kriging system).

Re-design of the reference joint Predictor (src/joint_prediction.py:13-257):
the full (n1 + n2) x (n1 + n2) data covariance is assembled from Matern
blocks, factorized once by Cholesky (MXU path), and all prediction weights
come from triangular solves:

    W   = C^-1 K            (K = data-to-prediction cross-covariance)
    mu  = W^T z             (src/joint_prediction.py:68-77)
    Sig = K* - W^T K        (predictive covariance; err = sqrt(diag))

LOOCV: the reference deletes one row/column per datum and refactorizes the
whole system n times (src/joint_prediction.py:207-257). Withholding datum k
and predicting at its own location with the same model is algebraically the
bordered-system identity on the precision matrix P = C^-1:

    pred_k = z_k - (P z)_k / P_kk        var_k = 1 / P_kk

so the entire LOOCV sweep costs ONE factorization + one inverse. The naive
delete-row/col path is kept (``cross_validation(..., method='naive')``) as
a cross-check.
"""

import warnings
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from cokriging_tpu.cov.matern import (
    block_covariance,
    covariance,
    cross_covariance,
)
from cokriging_tpu.estimate.nll import joint_distance_blocks
from cokriging_tpu.kernels.distance import haversine_matrix, euclidean_matrix
from cokriging_tpu.predict.postprocess import postprocess_predictions


def _dist(a, b, geodesic):
    return haversine_matrix(a, b) if geodesic else euclidean_matrix(a, b)


def _joint_system(params, coords_tuple, pcoords, i, geodesic):
    """The three joint-cokriging covariance pieces for process i:

    - joint data covariance (src/joint_prediction.py:124-153),
    - data -> prediction cross-covariance stack (:104-122),
    - prediction-grid covariance with nugget (:94-102).
    """
    p = len(coords_tuple)
    dists = joint_distance_blocks(list(coords_tuple), geodesic=geodesic)
    joint_cov = block_covariance(params, dists)

    cross_rows = []
    for j in range(p):
        d = _dist(coords_tuple[j], pcoords, geodesic)
        if j == i:
            cross_rows.append(covariance(params, i, d, use_nugget=True))
        else:
            cross_rows.append(cross_covariance(params, i, j, d))
    pred_cross = jnp.concatenate(cross_rows, axis=0)

    dpp = _dist(pcoords, pcoords, geodesic)
    pred_cov = covariance(params, i, dpp, use_nugget=True)
    return joint_cov, pred_cross, pred_cov


@partial(jax.jit, static_argnames=("i", "geodesic", "n_sizes"))
def _joint_predict_core(params, coords_tuple, values_tuple, pcoords, i, geodesic, n_sizes):
    """Returns (pred, pred_err) at pcoords for process i.

    coords_tuple/values_tuple are per-process arrays on the main grid;
    n_sizes is the static tuple of their lengths (for block assembly).
    """
    joint_cov, pred_cross, pred_cov = _joint_system(
        params, coords_tuple, pcoords, i, geodesic
    )
    z = jnp.concatenate(values_tuple)
    weights = _refined_posdef_solve(joint_cov, pred_cross)  # (ndata, npred)
    pred = weights.T @ z
    pred_var = jnp.diagonal(pred_cov - weights.T @ pred_cross)
    pred_err = jnp.sqrt(jnp.maximum(pred_var, 0.0))
    return pred, pred_err


def _refined_posdef_solve(a, b, refine_iters: int = 2):
    """Solve a X = b for PD a via Cholesky, with mixed-precision iterative
    refinement when running in f32.

    On TPU, f64 is software-emulated (~50x slower) while f32 Cholesky rides
    the MXU; factorizing in the working dtype and applying `refine_iters`
    residual corrections recovers most of the lost accuracy (standard
    Wilkinson refinement — each pass multiplies the error by the f32
    rounding level). In f64 the extra passes are ~free and harmless.
    """
    chol = jax.scipy.linalg.cho_factor(a, lower=True)
    x = jax.scipy.linalg.cho_solve(chol, b)
    if refine_iters and a.dtype == jnp.float32:
        # the residual must be formed above working precision or the
        # correction is pure rounding noise; two f64 matmuls are cheap
        # next to the O(n^3) f32 factorization
        a64 = a.astype(jnp.float64)
        b64 = b.astype(jnp.float64)
        for _ in range(refine_iters):
            r = (b64 - a64 @ x.astype(jnp.float64)).astype(jnp.float32)
            x = x + jax.scipy.linalg.cho_solve(chol, r)
    return x


@partial(jax.jit, static_argnames=("i", "geodesic", "n_sizes", "n_samples"))
def _conditional_sample_core(
    params, coords_tuple, values_tuple, pcoords, key, i, geodesic, n_sizes,
    n_samples,
):
    """Conditional (posterior) Gaussian simulation at pcoords.

    The joint-cokriging predictive distribution is the full Gaussian
    posterior — mean ``W^T z`` and covariance ``K* - W^T K`` (the matrix
    whose diagonal the reference reads ``pred_err`` off,
    src/joint_prediction.py:74-78, discarding the off-diagonals). Sampling
    it gives equiprobable field realizations that honor the data, the model,
    AND the spatial correlation of the prediction error — the standard
    geostatistical "conditional simulation" the reference never implemented.

    The matrix square root uses eigh rather than Cholesky: the posterior is
    only positive *semi*-definite (exactly singular when pcoords touch data
    locations and the nugget is zero), and clipping negative eigenvalues to
    zero is the clean limit there, where a Cholesky would NaN.

    Returns (pred, pred_err, samples) with samples (n_samples, npred), in
    standardized units. The nugget rides the prediction covariance exactly
    as in prediction (``use_nugget=True`` — samples are of the observable
    process Z, not the nugget-free smooth component).
    """
    joint_cov, pred_cross, pred_cov = _joint_system(
        params, coords_tuple, pcoords, i, geodesic
    )
    z = jnp.concatenate(values_tuple)
    weights = _refined_posdef_solve(joint_cov, pred_cross)
    pred = weights.T @ z
    post_cov = pred_cov - weights.T @ pred_cross
    post_cov = 0.5 * (post_cov + post_cov.T)
    pred_err = jnp.sqrt(jnp.maximum(jnp.diagonal(post_cov), 0.0))
    # TPU's software-emulated f64 eigh fails to converge (NaN) on the
    # posterior's near-zero eigenvalue cluster; its native f32 eigh is
    # robust, and Monte-Carlo draws don't need an f64 matrix root. CPU
    # keeps full f64. (Backend is a trace-time constant.)
    root_dtype = post_cov.dtype
    if post_cov.dtype == jnp.float64 and jax.default_backend() == "tpu":
        root_dtype = jnp.float32
    w, u = jnp.linalg.eigh(post_cov.astype(root_dtype))
    root = (u * jnp.sqrt(jnp.maximum(w, 0.0))[None, :]).astype(post_cov.dtype)
    eps = jax.random.normal(key, (post_cov.shape[0], n_samples), post_cov.dtype)
    samples = (pred[:, None] + root @ eps).T
    return pred, pred_err, samples


@partial(jax.jit, static_argnames=("i", "geodesic"))
def _verify_core(params, coords_tuple, pcoords, i, geodesic):
    """Jitted PD probe of the bordered [pred, data] system. Eagerly this
    assembled an npred^2 K_nu block per-primitive through the device
    relay — 141 s of the simulation experiment's warm wall for a check
    whose answer is one boolean."""
    joint_cov, k, pred_cov = _joint_system(
        params, coords_tuple, pcoords, i, geodesic
    )
    bordered = jnp.block([[pred_cov, k.T], [k, joint_cov]])
    chol = jnp.linalg.cholesky(bordered)
    return jnp.any(jnp.isnan(chol))


@partial(jax.jit, static_argnames=("i", "geodesic", "n_sizes"))
def _loocv_core(params, coords_tuple, values_tuple, i, geodesic, n_sizes):
    """All-at-once LOOCV for process i via the precision-matrix identity."""
    dists = joint_distance_blocks(list(coords_tuple), geodesic=geodesic)
    joint_cov = block_covariance(params, dists)
    z = jnp.concatenate(values_tuple)
    chol = jax.scipy.linalg.cho_factor(joint_cov, lower=True)
    # blocked C^-1 (kernels/linalg.py): cho_solve with a square eye RHS
    # goes through XLA's triangular-solve expander, which schedules ~n/256
    # live matrix-sized temps on TPU (32.5 GB measured at n = 12.5k)
    from cokriging_tpu.kernels.linalg import spd_inverse_from_chol

    precision = spd_inverse_from_chol(jnp.tril(chol[0]))
    pz = precision @ z
    pkk = jnp.diagonal(precision)
    pred_all = z - pz / pkk
    var_all = 1.0 / pkk
    offset = sum(n_sizes[:i])
    sl = slice(offset, offset + n_sizes[i])
    return pred_all[sl], jnp.sqrt(jnp.maximum(var_all[sl], 0.0))


class JointPredictor:
    """OO surface mirroring the reference joint Predictor
    (src/joint_prediction.py:13-257)."""

    def __init__(
        self,
        mod,
        mf,
        covariates: Optional[pd.DataFrame] = None,
    ) -> None:
        if mod.n_procs != mf.n_procs:
            raise ValueError(
                "Number of theoretical processes different from empirical processes."
            )
        self.n_procs = mod.n_procs
        self.mod = mod
        self.mf = mf
        self.covariates = covariates

    def _data(self):
        coords = tuple(f.coords_main for f in self.mf.fields)
        values = tuple(f.values_main for f in self.mf.fields)
        sizes = tuple(int(v.shape[0]) for v in values)
        return coords, values, sizes

    def __call__(
        self,
        i: int,
        pcoords,
        postprocess: bool = True,
        cv_ix: Optional[int] = None,
    ) -> pd.DataFrame:
        """Predict process i at pcoords ([lat, lon] rows, DataFrame or array).

        ``cv_ix`` reproduces the reference's single-point withholding path
        (delete datum cv_ix of process i, predict at pcoords).
        """
        params = self.mod.params
        coords, values, sizes = self._data()
        p_arr = jnp.asarray(
            pcoords.values if isinstance(pcoords, pd.DataFrame) else np.atleast_2d(pcoords)
        )
        geo = self.mf.geodesic

        if cv_ix is not None:
            coords = list(coords)
            values = list(values)
            coords[i] = jnp.delete(coords[i], cv_ix, axis=0)
            values[i] = jnp.delete(values[i], cv_ix, axis=0)
            coords, values = tuple(coords), tuple(values)
            sizes = tuple(int(v.shape[0]) for v in values)
        else:
            self._verify_model(params, coords, p_arr, i, geo)

        pred, pred_err = _joint_predict_core(
            params, coords, values, p_arr, i, geo, sizes
        )

        c1, c2 = ("lat", "lon") if geo else ("x", "y")
        df = pd.DataFrame(
            {
                c1: np.asarray(p_arr[:, 0]),
                c2: np.asarray(p_arr[:, 1]),
                "pred": np.asarray(pred),
                "pred_err": np.asarray(pred_err),
            }
        )
        if postprocess:
            return postprocess_predictions(
                df, self.mf.fields[i], self.covariates
            )
        return df

    def _verify_model(self, params, coords, pcoords, i, geodesic):
        """PD check of the bordered [pred, data] covariance by trial
        Cholesky (src/joint_prediction.py:260-274)."""
        if bool(_verify_core(params, coords, pcoords, i, geodesic)):
            warnings.warn(
                "Prediction joint covariance matrix is not positive definite;"
                " model technically invalid."
            )

    def sample(
        self,
        i: int,
        pcoords,
        n_samples: int = 1,
        seed: int = 0,
        postprocess: bool = True,
    ):
        """Conditional simulation: draw ``n_samples`` realizations of
        process i at pcoords from the full joint-cokriging posterior
        (mean + covariance, not just the diagonal the reference reports).

        Returns ``(df, samples)``: the prediction frame (same shape as
        ``__call__``) and an ``(n_samples, len(df))`` array of field
        realizations aligned with the frame's rows, in the same units
        (data scale when ``postprocess=True``, which applies the identical
        back-transform chain of src/point_prediction.py:251-301 to every
        realization).
        """
        import jax

        params = self.mod.params
        coords, values, sizes = self._data()
        p_arr = jnp.asarray(
            pcoords.values if isinstance(pcoords, pd.DataFrame) else np.atleast_2d(pcoords)
        )
        geo = self.mf.geodesic
        self._verify_model(params, coords, p_arr, i, geo)
        key = jax.random.PRNGKey(seed)
        pred, pred_err, samples = _conditional_sample_core(
            params, coords, values, p_arr, key, i, geo, sizes, int(n_samples)
        )
        samples = np.asarray(samples)

        c1, c2 = ("lat", "lon") if geo else ("x", "y")
        df = pd.DataFrame(
            {
                c1: np.asarray(p_arr[:, 0]),
                c2: np.asarray(p_arr[:, 1]),
                "pred": np.asarray(pred),
                "pred_err": np.asarray(pred_err),
            }
        )
        if not postprocess:
            return df, samples

        # Back-transform every realization with the same affine map the
        # prediction frame gets: recover the additive surface A and scale s
        # from the postprocessed frame itself (s = scale_fact;
        # A = pred' - s * pred), so the covariate-merge/row-drop logic
        # lives in exactly one place (postprocess_predictions).
        df_in = df.copy()
        df_in["_row_ix"] = np.arange(len(df_in))
        out = postprocess_predictions(df_in, self.mf.fields[i], self.covariates)
        keep = out["_row_ix"].to_numpy().astype(int)
        trend = self.mf.fields[i].trend
        s = 1.0 if trend is None else trend.scale_fact
        additive = out["pred"].to_numpy() - s * df["pred"].to_numpy()[keep]
        samples = samples[:, keep] * s + additive[None, :]
        return out.drop(columns="_row_ix"), samples

    def cross_validation(
        self, i: int, postprocess: bool = True, method: str = "fast"
    ) -> pd.DataFrame:
        """LOOCV at every data location of process i
        (src/joint_prediction.py:207-257).

        method='fast' uses the one-factorization precision identity;
        method='naive' replays the reference's delete-and-refactorize loop
        (useful as a numerical cross-check).
        """
        params = self.mod.params
        coords, values, sizes = self._data()
        geo = self.mf.geodesic
        data_coords = np.asarray(coords[i])
        data_values = np.asarray(values[i])

        if method == "fast":
            pred, pred_err = _loocv_core(params, coords, values, i, geo, sizes)
            pred, pred_err = np.asarray(pred), np.asarray(pred_err)
        else:
            preds, errs = [], []
            for k in range(sizes[i]):
                df_k = self.__call__(
                    i, data_coords[k], postprocess=False, cv_ix=k
                )
                preds.append(df_k["pred"].iloc[0])
                errs.append(df_k["pred_err"].iloc[0])
            pred, pred_err = np.array(preds), np.array(errs)

        from cokriging_tpu.predict.postprocess import loocv_frame

        return loocv_frame(self.mf.fields[i], geo, pred, pred_err, postprocess)
