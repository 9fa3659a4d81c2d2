"""Space-time EDA statistics: per-cell detrending and lagged
cross-correlation.

Re-design of the reference stat_tools (src/stat_tools.py) as NaN-masked jnp
kernels over (..., T) arrays. The reference parallelized per-cell Python
loops with dask (src/stat_tools.py:85-94, 165-178); here the cell axes are
plain vectorized dimensions of one jit'd program — an entire lon x lat cube
is one XLA call, and the lag search (src/stat_tools.py:181-233) evaluates
every lag as a batched dimension.

Masking conventions follow the reference's numpy.ma semantics:
- means/sums ignore NaN entries;
- the cross term sums over pairwise-valid entries, while each self term
  sums over its own valid entries (np.ma propagation in
  src/stat_tools.py:109-125);
- a ``tau`` threshold NaNs out cells with fewer than tau valid pairs.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd


def count_valid(x, axis=-1):
    """Non-NaN count along the time axis (src/stat_tools.py:9-27)."""
    return jnp.sum(jnp.isfinite(jnp.asarray(x)), axis=axis).astype(float)


@jax.jit
def _linear_fit(x):
    """Masked least-squares line on integer indices; returns (fitted, slope).

    fitted has x's shape with NaN where x is NaN (src/stat_tools.py:31-53).
    """
    x = jnp.asarray(x, jnp.result_type(float))
    t = jnp.arange(x.shape[-1], dtype=x.dtype)
    m = jnp.isfinite(x)
    w = m.astype(x.dtype)
    n = jnp.maximum(jnp.sum(w, -1, keepdims=True), 1.0)
    xm = jnp.where(m, x, 0.0)
    tbar = jnp.sum(w * t, -1, keepdims=True) / n
    ybar = jnp.sum(xm, -1, keepdims=True) / n
    tc = (t - tbar) * w
    sxx = jnp.sum(tc * tc, -1, keepdims=True)
    sxy = jnp.sum(tc * (xm - ybar * w), -1, keepdims=True)
    slope = jnp.where(sxx > 0, sxy / jnp.maximum(sxx, 1e-300), 0.0)
    fitted = ybar + slope * (t - tbar)
    fitted = jnp.where(m, fitted, jnp.nan)
    return fitted, slope[..., 0]


def simple_linear_regression(x):
    """Fitted trend line of a 1-d series (src/stat_tools.py:31-53)."""
    fitted, _ = _linear_fit(jnp.atleast_1d(jnp.asarray(x, float)))
    return np.asarray(fitted)


def detrend(x):
    """(residuals, slope) per series along the last axis
    (src/stat_tools.py:56-94)."""
    x = jnp.asarray(x, jnp.result_type(float))
    fitted, slope = _linear_fit(x)
    resid = jnp.where(jnp.isfinite(x), x - fitted, jnp.nan)
    return resid, slope


@partial(jax.jit, static_argnames=("lag",))
def _xcor_masked(z1, z2, lag):
    """Masked lagged cross-correlation along the last axis
    (src/stat_tools.py:98-162). Means remove each series' own masked mean;
    after the lag shift, the cross sum runs over pairwise-valid entries
    while the self sums run over each series' own valid entries."""
    m1 = jnp.isfinite(z1)
    m2 = jnp.isfinite(z2)
    n1 = jnp.maximum(jnp.sum(m1, -1, keepdims=True), 1)
    n2 = jnp.maximum(jnp.sum(m2, -1, keepdims=True), 1)
    x = jnp.where(m1, z1, 0.0) - jnp.sum(jnp.where(m1, z1, 0.0), -1, keepdims=True) / n1
    y = jnp.where(m2, z2, 0.0) - jnp.sum(jnp.where(m2, z2, 0.0), -1, keepdims=True) / n2
    x = jnp.where(m1, x, 0.0)
    y = jnp.where(m2, y, 0.0)
    if lag != 0:
        x = x[..., lag:]
        m1 = m1[..., lag:]
        y = y[..., : -lag]
        m2 = m2[..., : -lag]
    both = m1 & m2
    sxy = jnp.sum(jnp.where(both, x * y, 0.0), -1)
    sxx = jnp.sum(jnp.where(m1, x * x, 0.0), -1)
    syy = jnp.sum(jnp.where(m2, y * y, 0.0), -1)
    denom = jnp.sqrt(sxx) * jnp.sqrt(syy)
    xcor = jnp.where(denom > 0, sxy / jnp.maximum(denom, 1e-300), jnp.nan)
    n_pairs = jnp.sum(both, -1)
    return xcor, n_pairs


def xcor_1d(v1, v2, lag=0, tau=None):
    """Lagged cross-correlation of two 1-d series (src/stat_tools.py:98-125)."""
    xc, n = _xcor_masked(
        jnp.atleast_1d(jnp.asarray(v1, float)),
        jnp.atleast_1d(jnp.asarray(v2, float)),
        int(lag),
    )
    if tau is not None and int(n) < tau:
        return float("nan")
    return float(xc)


def xcor_nd(Z1, Z2, lag=0, tau=None):
    """Gridded lagged cross-correlation over (..., T) cubes
    (src/stat_tools.py:128-162)."""
    xc, n = _xcor_masked(
        jnp.asarray(Z1, float), jnp.asarray(Z2, float), int(lag)
    )
    if tau is not None:
        xc = jnp.where(n >= tau, xc, jnp.nan)
    return np.asarray(xc)


def apply_xcor(Z1, Z2, lag=0, tau=None):
    """Detrend both cubes, then lagged cross-correlation
    (src/stat_tools.py:165-178)."""
    r1, _ = detrend(jnp.asarray(Z1, float))
    r2, _ = detrend(jnp.asarray(Z2, float))
    return xcor_nd(r1, r2, lag=lag, tau=tau)


def optim_lag_nd(Z1, Z2, lag_bnds, tau=None):
    """Per-cell lag maximizing |xcor| over an integer range
    (src/stat_tools.py:181-233). Returns dict(optim_lag, xcor)."""
    r1, _ = detrend(jnp.asarray(Z1, float))
    r2, _ = detrend(jnp.asarray(Z2, float))
    lags = np.arange(*lag_bnds)
    stack = []
    for lag in lags:
        xc, n = _xcor_masked(r1, r2, int(lag))
        if tau is not None:
            xc = jnp.where(n >= tau, xc, jnp.nan)
        stack.append(xc)
    xcor_stack = jnp.stack(stack, axis=-1)
    score = jnp.where(jnp.isfinite(xcor_stack), jnp.abs(xcor_stack), -jnp.inf)
    best = jnp.argmax(score, axis=-1)
    xcor_best = jnp.take_along_axis(xcor_stack, best[..., None], axis=-1)[..., 0]
    return {
        "optim_lag": np.asarray(lags[np.asarray(best)]),
        "xcor": np.asarray(xcor_best),
    }


@partial(jax.jit, static_argnames=("lag",))
def _xcov_masked(z1, z2, lag):
    """Masked lagged cross-covariance along the last axis — the notebook's
    Cressie–Wikle Eq 5.4 estimator (research/analysis_sif_xco2_crosscov.ipynb
    `compute_xcov_nd`): each cube is centered by its own full-series masked
    mean *before* the lag truncation, then the pairwise-valid products are
    averaged (np.ma mean semantics)."""
    m1 = jnp.isfinite(z1)
    m2 = jnp.isfinite(z2)
    n1 = jnp.maximum(jnp.sum(m1, -1, keepdims=True), 1)
    n2 = jnp.maximum(jnp.sum(m2, -1, keepdims=True), 1)
    x = jnp.where(m1, z1, 0.0) - jnp.sum(jnp.where(m1, z1, 0.0), -1, keepdims=True) / n1
    y = jnp.where(m2, z2, 0.0) - jnp.sum(jnp.where(m2, z2, 0.0), -1, keepdims=True) / n2
    x = jnp.where(m1, x, 0.0)
    y = jnp.where(m2, y, 0.0)
    if lag != 0:
        x = x[..., lag:]
        m1 = m1[..., lag:]
        y = y[..., : -lag]
        m2 = m2[..., : -lag]
    both = m1 & m2
    n_pairs = jnp.sum(both, -1)
    sxy = jnp.sum(jnp.where(both, x * y, 0.0), -1)
    xcov = jnp.where(n_pairs > 0, sxy / jnp.maximum(n_pairs, 1), jnp.nan)
    return xcov, n_pairs


def xcov_1d(v1, v2, lag=0, tau=None):
    """Lagged cross-covariance of two 1-d series
    (research/analysis_sif_xco2_crosscov.ipynb `compute_xcov_1d`)."""
    xc, n = _xcov_masked(
        jnp.atleast_1d(jnp.asarray(v1, float)),
        jnp.atleast_1d(jnp.asarray(v2, float)),
        int(lag),
    )
    if tau is not None and int(n) < tau:
        return float("nan")
    return float(xc)


def xcov_nd(Z1, Z2, lag=0, tau=None):
    """Gridded lagged cross-covariance over (..., T) cubes
    (research/analysis_sif_xco2_crosscov.ipynb `compute_xcov_nd`)."""
    xc, n = _xcov_masked(jnp.asarray(Z1, float), jnp.asarray(Z2, float), int(lag))
    if tau is not None:
        xc = jnp.where(n >= tau, xc, jnp.nan)
    return np.asarray(xc)


def apply_cross_covariance(Z1, Z2, lag=0, tau=None):
    """Per-cell lagged cross-covariance map — one XLA call over the whole
    cube, replacing the notebook's dask-parallelized `apply_ufunc`
    (research/analysis_sif_xco2_crosscov.ipynb cells 20, 27, 33). Unlike
    `apply_xcor` this does NOT detrend (parity with the notebook)."""
    return xcov_nd(Z1, Z2, lag=lag, tau=tau)


def optim_lag_1d(v1, v2, lag_bnds, tau=None):
    """Lag maximizing |xcor| between two 1-d anomaly series over an integer
    range — the global-series lag search the notebook does with
    `minimize_scalar` + a grid sweep
    (research/analysis_sif_xco2_crosscov.ipynb cells 12-15). Returns
    dict(optim_lag, xcor).

    Host-side numpy on purpose: one tiny 1-d pair swept over hundreds of
    lags would otherwise compile one XLA program per lag (``lag`` is a
    static slice bound); the per-cell search stays on device in
    `optim_lag_nd`, whose lag range is small."""
    r1 = np.asarray(detrend(jnp.atleast_1d(jnp.asarray(v1, float)))[0])
    r2 = np.asarray(detrend(jnp.atleast_1d(jnp.asarray(v2, float)))[0])
    m1_full, m2_full = np.isfinite(r1), np.isfinite(r2)
    x_full = np.where(m1_full, r1 - np.nanmean(r1), 0.0)
    y_full = np.where(m2_full, r2 - np.nanmean(r2), 0.0)
    best_lag, best_xc = None, float("nan")
    for lag in np.arange(*lag_bnds):
        lag = int(lag)
        if lag == 0:
            x, m1, y, m2 = x_full, m1_full, y_full, m2_full
        else:
            x, m1 = x_full[lag:], m1_full[lag:]
            y, m2 = y_full[:-lag], m2_full[:-lag]
        both = m1 & m2
        if tau is not None and both.sum() < tau:
            continue
        denom = np.sqrt((x[m1] ** 2).sum()) * np.sqrt((y[m2] ** 2).sum())
        if denom <= 0:
            continue
        xc = float((x * y)[both].sum() / denom)
        if np.isfinite(xc) and (best_lag is None or abs(xc) > abs(best_xc)):
            best_lag, best_xc = lag, xc
    return {"optim_lag": best_lag, "xcor": best_xc}


def get_stats(cubes: dict) -> dict:
    """Counts, slopes, and residual std-devs for sif/xco2 cubes
    (src/stat_tools.py:237-247). ``cubes`` maps name -> (..., T) array."""
    out = {}
    for name, z in cubes.items():
        z = jnp.asarray(z, float)
        out[f"{name}_count"] = np.asarray(count_valid(z))
        resid, slope = detrend(z)
        out[f"{name}_slope"] = np.asarray(slope)
        out[f"{name}_std"] = np.asarray(
            jnp.sqrt(
                jnp.nanmean(
                    (resid - jnp.nanmean(resid, -1, keepdims=True)) ** 2, -1
                )
            )
        )
    return out


def get_stats_df(df_group: pd.DataFrame, lags=(0,), tau=None) -> pd.DataFrame:
    """Count/slope/std/xcor summary for one grouped frame with sif and xco2
    columns (src/stat_tools.py:250-271)."""
    sif = df_group["sif"].values.astype(float)
    xco2 = df_group["xco2"].values.astype(float)
    sif_resid, sif_slope = detrend(sif)
    xco2_resid, xco2_slope = detrend(xco2)
    out = pd.DataFrame(
        {
            "sif_count": [np.isfinite(sif).sum()],
            "xco2_count": [np.isfinite(xco2).sum()],
            "sif_slope": [float(sif_slope)],
            "xco2_slope": [float(xco2_slope)],
            "sif_std": [float(np.nanstd(np.asarray(sif_resid)))],
            "xco2_std": [float(np.nanstd(np.asarray(xco2_resid)))],
        }
    )
    for lag in lags:
        out[f"xcor_lag{lag}"] = xcor_1d(xco2_resid, sif_resid, lag=lag, tau=tau)
    return out
