"""Parameter uncertainty for fitted covariance models.

The reference reports point estimates only — ``MultivariateMatern.fit``
returns a ``FittedVariogram`` with parameters and a cost, no standard
errors (src/model.py:285-317), and its finite-difference scipy setup could
not have produced curvature information anyway. Here the exact Gaussian
likelihood (estimate/nll.py) is differentiable end-to-end — including
through the from-scratch K_nu kernel — so the asymptotic MLE covariance is
one ``jax.hessian`` call:

    Cov(theta_hat) ~ I_obs(theta_hat)^-1,   I_obs = d^2 NLL / dtheta^2

evaluated at the fitted parameters (forward-over-reverse AD through the
Cholesky-based NLL). ``nll_std_errors`` wraps it as a tidy frame aligned
with ``MaternParams.to_dataframe``.

For the WLS estimator (whose asymptotics are less clean), see the
simulation-based sampling distribution in ``estimate/bootstrap.py``.
"""

import warnings
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from cokriging_tpu.cov.params import MaternParams
from cokriging_tpu.estimate.nll import joint_distance_blocks, neg_log_likelihood


def _nll_inputs(mf, use_measurement_var: bool, main: bool):
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
    return dists, z, mvar


def observed_information(
    params: MaternParams,
    mf,
    use_measurement_var: bool = False,
    jitter: float = 0.0,
    main: bool = True,
) -> np.ndarray:
    """Observed information matrix: the NLL Hessian at ``params``.

    Uses the plain-AD NLL path (``analytic_grad=False``) — the analytic
    d(nll)/dC custom VJP exists to bound *memory* at n ~ 25k and does not
    define the second-order rules ``jax.hessian`` needs.

    Accuracy note: entries with curvature in the smoothness parameters nu
    carry ~1% relative error. K_nu has no closed-form nu-derivative, so the
    kernel's custom JVP computes dK/dnu by a central difference
    (kernels/bessel.py:_kv_jvp); the Hessian differentiates *through* that
    stencil, giving d2K/dnu2 = (K'(nu+h) - K'(nu-h)) / 2h — an O(h^2)
    approximation. All other entries are exact AD. A ~1% Hessian
    perturbation moves the standard errors well under the Monte-Carlo noise
    any calibration could resolve.
    """
    dists, z, mvar = _nll_inputs(mf, use_measurement_var, main)
    spec = params.spec

    def nll_fn(flat):
        return neg_log_likelihood(
            flat, dists, z, spec, mvar, jitter, analytic_grad=False
        )

    h = jax.hessian(nll_fn)(params.to_flat())
    h = np.asarray(h, np.float64)
    return 0.5 * (h + h.T)


def nll_std_errors(
    params: MaternParams,
    mf,
    use_measurement_var: bool = False,
    jitter: float = 0.0,
    main: bool = True,
    information: Optional[np.ndarray] = None,
) -> pd.DataFrame:
    """Asymptotic standard errors and correlations of the MLE.

    Returns ``params.to_dataframe()`` extended with ``std_err`` (sqrt of
    the inverse-information diagonal) and ``at_bound`` (True where the
    estimate sits on its box constraint — there the quadratic
    approximation, hence the SE, is unreliable and the value is reported
    but flagged). A non-PD information matrix (not at a true interior
    optimum) falls back to the pseudo-inverse with a warning.

    The full parameter covariance/correlation matrices are attached as
    ``df.attrs['covariance']`` / ``df.attrs['correlation']``.
    """
    info = (
        observed_information(params, mf, use_measurement_var, jitter, main)
        if information is None
        else np.asarray(information, np.float64)
    )
    eigvals = np.linalg.eigvalsh(info)
    if eigvals.min() <= 0:
        warnings.warn(
            "Observed information is not positive definite (parameters are"
            " not at an interior optimum); standard errors use the"
            " pseudo-inverse and may be unreliable."
        )
        cov = np.linalg.pinv(info, hermitian=True)
    else:
        cov = np.linalg.inv(info)
    var = np.diagonal(cov).copy()
    se = np.sqrt(np.maximum(var, 0.0))
    # degenerate directions (var <= 0 can appear under the pseudo-inverse
    # fallback) carry no correlation information: NaN them out
    d = np.where(var > 0, se, np.nan)
    corr = cov / np.outer(d, d)

    lo, hi = params.spec.bounds()
    flat = np.asarray(params.to_flat(), np.float64)
    # wide enough to catch sigmoid-saturated optima (the box-constrained
    # fitters park runaway parameters a few 1e-6 inside the bound)
    tol = 1e-4 * (np.asarray(hi) - np.asarray(lo))
    at_bound = (flat <= np.asarray(lo) + tol) | (flat >= np.asarray(hi) - tol)

    df = params.to_dataframe().copy()
    df["std_err"] = se
    df["at_bound"] = at_bound
    df.attrs["covariance"] = cov
    df.attrs["correlation"] = corr
    return df
