"""WLS fit recovery tests: fit against bin means generated from a known
model and check the optimizer recovers it (reference fit semantics,
src/model.py:285-317)."""

import numpy as np
import jax.numpy as jnp
import pytest

from cokriging_tpu.cov import MaternParams
from cokriging_tpu.cov.matern import semivariance, cross_semivariance
from cokriging_tpu.estimate.empirical import VarioConfig, EmpiricalVariogram
from cokriging_tpu.estimate.wls import fit_wls, composite_wls_cost

TRUE_FLAT = np.array([1.2, 0.9, 1.4, 1.3, 1.7, 600.0, 550.0, 700.0, 0.05, 0.02, -0.5])


def _synthetic_estimate(flat=TRUE_FLAT, n_bins=15):
    params = MaternParams.from_flat(jnp.asarray(flat))
    pairs = [(0, 0), (0, 1), (1, 1)]
    centers = np.tile(np.linspace(60.0, 1800.0, n_bins), (3, 1))
    means = np.zeros_like(centers)
    for k, (i, j) in enumerate(pairs):
        h = jnp.asarray(centers[k])
        v = (
            semivariance(params, i, h)
            if i == j
            else cross_semivariance(params, i, j, h)
        )
        means[k] = np.asarray(v)
    counts = np.full_like(centers, 500.0)
    import pandas as pd

    return EmpiricalVariogram(
        df=pd.DataFrame(),
        config=VarioConfig(max_dist=1800.0, n_bins=n_bins),
        timestamp=None,
        timedeltas=None,
        pairs=pairs,
        bin_centers=centers,
        bin_means=means,
        bin_counts=counts,
    )


def test_cost_zero_at_truth():
    est = _synthetic_estimate()
    c = composite_wls_cost(
        jnp.asarray(TRUE_FLAT),
        jnp.asarray(est.bin_centers),
        jnp.asarray(est.bin_means),
        jnp.asarray(est.bin_counts),
        tuple(est.pairs),
        MaternParams.default().spec,
    )
    assert float(c) < 1e-18


def test_scipy_fit_recovers_truth():
    est = _synthetic_estimate()
    params, result = fit_wls(est, method="scipy")
    got = np.asarray(params.to_flat())
    # sigma and rho are strongly identified; nu/len_scale trade off along a
    # ridge (the cross-pair gradient is exactly zero while rho == 0, so the
    # optimizer lands near, not on, the truth — same surface the reference
    # optimizes).
    np.testing.assert_allclose(got[0:2], TRUE_FLAT[0:2], rtol=0.05)
    np.testing.assert_allclose(got[10], TRUE_FLAT[10], atol=0.05)
    assert result.cost < 1.0  # initial cost is ~7e3
    assert result.df_theoretical is not None
    # the fitted curves themselves reproduce the data: weighted relative
    # error per bin implied by the cost is < 1% RMS
    n_bins = est.bin_means.size
    rms_rel = np.sqrt(result.cost / est.bin_counts.sum())
    assert rms_rel < 0.01


@pytest.mark.slow
def test_jax_fit_close_to_scipy():
    est = _synthetic_estimate()
    p_scipy, r_scipy = fit_wls(est, method="scipy")
    p_jax, r_jax = fit_wls(est, method="jax")
    assert r_jax.cost < max(1e-4, 10 * r_scipy.cost + 1e-6)


def test_moment_init_near_truth():
    """Method-of-moments initializer lands near the generating parameters
    and gives L-BFGS-B a basin with good parameter recovery."""
    from cokriging_tpu.estimate.wls import moment_init

    est = _synthetic_estimate()
    mi = np.asarray(moment_init(est).to_flat())
    # sigmas within 5%, rho within 0.15, marginal length scales within 40%
    np.testing.assert_allclose(mi[0:2], TRUE_FLAT[0:2], rtol=0.05)
    assert abs(mi[10] - TRUE_FLAT[10]) < 0.15
    np.testing.assert_allclose(mi[5], TRUE_FLAT[5], rtol=0.4)
    np.testing.assert_allclose(mi[7], TRUE_FLAT[7], rtol=0.4)

    params, result = fit_wls(est, init=moment_init(est), method="scipy")
    got = np.asarray(params.to_flat())
    # nuggets and rho recover tightly from this basin
    np.testing.assert_allclose(got[8:10], TRUE_FLAT[8:10], atol=0.01)
    assert abs(got[10] - TRUE_FLAT[10]) < 0.1
    np.testing.assert_allclose(got[5:8], TRUE_FLAT[5:8], rtol=0.3)


def test_fit_project_validity_flag():
    """fit_wls(project_validity=True) returns parameters inside the exact
    spectral validity region even when the unconstrained optimum is not."""
    from cokriging_tpu.cov.spectral import params_rho_max

    # truth with an INVALID cross-structure: nu12 below the Gneiting floor
    bad = TRUE_FLAT.copy()
    bad[4] = 0.8  # nu12 < (1.4 + 1.3) / 2
    bad[10] = -0.9
    est = _synthetic_estimate(flat=bad)
    params, _ = fit_wls(est, project_validity=True)
    nu = np.asarray(params.nu)
    assert nu[0, 1] >= 0.5 * (nu[0, 0] + nu[1, 1]) - 1e-9
    bound = float(params_rho_max(params, 0, 1))
    assert abs(float(np.asarray(params.rho[0, 1]))) <= bound + 1e-9
