"""Golden tests for the JAX K_nu kernel against scipy.special.kv.

The reference evaluates scipy's kv inside its Matern correlation
(reference: src/model.py:349-385); our kernel must agree to near machine
precision over the optimizer's parameter box (nu in (0.2, 3.5),
src/model.py:123) and well beyond it.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.special as sps

from cokriging_tpu.kernels.bessel import kv


def test_kv_matches_scipy_model_domain():
    nus = np.concatenate(
        [np.linspace(0.05, 3.6, 73), [0.5, 1.0, 1.5, 2.0, 2.5, 3.0, 3.5]]
    )
    xs = np.concatenate([np.logspace(-8, 2.5, 120), [1.999999, 2.0, 2.000001]])
    NU, X = np.meshgrid(nus, xs)
    ref = sps.kv(NU, X)
    got = np.asarray(kv(jnp.array(NU), jnp.array(X)))
    mask = np.isfinite(ref) & (ref > 0)
    rel = np.abs(got[mask] - ref[mask]) / np.abs(ref[mask])
    assert not np.isnan(got[mask]).any()
    assert rel.max() < 1e-12


def test_kv_large_order():
    rng = np.random.default_rng(0)
    nus = rng.uniform(0.01, 29.9, 200)
    xs = rng.uniform(1e-6, 300, 200)
    ref = sps.kv(nus, xs)
    got = np.asarray(kv(jnp.array(nus), jnp.array(xs)))
    mask = np.isfinite(ref) & (ref > 0)
    rel = np.abs(got[mask] - ref[mask]) / np.abs(ref[mask])
    assert rel.max() < 1e-11


def test_kv_edge_values():
    assert np.isinf(float(kv(1.5, 0.0)))
    assert np.isnan(float(kv(1.5, -1.0)))
    # symmetric in order
    np.testing.assert_allclose(
        float(kv(-1.3, 2.0)), sps.kv(-1.3, 2.0), rtol=1e-13
    )
    # underflow to zero for huge x, like scipy
    assert float(kv(1.5, 800.0)) == 0.0


@pytest.mark.parametrize("nu,x", [(0.7, 0.3), (1.3, 2.7), (2.5, 1.1), (3.49, 15.0)])
def test_kv_gradients_match_finite_differences(nu, x):
    g_nu = float(jax.grad(lambda n, xx: kv(n, xx), 0)(nu, x))
    g_x = float(jax.grad(lambda n, xx: kv(n, xx), 1)(nu, x))
    h = 1e-7
    fd_nu = (sps.kv(nu + h, x) - sps.kv(nu - h, x)) / (2 * h)
    fd_x = (sps.kv(nu, x + h) - sps.kv(nu, x - h)) / (2 * h)
    np.testing.assert_allclose(g_nu, fd_nu, rtol=1e-5)
    np.testing.assert_allclose(g_x, fd_x, rtol=1e-5)


def test_kv_jit_and_vmap():
    f = jax.jit(kv)
    nus = jnp.linspace(0.3, 3.4, 16)
    xs = jnp.linspace(0.1, 10.0, 16)
    out = jax.vmap(f)(nus, xs)
    ref = sps.kv(np.asarray(nus), np.asarray(xs))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-12)


def test_kv_exact_grad_matches_scipy_fd():
    from cokriging_tpu.kernels.bessel import kv_exact_grad

    for nu, x in [(0.7, 0.3), (1.3, 2.7), (2.5, 1.1), (1.5, 0.01)]:
        g_nu = float(jax.grad(kv_exact_grad, 0)(nu, x))
        g_x = float(jax.grad(kv_exact_grad, 1)(nu, x))
        h = 1e-7
        fd_nu = (sps.kv(nu + h, x) - sps.kv(nu - h, x)) / (2 * h)
        fd_x = (sps.kv(nu, x + h) - sps.kv(nu, x - h)) / (2 * h)
        np.testing.assert_allclose(g_nu, fd_nu, rtol=1e-6)
        np.testing.assert_allclose(g_x, fd_x, rtol=1e-6)
