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


def test_kv_triple_from_pair_matches_scipy():
    """The gradient kernels' 3-for-1 trick: (K_{nu-1}, K_nu, K_{nu+1})
    from one series/CF2 pair + the recurrence, including the nl == 0
    downward-step branch (nu < 1/2)."""
    from cokriging_tpu.kernels.bessel import (
        _steed_cf2,
        _temme_series,
        kv_triple_from_pair,
    )

    xs = np.concatenate(
        [np.logspace(-4, 2, 60), [1.99, 2.0, 2.01]]
    )
    for nu in [0.05, 0.3, 0.49, 0.51, 0.7, 1.5, 2.0, 2.5, 3.49]:
        nl = np.floor(nu + 0.5)
        mu = nu - nl
        x = jnp.asarray(xs)
        x_lo, x_hi = jnp.minimum(x, 2.0), jnp.maximum(x, 2.0)
        ks, ks1 = _temme_series(jnp.asarray(mu), x_lo)
        kc, kc1 = _steed_cf2(jnp.asarray(mu), x_hi)
        use = x < 2.0
        pair = (jnp.where(use, ks, kc), jnp.where(use, ks1, kc1))
        kp, km, kn = kv_triple_from_pair(
            jnp.asarray(mu), jnp.asarray(nl), x, *pair
        )
        for got, order in [(kp, nu - 1.0), (km, nu), (kn, nu + 1.0)]:
            ref = sps.kv(abs(order), xs)
            ok = np.isfinite(ref) & (ref > 0) & (ref < 1e300)
            rel = np.abs(np.asarray(got)[ok] / ref[ok] - 1.0)
            assert rel.max() < 5e-11, (nu, order, rel.max())


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


def test_log_precise_matches_f64_log():
    """Bit-manipulation f32 log (kernels.bessel.log_precise): the TPU's
    hardware log approximation has ~1e-4 absolute error, this one ~1 ulp.
    On CPU both are accurate — the test pins semantics (values, grad,
    subnormals, f64 passthrough); the TPU win is measured in DESIGN.md."""
    from cokriging_tpu.kernels.bessel import log_precise

    x = np.concatenate(
        [np.linspace(1e-4, 40.0, 5001), np.geomspace(1.2e-38, 1e-4, 500)]
    ).astype(np.float32)
    got = np.asarray(log_precise(jnp.asarray(x))).astype(np.float64)
    want = np.log(x.astype(np.float64))
    assert np.abs(got - want).max() < 1e-5
    # subnormals clamp to the smallest normal (XLA flushes them to zero
    # in arithmetic, so they carry no information anyway)
    v = float(log_precise(jnp.float32(1e-40)))
    np.testing.assert_allclose(v, np.log(2.0**-126), rtol=1e-6)
    # near 1 (small |log|): absolute accuracy at f32 roundoff
    near = np.abs(x - 1.0) < 0.45
    assert np.abs(got - want)[near].max() < 1.5e-7
    # custom JVP: d/dx = 1/x exactly
    g = float(jax.grad(lambda v: log_precise(v))(jnp.float32(2.7)))
    np.testing.assert_allclose(g, 1.0 / 2.7, rtol=1e-6)
    # f64 passthrough
    v = float(log_precise(jnp.float64(2.7)))
    np.testing.assert_allclose(v, np.log(2.7), rtol=1e-15)


def test_inv_gamma_and_lgamma_precise():
    from cokriging_tpu.kernels.bessel import inv_gamma, inv_gamma1p, lgamma_precise

    z = np.linspace(-0.502, 0.502, 2001).astype(np.float32)
    got = np.asarray(inv_gamma1p(jnp.asarray(z)))
    want = 1.0 / sps.gamma(1.0 + z.astype(np.float64))
    assert np.abs(got - want).max() < 1.2e-7

    nu = np.linspace(0.21, 29.9, 997).astype(np.float32)
    got = np.asarray(inv_gamma(jnp.asarray(nu)))
    want = 1.0 / sps.gamma(nu.astype(np.float64))
    assert np.abs((got - want) / want).max() < 5e-6

    got = np.asarray(lgamma_precise(jnp.asarray(nu)))
    want = sps.gammaln(nu.astype(np.float64))
    assert np.abs(got - want).max() < 2e-5
    # f64 passthrough
    v = float(lgamma_precise(jnp.float64(3.3)))
    np.testing.assert_allclose(v, sps.gammaln(3.3), rtol=1e-14)
