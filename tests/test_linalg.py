"""Blocked triangular inverse / SPD solve (kernels/linalg.py) vs numpy."""

import jax
import numpy as np
import jax.numpy as jnp

from cokriging_tpu.kernels.linalg import (
    tri_inv_lower,
    spd_inverse_from_chol,
    blocked_spd_solve,
)


def _random_spd(n, seed):
    rng = np.random.default_rng(seed)
    a = rng.normal(size=(n, n))
    return a @ a.T + n * np.eye(n)


def test_tri_inv_lower_exact_and_padded():
    # n = 96 forces the pad path for block=64; n = 128 is exact blocks
    for n, block in [(96, 64), (128, 64), (37, 64), (130, 128)]:
        c = _random_spd(n, seed=n)
        L = np.linalg.cholesky(c)
        got = np.asarray(tri_inv_lower(jnp.asarray(L), block=block))
        want = np.linalg.inv(L)
        np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-10)
        # strictly-upper garbage in the input must be ignored
        L_dirty = L + np.triu(np.ones_like(L), k=1) * 7.0
        got2 = np.asarray(tri_inv_lower(jnp.asarray(L_dirty), block=block))
        np.testing.assert_allclose(got2, want, rtol=1e-9, atol=1e-10)


def test_spd_inverse_from_chol():
    c = _random_spd(100, seed=0)
    L = np.linalg.cholesky(c)
    got = np.asarray(spd_inverse_from_chol(jnp.asarray(L), block=64))
    np.testing.assert_allclose(got, np.linalg.inv(c), rtol=1e-8, atol=1e-10)


def test_blocked_spd_solve_exact_padded_and_chol_diag():
    # exact multiple of block, padded, and smaller-than-block sizes
    for n, block in [(64, 32), (90, 32), (17, 32), (160, 32)]:
        a = _random_spd(n, seed=100 + n)
        rhs = np.random.default_rng(n).normal(size=n)
        x, d = blocked_spd_solve(jnp.asarray(a), jnp.asarray(rhs), block=block)
        np.testing.assert_allclose(
            np.asarray(x), np.linalg.solve(a, rhs), rtol=1e-8, atol=1e-10
        )
        np.testing.assert_allclose(
            np.asarray(d), np.diag(np.linalg.cholesky(a)), rtol=1e-9
        )


def test_blocked_spd_solve_vmap_batch():
    """The local-kriging usage: a vmapped batch of independent systems."""
    B, n = 5, 70
    As = np.stack([_random_spd(n, seed=s) for s in range(B)])
    cs = np.random.default_rng(0).normal(size=(B, n))
    xs, ds = jax.vmap(lambda A, c: blocked_spd_solve(A, c, block=32))(
        jnp.asarray(As), jnp.asarray(cs)
    )
    for b in range(B):
        np.testing.assert_allclose(
            np.asarray(xs[b]), np.linalg.solve(As[b], cs[b]), rtol=1e-8,
            atol=1e-10,
        )
    assert np.isfinite(np.asarray(ds)).all()


def test_blocked_spd_solve_non_pd_nan():
    """Non-PD input must signal via NaN in the Cholesky diagonal (the
    reference's LinAlgError -> NaN path, src/point_prediction.py:218-222)."""
    n = 40
    a = _random_spd(n, seed=3)
    a[5, 5] = -50.0  # break positive definiteness
    x, d = blocked_spd_solve(jnp.asarray(a), jnp.ones(n), block=32)
    assert np.isnan(np.asarray(d)).any()
