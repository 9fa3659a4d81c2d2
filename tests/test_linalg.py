"""Blocked triangular inverse (kernels/linalg.py) vs numpy."""

import numpy as np
import jax.numpy as jnp

from cokriging_tpu.kernels.linalg import tri_inv_lower, spd_inverse_from_chol


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
