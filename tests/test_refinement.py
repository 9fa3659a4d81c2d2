"""Mixed-precision iterative refinement: f32 factorization + refinement
approaches the f64 direct solve on kriging-like systems."""

import numpy as np
import jax.numpy as jnp

from cokriging_tpu.predict.joint import _refined_posdef_solve


def _kriging_like_system(rng, n=400, cond_boost=0.0):
    """A realistic joint-covariance-shaped PD matrix (Matern-ish decay)."""
    pts = rng.uniform(0, 1, size=(n, 2))
    d = np.sqrt(((pts[:, None] - pts[None]) ** 2).sum(-1))
    a = (1 + np.sqrt(3) * d / 0.2) * np.exp(-np.sqrt(3) * d / 0.2)
    a += (0.01 - cond_boost) * np.eye(n)
    b = rng.normal(size=(n, 8))
    return a, b


def test_refinement_recovers_f64_accuracy(rng):
    a, b = _kriging_like_system(rng)
    x64 = np.linalg.solve(a, b)

    a32 = jnp.asarray(a, jnp.float32)
    b32 = jnp.asarray(b, jnp.float32)
    x_plain = np.asarray(_refined_posdef_solve(a32, b32, refine_iters=0))
    x_ref = np.asarray(_refined_posdef_solve(a32, b32, refine_iters=2))

    err_plain = np.abs(x_plain - x64).max() / np.abs(x64).max()
    err_ref = np.abs(x_ref - x64).max() / np.abs(x64).max()
    assert err_ref < err_plain / 3
    assert err_ref < 5e-5


def test_refinement_noop_in_f64(rng):
    a, b = _kriging_like_system(rng, n=150)
    x = np.asarray(
        _refined_posdef_solve(jnp.asarray(a), jnp.asarray(b), refine_iters=2)
    )
    np.testing.assert_allclose(x, np.linalg.solve(a, b), rtol=1e-9, atol=1e-11)
