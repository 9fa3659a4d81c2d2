"""Blocked dense linear-algebra kernels for large TPU problems.

``tri_inv_lower`` exists because XLA's triangular-solve *expander* is
memory-hostile for a full square right-hand side on TPU: lowering
``solve_triangular(L, eye(n))`` at n = 12.5k scheduled ~50 live
matrix-sized dynamic-update-slice temps (32.5 GB, measured OOM dump) — the
progressively shrinking sub-solves of the expander all stay resident.
The blocked inversion here runs as one ``fori_loop`` whose (n, n) carry
XLA aliases in place, with one (block x n) MXU matmul per step, so peak
memory is the output plus one row-block temp regardless of n.
"""

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("block",))
def tri_inv_lower(L, block: int = 512):
    """Inverse of a lower-triangular matrix by blocked forward substitution.

    For block row k (top to bottom):

        X[k, :] = Lkk^-1 (I[k, :] - L[k, :k] @ X[:k, :])

    realized as one (block, n) matmul against the partially-filled output
    (rows >= k*block still zero, so the sum needs no masking) plus a small
    (block, block) triangular solve for the diagonal block. The output
    carry is updated with ``dynamic_update_slice`` inside ``fori_loop``,
    which XLA buffer assignment aliases in place.

    Args:
        L: (n, n) lower-triangular matrix (strictly-upper entries ignored).
        block: row-block size (multiple of 128 keeps the MXU happy).

    Returns:
        (n, n) lower-triangular L^-1, same dtype.
    """
    n = L.shape[0]
    pad = (-n) % block
    if pad:
        # pad with an identity diagonal so the padded matrix stays
        # invertible and its inverse is block-diagonal [L^-1, I]
        L = jnp.pad(L, ((0, pad), (0, pad)))
        L = L + jnp.diag(
            jnp.concatenate(
                [jnp.zeros(n, L.dtype), jnp.ones(pad, L.dtype)]
            )
        )
    m = n + pad
    eye_b = jnp.eye(block, dtype=L.dtype)
    # strictly-upper entries of L must not leak into the row products
    L = jnp.tril(L)

    def body(k, X):
        r = k * block
        # slice the (block, m) row band, then its diagonal block at column r
        row = jax.lax.dynamic_slice(L, (r, 0), (block, m))
        Lkk = jax.lax.dynamic_slice(row, (0, r), (block, block))
        Akk = jax.scipy.linalg.solve_triangular(Lkk, eye_b, lower=True)
        prod = row @ X  # (block, m): sum_{j<k} L[k, j] X[j, :]
        Xk = -(Akk @ prod)
        Xk = jax.lax.dynamic_update_slice(Xk, Akk, (0, r))
        return jax.lax.dynamic_update_slice(X, Xk, (r, 0))

    X = jax.lax.fori_loop(0, m // block, body, jnp.zeros_like(L))
    return X[:n, :n] if pad else X


def spd_inverse_from_chol(chol, block: int = 512):
    """C^-1 = L^-T L^-1 from a lower Cholesky factor, via the blocked
    triangular inverse (one extra MXU matmul; avoids the square-RHS
    triangular-solve expander — see tri_inv_lower)."""
    linv = tri_inv_lower(chol, block=block)
    return linv.T @ linv
