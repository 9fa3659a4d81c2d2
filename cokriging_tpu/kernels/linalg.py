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


def _tri_inv_rec(L, block):
    """Divide-and-conquer lower-triangular inverse (padded, tril'd input).

    [[A, 0], [B, C]]^-1 = [[A^-1, 0], [-C^-1 B A^-1, C^-1]] — two
    recursive half-problems plus two half-size MXU matmuls. ~(2/3) n^3
    FLOPs total; the old row-blocked forward substitution multiplied
    every (block, n) row band against the FULL n x n carry (zeros
    included), 2 n^3 FLOPs, and measured 5% MFU at n = 25k.
    """
    n = L.shape[0]
    if n <= block:
        return jax.scipy.linalg.solve_triangular(
            L, jnp.eye(n, dtype=L.dtype), lower=True
        )
    k = (-(-n // (2 * block))) * block  # split at a block multiple
    A, B, C = L[:k, :k], L[k:, :k], L[k:, k:]
    Ai = _tri_inv_rec(A, block)
    Ci = _tri_inv_rec(C, block)
    # Precision.HIGHEST: the default f32 matmul rides the MXU's bf16
    # rounding, which would corrupt the inverse feeding NLL gradients.
    Bi = -jnp.matmul(
        Ci, jnp.matmul(B, Ai, precision=_HIGHEST), precision=_HIGHEST
    )
    top = jnp.concatenate([Ai, jnp.zeros((k, n - k), L.dtype)], axis=1)
    bot = jnp.concatenate([Bi, Ci], axis=1)
    return jnp.concatenate([top, bot], axis=0)


@partial(jax.jit, static_argnames=("block",))
def tri_inv_lower(L, block: int = 512):
    """Inverse of a lower-triangular matrix, divide-and-conquer blocked.

    Exists because XLA's triangular-solve expander with a full square
    right-hand side holds ~n/block live matrix-sized temps (32.5 GB
    measured at n = 12.5k); the recursion peaks at the output plus one
    half-size temp.

    Args:
        L: (n, n) lower-triangular matrix (strictly-upper entries ignored).
        block: base-case size (multiple of 128 keeps the MXU happy).

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
    # strictly-upper entries of L must not leak into the products
    X = _tri_inv_rec(jnp.tril(L), block)
    return X[:n, :n] if pad else X


def _tri_tt_rec(T, block):
    """T^T @ T for lower-triangular T, divide-and-conquer.

    T = [[A, 0], [B, C]] gives
    [[A^T A + B^T B, B^T C], [C^T B, C^T C]] — two recursive triangular
    half-products, one dense syrk, one dense matmul, and a transposed
    reuse of the off-diagonal block. ~(2/3) n^3 FLOPs vs 2 n^3 for the
    dense product that ignores the triangle of zeros.
    """
    n = T.shape[0]
    if n <= block:
        return jnp.matmul(T.T, T, precision=_HIGHEST)
    k = (-(-n // (2 * block))) * block
    A, B, C = T[:k, :k], T[k:, :k], T[k:, k:]
    top_left = _tri_tt_rec(A, block) + jnp.matmul(
        B.T, B, precision=_HIGHEST
    )
    off = jnp.matmul(B.T, C, precision=_HIGHEST)
    bot_right = _tri_tt_rec(C, block)
    top = jnp.concatenate([top_left, off], axis=1)
    bot = jnp.concatenate([off.T, bot_right], axis=1)
    return jnp.concatenate([top, bot], axis=0)


# top-level jitted on purpose: callers (joint LOOCV, precision-identity
# paths) invoke it outside any enclosing jit, and `block` is static
@partial(jax.jit, static_argnames=("block",))
def spd_inverse_from_chol(chol, block: int = 512):
    """C^-1 = L^-T L^-1 from a lower Cholesky factor: divide-and-conquer
    triangular inverse + triangular-aware product (both ~(2/3) n^3 vs
    the 2 n^3 of their dense counterparts; avoids the square-RHS
    triangular-solve expander — see tri_inv_lower)."""
    linv = tri_inv_lower(chol, block=block)
    return _tri_tt_rec(linv, block)


# ---------------------------------------------------------------------------
# Small-matrix blocked SPD solve (vmap-friendly), for batched local kriging
# systems. XLA's batched cholesky + triangular-solve on a (6256, 160, 160)
# f32 batch measured ~360 ms on a v5e chip (~25 GFLOP/s); this blocked
# formulation keeps the bulk of the flops in MXU einsums and the sequential
# base cases as short Python-unrolled vector recurrences, ~10x faster.
# ---------------------------------------------------------------------------

_HIGHEST = jax.lax.Precision.HIGHEST


def _chol_base(S):
    """Unrolled outer-product Cholesky of one (m, m) SPD block (m small,
    e.g. 32). NaN-propagating on non-PD input (sqrt of a negative pivot),
    matching jnp.linalg.cholesky's failure semantics. vmap-safe."""
    m = S.shape[-1]
    idx = jnp.arange(m)
    cols = []
    for j in range(m):
        col = S[..., :, j]
        piv = jnp.sqrt(col[..., j])
        colL = jnp.where(idx >= j, col / piv[..., None], 0.0)
        cols.append(colL)
        S = S - colL[..., :, None] * colL[..., None, :]
    return jnp.stack(cols, axis=-1)


def _tri_inv_base(L):
    """Unrolled inverse of one small (m, m) lower-triangular block by
    row-wise Gauss elimination. vmap-safe."""
    m = L.shape[-1]
    idx = jnp.arange(m)
    X = jnp.broadcast_to(jnp.eye(m, dtype=L.dtype), L.shape)
    for j in range(m):
        xj = X[..., j, :] / L[..., j, j][..., None]
        X = jnp.where((idx == j)[:, None], xj[..., None, :], X)
        below = (idx > j)[:, None]
        X = X - jnp.where(below, L[..., :, j][..., None] * xj[..., None, :], 0.0)
    return X


def blocked_spd_solve(A, c, block: int = 32):
    """Solve the SPD system A x = c and report factorization health.

    Blocked right-looking Cholesky: per block-column, an unrolled
    ``_chol_base`` factors the diagonal block, its ``_tri_inv_base``
    inverse turns the panel solve and the forward/backward substitution
    into (rem, b) x (b, b) einsums, and the trailing Schur update is one
    MXU matmul per step (``Precision.HIGHEST`` — the default f32 path
    rides the MXU's bf16 rounding, which corrupts covariance diagonals).
    Designed to be called under ``jax.vmap`` over a batch of independent
    local systems; every op is batch-dim agnostic.

    Args:
        A: (k, k) SPD matrix (e.g. a masked local covariance with identity
            padding lanes).
        c: (k,) right-hand side.
        block: base-case size (k is padded to a multiple internally).

    Returns:
        (x, chol_diag): the solution and the diagonal of the Cholesky
        factor (NaN entries signal a non-PD system, the reference's
        LinAlgError -> NaN path, src/point_prediction.py:218-222).
    """
    k = A.shape[-1]
    pad = (-k) % block
    if pad:
        eye_tail = (jnp.arange(k + pad) >= k).astype(A.dtype)
        A = jnp.pad(A, ((0, pad), (0, pad))) + jnp.diag(eye_tail)
        c = jnp.pad(c, (0, pad))
    kp = k + pad
    nb = kp // block

    # --- factorization: row-block lists L[r][cb] for cb <= r ---
    panels = [[None] * nb for _ in range(nb)]
    diag_inv = [None] * nb
    diag_ch = [None] * nb
    S = A
    for kb in range(nb):
        b = block
        Dk = S[..., :b, :b]
        Lkk = _chol_base(Dk)
        Ikk = _tri_inv_base(Lkk)
        diag_ch[kb] = Lkk
        diag_inv[kb] = Ikk
        panels[kb][kb] = Lkk
        if kb + 1 < nb:
            P = S[..., b:, :b]
            Lik = jnp.einsum("...ij,...kj->...ik", P, Ikk, precision=_HIGHEST)
            S = S[..., b:, b:] - jnp.einsum(
                "...ij,...kj->...ik", Lik, Lik, precision=_HIGHEST
            )
            for r in range(kb + 1, nb):
                panels[r][kb] = Lik[..., (r - kb - 1) * b : (r - kb) * b, :]

    # --- forward substitution: L y = c ---
    ys = []
    for r in range(nb):
        rhs = c[..., r * block : (r + 1) * block]
        for j in range(r):
            rhs = rhs - jnp.einsum(
                "...ij,...j->...i", panels[r][j], ys[j], precision=_HIGHEST
            )
        ys.append(
            jnp.einsum("...ij,...j->...i", diag_inv[r], rhs, precision=_HIGHEST)
        )

    # --- backward substitution: L^T x = y ---
    xs = [None] * nb
    for r in range(nb - 1, -1, -1):
        rhs = ys[r]
        for j in range(r + 1, nb):
            rhs = rhs - jnp.einsum(
                "...ji,...j->...i", panels[j][r], xs[j], precision=_HIGHEST
            )
        xs[r] = jnp.einsum(
            "...ji,...j->...i", diag_inv[r], rhs, precision=_HIGHEST
        )

    x = jnp.concatenate(xs, axis=-1)[..., :k]
    chol_diag = jnp.concatenate(
        [jnp.diagonal(d, axis1=-2, axis2=-1) for d in diag_ch], axis=-1
    )[..., :k]
    return x, chol_diag
