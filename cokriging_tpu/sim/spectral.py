"""Exact cofield simulation by multivariate circulant embedding (FFT).

The reference's simulator (src/sim.py:30-65) — and the dense path here
(`sim.cofield.MultivariateRandomField`) — factorizes the joint pn x pn
covariance with one Cholesky: O(p^3 n^3) flops and O(p^2 n^2) memory, which
caps grids at a few thousand cells. On a *regular* Cartesian grid the
stationary (cross-)covariance is block circulant once the grid is embedded
in a torus, so the whole joint factorization diagonalizes under the 2-D
DFT: per frequency only a p x p PSD square root remains (Chan & Wood 1999,
"Simulation of stationary Gaussian vector fields"). Cost drops to
O(p^2 m log m + m p^3) with m = embedding size ~ 4 n, memory O(p^2 m) —
exact draws (not approximations) whenever the embedding is PSD, which the
constructor verifies and repairs by doubling the torus.

This is the TPU-natural design: the hot ops are batched 2-D FFTs and tiny
batched eigendecompositions, both single XLA programs; a 1024 x 1024
bivariate cofield (2.1M values, dense equivalent = a 2M x 2M Cholesky)
draws in well under a second on one chip.

Sampling semantics (`sample`, `to_fields`, `truth_at`) are inherited from
the dense simulator so the downstream validation harness
(semi-colocated sampling + measurement error, src/sim.py:67-117) is shared.
"""

import warnings
from typing import List

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from cokriging_tpu.cov.matern import covariance, cross_covariance
from cokriging_tpu.sim.cofield import CartesianGrid, MultivariateRandomField


def _next_pow2(n: int) -> int:
    m = 1
    while m < n:
        m *= 2
    return m


def _axis_spec(values: np.ndarray):
    """(points, count, spacing) of one regular grid axis."""
    pts = np.unique(values)
    if len(pts) > 1:
        d = np.diff(pts)
        if not np.allclose(d, d[0], rtol=1e-8):
            raise ValueError(
                "circulant embedding requires a regular grid axis"
            )
        dx = float(d[0])
    else:
        dx = 1.0
    return pts, len(pts), dx


def _minimal_image_lags(m: int, dx: float) -> np.ndarray:
    """Signed torus lags k*dx with k wrapped to (-m/2, m/2]."""
    k = np.arange(m)
    k = np.where(k <= m // 2, k, k - m)
    return k * dx


class SpectralRandomField(MultivariateRandomField):
    """p-process Gaussian cofield simulator, exact via circulant embedding.

    Drop-in alternative to `MultivariateRandomField` on a `CartesianGrid`:
    same `.fields` / `.sample` / `.to_fields` / `.truth_at` surface, plus
    `sample_ensemble` for many full-grid realizations in one device
    program. The grid must be regular (CartesianGrid always is); distances
    are Euclidean, matching the reference sim path (src/sim.py:24-27).

    Args:
        model: `MultivariateMatern` (any p).
        grid: `CartesianGrid`.
        seed: PRNG seed for the resident `.fields` realization.
        pad_factor: initial torus size per axis as a multiple of the grid
            size (>= 2 keeps all grid lags inside the minimal image).
        max_doublings: embedding-repair attempts — each retry doubles the
            torus, which shrinks (often removes) negative spectral mass.
        clip_tol: relative negative-eigenvalue mass allowed to be clipped
            to zero after the final doubling before erroring.
    """

    def __init__(
        self,
        model,
        grid: CartesianGrid,
        seed: int = 0,
        pad_factor: float = 2.0,
        max_doublings: int = 3,
        clip_tol: float = 1e-6,
    ) -> None:
        self.seed = seed
        self.mod = model
        self.n_procs = model.n_procs
        self.grid = grid
        self.coords = grid.coords

        xs, nx, dx = _axis_spec(grid.coords["x"].values)
        ys, ny, dy = _axis_spec(grid.coords["y"].values)
        if nx * ny != grid.count:
            raise ValueError("grid is not a full regular lattice")
        self._nx, self._ny = nx, ny

        mx = _next_pow2(max(2 * nx, int(np.ceil(pad_factor * nx))))
        my = _next_pow2(max(2 * ny, int(np.ceil(pad_factor * ny))))
        for attempt in range(max_doublings + 1):
            spec, min_rel = self._build_spectrum(mx, my, dx, dy)
            if min_rel >= -clip_tol:
                break
            if attempt < max_doublings:
                mx, my = 2 * mx, 2 * my
        else:
            raise np.linalg.LinAlgError(
                "circulant embedding is not PSD after "
                f"{max_doublings} doublings (min relative eigenvalue "
                f"{min_rel:.3e}). A deficit that does not shrink with "
                "embedding size means the model itself is invalid (the "
                "continuous spectral matrices have negative determinant "
                "somewhere) — check cov.spectral.rho_max / repair with "
                "cov.spectral.project_to_valid."
            )
        # eigvalsh rounding noise sits at the ~1e-15 level even for models
        # that are PSD in exact arithmetic; only warn on meaningful mass
        if min_rel < -1e-12:
            warnings.warn(
                f"clipped {-min_rel:.2e} relative negative spectral mass"
            )
        self._mx, self._my = mx, my
        self.min_rel_eig = float(min_rel)
        # per-frequency PSD square root B(k) = V sqrt(max(w, 0)) V^T,
        # built on the host in f64 (spec is already a host array); the
        # device only ever sees B in a backend-supported dtype — TPU has
        # no f64/c128, so the sampling FFT there runs in f32/c64
        w, v = np.linalg.eigh(spec)
        w = np.maximum(w, 0.0)
        B = np.einsum("xyik,xyk,xyjk->xyij", v, np.sqrt(w), v)
        if jax.default_backend() == "tpu":
            self._dtype = jnp.float32
        else:
            self._dtype = jnp.float64 if jax.config.x64_enabled else jnp.float32
        self._B = jnp.asarray(B, dtype=self._dtype)
        self.fields = self._simulate()

    def _build_spectrum(self, mx, my, dx, dy):
        """(mx, my, p, p) real spectral matrices = 2-D DFT of every
        (cross-)covariance block on the torus lag grid, and the most
        negative eigenvalue relative to the largest.

        The covariance blocks are evaluated with the device K_nu kernel,
        but the DFT and eigendecomposition run on the host in f64: the
        spectrum build is a one-time setup cost, its PSD verdict wants
        exact arithmetic, and TPU has no c128 FFT at all.
        """
        p = self.n_procs
        lx = _minimal_image_lags(mx, dx)
        ly = _minimal_image_lags(my, dy)
        h = jnp.sqrt(
            jnp.asarray(lx)[:, None] ** 2 + jnp.asarray(ly)[None, :] ** 2
        )
        params = self.mod.params
        blocks = [[None] * p for _ in range(p)]
        for i in range(p):
            for j in range(i, p):
                if i == j:
                    c = covariance(params, i, h)
                else:
                    c = cross_covariance(params, i, j, h)
                s = np.real(np.fft.fft2(np.asarray(c, dtype=np.float64)))
                blocks[i][j] = s
                blocks[j][i] = s
        spec = np.stack(
            [np.stack(row, axis=-1) for row in blocks], axis=-1
        )  # (mx, my, p, p)
        w = np.linalg.eigvalsh(spec)
        min_rel = float(w.min() / np.abs(w).max())
        return spec, min_rel

    def _draw(self, key, n_samples: int) -> jnp.ndarray:
        """(n_samples, p, nx, ny) exact realizations.

        y(k) = B(k) eps(k) with eps complex standard normal
        (E[eps eps^H] = 2 I); Re and Im of FFT(y)/sqrt(M) are two
        independent N(0, C) draws (Dietrich & Newsam 1997 eq. 3.4), so one
        complex pass yields two samples.
        """
        mx, my, p = self._mx, self._my, self.n_procs
        n_draw = (n_samples + 1) // 2
        k1, k2 = jax.random.split(key)
        shape = (n_draw, mx, my, p)
        # eps dtype follows B: c64 on TPU (no c128 there), c128 on CPU f64.
        # lax.complex (not `+ 1j *`) keeps the literal-c128 constant out of
        # the HLO — TPU rejects any C128 element type, even a constant.
        eps = jax.lax.complex(
            jax.random.normal(k1, shape, dtype=self._dtype),
            jax.random.normal(k2, shape, dtype=self._dtype),
        )
        y = jnp.einsum("xyij,sxyj->sxyi", self._B, eps)
        # weak-typed Python float: a np.float64 scalar here would promote
        # the c64 draw to c128, which TPU cannot compile
        y = jnp.fft.fft2(y, axes=(1, 2)) / float(np.sqrt(mx * my))
        out = jnp.concatenate([jnp.real(y), jnp.imag(y)], axis=0)
        out = out[:n_samples, : self._nx, : self._ny, :]
        return jnp.moveaxis(out, -1, 1)

    def _simulate(self) -> List[pd.DataFrame]:
        key = jax.random.PRNGKey(self.seed)
        vals = np.asarray(self._draw(key, 1)[0])  # (p, nx, ny)
        return [
            pd.DataFrame(
                {
                    "x": self.coords["x"].values,
                    "y": self.coords["y"].values,
                    # (nx, ny) C-order == grid ordering (x outer, y inner)
                    "value": vals[i].reshape(-1),
                }
            )
            for i in range(self.n_procs)
        ]

    def sample_ensemble(self, n_samples: int, seed=None) -> jnp.ndarray:
        """(n_samples, p, nx, ny) independent full-grid realizations as one
        device program — the ensemble studies the dense simulator cannot
        reach (its per-realization cost is an O(p^3 n^3) factorization)."""
        seed = self.seed if seed is None else seed
        return self._draw(jax.random.PRNGKey(seed), n_samples)

    def embedded_covariance(self, i: int, j: int) -> jnp.ndarray:
        """(mx, my) torus covariance the sampler actually realizes for the
        (i, j) pair — equals the model block exactly when nothing was
        clipped; used by the exactness tests."""
        s = jnp.einsum("xyik,xyjk->xyij", self._B, self._B)[..., i, j]
        return jnp.real(jnp.fft.ifft2(s))
