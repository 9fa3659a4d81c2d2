"""Multivariate Gaussian cofield simulation.

Re-design of the reference simulator (src/sim.py:11-137) on the JAX PRNG:
a joint pn x pn Matern block covariance over a Cartesian grid, one lower
Cholesky factor, cofields = L @ N(0, 1). The semi-colocated sampling scheme
(half the sample locations shared between all processes, half disjoint per
process, src/sim.py:67-82) and per-process additive measurement error
(src/sim.py:84-117) are preserved — this is the framework's end-to-end
validation harness (parameter recovery + prediction-interval coverage).

The reference is bivariate-only; here p = model.n_procs, with exactly the
reference's draw sequence at p = 2 (``BivariateRandomField`` is the parity
alias).
"""

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from cokriging_tpu.kernels.distance import euclidean_matrix
from cokriging_tpu.fields.field import Field, MultiField


@jax.jit
def _scaled_matern_block(amp, nugget, nu, len_scale, d):
    """amp * Matern_corr(nu, len_scale, d) + nugget at d == 0, with the
    parameters as TRACED scalars: one compiled program serves every
    (i, j) block of every simulation at this (shape, dtype) — marginal
    blocks pass amp = sigma_i^2 / nugget = tau_i^2, cross blocks
    amp = rho sigma_i sigma_j / nugget = 0 (src/model.py:193-207)."""
    from cokriging_tpu.cov.matern import matern_correlation

    c = matern_correlation(nu, len_scale, d)
    return amp * c + jnp.where(d == 0.0, nugget, jnp.zeros_like(nugget))


_chol_jit = jax.jit(jnp.linalg.cholesky)


def _joint_cov_chol(params, dist, p):
    """Joint pn x pn block covariance + its lower Cholesky.

    The simulator runs in f64 (the zero-nugget system needs the
    conditioning), where TPU compile times are the hazard, not runtime:
    ONE fused emulated-f64 K_nu + Cholesky program took the remote
    compile service minutes (measured 751 s cold), and a fully EAGER
    build paid ~60 s of per-primitive dispatch on every run. Middle
    ground: one scalar-parameterized jitted Matern-block program (shared
    by all (i, j) blocks and persistently cached across runs) plus the
    jitted Cholesky primitive — two modest compiles the first time this
    (grid, dtype) is ever seen, ~seconds on every run after.
    """
    blocks = {}
    for i in range(p):
        for j in range(i, p):
            if i == j:
                amp = params.sigma[i] ** 2
                nug = params.nugget[i]
            else:
                amp = params.rho[i, j] * params.sigma[i] * params.sigma[j]
                nug = jnp.zeros_like(params.nugget[i])
            blocks[(i, j)] = _scaled_matern_block(
                amp, nug, params.nu[i, j], params.len_scale[i, j], dist
            )
    cmat = jnp.block(
        [
            [blocks[(i, j)] if i <= j else blocks[(j, i)].T for j in range(p)]
            for i in range(p)
        ]
    )
    return cmat, _chol_jit(cmat)


class CartesianGrid:
    """Regular Cartesian grid on the unit square (src/sim.py:11-27)."""

    def __init__(self, xbounds=(0, 1), ybounds=(0, 1), xcount=51, ycount=51):
        x = np.linspace(*xbounds, num=xcount)
        y = np.linspace(*ybounds, num=ycount)
        # expand-grid ordering: x outer, y inner (reference _expand_grid)
        xx, yy = np.meshgrid(x, y)
        pts = np.array([xx, yy]).T.reshape(-1, 2)
        self.coords = pd.DataFrame(pts, columns=["x", "y"])
        self.count = len(self.coords)
        self._dist = None

    @property
    def dist(self):
        """Full n x n Euclidean distance matrix — materialized lazily so
        the O(n log n) spectral simulator can use large grids whose dense
        matrix would not fit (sim/spectral.py never touches it)."""
        if self._dist is None:
            pts = jnp.asarray(self.coords.values)
            self._dist = euclidean_matrix(pts, pts)
        return self._dist


class MultivariateRandomField:
    """Simulate and sample a p-process Gaussian cofield (src/sim.py:30-137,
    generalized from the reference's bivariate-only class)."""

    def __init__(self, model, grid: CartesianGrid, seed: int = 0) -> None:
        self.seed = seed
        self.mod = model
        self.n_procs = model.n_procs
        self.grid = grid
        self.coords = grid.coords
        p = self.n_procs
        self.cmat, self.chol_lower = _joint_cov_chol(
            model.params, grid.dist, p
        )
        if bool(jnp.any(jnp.isnan(self.chol_lower))):
            raise np.linalg.LinAlgError(
                "Joint simulation covariance is not positive definite."
            )
        self.fields = self._simulate()

    def _simulate(self) -> List[pd.DataFrame]:
        key = jax.random.PRNGKey(self.seed)
        p, n = self.n_procs, self.grid.count
        noise = jax.random.normal(key, (p * n,), self.cmat.dtype)
        sim = np.asarray(self.chol_lower @ noise)
        chunks = [sim[k * n : (k + 1) * n] for k in range(p)]
        return [
            pd.DataFrame(
                {
                    "x": self.coords["x"].values,
                    "y": self.coords["y"].values,
                    "value": chunks[i],
                }
            )
            for i in range(p)
        ]

    def _split_samp_coords(self, size: int, seed: int) -> List[pd.DataFrame]:
        """Half-colocated / half-disjoint sample locations (src/sim.py:67-82).

        n_co locations are shared by all p processes; each process gets its
        own n_mis disjoint extras. At p = 2, n_ext == floor(1.5 size) — the
        reference's draw, index for index."""
        p = self.n_procs
        n_co = int(np.ceil(size / 2))
        n_mis = size - n_co
        n_ext = n_co + p * n_mis
        rng = np.random.default_rng(seed)
        rows = rng.choice(self.grid.count, size=n_ext, replace=False)
        co = rows[:n_co]
        mis = [rows[n_co + k * n_mis : n_co + (k + 1) * n_mis] for k in range(p)]
        return [np.concatenate([co, mis[i]]) for i in range(p)]

    def sample(
        self,
        size: Optional[int] = None,
        frac: Optional[float] = None,
        epsilon=(0.0,),
        seed: Optional[int] = None,
    ) -> List[pd.DataFrame]:
        """Sample the cofields with additive N(0, eps_i^2) measurement error
        (src/sim.py:84-117)."""
        p = self.n_procs
        if frac is not None:
            size = int(np.ceil(frac * self.grid.count))
        n_need = int(np.ceil(size / 2)) + p * (size - int(np.ceil(size / 2)))
        assert n_need <= self.grid.count, (
            "Sample size is too large for semi-colocated sampling scheme."
        )
        eps = np.asarray(epsilon, dtype=float)
        if eps.size == 1:
            eps = np.repeat(eps, p)
        seed = self.seed if seed is None else seed

        idx = self._split_samp_coords(size, seed)
        key = jax.random.PRNGKey(seed + 1)
        samples = []
        for i in range(p):
            df = self.fields[i].iloc[idx[i]].reset_index(drop=True).copy()
            key, sub = jax.random.split(key)
            noise = np.asarray(jax.random.normal(sub, (size,))) * eps[i]
            df["value"] = df["value"] + noise
            df = df.rename(columns={"value": f"Z{i}"})
            samples.append(df)
        return samples

    def to_fields(self, samples: List[pd.DataFrame], i: Optional[int] = None):
        """Format samples as a (Multi)Field on Euclidean coordinates
        (src/sim.py:127-137)."""
        fields = [
            Field.from_arrays(
                s[["x", "y"]].values, s[f"Z{k}"].values, name=f"Z{k}"
            )
            for k, s in enumerate(samples)
        ]
        if i is not None:
            return MultiField(fields=[fields[i]])
        return MultiField(fields=fields)

    def truth_at(self, i: int, coords: np.ndarray) -> np.ndarray:
        """Noise-free simulated values of process i at exact grid coords."""
        df = self.fields[i]
        key = {(round(a, 12), round(b, 12)): v for a, b, v in df.values}
        return np.array([key[(round(a, 12), round(b, 12))] for a, b in coords])


#: Reference-parity name (src/sim.py:30); identical draws at p = 2.
BivariateRandomField = MultivariateRandomField
