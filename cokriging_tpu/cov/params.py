"""Multivariate Matern parameter system.

Re-designs the reference's parameter classes (MarginalParam / CrossParam /
RhoParam / MaternParams, reference: src/model.py:16-169) as a single JAX
pytree of dense arrays plus *static* flat-vector index maps, so the whole
parameter set can be handed to jit'd objectives and optimizers as one flat
f64 vector.

Flat layout matches the reference optimizer's ordering exactly
(src/model.py:145-152 walks [sigma, nu, len_scale, nugget, rho] in order,
each contributing its upper-triangle values row-major):

    p = 2: [sigma_11, sigma_22,
            nu_11, nu_12, nu_22,
            len_scale_11, len_scale_12, len_scale_22,
            nugget_11, nugget_22,
            rho_12]                      -> 11 free parameters

Defaults and bounds reproduce src/model.py:120-129:
    sigma  1.0  (0.4, 3.5)     per process
    nu     1.5  (0.2, 3.5)     per pair (incl. marginals)
    len    5e2  (1e2, 2e3)     per pair
    nugget 0.0  (0.0, 0.2)     per process (tau^2)
    rho    0.0  (-1.0, 1.0)    per strict pair
"""

from dataclasses import dataclass, field, replace
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _triu_pairs(p, k=0):
    return [(i, j) for i in range(p) for j in range(p) if i + k <= j]


@dataclass(frozen=True)
class ParamSpec:
    """Static metadata: names, bounds, and flat-vector slicing for p procs."""

    n_procs: int = 2
    sigma_bounds: Tuple[float, float] = (0.4, 3.5)
    nu_bounds: Tuple[float, float] = (0.2, 3.5)
    len_scale_bounds: Tuple[float, float] = (1e2, 2e3)
    nugget_bounds: Tuple[float, float] = (0.0, 0.2)
    rho_bounds: Tuple[float, float] = (-1.0, 1.0)

    @property
    def n_params(self):
        p = self.n_procs
        t = p * (p + 1) // 2
        s = p * (p - 1) // 2
        return p + t + t + p + s

    def names(self):
        p = self.n_procs
        out = [f"sigma_{i+1}{i+1}" for i in range(p)]
        out += [f"nu_{i+1}{j+1}" for i, j in _triu_pairs(p)]
        out += [f"len_scale_{i+1}{j+1}" for i, j in _triu_pairs(p)]
        out += [f"nugget_{i+1}{i+1}" for i in range(p)]
        out += [f"rho_{i+1}{j+1}" for i, j in _triu_pairs(p, k=1)]
        return out

    def bounds(self):
        """(lower, upper) arrays in flat order."""
        p = self.n_procs
        t = p * (p + 1) // 2
        s = p * (p - 1) // 2
        lo, hi = [], []
        for bnds, count in [
            (self.sigma_bounds, p),
            (self.nu_bounds, t),
            (self.len_scale_bounds, t),
            (self.nugget_bounds, p),
            (self.rho_bounds, s),
        ]:
            lo += [bnds[0]] * count
            hi += [bnds[1]] * count
        return np.array(lo), np.array(hi)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class MaternParams:
    """Dense-array pytree of multivariate Matern parameters.

    ``nu``, ``len_scale``, ``rho`` are full symmetric (p, p) matrices so
    model code can index [i, j] without triangle bookkeeping; ``sigma``
    and ``nugget`` are (p,) marginals. ``rho``'s diagonal is fixed at 1
    (unused by the model, which routes i == j through ``covariance``).
    """

    sigma: jnp.ndarray
    nu: jnp.ndarray
    len_scale: jnp.ndarray
    nugget: jnp.ndarray
    rho: jnp.ndarray
    spec: ParamSpec = field(metadata=dict(static=True), default=ParamSpec())

    @property
    def n_procs(self):
        return self.spec.n_procs

    # ---- construction -------------------------------------------------

    @staticmethod
    def default(n_procs: int = 2, spec: ParamSpec = None) -> "MaternParams":
        spec = spec or ParamSpec(n_procs=n_procs)
        p = spec.n_procs
        return MaternParams(
            sigma=jnp.ones(p),
            nu=1.5 * jnp.ones((p, p)),
            len_scale=5e2 * jnp.ones((p, p)),
            nugget=jnp.zeros(p),
            rho=jnp.where(jnp.eye(p, dtype=bool), 1.0, 0.0),
            spec=spec,
        )

    @staticmethod
    def from_flat(x, spec: ParamSpec = None, n_procs: int = 2) -> "MaternParams":
        """Build from the reference-ordered flat vector (src/model.py:145)."""
        spec = spec or ParamSpec(n_procs=n_procs)
        p = spec.n_procs
        x = jnp.asarray(x)
        if not jnp.issubdtype(x.dtype, jnp.floating):
            x = x.astype(jnp.result_type(float))
        # preserve the caller's float precision: an f32 flat vector must
        # produce f32 params end to end, or every downstream covariance
        # assembly / Cholesky silently promotes to (TPU-emulated) f64
        t = p * (p + 1) // 2
        s = p * (p - 1) // 2
        k = 0

        def take(n):
            nonlocal k
            out = x[k : k + n]
            k += n
            return out

        sigma = take(p)
        nu = _sym_from_triu(take(t), p, k_diag=0)
        len_scale = _sym_from_triu(take(t), p, k_diag=0)
        nugget = take(p)
        rho = _sym_from_triu(take(s), p, k_diag=1)
        rho = rho + jnp.eye(p, dtype=x.dtype)
        assert k == spec.n_params
        return MaternParams(sigma, nu, len_scale, nugget, rho, spec)

    # ---- flat-vector round trip ----------------------------------------

    def to_flat(self):
        p = self.n_procs
        iu = np.triu_indices(p)
        iu1 = np.triu_indices(p, k=1)
        return jnp.concatenate(
            [
                self.sigma,
                self.nu[iu],
                self.len_scale[iu],
                self.nugget,
                self.rho[iu1] if iu1[0].size else jnp.zeros(0),
            ]
        )

    def with_flat(self, x) -> "MaternParams":
        return MaternParams.from_flat(x, spec=self.spec)

    def replace(self, **kw) -> "MaternParams":
        return replace(self, **kw)

    def astype(self, dtype) -> "MaternParams":
        """Cast all parameter arrays (e.g. f32 for TPU-MXU prediction)."""
        return MaternParams(
            self.sigma.astype(dtype),
            self.nu.astype(dtype),
            self.len_scale.astype(dtype),
            self.nugget.astype(dtype),
            self.rho.astype(dtype),
            self.spec,
        )

    # ---- host-side reporting -------------------------------------------

    def to_dataframe(self):
        import pandas as pd

        lo, hi = self.spec.bounds()
        return pd.DataFrame(
            {
                "name": self.spec.names(),
                "value": np.asarray(self.to_flat()),
                "bounds": list(zip(lo, hi)),
            }
        )


def _sym_from_triu(vals, p, k_diag=0):
    """Scatter upper-triangle values (row-major) into a symmetric matrix."""
    m = jnp.zeros((p, p), dtype=vals.dtype)
    iu = np.triu_indices(p, k=k_diag)
    m = m.at[iu].set(vals)
    return m + jnp.triu(m, k=1).T
