"""Pairwise distance kernels.

The reference computes geodesic distances with sklearn's
``haversine_distances`` scaled by the Earth radius (src/fields.py:318-342,
fast path) and Euclidean ``cdist`` for simulated fields. Here both are
expressed as MXU/VPU-friendly jnp ops:

- haversine via the stable formula on lat/lon in radians;
- Euclidean via the (x - y)^2 = |x|^2 + |y|^2 - 2<x,y> expansion, which XLA
  maps onto the MXU.

A fused Pallas block kernel (``pallas_ops.pairwise_variogram``) consumes
these formulas tile-by-tile for the O(n^2) variogram path so the full n x n
matrix never materializes; the plain functions below are what everything
else (covariance assembly, local neighborhoods) uses, since those matrices
feed directly into matmuls/Cholesky anyway.
"""

import jax.numpy as jnp

from cokriging_tpu.utils.config import EARTH_RADIUS_KM

#: Distances below this snap to exact 0. Under jit, XLA's fusion/FMA
#: rewrites make identical coordinates come out at ~1e-13 rather than 0,
#: which would break every exact-zero convention downstream (nugget only at
#: h == 0, src/model.py:193-197; LOOCV self-exclusion via d > 0,
#: src/point_prediction.py:140-142; min-nonzero-distance bin anchoring,
#: src/fields.py:393-394). 1e-6 (km / sim units) is far below any real
#: grid spacing and far above the rewrite noise.
ZERO_SNAP = 1e-6


def _snap(d, tol):
    return jnp.where(d > tol, d, 0.0)


def haversine_matrix(coords1, coords2, radius=EARTH_RADIUS_KM, zero_tol=ZERO_SNAP):
    """Great-circle distance matrix in kilometers.

    Args:
        coords1: (n, 2) array of [lat, lon] in degrees (reference row format,
            src/fields.py:325-329).
        coords2: (m, 2) array of [lat, lon] in degrees.

    Returns:
        (n, m) distances; matches sklearn ``haversine_distances * R``.
    """
    c1 = jnp.deg2rad(jnp.atleast_2d(coords1))
    c2 = jnp.deg2rad(jnp.atleast_2d(coords2))
    lat1 = c1[:, 0:1]
    lat2 = c2[:, 0:1].T
    dlat = lat1 - lat2
    dlon = c1[:, 1:2] - c2[:, 1:2].T
    s = (
        jnp.sin(0.5 * dlat) ** 2
        + jnp.cos(lat1) * jnp.cos(lat2) * jnp.sin(0.5 * dlon) ** 2
    )
    s = jnp.clip(s, 0.0, 1.0)
    return _snap(2.0 * radius * jnp.arcsin(jnp.sqrt(s)), zero_tol)


def euclidean_matrix(coords1, coords2, zero_tol=ZERO_SNAP):
    """Euclidean distance matrix (simulation path, src/fields.py:341-342).

    Computed by direct coordinate differences (exact zeros for identical
    points). The |x|^2+|y|^2-2<x,y> matmul expansion is deliberately NOT
    used: on TPU an f32 matmul rides the MXU's bf16 path, whose rounding
    (~1e-2 relative) corrupts small distances enough to drop the
    nugget-at-h==0 off covariance diagonals (non-PD matrices). With 2-d
    coordinates the expansion saves nothing anyway.
    """
    c1 = jnp.atleast_2d(coords1)
    c2 = jnp.atleast_2d(coords2)
    diff = c1[:, None, :] - c2[None, :, :]
    d2 = jnp.sum(diff * diff, axis=-1)
    return _snap(jnp.sqrt(d2), zero_tol)


def distance_matrix(coords1, coords2, geodesic=True):
    """Dispatch on coordinate system.

    ``geodesic=True`` -> haversine km on [lat, lon] degrees (the reference's
    ``fast_dist=True`` path); ``geodesic=False`` -> Euclidean (``units=None``
    path used by simulated fields).
    """
    if geodesic:
        return haversine_matrix(coords1, coords2)
    return euclidean_matrix(coords1, coords2)
