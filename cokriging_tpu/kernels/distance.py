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


def haversine_matrix(coords1, coords2, radius=EARTH_RADIUS_KM):
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
    return 2.0 * radius * jnp.arcsin(jnp.sqrt(s))


def euclidean_matrix(coords1, coords2):
    """Euclidean distance matrix (simulation path, src/fields.py:341-342)."""
    c1 = jnp.atleast_2d(coords1)
    c2 = jnp.atleast_2d(coords2)
    sq1 = jnp.sum(c1 * c1, axis=1, keepdims=True)
    sq2 = jnp.sum(c2 * c2, axis=1, keepdims=True)
    d2 = sq1 + sq2.T - 2.0 * (c1 @ c2.T)
    return jnp.sqrt(jnp.maximum(d2, 0.0))


def distance_matrix(coords1, coords2, geodesic=True):
    """Dispatch on coordinate system.

    ``geodesic=True`` -> haversine km on [lat, lon] degrees (the reference's
    ``fast_dist=True`` path); ``geodesic=False`` -> Euclidean (``units=None``
    path used by simulated fields).
    """
    if geodesic:
        return haversine_matrix(coords1, coords2)
    return euclidean_matrix(coords1, coords2)
