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

#: f32 snap for the GEODESIC paths. XLA fuses deg2rad differently into the
#: row and column broadcasts, so under jit identical f32 coordinates yield
#: dlat/dlon of ~1 ulp (~1.2e-7 rad) -> self-distances up to ~1e-3 km
#: (measured 5.5e-4), a thousand times the f64 snap. The lost nugget then
#: de-regularizes every f32 covariance diagonal: local kriging systems go
#: near-singular and f32 predictions diverge from f64 by sigmas (found by
#: tools/f32_parity.py). 2e-2 km is ~20x above the ulp noise and ~275x
#: below the smallest real grid spacing (the 0.05-degree L2 grid, 5.5 km).
#: Euclidean distances are unaffected (the coordinate difference of one
#: broadcast array is exact) and keep the tight snap in both dtypes.
ZERO_SNAP_F32_KM = 2e-2


def _snap(d, tol):
    if tol is None:
        tol = ZERO_SNAP_F32_KM if d.dtype == jnp.float32 else ZERO_SNAP
    return jnp.where(d > tol, d, 0.0)


def haversine_matrix(coords1, coords2, radius=EARTH_RADIUS_KM, zero_tol=None):
    """Great-circle distance matrix in kilometers.

    Args:
        coords1: (n, 2) array of [lat, lon] in degrees (reference row format,
            src/fields.py:325-329).
        coords2: (m, 2) array of [lat, lon] in degrees.
        zero_tol: snap-to-zero tolerance; None selects the dtype-aware
            default (ZERO_SNAP for f64, ZERO_SNAP_F32_KM for f32).

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


#: WGS84 ellipsoid (km) — the datum geopy's exact geodesic path uses
#: (src/fields.py:331-336, ``fast_dist=False``).
WGS84_A_KM = 6378.137
WGS84_F = 1.0 / 298.257223563
WGS84_B_KM = WGS84_A_KM * (1.0 - WGS84_F)


def vincenty_matrix(coords1, coords2, n_iter=30, zero_tol=None):
    """Exact ellipsoidal (WGS84) distance matrix in kilometers — the
    TPU-native equivalent of the reference's slow path
    (``distance_matrix(..., fast_dist=False)`` via geopy,
    src/fields.py:331-336).

    Vincenty's inverse formula with a *fixed* ``n_iter``-trip lambda
    iteration (jit/vmap-friendly: no data-dependent control flow). Agrees
    with Karney's algorithm to sub-millimeter everywhere except
    near-antipodal pairs (where classic Vincenty does not converge); for
    the reference's CONUS workloads no pair is near-antipodal.

    Args:
        coords1: (n, 2) [lat, lon] degrees.
        coords2: (m, 2) [lat, lon] degrees.

    Returns:
        (n, m) distances in km.
    """
    c1 = jnp.deg2rad(jnp.atleast_2d(coords1))
    c2 = jnp.deg2rad(jnp.atleast_2d(coords2))
    f = WGS84_F
    u1 = jnp.arctan((1.0 - f) * jnp.tan(c1[:, 0:1]))  # (n, 1) reduced lats
    u2 = jnp.arctan((1.0 - f) * jnp.tan(c2[:, 0:1].T))  # (1, m)
    big_l = c1[:, 1:2] - c2[:, 1:2].T  # (n, m) lon difference
    sin_u1, cos_u1 = jnp.sin(u1), jnp.cos(u1)
    sin_u2, cos_u2 = jnp.sin(u2), jnp.cos(u2)
    eps = 1e-12

    def body(_, lam):
        sin_lam, cos_lam = jnp.sin(lam), jnp.cos(lam)
        sin_sigma = jnp.sqrt(
            (cos_u2 * sin_lam) ** 2
            + (cos_u1 * sin_u2 - sin_u1 * cos_u2 * cos_lam) ** 2
        )
        cos_sigma = sin_u1 * sin_u2 + cos_u1 * cos_u2 * cos_lam
        sigma = jnp.arctan2(sin_sigma, cos_sigma)
        sin_alpha = cos_u1 * cos_u2 * sin_lam / jnp.maximum(sin_sigma, eps)
        cos2_alpha = jnp.maximum(1.0 - sin_alpha**2, eps)
        cos_2sm = cos_sigma - 2.0 * sin_u1 * sin_u2 / cos2_alpha
        c = f / 16.0 * cos2_alpha * (4.0 + f * (4.0 - 3.0 * cos2_alpha))
        lam_new = big_l + (1.0 - c) * f * sin_alpha * (
            sigma
            + c
            * sin_sigma
            * (cos_2sm + c * cos_sigma * (-1.0 + 2.0 * cos_2sm**2))
        )
        # coincident points: keep lambda fixed (distance resolves to 0)
        return jnp.where(sin_sigma < eps, lam, lam_new)

    import jax

    lam = jax.lax.fori_loop(0, n_iter, body, big_l)

    sin_lam, cos_lam = jnp.sin(lam), jnp.cos(lam)
    sin_sigma = jnp.sqrt(
        (cos_u2 * sin_lam) ** 2
        + (cos_u1 * sin_u2 - sin_u1 * cos_u2 * cos_lam) ** 2
    )
    cos_sigma = sin_u1 * sin_u2 + cos_u1 * cos_u2 * cos_lam
    sigma = jnp.arctan2(sin_sigma, cos_sigma)
    sin_alpha = cos_u1 * cos_u2 * sin_lam / jnp.maximum(sin_sigma, eps)
    cos2_alpha = jnp.maximum(1.0 - sin_alpha**2, eps)
    cos_2sm = cos_sigma - 2.0 * sin_u1 * sin_u2 / cos2_alpha
    u_sq = cos2_alpha * (WGS84_A_KM**2 - WGS84_B_KM**2) / WGS84_B_KM**2
    big_a = 1.0 + u_sq / 16384.0 * (
        4096.0 + u_sq * (-768.0 + u_sq * (320.0 - 175.0 * u_sq))
    )
    big_b = u_sq / 1024.0 * (256.0 + u_sq * (-128.0 + u_sq * (74.0 - 47.0 * u_sq)))
    delta_sigma = (
        big_b
        * sin_sigma
        * (
            cos_2sm
            + big_b
            / 4.0
            * (
                cos_sigma * (-1.0 + 2.0 * cos_2sm**2)
                - big_b
                / 6.0
                * cos_2sm
                * (-3.0 + 4.0 * sin_sigma**2)
                * (-3.0 + 4.0 * cos_2sm**2)
            )
        )
    )
    d = WGS84_B_KM * big_a * (sigma - delta_sigma)
    return _snap(d, zero_tol)


def distance_matrix(coords1, coords2, geodesic=True, exact=False):
    """Dispatch on coordinate system.

    ``geodesic=True`` -> haversine km on [lat, lon] degrees (the reference's
    ``fast_dist=True`` path); ``geodesic=False`` -> Euclidean (``units=None``
    path used by simulated fields); ``exact=True`` (with geodesic) -> the
    WGS84 Vincenty path (reference ``fast_dist=False``,
    src/fields.py:331-336). The prediction/variogram stack defaults to the
    fast path because every reference result does.
    """
    if geodesic:
        if exact:
            return vincenty_matrix(coords1, coords2)
        return haversine_matrix(coords1, coords2)
    return euclidean_matrix(coords1, coords2)
