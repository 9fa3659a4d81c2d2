"""Distance kernels vs sklearn/scipy (reference: src/fields.py:318-342)."""

import numpy as np
import jax.numpy as jnp
from scipy.spatial.distance import cdist
from sklearn.metrics.pairwise import haversine_distances

from cokriging_tpu.kernels.distance import (
    haversine_matrix,
    euclidean_matrix,
    distance_matrix,
    vincenty_matrix,
)
from cokriging_tpu.utils.config import EARTH_RADIUS_KM


def _rand_latlon(rng, n):
    lat = rng.uniform(-85, 85, n)
    lon = rng.uniform(-180, 180, n)
    return np.column_stack([lat, lon])


def test_haversine_matches_sklearn(rng):
    c1 = _rand_latlon(rng, 64)
    c2 = _rand_latlon(rng, 37)
    ref = haversine_distances(np.radians(c1), np.radians(c2)) * EARTH_RADIUS_KM
    got = np.asarray(haversine_matrix(jnp.array(c1), jnp.array(c2)))
    np.testing.assert_allclose(got, ref, rtol=1e-10, atol=1e-8)


def test_haversine_zero_diagonal(rng):
    c = _rand_latlon(rng, 32)
    d = np.asarray(haversine_matrix(jnp.array(c), jnp.array(c)))
    np.testing.assert_allclose(np.diag(d), 0.0, atol=1e-6)


def test_euclidean_matches_cdist(rng):
    c1 = rng.normal(size=(50, 2))
    c2 = rng.normal(size=(40, 2))
    ref = cdist(c1, c2)
    got = np.asarray(euclidean_matrix(jnp.array(c1), jnp.array(c2)))
    np.testing.assert_allclose(got, ref, rtol=1e-9, atol=1e-10)


def test_dispatch(rng):
    c = _rand_latlon(rng, 8)
    np.testing.assert_allclose(
        np.asarray(distance_matrix(c, c, geodesic=True)),
        np.asarray(haversine_matrix(c, c)),
    )
    np.testing.assert_allclose(
        np.asarray(distance_matrix(c, c, geodesic=False)),
        np.asarray(euclidean_matrix(c, c)),
    )


def test_single_point_promotes_to_2d():
    s0 = np.array([40.0, -100.0])
    c = np.array([[41.0, -101.0], [39.0, -99.0]])
    d = np.asarray(haversine_matrix(s0, c))
    assert d.shape == (1, 2)


# --- exact geodesic (Vincenty/WGS84) slow path, src/fields.py:331-336 ---


def test_vincenty_canonical_vector():
    """Geoscience Australia's canonical Vincenty inverse test: Flinders
    Peak -> Buninyong = 54,972.271 m on WGS84 (sub-mm published value)."""
    flinders = np.array([[-(37 + 57 / 60 + 3.72030 / 3600),
                          144 + 25 / 60 + 29.52440 / 3600]])
    buninyong = np.array([[-(37 + 39 / 60 + 10.15610 / 3600),
                           143 + 55 / 60 + 35.38390 / 3600]])
    d = float(vincenty_matrix(jnp.array(flinders), jnp.array(buninyong))[0, 0])
    assert abs(d - 54.972271) < 1e-5  # km, < 1 cm


def test_vincenty_equator_and_meridian_arcs():
    """1 degree of longitude along the equator = a*pi/180 = 111.319491 km;
    1 degree of latitude at the equator = 110.574 km (published WGS84
    meridian arc)."""
    p0 = np.array([[0.0, 0.0]])
    d_lon = float(vincenty_matrix(jnp.array(p0), jnp.array([[0.0, 1.0]]))[0, 0])
    assert abs(d_lon - 111.319491) < 1e-4
    d_lat = float(vincenty_matrix(jnp.array(p0), jnp.array([[1.0, 0.0]]))[0, 0])
    assert abs(d_lat - 110.574389) < 1e-3


def test_vincenty_coincident_and_symmetry(rng):
    c = _rand_latlon(rng, 16)
    d = np.asarray(vincenty_matrix(jnp.array(c), jnp.array(c)))
    np.testing.assert_allclose(np.diag(d), 0.0, atol=1e-6)
    np.testing.assert_allclose(d, d.T, rtol=1e-9, atol=1e-9)


def test_vincenty_close_to_haversine(rng):
    """Ellipsoidal vs spherical distances differ by < 0.6% (flattening)."""
    c1 = _rand_latlon(rng, 24)
    c2 = _rand_latlon(rng, 24)
    hv = np.asarray(haversine_matrix(jnp.array(c1), jnp.array(c2)))
    vc = np.asarray(vincenty_matrix(jnp.array(c1), jnp.array(c2)))
    mask = hv > 100.0  # skip near-zero pairs (relative error unstable)
    rel = np.abs(vc[mask] - hv[mask]) / hv[mask]
    assert rel.max() < 0.006


def test_dispatch_exact(rng):
    c = _rand_latlon(rng, 8)
    np.testing.assert_allclose(
        np.asarray(distance_matrix(c, c, geodesic=True, exact=True)),
        np.asarray(vincenty_matrix(c, c)),
    )
