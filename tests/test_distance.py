"""Distance kernels vs sklearn/scipy (reference: src/fields.py:318-342)."""

import numpy as np
import jax.numpy as jnp
from scipy.spatial.distance import cdist
from sklearn.metrics.pairwise import haversine_distances

from cokriging_tpu.kernels.distance import (
    haversine_matrix,
    euclidean_matrix,
    distance_matrix,
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
