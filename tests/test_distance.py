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


def test_jitted_f32_self_distance_snaps_to_zero():
    """f32 regression (found by tools/f32_parity.py): XLA fuses deg2rad
    differently into the row/column broadcasts, so jitted f32 haversine
    self-distances come out ~1e-3 km. The dtype-aware snap must still map
    them to EXACT 0 — the nugget-at-h==0 convention depends on it; losing
    it de-regularized every f32 covariance diagonal and sent f32 local
    predictions sigmas away from f64."""
    import jax

    rng = np.random.default_rng(0)
    c = np.column_stack(
        [rng.uniform(28.0, 46.0, 80), rng.uniform(-120.0, -72.0, 80)]
    ).astype(np.float32)
    cj = jnp.asarray(c)
    d = np.asarray(jax.jit(haversine_matrix)(cj, cj))
    assert (np.diag(d) == 0.0).all()
    # off-diagonal small distances must NOT be snapped (smallest real grid
    # spacing, the 0.05-degree L2 grid, is ~5.5 km >> the f32 snap)
    off = d[~np.eye(80, dtype=bool)]
    assert off.min() > 1.0


def test_f32_local_prediction_close_to_f64():
    """End-to-end f32-vs-f64 parity of the local cokriging path on a
    benign model (measured rel-RMS ~1e-5 after the snap fix; it was ~3 —
    i.e. uncorrelated garbage — before)."""
    import jax.numpy as jnp

    from cokriging_tpu.cov import MaternParams, MultivariateMatern
    from cokriging_tpu.fields.field import Field, MultiField
    from cokriging_tpu.predict import LocalPredictor

    rng = np.random.default_rng(0)
    n = 150
    params = MaternParams.from_flat(
        np.array([1.0, 0.9, 1.5, 1.25, 1.0, 500.0, 548.0, 600.0, 0.05, 0.05, -0.4])
    )
    c1 = np.column_stack([rng.uniform(28, 46, n), rng.uniform(-120, -72, n)])
    c2 = np.column_stack([rng.uniform(28, 46, n), rng.uniform(-120, -72, n)])
    v1, v2 = rng.normal(size=n), rng.normal(size=n)
    probe = np.column_stack(
        [rng.uniform(30, 44, 60), rng.uniform(-115, -75, 60)]
    )
    preds = {}
    for dt in (jnp.float64, jnp.float32):
        fields = []
        for c, v, nm in ((c1, v1, "Z0"), (c2, v2, "Z1")):
            f = Field.from_arrays(
                c.astype(np.dtype(dt)), v.astype(np.dtype(dt)), nm
            )
            f.geodesic = True
            fields.append(f)
        lp = LocalPredictor(
            MultivariateMatern(params=params.astype(dt)),
            MultiField(fields=fields),
        )
        out = lp(0, probe, max_dist=1000.0, postprocess=False)
        preds[np.dtype(dt).name] = out["pred"].to_numpy()
    d = preds["float32"] - preds["float64"]
    rel = np.linalg.norm(d) / np.linalg.norm(preds["float64"])
    assert rel < 1e-3, rel
