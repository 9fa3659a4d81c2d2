"""LocalPredictor(materialize_cov=False): each local system assembled from
its gathered neighborhood coordinates instead of an n x n precomputed
joint covariance. Same distances, same Matern conventions (nugget on
exact-zero marginal distances, rho sigma_a sigma_b cross amplitude) =>
results must match the materialized path to float precision, including
LOOCV and process-1 prediction. This is the O(n)-memory prediction path
for data sizes past one chip's joint-covariance wall (the estimation-side
analog is estimate.vecchia)."""

import numpy as np
import pytest

from cokriging_tpu.cov import MaternParams, MultivariateMatern
from cokriging_tpu.predict import LocalPredictor
from cokriging_tpu.sim import BivariateRandomField, CartesianGrid

FLAT = [1.0, 1.0, 1.5, 1.5, 1.5, 0.2, 0.2, 0.2, 0.05, 0.05, -0.6]


@pytest.fixture(scope="module")
def setup():
    mod = MultivariateMatern(params=MaternParams.from_flat(np.array(FLAT)))
    grid = CartesianGrid(xcount=15, ycount=15)
    rf = BivariateRandomField(mod, grid, seed=8)
    mf = rf.to_fields(rf.sample(size=60, epsilon=[0.1, 0.1], seed=9))
    return mod, grid, mf


def test_direct_cov_matches_materialized(setup):
    mod, grid, mf = setup
    pc = grid.coords.values[::4]
    lp_mat = LocalPredictor(mod, mf)
    lp_dir = LocalPredictor(mod, mf, materialize_cov=False)
    for i in (0, 1):
        a = lp_mat(i, pc, max_dist=0.5, postprocess=False)
        b = lp_dir(i, pc, max_dist=0.5, postprocess=False)
        np.testing.assert_allclose(
            b["pred"].values, a["pred"].values, rtol=1e-10, atol=1e-12
        )
        # pred_err at data-coincident locations is sqrt(var ~ 0): float
        # association noise in the two covariance assemblies (~1e-16)
        # surfaces as ~1e-8 after the sqrt
        np.testing.assert_allclose(
            b["pred_err"].values, a["pred_err"].values, rtol=1e-8, atol=1e-7
        )


def test_direct_cov_loocv_matches(setup):
    mod, grid, mf = setup
    a = LocalPredictor(mod, mf).cross_validation(0, max_dist=0.5, postprocess=False)
    b = LocalPredictor(mod, mf, materialize_cov=False).cross_validation(
        0, max_dist=0.5, postprocess=False
    )
    np.testing.assert_allclose(
        b["pred"].values, a["pred"].values, rtol=1e-10, atol=1e-12
    )


def test_kd_neighbor_path_matches_device_search(setup):
    """neighbor_method='kd' (host kd-tree query + gathered-window device
    program — the large-N path) must reproduce the device masked-top-k
    search exactly: same all-within-max_dist semantics, same covariance
    conventions, for prediction and LOOCV on both processes."""
    mod, grid, mf = setup
    pc = grid.coords.values[::4]
    lp_dev = LocalPredictor(mod, mf, materialize_cov=False)
    lp_kd = LocalPredictor(
        mod, mf, materialize_cov=False, neighbor_method="kd"
    )
    for i in (0, 1):
        a = lp_dev(i, pc, max_dist=0.5, postprocess=False)
        b = lp_kd(i, pc, max_dist=0.5, postprocess=False)
        np.testing.assert_allclose(
            b["pred"].values, a["pred"].values, rtol=1e-10, atol=1e-12
        )
        np.testing.assert_allclose(
            b["pred_err"].values, a["pred_err"].values, rtol=1e-8, atol=1e-7
        )
    cv_a = lp_dev.cross_validation(0, max_dist=0.5, postprocess=False)
    cv_b = lp_kd.cross_validation(0, max_dist=0.5, postprocess=False)
    np.testing.assert_allclose(
        cv_b["pred"].values, cv_a["pred"].values, rtol=1e-10, atol=1e-12
    )


def test_kd_neighbor_path_matches_geodesic():
    """Geodesic coords: sphere-embedded kd radius filter must match the
    haversine device search (chord monotonicity), including the
    coastline-like case of an empty neighborhood (NaN lane parity)."""
    import warnings

    rng = np.random.default_rng(4)
    lat = rng.uniform(25, 50, 120)
    lon = rng.uniform(-120, -70, 120)
    coords = np.column_stack([lat, lon])
    vals = np.sin(np.deg2rad(lat) * 5) + 0.1 * rng.normal(size=120)
    from cokriging_tpu.fields.field import Field, MultiField

    f = Field.from_arrays(coords, vals, "Z0")
    f.geodesic = True
    mf = MultiField(fields=[f])
    from cokriging_tpu.cov.params import ParamSpec

    params = MaternParams.from_flat(
        np.array([1.0, 1.5, 400.0, 0.05]), spec=ParamSpec(n_procs=1)
    )
    mod = MultivariateMatern(1, params)
    pc = np.column_stack(
        [rng.uniform(24, 51, 60), rng.uniform(-125, -65, 60)]
    )
    # one far-away location -> empty neighborhood on both paths
    pc[0] = [70.0, -40.0]
    lp_dev = LocalPredictor(mod, mf, materialize_cov=False)
    lp_kd = LocalPredictor(
        mod, mf, materialize_cov=False, neighbor_method="kd"
    )
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        a = lp_dev(0, pc, max_dist=500.0, postprocess=False)
        b = lp_kd(0, pc, max_dist=500.0, postprocess=False)
    np.testing.assert_array_equal(
        np.isnan(a["pred"].values), np.isnan(b["pred"].values)
    )
    assert np.isnan(a["pred"].values[0])
    np.testing.assert_allclose(
        b["pred"].values, a["pred"].values, rtol=1e-10, atol=1e-12
    )


def test_direct_cov_sharded_matches(setup):
    from cokriging_tpu.parallel import make_mesh, sharded_local_predict

    mod, grid, mf = setup
    pc = grid.coords.values[::4]
    lp_dir = LocalPredictor(mod, mf, materialize_cov=False)
    single = lp_dir(0, pc, max_dist=0.5, postprocess=False)
    pred, err = sharded_local_predict(
        lp_dir, 0, pc, max_dist=0.5, mesh=make_mesh()
    )
    np.testing.assert_allclose(pred, single["pred"].values, rtol=1e-10)
    np.testing.assert_allclose(err, single["pred_err"].values, rtol=1e-10)
