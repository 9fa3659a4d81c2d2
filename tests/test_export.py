"""AOT serving export (utils/export.py): the serialized StableHLO
artifact must reproduce the live LocalPredictor bit-for-bit at the same
shapes, with params and values as runtime inputs."""

import numpy as np
import jax.numpy as jnp

from cokriging_tpu.cov import MaternParams, MultivariateMatern
from cokriging_tpu.predict import LocalPredictor
from cokriging_tpu.sim import BivariateRandomField, CartesianGrid
from cokriging_tpu.utils.export import (
    export_local_prediction,
    load_program,
    make_local_prediction_fn,
)

FLAT = [1.0, 1.0, 1.5, 1.5, 1.5, 0.2, 0.2, 0.2, 0.01, 0.01, -0.6]


def _setup():
    mod = MultivariateMatern(params=MaternParams.from_flat(np.array(FLAT)))
    grid = CartesianGrid(xcount=15, ycount=15)
    rf = BivariateRandomField(mod, grid, seed=3)
    mf = rf.to_fields(rf.sample(size=50, epsilon=[0.05, 0.05], seed=4))
    # direct-assembly predictor (the export path's covariance mode)
    lp = LocalPredictor(mod, mf, materialize_cov=False)
    pcoords = grid.coords.values[::7]
    return mod, lp, pcoords


def test_export_roundtrip_matches_live_predictor():
    mod, lp, pcoords = _setup()
    max_dist = 0.5

    blob = export_local_prediction(lp, 0, pcoords, max_dist=max_dist)
    assert isinstance(blob, (bytes, bytearray)) and len(blob) > 1000

    served = load_program(blob)
    fn, example_args = make_local_prediction_fn(
        lp, 0, pcoords, max_dist=max_dist
    )
    flat, pc, *values = example_args
    pred_s, err_s, n_s = served(flat, pc, *values)

    live = lp(0, pcoords, max_dist=max_dist, postprocess=False)
    ok = np.isfinite(live["pred"].values)
    assert ok.mean() > 0.9
    np.testing.assert_allclose(
        np.asarray(pred_s)[ok], live["pred"].values[ok], rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(err_s)[ok], live["pred_err"].values[ok], rtol=1e-6
    )


def test_exported_artifact_takes_fresh_runtime_inputs():
    """New parameter vectors and new observation values flow through the
    SAME artifact (the monthly-refit serving pattern)."""
    mod, lp, pcoords = _setup()
    blob = export_local_prediction(lp, 0, pcoords, max_dist=0.5)
    served = load_program(blob)
    fn, (flat, pc, v0, v1) = make_local_prediction_fn(
        lp, 0, pcoords, max_dist=0.5
    )

    flat2 = jnp.asarray(np.asarray(flat) * 1.1)
    v0b = v0 * 0.5
    pred_a, _, _ = served(flat, pc, v0, v1)
    pred_b, _, _ = served(flat2, pc, v0b, v1)
    a, b = np.asarray(pred_a), np.asarray(pred_b)
    ok = np.isfinite(a) & np.isfinite(b)
    assert ok.any()
    assert not np.allclose(a[ok], b[ok])  # inputs actually matter
