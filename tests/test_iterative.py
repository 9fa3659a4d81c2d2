"""Matrix-free iterative joint cokriging (predict/iterative.py): the
blocked-CG solver must reproduce the dense JointPredictor — same system
(src/joint_prediction.py:35-153), different linear algebra — to solver
tolerance, single-device and mesh-sharded, including padding lanes."""

import numpy as np
import pandas as pd
import pytest

import jax.numpy as jnp

from cokriging_tpu.cov import MaternParams, MultivariateMatern
from cokriging_tpu.cov.matern import joint_covariance_from_coords
from cokriging_tpu.fields.field import Field, MultiField
from cokriging_tpu.parallel import make_mesh
from cokriging_tpu.predict import IterativeJointPredictor, JointPredictor
from cokriging_tpu.predict.iterative import _matvec_fn, _solve_core

# well-conditioned truth: moderate nugget keeps CG iteration counts small
FLAT = [1.0, 1.3, 1.5, 1.2, 0.8, 0.25, 0.2, 0.3, 0.05, 0.08, -0.5]


def _mf(n1=60, n2=71, seed=0):
    rng = np.random.default_rng(seed)
    c1 = rng.uniform(0.0, 1.0, (n1, 2))
    c2 = rng.uniform(0.0, 1.0, (n2, 2))
    f1 = Field.from_arrays(c1, rng.normal(size=n1), "Z0")
    f2 = Field.from_arrays(c2, rng.normal(size=n2), "Z1")
    return MultiField(fields=[f1, f2])


@pytest.fixture(scope="module")
def setup():
    params = MaternParams.from_flat(np.array(FLAT))
    mod = MultivariateMatern(params=params)
    mf = _mf()
    rng = np.random.default_rng(3)
    pcoords = pd.DataFrame(
        {"x": rng.uniform(0.1, 0.9, 23), "y": rng.uniform(0.1, 0.9, 23)}
    ).values
    return mod, mf, pcoords


def test_matvec_matches_dense(setup):
    """The tiled matrix-free matvec == dense joint covariance @ V, with
    padded rows masked to zero (block does not divide N: padding lanes
    exercised)."""
    mod, mf, _ = setup
    coords_t = tuple(f.coords_main for f in mf.fields)
    dense = np.asarray(
        joint_covariance_from_coords(mod.params, coords_t, geodesic=False)
    )
    n = dense.shape[0]  # 131 — not a multiple of block=16
    block = 16
    pad = (-n) % block
    coords = np.concatenate([np.asarray(c) for c in coords_t])
    procs = np.concatenate(
        [np.full(len(c), k, np.int32) for k, c in enumerate(coords_t)]
    )
    coords = np.concatenate([coords, np.repeat(coords[-1:], pad, 0)])
    procs = np.concatenate([procs, np.repeat(procs[-1:], pad)])
    mask = np.zeros(n + pad)
    mask[:n] = 1.0

    rng = np.random.default_rng(1)
    V = np.zeros((n + pad, 3))
    V[:n] = rng.normal(size=(n, 3))

    mv = _matvec_fn(False, block, None)
    got = np.asarray(
        mv(mod.params, jnp.asarray(coords), jnp.asarray(procs),
           jnp.asarray(mask), jnp.asarray(V))
    )
    np.testing.assert_allclose(got[:n], dense @ V[:n], rtol=1e-10, atol=1e-12)
    assert np.all(got[n:] == 0.0)


@pytest.mark.parametrize("i", [0, 1])
def test_iterative_matches_dense_joint(setup, i):
    """pred and pred_err match JointPredictor to CG tolerance; rhs_batch=16
    over 23 prediction points exercises the padded final chunk."""
    mod, mf, pcoords = setup
    want = JointPredictor(mod, mf)(i, pcoords, postprocess=False)
    ijp = IterativeJointPredictor(
        mod, mf, block=32, rhs_batch=16, tol=1e-10, maxiter=500
    )
    got = ijp(i, pcoords, postprocess=False)
    np.testing.assert_allclose(got["pred"], want["pred"], rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(
        got["pred_err"], want["pred_err"], rtol=1e-6, atol=1e-8
    )
    iters = [k for k, _ in ijp.last_diagnostics]
    assert max(iters) < 500  # converged by tolerance, not the cap


def test_iterative_mesh_matches_single_device(setup):
    """Row-sharded matvec across the 8-device mesh gives the same solution
    as the single-device path (tiled all_gather is the only collective)."""
    mod, mf, pcoords = setup
    mesh = make_mesh(8)
    single = IterativeJointPredictor(
        mod, mf, block=16, rhs_batch=16, tol=1e-10, maxiter=500
    )(0, pcoords, postprocess=False)
    sharded = IterativeJointPredictor(
        mod, mf, block=16, rhs_batch=16, tol=1e-10, maxiter=500, mesh=mesh
    )(0, pcoords, postprocess=False)
    np.testing.assert_allclose(
        sharded["pred"], single["pred"], rtol=1e-8, atol=1e-10
    )
    np.testing.assert_allclose(
        sharded["pred_err"], single["pred_err"], rtol=1e-8, atol=1e-10
    )


def test_compute_err_false_skips_variance(setup):
    mod, mf, pcoords = setup
    ijp = IterativeJointPredictor(mod, mf, block=32, rhs_batch=16, tol=1e-10)
    got = ijp(0, pcoords, postprocess=False, compute_err=False)
    want = JointPredictor(mod, mf)(0, pcoords, postprocess=False)
    np.testing.assert_allclose(got["pred"], want["pred"], rtol=1e-6, atol=1e-8)
    assert np.isnan(got["pred_err"]).all()


def test_trivariate(setup):
    """p = 3: the gathered-process matvec covers every mixed block."""
    rng = np.random.default_rng(9)
    fields = [
        Field.from_arrays(
            rng.uniform(0, 1, (n, 2)), rng.normal(size=n), f"Z{k}"
        )
        for k, n in enumerate([40, 33, 27])
    ]
    mf = MultiField(fields=fields)
    flat = np.array(
        [1.0, 1.2, 0.9,                    # sigma
         1.5, 1.3, 1.1, 1.4, 1.0, 1.2,     # nu (upper tri incl diag)
         0.3, 0.25, 0.2, 0.35, 0.3, 0.25,  # len_scale
         0.05, 0.08, 0.06,                 # nugget
         -0.4, 0.3, -0.2]                  # rho (strict upper)
    )
    params = MaternParams.from_flat(flat, n_procs=3)
    mod = MultivariateMatern(params=params)
    pc = rng.uniform(0.1, 0.9, (11, 2))
    want = JointPredictor(mod, mf)(2, pc, postprocess=False)
    got = IterativeJointPredictor(
        mod, mf, block=16, rhs_batch=8, tol=1e-10, maxiter=600
    )(2, pc, postprocess=False)
    np.testing.assert_allclose(got["pred"], want["pred"], rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(
        got["pred_err"], want["pred_err"], rtol=1e-6, atol=1e-8
    )


def test_nonconvergence_warns(setup):
    """A starved iteration cap must warn (reference's optimization
    non-convergence warning analog, src/model.py:313-314)."""
    mod, mf, pcoords = setup
    ijp = IterativeJointPredictor(
        mod, mf, block=32, rhs_batch=16, tol=1e-12, maxiter=2
    )
    with pytest.warns(UserWarning, match="did not converge"):
        ijp(0, pcoords, postprocess=False)


@pytest.mark.parametrize("i", [0, 1])
def test_iterative_loocv_matches_dense_identity(setup, i):
    """Matrix-free LOOCV (blocked unit-vector precision columns) == the
    dense precision-identity LOOCV to CG tolerance; rhs_batch=16 over 60
    (or 71) rows exercises the padded final chunk, and postprocess=False
    keeps both on the standardized scale."""
    mod, mf, _ = setup
    want = JointPredictor(mod, mf).cross_validation(i, postprocess=False)
    ijp = IterativeJointPredictor(
        mod, mf, block=32, rhs_batch=16, tol=1e-10, maxiter=500
    )
    got = ijp.cross_validation(i, postprocess=False)
    np.testing.assert_allclose(got["pred"], want["pred"], rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(
        got["pred_err"], want["pred_err"], rtol=1e-6, atol=1e-8
    )
    np.testing.assert_allclose(
        got["residual"], want["residual"], rtol=1e-6, atol=1e-8
    )
    iters = [k for k, _ in ijp.last_diagnostics]
    assert max(iters) < 500


def test_iterative_loocv_postprocess_matches_dense(setup):
    """Postprocessed frames agree too (shared loocv_frame back-transform)."""
    mod, mf, _ = setup
    want = JointPredictor(mod, mf).cross_validation(0, postprocess=True)
    got = IterativeJointPredictor(
        mod, mf, block=32, rhs_batch=32, tol=1e-10, maxiter=500
    ).cross_validation(0, postprocess=True)
    for col in ("data", "pred", "residual", "pred_err"):
        np.testing.assert_allclose(
            got[col], want[col], rtol=1e-6, atol=1e-8
        )
