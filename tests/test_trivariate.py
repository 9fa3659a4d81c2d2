"""General-p (p = 3) support: the reference is bivariate-only in practice
(src/model.py:199-207 uses an np.nanprod trick that breaks for p > 2, and
its all-process sill in cross_semivariance, src/model.py:215-222, is only
correct when "all processes" == "the pair"). This framework generalizes:
the cross-semivariogram uses the pair sill 0.5 (C_ii(0) + C_jj(0)) — equal
to the reference's formula at p = 2 — and every stage (empirical
variograms, moment initializer, WLS fit, joint + local cokriging) runs
unchanged for three processes."""

import warnings

import jax.numpy as jnp
import numpy as np
import pytest

from cokriging_tpu.cov import MaternParams, MultivariateMatern
from cokriging_tpu.cov.matern import block_covariance, cross_semivariance
from cokriging_tpu.cov.params import ParamSpec
from cokriging_tpu.estimate import VarioConfig, empirical_variograms
from cokriging_tpu.estimate.wls import fit_wls, moment_init
from cokriging_tpu.fields.field import Field, MultiField
from cokriging_tpu.predict import JointPredictor, LocalPredictor
from cokriging_tpu.sim.cofield import CartesianGrid

SPEC3 = ParamSpec(n_procs=3, len_scale_bounds=(0.02, 2.0), sigma_bounds=(0.2, 3.0))
# flat order: sigma(3), nu(6), len_scale(6), nugget(3), rho: 01, 02, 12
TRUE_RHO = (-0.6, 0.4, -0.2)
TRUTH_FLAT = np.array(
    [1.0, 1.0, 1.0] + [1.5] * 6 + [0.2] * 6 + [0.05, 0.05, 0.05] + list(TRUE_RHO)
)


@pytest.fixture(scope="module")
def tri_sim():
    """Exact trivariate Matern cofield on a 31x31 unit-square grid."""
    truth = MaternParams.from_flat(jnp.asarray(TRUTH_FLAT), spec=SPEC3)
    grid = CartesianGrid(xcount=31, ycount=31)
    d = grid.dist
    C = block_covariance(truth, [[d, d, d]] * 3, h_grad=False)
    L = np.linalg.cholesky(np.asarray(C))
    rng = np.random.default_rng(7)
    n = grid.count
    reps = []
    for _ in range(4):
        z = L @ rng.normal(size=3 * n)
        reps.append([z[:n], z[n : 2 * n], z[2 * n :]])
    coords = np.column_stack([grid.coords["x"].values, grid.coords["y"].values])
    return truth, coords, reps


def _fields(coords, zs, step=1):
    out = []
    for k in range(3):
        f = Field.from_arrays(coords[::step], zs[k][::step], f"Z{k}")
        f.geodesic = False
        out.append(f)
    return out


def test_pair_sill_reduces_to_reference_at_p2():
    """At p = 2 the pair sill equals the reference's all-process nansum
    (src/model.py:215-222): values must be bitwise-identical."""
    p2 = MaternParams.default(2).with_flat(
        jnp.asarray([1.2, 0.8, 1.5, 1.0, 0.5, 0.3, 0.2, 0.4, 0.05, 0.1, -0.4])
    )
    h = jnp.asarray([0.0, 0.1, 0.5])
    got = np.asarray(cross_semivariance(p2, 0, 1, h))
    ref_sill = 0.5 * float(jnp.sum(p2.sigma**2 + p2.nugget))
    from cokriging_tpu.cov.matern import cross_covariance

    want = ref_sill - np.asarray(cross_covariance(p2, 0, 1, h))
    np.testing.assert_allclose(got, want, rtol=0, atol=0)


def test_p3_cross_semivariance_uses_pair_sill(tri_sim):
    truth, _, _ = tri_sim
    h = jnp.asarray([1e9])  # far field: correlation ~ 0 -> value == sill
    got = float(cross_semivariance(truth, 0, 1, h)[0])
    pair_sill = 0.5 * float(
        truth.sigma[0] ** 2 + truth.nugget[0] + truth.sigma[1] ** 2 + truth.nugget[1]
    )
    assert abs(got - pair_sill) < 1e-9
    all_sill = 0.5 * float(jnp.sum(truth.sigma**2 + truth.nugget))
    assert abs(got - all_sill) > 0.4  # the p=2 formula would be wrong here


def test_model_n_procs_inferred_and_checked(tri_sim):
    truth, _, _ = tri_sim
    assert MultivariateMatern(params=truth).n_procs == 3
    with pytest.raises(ValueError):
        MultivariateMatern(2, truth)


def test_empirical_config_n_procs_follows_multifield(tri_sim):
    _, coords, reps = tri_sim
    mf = MultiField(fields=_fields(coords, reps[0], step=4))
    cfg = VarioConfig(max_dist=0.5, n_bins=8, geodesic=False)  # default n_procs=2
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        est = empirical_variograms(mf, cfg)
    assert est.config.n_procs == 3
    assert est.pairs == [(0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2)]


def test_p3_wls_recovers_rho_signs_and_scales(tri_sim):
    truth, coords, reps = tri_sim
    cfg = VarioConfig(max_dist=0.5, n_bins=12, geodesic=False)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        ests = [
            empirical_variograms(MultiField(fields=_fields(coords, zs)), cfg)
            for zs in reps
        ]
        est = ests[0]
        est.bin_means = np.mean([e.bin_means for e in ests], axis=0)
        est.bin_counts = np.sum([e.bin_counts for e in ests], axis=0)
        mi = moment_init(est, spec=SPEC3)
        params, res = fit_wls(est, init=mi, method="scipy", maxiter=400)
    got = np.asarray(params.rho)[[0, 0, 1], [1, 2, 2]]
    assert np.all(np.sign(got) == np.sign(TRUE_RHO))
    np.testing.assert_allclose(got, TRUE_RHO, atol=0.25)
    np.testing.assert_allclose(np.asarray(params.sigma), 1.0, atol=0.3)
    diag_len = np.asarray(params.len_scale)[[0, 1, 2], [0, 1, 2]]
    np.testing.assert_allclose(diag_len, 0.2, atol=0.1)


def test_p3_simulator_semi_colocated(tri_sim):
    """MultivariateRandomField generalizes src/sim.py:30-137 to p = 3:
    p cofields, the first ceil(size/2) sample locations shared by all
    processes, per-process disjoint extras, and p-wide epsilon broadcast."""
    from cokriging_tpu.sim import CartesianGrid, MultivariateRandomField

    truth, _, _ = tri_sim
    grid = CartesianGrid(xcount=15, ycount=15)
    rf = MultivariateRandomField(MultivariateMatern(params=truth), grid, seed=3)
    assert len(rf.fields) == 3
    samp = rf.sample(size=40, epsilon=(0.1,))
    assert len(samp) == 3 and all(len(s) == 40 for s in samp)
    co = [set(map(tuple, np.round(s[["x", "y"]].values[:20], 9))) for s in samp]
    assert co[0] == co[1] == co[2]
    tails = [set(map(tuple, np.round(s[["x", "y"]].values[20:], 9))) for s in samp]
    assert not (tails[0] & tails[1]) and not (tails[0] & tails[2])
    mf = rf.to_fields(samp)
    assert len(mf.fields) == 3


def test_p3_joint_and_local_prediction(tri_sim):
    truth, coords, reps = tri_sim
    zs = reps[0]
    mf = MultiField(fields=_fields(coords, zs, step=2))
    mod = MultivariateMatern(params=truth)
    pc = coords[1::8]
    tv = zs[1][1::8]
    jp = JointPredictor(mod, mf)
    out = jp(1, pc, postprocess=False)
    assert np.isfinite(out["pred"].values).all()
    assert (out["pred_err"].values >= 0).all()
    mspe_joint = float(np.mean((out["pred"].values - tv) ** 2))
    assert mspe_joint < 0.3  # field variance ~1: cokriging must smooth

    lp = LocalPredictor(mod, mf)
    lout = lp(1, pc, max_dist=0.4, postprocess=False)
    lpred = lout["pred"].values
    assert np.isfinite(lpred).all()
    mspe_local = float(np.mean((lpred - tv) ** 2))
    assert mspe_local < 0.3
    # with a wide radius the local solution approaches the exact joint one
    np.testing.assert_allclose(mspe_local, mspe_joint, atol=0.05)
