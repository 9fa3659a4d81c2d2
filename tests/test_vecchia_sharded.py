"""Mesh-sharded Vecchia NLL (parallel.sharded_vecchia_nll): the term axis
distributed over the 8-virtual-device CPU mesh must reproduce the
single-device value exactly (the sum is order-independent up to float
rounding, and padded terms are fully-masked zero contributions), and its
gradient must flow through shard_map + psum."""

import jax
import jax.numpy as jnp
import numpy as np

from cokriging_tpu.cov import MaternParams
from cokriging_tpu.estimate.vecchia import VecchiaLikelihood
from cokriging_tpu.parallel import make_mesh, sharded_vecchia_nll

FLAT = jnp.asarray(
    [1.1, 0.9, 1.5, 1.2, 1.4, 0.25, 0.3, 0.27, 0.04, 0.06, -0.55]
)


def _lik(n=75):
    """n not divisible by 8: exercises the masked-padding path."""
    rng = np.random.default_rng(5)
    c1 = rng.uniform(0, 1, (n, 2))
    c2 = rng.uniform(0, 1, (n + 3, 2))
    v1 = rng.normal(size=n)
    v2 = rng.normal(size=n + 3)
    return VecchiaLikelihood([c1, c2], [v1, v2], m=12, geodesic=False, chunk=32)


def test_sharded_vecchia_nll_matches_single_device():
    lik = _lik()
    spec = MaternParams.default(2).spec
    want = float(lik.nll(FLAT, spec))
    mesh = make_mesh()
    got = float(sharded_vecchia_nll(lik, FLAT, spec, mesh=mesh, chunk=32))
    np.testing.assert_allclose(got, want, rtol=1e-10)


def test_fit_vecchia_mesh_path_runs():
    """fit_vecchia(mesh=...) drives the sharded objective end to end and
    lands at the same optimum as the mesh-less fit from the same init
    (identical objective values => identical L-BFGS trajectory)."""
    from cokriging_tpu.cov.params import ParamSpec
    from cokriging_tpu.estimate.vecchia import fit_vecchia
    from cokriging_tpu.fields.field import Field, MultiField

    rng = np.random.default_rng(9)
    n = 50
    coords = rng.uniform(0, 1, (n, 2))
    vals = rng.normal(size=n)
    fields = []
    for k in range(2):
        f = Field.from_arrays(coords, vals + 0.3 * rng.normal(size=n), f"Z{k}")
        f.geodesic = False
        fields.append(f)
    mf = MultiField(fields=fields)
    spec = ParamSpec(
        n_procs=2, len_scale_bounds=(0.05, 2.0), sigma_bounds=(0.2, 3.0)
    )
    init = MaternParams.default(2, spec).with_flat(
        jnp.asarray([1.0, 1.0, 1.5, 1.5, 1.5, 0.5, 0.5, 0.5, 0.05, 0.05, 0.0])
    )
    kw = dict(m=8, maxiter=60, main=False, chunk=16)
    p_single, i_single = fit_vecchia(mf, init=init, **kw)
    # This tiny two-correlated-fields surface is genuinely multimodal:
    # from the shared init, eps-scale reduction-order differences between
    # layouts can (and do) select different basins, so same-init NLL
    # comparison is not an invariant. The layout-robust invariant: the
    # sharded objective must RECOGNIZE the single-path optimum — a mesh
    # fit warm-started there stays there (identical objective values are
    # separately pinned exactly by
    # test_sharded_vecchia_nll_matches_single_device).
    p_mesh, i_mesh = fit_vecchia(mf, mesh=make_mesh(), init=p_single, **kw)
    assert i_mesh["nll"] <= i_single["nll"] + max(
        1e-3, 1e-4 * abs(i_single["nll"])
    )
    np.testing.assert_allclose(
        np.asarray(p_mesh.sigma), np.asarray(p_single.sigma), atol=0.05
    )
    # and the mesh path runs end-to-end from a cold init too
    p_cold, i_cold = fit_vecchia(mf, mesh=make_mesh(), init=init, **kw)
    assert np.isfinite(i_cold["nll"])


def test_sharded_vecchia_nll_grad_matches():
    lik = _lik(40)
    spec = MaternParams.default(2).spec
    mesh = make_mesh()
    g_single = jax.grad(lambda f: lik.nll(f, spec))(FLAT)
    g_shard = jax.grad(
        lambda f: sharded_vecchia_nll(lik, f, spec, mesh=mesh, chunk=16)
    )(FLAT)
    np.testing.assert_allclose(
        np.asarray(g_shard), np.asarray(g_single), rtol=1e-8, atol=1e-10
    )
