"""One compiled program serves a month sweep.

``k_each`` and ``sizes`` are static jit arguments of the local-prediction
kernel; without bucketing, every month's jittering data size / neighborhood
width would force a fresh TPU compile (minutes each on the remote compile
service). LocalPredictor buckets both to powers of two, so months whose
counts land in the same bucket reuse the cached executable.
"""

import numpy as np

from cokriging_tpu.cov import MaternParams, MultivariateMatern
from cokriging_tpu.predict import LocalPredictor
from cokriging_tpu.predict.local import _local_predict_batch
from cokriging_tpu.sim import BivariateRandomField, CartesianGrid

SIM_FLAT = [1.0, 1.0, 1.5, 1.5, 1.5, 0.2, 0.2, 0.2, 0.0, 0.0, -0.6]


def test_one_compile_serves_month_sweep():
    mod = MultivariateMatern(params=MaternParams.from_flat(np.array(SIM_FLAT)))
    grid = CartesianGrid(xcount=17, ycount=17)
    rf = BivariateRandomField(mod, grid, seed=5)
    pcoords = grid.coords.values[::4]

    cache_sizes, signatures = [], []
    for k, n in enumerate([57, 61, 64]):  # months with jittering obs counts
        mf = rf.to_fields(rf.sample(size=n, epsilon=[0.1, 0.1], seed=10 + k))
        lp = LocalPredictor(mod, mf)
        # these month sizes land in one bucket: identical static signature
        signatures.append(
            (lp._sizes, lp._neighborhood_widths(pcoords, 0.6, False, 0))
        )
        out = lp(0, pcoords, max_dist=0.6, postprocess=False)
        assert np.isfinite(out["pred"]).all()
        cache_sizes.append(_local_predict_batch._cache_size())
    assert signatures[2] == signatures[1] == signatures[0], signatures
    # months 2 and 3 hit month 1's compiled program (no cache growth)
    assert cache_sizes[2] == cache_sizes[1] == cache_sizes[0]


def test_padded_predictor_matches_unpadded_semantics():
    """Padding data lanes to the pow2 profile must not perturb results:
    LOOCV at the data locations has a brute-force meaning independent of
    padding (self excluded, all true neighbors in)."""
    mod = MultivariateMatern(params=MaternParams.from_flat(np.array(SIM_FLAT)))
    grid = CartesianGrid(xcount=17, ycount=17)
    rf = BivariateRandomField(mod, grid, seed=7)
    mf = rf.to_fields(rf.sample(size=53, epsilon=[0.1, 0.1], seed=8))
    lp = LocalPredictor(mod, mf)
    n0 = int(np.asarray(mf.fields[0].coords_main).shape[0])
    # the predictor really is padded (53 obs -> 64 lanes)
    assert lp._sizes[0] > n0 and lp._n_valid[0] == n0

    cv = lp.cross_validation(0, max_dist=0.6, postprocess=False)
    assert np.isfinite(cv["pred"]).all()

    # brute-force LOOCV at a few held-out points using raw numpy linalg
    from cokriging_tpu.cov.matern import (
        covariance,
        cross_covariance,
        joint_covariance_from_coords,
    )

    coords = [np.asarray(f.coords_main) for f in mf.fields]
    values = np.concatenate([np.asarray(f.values_main) for f in mf.fields])
    jc = np.asarray(
        joint_covariance_from_coords(mod.params, coords, geodesic=False)
    )
    sizes = [c.shape[0] for c in coords]
    for t in [0, 5, 17]:
        s0 = coords[0][t]
        d0 = np.linalg.norm(coords[0] - s0, axis=1)
        d1 = np.linalg.norm(coords[1] - s0, axis=1)
        sel0 = (d0 <= 0.6) & (d0 > 0)
        sel1 = d1 <= 0.6
        idx = np.concatenate([np.where(sel0)[0], sizes[0] + np.where(sel1)[0]])
        a = jc[np.ix_(idx, idx)]
        c0 = np.asarray(covariance(mod.params, 0, d0[sel0], use_nugget=True))
        c1 = np.asarray(cross_covariance(mod.params, 0, 1, d1[sel1]))
        cvec = np.concatenate([c0, c1])
        w = np.linalg.solve(a, cvec)
        expected = w @ values[idx]
        np.testing.assert_allclose(cv["pred"].values[t], expected, rtol=1e-8)
