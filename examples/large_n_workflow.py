"""Large-n workflow: likelihood fit + cokriging WITHOUT any n^2 object.

The reference tops out at a few thousand observations (n x n NumPy
matrices in RAM, src/fields.py:192-206; one joint Cholesky,
src/joint_prediction.py:68-73). This framework's exact paths already push
that to n ~ 25k on one chip; this example shows the pair of estimators
that removes the ceiling entirely:

  1. fit:     estimate.vecchia.fit_vecchia — O(N m) memory, O(N m^3) flops
  2. predict: LocalPredictor(materialize_cov=False) — local systems
              assembled on the fly from gathered neighborhood coords

Both are exact-by-construction in their conventions (tests pin them to
the dense paths); nothing in the pipeline materializes an n x n matrix.
Sizes auto-scale to the backend (TPU f32 fast path / CPU f64 small).
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import warnings

import numpy as np

warnings.filterwarnings("ignore")


def main():
    import jax
    import jax.numpy as jnp

    from cokriging_tpu.cov import MaternParams, MultivariateMatern
    from cokriging_tpu.cov.params import ParamSpec
    from cokriging_tpu.estimate.vecchia import fit_vecchia
    from cokriging_tpu.fields.field import Field, MultiField
    from cokriging_tpu.predict import LocalPredictor

    on_tpu = jax.default_backend() == "tpu"
    # 120k total observations: past the round-3 cap (40k/process), with
    # the O(N log N) kd scaffold and the host-kd prediction path both
    # engaged. The committed top-of-axis record (N = 10^6, converged fit
    # + held-out coverage) is examples/million_point_workflow.py.
    n = 60_000 if on_tpu else 300         # per process
    n_pred = 4_000 if on_tpu else 100
    # with the gathered-pairs Pallas kernels one warm value+grad at 120k
    # terms is ~4.5 s, so the converged fit lands in minutes;
    # accuracy studies use m sweeps (examples/vecchia_scaling.py)
    m = 20 if on_tpu else 12
    # f32 on TPU (the fast path, DESIGN.md §6): emulated f64 there is
    # ~50x slower and at this scale faults the worker outright
    dtype = np.float32 if on_tpu else np.float64
    print(
        f"backend={jax.default_backend()} n/process={n} m={m} "
        f"dtype={np.dtype(dtype).name}"
    )

    # synthetic CONUS-like bivariate field: shared smooth signal + noise
    rng = np.random.default_rng(0)
    lat = rng.uniform(24.0, 50.0, n).astype(dtype)
    lon = rng.uniform(-124.0, -67.0, n).astype(dtype)
    base = np.sin(np.deg2rad(lat) * 6.0) + 0.5 * np.cos(np.deg2rad(lon) * 4.0)
    c1 = np.column_stack([lat, lon])
    c2 = np.column_stack([lat, lon])[::-1]
    z1 = base + 0.3 * rng.normal(size=n)
    z2 = -0.6 * base[::-1] + 0.3 * rng.normal(size=n)
    z1 = ((z1 - z1.mean()) / z1.std()).astype(dtype)
    z2 = ((z2 - z2.mean()) / z2.std()).astype(dtype)

    fields = []
    for c, z, name in ((c1, z1, "XCO2"), (c2, z2, "SIF")):
        f = Field.from_arrays(c, z, name)
        f.geodesic = True
        fields.append(f)
    mf = MultiField(fields=fields)

    spec = ParamSpec(n_procs=2)
    init = MaternParams.default(2, spec).with_flat(
        jnp.asarray(
            [1.0, 1.0, 1.5, 1.5, 1.5, 500.0, 500.0, 500.0, 0.05, 0.05, 0.0]
        )
    )

    t0 = time.perf_counter()
    params, info = fit_vecchia(
        mf, init=init, m=m, maxiter=80 if on_tpu else 40, main=False,
        chunk=4096,
    )
    t_fit = time.perf_counter() - t0
    print(
        f"vecchia fit: nll={info['nll']:.2f} evals={info['n_obj_evals']} "
        f"({t_fit:.1f}s, N={info['n']})"
    )
    print(f"fitted rho = {float(params.rho[0, 1]):+.3f} (signal is negative)")
    print("fitted flat:", np.round(np.asarray(params.to_flat()), 3).tolist())

    # unconstrained likelihood fits can land outside the spectral validity
    # region (the reference's validity check is a TODO stub,
    # src/model.py:172); predicting with an invalid model makes every
    # local Cholesky non-PD -> all-NaN. Project onto the parsimonious
    # valid cross-structure first (cov.spectral, Gneiting 2010 §3).
    from cokriging_tpu.cov.spectral import project_to_valid

    params = project_to_valid(params, parsimony=True).astype(dtype)
    print(f"projected rho = {float(params.rho[0, 1]):+.3f}")

    # O(n)-memory cokriging of SIF on a fresh grid
    glat = np.linspace(25.0, 49.0, int(np.sqrt(n_pred)))
    glon = np.linspace(-123.0, -68.0, int(np.sqrt(n_pred)))
    gg = np.stack(np.meshgrid(glat, glon), -1).reshape(-1, 2).astype(dtype)
    mod = MultivariateMatern(params=params)
    lp = LocalPredictor(mod, mf, materialize_cov=False)
    # at ~14 km mean point spacing a 120 km radius already holds ~500
    # joint neighbors per cell; the reference's 1000 km default (sized for
    # ~200 obs/field, src/point_prediction.py:45) would gather ~16k-wide
    # neighborhoods here and stall the vmapped solves
    t0 = time.perf_counter()
    out = lp(1, gg, max_dist=120.0, postprocess=False)
    t_pred = time.perf_counter() - t0
    ok = np.isfinite(out["pred"].values)
    print(
        f"direct-cov local cokriging: {len(gg)} cells in {t_pred:.1f}s, "
        f"{int(ok.sum())} finite, mean err {np.nanmean(out['pred_err']):.3f}"
    )
    assert float(params.rho[0, 1]) < 0.0
    assert ok.mean() > 0.95

    # exact joint cokriging, matrix-free: the blocked-CG solver
    # re-assembles covariance row tiles on the fly, so the joint system is
    # solved without ever allocating it. Memory is O(block * N), but
    # wall-clock is (CG iters) x (one full N^2 K_nu assembly) — so the
    # bounded demo runs it at the 25k north-star scale on a subset (the
    # dense JointPredictor's ~30k f32 memory ceiling is where this path
    # takes over; tests/test_iterative.py pins the two paths equal)
    from cokriging_tpu.predict import IterativeJointPredictor

    if on_tpu:
        n_sub = 12_500
        sub_fields = []
        for c, zv, name in ((c1, z1, "XCO2"), (c2, z2, "SIF")):
            fsub = Field.from_arrays(c[:n_sub], zv[:n_sub], name)
            fsub.geodesic = True
            sub_fields.append(fsub)
        mf_exact = MultiField(fields=sub_fields)
    else:
        mf_exact = mf
    n_exact = min(len(gg), 256)
    # one rhs chunk (rhs_batch >= n_exact): every CG iteration re-assembles
    # the covariance tile-by-tile, so chunks multiply the N^2 work
    ijp = IterativeJointPredictor(
        mod, mf_exact, block=512 if on_tpu else 128,
        rhs_batch=256 if on_tpu else 64, tol=1e-3 if on_tpu else 1e-5,
        maxiter=40 if on_tpu else 1000,
    )
    t0 = time.perf_counter()
    jout = ijp(1, gg[:n_exact], postprocess=False)
    t_joint = time.perf_counter() - t0
    iters = [k for k, _ in ijp.last_diagnostics]
    print(
        f"matrix-free exact joint cokriging: {n_exact} cells in "
        f"{t_joint:.1f}s (CG iters {iters}), "
        f"mean err {np.nanmean(jout['pred_err']):.3f}"
    )
    assert np.isfinite(jout["pred"].values).all()


if __name__ == "__main__":
    main()
