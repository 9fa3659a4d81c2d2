"""Scale demo: matrix-free exact joint cokriging past the dense ceiling.

Times IterativeJointPredictor (predict/iterative.py) on a synthetic
bivariate CONUS-shaped dataset of N total observations. The dense
JointPredictor must hold the (N x N) joint covariance — f32 runs out of a
single chip's HBM around N ~ 45k — while the blocked-CG path holds
O(block x N) and keeps going. Run with --n small enough and it
cross-checks the two solvers' agreement.

Usage:
    python tools/bench_iterative.py --n 20000 --npred 512 --check
    python tools/bench_iterative.py --n 60000 --npred 512
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=20_000,
                    help="total observations across the two processes")
    ap.add_argument("--npred", type=int, default=512)
    ap.add_argument("--block", type=int, default=1024)
    ap.add_argument("--rhs-batch", type=int, default=256)
    ap.add_argument("--tol", type=float, default=1e-5)
    ap.add_argument("--maxiter", type=int, default=600)
    ap.add_argument("--check", action="store_true",
                    help="also run the dense JointPredictor and report the "
                         "max deviation (requires the matrix to fit)")
    ap.add_argument("--no-err", action="store_true",
                    help="prediction mean only (one 1-RHS CG total)")
    args = ap.parse_args()

    import jax
    import cokriging_tpu  # noqa: F401  (x64 config)
    from cokriging_tpu.cov import MaternParams, MultivariateMatern
    from cokriging_tpu.fields.field import Field, MultiField
    from cokriging_tpu.predict import IterativeJointPredictor, JointPredictor

    backend = jax.default_backend()
    dtype = np.float32 if backend == "tpu" else np.float64
    rng = np.random.default_rng(0)
    n_each = args.n // 2

    def coords(n):
        c = np.column_stack(
            [rng.uniform(24.0, 50.0, n), rng.uniform(-124.0, -67.0, n)]
        )
        return c.astype(dtype)

    fields = []
    for k in range(2):
        c = coords(n_each)
        v = (
            np.sin(np.deg2rad(c[:, 0]) * 6) * (1 - 2 * k)
            + 0.4 * rng.normal(size=n_each)
        ).astype(dtype)
        f = Field.from_arrays(c, v, f"Z{k}")
        f.geodesic = True
        fields.append(f)
    mf = MultiField(fields=fields)
    flat = np.array(
        [1.0, 1.2, 1.5, 1.3, 1.1, 400.0, 500.0, 450.0, 0.05, 0.08, -0.5],
        dtype,
    )
    mod = MultivariateMatern(params=MaternParams.from_flat(flat))
    pc = coords(args.npred)

    ijp = IterativeJointPredictor(
        mod, mf, block=args.block, rhs_batch=args.rhs_batch,
        tol=args.tol, maxiter=args.maxiter,
    )
    kw = dict(postprocess=False, compute_err=not args.no_err)
    t0 = time.perf_counter()
    out = ijp(0, pc, **kw)
    warm = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = ijp(0, pc, **kw)
    hot = time.perf_counter() - t0
    iters = [k for k, _ in ijp.last_diagnostics]
    print(
        f"backend={backend} N={args.n} npred={args.npred} "
        f"block={args.block} err={not args.no_err}: "
        f"warm {warm:.2f}s, hot {hot:.2f}s, CG iters {iters}"
    )
    assert np.isfinite(out["pred"].to_numpy()).all()

    if args.check:
        t0 = time.perf_counter()
        dense = JointPredictor(mod, mf)(0, pc, postprocess=False)
        t_dense = time.perf_counter() - t0
        dp = np.abs(out["pred"] - dense["pred"]).max()
        print(f"dense {t_dense:.2f}s; max|dpred| = {dp:.3e}", end="")
        if not args.no_err:
            de = np.abs(out["pred_err"] - dense["pred_err"]).max()
            print(f", max|dpred_err| = {de:.3e}")
        else:
            print()


if __name__ == "__main__":
    main()
