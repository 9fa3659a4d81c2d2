"""Stage breakdown of one exact-NLL value+grad eval at the n≈25k north star.

Times, separately and end-to-end on the ambient backend (fresh parameter
values per call to defeat the axon result cache):

  1. covariance assembly forward (Pallas path where eligible)
  2. jnp.linalg.cholesky of the (n, n) system
  3. tri_inv_lower (blocked triangular inverse)
  4. linv.T @ linv (HIGHEST-precision MXU matmul)
  5. full neg_log_likelihood value+grad

Usage: python tools/bench_nll_stages.py [n_per_proc]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def timed(fn, *args, reps=3):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    import jax
    import jax.numpy as jnp

    from cokriging_tpu.cov.params import MaternParams
    from cokriging_tpu.cov.matern import block_covariance
    from cokriging_tpu.estimate.nll import (
        joint_distance_blocks,
        neg_log_likelihood,
    )
    from cokriging_tpu.kernels.linalg import tri_inv_lower

    n_half = int(sys.argv[1]) if len(sys.argv) > 1 else 12_500
    dtype = jnp.float32 if jax.default_backend() == "tpu" else jnp.float64
    rng = np.random.default_rng(0)
    coords = [
        np.column_stack(
            [rng.uniform(24, 50, n_half), rng.uniform(-124, -67, n_half)]
        ).astype(dtype)
        for _ in range(2)
    ]
    z = jnp.asarray(rng.normal(size=2 * n_half), dtype)
    dists = joint_distance_blocks([jnp.asarray(c) for c in coords])
    flat0 = np.array([1, 1, 1.5, 1.5, 1.5, 500, 500, 500, 0.05, 0.05, -0.6])
    spec = MaternParams.default(2).spec

    def fresh_flat(i):
        return jnp.asarray(
            flat0 * (1.0 + 1e-4 * (i + 1)), dtype
        )

    n = 2 * n_half
    print(f"backend={jax.default_backend()} n={n} dtype={dtype.__name__}")

    # 1. assembly forward
    @jax.jit
    def assemble(f):
        params = MaternParams.from_flat(f, spec=spec)
        return block_covariance(params, dists, h_grad=False)

    t = timed(lambda i: assemble(fresh_flat(i)), 0)
    print(f"assembly fwd:      {t:.3f} s")
    cov = assemble(fresh_flat(0)) + 0.1 * jnp.eye(n, dtype=dtype)

    # 2. cholesky
    chol_j = jax.jit(jnp.linalg.cholesky)
    t = timed(lambda s: chol_j(cov + s * jnp.eye(n, dtype=dtype)), 0.01)
    print(f"XLA cholesky:      {t:.3f} s")
    L = chol_j(cov)

    # 3. blocked triangular inverse
    t = timed(lambda s: tri_inv_lower(L + s * jnp.eye(n, dtype=dtype)), 0.001)
    print(f"tri_inv_lower:     {t:.3f} s")
    linv = tri_inv_lower(L)

    # 4. linv.T @ linv
    mm = jax.jit(
        lambda a: jnp.matmul(a.T, a, precision=jax.lax.Precision.HIGHEST)
    )
    t = timed(lambda s: mm(linv + s), 0.001)
    print(f"linv.T @ linv:     {t:.3f} s")

    # 5. full value+grad
    @jax.jit
    def vg(f):
        return jax.value_and_grad(neg_log_likelihood)(
            f, dists, z, spec, None, 1e-4
        )

    t = timed(lambda i: vg(fresh_flat(i)), 1)
    print(f"NLL value+grad:    {t:.3f} s   ({1.0 / t:.3f} evals/s)")


if __name__ == "__main__":
    main()
