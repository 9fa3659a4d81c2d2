"""Micro-benchmark: chol_lower_blocked vs XLA's cholesky expander on one
large SPD matrix (the dense NLL / joint-prediction factorization shape).

Run on the target backend (TPU by default, CPU with JAX_PLATFORMS=cpu);
prints warm ms per factorization at a few n plus max abs deviation.

    python tools/bench_chol.py            # n from BENCH_N or 2048,4096,8192
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from cokriging_tpu.kernels.linalg import chol_lower_blocked

SIZES = (
    [int(os.environ["BENCH_N"])] if "BENCH_N" in os.environ else [2048, 4096, 8192]
)


def _spd(n, seed=0):
    rng = np.random.default_rng(seed)
    a = rng.normal(size=(n, n)).astype(np.float32)
    return jnp.asarray(a @ a.T / n + np.eye(n, dtype=np.float32))


def _time(fn, a, reps=3):
    fn(a).block_until_ready()  # compile + warm
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(a)
    out.block_until_ready()
    return (time.perf_counter() - t0) / reps * 1e3, out


def main():
    print(f"backend={jax.default_backend()}")
    xla_chol = jax.jit(jnp.linalg.cholesky)
    for n in SIZES:
        a = _spd(n)
        ms_xla, l_xla = _time(xla_chol, a)
        ms_blk, l_blk = _time(lambda x: chol_lower_blocked(x, block=1024), a)
        dev = float(jnp.max(jnp.abs(l_xla - l_blk)))
        gflops = (n**3 / 3) / 1e9
        print(
            f"n={n:6d}  xla={ms_xla:8.1f} ms ({gflops/ms_xla*1e3:6.0f} GF/s)"
            f"  blocked={ms_blk:8.1f} ms ({gflops/ms_blk*1e3:6.0f} GF/s)"
            f"  max|dL|={dev:.2e}"
        )


if __name__ == "__main__":
    main()
