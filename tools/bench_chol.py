"""Micro-benchmark: XLA's cholesky expander on one large SPD matrix (the
dense NLL / joint-prediction factorization shape) — the MFU anchor for
docs/DESIGN.md §9's roofline table.

A hand-blocked right-looking factorization (panel chol + wide triangular
solve + MXU Schur update) was benchmarked against this expander through
round 4: it tied at 4096 (11.4 vs 11.3 ms) and lost at 8192 (25.0 vs
20.7 ms, f32, v5e), so it was deleted rather than adopted (VERDICT r3
item 5) — XLA's expander owns the single-matrix hot path, and the batched
masked `blocked_spd_solve` (kernels/linalg.py) remains the win for the
(B, k, k) local systems.

Run on the target backend (TPU by default, CPU with the runtime platform
switch); prints warm ms per factorization at a few n plus achieved
FLOP/s.

    python tools/bench_chol.py            # n from BENCH_N or 2048,4096,8192
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SIZES = (
    [int(os.environ["BENCH_N"])] if "BENCH_N" in os.environ else [2048, 4096, 8192]
)


def _spd(n, seed=0):
    rng = np.random.default_rng(seed)
    a = rng.normal(size=(n, n)).astype(np.float32)
    return jnp.asarray(a @ a.T / n + np.eye(n, dtype=np.float32))


def _time(fn, a, reps=3):
    # fresh input per call: the axon runtime returns cached results for
    # repeated identical input buffers (see docs/DESIGN.md §2 caveat), so
    # shift the diagonal by a distinct epsilon each rep; a HOST read of a
    # scalar reduction per rep forces real execution (block_until_ready
    # alone can return on the remote runtime's enqueue ack)
    sumj = jax.jit(lambda x: jnp.sum(fn(x)))
    float(sumj(a))  # compile + warm
    eye = jnp.eye(a.shape[0], dtype=a.dtype)
    shifted = [(a + (1e-3 * (k + 1)) * eye).block_until_ready() for k in range(reps)]
    t0 = time.perf_counter()
    acc = 0.0
    for s in shifted:
        acc += float(sumj(s))
    dt = (time.perf_counter() - t0) / reps * 1e3
    assert acc == acc, "NaN factor"
    return dt


def main():
    print(f"backend={jax.default_backend()}")
    xla_chol = jax.jit(jnp.linalg.cholesky)
    for n in SIZES:
        a = _spd(n)
        ms_xla = _time(xla_chol, a)
        gflops = (n**3 / 3) / 1e9
        print(
            f"n={n:6d}  xla={ms_xla:8.1f} ms ({gflops / ms_xla * 1e3:6.0f} GF/s)"
        )


if __name__ == "__main__":
    main()
