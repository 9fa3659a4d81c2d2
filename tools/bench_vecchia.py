"""Warm Vecchia NLL value+gradient throughput at large N (VERDICT r2 #1).

Builds a synthetic bivariate scaffold of BENCH_TERMS total terms (default
80k, m=20, f32), then times the warm jitted value_and_grad of the Vecchia
NLL — the inner loop of every large-n likelihood fit. Fresh parameter
values per rep defeat the axon result cache.

    python tools/bench_vecchia.py            # 80k terms, m=20
    BENCH_TERMS=200000 BENCH_M=30 python tools/bench_vecchia.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TERMS = int(os.environ.get("BENCH_TERMS", 80_000))
M = int(os.environ.get("BENCH_M", 20))
CHUNK = int(os.environ.get("BENCH_CHUNK", 4096))


def main():
    import jax
    import jax.numpy as jnp
    from cokriging_tpu.cov.params import MaternParams
    from cokriging_tpu.estimate.vecchia import VecchiaLikelihood

    print(f"backend={jax.default_backend()} terms={TERMS} m={M} chunk={CHUNK}")

    rng = np.random.default_rng(0)
    n_per = TERMS // 2
    coords = [
        rng.uniform((25.0, -125.0), (50.0, -65.0), size=(n_per, 2)).astype(
            np.float32
        )
        for _ in range(2)
    ]
    values = [rng.normal(size=n_per).astype(np.float32) for _ in range(2)]

    t0 = time.perf_counter()
    lik = VecchiaLikelihood(coords, values, m=M, geodesic=True, chunk=CHUNK)
    jax.block_until_ready(lik._win)
    t_scaffold = time.perf_counter() - t0
    print(f"scaffold (maxmin + neighbors + windows): {t_scaffold:.1f} s")

    params = MaternParams.default(2)
    spec = params.spec
    x0 = np.asarray(params.to_flat(), np.float32)

    from cokriging_tpu.estimate.vecchia import vecchia_nll_value_and_grad

    def vg(x):
        # windows as args (not closure constants): see
        # vecchia_nll_value_and_grad — 570 MB of embedded constants at 1M
        # terms blows the remote-compile payload limit
        return vecchia_nll_value_and_grad(
            x, lik._win, spec, geodesic=True, chunk=CHUNK
        )

    t0 = time.perf_counter()
    v, g = vg(jnp.asarray(x0))
    jax.block_until_ready((v, g))
    t_compile = time.perf_counter() - t0
    print(f"first value+grad (compile): {t_compile:.1f} s  nll={float(v):.2f}")

    ts = []
    for i in range(3):
        x = jnp.asarray(x0 * (1.0 + 0.01 * (i + 1)))
        t0 = time.perf_counter()
        v, g = vg(x)
        jax.block_until_ready((v, g))
        ts.append(time.perf_counter() - t0)
    warm = min(ts)
    print(
        f"warm value+grad: {warm:.2f} s  "
        f"({TERMS * (M + 1) ** 2 / warm / 1e6:.1f} M window-entries/s)  "
        f"grad finite={bool(np.isfinite(np.asarray(g)).all())}"
    )


if __name__ == "__main__":
    main()
