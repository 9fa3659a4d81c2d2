"""Strong-scaling measurement on the virtual CPU mesh (VERDICT r2 #7).

Runs the three sharded hot paths — row-sharded empirical variogram,
term-sharded Vecchia NLL value+grad, and location-sharded local
prediction — at 1/2/4/8 devices of an 8-virtual-device CPU mesh,
recording warm wall-clock AND the per-device shard rows (the proof that
per-device work shrinks — virtual devices share the same physical cores,
so wall-clock alone understates what a real 8-chip slice gains; ICI
collectives replace what is memory traffic here).

    python tools/strong_scaling.py          # needs no TPU; CPU-only

Results are recorded in docs/DESIGN.md §8.
"""

import os
import sys
import time

os.environ["XLA_FLAGS"] = (
    "--xla_force_host_platform_device_count=8 "
    + os.environ.get("XLA_FLAGS", "")
)
os.environ["PALLAS_AXON_POOL_IPS"] = ""

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(os.environ.get("BENCH_N", 1500))  # per process
REPS = 2
# BENCH_STAGES=vario runs only the variogram + collective-decomposition
# columns (the vecchia/predict stages are ~50 s per device count on the
# shared-core virtual mesh and have their own full-table record)
STAGES = os.environ.get("BENCH_STAGES", "all")


def timed(fn, *args, **kw):
    import jax

    out = fn(*args, **kw)  # compile + warm
    jax.block_until_ready(out)
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return min(ts), out


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import cokriging_tpu  # noqa: F401  (x64 + cache config)
    from cokriging_tpu.cov import MaternParams, MultivariateMatern
    from cokriging_tpu.cov.params import ParamSpec
    from cokriging_tpu.estimate.empirical import VarioConfig
    from cokriging_tpu.estimate.vecchia import VecchiaLikelihood
    from cokriging_tpu.fields.field import Field, MultiField
    from cokriging_tpu.parallel import (
        make_mesh,
        sharded_local_predict,
        sharded_variogram_pair,
        sharded_vecchia_nll,
    )
    from cokriging_tpu.predict import LocalPredictor

    assert len(jax.devices()) >= 8, "needs the 8-virtual-device CPU mesh"
    rng = np.random.default_rng(0)
    lat = rng.uniform(24.0, 50.0, N)
    lon = rng.uniform(-124.0, -67.0, N)
    c1 = np.column_stack([lat, lon])
    c2 = np.roll(c1, 1, axis=0) + rng.normal(scale=0.05, size=c1.shape)
    v1 = np.sin(np.deg2rad(lat) * 6.0) + 0.3 * rng.normal(size=N)
    v2 = -0.5 * v1 + 0.3 * rng.normal(size=N)

    cfg = VarioConfig(max_dist=1500.0, n_bins=12, geodesic=True)
    flat = jnp.asarray(
        [1.0, 1.0, 1.5, 1.5, 1.5, 300.0, 300.0, 300.0, 0.05, 0.05, -0.5]
    )
    spec = ParamSpec(n_procs=2)
    lik = VecchiaLikelihood([c1, c2], [v1, v2], m=10, geodesic=True, chunk=1024)

    params = MaternParams.default(2).with_flat(flat)
    sub = max(1, N // 400)
    f1 = Field.from_arrays(c1[::sub], v1[::sub], "Z0")
    f1.geodesic = True
    f2 = Field.from_arrays(c2[::sub], v2[::sub], "Z1")
    f2.geodesic = True
    mf = MultiField(fields=[f1, f2])
    lp = LocalPredictor(MultivariateMatern(params=params), mf)
    pcoords = np.column_stack(
        [rng.uniform(28.0, 46.0, 2048), rng.uniform(-120.0, -72.0, 2048)]
    )

    print(f"n={2*N} obs, {len(pcoords)} pred locations, m={lik.m}")
    header = (
        f"{'devs':>4} {'vario_s':>8} {'coll_s':>7} {'pad_%':>6} "
        f"{'vecchia_s':>10} {'predict_s':>10} "
        f"{'vario_rows/dev':>15} {'terms/dev':>10} {'locs/dev':>9}"
    )
    print(header)
    base = {}
    from functools import partial

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    for n_dev in (1, 2, 4, 8):
        mesh = make_mesh(n_dev)

        t_v, _ = timed(
            sharded_variogram_pair, c1, v1, c1, v1, cfg, True, mesh=mesh
        )

        # overhead decomposition (VERDICT r3 weak #7): the non-compute
        # cost of the sharded variogram's two-dispatch structure — a
        # shard_map pair doing ONLY the collectives on the real shapes
        # (pmin/pmax scalar pass + psum of the (n_bins,) sums/counts).
        axis = mesh.axis_names[0]

        @partial(
            shard_map, mesh=mesh, in_specs=(P(axis),), out_specs=(P(), P()),
            check_vma=False,
        )
        def _coll_minmax(x):
            s = jnp.sum(x)
            return (
                jax.lax.pmin(s, axis)[None],
                jax.lax.pmax(s, axis)[None],
            )

        @partial(
            shard_map, mesh=mesh, in_specs=(P(axis),), out_specs=(P(), P()),
            check_vma=False,
        )
        def _coll_bins(x):
            s = jnp.zeros(cfg.n_bins, x.dtype) + jnp.sum(x)
            return jax.lax.psum(s, axis), jax.lax.psum(s + 1.0, axis)

        pad64 = -(-N // (n_dev * 64)) * 64 * n_dev - N
        xdummy = jnp.zeros(N + pad64)

        def _both_colls(x):
            a = _coll_minmax(x)
            b = _coll_bins(x)
            return a, b

        t_coll, _ = timed(_both_colls, xdummy)

        # padding overhead the variogram shards actually stream
        # (64-row granularity; the old full-_BLOCK rule cost 2.7x at 8
        # devices — VERDICT r3 weak #7)
        chunk_rows = -(-N // (n_dev * 64)) * 64
        pad_rows = n_dev * chunk_rows - N

        def vecchia_vg(x):
            return jax.value_and_grad(
                lambda f: sharded_vecchia_nll(lik, f, spec, mesh=mesh,
                                              chunk=1024)
            )(x)

        if STAGES == "vario":
            t_n = t_p = float("nan")
            nll = None
        else:
            t_n, (nll, g) = timed(vecchia_vg, flat)
            t_p, _ = timed(
                sharded_local_predict, lp, 0, pcoords, 1000.0, mesh=mesh
            )

        n_terms = lik._win[0].shape[0]
        rows_dev = -(-N // n_dev)
        terms_dev = -(-n_terms // n_dev)
        locs_dev = -(-len(pcoords) // n_dev)
        print(
            f"{n_dev:>4} {t_v:>8.3f} {t_coll:>7.3f} "
            f"{100.0 * pad_rows / N:>6.1f} "
            f"{t_n:>10.3f} {t_p:>10.3f} "
            f"{chunk_rows:>15} {terms_dev:>10} {locs_dev:>9}"
        )
        base.setdefault("v", t_v)
        base.setdefault("n", t_n)
        base.setdefault("p", t_p)
        if nll is not None:
            assert np.isfinite(float(nll))
    extra = (
        ""
        if STAGES == "vario"
        else (
            f"  vecchia {base['n'] / t_n:.2f}x"
            f"  predict {base['p'] / t_p:.2f}x"
        )
    )
    print(
        "speedup@8dev: "
        f"vario {base['v'] / t_v:.2f}x{extra}  (virtual devices share "
        "cores; per-device work columns are the scaling proof)"
    )


if __name__ == "__main__":
    main()
