"""Benchmark: 0.5-degree CONUS monthly cokriging fit + predict (n ~ 25k).

Implements BASELINE.json's north-star workload on synthetic data shaped
like the reference's real pipeline (research/modelling_demo_sif.ipynb):

1. empirical (cross-)semivariograms over n ~ 25k paired observations —
   the O(n^2) ~ 470M-pair pass, streamed in blocks (never materialized);
2. composite-WLS Matern fit (jit'd objective + exact gradients);
3. bivariate local cokriging with uncertainty at every 0.5-degree CONUS
   land cell (~6k locations), vmapped.

Prints ONE JSON line {metric, value, unit, vs_baseline}; vs_baseline is
(10 s target) / (measured wall-clock), so > 1.0 beats the target.
"""

import json
import os
import sys
import time
import warnings

import numpy as np

warnings.filterwarnings("ignore")

VERBOSE = os.environ.get("BENCH_VERBOSE", "0") == "1"

# The axon TPU tunnel has two distinct failure modes: the remote-compile
# service loses an RPC mid-stage (process waits forever on a compile), and
# the tunnel itself wedges so even the first tiny device op hangs. Both
# recover on their own after minutes. A watchdog re-execs the benchmark
# (up to _MAX_RETRIES times, sleeping _RETRY_SLEEP first so the tunnel has
# time to come back); the first device op gets a much shorter stall budget
# than compile-bearing stages since it involves no compilation.
_STALL_SECONDS = float(os.environ.get("BENCH_STALL_SECONDS", 1200))
_PROBE_STALL_SECONDS = float(os.environ.get("BENCH_PROBE_STALL_SECONDS", 150))
# Tunnel outages of 4+ hours have been observed (2026-08-18); the probe
# stall is cheap (no compiles), so retry many times with growing sleeps
# rather than giving up while the tunnel is merely down.
_MAX_RETRIES = int(os.environ.get("BENCH_MAX_RETRIES", 6))
_RETRY_SLEEP = float(os.environ.get("BENCH_RETRY_SLEEP", 120))
_HEARTBEAT = {"t": time.monotonic(), "stall": _PROBE_STALL_SECONDS}


def _log(msg, stall=None):
    _HEARTBEAT["t"] = time.monotonic()
    if stall is not None:
        _HEARTBEAT["stall"] = stall
    if VERBOSE:
        print(f"[bench {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def _start_watchdog():
    import threading

    retries = int(os.environ.get("_BENCH_RETRY", "0"))

    def watch():
        while True:
            time.sleep(15)
            if time.monotonic() - _HEARTBEAT["t"] > _HEARTBEAT["stall"]:
                if retries >= _MAX_RETRIES:
                    print(
                        f"[bench] stage stalled {retries + 1} times; giving up",
                        file=sys.stderr,
                        flush=True,
                    )
                    os._exit(3)
                sleep_s = _RETRY_SLEEP * (2 ** min(retries, 3))
                print(
                    f"[bench] stage stalled > {_HEARTBEAT['stall']:.0f}s "
                    f"(TPU tunnel/compile RPC lost); sleeping {sleep_s:.0f}s "
                    f"then re-executing (retry {retries + 1}/{_MAX_RETRIES})",
                    file=sys.stderr,
                    flush=True,
                )
                time.sleep(sleep_s)
                env = dict(os.environ, _BENCH_RETRY=str(retries + 1))
                os.execve(sys.executable, [sys.executable] + sys.argv, env)

    threading.Thread(target=watch, daemon=True).start()

N_PER_PROC = int(os.environ.get("BENCH_N", 12_500))  # paired obs ~ 25k
TARGET_SECONDS = 10.0


def _synthetic_month(rng, n):
    """CONUS-like observations: smooth spatial signal + noise."""
    lat = rng.uniform(24.0, 50.0, n)
    lon = rng.uniform(-124.0, -67.0, n)
    coords = np.column_stack([lat, lon])
    signal = (
        np.sin(np.deg2rad(lat) * 6.0)
        + 0.5 * np.cos(np.deg2rad(lon) * 4.0)
        + 0.3 * np.sin(np.deg2rad(lat * 2 + lon))
    )
    return coords, signal


def build_inputs(dtype, noise_seed=1):
    """Coordinates are fixed (so jit profiles/neighborhood widths are reused
    across calls) but the observation noise is drawn from ``noise_seed``:
    the timed run gets FRESH value buffers, defeating the axon runtime's
    identical-input result cache."""
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    c1, s1 = _synthetic_month(rng, N_PER_PROC)
    c2, s2 = _synthetic_month(rng, N_PER_PROC)
    nrng = np.random.default_rng(noise_seed)
    v1 = s1 + nrng.normal(scale=0.4, size=N_PER_PROC)
    v2 = -0.6 * s2 + nrng.normal(scale=0.4, size=N_PER_PROC)
    v1 = (v1 - v1.mean()) / v1.std()
    v2 = (v2 - v2.mean()) / v2.std()
    return (
        jnp.asarray(c1, dtype),
        jnp.asarray(v1, dtype),
        jnp.asarray(c2, dtype),
        jnp.asarray(v2, dtype),
    )


def run_pipeline(c1, v1, c2, v2, pred_coords, main_coords, dtype):
    """One full fit+predict; returns (params, pred, err)."""
    import jax.numpy as jnp

    from cokriging_tpu.cov import MultivariateMatern
    from cokriging_tpu.estimate.empirical import (
        VarioConfig,
        empirical_variograms_device,
        EmpiricalVariogram,
    )
    from cokriging_tpu.estimate.wls import fit_wls
    from cokriging_tpu.fields.field import Field, MultiField
    from cokriging_tpu.predict import LocalPredictor

    # --- 1. empirical variograms over the 25k paired obs: all three
    #        (i, j) pairs x both blocked passes as ONE device program ---
    cfg = VarioConfig(max_dist=3_000.0, n_bins=15, geodesic=True)
    _log("variograms (fused all-pairs program)")
    pairs, centers, means, counts = empirical_variograms_device(
        [c1, c2], [v1, v2], cfg
    )
    est = EmpiricalVariogram(
        df=None,
        config=cfg,
        timestamp=None,
        timedeltas=None,
        pairs=pairs,
        bin_centers=centers.astype(dtype),
        bin_means=means.astype(dtype),
        bin_counts=counts.astype(dtype),
    )

    # --- 2. composite WLS fit (fully on-device: one dispatch, not one
    #        round-trip through the TPU relay per objective eval), started
    #        from the method-of-moments initializer (same as the CLI) ---
    _log("WLS fit")
    from cokriging_tpu.estimate.wls import moment_init

    params, result = fit_wls(
        est, init=moment_init(est), method="adam", maxiter=600,
        theoretical=False,
    )

    # --- 3. local cokriging on the 0.5-degree land grid, data on the
    #        main 4x5 grid (reference workflow: coords_main for prediction,
    #        src/point_prediction.py:98-113) ---
    sub = max(1, N_PER_PROC // 200)  # ~200 obs/field on the "main" grid
    f1 = Field.from_arrays(np.asarray(c1)[::sub], np.asarray(v1)[::sub], "Z0")
    f1.geodesic = True
    f2 = Field.from_arrays(np.asarray(c2)[::sub], np.asarray(v2)[::sub], "Z1")
    f2.geodesic = True
    mf = MultiField(fields=[f1, f2])
    # f32 prediction path: the TPU emulates f64 with ~50x-slower software
    # arithmetic; local kriging at 96-point neighborhoods is comfortably
    # f32-conditioned (accuracy parity is validated at f64 on CPU in tests)
    mod = MultivariateMatern(params=params.astype(dtype))
    _log("local predictor setup")
    lp = LocalPredictor(mod, mf)
    _log("local predict")
    out = lp(0, pred_coords, max_dist=1_000.0, postprocess=False)
    _log("pipeline done")
    return params, out


def nll_evals_per_sec(c1, v1, c2, v2, dtype, reps=3):
    """Warm exact-NLL value+gradient throughput at the bench's n ~ 25k —
    the second axis of the driver metric string (BASELINE.md). Fresh
    parameter values per rep defeat the axon result cache."""
    import jax
    import jax.numpy as jnp

    from cokriging_tpu.cov.params import MaternParams
    from cokriging_tpu.estimate.nll import (
        _nll_value_and_grad,
        joint_distance_blocks,
    )

    _log("NLL evals/sec: distance blocks")
    dists = joint_distance_blocks([c1, c2], geodesic=True)
    z = jnp.concatenate([v1, v2])
    params = MaternParams.default(2)
    spec = params.spec
    x0 = np.asarray(params.to_flat(), dtype)
    x0[5:8] = 700.0  # len_scales well inside the data span
    mvar = jnp.zeros_like(z)

    _log("NLL evals/sec: compile + warmup")
    v, g = _nll_value_and_grad(jnp.asarray(x0), dists, z, spec, mvar, 1e-6)
    jax.block_until_ready((v, g))
    ts = []
    _log("NLL evals/sec: timed evals")
    for i in range(reps):
        x = jnp.asarray(x0 * (1.0 + 0.01 * (i + 1)))
        t0 = time.perf_counter()
        v, g = _nll_value_and_grad(x, dists, z, spec, mvar, 1e-6)
        jax.block_until_ready((v, g))
        ts.append(time.perf_counter() - t0)
    return 1.0 / min(ts)


def main():
    import jax

    from cokriging_tpu.data.grids import prediction_coords, main_coords_array

    _start_watchdog()
    _log("device probe")
    # Tiny compile-free op: if the tunnel is wedged this hangs, and the
    # watchdog's short probe budget re-execs quickly instead of burning a
    # full compile-stage stall window before the first retry.
    import jax.numpy as jnp

    jnp.zeros((2,)).block_until_ready()
    _log("device probe ok; start", stall=_STALL_SECONDS)

    dtype = np.float32 if jax.default_backend() == "tpu" else np.float64
    c1, v1, c2, v2 = build_inputs(dtype, noise_seed=1)
    pred_coords = prediction_coords().values.astype(dtype)
    main_coords = main_coords_array().astype(dtype)

    # warmup: compile everything once
    run_pipeline(c1, v1, c2, v2, pred_coords, main_coords, dtype)

    # timed run on fresh value buffers (same coords -> same jit profiles)
    _, v1b, _, v2b = build_inputs(dtype, noise_seed=2)
    t0 = time.perf_counter()
    params, out = run_pipeline(c1, v1b, c2, v2b, pred_coords, main_coords, dtype)
    elapsed = time.perf_counter() - t0

    # second axis of the driver metric: exact-NLL value+grad throughput
    # at the same n ~ 25k (one warm jitted eval; VERDICT r2 item 4)
    evals_ps = nll_evals_per_sec(c1, v1b, c2, v2b, dtype)

    print(
        json.dumps(
            {
                "metric": "0.5-deg CONUS monthly cokriging fit+predict wall-clock (n~25k)",
                "value": round(elapsed, 3),
                "unit": "s",
                "vs_baseline": round(TARGET_SECONDS / elapsed, 3),
                "nll_evals_per_sec": round(evals_ps, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
