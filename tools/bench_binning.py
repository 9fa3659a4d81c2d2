"""Micro-benchmark: per-bin accumulation strategies for the blocked
variogram pass (VERDICT round-1 item 8).

Three candidates for the inner accumulation in _pass_bin
(estimate/empirical.py), all fused into the same blocked
distance+cloud stream:

  unrolled  — static n_bins x (masked reduce) on the VPU (current)
  onehot    — (2, block*n) @ (block*n, n_bins) one-hot matmul (MXU)
  segsum    — jax.ops.segment_sum scatter-add

Run on the target backend; prints ms/pass at n~25k, n_bins=15.
"""

import os
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from cokriging_tpu.kernels.distance import haversine_matrix

N = int(os.environ.get("BENCH_N", 25600))
NBINS = 15
BLOCK = 512


def _stream(ca, va, cb, vb, edges, accumulate):
    nb = cb.shape[0]
    n_blocks = ca.shape[0] // BLOCK
    col_ids = jnp.arange(nb)[None, :]

    def body(k, carry):
        rows = jax.lax.dynamic_slice_in_dim(ca, k * BLOCK, BLOCK)
        vals = jax.lax.dynamic_slice_in_dim(va, k * BLOCK, BLOCK)
        d = haversine_matrix(rows, cb)
        diff = vals[:, None] - vb[None, :]
        cloud = 0.5 * diff * diff
        row_ids = k * BLOCK + jnp.arange(BLOCK)[:, None]
        valid = (row_ids < col_ids) & (d <= 1000.0)
        idx = jnp.clip(jnp.searchsorted(edges, d, side="left") - 1, 0, NBINS - 1)
        return accumulate(carry, cloud, valid, idx, d.dtype)

    init = (jnp.zeros(NBINS, ca.dtype), jnp.zeros(NBINS, ca.dtype))
    return jax.lax.fori_loop(0, n_blocks, body, init)


def acc_unrolled(carry, cloud, valid, idx, dt):
    sums, counts = carry
    bs, bc = [], []
    for b in range(NBINS):
        sel = valid & (idx == b)
        bs.append(jnp.sum(jnp.where(sel, cloud, 0.0)))
        bc.append(jnp.sum(sel.astype(dt)))
    return sums + jnp.stack(bs), counts + jnp.stack(bc)


def acc_onehot(carry, cloud, valid, idx, dt):
    sums, counts = carry
    v = valid.astype(dt).ravel()
    stacked = jnp.stack([cloud.ravel() * v, v])  # (2, block*n)
    onehot = (idx.ravel()[:, None] == jnp.arange(NBINS)[None, :]).astype(dt)
    out = stacked @ onehot  # (2, n_bins) on the MXU
    return sums + out[0], counts + out[1]


def acc_segsum(carry, cloud, valid, idx, dt):
    sums, counts = carry
    v = valid.astype(dt).ravel()
    flat_idx = idx.ravel()
    s = jax.ops.segment_sum(cloud.ravel() * v, flat_idx, num_segments=NBINS)
    c = jax.ops.segment_sum(v, flat_idx, num_segments=NBINS)
    return sums + s, counts + c


def main():
    rng = np.random.default_rng(0)
    lat = rng.uniform(25, 50, N)
    lon = rng.uniform(-125, -65, N)
    ca = jnp.asarray(np.stack([lat, lon], 1), jnp.float32)
    va = jnp.asarray(rng.normal(size=N), jnp.float32)
    edges = jnp.asarray(np.linspace(0, 1000, NBINS + 1), jnp.float32)

    for name, acc in [
        ("unrolled", acc_unrolled),
        ("onehot", acc_onehot),
        ("segsum", acc_segsum),
    ]:
        fn = jax.jit(partial(_stream, accumulate=acc))
        out = fn(ca, va, ca, va, edges)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        reps = 5
        for _ in range(reps):
            out = fn(ca, va, ca, va, edges)
        jax.block_until_ready(out)
        ms = (time.perf_counter() - t0) / reps * 1e3
        print(f"{name:9s} {ms:8.1f} ms/pass  sums[3]={float(out[0][3]):.3f} "
              f"counts[3]={float(out[1][3]):.0f}", flush=True)


if __name__ == "__main__":
    main()
