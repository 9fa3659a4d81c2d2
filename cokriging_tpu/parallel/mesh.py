"""Device-mesh sharding for the prediction and estimation paths.

The reference's only parallelism is a multiprocessing pool over row
partitions of the prediction grid (src/point_prediction.py:13-14, 69-81)
and dask task graphs for per-cell stats (src/stat_tools.py). The TPU-native
equivalents here are single-program jit over a `jax.sharding.Mesh`:

- ``sharded_local_predict``: the vmapped local-cokriging batch with its
  location axis sharded across chips (pure data parallelism over ICI; the
  gathered covariance/data operands are replicated). This replaces
  Pool.starmap exactly — `pd.concat` becomes the output sharding.
- ``sharded_wls_grad_step``: batched variogram-fit objective — months (or
  bands) laid out along a sharded batch axis, one value+grad per month in
  a single compiled program. This is the "fit every month of the record at
  once" path.

Both run unchanged on a CPU mesh (XLA_FLAGS=--xla_force_host_platform_
device_count=N) and a real multi-chip TPU slice.
"""

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cokriging_tpu.cov.params import MaternParams
from cokriging_tpu.estimate.wls import composite_wls_cost


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    """1-d device mesh over the first n available devices."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def shard_batch(mesh: Mesh, arr, axis_name: str = "data"):
    """Place an array with its leading axis sharded over the mesh (padding
    to a multiple of the mesh size is the caller's job)."""
    return jax.device_put(arr, NamedSharding(mesh, P(axis_name)))


def replicate(mesh: Mesh, tree):
    """Replicate a pytree across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def _pad_to(arr, multiple):
    n = arr.shape[0]
    pad = (-n) % multiple
    if pad:
        pad_width = [(0, pad)] + [(0, 0)] * (arr.ndim - 1)
        arr = np.pad(np.asarray(arr), pad_width, mode="edge")
    return arr, n


def sharded_local_predict(
    predictor,
    i: int,
    pcoords: np.ndarray,
    max_dist: float = 1e3,
    mesh: Optional[Mesh] = None,
):
    """Run LocalPredictor's batched kernel with the location axis sharded
    over the mesh. Returns (pred, pred_err) ndarrays in input order."""
    from cokriging_tpu.predict.local import _local_predict_batch

    mesh = mesh or make_mesh()
    n_dev = mesh.devices.size
    pc, n = _pad_to(np.asarray(pcoords, float), n_dev)
    pc_sharded = shard_batch(mesh, jnp.asarray(pc))
    params, coords, values, jc = replicate(
        mesh,
        (
            predictor.mod.params,
            predictor._coords,
            predictor._values,
            predictor.joint_cov,
        ),
    )
    k_each = predictor._neighborhood_widths(pc, max_dist, False, i)
    pred, err, _ = _local_predict_batch(
        params,
        coords,
        values,
        jc,
        pc_sharded,
        max_dist,
        i,
        predictor.mf.geodesic,
        predictor._sizes,
        k_each,
        False,
    )
    return np.asarray(pred)[:n], np.asarray(err)[:n]


@partial(jax.jit, static_argnames=("pairs", "spec"))
def _batched_wls_value_and_grad(flats, centers, means, counts, pairs, spec):
    """(B, n_params) params x (B, n_pairs, n_bins) estimates -> per-month
    (value, grad) — the inner objective of a fit-every-month program."""

    def one(flat, c, m, n):
        return jax.value_and_grad(composite_wls_cost)(flat, c, m, n, pairs, spec)

    return jax.vmap(one)(flats, centers, means, counts)


def sharded_wls_grad_step(
    flats: np.ndarray,
    centers: np.ndarray,
    means: np.ndarray,
    counts: np.ndarray,
    pairs,
    spec,
    lr: float = 1e-3,
    mesh: Optional[Mesh] = None,
):
    """One gradient step of every month's WLS fit, months sharded over the
    mesh. Returns (updated flats, costs)."""
    mesh = mesh or make_mesh()
    n_dev = mesh.devices.size
    fl, n = _pad_to(np.asarray(flats, float), n_dev)
    ce, _ = _pad_to(np.asarray(centers, float), n_dev)
    me, _ = _pad_to(np.asarray(means, float), n_dev)
    co, _ = _pad_to(np.asarray(counts, float), n_dev)
    args = [shard_batch(mesh, jnp.asarray(a)) for a in (fl, ce, me, co)]
    values, grads = _batched_wls_value_and_grad(*args, tuple(pairs), spec)
    lo, hi = spec.bounds()
    new = jnp.clip(args[0] - lr * grads, jnp.asarray(lo), jnp.asarray(hi))
    return np.asarray(new)[:n], np.asarray(values)[:n]
