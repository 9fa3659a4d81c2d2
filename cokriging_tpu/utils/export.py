"""AOT export of prediction programs for serving (jax.export / StableHLO).

The reference is driven interactively from notebooks; a production
deployment of the same science wants the *compiled program* as an
artifact — no Python model code, no retrace on the serving host, stable
across process restarts. ``jax.export`` serializes a jitted function's
StableHLO (including Mosaic/Pallas custom calls when exported on TPU)
with its input signature; this module packages the local-cokriging
forward (predict + uncertainty) that way:

- the data-site coordinates, neighborhood widths, and masking structure
  are BAKED into the artifact (weights-in-graph style);
- the fitted parameter vector, the per-process observation values, and
  the prediction-coordinate batch remain runtime inputs, so one artifact
  serves refreshed monthly fits and arbitrary (fixed-shape) request
  batches.

Artifacts are platform-bound: exporting on TPU embeds the fused Pallas
Matérn kernels; exporting on CPU embeds the portable XLA path. Shapes
are static — pad request batches to the exported ``n_locations``.
"""

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def export_program(fn, example_args, platforms: Optional[Sequence[str]] = None) -> bytes:
    """Serialize ``jit(fn)`` lowered at ``example_args``' shapes/dtypes.

    ``platforms`` defaults to the ambient backend. Returns the
    ``jax.export`` byte artifact (StableHLO + signature)."""
    from jax import export as jexport

    specs = [
        jax.ShapeDtypeStruct(np.shape(a), jnp.asarray(a).dtype)
        for a in example_args
    ]
    exp = jexport.export(jax.jit(fn), platforms=platforms)(*specs)
    return bytes(exp.serialize())


def load_program(blob: bytes):
    """Deserialize an exported artifact; returns a callable running the
    compiled program on the current backend (must be one of the
    artifact's export platforms)."""
    from jax import export as jexport

    return jexport.deserialize(blob).call


def make_local_prediction_fn(
    lp,
    i: int,
    pcoords_probe,
    max_dist: float = 1e3,
    cv: bool = False,
) -> Tuple[object, tuple]:
    """(fn, example_args) for a serving export of ``LocalPredictor``.

    ``fn(flat_params, pcoords, *values) -> (pred, pred_err, n_neighbors)``
    evaluates the reference-convention local cokriging of process ``i``
    (standardized scale — the host-side postprocess/inverse-transform is
    deliberately outside the artifact, it is cheap pandas work). The
    neighborhood widths are sized from ``pcoords_probe`` exactly as the
    live predictor sizes them (pow2-bucketed all-within-max_dist,
    predict/local.py), so any request batch over the same spatial domain
    is exact; a denser future domain needs a re-export.

    Uses the direct-assembly covariance path (no precomputed n x n joint
    covariance), so the artifact is self-contained given (params, values).
    """
    from cokriging_tpu.predict.local import _local_predict_batch

    probe = np.atleast_2d(np.asarray(pcoords_probe, np.result_type(float)))
    k_each = lp._neighborhood_widths(probe, max_dist, cv, i)
    coords = lp._coords
    sizes = lp._sizes
    n_valid = tuple(jnp.asarray(n, jnp.int32) for n in lp._n_valid)
    geodesic = lp.mf.geodesic
    spec = lp.mod.params.spec
    dt = jnp.asarray(lp._values[0]).dtype

    from cokriging_tpu.cov.params import MaternParams

    def fn(flat, pcoords, *values):
        params = MaternParams.from_flat(flat, spec=spec)
        return _local_predict_batch(
            params,
            coords,
            tuple(values),
            # dtype-carrying placeholder; the direct_cov program never
            # reads its values (same convention as LocalPredictor)
            jnp.zeros((1, 1), dt),
            pcoords,
            max_dist,
            i,
            geodesic,
            sizes,
            k_each,
            cv,
            n_valid,
            direct_cov=True,
        )

    example_args = (
        jnp.asarray(lp.mod.params.to_flat(), dt),
        jnp.asarray(probe, dt),
        *lp._values,
    )
    return fn, example_args


def export_local_prediction(
    lp,
    i: int,
    pcoords_probe,
    max_dist: float = 1e3,
    cv: bool = False,
    platforms: Optional[Sequence[str]] = None,
) -> bytes:
    """One-call serving export: LocalPredictor -> serialized artifact."""
    fn, example_args = make_local_prediction_fn(
        lp, i, pcoords_probe, max_dist=max_dist, cv=cv
    )
    return export_program(fn, example_args, platforms=platforms)
