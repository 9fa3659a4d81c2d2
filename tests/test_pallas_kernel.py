"""Pallas fused variogram kernel vs the XLA streaming path
(interpret mode on CPU; the real-TPU path is exercised by bench.py)."""

import numpy as np
import pytest

from jax.experimental.pallas import tpu as pltpu

from cokriging_tpu.estimate import empirical as E
from cokriging_tpu.estimate.empirical import variogram_bins
from cokriging_tpu.kernels import pallas_ops as P


@pytest.mark.parametrize("marginal,covariogram", [(False, False), (True, False), (False, True)])
def test_pallas_matches_xla_path(rng, marginal, covariogram):
    n, m = 280, 260
    ca = np.column_stack([rng.uniform(25, 50, n), rng.uniform(-120, -70, n)])
    cb = (
        ca[:m]
        if marginal
        else np.column_stack([rng.uniform(25, 50, m), rng.uniform(-120, -70, m)])
    )
    if marginal:
        cb = ca
        m = n
    va = rng.normal(size=n)
    vb = va if marginal else rng.normal(size=m)
    va = va - va.mean()
    vb = vb - vb.mean()

    kind = "Covariogram" if covariogram else "Semivariogram"
    cfg = E.VarioConfig(max_dist=2000.0, n_bins=9, kind=kind)
    centers, means, counts = E.empirical_variogram_pair(
        ca, va, cb, vb, cfg, marginal=marginal
    )
    _, edges = variogram_bins(centers[0], centers[-1], 9)

    with pltpu.force_tpu_interpret_mode():
        sums, cnts = P.variogram_bin_pallas(
            ca, va, cb, vb, edges, marginal, covariogram, 2000.0, True, 9
        )
    np.testing.assert_allclose(cnts, counts)
    got = np.where(cnts > 0, sums / np.maximum(cnts, 1), np.nan)
    np.testing.assert_allclose(got, means, rtol=1e-8, equal_nan=True)
