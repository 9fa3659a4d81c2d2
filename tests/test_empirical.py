"""Empirical variogram vs an independent pandas oracle implementing the
documented reference semantics (src/fields.py:192-232, 378-403)."""

import numpy as np
import pandas as pd
import pytest

from sklearn.metrics.pairwise import haversine_distances
from scipy.spatial.distance import cdist

from cokriging_tpu.estimate.empirical import (
    VarioConfig,
    empirical_variogram_pair,
    empirical_variograms,
)
from cokriging_tpu.fields.field import Field, MultiField
from cokriging_tpu.utils.config import EARTH_RADIUS_KM


def _oracle_pair(c_a, v_a, c_b, v_b, marginal, geodesic, max_dist, n_bins, covariogram=False):
    """Materialized-cloud implementation with pandas binning."""
    if geodesic:
        d = haversine_distances(np.radians(c_a), np.radians(c_b)) * EARTH_RADIUS_KM
    else:
        d = cdist(c_a, c_b)
    za = v_a - v_a.mean()
    zb = v_b - v_b.mean()
    if covariogram:
        cloud = np.multiply.outer(za, zb)
    else:
        cloud = 0.5 * np.subtract.outer(za, zb) ** 2
    if marginal:
        iu = np.triu_indices(d.shape[0], k=1, m=d.shape[1])
        d, cloud = d[iu], cloud[iu]
    else:
        d, cloud = d.ravel(), cloud.ravel()
    keep = d <= max_dist
    d, cloud = d[keep], cloud[keep]
    min_d = d[d > 0].min()
    centers = np.linspace(min_d, d.max(), n_bins)
    w = centers[1] - centers[0]
    edges = np.concatenate([centers - 0.5 * w, [centers[-1] + 0.5 * w]])
    edges[0] = 0.0
    cut = pd.cut(d, edges, labels=False, include_lowest=True)
    df = pd.DataFrame({"bin": cut, "v": cloud})
    g = df.groupby("bin")["v"].agg(["mean", "count"])
    means = np.full(n_bins, np.nan)
    counts = np.zeros(n_bins)
    means[g.index.astype(int)] = g["mean"].values
    counts[g.index.astype(int)] = g["count"].values
    return centers, means, counts


@pytest.fixture
def latlon_fields(rng):
    n1, n2 = 120, 90
    c1 = np.column_stack([rng.uniform(25, 50, n1), rng.uniform(-120, -70, n1)])
    c2 = np.column_stack([rng.uniform(25, 50, n2), rng.uniform(-120, -70, n2)])
    # share some collocated points (cross pairs at distance 0)
    c2[:10] = c1[:10]
    v1 = rng.normal(size=n1)
    v2 = rng.normal(size=n2)
    return c1, v1, c2, v2


@pytest.mark.parametrize("covariogram", [False, True])
def test_marginal_matches_oracle(latlon_fields, covariogram):
    c1, v1, _, _ = latlon_fields
    cfg = VarioConfig(
        max_dist=2000.0,
        n_bins=12,
        kind="Covariogram" if covariogram else "Semivariogram",
    )
    centers, means, counts = empirical_variogram_pair(
        c1, v1, c1, v1, cfg, marginal=True
    )
    oc, om, on = _oracle_pair(c1, v1, c1, v1, True, True, 2000.0, 12, covariogram)
    np.testing.assert_allclose(centers, oc, rtol=1e-10)
    np.testing.assert_allclose(counts, on)
    np.testing.assert_allclose(means, om, rtol=1e-9, equal_nan=True)


def test_cross_matches_oracle(latlon_fields):
    c1, v1, c2, v2 = latlon_fields
    cfg = VarioConfig(max_dist=1500.0, n_bins=10)
    centers, means, counts = empirical_variogram_pair(
        c1, v1, c2, v2, cfg, marginal=False
    )
    oc, om, on = _oracle_pair(c1, v1, c2, v2, False, True, 1500.0, 10)
    np.testing.assert_allclose(centers, oc, rtol=1e-10)
    np.testing.assert_allclose(counts, on)
    np.testing.assert_allclose(means, om, rtol=1e-9, equal_nan=True)
    # collocated pairs land in the first bin
    assert counts[0] >= 10


def test_euclidean_path(rng):
    n = 80
    c = rng.uniform(0, 1, size=(n, 2))
    v = rng.normal(size=n)
    cfg = VarioConfig(max_dist=0.8, n_bins=8, geodesic=False)
    centers, means, counts = empirical_variogram_pair(c, v, c, v, cfg, marginal=True)
    oc, om, on = _oracle_pair(c, v, c, v, True, False, 0.8, 8)
    np.testing.assert_allclose(centers, oc, rtol=1e-10)
    np.testing.assert_allclose(counts, on)
    np.testing.assert_allclose(means, om, rtol=1e-9, equal_nan=True)


def test_all_pairs_device_program_matches_oracle(latlon_fields):
    """The fused one-dispatch program (empirical_variograms_device) must
    reproduce the pandas oracle bit-for-bin on every (i, j) pair, including
    the h-surrogate comparisons and on-device bin construction."""
    from cokriging_tpu.estimate.empirical import empirical_variograms_device

    c1, v1, c2, v2 = latlon_fields
    cfg = VarioConfig(max_dist=1800.0, n_bins=11)
    pairs, centers, means, counts = empirical_variograms_device(
        [c1, c2], [v1, v2], cfg
    )
    assert pairs == [(0, 0), (0, 1), (1, 1)]
    data = {0: (c1, v1), 1: (c2, v2)}
    for k, (i, j) in enumerate(pairs):
        ca, va = data[i]
        cb, vb = data[j]
        oc, om, on = _oracle_pair(ca, va, cb, vb, i == j, True, 1800.0, 11)
        np.testing.assert_allclose(centers[k], oc, rtol=1e-9)
        np.testing.assert_allclose(counts[k], on)
        np.testing.assert_allclose(means[k], om, rtol=1e-8, equal_nan=True)


def test_all_pairs_device_program_euclidean(rng):
    from cokriging_tpu.estimate.empirical import empirical_variograms_device

    n1, n2 = 75, 50
    c1 = rng.uniform(0, 1, size=(n1, 2))
    c2 = rng.uniform(0, 1, size=(n2, 2))
    v1, v2 = rng.normal(size=n1), rng.normal(size=n2)
    cfg = VarioConfig(max_dist=0.9, n_bins=7, geodesic=False)
    pairs, centers, means, counts = empirical_variograms_device(
        [c1, c2], [v1, v2], cfg
    )
    data = {0: (c1, v1), 1: (c2, v2)}
    for k, (i, j) in enumerate(pairs):
        ca, va = data[i]
        cb, vb = data[j]
        oc, om, on = _oracle_pair(ca, va, cb, vb, i == j, False, 0.9, 7)
        np.testing.assert_allclose(centers[k], oc, rtol=1e-9)
        np.testing.assert_allclose(counts[k], on)
        np.testing.assert_allclose(means[k], om, rtol=1e-8, equal_nan=True)


def test_multifield_variograms(rng):
    n = 60
    c = rng.uniform(0, 1, size=(n, 2))
    f1 = Field.from_arrays(c, rng.normal(size=n), "Z0")
    f2 = Field.from_arrays(c + rng.normal(scale=0.01, size=(n, 2)), rng.normal(size=n), "Z1")
    mf = MultiField(fields=[f1, f2])
    cfg = VarioConfig(max_dist=1.0, n_bins=6, geodesic=False)
    with np.errstate(all="ignore"):
        ev = empirical_variograms(mf, cfg)
    assert ev.pairs == [(0, 0), (0, 1), (1, 1)]
    assert ev.bin_means.shape == (3, 6)
    assert set(ev.df.index.get_level_values("i")) == {0, 1}
    # total marginal pair counts = n(n-1)/2 when max_dist covers everything
    cfg_all = VarioConfig(max_dist=10.0, n_bins=6, geodesic=False)
    ev2 = empirical_variograms(mf, cfg_all)
    assert ev2.bin_counts[0].sum() == n * (n - 1) / 2
    assert ev2.bin_counts[1].sum() == n * n


def test_device_program_raises_when_no_pairs_within_max_dist(rng):
    """The fused program must raise for an empty pair set in BOTH
    coordinate systems. The geodesic path used to clip the +-inf h
    surrogates to finite [0, pi R] and silently return decreasing bin
    centers with all-NaN means."""
    from cokriging_tpu.estimate.empirical import empirical_variograms_device

    # two points ~1570 km apart, max_dist far below that
    c = np.array([[0.0, 0.0], [10.0, 10.0]])
    v = np.array([1.0, -1.0])
    for geodesic, max_dist in ((True, 100.0), (False, 1.0)):
        cfg = VarioConfig(max_dist=max_dist, n_bins=5, geodesic=geodesic)
        with pytest.raises(ValueError, match="No pairs within max_dist"):
            empirical_variograms_device([c, c + 20.0], [v, v], cfg)
