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


def test_pallas_matern_matches_jnp(rng, monkeypatch):
    """Fused VMEM Matern kernel vs the jnp path (interpret mode, tiny
    tiles for speed; measured 4.5x faster than XLA at 5120^2 on a real
    v5e chip)."""
    import jax.numpy as jnp

    from cokriging_tpu.cov.matern import matern_correlation

    monkeypatch.setattr(P, "MM", 8)
    monkeypatch.setattr(P, "MN", 128)
    h = np.abs(rng.normal(size=(13, 200))).astype(np.float32) * 800
    h[0, 0] = 0.0
    for nu, ls in [(1.5, 500.0), (0.7, 200.0), (3.2, 800.0)]:
        ref = np.asarray(matern_correlation(nu, ls, jnp.asarray(h)))
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(P.matern_correlation_pallas(nu, ls, jnp.asarray(h)))
        np.testing.assert_allclose(got, ref, atol=5e-6)


def test_block_covariance_pallas_matches_xla(rng, monkeypatch):
    import jax.numpy as jnp

    from cokriging_tpu.cov import MaternParams
    from cokriging_tpu.cov.matern import block_covariance, block_covariance_pallas
    from cokriging_tpu.estimate.nll import joint_distance_blocks

    monkeypatch.setattr(P, "MM", 8)
    monkeypatch.setattr(P, "MN", 128)
    flat = np.array([1.2, 0.8, 1.5, 1.1, 2.0, 0.3, 0.25, 0.35, 0.04, 0.02, -0.5])
    params = MaternParams.from_flat(jnp.asarray(flat, jnp.float32))
    coords = [
        jnp.asarray(rng.uniform(0, 1, size=(30, 2)), jnp.float32),
        jnp.asarray(rng.uniform(0, 1, size=(25, 2)), jnp.float32),
    ]
    dists = joint_distance_blocks(coords, geodesic=False)
    ref = np.asarray(block_covariance(params, dists))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(block_covariance_pallas(params, dists))
    np.testing.assert_allclose(got, ref, atol=1e-5)
    # symmetric with nugget on the diagonal
    np.testing.assert_allclose(got, got.T, atol=1e-6)


def test_matern_block_grad_pallas_matches_ad(rng, monkeypatch):
    """Fused block-gradient kernel (the n~25k NLL backward) vs plain AD
    through the raw scaled-Matern block — all four scalar cotangents, in
    interpret mode with shrunken tiles so the sequential-grid accumulation
    path is exercised."""
    import jax
    import jax.numpy as jnp

    import cokriging_tpu.cov.matern as M

    monkeypatch.setattr(P, "GM", 8)
    monkeypatch.setattr(P, "GN", 128)
    n, m = 17, 140  # ragged -> padding; grid (3, 2)
    h = np.abs(rng.normal(size=(n, m))).astype(np.float32) * 600.0
    h[0, 0] = 0.0
    ct = rng.normal(size=(n, m)).astype(np.float32)
    h_j, ct_j = jnp.asarray(h), jnp.asarray(ct)

    def loss(p):
        return jnp.sum(
            ct_j * M._scaled_matern_raw(p[0], p[1], p[2], p[3], h_j)
        )

    for nuv in (1.37, 0.3, 2.6):
        p0 = jnp.asarray([1.7, 0.05, nuv, 450.0], jnp.float32)
        want = np.asarray(jax.grad(loss)(p0))
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(
                [
                    float(x)
                    for x in P.matern_block_grad_pallas(
                        p0[0], p0[1], p0[2], p0[3], h_j, ct_j
                    )
                ]
            )
        # 2e-2: the nu component of BOTH paths is an f32 central
        # difference whose noise band is ~7e-3 of the true value
        # (measured vs f64 scipy on TPU, DESIGN.md §6); the two paths
        # round differently, so their gap can reach twice that
        np.testing.assert_allclose(got, want, rtol=2e-2, atol=1e-4)


def test_matern_pallas_symmetric_matches_full(rng, monkeypatch):
    """Triangle-gated symmetric forward == full evaluation on a symmetric
    self-distance matrix (bit-identical mirror), including the
    tile-straddles-diagonal and padded-edge cases."""
    import jax.numpy as jnp

    monkeypatch.setattr(P, "MM", 8)
    monkeypatch.setattr(P, "MN", 128)
    from cokriging_tpu.kernels.distance import euclidean_matrix

    coords = jnp.asarray(rng.uniform(0, 1, size=(37, 2)), jnp.float32)
    h = euclidean_matrix(coords, coords) * 900.0

    # pin kernel DISPATCH (gated vs full paths are numerically identical
    # by design, so equality alone cannot detect a dropped symmetric flag)
    hits = {"sym": 0}
    orig_kernel = P._matern_kernel_sym

    def counting_kernel(*refs):
        hits["sym"] += 1
        return orig_kernel(*refs)

    monkeypatch.setattr(P, "_matern_kernel_sym", counting_kernel)
    with pltpu.force_tpu_interpret_mode():
        full = np.asarray(P.matern_correlation_pallas(1.4, 300.0, h))
        assert hits["sym"] == 0
        sym = np.asarray(
            P.matern_correlation_pallas(1.4, 300.0, h, symmetric=True)
        )
    assert hits["sym"] > 0
    np.testing.assert_array_equal(sym, np.tril(full) + np.tril(full, -1).T)
    np.testing.assert_allclose(sym, full, atol=1e-6)

    with pytest.raises(ValueError):
        P.matern_correlation_pallas(1.4, 300.0, h[:, :20], symmetric=True)


def test_matern_block_grad_pallas_symmetric(rng, monkeypatch):
    """Symmetric (triangle-gated, folded-cotangent) backward == full
    backward on a symmetric h with an arbitrary (asymmetric) cotangent."""
    import jax.numpy as jnp

    monkeypatch.setattr(P, "GM", 8)
    monkeypatch.setattr(P, "GN", 128)
    from cokriging_tpu.kernels.distance import euclidean_matrix

    coords = jnp.asarray(rng.uniform(0, 1, size=(41, 2)), jnp.float32)
    h = euclidean_matrix(coords, coords) * 700.0
    ct = jnp.asarray(rng.normal(size=h.shape), jnp.float32)
    args = (
        jnp.float32(1.7), jnp.float32(0.05), jnp.float32(1.37),
        jnp.float32(450.0),
    )

    # pin dispatch of the gated kernel (see the forward test for why)
    hits = {"sym": 0}
    orig_kernel = P._matern_grad_kernel_sym

    def counting_kernel(*refs):
        hits["sym"] += 1
        return orig_kernel(*refs)

    monkeypatch.setattr(P, "_matern_grad_kernel_sym", counting_kernel)
    with pltpu.force_tpu_interpret_mode():
        full = np.asarray(
            [float(x) for x in P.matern_block_grad_pallas(*args, h, ct)]
        )
        assert hits["sym"] == 0
        sym = np.asarray(
            [
                float(x)
                for x in P.matern_block_grad_pallas(
                    *args, h, ct, symmetric=True
                )
            ]
        )
    assert hits["sym"] > 0
    # identical math, different summation order -> f32 roundoff only
    np.testing.assert_allclose(sym, full, rtol=2e-5, atol=1e-6)

    with pytest.raises(ValueError):
        P.matern_block_grad_pallas(*args, h[:, :20], ct[:, :20], symmetric=True)


def test_matern_corr_pairs_pallas_matches_jnp(monkeypatch):
    """Gathered-pairs forward kernel (per-entry pair-index selects of
    per-pair SMEM constants) vs per-entry selection + the jnp correlation,
    in interpret mode with shrunken tiles (ragged size -> padding)."""
    import jax.numpy as jnp

    from cokriging_tpu.cov.matern import matern_correlation

    rng = np.random.default_rng(11)  # local: FD tolerances are seed-bound
    monkeypatch.setattr(P, "PM", 8)
    monkeypatch.setattr(P, "PN", 128)
    nu_pairs = jnp.asarray([0.7, 1.5, 3.1], jnp.float32)
    ls_pairs = jnp.asarray([250.0, 500.0, 900.0], jnp.float32)
    h = np.abs(rng.normal(size=(7, 41, 41))).astype(np.float32) * 800.0
    h[:, 0, 0] = 0.0
    idx = rng.integers(0, 3, size=h.shape).astype(np.float32)

    ref = np.zeros_like(h)
    for k in range(3):
        mk = np.asarray(
            matern_correlation(float(nu_pairs[k]), float(ls_pairs[k]),
                               jnp.asarray(h))
        )
        ref = np.where(idx == k, mk, ref)

    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(
            P.matern_corr_pairs_pallas(
                nu_pairs, ls_pairs, jnp.asarray(idx), jnp.asarray(h)
            )
        )
    np.testing.assert_allclose(got, ref, atol=5e-6)


def test_matern_corr_pairs_grad_pallas_matches_ad(monkeypatch):
    """Gathered-pairs backward kernel (in-place per-pair cotangent sums)
    vs plain AD through the per-entry-select + raw-correlation fallback."""
    import jax
    import jax.numpy as jnp

    import cokriging_tpu.cov.matern as M

    rng = np.random.default_rng(12)  # local: FD tolerances are seed-bound
    monkeypatch.setattr(P, "PGM", 8)
    monkeypatch.setattr(P, "PGN", 128)
    h = np.abs(rng.normal(size=(1800,))).astype(np.float32) * 600.0
    h[0] = 0.0
    idx = rng.integers(0, 3, size=h.shape).astype(np.float32)
    ct = rng.normal(size=h.shape).astype(np.float32)
    h_j, idx_j, ct_j = jnp.asarray(h), jnp.asarray(idx), jnp.asarray(ct)

    nu0 = jnp.asarray([0.45, 1.5, 2.8], jnp.float32)
    ls0 = jnp.asarray([250.0, 500.0, 900.0], jnp.float32)

    def loss(nu_p, ls_p):
        nu_e, ls_e = nu_p[0], ls_p[0]
        for k in range(1, 3):
            in_k = idx_j == float(k)
            nu_e = jnp.where(in_k, nu_p[k], nu_e)
            ls_e = jnp.where(in_k, ls_p[k], ls_e)
        return jnp.sum(ct_j * M._matern_corr_raw(nu_e, ls_e, h_j))

    want_nu, want_ls = jax.grad(loss, argnums=(0, 1))(nu0, ls0)
    with pltpu.force_tpu_interpret_mode():
        got_nu, got_ls = P.matern_corr_pairs_grad_pallas(
            nu0, ls0, idx_j, h_j, ct_j
        )
    # nu: both paths use an f32 central difference for dK/dnu whose noise
    # band is ~7e-3 of the true value (see the block-grad test's bound)
    np.testing.assert_allclose(
        np.asarray(got_nu), np.asarray(want_nu), rtol=2e-2, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(got_ls), np.asarray(want_ls), rtol=1e-3, atol=1e-6
    )


def test_windows_covariance_matches_gathered():
    rng = np.random.default_rng(13)
    """Batched tril-mirrored windows_covariance == per-window
    gathered_covariance (the Vecchia _chunk_nll restructure is value-
    preserving on the XLA fallback path)."""
    import jax
    import jax.numpy as jnp

    from cokriging_tpu.cov import MaternParams
    from cokriging_tpu.cov.matern import gathered_covariance, windows_covariance

    flat = np.array([1.2, 0.8, 1.5, 1.1, 2.0, 0.3, 0.25, 0.35, 0.04, 0.02, -0.5])
    params = MaternParams.from_flat(jnp.asarray(flat))
    C, w = 9, 13
    coords = rng.uniform(0, 1500, size=(C, w, 2))
    procs = jnp.asarray(rng.integers(0, 2, size=(C, w)), jnp.int32)
    mvar = jnp.asarray(rng.uniform(0, 0.05, size=(C, w)))
    from cokriging_tpu.kernels.distance import euclidean_matrix

    d = jax.vmap(lambda c: euclidean_matrix(c, c))(jnp.asarray(coords))

    got = np.asarray(windows_covariance(params, d, procs, mvar))
    for a in range(C):
        want = np.asarray(
            gathered_covariance(params, d[a], procs[a])
        ) + np.diag(np.asarray(mvar[a]))
        np.testing.assert_allclose(got[a], want, rtol=1e-12, atol=1e-14)
        np.testing.assert_allclose(got[a], got[a].T, atol=1e-12)
