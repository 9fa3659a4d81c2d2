"""Parametric bootstrap for the WLS variogram estimator — batched on device.

The reference reports WLS point estimates with no uncertainty
(src/model.py:285-317), and its per-fit cost (scipy L-BFGS-B with
finite-difference gradients over pandas groupbys) makes a bootstrap
unthinkable there. Here the whole resampling loop is three batched device
programs:

1. **simulate** — one Cholesky of the joint covariance at the data
   coordinates, then all B replicate fields as a single (n, B) matmul;
2. **re-estimate** — a values-batched variant of the fused variogram
   stream: distances, masks, and bin assignment are computed once per
   block tile (they do not depend on the replicate), and the per-bin cloud
   reduction becomes ONE (B, block^2) x (block^2, n_bins) MXU matmul per
   tile — for B = 1 a one-hot matmul loses to the unrolled masked reduce
   (see empirical.py header), but amortized over a batch it is the right
   contraction;
3. **refit** — ``fit_wls_batch_arrays``: B on-device L-BFGS fits, vmapped
   and optionally sharded over a device mesh.

The replicate bins are NOT re-derived per replicate: the reference's bin
construction (src/fields.py:389-403) depends on the data only through
pairwise distances, which the bootstrap holds fixed, so every replicate
shares the observed bins by construction.
"""

import dataclasses
from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from cokriging_tpu.cov.matern import block_covariance
from cokriging_tpu.cov.params import MaternParams
from cokriging_tpu.estimate.empirical import (
    VarioConfig,
    _h_block,
    _h_of_d,
    _point_features,
    empirical_variograms_device,
)
from cokriging_tpu.estimate.nll import joint_distance_blocks
from cokriging_tpu.estimate.wls import fit_wls_batch_arrays

#: smaller than empirical._BLOCK: the batched cloud tile is (B, block^2)
_BBLOCK = 128


def simulate_replicates(
    params: MaternParams,
    coords_list,
    n_rep: int,
    seed: int = 0,
    geodesic: bool = True,
    jitter: float = 1e-10,
) -> List[np.ndarray]:
    """Draw ``n_rep`` joint Gaussian replicates at fixed coordinates.

    One factorization serves every replicate: z = L @ N(0, I_{n x B}).
    The nugget rides the covariance diagonal (exact-zero distances,
    cov/matern.py), so replicates mimic the observed process including its
    discontinuous-at-origin component.

    Returns a per-process list of (n_rep, n_i) arrays.
    """
    dists = joint_distance_blocks([jnp.asarray(c) for c in coords_list],
                                  geodesic=geodesic)
    cov = block_covariance(params, dists)
    n = cov.shape[0]
    cov = cov + jitter * jnp.eye(n, dtype=cov.dtype)
    chol = jnp.linalg.cholesky(cov)
    if not bool(jnp.isfinite(chol[-1, -1])):
        raise ValueError(
            "simulate_replicates: the generator's joint covariance is not"
            " positive definite (spectrally invalid parameters — e.g. a WLS"
            " optimum outside the Gneiting validity region). Project it"
            " first: cov.spectral.project_to_valid(params), or fit with"
            " fit_wls(..., project_validity=True)."
        )
    eps = jax.random.normal(jax.random.PRNGKey(seed), (n, n_rep), cov.dtype)
    z = np.asarray((chol @ eps).T)  # (n_rep, n)
    out, off = [], 0
    for c in coords_list:
        ni = int(np.shape(c)[0])
        out.append(z[:, off:off + ni])
        off += ni
    return out


@partial(
    jax.jit,
    static_argnames=("pair_list", "geodesic", "covariogram", "n_bins", "block"),
)
def _batched_bin_program(
    coords, values, n_valid, h_edges, h_max, pair_list, geodesic,
    covariogram, n_bins, block,
):
    """Values-batched bin pass over fixed coordinates and fixed bin edges.

    Args:
        coords: (p, N, 2) padded coordinates (shared by all replicates).
        values: (B, p, N) padded replicate values.
        h_edges: (n_pairs, n_bins + 1) bin edges in surrogate-h space.

    Returns:
        (sums, counts): (n_pairs, B, n_bins) f-sums and (n_pairs, n_bins)
        pair counts (replicate-independent).
    """
    n_pad = coords.shape[1]
    nb = n_pad // block
    lane = jnp.arange(n_pad)
    B = values.shape[0]
    feats = [_point_features(coords[k], geodesic) for k in range(coords.shape[0])]
    bin_ids = jnp.arange(n_bins)

    def block_ids(t):
        rb, cb_ = t // nb, t % nb
        row_ids = rb * block + jnp.arange(block)[:, None]
        col_ids = cb_ * block + jnp.arange(block)[None, :]
        return rb, cb_, row_ids, col_ids

    all_sums, all_counts = [], []
    for k, (i, j) in enumerate(pair_list):
        fa, fb = feats[i], feats[j]
        # per-replicate centering by the valid-lane mean (src/fields.py:378-381)
        vi = jnp.where(lane[None, :] < n_valid[i], values[:, i, :], 0.0)
        vj = jnp.where(lane[None, :] < n_valid[j], values[:, j, :], 0.0)
        va = values[:, i, :] - jnp.sum(vi, axis=1, keepdims=True) / n_valid[i]
        vb = values[:, j, :] - jnp.sum(vj, axis=1, keepdims=True) / n_valid[j]
        marginal = i == j
        edges_k = h_edges[k]

        def body(t, carry, fa=fa, fb=fb, va=va, vb=vb, marginal=marginal,
                 edges_k=edges_k, ni=n_valid[i], nj=n_valid[j]):
            rb, cb_, row_ids, col_ids = block_ids(t)

            def compute(c):
                sums, counts = c
                ra = jax.lax.dynamic_slice_in_dim(fa, rb * block, block)
                rb_ = jax.lax.dynamic_slice_in_dim(fb, cb_ * block, block)
                h = _h_block(ra, rb_, geodesic)
                valid = (row_ids < ni) & (col_ids < nj) & (h <= h_max)
                if marginal:
                    valid = valid & (row_ids < col_ids)
                idx = jnp.clip(
                    jnp.searchsorted(edges_k, h, side="left") - 1, 0, n_bins - 1
                )
                onehot = (idx[..., None] == bin_ids) & valid[..., None]
                sel = onehot.reshape(block * block, n_bins)
                vra = jax.lax.dynamic_slice_in_dim(va, rb * block, block, axis=1)
                vrb = jax.lax.dynamic_slice_in_dim(vb, cb_ * block, block, axis=1)
                if covariogram:
                    cloud = vra[:, :, None] * vrb[:, None, :]
                else:
                    d = vra[:, :, None] - vrb[:, None, :]
                    cloud = 0.5 * d * d
                # the batched contraction: (B, block^2) @ (block^2, n_bins)
                sums = sums + cloud.reshape(B, -1) @ sel.astype(cloud.dtype)
                counts = counts + jnp.sum(sel, axis=0, dtype=jnp.int32)
                return sums, counts

            if marginal:
                return jax.lax.cond(cb_ >= rb, compute, lambda c: c, carry)
            return compute(carry)

        init = (
            jnp.zeros((B, n_bins), coords.dtype),
            jnp.zeros(n_bins, jnp.int32),
        )
        sums, counts = jax.lax.fori_loop(0, nb * nb, body, init)
        all_sums.append(sums)
        all_counts.append(counts)
    return jnp.stack(all_sums), jnp.stack(all_counts)


def batched_variograms(coords_list, values_rep, config: VarioConfig):
    """Binned (cross-)variograms for a batch of value replicates on fixed
    coordinates, sharing the observed bin structure.

    Args:
        coords_list: per-process (n_i, 2) coordinates.
        values_rep: per-process (B, n_i) replicate values.

    Returns:
        (pairs, centers (n_pairs, n_bins), means (B, n_pairs, n_bins),
        counts (n_pairs, n_bins))
    """
    p = len(coords_list)
    pairs = [(i, j) for i in range(p) for j in range(p) if i <= j]
    B = int(values_rep[0].shape[0])

    # bins + counts from the standard device pass on one replicate (the
    # bin construction only reads distances, so any replicate works)
    pairs, centers, _, counts0 = empirical_variograms_device(
        coords_list, [v[0] for v in values_rep], config, pairs=pairs
    )

    # reconstruct the edge transform of empirical._all_pairs_program
    width = centers[:, 1] - centers[:, 0]
    edges = np.concatenate(
        [centers - 0.5 * width[:, None], (centers[:, -1] + 0.5 * width)[:, None]],
        axis=1,
    )
    edges[:, 0] = 0.0

    sizes = [int(np.shape(c)[0]) for c in coords_list]
    target = -(-max(sizes) // _BBLOCK) * _BBLOCK
    dtype = np.asarray(coords_list[0]).dtype
    cs = np.zeros((p, target, 2), dtype)
    vs = np.zeros((B, p, target), dtype)
    for k in range(p):
        cs[k, : sizes[k]] = np.asarray(coords_list[k])
        vs[:, k, : sizes[k]] = np.asarray(values_rep[k])

    h_edges = np.asarray(_h_of_d(jnp.asarray(edges, dtype), config.geodesic))
    h_max = _h_of_d(jnp.asarray(config.max_dist, dtype), config.geodesic)
    sums, counts = _batched_bin_program(
        jnp.asarray(cs),
        jnp.asarray(vs),
        jnp.asarray(sizes, dtype),
        jnp.asarray(h_edges),
        h_max,
        tuple(pairs),
        config.geodesic,
        config.covariogram,
        config.n_bins,
        _BBLOCK,
    )
    counts = np.asarray(counts)
    if not np.array_equal(counts, counts0):
        raise AssertionError(
            "batched bin pass disagrees with the reference pass on pair"
            " counts — bin-edge reconstruction drifted"
        )
    sums = np.asarray(sums).transpose(1, 0, 2)  # (B, n_pairs, n_bins)
    means = np.where(counts[None] > 0, sums / np.maximum(counts[None], 1), np.nan)
    return pairs, centers, means, counts


@dataclasses.dataclass
class BootstrapResult:
    """Sampling distribution of the WLS estimator under the fitted model."""

    params: MaternParams  # the estimate the bootstrap was run around
    flats: np.ndarray  # (n_rep, n_params) refitted parameter vectors
    costs: np.ndarray  # (n_rep,) final WLS costs

    def summary(self) -> pd.DataFrame:
        """Per-parameter estimate, bootstrap SE, bias, and 95% percentile
        interval; the full bootstrap covariance rides ``attrs``."""
        df = self.params.to_dataframe().copy()
        df["std_err"] = self.flats.std(axis=0, ddof=1)
        df["bias"] = self.flats.mean(axis=0) - np.asarray(
            self.params.to_flat(), np.float64
        )
        df["q025"] = np.quantile(self.flats, 0.025, axis=0)
        df["q975"] = np.quantile(self.flats, 0.975, axis=0)
        df.attrs["covariance"] = np.cov(self.flats, rowvar=False)
        return df


def parametric_bootstrap(
    mod,
    mf,
    config: VarioConfig,
    n_rep: int = 200,
    seed: int = 0,
    maxiter: int = 300,
    init: Optional[MaternParams] = None,
    mesh=None,
    main: bool = False,
    project_validity: bool = True,
    per_replicate_init: bool = True,
) -> BootstrapResult:
    """Parametric bootstrap of the composite-WLS estimator.

    Simulates ``n_rep`` fields from the fitted model at the observed
    coordinates, re-estimates the empirical variograms (values-batched
    device pass), and refits every replicate with the vmapped on-device
    L-BFGS (optionally sharded over ``mesh``).

    Args:
        mod: fitted MultivariateMatern (the bootstrap generator).
        mf: MultiField whose coordinates define the design.
        config: the VarioConfig used for the original fit.
        main: use the main-grid coordinate subset instead of the full
            (augmented) coordinates — much cheaper at CONUS scale.
        project_validity: project the generator onto the exact spectral
            validity region first (cov.spectral.project_to_valid). A WLS
            optimum can sit outside it (the reference never checked —
            src/model.py:336-343 is a stub), and an invalid generator has
            no PD covariance to simulate from. The bootstrap then samples
            around the projected model.
        per_replicate_init: start each replicate's refit from the moment
            init of ITS OWN resampled variogram (host-computed, so
            identical across device layouts) instead of the shared
            generator values. Replicates whose WLS surface is bistable
            from the shared start can otherwise flip basins between
            sharded and unsharded layouts — eps-scale reduction
            reassociation amplified through the L-BFGS trajectory; a
            per-replicate start deep in its own basin removes that.

    Returns:
        BootstrapResult (``.summary()`` for SEs / percentile intervals).
    """
    params = mod.params if hasattr(mod, "params") else mod
    if project_validity:
        from cokriging_tpu.cov.spectral import project_to_valid

        params = project_to_valid(params)
    coords = [
        np.asarray(f.coords_main if main else f.coords) for f in mf.fields
    ]
    values_rep = simulate_replicates(
        params, coords, n_rep, seed=seed, geodesic=mf.geodesic
    )
    pairs, centers, means, counts = batched_variograms(coords, values_rep, config)

    if per_replicate_init and init is None:
        from types import SimpleNamespace

        from cokriging_tpu.estimate.wls import moment_init

        x0 = np.stack([
            np.asarray(
                moment_init(
                    SimpleNamespace(
                        pairs=list(pairs),
                        bin_centers=centers,
                        bin_means=np.asarray(means[b]),
                        bin_counts=counts,
                        config=config,
                    ),
                    spec=params.spec,
                ).to_flat(),
                np.float64,
            )
            for b in range(n_rep)
        ])
    else:
        x_init = np.asarray((init or params).to_flat(), np.float64)
        x0 = np.tile(x_init[None], (n_rep, 1))
    centers_b = np.tile(centers[None], (n_rep, 1, 1))
    counts_b = np.tile(counts[None], (n_rep, 1, 1))
    means_b = np.nan_to_num(means, nan=0.0)
    flats, costs, _ = fit_wls_batch_arrays(
        x0, centers_b, means_b, counts_b, pairs, params.spec,
        maxiter=maxiter, mesh=mesh,
    )
    return BootstrapResult(params=params, flats=flats, costs=costs)
