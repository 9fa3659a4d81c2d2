"""Artifact checkpointing: fitted parameters and staged datasets.

The reference checkpoints by artifact only (each ETL stage writes NetCDF,
SURVEY.md section 5) and never persists fitted parameters. Here both are
first-class:

- ``save_params``/``load_params``: fitted MaternParams + spec + metadata
  as a single portable .npz;
- ``save_table``/``load_table``: staged long-format frames as parquet when
  available, else compressed pickle — the NetCDF-stage equivalent of the
  reference's `OCO2_*_monthly*.nc` chain.
"""

import json
from pathlib import Path

import numpy as np

from cokriging_tpu.cov.params import MaternParams, ParamSpec


def save_params(path, params: MaternParams, metadata: dict = None) -> None:
    spec = params.spec
    meta = {
        "n_procs": spec.n_procs,
        "sigma_bounds": spec.sigma_bounds,
        "nu_bounds": spec.nu_bounds,
        "len_scale_bounds": spec.len_scale_bounds,
        "nugget_bounds": spec.nugget_bounds,
        "rho_bounds": spec.rho_bounds,
        "metadata": metadata or {},
    }
    np.savez(
        path,
        flat=np.asarray(params.to_flat()),
        meta=json.dumps(meta),
    )


def load_params(path) -> MaternParams:
    with np.load(path, allow_pickle=False) as f:
        flat = f["flat"]
        meta = json.loads(str(f["meta"]))
    spec = ParamSpec(
        n_procs=int(meta["n_procs"]),
        sigma_bounds=tuple(meta["sigma_bounds"]),
        nu_bounds=tuple(meta["nu_bounds"]),
        len_scale_bounds=tuple(meta["len_scale_bounds"]),
        nugget_bounds=tuple(meta["nugget_bounds"]),
        rho_bounds=tuple(meta["rho_bounds"]),
    )
    import jax.numpy as jnp

    return MaternParams.from_flat(jnp.asarray(flat), spec=spec)


def save_table(path, df) -> None:
    """Stage a long-format frame to disk (parquet if available)."""
    path = Path(path)
    try:
        df.to_parquet(path)
    except Exception:
        df.to_pickle(path.with_suffix(".pkl.gz"), compression="gzip")


def load_table(path):
    import pandas as pd

    path = Path(path)
    if path.exists():
        try:
            return pd.read_parquet(path)
        except Exception:
            pass
    alt = path.with_suffix(".pkl.gz")
    if alt.exists():
        return pd.read_pickle(alt, compression="gzip")
    return pd.read_parquet(path)
