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


# ---------------------------------------------------------------------------
# NetCDF staged artifacts
# ---------------------------------------------------------------------------
#
# The reference checkpoints every ETL stage as NetCDF via xarray
# (src/data_utils.py:363-372 to_xarray; scripts/process_lite_files.ipynb
# cell 4 writes OCO2_Lite_*.nc), and downstream stages re-read those files.
# xarray/netCDF4 are not in this container, so the interchange format is
# written directly with h5py as NetCDF4-compatible HDF5: coordinate
# variables are HDF5 dimension scales attached to each data variable —
# exactly the structure xarray's h5netcdf engine (and the netCDF4 C
# library) reads. Time is encoded CF-style as "days since 1970-01-01".

_TIME_UNITS = "days since 1970-01-01"


def save_dataset(path, df, coords=("time", "lat", "lon"), data_vars=None):
    """Write a long-format monthly frame as a gridded NetCDF artifact.

    The frame is pivoted onto the dense coordinate grid (NaN holes for
    unobserved cells), one (time, lat, lon)[...] variable per data column —
    the reference's `set_index([...]).to_xarray().to_netcdf()` stage.
    """
    import h5py
    import pandas as pd

    coords = tuple(coords)
    if data_vars is None:
        data_vars = [c for c in df.columns if c not in coords]

    axes = []
    for c in coords:
        vals = np.sort(df[c].unique())
        axes.append(vals)
    index_maps = [{v: k for k, v in enumerate(ax)} for ax in axes]
    idx = tuple(
        df[c].map(m).values for c, m in zip(coords, index_maps)
    )
    shape = tuple(len(ax) for ax in axes)

    with h5py.File(path, "w") as f:
        for c, ax in zip(coords, axes):
            if c == "time":
                t = pd.DatetimeIndex(ax)
                data = (
                    (t - pd.Timestamp("1970-01-01")) / pd.Timedelta(days=1)
                ).values.astype("f8")
                d = f.create_dataset(c, data=data)
                d.attrs["units"] = _TIME_UNITS
                d.attrs["calendar"] = "proleptic_gregorian"
            else:
                d = f.create_dataset(c, data=np.asarray(ax, dtype="f8"))
            d.make_scale(c)
        for name in data_vars:
            cube = np.full(shape, np.nan, dtype="f8")
            cube[idx] = df[name].values.astype(float)
            d = f.create_dataset(name, data=cube, compression="gzip")
            d.attrs["_FillValue"] = np.nan
            for k, c in enumerate(coords):
                d.dims[k].attach_scale(f[c])


def load_dataset(path, as_frame=True):
    """Read a gridded NetCDF/HDF5 artifact (ours, or any netCDF4 file whose
    variables carry dimension scales).

    Returns a long-format frame with the coordinate columns + one column
    per variable (``as_frame=True``), or (cubes dict, coords dict).
    """
    import h5py
    import pandas as pd

    with h5py.File(path, "r") as f:
        scales = {
            name for name in f
            if isinstance(f[name], h5py.Dataset) and f[name].is_scale
        }
        cubes, coords, dim_order = {}, {}, None
        for name in f:
            if name in scales or not isinstance(f[name], h5py.Dataset):
                continue
            d = f[name]
            dims = []
            for k in range(d.ndim):
                dims.append(
                    d.dims[k][0].name.lstrip("/")
                    if len(d.dims[k])
                    else f"dim{k}"
                )
            cubes[name] = d[()]
            dim_order = tuple(dims)
        for s in scales:
            vals = f[s][()]
            units = f[s].attrs.get("units", b"")
            units = units.decode() if isinstance(units, bytes) else str(units)
            if units.startswith("days since"):
                epoch = pd.Timestamp(units.split("since")[1].strip())
                vals = epoch + pd.to_timedelta(vals, unit="D")
            coords[s] = vals

    if not as_frame:
        return cubes, coords
    if dim_order is None:
        raise ValueError(f"No gridded variables found in {path}.")
    mesh = np.meshgrid(*[np.asarray(coords[d]) for d in dim_order], indexing="ij")
    out = {d: m.ravel() for d, m in zip(dim_order, mesh)}
    for name, cube in cubes.items():
        out[name] = cube.ravel()
    frame = pd.DataFrame(out)
    keep = ~frame[list(cubes)].isna().all(axis=1)
    return frame.loc[keep].reset_index(drop=True)
