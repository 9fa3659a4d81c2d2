"""Regular lat/lon gridding, land masking, and the micro-offset
augmentation trick.

Pandas-native re-design of the reference wrangling layer
(src/data_utils.py:122-372). Data moves through *long-format* DataFrames
with columns [time, lat, lon, <vars>...] — the xarray Dataset stage of the
reference is dropped (xarray is not a dependency here); everything else
keeps the reference semantics:

- grids defined by extents + resolution + offset, bin edges straddling the
  centers (src/data_utils.py:122-176; the reference's GridConfig leaves
  ``self.extents`` unset when defaulting — fixed here);
- ``regrid`` overwrites lon/lat with bin centers via cut
  (src/data_utils.py:179-198);
- ``land_grid`` rasterizes a land mask on a fine 0.25-degree grid and
  coarsens (src/data_utils.py:201-216). The reference uses regionmask's
  Natural Earth 110m polygons; this build embeds a comparable coarse North
  America polygon set (data.landmask) since the container has no
  regionmask — swap in any callable mask via ``land_mask_fn``;
- the 17-offset micro-adjust augmentation pooling 4x5-degree-support
  averages onto an effective 0.5-degree lattice
  (src/data_utils.py:261-301).
"""

import warnings
from dataclasses import dataclass
from typing import Callable, Optional, Tuple

import numpy as np
import pandas as pd

CONUS_EXTENTS = (-125, -65, 22, 58)  # (lon_min, lon_max, lat_min, lat_max)


@dataclass(frozen=True)
class GridConfig:
    """Grid spec: extents (lon_min, lon_max, lat_min, lat_max), resolution,
    and center offsets (src/data_utils.py:122-142)."""

    extents: Tuple[float, float, float, float] = (-180, 180, -90, 90)
    lon_res: float = 1.0
    lat_res: float = 1.0
    lon_offset: float = 0.0
    lat_offset: float = 0.0

    def __post_init__(self):
        if self.lon_offset != 0 and self.lat_offset != 0:
            warnings.warn("Neither offset is zero.")

    @property
    def lon_bounds(self):
        return _prep_bounds(self.extents[:2], self.lon_res, self.lon_offset)

    @property
    def lat_bounds(self):
        return _prep_bounds(self.extents[2:], self.lat_res, self.lat_offset)


def _prep_bounds(bounds, res, offset):
    """Pad bounds by half a cell and shift by the offset
    (src/data_utils.py:166-170)."""
    half = 0.5 * res * np.array([-1.0, 1.0])
    return tuple(np.asarray(bounds, float) + half + offset)


def _prep_bins(bounds, res):
    edges = np.arange(bounds[0], bounds[1] + res, res)
    centers = (edges[1:] + edges[:-1]) / 2
    return edges, centers


class SpatialGrid:
    """Bin edges and centers for a GridConfig (src/data_utils.py:145-163)."""

    def __init__(self, config: GridConfig) -> None:
        self.config = config
        self.lon_bins, self.lon_centers = _prep_bins(config.lon_bounds, config.lon_res)
        self.lat_bins, self.lat_centers = _prep_bins(config.lat_bounds, config.lat_res)

    def bounds_check(self, df: pd.DataFrame) -> None:
        if not (
            self.lon_bins.min() <= df.lon.min()
            and self.lon_bins.max() >= df.lon.max()
            and self.lat_bins.min() <= df.lat.min()
            and self.lat_bins.max() >= df.lat.max()
        ):
            warnings.warn(
                "Dataset coordinates not within grid extents; may produce"
                f" unexpected behavior: ({df.lon.min()}, {df.lon.max()},"
                f" {df.lat.min()}, {df.lat.max()})"
            )


def regrid(df: pd.DataFrame, config: Optional[GridConfig] = None) -> pd.DataFrame:
    """Overwrite lon/lat with their grid-cell centers
    (src/data_utils.py:179-198)."""
    if config is None:
        config = GridConfig()
    grid = SpatialGrid(config)
    grid.bounds_check(df)
    out = df.copy()
    out["lon"] = pd.cut(out.lon, grid.lon_bins, labels=grid.lon_centers).astype(float)
    out["lat"] = pd.cut(out.lat, grid.lat_bins, labels=grid.lat_centers).astype(float)
    return out


def land_grid(
    config: GridConfig,
    land_mask_fn: Optional[Callable[[np.ndarray, np.ndarray], np.ndarray]] = None,
) -> pd.DataFrame:
    """Land cell centers on the configured grid, indexed by (lon, lat)
    (src/data_utils.py:201-216): rasterize land on a fine 0.25-degree grid,
    coarsen to the target resolution, keep cells containing any land."""
    if land_mask_fn is None:
        from cokriging_tpu.data.landmask import land_mask_fn as default_mask

        land_mask_fn = default_mask
    fine = SpatialGrid(GridConfig(config.extents, lon_res=0.25, lat_res=0.25))
    lon_g, lat_g = np.meshgrid(fine.lon_centers, fine.lat_centers)
    is_land = land_mask_fn(lat_g.ravel(), lon_g.ravel())
    df = pd.DataFrame(
        {
            "lon": lon_g.ravel(),
            "lat": lat_g.ravel(),
            "region": np.where(is_land, 0.0, np.nan),
        }
    )
    df_mask = (
        regrid(df, config)
        .dropna(subset=["region"])
        .groupby(["lon", "lat"], as_index=False)
        .mean()
    )
    return (
        df_mask[["lat", "lon"]]
        .assign(land=1)
        .set_index(["lon", "lat"])
    )


def temporal_avg(df_grid: pd.DataFrame, freq: str = "1MS") -> pd.DataFrame:
    """Per-cell time-resampled averages at any pandas frequency — the
    monthly case is src/data_utils.py:219-227; the weekly/daily variants
    are the notebooks' inline groupby-resample chains (e.g.
    notebooks/5degree_weekly_xcov.ipynb cell 5: ``.groupby(["lon",
    "lat"]).resample("1W").mean()``)."""
    out = (
        df_grid.groupby(["lon", "lat"])
        .resample(freq, on="time")
        .mean()
    )
    # lon/lat may appear both in the group index and as mean'd columns
    # depending on pandas version; keep the index copy.
    out = out.drop(columns=[c for c in ("lon", "lat") if c in out.columns])
    return out.reset_index()


def monthly_avg(df_grid: pd.DataFrame) -> pd.DataFrame:
    """Per-cell monthly averages (src/data_utils.py:219-227)."""
    return temporal_avg(df_grid, "1MS")


def apply_land_mask(
    df: pd.DataFrame, config: GridConfig, land_mask_fn=None
) -> pd.DataFrame:
    """Keep rows whose grid cell is land (src/data_utils.py:230-237)."""
    df_land = land_grid(config, land_mask_fn)
    out = (
        df.join(df_land, on=["lon", "lat"], how="outer")
        .dropna(subset=["land"])
        .reset_index(drop=True)
        .drop(columns=["land"])
    )
    return out


def prep_gridded_df(
    df: pd.DataFrame,
    config: GridConfig,
    aggregate: bool = True,
    land_mask_fn=None,
    freq: str = "1MS",
) -> pd.DataFrame:
    """Irregular obs -> regular grid of time-averaged cells, land only
    (src/data_utils.py:240-258; ``freq`` generalizes the reference's
    monthly default to the weekly/daily notebook variants)."""
    lon_b = config.lon_bounds
    lat_b = config.lat_bounds
    inside = (
        (df.lon >= lon_b[0])
        & (df.lon <= lon_b[1])
        & (df.lat >= lat_b[0])
        & (df.lat <= lat_b[1])
    )
    df = df.loc[inside].reset_index(drop=True)
    df_grid = regrid(df, config)
    if aggregate:
        df_grid = temporal_avg(df_grid, freq)
    return apply_land_mask(df_grid, config, land_mask_fn)


# Micro-offset augmentation (src/data_utils.py:261-301): 8 lat offsets and
# 10 lon offsets of the 4x5-degree CONUS grid pool 17 shifted copies into an
# effective 0.5-degree lattice of coarse-support averages.
_LAT_OFFSETS = np.linspace(-1.5, 2, 8)
_LON_OFFSETS = np.linspace(-2, 2.5, 10)


def augment_dataset(df: pd.DataFrame, land_mask_fn=None) -> pd.DataFrame:
    """17 offset grids (zero-offset kept once) pooled into one frame
    (src/data_utils.py:261-279)."""
    lon_offsets = _LON_OFFSETS[_LON_OFFSETS != 0]
    frames = [
        prep_gridded_df(
            df,
            GridConfig(CONUS_EXTENTS, lon_res=5, lat_res=4, lat_offset=lat_off),
            land_mask_fn=land_mask_fn,
        )
        for lat_off in _LAT_OFFSETS
    ]
    frames += [
        prep_gridded_df(
            df,
            GridConfig(CONUS_EXTENTS, lon_res=5, lat_res=4, lon_offset=lon_off),
            land_mask_fn=land_mask_fn,
        )
        for lon_off in lon_offsets
    ]
    return pd.concat(frames, ignore_index=True)


def augment_dataset_pred(df: pd.DataFrame, land_mask_fn=None) -> pd.DataFrame:
    """Full 80-pair offset mesh for prediction covariates
    (src/data_utils.py:282-301)."""
    pairs = np.array(np.meshgrid(_LAT_OFFSETS, _LON_OFFSETS)).T.reshape(-1, 2)
    frames = [
        prep_gridded_df(
            df,
            GridConfig(
                CONUS_EXTENTS,
                lon_res=5,
                lat_res=4,
                lat_offset=d[0],
                lon_offset=d[1],
            ),
            land_mask_fn=land_mask_fn,
        )
        for d in pairs
    ]
    return pd.concat(frames, ignore_index=True)


def set_main_coords(
    extents: Tuple = CONUS_EXTENTS, lon_res: float = 5, lat_res: float = 4
):
    """Base (unaugmented) grid centers (src/data_utils.py:304-312)."""
    grid = SpatialGrid(GridConfig(extents, lon_res=lon_res, lat_res=lat_res))
    return grid.lon_centers, grid.lat_centers


def main_coords_array(
    extents: Tuple = CONUS_EXTENTS, lon_res: float = 5, lat_res: float = 4
) -> np.ndarray:
    """All (lat, lon) base-grid center pairs as rows — the membership set
    for Field.coords_main (src/data_utils.py:315-328)."""
    lon_c, lat_c = set_main_coords(extents, lon_res, lat_res)
    lon_g, lat_g = np.meshgrid(lon_c, lat_c)
    return np.column_stack([lat_g.ravel(), lon_g.ravel()])


def produce_climatology_conus(
    df: pd.DataFrame, freq: str, land_mask_fn=None
) -> pd.DataFrame:
    """Domain-average climatology at the given frequency
    (src/data_utils.py:331-341)."""
    config = GridConfig(CONUS_EXTENTS, lon_res=5, lat_res=4)
    out = prep_gridded_df(df, config, aggregate=False, land_mask_fn=land_mask_fn)
    out = out.dropna(subset=["lon", "lat"]).drop(columns=["lon", "lat"])
    return out.groupby(pd.Grouper(key="time", freq=freq)).mean().reset_index()


def to_frame(coords: np.ndarray, **kwargs) -> pd.DataFrame:
    """Format per-location variables as an indexed frame
    (the reference's to_xarray, src/data_utils.py:363-372; coords are
    [[lat, lon]] rows)."""
    return pd.DataFrame(
        {"lat": coords[:, 0], "lon": coords[:, 1], **kwargs}
    ).set_index(["lon", "lat"])


def prediction_coords(
    extents: Tuple = CONUS_EXTENTS,
    lon_res: float = 0.5,
    lat_res: float = 0.5,
    land_mask_fn=None,
) -> pd.DataFrame:
    """Land-only prediction coordinates [[lat, lon]]
    (src/point_prediction.py:349-355)."""
    grid = GridConfig(extents=extents, lon_res=lon_res, lat_res=lat_res)
    df = land_grid(grid, land_mask_fn)
    return df.reset_index()[["lat", "lon"]]
