"""Field / MultiField containers with trend removal.

Re-designs the reference's xarray-backed Field/MultiField
(reference: src/fields.py:59-252) as plain dataclasses over jnp arrays,
built from *long-format* pandas DataFrames (columns: time, lat, lon,
<name>, <name>_var, covariates...). The three-stage residual pipeline
follows src/fields.py:345-375 exactly:

1. remove a linear-in-time trend of the spatial mean series
   (fit_linear_trend, src/fields.py:283-287);
2. remove a spatial trend by OLS on standardized covariates
   (fit_ols, src/fields.py:290-315), keeping coefficients and
   standardization stats for prediction-time postprocessing;
3. standardize residuals by their nanmean/nanstd (src/fields.py:367-373).

All inverse-transform statistics ride along in ``TrendStats`` so
predictions can be mapped back to data scale
(src/point_prediction.py:251-301).
"""

from dataclasses import dataclass
from typing import List, Optional, Sequence

import jax.numpy as jnp
import numpy as np
import pandas as pd


@dataclass(frozen=True)
class TrendStats:
    """Inverse-transform statistics captured during preprocessing."""

    temporal_trend: float  # trend value at the field's timestamp
    spatial_mean: float
    scale_fact: float
    ols_intercept: float
    ols_coefs: np.ndarray  # on standardized covariates
    covariate_means: np.ndarray
    covariate_scales: np.ndarray
    covariate_names: tuple

    def predict_ols(self, covariates: np.ndarray) -> np.ndarray:
        """Evaluate the spatial-trend surface at raw covariate values."""
        z = (covariates - self.covariate_means) / self.covariate_scales
        return self.ols_intercept + z @ self.ols_coefs


def fit_linear_trend(times_index: np.ndarray, series: np.ndarray) -> np.ndarray:
    """Least-squares linear trend of a series on its integer index,
    evaluated at every index (src/stat_tools.py:31-53). NaNs excluded from
    the fit; returned trend has the series' shape (NaN where input NaN)."""
    out = np.array(series, dtype=float, copy=True)
    good = ~np.isnan(series)
    if good.sum() == 0:
        return out
    x = times_index[good].astype(float)
    y = series[good]
    if np.unique(x).size < 2:
        # single-epoch record (e.g. a one-month granule batch): the trend
        # is just the mean — polyfit's rank-deficient 1-point system would
        # abort in LAPACK instead
        out[good] = y.mean()
        return out
    slope, intercept = np.polyfit(x, y, 1)
    out[good] = intercept + slope * times_index[good]
    return out


def fit_ols(values: np.ndarray, covariates: np.ndarray):
    """OLS of values on standardized covariates (src/fields.py:290-315).

    Returns (fitted_surface, intercept, coefs, means, scales)."""
    means = covariates.mean(axis=0)
    scales = covariates.std(axis=0, ddof=1)  # pandas .std() default (ddof=1)
    z = (covariates - means) / scales
    X = np.column_stack([np.ones(len(z)), z])
    beta, *_ = np.linalg.lstsq(X, values, rcond=None)
    fitted = X @ beta
    return fitted, beta[0], beta[1:], means, scales


@dataclass
class Field:
    """One process at one timestamp: standardized residuals + coordinates.

    ``coords``/``values`` live on the full (possibly augmented) grid;
    ``coords_main``/``values_main`` on the base grid used for covariance
    assembly (reference dual-resolution design, src/fields.py:74-95).
    Coordinates are [lat, lon] rows for geodesic fields, [x, y] for
    simulated ones.
    """

    name: str
    timestamp: Optional[str]
    coords: jnp.ndarray  # (n, 2)
    values: jnp.ndarray  # (n,)
    coords_main: jnp.ndarray  # (m, 2)
    values_main: jnp.ndarray  # (m,)
    measurement_var: Optional[jnp.ndarray] = None  # (n,)
    trend: Optional[TrendStats] = None
    geodesic: bool = True
    spatial_trend: Optional[np.ndarray] = None  # fitted OLS surface at coords
    spatial_trend_main: Optional[np.ndarray] = None

    @property
    def size(self) -> int:
        return int(self.values.shape[0])

    # ------------------------------------------------------------------

    @classmethod
    def from_dataframe(
        cls,
        df: pd.DataFrame,
        data_name: str,
        covariate_names: Sequence[str],
        timestamp: str,
        main_coords: Optional[np.ndarray] = None,
    ) -> "Field":
        """Build a real-data Field from a long-format frame.

        Expects columns [time, lat, lon, <data_name>, <data_name>_var] plus
        covariates. ``main_coords`` is an (m, 2) [lat, lon] array of base
        grid centers (see data.grids.main_coords); rows whose coordinates
        are in it become the ``_main`` subset.
        """
        var_name = f"{data_name}_var"
        df = df.copy()
        ts = pd.Timestamp(timestamp)

        # 1. temporal trend of the spatial mean series
        mean_series = df.groupby("time")[data_name].mean()
        tindex = np.arange(len(mean_series))
        trend_vals = fit_linear_trend(tindex, mean_series.values)
        trend_by_time = pd.Series(trend_vals, index=mean_series.index)
        df[data_name] = df[data_name] - df["time"].map(trend_by_time)
        if ts not in trend_by_time.index:
            raise ValueError(f"No data at timestamp {timestamp} for {data_name}.")
        temporal_trend = float(trend_by_time.loc[ts])

        # 2. select the timestamp, drop missing data rows
        sel = df[df["time"] == ts].dropna(subset=[data_name]).reset_index(drop=True)
        if len(sel) == 0:
            raise ValueError(f"No data at timestamp {timestamp} for {data_name}.")

        # 3. spatial trend by OLS on standardized covariates
        covs = sel[list(covariate_names)].values.astype(float)
        fitted, icpt, coefs, means, scales = fit_ols(
            sel[data_name].values.astype(float), covs
        )
        resid = sel[data_name].values - fitted

        # 4. standardize
        spatial_mean = float(np.nanmean(resid))
        scale_fact = float(np.nanstd(resid))
        standardized = (resid - spatial_mean) / scale_fact

        coords = sel[["lat", "lon"]].values.astype(float)
        mvar = (
            sel[var_name].values.astype(float) if var_name in sel.columns else None
        )

        if main_coords is not None:
            is_main = _coord_isin(coords, np.asarray(main_coords))
        else:
            is_main = np.ones(len(coords), dtype=bool)

        trend = TrendStats(
            temporal_trend=temporal_trend,
            spatial_mean=spatial_mean,
            scale_fact=scale_fact,
            ols_intercept=float(icpt),
            ols_coefs=np.asarray(coefs),
            covariate_means=np.asarray(means),
            covariate_scales=np.asarray(scales),
            covariate_names=tuple(covariate_names),
        )
        return cls(
            name=data_name,
            timestamp=str(pd.Timestamp(timestamp).date()),
            coords=jnp.asarray(coords),
            values=jnp.asarray(standardized),
            coords_main=jnp.asarray(coords[is_main]),
            values_main=jnp.asarray(standardized[is_main]),
            measurement_var=None if mvar is None else jnp.asarray(mvar),
            trend=trend,
            geodesic=True,
            spatial_trend=np.asarray(fitted),
            spatial_trend_main=np.asarray(fitted[is_main]),
        )

    @classmethod
    def from_arrays(
        cls, coords: np.ndarray, values: np.ndarray, name: str = "Z"
    ) -> "Field":
        """Simulated-field constructor (reference ``type='sim'`` path,
        src/fields.py:90-94): raw values, Euclidean [x, y] coordinates,
        main == full. Float input dtypes are preserved (pass f32 arrays for
        the TPU fast path)."""
        c = np.asarray(coords)
        v = np.asarray(values)
        c = jnp.asarray(c if c.dtype.kind == "f" else c.astype(float))
        v = jnp.asarray(v if v.dtype.kind == "f" else v.astype(float))
        return cls(
            name=name,
            timestamp=None,
            coords=c,
            values=v,
            coords_main=c,
            values_main=v,
            geodesic=False,
        )

    def to_dataframe(self, main: bool = False) -> pd.DataFrame:
        coords = np.asarray(self.coords_main if main else self.coords)
        values = np.asarray(self.values_main if main else self.values)
        c1, c2 = ("lat", "lon") if self.geodesic else ("x", "y")
        return pd.DataFrame({c1: coords[:, 0], c2: coords[:, 1], self.name: values})

    def astype(self, dtype) -> "Field":
        """Cast the array members to ``dtype`` — the TPU f32 fast path
        (utils.config.compute_dtype is the framework-wide policy)."""
        from dataclasses import replace

        mv = self.measurement_var
        return replace(
            self,
            coords=self.coords.astype(dtype),
            values=self.values.astype(dtype),
            coords_main=self.coords_main.astype(dtype),
            values_main=self.values_main.astype(dtype),
            measurement_var=None if mv is None else mv.astype(dtype),
        )


def _coord_isin(coords: np.ndarray, main: np.ndarray) -> np.ndarray:
    """Boolean row-membership of coords in main (exact match on both cols,
    mirroring the reference's merge-on-centers, src/data_utils.py:315-328)."""
    view = {(round(a, 9), round(b, 9)) for a, b in main}
    return np.array([(round(a, 9), round(b, 9)) in view for a, b in coords])


@dataclass
class MultiField:
    """p fields with per-process month offsets (src/fields.py:124-176)."""

    fields: List[Field]
    timestamp: Optional[str] = None
    timedeltas: Optional[List[int]] = None

    @classmethod
    def from_dataframes(
        cls,
        dfs: Sequence[pd.DataFrame],
        data_names: Sequence[str],
        covariate_names: Sequence[Sequence[str]],
        timestamp: str,
        timedeltas: Sequence[int],
        main_coords: Optional[np.ndarray] = None,
    ) -> "MultiField":
        if not (len(dfs) == len(data_names) == len(covariate_names) == len(timedeltas)):
            raise ValueError("Not all input lists have the same length")
        fields = []
        for df, name, covs, delta in zip(dfs, data_names, covariate_names, timedeltas):
            ts = apply_timedelta(timestamp, delta)
            fields.append(
                Field.from_dataframe(df, name, covs, ts, main_coords=main_coords)
            )
        return cls(fields=fields, timestamp=timestamp, timedeltas=list(timedeltas))

    @property
    def n_procs(self) -> int:
        return len(self.fields)

    @property
    def n_data(self) -> int:
        return sum(f.size for f in self.fields)

    @property
    def geodesic(self) -> bool:
        return self.fields[0].geodesic

    def astype(self, dtype) -> "MultiField":
        """Cast every field's arrays to ``dtype`` (see Field.astype)."""
        return MultiField(
            fields=[f.astype(dtype) for f in self.fields],
            timestamp=self.timestamp,
            timedeltas=self.timedeltas,
        )


def apply_timedelta(timestamp: str, months: int) -> str:
    """Offset a timestamp by whole months (src/fields.py:173-176)."""
    t = pd.Timestamp(timestamp) + pd.DateOffset(months=months)
    return str(t.date())
