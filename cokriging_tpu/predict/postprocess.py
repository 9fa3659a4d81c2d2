"""Back-transformation of standardized predictions to data scale.

Replicates the reference postprocess chain
(src/point_prediction.py:251-301, identical in joint_prediction.py:155-205):

    pred' = pred * scale_fact + spatial_mean
            + OLS-surface(prediction-grid covariates, standardized with the
              *fitting-time* means/scales)
            + temporal_trend
    err'  = err * scale_fact

``covariates`` supplies the prediction grid's covariate values (e.g. 0.5-deg
EVI for SIF) as a frame with the coordinate columns plus the field's
covariate names; when None, the coordinates themselves are the covariates
(the reference's default, src/point_prediction.py:263-264 — e.g. XCO2's
lon/lat trend).
"""

from typing import Optional

import numpy as np
import pandas as pd


def postprocess_predictions(
    df: pd.DataFrame,
    field,
    covariates: Optional[pd.DataFrame] = None,
) -> pd.DataFrame:
    """Transform a standardized prediction frame to original data scale.

    Args:
        df: frame with coordinate columns (lat/lon or x/y) + pred, pred_err.
        field: the Field predicted (provides TrendStats).
        covariates: optional prediction-grid covariates keyed by the same
            coordinate columns; rows lacking covariates are dropped, as in
            the reference merge (src/point_prediction.py:266-277).
    """
    trend = field.trend
    if trend is None:
        return df.copy()

    out = df.copy()
    out["pred"] = out["pred"] * trend.scale_fact + trend.spatial_mean
    out["pred_err"] = out["pred_err"] * trend.scale_fact

    coord_cols = [c for c in ("lat", "lon", "x", "y") if c in out.columns]
    if covariates is not None:
        merged = out.merge(covariates, on=coord_cols, how="left")
        keep = ~merged[list(trend.covariate_names)].isna().any(axis=1)
        merged = merged[keep].reset_index(drop=True)
        cov_vals = merged[list(trend.covariate_names)].values.astype(float)
        out = merged[out.columns.tolist()].copy()
    else:
        missing = [c for c in trend.covariate_names if c not in out.columns]
        if missing:
            raise ValueError(
                f"Prediction frame lacks covariate column(s) {missing}; pass"
                " a `covariates` frame."
            )
        cov_vals = out[list(trend.covariate_names)].values.astype(float)

    out["pred"] = out["pred"] + trend.predict_ols(cov_vals)
    out["pred"] = out["pred"] + trend.temporal_trend
    return out


def loocv_frame(
    field, geodesic, pred, pred_err, postprocess: bool = True
) -> pd.DataFrame:
    """Assemble the LOOCV result frame at a field's main-grid locations,
    back-transforming BOTH data and predictions to data units when
    ``postprocess`` (the reference leaves the data column standardized
    while postprocessing predictions, src/joint_prediction.py:207-257 — a
    scale mix we deliberately do not reproduce). Shared by the dense and
    matrix-free joint LOOCV paths."""
    data_coords = np.asarray(field.coords_main)
    data_values = np.asarray(field.values_main)
    c1, c2 = ("lat", "lon") if geodesic else ("d1", "d2")
    df = pd.DataFrame(
        {
            c1: data_coords[:, 0],
            c2: data_coords[:, 1],
            "data": data_values,
            "pred": np.asarray(pred),
            "pred_err": np.asarray(pred_err),
        }
    )
    if postprocess:
        trend = field.trend
        if trend is not None:
            surf = np.asarray(field.spatial_trend_main)
            df["pred"] = (
                df["pred"] * trend.scale_fact
                + trend.spatial_mean
                + surf
                + trend.temporal_trend
            )
            df["pred_err"] = df["pred_err"] * trend.scale_fact
            df["data"] = inverse_transform_data(field)
    df["residual"] = df["data"] - df["pred"]
    return df[[c1, c2, "data", "pred", "residual", "pred_err"]]


def inverse_transform_data(field) -> np.ndarray:
    """Map a field's standardized main-grid values back to data scale —
    used so LOOCV residuals compare like with like (the reference leaves
    the data column standardized while postprocessing predictions,
    src/joint_prediction.py:207-257; we back-transform both)."""
    trend = field.trend
    vals = np.asarray(field.values_main)
    if trend is None:
        return vals
    return (
        vals * trend.scale_fact
        + trend.spatial_mean
        + np.asarray(field.spatial_trend_main)
        + trend.temporal_trend
    )
