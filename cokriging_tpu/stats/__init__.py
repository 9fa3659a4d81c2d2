from cokriging_tpu.stats.spacetime import (  # noqa: F401
    simple_linear_regression,
    detrend,
    count_valid,
    xcor_1d,
    xcor_nd,
    xcov_1d,
    xcov_nd,
    apply_cross_covariance,
    optim_lag_1d,
    optim_lag_nd,
    get_stats,
    get_stats_df,
)
from cokriging_tpu.stats.regional import (  # noqa: F401
    to_cubes,
    gridded_stats,
    map_transcom,
    hemisphere_labels,
    lat_band_labels,
    regional_monthly,
    regional_stats,
    stats_to_grid,
)
