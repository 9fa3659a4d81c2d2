from cokriging_tpu.stats.spacetime import (  # noqa: F401
    simple_linear_regression,
    detrend,
    count_valid,
    xcor_1d,
    xcor_nd,
    optim_lag_nd,
    get_stats,
    get_stats_df,
)
