from cokriging_tpu.plot.figures import (  # noqa: F401
    plot_da,
    plot_df,
    plot_fields,
    plot_variograms,
    plot_samples,
    plot_sim_pred,
    plot_err_ratio,
    plot_cv_resid,
    raw_climatology,
    resid_climatology,
    qq_plots,
    animate_monthly,
)
