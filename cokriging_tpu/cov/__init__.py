from cokriging_tpu.cov.params import MaternParams, ParamSpec  # noqa: F401
from cokriging_tpu.cov.matern import (  # noqa: F401
    matern_correlation,
    covariance,
    cross_covariance,
    semivariance,
    cross_semivariance,
    MultivariateMatern,
)
