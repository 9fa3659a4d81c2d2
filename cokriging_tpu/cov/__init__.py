from cokriging_tpu.cov.params import MaternParams, ParamSpec  # noqa: F401
from cokriging_tpu.cov.spectral import (  # noqa: F401
    matern_spectral_density,
    rho_max,
    params_rho_max,
    project_to_valid,
)
from cokriging_tpu.cov.matern import (  # noqa: F401
    matern_correlation,
    covariance,
    cross_covariance,
    semivariance,
    cross_semivariance,
    MultivariateMatern,
)
