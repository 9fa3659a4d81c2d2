from cokriging_tpu.sim.cofield import (  # noqa: F401
    BivariateRandomField,
    CartesianGrid,
    MultivariateRandomField,
)
