from cokriging_tpu.sim.cofield import (  # noqa: F401
    BivariateRandomField,
    CartesianGrid,
    MultivariateRandomField,
)
from cokriging_tpu.sim.spectral import SpectralRandomField  # noqa: F401
