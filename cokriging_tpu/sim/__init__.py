from cokriging_tpu.sim.cofield import CartesianGrid, BivariateRandomField  # noqa: F401
