"""cokriging_tpu — TPU-native bivariate geostatistics (JAX/XLA/Pallas).

A ground-up re-design of the capabilities of the reference repo
``91Mrwu/sif-xco2-cokriging`` (bivariate Matern cokriging of OCO-2
SIF/XCO2 fields) for TPU hardware:

- pure-jnp pytrees + jit/vmap/pjit in the compute core,
- Pallas kernels for the pairwise-distance / variogram hot loops,
- blocked MXU Cholesky + triangular solves for kriging systems,
- pandas/numpy only at the I/O boundary (the reference used xarray).

Layer map (mirrors SURVEY.md section 2):
    kernels/   Bessel K_nu, haversine distance, fused variogram binning
    cov/       Matern parameter system + multivariate Matern model
    estimate/  empirical (cross-)variograms, WLS fit, exact NLL
    predict/   local (point) and exact joint cokriging + LOOCV
    fields/    Field/MultiField containers + trend removal
    sim/       Gaussian cofield simulation
    data/      readers, gridding, land mask, augmentation
    stats/     space-time stats (detrend, lagged xcor, optimal lag)
    plot/      matplotlib parity figures
    parallel/  device-mesh sharding helpers
"""

from cokriging_tpu.utils import config  # noqa: F401  (enables x64)

__version__ = "0.1.0"
