"""Spectral analysis of the Matern family (parity with
research/matern_spectrum.ipynb cells 7-14).

The reference notebook cross-checks the Rasmussen-Williams Matern
parameterization the model uses (src/model.py:174-178) against the
"classic" form and compares three published spectral-density formulas
(Cressie-Wikle, Gneiting et al., R&W). This script reproduces those
checks with cokriging_tpu.cov.spectral and extends them with the two
things the spectral machinery is *for* here:

1. covariance-function parity: the classic Matern at scale ell/sqrt(2 nu)
   equals the R&W Matern at length scale ell (notebook cells 8-9, 11-12);
2. spectral self-consistency: numerically inverting the 1-d spectral
   density recovers the correlation function (notebook cell 14's
   FFT-vs-curve comparison, done as a cosine-transform quadrature);
3. the exact bivariate validity bound rho_max built on those densities
   (Gneiting et al. 2010 Thm 3) — the check the reference left as a TODO
   stub (src/model.py:172, 336-343).

Writes the two-panel covariance/spectrum figure to examples/out/.
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import warnings

import numpy as np

warnings.filterwarnings("ignore")

OUT = pathlib.Path(__file__).parent / "out"
OUT.mkdir(exist_ok=True)


def main():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from cokriging_tpu.cov.matern import matern_correlation
    from cokriging_tpu.cov.spectral import (
        classic_to_rw_len_scale,
        matern_spectral_density,
        matern_spectral_density_1d,
        rho_max,
        rw_to_classic_len_scale,
        spectral_correlation_roundtrip,
    )

    nu, ell = 1.5, 1.5  # notebook cell 5 (dim=1, sig=1)
    h = np.linspace(1e-6, 4.0, 200)

    # --- 1. parameterization cross-check (cells 8-9, 11-12) -------------
    # classic form: (2^(1-nu)/Gamma(nu)) (h/s)^nu K_nu(h/s); the R&W form
    # used by the model multiplies h by sqrt(2 nu)/ell. They coincide when
    # s = ell / sqrt(2 nu).
    import scipy.special as sps

    s_classic = rw_to_classic_len_scale(ell, nu)
    k_classic = (
        (2.0 ** (1.0 - nu) / sps.gamma(nu))
        * (h / s_classic) ** nu
        * sps.kv(nu, h / s_classic)
    )
    k_rw = np.asarray(matern_correlation(nu, ell, h, h_grad=False))
    err = np.max(np.abs(k_classic - k_rw))
    print(f"classic(s=ell/sqrt(2nu)) vs R&W(ell) correlation: max|diff| = {err:.2e}")
    # TPU emulates f64 (f32 exponent range): K_nu reaches ~1e-10 relative
    # there vs ~1e-13 on true-IEEE CPU f64 (DESIGN.md §6)
    import jax

    assert err < (1e-8 if jax.default_backend() == "tpu" else 1e-10)
    back = classic_to_rw_len_scale(s_classic, nu)
    assert abs(float(back) - ell) < 1e-12

    # --- 2. three spectral-density forms agree (cells 11-12) ------------
    # The notebook plots Cressie-Wikle, Gneiting (GKS), and R&W densities;
    # written over a common frequency convention they are one formula. Our
    # density is the R&W form in cycles; CW/GKS use the classic scale and
    # angular/cycle frequencies — converted, all three match.
    w = np.linspace(0.0, 2.0, 100)
    d = 1
    s_rw = np.asarray(matern_spectral_density_1d(w, nu, ell))

    def density_cw(w, d, nu, s):
        # Cressie & Wikle form (notebook cell 11), classic scale s,
        # angular frequency omega = 2 pi w, density per d(omega):
        # phi(omega) = s^d/pi^{d/2} * G(nu+d/2)/G(nu) * (1+s^2 omega^2)^-(nu+d/2)
        om = 2.0 * np.pi * w
        dens = (
            (s**d / np.pi ** (d / 2))
            * (sps.gamma(nu + d / 2) / sps.gamma(nu))
            * (1.0 + s**2 * om**2) ** (-(nu + d / 2))
        )
        # per-cycle density = 2 pi * per-angular density (d=1); the CW form
        # is also normalized to integrate to 1 over R^d with an extra
        # pi^{d/2}/G(d/2) surface factor folded differently — for d=1 the
        # conversion is exactly 2 pi.
        return 2.0 * np.pi * dens

    s_cw = density_cw(w, d, nu, float(s_classic))
    err_sd = np.max(np.abs(s_cw - s_rw) / np.abs(s_rw))
    print(f"Cressie-Wikle vs R&W spectral density (d=1): max rel diff = {err_sd:.2e}")
    assert err_sd < (1e-7 if jax.default_backend() == "tpu" else 1e-10)

    # --- 3. spectrum -> covariance roundtrip (cell 14) ------------------
    h_chk = np.array([0.25, 0.5, 1.0, 1.5, 2.5])
    c_round = np.asarray(spectral_correlation_roundtrip(nu, ell, h_chk))
    c_direct = np.asarray(matern_correlation(nu, ell, h_chk, h_grad=False))
    err_rt = np.max(np.abs(c_round - c_direct))
    print(f"inverse-spectral-transform vs direct correlation: max|diff| = {err_rt:.2e}")
    assert err_rt < 1e-3  # quadrature-limited

    # --- 4. what the densities buy: the exact validity bound ------------
    # parsimonious case nu12 = (nu1+nu2)/2, common scale: closed form is
    # known to be attainable; below the smoothness floor the bound is 0.
    b_parsimonious = float(rho_max(1.5, 1.0, 0.5, 1.0, 1.0, 1.0))
    b_invalid = float(rho_max(1.5, 1.0, 0.5, 1.0, 0.8, 1.0))
    print(
        f"rho_max(nu=[1.5,0.5], nu12=1.0, common ell) = {b_parsimonious:.4f}; "
        f"nu12=0.8 (below smoothness floor) = {b_invalid:.4f}"
    )
    assert b_invalid == 0.0 and 0.0 < b_parsimonious <= 1.0

    # --- figure (notebook cells 9/14 layout) -----------------------------
    fig, ax = plt.subplots(1, 2, figsize=(12, 4.5))
    ax[0].plot(h, k_classic, color="royalblue", lw=3, label="classic, s=ell/sqrt(2nu)")
    ax[0].plot(h, k_rw, color="orangered", ls="--", label="R&W, ell (model form)")
    ax[0].axvline(x=ell, color="black", ls=":", lw=1)
    ax[0].set_xlabel("$h$")
    ax[0].set_ylabel("$C(h)$")
    ax[0].set_title("Matern covariance: parameterizations coincide")
    ax[0].legend()
    ax[1].plot(w[1:], s_rw[1:], color="orangered", lw=3, label="R&W density")
    ax[1].plot(w[1:], s_cw[1:], color="dodgerblue", ls="--", label="Cressie-Wikle")
    w2 = np.linspace(0.0, 2.0, 100)
    ax[1].plot(
        w2[1:],
        np.asarray(matern_spectral_density(w2, nu, ell, d=2))[1:],
        color="gray",
        lw=1,
        label="d=2 density",
    )
    ax[1].set_yscale("log")
    ax[1].set_xlabel("$w$ (cycles)")
    ax[1].set_ylabel("$S(w)$")
    ax[1].set_title(f"Matern spectral density (nu={nu})")
    ax[1].legend()
    fig.tight_layout()
    fig.savefig(OUT / "matern_spectrum.png", dpi=120)
    print(f"wrote {OUT / 'matern_spectrum.png'}")


if __name__ == "__main__":
    # Runs on the ambient backend (TPU: f32 via utils.config.compute_dtype;
    # CPU: f64). COKRIGING_FORCE_CPU=1 pins the CPU backend for a true-f64
    # run. Must be decided before first JAX device use.
    import os

    if os.environ.get("COKRIGING_FORCE_CPU") == "1":
        import jax

        jax.config.update("jax_platforms", "cpu")
    main()
