"""Generate golden vectors by RUNNING the reference implementation.

The reference (/root/reference/src) cannot fully run in this container —
numba, xarray, geopy, regionmask are absent — but its numerical core
(Matern correlation, covariance conventions, bin construction, haversine
distances, cloud/binning semantics, the local kriging solve) only needs
numpy/scipy/pandas/sklearn. This script stubs the missing modules with
inert shims (njit -> identity decorator, xarray.Dataset -> object, ...),
imports the reference modules, evaluates fixed probe inputs through the
REAL reference code paths, and prints a python literal dict.

The output is vendored as literals into tests/test_golden_reference.py so
the test suite never depends on /root/reference. Re-run with:

    python tools/gen_golden_reference.py
"""

import collections
import collections.abc
import sys
import types

import numpy as np

REF = "/root/reference/src"


def _install_stubs():
    # python 3.12: collections.Iterable moved to collections.abc
    if not hasattr(collections, "Iterable"):
        collections.Iterable = collections.abc.Iterable

    numba = types.ModuleType("numba")
    numba.njit = lambda *a, **k: (a[0] if a and callable(a[0]) else (lambda f: f))
    numba.vectorize = lambda *a, **k: (lambda f: np.vectorize(f))
    numba.guvectorize = lambda *a, **k: (lambda f: f)
    numba.float64 = float
    sys.modules["numba"] = numba
    sys.modules["numba_scipy"] = types.ModuleType("numba_scipy")

    xarray = types.ModuleType("xarray")
    xarray.Dataset = type("Dataset", (), {})
    xarray.DataArray = type("DataArray", (), {})
    xarray.open_dataset = lambda *a, **k: None
    xarray.apply_ufunc = lambda *a, **k: None
    sys.modules["xarray"] = xarray

    geopy = types.ModuleType("geopy")
    geopy_distance = types.ModuleType("geopy.distance")
    geopy_distance.geodesic = None
    geopy.distance = geopy_distance
    sys.modules["geopy"] = geopy
    sys.modules["geopy.distance"] = geopy_distance

    regionmask = types.ModuleType("regionmask")
    defined = types.ModuleType("regionmask.defined_regions")
    defined.natural_earth = None
    regionmask.defined_regions = defined
    sys.modules["regionmask"] = regionmask
    sys.modules["regionmask.defined_regions"] = defined


def main():
    _install_stubs()
    sys.path.insert(0, REF)
    import pandas as pd
    from scipy.linalg import cho_factor, cho_solve

    import fields as ref_fields
    import model as ref_model

    out = {}

    # ---- 1. Matern correlation (model.py:354-385) ----
    h = np.array([0.0, 1e-8, 37.5, 150.0, 500.0, 1500.0, 3000.0])
    probes = []
    for nu in [0.25, 0.5, 1.0, 1.5, 2.71, 3.5]:
        for ls in [200.0, 500.0, 1500.0]:
            vals = ref_model._matern_correlation(nu, ls, h)
            probes.append((nu, ls, np.asarray(vals, dtype=float)))
    out["matern_h"] = h
    out["matern"] = probes

    # ---- 2. covariance conventions for a fixed bivariate params set ----
    flat = [1.2, 0.9, 1.6, 1.1, 0.7, 650.0, 420.0, 800.0, 0.08, 0.05, -0.55]
    mod = ref_model.MultivariateMatern(n_procs=2)
    mod.params.set_values(np.array(flat))
    hh = np.array([0.0, 25.0, 300.0, 900.0, 2500.0])
    out["conv_flat"] = np.array(flat)
    out["conv_h"] = hh
    out["cov_00"] = np.asarray(mod.covariance(0, hh), float)
    out["cov_11"] = np.asarray(mod.covariance(1, hh), float)
    out["cross_cov_01"] = np.asarray(mod.cross_covariance(0, 1, hh), float)
    out["cross_cov_10"] = np.asarray(mod.cross_covariance(1, 0, hh), float)
    out["semivar_0"] = np.asarray(mod.semivariance(0, hh), float)
    out["semivar_1"] = np.asarray(mod.semivariance(1, hh), float)
    out["cross_semivar"] = np.asarray(mod.cross_semivariance(0, 1, hh), float)

    # ---- 3. bin construction (fields.py:389-403) ----
    probe_cloud = pd.DataFrame(
        {"distance": np.concatenate([[0.0, 37.3], np.linspace(40, 1500, 50)])}
    )
    centers, edges = ref_fields._construct_variogram_bins(probe_cloud, 15)
    out["bin_centers"] = np.asarray(centers, float)
    out["bin_edges"] = np.asarray(edges, float)

    # ---- 4. haversine distance matrix (fields.py:318-342 fast path) ----
    coords = np.array(
        [
            [39.7392, -104.9903],  # Denver
            [41.8781, -87.6298],  # Chicago
            [34.0522, -118.2437],  # Los Angeles
            [29.7604, -95.3698],  # Houston
            [47.6062, -122.3321],  # Seattle
        ]
    )
    out["coords"] = coords
    out["dist"] = ref_fields.distance_matrix(coords, coords, fast_dist=True)

    # ---- 5. empirical variogram through the reference code path
    # (fields.py:192-232: _cloud_calc + distance_matrix + bins + pd.cut) --
    rng = np.random.default_rng(12345)
    n = 40
    vc = np.column_stack(
        [rng.uniform(30, 45, n), rng.uniform(-110, -90, n)]
    )
    vals = np.sin(np.deg2rad(vc[:, 0]) * 8) + 0.3 * rng.normal(size=n)
    out["vario_coords"] = vc
    out["vario_values"] = vals
    max_dist = 1200.0
    d = ref_fields.distance_matrix(vc, vc, fast_dist=True)

    class _F:  # minimal stand-in carrying .values for _cloud_calc
        def __init__(self, v):
            self.values = v

    cloud = ref_fields._cloud_calc([_F(vals), _F(vals)], covariogram=False)
    # marginal: strict upper triangle (fields.py:196-203), then the
    # reference's get_variogram driver verbatim (fields.py:208-229)
    iu = np.triu_indices(n, k=1)
    df_cloud = pd.DataFrame({"distance": d[iu], "variogram": cloud[iu]})
    df_cloud = df_cloud[df_cloud.distance <= max_dist]
    centers, edges = ref_fields._construct_variogram_bins(df_cloud, 10)
    df_cloud["bin_center"] = pd.cut(
        df_cloud["distance"], edges, labels=centers, include_lowest=True
    )
    g = df_cloud.groupby("bin_center", observed=False)["variogram"]
    out["vario_bin_centers"] = np.asarray(centers, float)
    out["vario_bin_means"] = g.mean().values.astype(float)
    out["vario_bin_counts"] = g.count().values.astype(float)

    # ---- 6. tiny local cokriging solve (point_prediction.py:153-222
    # semantics: joint covariance via model calls, nugget at d==0,
    # cho_factor/cho_solve, pred = w z, var = C0 - w c0) ----
    c0loc = np.array([38.0, -100.0])
    dk = ref_fields.distance_matrix
    d00 = dk(out["coords"], out["coords"], fast_dist=True)
    z0 = np.array([0.5, -0.2, 0.9, 0.1, -0.7])
    c1 = out["coords"][:3] + np.array([1.0, -2.0])
    d11 = dk(c1, c1, fast_dist=True)
    d01 = dk(out["coords"], c1, fast_dist=True)
    z1 = np.array([-0.3, 0.4, 0.2])
    cov00 = mod.covariance(0, d00)
    cov11 = mod.covariance(1, d11)
    cov01 = mod.cross_covariance(0, 1, d01)
    joint = np.block([[cov00, cov01], [cov01.T, cov11]])
    dp0 = dk(c0loc[None, :], out["coords"], fast_dist=True)[0]
    dp1 = dk(c0loc[None, :], c1, fast_dist=True)[0]
    cvec = np.concatenate(
        [mod.covariance(0, dp0), mod.cross_covariance(0, 1, dp1)]
    )
    zvec = np.concatenate([z0, z1])
    cf = cho_factor(joint, lower=True)
    w = cho_solve(cf, cvec)
    sigma2 = mod.covariance(0, np.array([0.0]))[0]
    out["krig_data_coords_1"] = c1
    out["krig_z"] = zvec
    out["krig_pred"] = float(w @ zvec)
    out["krig_var"] = float(sigma2 - w @ cvec)

    # ---- print as python literals ----
    np.set_printoptions(precision=17, floatmode="maxprec")

    def fmt(x):
        if isinstance(x, np.ndarray):
            return "np.array(" + repr(x.tolist()) + ")"
        return repr(x)

    print("import numpy as np")
    print("GOLDEN = {")
    for k, v in out.items():
        if k == "matern":
            print("    'matern': [")
            for nu, ls, vals in v:
                print(f"        ({nu!r}, {ls!r}, {fmt(vals)}),")
            print("    ],")
        else:
            print(f"    {k!r}: {fmt(v)},")
    print("}")


if __name__ == "__main__":
    main()
