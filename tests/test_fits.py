"""BinFitterCP analogue vs numpy polyfit / t-interval oracles."""

import numpy as np
import pandas as pd
import pytest

from diive_spark.operators import fits


def test_t_quantile_matches_tabulated():
    # standard two-sided 95% t table values
    for dof, want in [(7, 2.364624252), (8, 2.306004135), (10, 2.228138852),
                      (30, 2.042272456), (100, 1.983971519)]:
        assert abs(fits.t_ppf(0.975, dof) - want) < 1e-6, dof
    assert abs(fits.t_ppf(0.5, 9)) < 1e-9
    assert abs(fits.t_ppf(0.025, 7) + 2.364624252) < 1e-6  # symmetry


@pytest.fixture(scope="module")
def xy(spark):
    rng = np.random.default_rng(17)
    n = 4000
    x = rng.uniform(0, 20, n)
    y = 0.4 * x * x - 3.0 * x + 7.0 + rng.normal(0, 2.0, n)
    pdf = pd.DataFrame({"x": x, "y": y})
    return spark.createDataFrame(pdf), pdf


def _pandas_bins(pdf, n_bins, lo, hi):
    b = np.clip(((pdf["x"] - lo) / ((hi - lo) / n_bins)).astype(int), 0, n_bins - 1)
    g = pdf.groupby(b)
    return g["x"].mean().to_numpy(), g["y"].mean().to_numpy(), g.size().to_numpy()


def test_bin_aggregate_matches_pandas(spark, xy):
    df, pdf = xy
    got = (fits.bin_aggregate_xy(df, "x", "y", 10, "mean", x_range=(0.0, 20.0))
           .orderBy("bin").toPandas())
    ex, ey, ec = _pandas_bins(pdf, 10, 0.0, 20.0)
    np.testing.assert_allclose(got["x_agg"], ex, rtol=1e-12)
    np.testing.assert_allclose(got["y_agg"], ey, rtol=1e-12)
    np.testing.assert_array_equal(got["counts"], ec)


def test_quadratic_fit_matches_polyfit_and_bands(spark, xy):
    """Params == np.polyfit on the same binned points; covariance, CI and
    prediction band == the direct formula recomputation (the reference's
    curve_fit + _predband semantics)."""
    df, pdf = xy
    res = fits.bin_fit_cp(df, "x", "y", n_bins_x=10,
                          fit_type="quadratic_offset", n_predictions=50,
                          x_range=(0.0, 20.0))
    bx, by, _ = _pandas_bins(pdf, 10, 0.0, 20.0)
    want = np.polyfit(bx, by, 2)
    np.testing.assert_allclose(res["fit_params"], want, rtol=1e-8)
    # recovered the planted curve from binned means
    np.testing.assert_allclose(res["fit_params"], [0.4, -3.0, 7.0], atol=0.2)
    assert res["fit_r2"] > 0.99

    # oracle covariance: s^2 (X'X)^-1
    X = np.column_stack([bx ** 2, bx, np.ones_like(bx)])
    resid = by - X @ want
    s2 = resid @ resid / (len(bx) - 3)
    cov = s2 * np.linalg.inv(X.T @ X)
    np.testing.assert_allclose(res["fit_params_cov"], cov, rtol=1e-6)

    fit = res["fit_df"].orderBy("fit_x").toPandas()
    assert len(fit) == 50
    px = fit["fit_x"].to_numpy()
    G = np.column_stack([px ** 2, px, np.ones_like(px)])
    nom = G @ want
    std = np.sqrt(np.einsum("ij,jk,ik->i", G, cov, G))
    np.testing.assert_allclose(fit["nom"], nom, rtol=1e-8)
    np.testing.assert_allclose(fit["std"], std, rtol=1e-6)
    np.testing.assert_allclose(fit["nom_upper_ci95"], nom + 1.96 * std, rtol=1e-6)
    # prediction band: q * se * sqrt(1 + 1/N + (px-mean)^2/Sxx)
    q = fits.t_ppf(0.975, len(bx) - 3)
    se = np.sqrt(resid @ resid / (len(bx) - 3))
    dy = q * se * np.sqrt(1 + 1 / len(bx) + (px - bx.mean()) ** 2
                          / ((bx - bx.mean()) ** 2).sum())
    np.testing.assert_allclose(fit["upper_predband"], nom + dy, rtol=1e-6)
    np.testing.assert_allclose(fit["lower_predband"], nom - dy, rtol=1e-6)
    # band ordering invariant: pred band strictly outside the CI
    assert (fit["upper_predband"] > fit["nom_upper_ci95"]).all()


def test_linear_and_unbinned_modes(spark):
    rng = np.random.default_rng(3)
    x = rng.uniform(0, 10, 500)
    y = 2.5 * x + 1.0 + rng.normal(0, 0.01, 500)
    df = pytest.importorskip("pyspark").sql.SparkSession.getActiveSession() \
        .createDataFrame(pd.DataFrame({"x": x, "y": y}))
    res = fits.bin_fit_cp(df, "x", "y", n_bins_x=8, fit_type="linear")
    np.testing.assert_allclose(res["fit_params"], [2.5, 1.0], atol=0.01)
    # n_bins_x=0: fit the raw (unbinned) points — reference contract
    raw = fits.bin_fit_cp(df, "x", "y", n_bins_x=0, fit_type="linear")
    oracle = np.polyfit(x, y, 1)
    np.testing.assert_allclose(raw["fit_params"], oracle, rtol=1e-9)
    assert raw["bin_df"] is None and raw["n_bins_used"] == 500
