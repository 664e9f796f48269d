"""ALE curves vs an independent numpy oracle implementing the reference
estimator (quantile bins, local deltas, cumsum, data-weighted centering)."""

import numpy as np
import pandas as pd
import pytest

from diive_spark.operators import ale


def _oracle_ale(x, predict_hi_lo, grid_size):
    """Direct numpy port of the reference estimator semantics (ale.py:192):
    predict_hi_lo(rows_x_other, lo_edge, hi_edge) -> per-row delta mean."""
    probs = np.linspace(0, 1, grid_size + 1)
    edges = np.unique(np.quantile(x, probs))
    n_bins = edges.size - 1
    idx = np.clip(np.searchsorted(edges, x, side="left"), 1, n_bins)
    local = np.zeros(n_bins)
    counts = np.zeros(n_bins, dtype=int)
    for k in range(1, n_bins + 1):
        m = idx == k
        counts[k - 1] = m.sum()
        if m.any():
            local[k - 1] = predict_hi_lo(m, edges[k - 1], edges[k])
    unc = np.concatenate([[0.0], np.cumsum(local)])
    mid = (unc[:-1] + unc[1:]) / 2.0
    wm = (mid * counts).sum() / counts.sum() if counts.sum() else 0.0
    return edges, unc - wm, counts


@pytest.fixture(scope="module")
def xz(spark):
    rng = np.random.default_rng(11)
    n = 3000
    pdf = pd.DataFrame({"x": rng.uniform(0, 10, n), "z": rng.normal(5, 2, n)})
    return spark.createDataFrame(pdf), pdf


def test_ale_linear_model_matches_oracle(spark, xz):
    df, pdf = xz
    predict = ale.linear_predictor({"x": 2.0, "z": 3.0}, intercept=1.0)
    got = ale.accumulated_local_effects(df, predict, "x", ["x", "z"],
                                        grid_size=10).toPandas()
    x = pdf["x"].to_numpy()
    edges, want, counts = _oracle_ale(
        x, lambda m, lo, hi: 2.0 * (hi - lo), 10)
    np.testing.assert_allclose(got["edge"].to_numpy(), edges, rtol=1e-12)
    np.testing.assert_allclose(got["ale"].to_numpy(), want, rtol=1e-9)
    np.testing.assert_array_equal(got["bin_count"].to_numpy()[1:], counts)
    assert pd.isna(got["bin_count"].iloc[0])
    # linear model: ALE slope == the coefficient; z never leaks in
    slopes = np.diff(got["ale"]) / np.diff(got["edge"])
    np.testing.assert_allclose(slopes, 2.0, rtol=1e-9)


def test_ale_nonlinear_interaction_model_matches_oracle(spark, xz):
    df, pdf = xz

    def predict(f):
        return f["x"] * f["x"] - 0.5 * f["x"] * f["z"] + f["z"]

    got = ale.accumulated_local_effects(df, predict, "x", ["x", "z"],
                                        grid_size=8).toPandas()
    x, z = pdf["x"].to_numpy(), pdf["z"].to_numpy()

    def hi_lo(m, lo, hi):
        # mean over rows in bin of f(hi, z) - f(lo, z)
        return float(np.mean((hi ** 2 - 0.5 * hi * z[m])
                             - (lo ** 2 - 0.5 * lo * z[m])))

    edges, want, _ = _oracle_ale(x, hi_lo, 8)
    np.testing.assert_allclose(got["ale"].to_numpy(), want, rtol=1e-9)
    # data-weighted centering: mean over observations of the interpolated
    # curve is ~0 (segment-midpoint approximation)
    seg_mid = (got["ale"].to_numpy()[:-1] + got["ale"].to_numpy()[1:]) / 2
    cnt = got["bin_count"].to_numpy()[1:].astype(float)
    assert abs((seg_mid * cnt).sum() / cnt.sum()) < 1e-9


def test_ale_degenerate_feature_raises(spark):
    pdf = pd.DataFrame({"x": [1.0] * 50, "z": np.arange(50.0)})
    df = spark.createDataFrame(pdf)
    with pytest.raises(ValueError, match="distinct"):
        ale.accumulated_local_effects(
            df, ale.linear_predictor({"x": 1.0}), "x", ["x", "z"])
