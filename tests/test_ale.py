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


def _oracle_ale2d(x, y, z_cols, second_diff_fn, grid_size):
    """Numpy port of the reference 2-D estimator (ale.py:258)."""
    def edges(v):
        return np.unique(np.quantile(v, np.linspace(0, 1, grid_size + 1)))
    xe, ye = edges(x), edges(y)
    nx, ny = xe.size - 1, ye.size - 1
    xi = np.clip(np.searchsorted(xe, x, side="left"), 1, nx)
    yi = np.clip(np.searchsorted(ye, y, side="left"), 1, ny)
    delta = np.zeros((ny, nx))
    for a in range(1, nx + 1):
        for b in range(1, ny + 1):
            m = (xi == a) & (yi == b)
            if m.any():
                delta[b - 1, a - 1] = second_diff_fn(
                    m, xe[a - 1], xe[a], ye[b - 1], ye[b])
    acc = np.cumsum(np.cumsum(delta, axis=0), axis=1)
    acc = np.pad(acc, ((1, 0), (1, 0)))
    ale2 = acc - acc.mean(axis=1, keepdims=True) - acc.mean(axis=0, keepdims=True) + acc.mean()
    return xe, ye, ale2


def test_ale2d_additive_model_is_flat(spark, xz):
    df, _ = xz

    def predict(f):  # no interaction: second differences all cancel
        return f["x"] * f["x"] + 3.0 * f["z"]

    got = ale.accumulated_local_effects_2d(df, predict, "x", "z",
                                           ["x", "z"], grid_size=5).toPandas()
    assert np.abs(got["ale"].to_numpy()).max() < 1e-9


def test_ale2d_interaction_matches_oracle(spark, xz):
    df, pdf = xz

    def predict(f):
        return 0.5 * f["x"] * f["z"] + f["x"] - 2.0 * f["z"]

    got = (ale.accumulated_local_effects_2d(df, predict, "x", "z",
                                            ["x", "z"], grid_size=4)
           .toPandas().sort_values(["y_idx", "x_idx"]))
    x, z = pdf["x"].to_numpy(), pdf["z"].to_numpy()

    def sd(m, xlo, xhi, ylo, yhi):  # second difference of 0.5*x*z
        return 0.5 * (xhi - xlo) * (yhi - ylo)

    xe, ye, want = _oracle_ale2d(x, z, None, sd, 4)
    got_mat = got.pivot_table(index="y_idx", columns="x_idx",
                              values="ale").to_numpy()
    np.testing.assert_allclose(got_mat, want, rtol=1e-9, atol=1e-12)
    # edge labels line up
    np.testing.assert_allclose(
        np.sort(got["x_edge"].unique()), xe, rtol=1e-12)
    # counts: core cells have them, the zero row/column is null
    assert got.loc[(got["x_idx"] == 0) | (got["y_idx"] == 0), "cell_count"].isna().all()
    assert got.loc[(got["x_idx"] > 0) & (got["y_idx"] > 0), "cell_count"].notna().all()
