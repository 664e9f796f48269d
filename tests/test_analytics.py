"""GridAggregator / frames / features vs pandas oracles."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from diive_spark.operators import features, frames, gridagg


@pytest.fixture(scope="module")
def xyz(spark):
    rng = np.random.default_rng(42)
    pdf = pd.DataFrame({
        "x": rng.uniform(0, 10, 2000),
        "y": rng.uniform(0, 100, 2000),
        "z": rng.normal(5, 2, 2000),
    })
    return spark.createDataFrame(pdf), pdf


def test_grid_aggregate_equal_width_matches_pandas(spark, xyz):
    df, pdf = xyz
    got = gridagg.grid_aggregate(
        df, "x", "y", "z", "equal_width",
        n_bins_x=5, n_bins_y=4, x_range=(0, 10), y_range=(0, 100),
        aggfunc="mean", min_n_vals_per_bin=5,
    ).toPandas().sort_values(["xbin", "ybin"]).reset_index(drop=True)

    xb = np.clip((pdf["x"] / 2.0).astype(int), 0, 4)
    yb = np.clip((pdf["y"] / 25.0).astype(int), 0, 3)
    expect = pdf.groupby([xb, yb])["z"].agg(["count", "mean"]).reset_index()
    expect.columns = ["xbin", "ybin", "n_vals", "agg_value"]
    expect = expect.sort_values(["xbin", "ybin"]).reset_index(drop=True)
    assert len(got) == len(expect)
    np.testing.assert_array_equal(got["n_vals"], expect["n_vals"])
    np.testing.assert_allclose(got["agg_value"], expect["agg_value"], rtol=1e-12)


def test_grid_aggregate_quantile_bins_balanced(spark, xyz):
    df, _ = xyz
    out = gridagg.grid_aggregate(df, "x", "y", "z", "quantile",
                                 n_bins_x=4, n_bins_y=4).toPandas()
    per_x = out.groupby("xbin")["n_vals"].sum()
    assert per_x.max() - per_x.min() <= 4  # ntile balance
    wide = gridagg.grid_aggregate(df, "x", "y", "z", "quantile",
                                  n_bins_x=4, n_bins_y=4, pivot_wide=True).toPandas()
    assert wide.shape == (4, 5)


def test_keep_records_where_shape_preserving(spark):
    pdf = pd.DataFrame({"ts": pd.date_range("2024-01-01", periods=6, freq="1h"),
                        "v": [1.0, 5.0, None, 9.0, 3.0, 7.0],
                        "other": [10.0] * 6})
    df = spark.createDataFrame(pdf)
    out = frames.keep_records_where(df, "v", 2.0, 8.0, protect_cols=["ts"]).orderBy("ts").toPandas()
    assert len(out) == 6                         # shape preserved
    assert list(out["v"].fillna(-1)) == [-1, 5.0, -1, -1, 3.0, 7.0]
    assert out["other"].isna().sum() == 3        # all columns nulled
    # inclusive modes
    left = frames.keep_records_where(df, "v", 3.0, 7.0, inclusive="left", drop=True).toPandas()
    assert set(left["v"]) == {3.0, 5.0}
    inv = frames.keep_records_where(df, "v", 2.0, 8.0, invert=True, drop=True).toPandas()
    # invert removes IN-RANGE records; a null condition can't be in-range so
    # it is kept (reference tests/test_frames.py:46-58 contract)
    assert set(inv["v"].dropna()) == {1.0, 9.0}
    assert inv["v"].isna().sum() == 1


def test_trim_and_keep_utils(spark):
    pdf = pd.DataFrame({"ts": pd.date_range("2023-12-28", periods=10, freq="1D"),
                        "v": [None, None, 1.0, 2.0, None, 3.0, None, None, None, None]})
    df = spark.createDataFrame(pdf)
    t = frames.trim_frame(df, "ts", "v").orderBy("ts").toPandas()
    assert len(t) == 4 and t["v"].iloc[0] == 1.0 and t["v"].iloc[-1] == 3.0
    ky = frames.keep_years(df, "ts", [2024]).toPandas()
    assert (pd.DatetimeIndex(ky["ts"]).year == 2024).all()
    proj = frames.keep_vars(df.withColumnRenamed("v", "TA_F"), ["TA*"], always_keep=["ts"])
    assert proj.columns == ["ts", "TA_F"]


def test_aggregated_as_hires(spark):
    pdf = pd.DataFrame({"ts": pd.date_range("2024-01-01", periods=48, freq="1h"),
                        "v": np.arange(48.0)})
    df = spark.createDataFrame(pdf)
    out = frames.aggregated_as_hires(df, "ts", "v", "day", "mean").orderBy("ts").toPandas()
    assert (out["v_mean_day"][:24] == 11.5).all() and (out["v_mean_day"][24:] == 35.5).all()


def test_feature_stages_match_pandas(spark):
    rng = np.random.default_rng(3)
    pdf = pd.DataFrame({"k": "a", "ts": pd.date_range("2024-01-01", periods=200, freq="30min"),
                        "v": rng.normal(0, 1, 200).cumsum()})
    df = spark.createDataFrame(pdf)
    out = features.add_lags(df, ["k"], "ts", "v", [1, -1])
    out = features.add_rolling_stats(out, ["k"], "ts", "v", [5])
    out = features.add_diffs(out, ["k"], "ts", "v")
    out = features.add_ema(out, ["k"], "ts", "v", [10])
    got = out.orderBy("ts").toPandas()

    s = pdf["v"]
    np.testing.assert_allclose(got["v_lag1"].to_numpy()[1:], s.shift(1).to_numpy()[1:])
    np.testing.assert_allclose(got["v_lead1"].to_numpy()[:-1], s.shift(-1).to_numpy()[:-1])
    np.testing.assert_allclose(got["v_rmean5"], s.rolling(5, center=True, min_periods=1).mean(), rtol=1e-12)
    np.testing.assert_allclose(got["v_rmedian5"], s.rolling(5, center=True, min_periods=1).median(), rtol=1e-12)
    np.testing.assert_allclose(got["v_diff1"].to_numpy()[1:], s.diff().to_numpy()[1:])
    np.testing.assert_allclose(got["v_ema10"], s.ewm(span=10, adjust=False).mean(), rtol=1e-12)


def test_rank_drivers(spark):
    rng = np.random.default_rng(5)
    n = 500
    driver = rng.normal(0, 1, n).cumsum()
    target = np.roll(driver, 2) + rng.normal(0, 0.1, n)  # best at lag +2
    noise = rng.normal(0, 1, n)
    pdf = pd.DataFrame({"ts": pd.date_range("2024-01-01", periods=n, freq="30min"),
                        "target": target, "driver": driver, "noise": noise})
    out = features.rank_drivers(spark.createDataFrame(pdf), "ts", "target",
                                ["driver", "noise"], max_lag=3).toPandas()
    best = out.sort_values("rank").iloc[0]
    assert best["feature"] == "driver" and best["best_lag"] == 2
    assert best["max_abs_corr"] > 0.99


def test_doy_cumulatives_and_quadrature(spark):
    ts = pd.date_range("2022-01-01", "2023-12-31 23:00", freq="12h")
    pdf = pd.DataFrame({"ts": ts, "v": 1.0})
    df = spark.createDataFrame(pdf)
    per_year = features.doy_cumulatives_per_year(df, "ts", "v").toPandas()
    last_2022 = per_year[per_year["year"] == 2022]["cumsum"].max()
    assert last_2022 == 730.0  # 365 days x 2 records of 1.0
    mean_cum = features.doy_mean_cumulative(df, "ts", "v").toPandas()
    row100 = mean_cum[mean_cum["doy"] == 100].iloc[0]
    assert row100["mean_cumsum"] == 200.0
    quad = features.quadrature_cumulative(
        spark.createDataFrame(pd.DataFrame({
            "k": "a", "ts": pd.date_range("2024-01-01", periods=4, freq="1h"),
            "v": [3.0, 4.0, 0.0, 12.0]})), ["k"], "ts", "v").orderBy("ts").toPandas()
    np.testing.assert_allclose(quad["cum_quadrature"], [3.0, 5.0, 5.0, 13.0])


def test_quantile_bucket_matches_pd_qcut(spark):
    # edges+CASE bucketing must reproduce pd.qcut (duplicates='drop'),
    # including tie placement (equal values always share a bin)
    rng = np.random.default_rng(7)
    pdf = pd.DataFrame({"i": np.arange(500),
                        "v": np.round(rng.uniform(0, 10, 500), 2)})
    out = (gridagg.quantile_bucket(spark.createDataFrame(pdf), "v", 7, "b")
           .toPandas().sort_values("i"))
    expect = pd.qcut(pdf["v"], 7, labels=False, duplicates="drop")
    np.testing.assert_array_equal(out["b"].to_numpy(), expect.to_numpy())


def test_quantile_grid_plan_has_no_window(spark, xyz):
    # the round-2 scale-killer: a no-partition ntile Window + rowid join.
    # The edges+CASE plan must contain neither.
    df, _ = xyz
    out = gridagg.grid_aggregate(df, "x", "y", "z", "quantile",
                                 n_bins_x=4, n_bins_y=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "_qb_rowid" not in plan
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan


def test_quantile_bucket_ignores_nulls(spark):
    # review regression: nulls must not consume ntiles
    pdf = pd.DataFrame({"v": [1.0, 2.0, 3.0, 4.0, None, None, None, None]})
    out = gridagg.quantile_bucket(spark.createDataFrame(pdf), "v", 4, "b").toPandas()
    nn = out.dropna(subset=["v"]).sort_values("v")
    assert list(nn["b"]) == [0, 1, 2, 3]
    assert out.loc[out["v"].isna(), "b"].isna().all()


def test_yearmonth_matrix_to_longform(spark):
    import pandas as pd

    from diive_spark.operators import frames

    wide = spark.createDataFrame(pd.DataFrame({
        "year": [2023, 2024], "1": [10.0, 20.0], "2": [11.0, 21.0],
    }))
    long = frames.yearmonth_matrix_to_longform(wide, "year").toPandas()
    assert len(long) == 4
    assert set(long.columns) == {"year", "month", "value"}
    got = long.set_index(["year", "month"])["value"]
    assert got.loc[(2024, "2")] == 21.0


def test_rolling_stats_advanced_and_polynomial_match_pandas(spark):
    """features.add_rolling_stats_advanced == pandas
    rolling(min_periods=1) stats — the exact computation the reference's
    FeatureEngineer._rolling_features_advanced performs — and the
    polynomial expansion."""
    import numpy as np
    import pandas as pd

    from diive_spark.operators import features

    rng = np.random.default_rng(4)
    idx = pd.date_range("2024-01-01", periods=200, freq="30min")
    v = rng.normal(10, 3, 200)
    v[[5, 50, 51]] = np.nan
    pdf = pd.DataFrame({"key": "A", "ts": idx, "TA": v})
    out = features.add_rolling_stats_advanced(
        spark.createDataFrame(pdf), ["key"], "ts", ["TA"], [5, 13],
        stats=("median", "min", "max", "std", "q25", "q75"),
    )
    out = features.add_polynomial(out, ["TA"], 3) \
        .toPandas().sort_values("ts").reset_index(drop=True)
    s = pd.Series(v)
    for w in (5, 13):
        r = s.rolling(window=w, min_periods=1)
        for name, want in (
                (f"TA_ROLLMEDIAN{w}", r.median()),
                (f"TA_ROLLMIN{w}", r.min()),
                (f"TA_ROLLMAX{w}", r.max()),
                (f"TA_ROLLSD{w}", r.std(ddof=0)),
                (f"TA_ROLLQ25{w}", r.quantile(0.25)),
                (f"TA_ROLLQ75{w}", r.quantile(0.75))):
            assert np.allclose(out[name].to_numpy(), want.to_numpy(),
                               equal_nan=True), name
    assert np.allclose(out["TA_POL2"], v ** 2, equal_nan=True)
    assert np.allclose(out["TA_POL3"], v ** 3, equal_nan=True)
