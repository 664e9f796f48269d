"""Stepwise screening chain + sstats/histogram/profile vs pandas oracles."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from diive_spark.operators import sstats, stepwise


@pytest.fixture(scope="module")
def noisy(spark):
    rng = np.random.default_rng(42)
    v = 10 + 3 * np.sin(np.linspace(0, 30, 1000)) + rng.normal(0, 0.5, 1000)
    spikes = rng.choice(1000, 12, replace=False)
    v[spikes] += rng.choice([-1, 1], 12) * rng.uniform(20, 40, 12)
    v[995] = 500.0  # beyond absolute limits
    pdf = pd.DataFrame({
        "series": "s1",
        "ts": pd.date_range("2022-07-01 00:15", periods=1000, freq="30min"),
        "value": v,
    })
    return spark.createDataFrame(pdf), pdf


def test_stepwise_chain(spark, noisy):
    df, pdf = noisy
    chain = (
        stepwise.StepwiseScreening(df, ["series"], "ts", "value")
        .flag_absolute_limits(-100.0, 100.0)
        .flag_zscore(thres=4.0, repeat=True)
        .flag_hampel(window_length=48, n_sigma=5.5)
    )
    out = chain.finalize().toPandas()
    flag_cols = [c for c in out.columns if c.startswith("FLAG_") and c.endswith("_TEST")]
    assert len(flag_cols) == 3
    # the big spike is caught by both abs-limits and z-score -> QCF 2
    big = out[out["value"] == 500.0].iloc[0]
    assert big["FLAG_QCF"] == 2 and pd.isna(big["value_CLEANED"])
    # clean values survive
    assert (out["FLAG_QCF"] == 0).sum() > 900
    assert out.loc[out["FLAG_QCF"] == 0, "value_CLEANED"].notna().all()

    resampled = (
        stepwise.StepwiseScreening(df, ["series"], "ts", "value")
        .flag_absolute_limits(-100.0, 100.0)
        .finalize(resample_tier="1h")
    ).toPandas()
    assert "value_CLEANED_mean" in resampled.columns
    assert len(resampled) > 0


def test_sstats_matches_pandas(spark, noisy):
    df, pdf = noisy
    got = sstats.sstats(df, "ts", "value").toPandas().iloc[0]
    s = pdf["value"]
    assert got["nvals"] == 1000 and got["nmissing"] == 0
    np.testing.assert_allclose(got["mean"], s.mean(), rtol=1e-12)
    np.testing.assert_allclose(got["sd"], s.std(), rtol=1e-12)
    np.testing.assert_allclose(got["median"], s.median(), rtol=1e-12)
    np.testing.assert_allclose(got["iqr"], s.quantile(0.75) - s.quantile(0.25), rtol=1e-12)
    np.testing.assert_allclose(got["autocorr_lag1"],
                               s.corr(s.shift(1)), rtol=1e-9)
    np.testing.assert_allclose(got["mean_abs_change"],
                               s.diff().abs().mean(), rtol=1e-12)
    # trend slope: closed form vs numpy polyfit on epoch seconds
    t = pdf["ts"].astype("int64").to_numpy() / 1e9
    slope = np.polyfit(t, s.to_numpy(), 1)[0]
    np.testing.assert_allclose(got["trend_slope_per_sec"], slope, rtol=1e-6)
    z = np.abs((s - s.mean()) / s.std(ddof=0))
    assert got["n_zscore3_outliers"] == int((z > 3).sum())


def test_percentiles_and_histogram(spark, noisy):
    df, pdf = noisy
    pct = sstats.percentiles101(df, "value").toPandas()
    assert len(pct) == 101
    np.testing.assert_allclose(
        pct.loc[pct["percentile"] == 50, "value"].iloc[0], pdf["value"].median(), rtol=1e-12
    )
    h = sstats.histogram(df, "value", n_bins=20).toPandas()
    assert h["counts"].sum() == 1000
    np.testing.assert_array_equal(
        h["counts"].to_numpy(),
        np.histogram(pdf["value"], bins=20)[0],
    )
    fd = sstats.histogram(df, "value", method="fd").toPandas()
    assert fd["counts"].sum() == 1000
    peaks = sstats.peak_bins(spark.createDataFrame(h), k=2).toPandas()
    assert peaks["counts"].iloc[0] == h["counts"].max()


def test_profile_dataframe(spark):
    pdf = pd.DataFrame({
        "a": [1.0, 2.0, None, 4.0],
        "b": [10.0, 20.0, 30.0, 40.0],
        "s": ["x", "y", "z", "w"],
    })
    got = sstats.profile_dataframe(spark.createDataFrame(pdf)).toPandas()
    assert set(got["column"]) == {"a", "b"}
    a = got[got["column"] == "a"].iloc[0]
    assert a["n"] == 3 and a["n_missing"] == 1
    np.testing.assert_allclose(a["mean"], 7 / 3)


def test_approximate_entropy_matches_reference_formula(spark):
    # oracle: the reference's own per-pair formula (stats.py:261-300)
    rng = np.random.default_rng(11)
    regular = np.tile([1.0, 2.0, 3.0, 4.0], 50)
    noisy_s = rng.normal(0, 1, 200)

    def ref_apen(s, m=2, r=None):
        s = np.asarray(s, dtype=float)
        N = len(s)
        r = 0.2 * s.std() if r is None else r
        def phi(mm):
            x = [s[i:i + mm] for i in range(N - mm + 1)]
            C = [np.mean([np.max(np.abs(xi - xj)) <= r for xj in x]) for xi in x]
            return np.mean(np.log(C))
        return phi(m) - phi(m + 1)

    for series in (regular, noisy_s):
        pdf = pd.DataFrame({"v": series})
        got = sstats.approximate_entropy(spark.createDataFrame(pdf), "v").toPandas().iloc[0]
        np.testing.assert_allclose(got["apen"], ref_apen(series), rtol=1e-10)
    # regularity ordering: periodic << random
    ap_reg = sstats.approximate_entropy(
        spark.createDataFrame(pd.DataFrame({"v": regular})), "v").toPandas().iloc[0]["apen"]
    ap_rand = sstats.approximate_entropy(
        spark.createDataFrame(pd.DataFrame({"v": noisy_s})), "v").toPandas().iloc[0]["apen"]
    assert ap_reg < 0.1 < ap_rand
