"""Analysis extras vs hand-rolled numpy/pandas oracles implementing the
reference formulas (seasonaltrend classical path, harmonic DFT, granger
ssr F-test, optimum range)."""

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from diive_spark.operators import analysis


def _mk(spark, vals, freq="1h", key="s1"):
    ts = pd.date_range("2024-01-01", periods=len(vals), freq=freq)
    return spark.createDataFrame(pd.DataFrame({"key": key, "ts": ts, "value": vals}))


def _classical_oracle(vals: np.ndarray, period: int):
    """statsmodels seasonal_decompose (additive) formulas, hand-rolled."""
    s = pd.Series(vals)
    if period % 2 == 1:
        trend = s.rolling(period, center=True).mean()
    else:
        # 2xMA: period+1 window, half weight on both endpoints
        w = np.ones(period + 1)
        w[0] = w[-1] = 0.5
        trend = s.rolling(period + 1, center=True).apply(
            lambda x: (x * w).sum() / period, raw=True
        )
    detr = s - trend
    phase = np.arange(len(s)) % period
    pm = detr.groupby(phase).mean()
    pm = pm - pm.mean()
    seasonal = pm[phase].to_numpy()
    resid = s.to_numpy() - trend.to_numpy() - seasonal
    return trend.to_numpy(), seasonal, resid


@pytest.mark.parametrize("period", [24, 25])
def test_classical_decompose_matches_statsmodels_formula(spark, period):
    rng = np.random.default_rng(5)
    n = 24 * 14
    t = np.arange(n)
    vals = 0.01 * t + 3 * np.sin(2 * np.pi * t / period) + rng.normal(0, 0.2, n)
    df = _mk(spark, vals)
    out = analysis.classical_decompose(df, ["key"], "ts", "value", period)
    pdf = out.orderBy("ts").toPandas()
    trend, seasonal, resid = _classical_oracle(vals, period)
    np.testing.assert_allclose(pdf["trend"].to_numpy(dtype=float), trend, rtol=1e-10)
    np.testing.assert_allclose(pdf["seasonal"].to_numpy(dtype=float), seasonal, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(pdf["residual"].to_numpy(dtype=float), resid, rtol=1e-8, atol=1e-10)
    # identity where trend exists
    nn = pdf["trend"].notna()
    np.testing.assert_allclose(
        (pdf["trend"] + pdf["seasonal"] + pdf["residual"])[nn],
        pdf["value"][nn], rtol=1e-10,
    )
    strength = analysis.seasonality_strength(out, ["key"]).collect()[0][1]
    assert strength > 0.9  # strongly seasonal signal


def test_harmonic_coefficients_match_rfft(spark):
    """On a gapless series whose length is a multiple of the period, the
    distributed DFT sums equal numpy's rfft bins exactly (no window)."""
    rng = np.random.default_rng(2)
    period, reps = 24, 10
    n = period * reps
    t = np.arange(n)
    vals = (2.5 * np.cos(2 * np.pi * t / period + 0.7)
            + 1.0 * np.cos(2 * np.pi * 2 * t / period - 1.2)
            + rng.normal(0, 0.1, n))
    df = _mk(spark, vals)
    got = analysis.harmonic_coefficients(df, ["key"], "ts", "value",
                                         period=period, n_harmonics=3)
    got = got.orderBy("harmonic").toPandas()
    fft = np.fft.rfft(vals) / n
    for k in range(1, 4):
        b = k * reps  # FFT bin of harmonic k
        np.testing.assert_allclose(got["amplitude"][k - 1], 2 * np.abs(fft[b]), rtol=1e-9)
        np.testing.assert_allclose(got["phase"][k - 1], np.angle(fft[b]), rtol=1e-7, atol=1e-9)
    # planted amplitudes recovered
    np.testing.assert_allclose(got["amplitude"][0], 2.5, atol=0.05)
    np.testing.assert_allclose(got["amplitude"][1], 1.0, atol=0.05)


def test_detect_seasonality_finds_planted_period(spark):
    rng = np.random.default_rng(3)
    t = np.arange(24 * 30)
    vals = 4 * np.sin(2 * np.pi * t / 24) + rng.normal(0, 0.5, len(t))
    out = analysis.detect_seasonality(_mk(spark, vals), ["key"], "ts", "value")
    row = out.collect()[0]
    assert row["primary_period"] == 24
    assert row["strength"] > 0.5
    assert 24 in row["top_periods"]


def test_f_sf_against_closed_form():
    """For d1=2 the F survival function has the closed form
    (1 + 2 f / d2)^(-d2/2) — checks the incomplete-beta implementation."""
    for f_stat in (0.5, 1.0, 3.2, 10.0):
        for d2 in (5, 20, 100):
            expect = (1 + 2 * f_stat / d2) ** (-d2 / 2)
            np.testing.assert_allclose(analysis.f_sf(f_stat, 2, d2), expect, rtol=1e-10)
    # monotone decreasing in f
    assert analysis.f_sf(1.0, 3, 30) > analysis.f_sf(2.0, 3, 30) > analysis.f_sf(5.0, 3, 30)


def test_granger_causality_matches_lstsq_oracle(spark):
    """x drives y at lag 2: p tiny for lag >= 2; F-stat matches a numpy
    lstsq OLS oracle implementing the same ssr_ftest."""
    rng = np.random.default_rng(7)
    n = 400
    x = rng.normal(0, 1, n)
    y = np.zeros(n)
    for t in range(2, n):
        y[t] = 0.4 * y[t - 1] + 0.9 * x[t - 2] + rng.normal(0, 0.3)
    ts = pd.date_range("2024-01-01", periods=n, freq="30min")
    df = spark.createDataFrame(pd.DataFrame({"key": "s1", "ts": ts, "x": x, "y": y}))
    got = analysis.granger_causality(df, ["key"], "ts", "x", "y", max_lag=3)
    got = got.set_index("lag")

    def oracle_f(L):
        rows = n - L
        Y = y[L:]
        ylags = np.column_stack([y[L - i:n - i] for i in range(1, L + 1)])
        xlags = np.column_stack([x[L - i:n - i] for i in range(1, L + 1)])
        const = np.ones((rows, 1))
        Xr = np.hstack([const, ylags])
        Xu = np.hstack([const, ylags, xlags])
        rss_r = np.sum((Y - Xr @ np.linalg.lstsq(Xr, Y, rcond=None)[0]) ** 2)
        rss_u = np.sum((Y - Xu @ np.linalg.lstsq(Xu, Y, rcond=None)[0]) ** 2)
        return ((rss_r - rss_u) / L) / (rss_u / (rows - 2 * L - 1))

    for L in (1, 2, 3):
        np.testing.assert_allclose(got.loc[L, "f_stat"], oracle_f(L), rtol=1e-7)
    assert got.loc[2, "p_value"] < 1e-6 and got.loc[3, "p_value"] < 1e-6
    assert analysis.significant_lag(got.reset_index()) in (1, 2)
    # reverse direction: y should NOT cause x
    rev = analysis.granger_causality(df, ["key"], "ts", "y", "x", max_lag=2)
    assert (rev["p_value"] > 0.01).all()


def test_find_optimum_range(spark):
    rng = np.random.default_rng(11)
    n = 5000
    x = rng.uniform(0, 10, n)
    y = -((x - 5.0) ** 2) + rng.normal(0, 0.5, n)
    ts = pd.to_datetime("2023-01-01") + pd.to_timedelta(
        rng.integers(0, 2 * 365 * 24, n), unit="h")
    df = spark.createDataFrame(pd.DataFrame({"ts": ts, "x": x, "y": y}))
    res = analysis.find_optimum_range(df, "x", "y", n_bins=50, ts_col="ts")
    assert res["optimum_xstart"] < 5.0 < res["optimum_xend"]
    assert res["optimum_xend"] - res["optimum_xstart"] < 4.0  # tight around peak
    assert res["is_optimum_prominent"]
    counts = res["vals_in_optimum_range_df"]
    assert set(counts["year"]) == {2023, 2024}
    assert (counts["vals_belowoptimum"] + counts["vals_inoptimum"]
            + counts["vals_aboveoptimum"] == counts["vals_total"]).all()
    # min-optimum mirror
    res_min = analysis.find_optimum_range(df.withColumn("y2", -F.col("y")),
                                          "x", "y2", n_bins=50,
                                          define_optimum="min")
    assert res_min["optimum_xstart"] < 5.0 < res_min["optimum_xend"]


def test_stratified_analysis_matches_pandas_on_same_bins(spark):
    """StratifiedAnalysis (decoupling.py:25): per (z-bin, x-bin) aggregates
    match a pandas oracle using the SAME bin assignments; x-bins within each
    z-bin are rank-balanced (qcut semantics)."""
    rng = np.random.default_rng(4)
    n = 4000
    z = rng.uniform(0, 30, n)
    x = rng.uniform(0, 100, n) + z  # coupled
    y = 2 * x - z + rng.normal(0, 5, n)
    df = spark.createDataFrame(pd.DataFrame({"z": z, "x": x, "y": y}))
    out = analysis.stratified_analysis(df, "z", "x", "y",
                                       n_bins_z=8, n_bins_x=2).toPandas()
    assert len(out) == 16
    # rank-based x-binning: within each z bin the two x-bins are balanced
    counts = out.pivot(index="z_bin", columns="x_bin", values="y_counts")
    assert (abs(counts[0] - counts[1]) <= 1).all()
    # x_agg is monotone in x_bin (higher bin = higher x by construction)
    piv = out.pivot(index="z_bin", columns="x_bin", values="x_agg")
    assert (piv[1] > piv[0]).all()
    # error bars: p16 <= agg <= p84 and errors are the absolute distances
    assert (out["y_p16"] <= out["y_agg"]).all() and (out["y_agg"] <= out["y_p84"]).all()
    np.testing.assert_allclose(out["yerror_neg"], out["y_agg"] - out["y_p16"])
    # oracle: recompute the median-of-y for one bin with pandas on the same
    # assignment rule (z edges from exact quantiles, x split at the median)
    zq = np.quantile(z, np.linspace(0, 1, 9), method="lower")
    zb = np.minimum(np.searchsorted(zq[1:-1], z, side="left"), 7)
    sel = zb == 3
    xmed_rank = pd.Series(x[sel]).rank(method="first")
    xb = (xmed_rank > sel.sum() / 2).astype(int)
    exp = pd.Series(y[sel]).groupby(xb.values).median()
    got = out.set_index(["z_bin", "x_bin"]).loc[3, "y_agg"]
    np.testing.assert_allclose(sorted(got), sorted(exp), rtol=0.05)


def test_compound_extremes_classification(spark):
    """CompoundExtremes (compoundextremes.py:33): monthly agg, seasonal
    z-scores (sample SD), four-way classification — vs a pandas oracle."""
    rng = np.random.default_rng(9)
    ts = pd.date_range("2015-01-01", "2022-12-31 23:30", freq="6h")
    month = ts.month.to_numpy()
    vpd = 10 + 5 * np.sin(2 * np.pi * (month - 6) / 12) + rng.normal(0, 1, len(ts))
    swc = 40 - 5 * np.sin(2 * np.pi * (month - 6) / 12) + rng.normal(0, 1, len(ts))
    # plant a compound extreme: hot+dry August 2018
    mask = (ts >= "2018-08-01") & (ts < "2018-09-01")
    vpd[mask] += 8
    swc[mask] -= 8
    df = spark.createDataFrame(pd.DataFrame({"ts": ts, "vpd": vpd, "swc": swc}))
    out = analysis.compound_extremes(df, "ts", "vpd", "swc", threshold=2.0)
    pdf = out.toPandas().set_index("period").sort_index()
    assert pdf.loc["2018-08", "category"] == "compound"
    assert (pdf["category"] == "compound").sum() == 1
    # oracle: same monthly agg + per-calendar-month sample-SD z-scores
    s = pd.DataFrame({"vpd": vpd, "swc": swc}, index=ts).resample("MS").mean()
    g = s.groupby(s.index.month)
    z1 = (s["vpd"] - g["vpd"].transform("mean")) / g["vpd"].transform("std")
    z2 = (s["swc"] - g["swc"].transform("mean")) / g["swc"].transform("std")
    np.testing.assert_allclose(
        pdf["z1"].to_numpy(), z1.sort_index().to_numpy(), rtol=1e-9)
    np.testing.assert_allclose(
        pdf["z2"].to_numpy(), z2.sort_index().to_numpy(), rtol=1e-9)
    exp_cat = np.where((z1 >= 2) & (z2 <= -2), "compound",
               np.where(z1 >= 2, "var1_only",
               np.where(z2 <= -2, "var2_only", "none")))
    assert list(pdf["category"]) == list(exp_cat)
    # record standardization path runs
    rec = analysis.compound_extremes(df, "ts", "vpd", "swc",
                                     standardize_by="record", agg="daily")
    assert rec.count() > 0


def test_stl_decomposes_planted_signal(spark):
    """STL (Cleveland 1990): recovers a planted trend + seasonal pattern and
    satisfies the additive identity; components agree with classical
    decomposition on a well-behaved series."""
    from diive_spark.operators import analysis as ana
    from diive_spark.operators import stl

    rng = np.random.default_rng(6)
    p, n = 24, 24 * 20
    t = np.arange(n)
    true_trend = 5.0 + 0.01 * t
    true_seas = 3.0 * np.sin(2 * np.pi * t / p)
    vals = true_trend + true_seas + rng.normal(0, 0.3, n)
    df = _mk(spark, vals)
    out = stl.stl_decompose(df, ["key"], "ts", "value", period=p).orderBy("ts").toPandas()
    T = out["trend"].to_numpy(dtype=float)
    S = out["seasonal"].to_numpy(dtype=float)
    R = out["residual"].to_numpy(dtype=float)
    np.testing.assert_allclose(T + S + R, vals, rtol=1e-10)  # identity
    # trend tracks the line, seasonal tracks the sine (skip edge cycles)
    mid = slice(2 * p, n - 2 * p)
    assert np.abs(T[mid] - true_trend[mid]).mean() < 0.25
    assert np.abs(S[mid] - true_seas[mid]).mean() < 0.25
    assert np.corrcoef(S[mid], true_seas[mid])[0, 1] > 0.99
    assert R[mid].std() < 0.5
    # agrees with the classical path where both are defined
    cl = ana.classical_decompose(df, ["key"], "ts", "value", p).orderBy("ts").toPandas()
    both = cl["trend"].notna().to_numpy() & ~np.isnan(T)
    assert np.corrcoef(T[both], cl["trend"].to_numpy(dtype=float)[both])[0, 1] > 0.99


def test_stl_robust_downweights_outliers(spark):
    from diive_spark.operators import stl

    rng = np.random.default_rng(14)
    p, n = 24, 24 * 15
    t = np.arange(n)
    vals = 10 + 2 * np.sin(2 * np.pi * t / p) + rng.normal(0, 0.2, n)
    spikes = [100, 180, 260]
    vals[spikes] += 30.0
    df = _mk(spark, vals)
    plain = stl.stl_decompose(df, ["key"], "ts", "value", period=p).orderBy("ts").toPandas()
    robust = stl.stl_decompose(df, ["key"], "ts", "value", period=p,
                               robust=True, n_outer=5).orderBy("ts").toPandas()
    # near the spikes, the robust trend stays close to the true level 10
    near = np.unique(np.concatenate([np.arange(s - 3, s + 4) for s in spikes]))
    plain_dev = np.abs(plain["trend"].to_numpy(dtype=float)[near] - 10).max()
    robust_dev = np.abs(robust["trend"].to_numpy(dtype=float)[near] - 10).max()
    assert robust_dev < plain_dev
    assert robust_dev < 1.0
    # spike lands in the residual, not the seasonal
    assert robust["residual"].to_numpy(dtype=float)[spikes].min() > 20


def test_stl_nulls_and_short_series(spark):
    from diive_spark.operators import stl

    # nulls: components null at gaps, identity elsewhere
    vals = list(10 + 2 * np.sin(2 * np.pi * np.arange(24 * 6) / 24))
    vals[30] = None
    df = _mk(spark, vals)
    out = stl.stl_decompose(df, ["key"], "ts", "value", period=24).orderBy("ts").toPandas()
    assert pd.isna(out.loc[30, "trend"])
    nn = out["value"].notna()
    np.testing.assert_allclose(
        (out["trend"] + out["seasonal"] + out["residual"])[nn],
        out["value"][nn], rtol=1e-10)
    # too-short series: all-null components, no crash
    short = _mk(spark, list(np.arange(10.0)))
    s_out = stl.stl_decompose(short, ["key"], "ts", "value", period=24).toPandas()
    assert s_out["trend"].isna().all()


def test_stl_quality_weighted(spark):
    """quality_weighted_decompose (decomposition_utils.py:318): low-quality
    outliers influence the fit less than in the unweighted run."""
    from diive_spark.operators import stl

    rng = np.random.default_rng(15)
    p, n = 24, 24 * 12
    t = np.arange(n)
    vals = 10 + 2 * np.sin(2 * np.pi * t / p) + rng.normal(0, 0.2, n)
    quality = np.ones(n)
    spikes = [120, 150]
    vals[spikes] += 25.0
    quality[spikes] = 0.0  # flagged bad
    ts = pd.date_range("2024-01-01", periods=n, freq="1h")
    df = spark.createDataFrame(pd.DataFrame(
        {"key": "a", "ts": ts, "value": vals, "q": quality}))
    plain = stl.stl_decompose(df, ["key"], "ts", "value", period=p).orderBy("ts").toPandas()
    qw = stl.stl_decompose(df, ["key"], "ts", "value", period=p,
                           quality_col="q").orderBy("ts").toPandas()
    near = np.arange(115, 156)
    plain_dev = np.abs(plain["trend"].to_numpy(dtype=float)[near] - 10).max()
    qw_dev = np.abs(qw["trend"].to_numpy(dtype=float)[near] - 10).max()
    assert qw_dev < plain_dev
    assert qw_dev < 0.6
    # the outliers land in the residual, preserved in output rows
    assert qw["residual"].to_numpy(dtype=float)[spikes].min() > 18


def test_granger_multiple_keys_and_variants(spark):
    """Multi-key Granger: per-key results independent; stratified/compound
    median-agg paths run."""
    rng = np.random.default_rng(17)
    n = 300
    frames = []
    for key, lagged in (("a", True), ("b", False)):
        x = rng.normal(0, 1, n)
        y = np.zeros(n)
        for t in range(2, n):
            y[t] = 0.3 * y[t - 1] + (0.9 * x[t - 1] if lagged else 0.0) \
                + rng.normal(0, 0.3)
        ts = pd.date_range("2024-01-01", periods=n, freq="30min")
        frames.append(pd.DataFrame({"key": key, "ts": ts, "x": x, "y": y}))
    df = spark.createDataFrame(pd.concat(frames))
    got = analysis.granger_causality(df, ["key"], "ts", "x", "y", max_lag=2)
    a = got[got["key"] == "a"].set_index("lag")
    b = got[got["key"] == "b"].set_index("lag")
    assert a.loc[1, "p_value"] < 1e-6      # x drives y for key a
    assert b["p_value"].min() > 0.01       # no relationship for key b

    # median-agg variants execute and produce sane shapes
    z = rng.uniform(0, 10, 2000)
    x2 = rng.uniform(0, 10, 2000)
    y2 = x2 + z + rng.normal(0, 1, 2000)
    sdf = spark.createDataFrame(pd.DataFrame({"z": z, "x": x2, "y": y2}))
    out = analysis.stratified_analysis(sdf, "z", "x", "y", n_bins_z=4,
                                       n_bins_x=2, agg="mean").toPandas()
    assert len(out) == 8 and out["y_counts"].sum() == 2000
    ts = pd.date_range("2020-01-01", periods=2000, freq="6h")
    cdf = spark.createDataFrame(pd.DataFrame({"ts": ts, "a": y2, "b": x2}))
    ce = analysis.compound_extremes(cdf, "ts", "a", "b", agg="monthly",
                                    agg_func="median", threshold=1.0)
    assert ce.count() > 0
