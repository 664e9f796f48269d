"""Feature engineering stages + correlation analytics + cumulatives.

Reference:
- Rolling feature stages (/root/reference/diive/core/ml/feature_engineer.py:99-178):
  stage 1 lags [-n..n], stage 2 rolling mean/std/median/min/max/q25/q75 over
  a window list, stage 3 first/second differences, stage 4 EMA spans.
- rank_drivers (/root/reference/diive/analysis/correlation.py:18-105):
  rank features by max |corr| over lags in ±max_lag.
- DailyCorrelation (correlation.py:106): per-day Pearson r.
- doy_mean_cumulative / doy_cumulatives_per_year (times.py:1948/1954):
  per-year cumulative sums by DOY; multi-year mean/quantiles of cumulatives.
- quadrature cumulative sqrt(cumsum(x^2)) (core/dfun/stats.py:220 family).
- TimeSince run-length counter (variables/temporal.py:139).

Everything is window functions except EMA (recursive -> vectorized pandas
kernel per key, matching pandas ewm(span, adjust=False)).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def add_lags(df: DataFrame, key_cols: list[str], ts_col: str, value_col: str,
             lags: list[int]) -> DataFrame:
    """Stage 1: lagged copies; negative lag = lead (feature_engineer.py:99)."""
    w = Window.partitionBy(*key_cols).orderBy(ts_col)
    for lag in lags:
        name = f"{value_col}_lag{lag}" if lag >= 0 else f"{value_col}_lead{-lag}"
        df = df.withColumn(name, F.lag(value_col, lag).over(w))
    return df


def add_rolling_stats(df: DataFrame, key_cols: list[str], ts_col: str, value_col: str,
                      windows: list[int]) -> DataFrame:
    """Stage 2: centered rolling mean/std/median/min/max/q25/q75 per window
    size (feature_engineer.py:120-150)."""
    base = Window.partitionBy(*key_cols).orderBy(ts_col)
    v = F.col(value_col)
    for wsize in windows:
        w = base.rowsBetween(-((wsize - 1) // 2), wsize // 2)
        df = (
            df.withColumn(f"{value_col}_rmean{wsize}", F.avg(v).over(w))
            .withColumn(f"{value_col}_rstd{wsize}", F.stddev_samp(v).over(w))
            .withColumn(f"{value_col}_rmedian{wsize}", F.percentile(v, F.lit(0.5)).over(w))
            .withColumn(f"{value_col}_rmin{wsize}", F.min(v).over(w))
            .withColumn(f"{value_col}_rmax{wsize}", F.max(v).over(w))
            .withColumn(f"{value_col}_rq25_{wsize}", F.percentile(v, F.lit(0.25)).over(w))
            .withColumn(f"{value_col}_rq75_{wsize}", F.percentile(v, F.lit(0.75)).over(w))
        )
    return df


def add_diffs(df: DataFrame, key_cols: list[str], ts_col: str, value_col: str) -> DataFrame:
    """Stage 3: first + second differences (feature_engineer.py:152-160)."""
    w = Window.partitionBy(*key_cols).orderBy(ts_col)
    d1 = F.col(value_col) - F.lag(value_col).over(w)
    df = df.withColumn(f"{value_col}_diff1", d1)
    return df.withColumn(
        f"{value_col}_diff2",
        F.col(f"{value_col}_diff1") - F.lag(f"{value_col}_diff1").over(w),
    )


def add_ema(df: DataFrame, key_cols: list[str], ts_col: str, value_col: str,
            spans: list[int]) -> DataFrame:
    """Stage 4: EMA per span (feature_engineer.py:162-178). Recursive, so a
    grouped-map pandas kernel per key (ewm adjust=False, pandas semantics)."""
    out_cols = [f"{value_col}_ema{s}" for s in spans]
    schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields]
        + [f"{c} double" for c in out_cols]
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col)
        for s, c in zip(spans, out_cols):
            pdf[c] = pdf[value_col].ewm(span=s, adjust=False).mean()
        return pdf

    return df.groupBy(*key_cols).applyInPandas(lambda _, p: kernel(p), schema=schema)


def rank_drivers(
    df: DataFrame, ts_col: str, target_col: str, feature_cols: list[str],
    max_lag: int = 3, key_cols: list[str] | None = None,
) -> DataFrame:
    """Rank features by max |Pearson r| over lags in ±max_lag
    (correlation.py:18-105). One pass per lag (2*max_lag+1 cheap jobs folded
    into a single agg via pre-shifted columns)."""
    key_cols = list(key_cols or [])
    w = Window.partitionBy(*key_cols).orderBy(ts_col)
    shifted = df
    pairs = []
    for feat in feature_cols:
        for lag in range(-max_lag, max_lag + 1):
            name = f"_{feat}_l{lag + max_lag}"
            shifted = shifted.withColumn(name, F.lag(feat, lag).over(w))
            pairs.append((feat, lag, name))
    aggs = [
        F.abs(F.corr(F.col(target_col), F.col(name))).alias(f"{feat}__{lag + max_lag}")
        for feat, lag, name in pairs
    ]
    row = shifted.agg(*aggs)
    stacked = row.select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(feat).alias("feature"),
                    F.lit(lag).alias("lag"),
                    F.col(f"{feat}__{lag + max_lag}").alias("abs_corr"),
                )
                for feat, lag, _ in pairs
            ])
        ).alias("s")
    ).select("s.feature", "s.lag", "s.abs_corr")
    best = stacked.groupBy("feature").agg(
        F.max("abs_corr").alias("max_abs_corr"),
        F.max_by("lag", "abs_corr").alias("best_lag"),
    )
    return best.withColumn(
        "rank", F.dense_rank().over(Window.orderBy(F.desc("max_abs_corr")))
    )


def doy_cumulatives_per_year(
    df: DataFrame, ts_col: str, value_col: str,
) -> DataFrame:
    """Per-year cumulative sum by DOY (times.py:1948/1954): running sum over
    (year) ordered by doy."""
    w = (
        Window.partitionBy(F.year(ts_col))
        .orderBy(F.dayofyear(ts_col))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return df.withColumn("cumsum", F.sum(value_col).over(w)).select(
        F.year(ts_col).alias("year"),
        F.dayofyear(ts_col).alias("doy"),
        F.col(value_col),
        "cumsum",
    )


def doy_mean_cumulative(df: DataFrame, ts_col: str, value_col: str) -> DataFrame:
    """Multi-year mean + quantiles of the per-year DOY cumulatives."""
    per_year = doy_cumulatives_per_year(df, ts_col, value_col)
    daily_last = per_year.groupBy("year", "doy").agg(F.max("cumsum").alias("cumsum"))
    return daily_last.groupBy("doy").agg(
        F.avg("cumsum").alias("mean_cumsum"),
        F.percentile(F.col("cumsum"), F.lit(0.05)).alias("p05"),
        F.percentile(F.col("cumsum"), F.lit(0.95)).alias("p95"),
    )


def quadrature_cumulative(df: DataFrame, key_cols: list[str], ts_col: str,
                          value_col: str, out_col: str = "cum_quadrature",
                          tiebreak_cols: list[str] | None = None) -> DataFrame:
    """sqrt(cumsum(x^2)) — uncertainty propagation cumulative (SURVEY §2.4).
    ``tiebreak_cols`` make the running order deterministic when timestamps
    collide within a key."""
    order = [F.col(ts_col)] + [F.col(c) for c in (tiebreak_cols or [])]
    w = (
        Window.partitionBy(*key_cols).orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return df.withColumn(out_col, F.sqrt(F.sum(F.col(value_col) ** 2).over(w)))


def time_since(
    df: DataFrame, key_cols: list[str], ts_col: str, value_col: str,
    lower: float | None = None, upper: float | None = None,
    out_col: str = "time_since",
) -> DataFrame:
    """Records since the value was last inside [lower, upper]
    (variables/temporal.py:139): run-id via running count of inside-hits,
    counter via row_number within the run."""
    v = F.col(value_col)
    inside = F.lit(True)
    if lower is not None:
        inside = inside & (v >= lower)
    if upper is not None:
        inside = inside & (v <= upper)
    w = Window.partitionBy(*key_cols).orderBy(ts_col).rowsBetween(
        Window.unboundedPreceding, 0
    )
    run = F.sum(F.when(inside, 1).otherwise(0)).over(w)
    out = df.withColumn("_run", run)
    w2 = Window.partitionBy(*key_cols, "_run").orderBy(ts_col)
    return out.withColumn(out_col, (F.row_number().over(w2) - 1).cast("bigint")).drop("_run")


def add_rolling_stats_advanced(
    df: DataFrame, key_cols: list[str], ts_col: str,
    value_cols: list[str], windows: list[int],
    stats: tuple[str, ...] = ("median", "min", "max"),
) -> DataFrame:
    """Advanced trailing rolling statistics — the reference
    FeatureEngineer's ``_rolling_features_advanced``
    (core/ml/feature_engineer.py:596-632): per column and window,
    median / min / max / population SD / q25 / q75 over
    ``rolling(window=w, min_periods=1)``. Column naming follows the
    reference's ``{col}_ROLL{STAT}{w}`` (without its leading dot —
    dotted names fight Spark's struct-field resolution). Pure window
    expressions; pandas' linear-interpolated rolling quantiles match
    Spark's exact ``percentile``."""
    exprs = {
        "median": ("MEDIAN", lambda c: F.percentile(c, F.lit(0.5))),
        "min": ("MIN", F.min), "max": ("MAX", F.max),
        "std": ("SD", F.stddev_pop),
        "q25": ("Q25", lambda c: F.percentile(c, F.lit(0.25))),
        "q75": ("Q75", lambda c: F.percentile(c, F.lit(0.75))),
    }
    base = Window.partitionBy(*key_cols).orderBy(ts_col)
    for w in windows:
        frame = base.rowsBetween(-(w - 1), 0)
        for col in value_cols:
            for stat in stats:
                if stat not in exprs:
                    raise ValueError(f"unknown rolling statistic {stat!r}")
                name, fn = exprs[stat]
                df = df.withColumn(f"{col}_ROLL{name}{w}",
                                   fn(F.col(col)).over(frame))
    return df


def add_polynomial(df: DataFrame, value_cols: list[str],
                   degree: int) -> DataFrame:
    """Polynomial feature expansion (FeatureEngineer
    ``_polynomial_features``, feature_engineer.py:679-698):
    ``{col}_POL{d}`` = col**d for d in 2..degree."""
    if degree < 2:
        return df
    for d in range(2, degree + 1):
        for col in value_cols:
            df = df.withColumn(f"{col}_POL{d}", F.pow(F.col(col), d))
    return df
