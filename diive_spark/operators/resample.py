"""Tumbling-window continuous aggregates (the canonical diive downsample).

Reference semantics:
- ``resample_series_to_30MIN`` (/root/reference/diive/core/times/resampling.py:93-197):
  label='right' (output timestamp = window END), per-window count + agg,
  completeness gate ``mincounts = int(maxcounts * mincounts_perc)`` with the
  floor rule ``mincounts = 1 if mincounts < 3`` (resampling.py:167-171), where
  ``maxcounts`` is the number of grid slots per window (dummy-1s resample,
  resampling.py:164-166).
- ``resample_to_daily_agg`` (resampling.py:47-90): relative gate vs the
  fullest day's *observed* count, ``mincounts = max(1, int(maxcounts*perc))``.
- ``resample_to_monthly_agg_matrix`` (resampling.py:15-44): year x month agg,
  optional dense rank per month across years (rank 1 = highest).
- ``diel_cycle`` (resampling.py:200-262): group by time-of-day (x month),
  count/mean/std/median/q25/q75/min/max, mask groups below ``mincounts``.

Spark mapping: one ``groupBy(window(ts, tier), *keys)`` — a single shuffle on
``(window, key)``. At 100 TB this is the only raw-data shuffle in the whole
engine; everything downstream (cascade, gap-fill, outliers, compression)
operates on the rollup, which is ~1e5-1e6x smaller. Partial stats
(count/sum/min/max/sum-of-squares) are carried so higher tiers re-aggregate
without rescanning raw data (partial/final composition, SURVEY.md §2.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TIER_INTERVALS = {"1m": "1 minute", "30m": "30 minutes", "1h": "1 hour", "1d": "1 day"}
TIER_SECONDS = {"1m": 60, "30m": 1800, "1h": 3600, "1d": 86400}

# Partial-aggregate columns carried per (key, window, value-column); these
# compose under re-aggregation: sum/cnt/min/max/sumsq of the 1h tier are exact
# functions of the 1m tier partials — the distributed analogue of the
# reference's single-process partial/final split (SURVEY.md §2.4).
PARTIAL_COLS = ("cnt", "sum", "min", "max", "sumsq")


def mincounts_rule(maxcounts: int, mincounts_perc: float) -> int:
    """Reference floor rule (resampling.py:167-171): int(max*perc), but
    require only 1 when that lands below 3."""
    mincounts = int(maxcounts * mincounts_perc)
    return 1 if mincounts < 3 else mincounts


def rollup(
    df: DataFrame,
    ts_col: str,
    value_cols: list[str],
    tier: str,
    key_cols: list[str] | None = None,
    mincounts_perc: float = 0.0,
    slots_per_window: int | None = None,
) -> DataFrame:
    """Tumbling-window rollup with diive's completeness gate.

    Args:
        tier: one of TIER_INTERVALS keys.
        mincounts_perc: completeness threshold (0 disables the gate beyond
            "window has >=1 value").
        slots_per_window: if the input sits on a regular grid, the number of
            grid slots per window (reference maxcounts, resampling.py:164-166).
            If None, maxcounts falls back to the max *observed* per-window
            count across the whole input (resample_to_daily_agg semantics,
            resampling.py:85-87) — computed with a scalar subquery-style
            global max, no extra shuffle thanks to AQE reuse.

    Returns one row per (key, window) that passes the gate, with
    ``window_start``/``window_end`` (label-right: window_end is the diive
    TIMESTAMP_END) plus per value column: ``{v}_cnt/_sum/_mean/_min/_max/_sumsq``.
    """
    key_cols = list(key_cols or [])
    interval = TIER_INTERVALS[tier]
    w = F.window(F.col(ts_col), interval)

    aggs = []
    for v in value_cols:
        c = F.col(v)
        aggs += [
            F.count(c).alias(f"{v}_cnt"),
            F.sum(c).alias(f"{v}_sum"),
            F.min(c).alias(f"{v}_min"),
            F.max(c).alias(f"{v}_max"),
            # sumsq feeds variance; compute in double (int*int overflows
            # under ANSI mode for large values, and precision is moot here)
            F.sum(c.cast("double") * c.cast("double")).alias(f"{v}_sumsq"),
        ]
    grouped = df.groupBy(w.alias("w"), *key_cols).agg(*aggs)
    out = grouped.select(
        *key_cols,
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        *[f"{v}_{p}" for v in value_cols for p in PARTIAL_COLS],
        *[(F.col(f"{v}_sum") / F.col(f"{v}_cnt")).alias(f"{v}_mean") for v in value_cols],
    )

    if mincounts_perc and mincounts_perc > 0:
        gate_col = F.col(f"{value_cols[0]}_cnt")
        if slots_per_window is not None:
            mincounts = mincounts_rule(slots_per_window, mincounts_perc)
            out = out.filter(gate_col >= F.lit(mincounts))
        else:
            # Relative-to-fullest-window gate; floor at 1 (resampling.py:86).
            maxw = Window.partitionBy(*key_cols) if key_cols else Window.partitionBy()
            out = (
                out.withColumn("_maxcnt", F.max(gate_col).over(maxw))
                .filter(gate_col >= F.greatest(F.lit(1), F.floor(F.col("_maxcnt") * mincounts_perc)))
                .drop("_maxcnt")
            )
    return out


def reaggregate(
    rollup_df: DataFrame,
    to_tier: str,
    value_cols: list[str],
    key_cols: list[str] | None = None,
) -> DataFrame:
    """Final-merge a lower tier into a higher one without touching raw data.

    1h tier = groupBy(window(1m.window_start, '1 hour')) of the 1m partials;
    mean is recomputed as sum/cnt (SURVEY.md §2.4 cascade). Exactness is
    guaranteed for cnt/sum/min/max/sumsq (associative) — tested as
    reagg-equals-direct in tests/test_cascade.py.
    """
    key_cols = list(key_cols or [])
    w = F.window(F.col("window_start"), TIER_INTERVALS[to_tier])
    aggs = []
    for v in value_cols:
        aggs += [
            F.sum(f"{v}_cnt").alias(f"{v}_cnt"),
            F.sum(f"{v}_sum").alias(f"{v}_sum"),
            F.min(f"{v}_min").alias(f"{v}_min"),
            F.max(f"{v}_max").alias(f"{v}_max"),
            F.sum(f"{v}_sumsq").alias(f"{v}_sumsq"),
        ]
    grouped = rollup_df.groupBy(w.alias("w"), *key_cols).agg(*aggs)
    return grouped.select(
        *key_cols,
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        *[f"{v}_{p}" for v in value_cols for p in PARTIAL_COLS],
        *[(F.col(f"{v}_sum") / F.col(f"{v}_cnt")).alias(f"{v}_mean") for v in value_cols],
    )


def resample_to_daily_agg(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    agg: str = "mean",
    mincounts_perc: float = 0.0,
    key_cols: list[str] | None = None,
) -> DataFrame:
    """Daily aggregate with relative completeness gate (resampling.py:47-90).

    Output: (keys..., day, {value_col}_{agg} aliased ``agg_value``, n_vals).
    """
    key_cols = list(key_cols or [])
    aggfn = {
        "mean": F.avg, "sum": F.sum, "min": F.min, "max": F.max,
        "median": lambda c: F.percentile(c, F.lit(0.5)),
        "std": F.stddev_samp,
    }[agg]
    day = F.date_trunc("day", F.col(ts_col)).alias("day")
    out = df.groupBy(day, *key_cols).agg(
        F.count(value_col).alias("n_vals"),
        aggfn(F.col(value_col)).alias("agg_value"),
    )
    maxw = Window.partitionBy(*key_cols) if key_cols else Window.partitionBy()
    return (
        out.withColumn("_maxcnt", F.max("n_vals").over(maxw))
        .filter(F.col("n_vals") >= F.greatest(F.lit(1), F.floor(F.col("_maxcnt") * F.lit(mincounts_perc))))
        .drop("_maxcnt")
    )


def resample_to_monthly_agg_matrix(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    agg: str = "mean",
    ranks: bool = False,
    pivot: bool = False,
) -> DataFrame:
    """Year x month aggregate, long form (year, month, agg_value[, rank])
    or wide (pivot on month) — resampling.py:15-44. Rank is dense, per month
    across years, rank 1 = highest value (resampling.py:38-42)."""
    aggfn = {"mean": F.avg, "median": lambda c: F.percentile(c, F.lit(0.5)),
             "sum": F.sum, "max": F.max, "min": F.min, "std": F.stddev_samp}[agg]
    long = (
        df.groupBy(F.year(ts_col).alias("year"), F.month(ts_col).alias("month"))
        .agg(aggfn(F.col(value_col)).alias("agg_value"))
    )
    if ranks:
        w = Window.partitionBy("month").orderBy(F.desc("agg_value"))
        long = long.withColumn("rank", F.dense_rank().over(w).cast("double"))
    if pivot:
        val = "rank" if ranks else "agg_value"
        return long.groupBy("year").pivot("month", list(range(1, 13))).agg(F.first(val)).orderBy("year")
    return long


def diel_cycle(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    mincounts: int = 1,
    each_month: bool = False,
) -> DataFrame:
    """Diel (time-of-day) cycle — resampling.py:200-262.

    Groups by (hour, minute)[, month]; emits count/mean/std/median/q25/q75/
    min/max plus mean±sd; groups under ``mincounts`` have all stats nulled
    (reference sets them NaN, resampling.py:245-246) but remain as rows.
    """
    groups = [F.hour(ts_col).alias("hour"), F.minute(ts_col).alias("minute")]
    names = ["hour", "minute"]
    if each_month:
        groups.insert(0, F.month(ts_col).alias("month"))
        names.insert(0, "month")
    c = F.col(value_col)
    out = df.groupBy(*groups).agg(
        F.count(c).alias("n_vals"),
        F.avg(c).alias("mean"),
        F.stddev_samp(c).alias("std"),
        F.percentile(c, F.lit(0.5)).alias("median"),
        F.percentile(c, F.lit(0.25)).alias("q25"),
        F.percentile(c, F.lit(0.75)).alias("q75"),
        F.min(c).alias("min"),
        F.max(c).alias("max"),
    )
    out = out.withColumn("mean_plus_sd", F.col("mean") + F.col("std")).withColumn(
        "mean_minus_sd", F.col("mean") - F.col("std")
    )
    statcols = ["mean", "std", "median", "q25", "q75", "min", "max", "mean_plus_sd", "mean_minus_sd"]
    keep = F.col("n_vals") >= F.lit(mincounts)
    for s in statcols:
        out = out.withColumn(s, F.when(keep, F.col(s)))
    return out.select(*names, "n_vals", *statcols)
