"""Timestamp sanitization pipeline + frequency inference.

Reference: ``TimestampSanitizer`` (/root/reference/diive/core/times/times.py:263-345)
runs 10 steps: validate name -> to_datetime -> drop NaT -> sort ascending ->
dedup keep-LAST -> monotonic check -> DetectFrequency -> nominal-freq
validation (hard error on mismatch, times.py:318-326) -> reindex to a
continuous grid (gaps materialize as null rows, times.py:1460-1517) ->
convert END->MIDDLE convention (times.py:1734).

Spark mapping: the name-validation becomes a column contract; sorting is
unnecessary (windows order on demand); dedup keep-last is a row_number
window; the continuous reindex is the grid left-join; everything stays lazy
until an action.

``DetectFrequency`` (times.py:348-482) votes 3 methods: full-index infer,
mode-of-deltas with >50% occurrence (times.py:1340), progressive first/last-N
agreement. Distributed version: delta histogram via lag + groupBy — one
cheap job; confidence = mode fraction.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TIMESTAMP_CONVENTION_NAMES = ("TIMESTAMP_START", "TIMESTAMP_MIDDLE", "TIMESTAMP_END")


class TimestampError(ValueError):
    pass


@dataclass
class FrequencyResult:
    freq_seconds: int | None
    confidence: float          # fraction of consecutive deltas equal to the mode
    n_deltas: int
    alternatives: list[tuple[int, int]]  # (delta_seconds, count) runners-up


def validate_timestamp_column_name(name: str) -> None:
    """times.py:1654-1680 — the timestamp column name is load-bearing
    metadata declaring which point of the interval it marks."""
    if name not in TIMESTAMP_CONVENTION_NAMES:
        raise TimestampError(
            f"timestamp column must be one of {TIMESTAMP_CONVENTION_NAMES}, got {name!r}"
        )


def detect_frequency(df: DataFrame, ts_col: str) -> FrequencyResult:
    """Mode-of-deltas vote (times.py:1340): the dominant consecutive delta
    with its occurrence fraction over ALL deltas; >0.5 counts as confident
    (the reference's >50% rule; full agreement == 1.0).

    Scale note: deltas are computed per calendar-day segment (window
    partitioned by date), not over one global sort — fully parallel, at the
    cost of ignoring one boundary delta per day, which cannot move a >50%
    mode on any non-trivial series."""
    w = Window.partitionBy(F.to_date(ts_col)).orderBy(ts_col)
    delta_counts = (
        df.select(F.col(ts_col))
        .filter(F.col(ts_col).isNotNull())
        .withColumn("_d", F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(F.lag(ts_col).over(w)))
        .filter(F.col("_d").isNotNull())
        .groupBy("_d").count()
        .cache()
    )
    top = delta_counts.orderBy(F.desc("count"), F.asc("_d")).limit(5).collect()
    if not top:
        delta_counts.unpersist()
        return FrequencyResult(None, 0.0, 0, [])
    total = delta_counts.agg(F.sum("count").alias("t")).collect()[0]["t"]
    delta_counts.unpersist()
    mode = top[0]
    return FrequencyResult(
        int(mode["_d"]),
        mode["count"] / total,
        int(total),
        [(int(r["_d"]), int(r["count"])) for r in top[1:]],
    )


def dedup_keep_last(df: DataFrame, ts_col: str, order_col: str | None = None) -> DataFrame:
    """Duplicate timestamps keep the LAST occurrence (times.py:1409-1457).
    'Last' means arrival order: pass ``order_col`` (e.g. a file/row sequence)
    or a monotonic ingest id is materialized."""
    if order_col is None:
        df = df.withColumn("_ord", F.monotonically_increasing_id())
        order_col = "_ord"
    w = Window.partitionBy(ts_col).orderBy(F.desc(order_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_ord")
    )


def reindex_continuous(df: DataFrame, ts_col: str, freq_seconds: int) -> DataFrame:
    """Reindex onto the continuous grid spanning min..max: missing slots
    become rows with null values (times.py:1460-1517)."""
    span = df.agg(F.min(ts_col).alias("lo"), F.max(ts_col).alias("hi"))
    grid = span.select(
        F.explode(
            F.sequence(F.col("lo"), F.col("hi"), F.expr(f"INTERVAL {freq_seconds} SECONDS"))
        ).alias(ts_col)
    )
    return grid.join(df, on=ts_col, how="left")


def sanitize_timestamps(
    df: DataFrame,
    ts_col: str = "TIMESTAMP_END",
    nominal_freq_seconds: int | None = None,
    output_convention: str = "middle",
    validate_name: bool = True,
    order_col: str | None = None,
) -> tuple[DataFrame, FrequencyResult]:
    """The full sanitizer pipeline (times.py:263-345). Returns the sanitized
    frame (continuous grid, deduped, convention-shifted) + detected freq."""
    from diive_spark.functions.timeparts import shift_timestamp_convention

    if validate_name:
        validate_timestamp_column_name(ts_col)

    clean = df.filter(F.col(ts_col).isNotNull())
    clean = dedup_keep_last(clean, ts_col, order_col)

    freq = detect_frequency(clean, ts_col)
    if freq.freq_seconds is None:
        raise TimestampError("cannot infer frequency from <2 timestamps")
    if freq.confidence <= 0.5:
        raise TimestampError(
            f"irregular timestamps: dominant delta {freq.freq_seconds}s covers only "
            f"{freq.confidence:.0%} of records"
        )
    if nominal_freq_seconds is not None and freq.freq_seconds != nominal_freq_seconds:
        # hard error, matching times.py:318-326
        raise TimestampError(
            f"detected frequency {freq.freq_seconds}s does not match nominal "
            f"{nominal_freq_seconds}s"
        )

    gridded = reindex_continuous(clean, ts_col, freq.freq_seconds)

    from_conv = ts_col.rsplit("_", 1)[-1].lower() if validate_name else "end"
    if output_convention != from_conv:
        gridded = shift_timestamp_convention(
            gridded, ts_col, freq.freq_seconds, from_conv, output_convention
        ).withColumnRenamed(ts_col, f"TIMESTAMP_{output_convention.upper()}")
    return gridded, freq
