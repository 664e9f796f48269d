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
    confidence: float          # vote confidence (1.0 / 0.95 / mode fraction / 0.70)
    n_deltas: int
    alternatives: list[tuple[int, int]]  # (delta_seconds, count) runners-up
    detection_method: str | None = None  # all_methods_agree / full_dataset /
    # timedelta / start_end_chunks (DetectFrequency, times.py:372-470)


def to_diive_format(
    df: DataFrame, ts_col: str, timestamp_name: str | None = None,
    level_sep: str = "::",
) -> tuple[DataFrame, dict]:
    """Coerce a frame to the diive convention (files.py:18-55): flatten
    two-level column names ``NAME<sep>UNITS`` to their top level — the Spark
    stand-in for the reference's pandas MultiIndex flatten — returning the
    stripped units as a metadata dict, and validate (optionally rename) the
    timestamp column to one of the allowed convention names."""
    units: dict[str, str] = {}
    for c in list(df.columns):
        if level_sep in c:
            top, unit = c.split(level_sep, 1)
            units[top] = unit
            df = df.withColumnRenamed(c, top)
            if c == ts_col:
                ts_col = top
    if timestamp_name is not None:
        validate_timestamp_column_name(timestamp_name)
        if ts_col != timestamp_name:
            df = df.withColumnRenamed(ts_col, timestamp_name)
            ts_col = timestamp_name
    validate_timestamp_column_name(ts_col)
    return df, units


def validate_timestamp_column_name(name: str) -> None:
    """times.py:1654-1680 — the timestamp column name is load-bearing
    metadata declaring which point of the interval it marks."""
    if name not in TIMESTAMP_CONVENTION_NAMES:
        raise TimestampError(
            f"timestamp column must be one of {TIMESTAMP_CONVENTION_NAMES}, got {name!r}"
        )


def _progressive_freq(head_ts: list, tail_ts: list, n_rows: int) -> int | None:
    """timestamp_infer_freq_progressively (times.py:1245-1293): find the
    largest ndr in 1000..3 where the first ndr and last ndr rows both have one
    constant delta and the two deltas agree. Runs driver-side on two bounded
    (<=1000-row) samples."""
    def const_delta(ts):
        ds = {
            int((b - a).total_seconds())
            for a, b in zip(ts, ts[1:])
        }
        return ds.pop() if len(ds) == 1 else None

    for ndr in range(min(1000, len(head_ts), len(tail_ts)), 2, -1):
        if n_rows < ndr * 2:
            continue
        d1 = const_delta(head_ts[:ndr])
        if d1 is None:
            continue
        d2 = const_delta(tail_ts[-ndr:])
        if d2 is not None and d1 == d2:
            return d1
    return None


def detect_frequency(df: DataFrame, ts_col: str) -> FrequencyResult:
    """DetectFrequency 3-method vote (times.py:348-482):

    1. *full_dataset* (times.py:1295): the series is perfectly regular —
       every delta equals the mode AND the global span is exactly
       (n-1) * mode (the span check catches cross-day gaps the segmented
       delta histogram cannot see). Requires >= 10 rows.
    2. *timedelta* (times.py:1340): dominant consecutive delta with its
       occurrence fraction over ALL deltas; accepted when > 50%.
    3. *start_end_chunks* (times.py:1245): first-N/last-N agreement,
       N from 1000 down to 3.

    Vote: all agree -> confidence 1.0; full_dataset -> 0.95; timedelta ->
    the mode fraction; progressive-only -> 0.70; otherwise the (low) mode
    fraction is surfaced so the sanitizer's <=0.5 gate raises a user-visible
    error.

    Scale note: deltas are computed per calendar-day segment (window
    partitioned by date), not over one global sort — fully parallel, at the
    cost of ignoring one boundary delta per day, which cannot move a >50%
    mode on any non-trivial series. The progressive samples are distributed
    TakeOrderedAndProject head/tail reads, <= 1000 rows each."""
    ts = df.select(F.col(ts_col)).filter(F.col(ts_col).isNotNull())
    w = Window.partitionBy(F.to_date(ts_col)).orderBy(ts_col)
    delta_counts = (
        ts.withColumn("_d", F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(F.lag(ts_col).over(w)))
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
    mode_d, frac = int(mode["_d"]), mode["count"] / total
    alts = [(int(r["_d"]), int(r["count"])) for r in top[1:]]

    stats = ts.agg(
        F.count(F.lit(1)).alias("n"), F.min(ts_col).alias("lo"), F.max(ts_col).alias("hi")
    ).collect()[0]
    n = int(stats["n"])
    span = int((stats["hi"] - stats["lo"]).total_seconds()) if n > 1 else 0
    fullset = (
        mode_d if (n >= 10 and frac == 1.0 and span == (n - 1) * mode_d) else None
    )

    head = [r[0] for r in ts.orderBy(ts_col).limit(1000).collect()]
    tail = [r[0] for r in ts.orderBy(F.desc(ts_col)).limit(1000).collect()][::-1]
    progressive = _progressive_freq(head, tail, n)
    timedelta = mode_d if frac > 0.5 else None

    if fullset is not None and fullset == timedelta == progressive:
        return FrequencyResult(mode_d, 1.0, total, alts, "all_methods_agree")
    if fullset is not None:
        return FrequencyResult(fullset, 0.95, total, alts, "full_dataset")
    if timedelta is not None:
        return FrequencyResult(mode_d, frac, total, alts, "timedelta")
    if progressive is not None:
        return FrequencyResult(progressive, 0.70, total, alts, "start_end_chunks")
    # no method confident: surface the mode with its (low) fraction so the
    # sanitizer's gate raises with the observed coverage
    return FrequencyResult(mode_d, frac, total, alts, None)


def dedup_keep_last(df: DataFrame, ts_col: str, order_col: str | None = None) -> DataFrame:
    """Duplicate timestamps keep the LAST occurrence (times.py:1409-1457).
    'Last' means arrival order: pass ``order_col`` (e.g. a file/row sequence —
    the CSV readers pass their source order). The monotonic-id fallback is
    best-effort only: it is used purely as an ORDERING within the dedup
    window (never as a join key), so a shuffle-retry can at worst change
    WHICH duplicate wins — the same ambiguity the reference has when files
    carry no sequence column — and can never mis-attach data across rows."""
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
