"""Correction functions: set-to limits, offset removal, wind-direction
offset, event flags.

Reference (/root/reference/diive/preprocessing/corrections/):
- setto_threshold / setto_value / set_exact_values_to_missing
  (setto.py:20-160): clamp values beyond a threshold to the threshold,
  replace exact sentinel values with null.
- remove_relativehumidity_offset (offsetcorrection.py:130): shift so values
  never exceed 100 %, clamp negatives to 0.
- remove_nighttime_zero_offset (offsetcorrection.py:296): per-day nighttime
  median subtracted (daily offset broadcast back to high-res rows), negatives
  clamped.
- WindDirOffset (offsetcorrection.py:372): add a constant degree offset
  modulo 360.
- Event -> flag (diive/events/event.py:164-189): 0/1 column flagging rows
  inside [start, end] event windows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def setto_threshold(col: Column, threshold: float, mode: str) -> Column:
    """Clamp values beyond threshold TO the threshold (setto.py:20)."""
    if mode == "max":
        return F.when(col > threshold, F.lit(threshold)).otherwise(col)
    if mode == "min":
        return F.when(col < threshold, F.lit(threshold)).otherwise(col)
    raise ValueError(mode)


def set_exact_values_to_missing(col: Column, values: list[float]) -> Column:
    return F.when(col.isin(values), F.lit(None)).otherwise(col)


def remove_relativehumidity_offset(col: Column) -> Column:
    """Shift down by the amount the series exceeds 100 %, clamp at 0
    (offsetcorrection.py:130): offset = max(series) - 100 where > 100."""
    over = F.max(F.when(col > 100, col - 100)).over(_all())
    shifted = F.when(over.isNotNull(), col - over).otherwise(col)
    return F.greatest(shifted, F.lit(0.0))


def _all():
    from pyspark.sql import Window

    return Window.partitionBy()


def remove_nighttime_zero_offset(
    df: DataFrame, ts_col: str, value_col: str, nighttime_col: str,
    out_col: str | None = None,
) -> DataFrame:
    """Subtract each day's nighttime median from all of that day's records
    (groupBy(date) offset agg + broadcast join-back, offsetcorrection.py:296);
    negatives clamped to 0."""
    out_col = out_col or f"{value_col}_corrected"
    day = F.date_trunc("day", F.col(ts_col)).alias("_day")
    offsets = (
        df.filter(F.col(nighttime_col) == 1)
        .groupBy(day)
        .agg(F.percentile(F.col(value_col), F.lit(0.5)).alias("_offset"))
    )
    joined = df.withColumn("_day", F.date_trunc("day", F.col(ts_col))).join(
        F.broadcast(offsets), "_day", "left"
    )
    corrected = F.greatest(
        F.col(value_col) - F.coalesce(F.col("_offset"), F.lit(0.0)), F.lit(0.0)
    )
    return joined.withColumn(out_col, corrected).drop("_day", "_offset")


def wind_direction_offset(col: Column, offset_deg: float) -> Column:
    return F.pmod(col + F.lit(offset_deg), F.lit(360.0))


def event_flag(ts: Column, events: list[tuple[str, str]]) -> Column:
    """0/1 flag for rows inside any [start, end] event window
    (event.py:164-189)."""
    cond = F.lit(False)
    for start, end in events:
        cond = cond | ts.between(F.lit(start).cast("timestamp"), F.lit(end).cast("timestamp"))
    return cond.cast("int")


def measurement_offset_from_replicate(
    df: DataFrame, value_col: str, replicate_col: str,
    out_col: str | None = None,
) -> DataFrame:
    """Remove the systematic offset between a sensor and its replicate
    (MeasurementOffsetFromReplicate, offsetcorrection.py:25): offset =
    median of (value - replicate) over rows where both exist, subtracted
    from the value column. One tiny global agg + a column expression."""
    out_col = out_col or f"{value_col}_corrected"
    diff = F.col(value_col) - F.col(replicate_col)
    offset = (
        df.filter(F.col(value_col).isNotNull() & F.col(replicate_col).isNotNull())
        .agg(F.percentile(diff, F.lit(0.5)).alias("_offset"))
    )
    return df.crossJoin(F.broadcast(offset)).withColumn(
        out_col, F.col(value_col) - F.coalesce(F.col("_offset"), F.lit(0.0))
    ).drop("_offset")
