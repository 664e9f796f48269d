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


def remove_relativehumidity_offset(
    df: DataFrame, ts_col: str, rh_col: str, out_col: str | None = None,
    key_cols: list[str] | None = None,
) -> DataFrame:
    """Day-resolved RH > 100 % offset correction (offsetcorrection.py:130,
    exact semantics): per-day mean of the exceeding values minus 100 is the
    day's offset; records on days without exceedances get the offset
    POSITIONALLY interpolated between the neighbouring offset-days' records
    (the reference's aggregated_as_hires + .interpolate() idiom), constant
    beyond the ends (ffill/bfill); all-days-clean means offset 0.
    Corrected = RH - offset, capped at 100 (no zero floor — faithful).

    One groupBy(date) + broadcast join + two running windows; appends
    ``out_col`` (default ``{rh_col}_corrected``). Pass ``key_cols`` for
    multi-series frames (windows partition per key; without it the running
    windows are global — single-series use only, like the reference)."""
    from pyspark.sql import Window

    keys = list(key_cols or [])
    out_col = out_col or f"{rh_col}_corrected"
    rh = F.col(rh_col)
    day = F.date_trunc("day", F.col(ts_col))
    offsets = (
        df.filter(rh > 100)
        .groupBy(*keys, day.alias("_day"))
        .agg((F.avg(rh) - 100.0).alias("_day_off"))
    )
    work = df.withColumn("_day", day).join(F.broadcast(offsets),
                                           [*keys, "_day"], "left")
    ow = (Window.partitionBy(*keys).orderBy(ts_col) if keys
          else Window.orderBy(ts_col))
    rn = F.row_number().over(ow).cast("double")
    work = work.withColumn("_rn", rn)
    fwd = ow.rowsBetween(Window.unboundedPreceding, 0)
    bwd = ow.rowsBetween(0, Window.unboundedFollowing)
    off = F.col("_day_off")
    pv = F.last(off, ignorenulls=True).over(fwd)
    pt = F.last(F.when(off.isNotNull(), F.col("_rn")),
                ignorenulls=True).over(fwd)
    nv = F.first(off, ignorenulls=True).over(bwd)
    nt = F.first(F.when(off.isNotNull(), F.col("_rn")),
                 ignorenulls=True).over(bwd)
    frac = (F.col("_rn") - pt) / F.nullif(nt - pt, F.lit(0.0))
    interp = (
        F.when(off.isNotNull(), off)
        .when(pv.isNotNull() & nv.isNotNull(),
              pv + (nv - pv) * F.coalesce(frac, F.lit(0.0)))
        .otherwise(F.coalesce(pv, nv))
    )
    corrected = F.least(rh - F.coalesce(interp, F.lit(0.0)), F.lit(100.0))
    return (
        work.withColumn(out_col, corrected)
        .drop("_day", "_day_off", "_rn")
    )


def _all():
    from pyspark.sql import Window

    return Window.partitionBy()


def remove_nighttime_zero_offset(
    df: DataFrame, ts_col: str, value_col: str, nighttime_col: str,
    out_col: str | None = None,
    clamp_negatives: bool = True,
    key_cols: list[str] | None = None,
) -> DataFrame:
    """Nighttime-zero offset removal, exact reference semantics
    (offsetcorrection.py:234 ``_nighttime_zero_offset``): the offset is the
    DAILY NIGHTTIME MEAN broadcast to every record of its day, positionally
    interpolated across days without nighttime data and any remainder
    filled with the MEDIAN of the per-record offsets; corrected = value −
    offset; nighttime records are then FORCED to exactly 0, and remaining
    (daytime) negatives are clamped to 0 unless ``clamp_negatives=False``.
    The day/night split comes from the caller's ``nighttime_col`` (the
    reference derives it from solar geometry — use
    solar.daytime_nighttime_flag)."""
    from pyspark.sql import Window

    keys = list(key_cols or [])
    out_col = out_col or f"{value_col}_corrected"
    v = F.col(value_col)
    day = F.date_trunc("day", F.col(ts_col))
    offsets = (
        df.filter(F.col(nighttime_col) == 1)
        .groupBy(*keys, day.alias("_day"))
        .agg(F.avg(v).alias("_day_off"))
    )
    work = df.withColumn("_day", day).join(F.broadcast(offsets),
                                           [*keys, "_day"], "left")
    ow = (Window.partitionBy(*keys).orderBy(ts_col) if keys
          else Window.orderBy(ts_col))
    rn = F.row_number().over(ow).cast("double")
    work = work.withColumn("_rn", rn)
    fwd = ow.rowsBetween(Window.unboundedPreceding, 0)
    bwd = ow.rowsBetween(0, Window.unboundedFollowing)
    off = F.col("_day_off")
    pv = F.last(off, ignorenulls=True).over(fwd)
    pt = F.last(F.when(off.isNotNull(), F.col("_rn")),
                ignorenulls=True).over(fwd)
    nv = F.first(off, ignorenulls=True).over(bwd)
    nt = F.first(F.when(off.isNotNull(), F.col("_rn")),
                 ignorenulls=True).over(bwd)
    frac = (F.col("_rn") - pt) / F.nullif(nt - pt, F.lit(0.0))
    interp = (
        F.when(off.isNotNull(), off)
        .when(pv.isNotNull() & nv.isNotNull(),
              pv + (nv - pv) * F.coalesce(frac, F.lit(0.0)))
        .otherwise(F.coalesce(pv, nv))
    )
    work = work.withColumn("_interp", interp)
    medw = Window.partitionBy(*keys) if keys else Window.partitionBy()
    med = F.percentile(F.col("_interp"), F.lit(0.5)).over(medw)
    offset_full = F.coalesce(F.col("_interp"), med, F.lit(0.0))
    corrected = v - offset_full
    corrected = F.when(F.col(nighttime_col) == 1, F.lit(0.0))         .otherwise(corrected)
    if clamp_negatives:
        corrected = F.greatest(corrected, F.lit(0.0))
    return (
        work.withColumn(out_col, corrected)
        .drop("_day", "_day_off", "_rn", "_interp")
    )


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
