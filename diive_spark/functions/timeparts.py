"""Timestamp part vectorization, season labels, timestamp-convention shifts.

Reference semantics:
- ``vectorize_timestamps`` (/root/reference/diive/core/times/times.py:1049-1176):
  YEAR, SEASON(+sin/cos), MONTH(+sin/cos), WEEK(/53 cycle, +sin/cos),
  DOY(/365.25, +sin/cos), HOUR(+sin/cos), YEARMONTH=y*100+m,
  YEARDOY=y*1000+doy, YEARWEEK=y*100+w.
- Season labels (times.py:1179-1242): configurable month->season map,
  nullable int labels. Default: meteorological seasons
  (DJF=0, MAM=1, JJA=2, SON=3).
- ``convert_series_timestamp_to_middle`` (times.py:1734-1818): shift by
  ±freq/2 between START/MIDDLE/END conventions.
- FLUXNET timestamp format YYYYMMDDhhmm (times.py:485-512).

All pure column expressions.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SEASONS = {12: 0, 1: 0, 2: 0, 3: 1, 4: 1, 5: 1,
                   6: 2, 7: 2, 8: 2, 9: 3, 10: 3, 11: 3}

TWO_PI = 2 * math.pi


def _cyc(val: Column, period: float, name: str) -> list[Column]:
    return [
        F.sin(val * TWO_PI / period).alias(f"{name}_sin"),
        F.cos(val * TWO_PI / period).alias(f"{name}_cos"),
    ]


def season_expr(ts: Column, season_map: dict[int, int] | None = None) -> Column:
    m = season_map or DEFAULT_SEASONS
    expr = None
    for month, season in m.items():
        cond = F.month(ts) == month
        expr = F.when(cond, season) if expr is None else expr.when(cond, season)
    return expr.cast("int")


def vectorize_timestamps(df: DataFrame, ts_col: str) -> DataFrame:
    """Append the full reference timepart vector (times.py:1049-1176)."""
    ts = F.col(ts_col)
    year, month = F.year(ts), F.month(ts)
    week, doy, hour = F.weekofyear(ts), F.dayofyear(ts), F.hour(ts)
    season = season_expr(ts)
    cols = [
        year.alias("YEAR"), season.alias("SEASON"), month.alias("MONTH"),
        week.alias("WEEK"), doy.alias("DOY"), hour.alias("HOUR"),
        *_cyc(season.cast("double"), 4.0, "SEASON"),
        *_cyc(month.cast("double"), 12.0, "MONTH"),
        *_cyc(week.cast("double"), 53.0, "WEEK"),
        *_cyc(doy.cast("double"), 365.25, "DOY"),
        *_cyc(hour.cast("double"), 24.0, "HOUR"),
        (year * 100 + month).alias("YEARMONTH"),
        (year * 1000 + doy).alias("YEARDOY"),
        (year * 100 + week).alias("YEARWEEK"),
    ]
    return df.select("*", *cols)


def shift_timestamp_convention(
    df: DataFrame, ts_col: str, freq_seconds: int,
    from_convention: str, to_convention: str,
) -> DataFrame:
    """Shift between START/MIDDLE/END interval conventions by ±freq/2 or
    ±freq (times.py:1734-1818). The convention is a column contract here,
    not index metadata."""
    offsets = {"start": 0.0, "middle": 0.5, "end": 1.0}
    delta = (offsets[to_convention] - offsets[from_convention]) * freq_seconds
    return df.withColumn(
        ts_col, F.timestamp_seconds(F.unix_timestamp(F.col(ts_col)) + F.lit(delta))
    )


def insert_timestamp_columns(df: DataFrame, ts_col: str, freq_seconds: int,
                             convention: str = "end") -> DataFrame:
    """Materialize TIMESTAMP_START/MIDDLE/END columns from one timestamp +
    its convention (times.py:1520-1643)."""
    base = F.unix_timestamp(F.col(ts_col)).cast("double")
    start = {"start": base, "middle": base - freq_seconds / 2, "end": base - freq_seconds}[convention]
    return (
        df.withColumn("TIMESTAMP_START", F.timestamp_seconds(start))
        .withColumn("TIMESTAMP_MIDDLE", F.timestamp_seconds(start + freq_seconds / 2))
        .withColumn("TIMESTAMP_END", F.timestamp_seconds(start + freq_seconds))
    )


def format_timestamp_fluxnet(ts: Column) -> Column:
    """FLUXNET YYYYMMDDhhmm string (times.py:485-512)."""
    return F.date_format(ts, "yyyyMMddHHmm")
