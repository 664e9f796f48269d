"""Highest-quality flux analysis: day/night Hampel filtering + rolling
statistics of the surviving QCF-0 fluxes.

Reference: /root/reference/diive/flux/lowres/hqflux.py
(``analyze_highest_quality_flux``; plotting out of scope). Steps
mirrored (hqflux.py:125-330):

1. daytime/nighttime split from potential radiation (solar geometry);
2. Hampel outlier filter with separate day/night thresholds and the
   Papale double-differencing option; ``window_length=None`` auto-sizes
   to ``count/100`` records, minimum 13 (≈ 6 h at 30-min data);
3. per period (DAYTIME / NIGHTTIME): the filtered series, a centered
   rolling median over 10 % of the period's valid records
   (min_periods=1, positional over the period subset — exactly the
   reference's ``rolling`` on the sliced series), the period SD and the
   window size used;
4. a summary of totals / valid / outlier counts.

Engine shape: the daytime flag and Hampel run on the existing
distributed operators (functions/solar.daytime_nighttime_flag +
operators/outliers.flag_hampel); the per-period rolling median is a
bounded per-(key, period) Arrow kernel (the subset-positional window
cannot be a grid window). Returns ``(hqdf, summary_df)``.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from diive_spark.functions.solar import daytime_nighttime_flag
from diive_spark.operators.outliers import flag_hampel


def analyze_highest_quality_flux(
    df: DataFrame, key_cols: list[str], ts_col: str, flux_col: str, *,
    lat: float, lon: float, utc_offset: int, tier_seconds: int = 1800,
    window_length: int | None = None,
    n_sigma_daytime: float = 5.5, n_sigma_nighttime: float = 5.5,
    use_differencing: bool = True,
    max_distinct_lengths: int = 8,
) -> tuple[DataFrame, DataFrame]:
    """Returns (hqdf, summary). ``hqdf`` = one row per input record:
    (key..., ts, period DAYTIME/NIGHTTIME, FLAG 0/2, FLUX_FILTERED,
    ROLLING_MEDIAN, SD, WINSIZE); ``summary`` = per-key totals.

    ``window_length=None`` auto-sizes per key (count/100, min 13 — the
    reference rule). Because flag_hampel's slab/halo sizing needs one
    window length per pass, auto lengths are QUANTIZED onto a geometric
    grid of at most ``max_distinct_lengths`` values (each key rounded UP
    to the next grid point — a slightly wider Hampel window, the
    conservative direction), so the plan holds exactly ≤
    max_distinct_lengths union branches no matter how many keys exist;
    key→length routing is a broadcast join, never driver-built key
    literals."""
    import math

    import pandas as pd
    from pyspark.sql.types import (DoubleType, IntegerType, LongType,
                                   StringType, StructField, StructType)

    work = daytime_nighttime_flag(df, ts_col, lat, lon, utc_offset)
    if window_length is None:
        # the reference auto-sizes on the single series; per key here
        counts = work.groupBy(*key_cols).agg(F.count(flux_col).alias("_n"))
        wlmap = counts.select(
            *key_cols,
            F.greatest(F.floor(F.col("_n") / 100).cast("int"),
                       F.lit(13)).alias("WINSIZE_HAMPEL"))
        st = wlmap.agg(F.min("WINSIZE_HAMPEL").alias("lo"),
                       F.max("WINSIZE_HAMPEL").alias("hi"),
                       F.countDistinct("WINSIZE_HAMPEL").alias("nd")).first()
        if max_distinct_lengths < 1:
            raise ValueError("max_distinct_lengths must be >= 1")
        if st["nd"] > max_distinct_lengths and max_distinct_lengths == 1:
            # degenerate grid: route every key to the max auto length
            # (wider Hampel window — the conservative direction)
            wlmap = wlmap.withColumn("WINSIZE_HAMPEL", F.lit(int(st["hi"])))
        elif st["nd"] > max_distinct_lengths:
            lo, hi = float(st["lo"]), float(st["hi"])
            ratio = (hi / lo) ** (1.0 / (max_distinct_lengths - 1))
            # level index on the geometric grid, rounded up (1e-9 guards
            # float edge at exact grid points)
            lvl = F.ceil(F.log(F.col("WINSIZE_HAMPEL") / F.lit(lo))
                         / F.lit(math.log(ratio)) - F.lit(1e-9))
            wlmap = wlmap.withColumn(
                "WINSIZE_HAMPEL",
                F.least(F.ceil(F.lit(lo) * F.pow(F.lit(ratio), lvl))
                        .cast("int"), F.lit(int(hi))))
        work = work.join(F.broadcast(wlmap), on=key_cols)
        distinct = sorted(r[0] for r in
                          wlmap.select("WINSIZE_HAMPEL").distinct().collect())
    else:
        work = work.withColumn("WINSIZE_HAMPEL", F.lit(window_length))
        distinct = [window_length]

    flagged = None
    for wl in distinct:
        sub = (work if len(distinct) == 1
               else work.filter(F.col("WINSIZE_HAMPEL") == wl))
        part = flag_hampel(
            sub, key_cols, ts_col, flux_col, tier_seconds,
            window_length=wl, use_differencing=use_differencing,
            daytime_col="DAYTIME", n_sigma_daytime=n_sigma_daytime,
            n_sigma_nighttime=n_sigma_nighttime,
            flag_col="FLAG_HQ",
        )
        flagged = part if flagged is None else flagged.unionByName(part)

    flagged = flagged.withColumn(
        "period", F.when(F.col("DAYTIME") == 1,
                         F.lit("DAYTIME")).otherwise(F.lit("NIGHTTIME")))
    # engine Hampel flags missing records NULL; the reference's flag is 0
    # there — "not an outlier" — so filtered keeps (NaN) and valid counts
    # them, mirrored here
    not_outlier = F.col("FLAG_HQ").isNull() | (F.col("FLAG_HQ") != 2)
    flagged = flagged.withColumn(
        "FLUX_FILTERED", F.when(not_outlier, F.col(flux_col)))

    summary = flagged.groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias("total_records"),
        F.sum((F.col("FLAG_HQ").isNull()
               | (F.col("FLAG_HQ") == 0)).cast("long"))
        .alias("valid_records"),
        F.sum((F.col("FLAG_HQ") == 2).cast("long")).alias("outliers_found"),
        F.first("WINSIZE_HAMPEL").alias("window_length"),
    ).withColumn(
        "outlier_pct",
        F.col("outliers_found") / F.col("total_records") * 100.0)

    sel = flagged.select(*key_cols, F.col(ts_col).alias("_ts"), "period",
                         F.col("FLAG_HQ").alias("FLAG"), "FLUX_FILTERED")
    key_fields = [f for f in sel.schema.fields
                  if f.name in (*key_cols,)]
    schema = StructType(key_fields + [
        StructField("_ts", sel.schema["_ts"].dataType),
        StructField("period", StringType()),
        StructField("FLAG", IntegerType()),
        StructField("FLUX_FILTERED", DoubleType()),
        StructField("ROLLING_MEDIAN", DoubleType()),
        StructField("SD", DoubleType()),
        StructField("WINSIZE", LongType()),
    ])

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_ts").reset_index(drop=True)
        s = pdf["FLUX_FILTERED"]
        winsize = max(int(s.count() / 10), 1)
        pdf["ROLLING_MEDIAN"] = s.rolling(
            window=winsize, center=True, min_periods=1).median()
        pdf["SD"] = s.std()
        pdf["WINSIZE"] = np.int64(winsize)
        pdf["FLAG"] = pdf["FLAG"].astype("Int32")
        return pdf[[f.name for f in schema.fields]]

    hqdf = sel.groupBy(*key_cols, "period").applyInPandas(
        lambda _, pdf: kernel(pdf), schema=schema)
    return hqdf.withColumnRenamed("_ts", ts_col), summary
