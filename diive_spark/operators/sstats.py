"""Summary statistics + per-column profiling + histogram helpers.

Reference:
- ``sstats`` (/root/reference/diive/core/dfun/stats.py:332-509): ~30 summary
  stats for one series — span, counts/missing, mean/median/sd/CV/IQR,
  skew/kurtosis, lag-1 autocorrelation, mean absolute change, z-score
  outlier count, cumulative sum, linear trend slope, quantiles.
- ``percentiles101`` (diive/analysis/quantiles.py:20).
- ``Histogram`` (diive/analysis/histogram.py:19-130): counts with
  n_bins / uniques / Freedman-Diaconis binning, fringe trimming, peak bins.
- ``profile_dataframe`` (diive/analysis/profile.py): per-column profile of a
  wide frame.

All single-pass wide aggregations (one job per call); trend slope and lag-1
autocorrelation use closed-form moment sums so no second pass is needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sstats(df: DataFrame, ts_col: str, value_col: str,
           key_cols: list[str] | None = None) -> DataFrame:
    """One row of ~25 summary stats (stats.py:332-509) — per key when
    ``key_cols`` is given (one output row per series, every window and
    aggregation partitioned by key: no single-task stage). With no keys the
    lag-1/autocorr window is one partition — the reference semantics for a
    single series; pass keys for multi-series corpora."""
    keys = key_cols or []
    v = F.col(value_col)
    w = Window.partitionBy(*keys).orderBy(ts_col) if keys else Window.orderBy(ts_col)
    enriched = df.select(
        *keys,
        F.col(ts_col).alias("_ts"), v.alias("_v"),
        F.lag(v).over(w).alias("_v_prev"),
        F.unix_timestamp(F.col(ts_col)).cast("double").alias("_tsn"),
    )
    n = F.count("_v")
    mean = F.avg("_v")
    sd = F.stddev_samp("_v")
    # linear trend slope via closed-form least squares on (t, v)
    sxy = F.avg(F.col("_tsn") * F.col("_v")) - F.avg("_tsn") * F.avg("_v")
    sxx = F.avg(F.col("_tsn") * F.col("_tsn")) - F.avg("_tsn") * F.avg("_tsn")
    grouped = enriched.groupBy(*keys) if keys else enriched.groupBy()
    agg = grouped.agg(
        F.min("_ts").alias("startdate"),
        F.max("_ts").alias("enddate"),
        F.count(F.lit(1)).alias("period_rows"),
        n.alias("nvals"),
        (F.count(F.lit(1)) - n).alias("nmissing"),
        mean.alias("mean"),
        F.percentile(F.col("_v"), F.lit(0.5)).alias("median"),
        sd.alias("sd"),
        # nullif guards: zero mean / constant timestamps must yield null, not
        # an ANSI DIVIDE_BY_ZERO job failure
        (sd / F.nullif(mean, F.lit(0.0))).alias("cv"),
        F.min("_v").alias("min"),
        F.max("_v").alias("max"),
        (F.percentile(F.col("_v"), F.lit(0.75)) - F.percentile(F.col("_v"), F.lit(0.25))).alias("iqr"),
        F.percentile(F.col("_v"), F.lit(0.01)).alias("p01"),
        F.percentile(F.col("_v"), F.lit(0.05)).alias("p05"),
        F.percentile(F.col("_v"), F.lit(0.95)).alias("p95"),
        F.percentile(F.col("_v"), F.lit(0.99)).alias("p99"),
        F.skewness("_v").alias("skewness"),
        F.kurtosis("_v").alias("kurtosis"),
        F.corr(F.col("_v"), F.col("_v_prev")).alias("autocorr_lag1"),
        F.avg(F.abs(F.col("_v") - F.col("_v_prev"))).alias("mean_abs_change"),
        F.sum("_v").alias("sum"),
        (sxy / F.nullif(sxx, F.lit(0.0))).alias("trend_slope_per_sec"),
    )
    # z-score outlier count needs the per-series mean/sd first: window in a
    # subquery, then aggregate
    zw = Window.partitionBy(*keys) if keys else Window.partitionBy()
    zsub = enriched.select(
        *keys,
        F.when(
            F.abs(F.col("_v") - F.avg("_v").over(zw))
            > 3 * F.stddev_pop("_v").over(zw),
            1,
        ).otherwise(0).alias("_is_out")
    )
    zgrouped = zsub.groupBy(*keys) if keys else zsub.groupBy()
    zc = zgrouped.agg(F.sum("_is_out").alias("n_zscore3_outliers"))
    if keys:
        return agg.join(zc, on=keys)
    return agg.crossJoin(zc)


def percentiles101(df: DataFrame, value_col: str) -> DataFrame:
    """Percentiles 0..100 (quantiles.py:20)."""
    probs = [i / 100.0 for i in range(101)]
    pct = df.agg(F.percentile(F.col(value_col), F.array([F.lit(p) for p in probs])).alias("pv"))
    return pct.select(F.posexplode("pv").alias("percentile", "value"))


def histogram(
    df: DataFrame, value_col: str,
    method: str = "n_bins", n_bins: int = 10,
    trim_fringe_bins: bool = False,
) -> DataFrame:
    """Histogram with n_bins / uniques / Freedman-Diaconis binning
    (histogram.py:19-130). FD: bin width = 2*IQR/n^(1/3)."""
    v = F.col(value_col)
    if method == "uniques":
        out = df.groupBy(v.alias("bin_value")).agg(F.count(F.lit(1)).alias("counts"))
        return out.orderBy("bin_value")
    stats = df.agg(
        F.min(v).alias("lo"), F.max(v).alias("hi"), F.count(v).alias("n"),
        (F.percentile(v, F.lit(0.75)) - F.percentile(v, F.lit(0.25))).alias("iqr"),
    ).collect()[0]
    lo, hi = float(stats["lo"]), float(stats["hi"])
    if method == "fd":
        width = 2 * float(stats["iqr"]) / (stats["n"] ** (1 / 3))
        n_bins = max(1, int((hi - lo) / width)) if width > 0 else 1
    width = (hi - lo) / n_bins if hi > lo else 1.0
    b = F.least(F.floor((v - F.lit(lo)) / F.lit(width)), F.lit(n_bins - 1)).cast("int")
    counts = (
        df.filter(v.isNotNull())
        .groupBy(b.alias("bin"))
        .agg(F.count(F.lit(1)).alias("counts"))
    )
    # emit empty bins too (np.histogram contract)
    bins = df.sparkSession.range(n_bins).select(F.col("id").cast("int").alias("bin"))
    out = (
        bins.join(counts, "bin", "left")
        .withColumn("counts", F.coalesce("counts", F.lit(0)))
        .withColumn("bin_start", F.lit(lo) + F.col("bin") * F.lit(width))
    )
    if trim_fringe_bins:
        out = out.filter((F.col("bin") > 0) & (F.col("bin") < n_bins - 1))
    return out.orderBy("bin")


def peak_bins(hist_df: DataFrame, k: int = 3) -> DataFrame:
    """Top-k most-populated bins (histogram.py:79)."""
    return hist_df.orderBy(F.desc("counts")).limit(k)


def profile_dataframe(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Per-column profile of a wide frame (profile.py): count/missing/mean/
    sd/min/q25/median/q75/max per numeric column, long form."""
    numeric = [
        f.name for f in df.schema.fields
        if f.dataType.simpleString() in ("double", "float", "int", "bigint", "smallint")
        and (cols is None or f.name in cols)
    ]
    # project to the profiled columns FIRST (guide §2.3), then spread a
    # narrow input: exact percentiles buffer every value, so a single
    # unsplittable input file (1-2 row-group-bound scan tasks) serialises
    # the whole collection through one core — measured 57 s for 3 columns
    # of a 6M-row single-file lineitem at sf1, ~4 s once spread. The
    # shuffle moves only the profiled columns; inputs already wider than
    # the core count are untouched.
    df = df.select(*numeric)
    sc = df.sparkSession.sparkContext
    if df.rdd.getNumPartitions() < sc.defaultParallelism:
        df = df.repartition(sc.defaultParallelism)
    total = F.count(F.lit(1))
    rows = []
    aggs = [total.alias("_total")]
    for c in numeric:
        v = F.col(c)
        aggs += [
            F.count(v).alias(f"{c}__n"), F.avg(v).alias(f"{c}__mean"),
            F.stddev_samp(v).alias(f"{c}__sd"), F.min(v).alias(f"{c}__min"),
            # ONE array-form percentile per column: the exact percentile
            # aggregate buffers every (value, count) pair, so three
            # separate quartile aggregates built three independent
            # buffers over the same column (r8 measurement on a 6M-row
            # distinct-heavy column: 52 s -> 20 s with the shared
            # buffer). Identical exact values — same function.
            F.percentile(v, F.array(F.lit(0.25), F.lit(0.5),
                                    F.lit(0.75))).alias(f"{c}__q"),
            F.max(v).alias(f"{c}__max"),
        ]
    wide = df.agg(*aggs)
    structs = [
        F.struct(
            F.lit(c).alias("column"),
            F.col(f"{c}__n").alias("n"),
            (F.col("_total") - F.col(f"{c}__n")).alias("n_missing"),
            F.col(f"{c}__mean").cast("double").alias("mean"),
            F.col(f"{c}__sd").cast("double").alias("sd"),
            F.col(f"{c}__min").cast("double").alias("min"),
            F.col(f"{c}__q")[0].cast("double").alias("q25"),
            F.col(f"{c}__q")[1].cast("double").alias("median"),
            F.col(f"{c}__q")[2].cast("double").alias("q75"),
            F.col(f"{c}__max").cast("double").alias("max"),
        )
        for c in numeric
    ]
    return wide.select(F.explode(F.array(*structs)).alias("p")).select("p.*")


def approximate_entropy(
    df: DataFrame, value_col: str, m: int = 2, r: float | None = None,
    max_n: int = 2000,
) -> DataFrame:
    """Approximate entropy ApEn(m, r) — the reference's regularity metric
    (diive/core/dfun/stats.py:261-300), vectorized: phi(m) - phi(m+1) with
    Chebyshev tolerance r (default 0.2 * std), computed via numpy broadcast
    instead of the reference's per-pair Python loops.

    O(n^2) by definition: the series is truncated to the first ``max_n``
    non-null values (documented cap; diive runs it on single-site series).
    Runs as a single-group Arrow kernel — appropriate for rollup-tier series,
    not raw 10^12-row scans.
    """
    import numpy as np
    import pandas as pd

    def kernel(batches):
        vals = []
        for pdf in batches:
            vals.append(pdf[value_col].dropna().to_numpy(dtype=np.float64))
        s = np.concatenate(vals) if vals else np.empty(0)
        s = s[:max_n]
        n = len(s)
        if n < m + 2:
            yield pd.DataFrame({"apen": [float("nan")], "n_used": [n]})
            return
        tol = (0.2 * s.std()) if r is None else r

        def phi(mm: int) -> float:
            emb = np.lib.stride_tricks.sliding_window_view(s, mm)  # (n-mm+1, mm)
            # pairwise Chebyshev distances via broadcasting
            d = np.abs(emb[:, None, :] - emb[None, :, :]).max(axis=2)
            c = (d <= tol).mean(axis=1)
            return float(np.log(c).mean())

        yield pd.DataFrame({"apen": [phi(m) - phi(m + 1)], "n_used": [n]})

    return df.select(value_col).coalesce(1).mapInPandas(
        kernel, schema="apen double, n_used bigint"
    )
