"""Tier rollups, cascades, gap machinery, fills, first-wave screening/stat singles and the streaming-rollup certification gate.

Split from the monolithic queries.py catalog; registration order is
preserved by the package __init__ importing sections in the original
sequence. Conventions (aliasing, _r6 rounding) in queries._shared.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401

from diive_spark.operators import gapfill, grid, outliers, resample  # noqa: F401

from ._shared import QUERIES, ORACLES, _hourly_gridded, _r6, _t  # noqa: F401

# ---------------------------------------------------------------------------
# tier rollups / continuous aggregates
# ---------------------------------------------------------------------------

def q_rollup_1m(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    r = resample.rollup(ev, "ts", ["value"], "1m", key_cols=["event_type"])
    return r.select(
        "event_type", "window_end",
        F.col("value_cnt").alias("cnt"),
        _r6("value_sum").alias("sum_v"),
        _r6("value_mean").alias("mean_v"),
        _r6("value_min").alias("min_v"),
        _r6("value_max").alias("max_v"),
    )


SQL_ROLLUP_1M = """
SELECT event_type,
       date_trunc('minute', ts) + INTERVAL 1 MINUTE AS window_end,
       count(value) AS cnt,
       round(1e-9 + sum(value), 6) AS sum_v,
       round(1e-9 + avg(value), 6) AS mean_v,
       round(1e-9 + min(value), 6) AS min_v,
       round(1e-9 + max(value), 6) AS max_v
FROM events GROUP BY 1, 2
"""


def q_rollup_1h_gate90(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    r = resample.rollup(ev, "ts", ["value"], "1h", key_cols=["event_type"],
                        mincounts_perc=0.9)
    return r.select(
        "event_type", "window_end",
        F.col("value_cnt").alias("cnt"),
        _r6("value_mean").alias("mean_v"),
    )


SQL_ROLLUP_1H_GATE90 = """
WITH agg AS (
  SELECT event_type,
         date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
         count(value) AS cnt, round(1e-9 + avg(value), 6) AS mean_v
  FROM events GROUP BY 1, 2
)
SELECT event_type, window_end, cnt, mean_v
FROM (SELECT *, max(cnt) OVER (PARTITION BY event_type) AS maxcnt FROM agg)
WHERE cnt >= greatest(1, floor(maxcnt * 0.9))
"""


def q_cascade_1d(spark, sf_dir):
    """1d tier composed from 1m partials — the oracle aggregates raw directly,
    so this checks partial/final composition against a one-shot SQL agg."""
    ev = _t(spark, sf_dir, "events")
    t1m = resample.rollup(ev, "ts", ["value"], "1m", key_cols=["event_type"])
    t1h = resample.reaggregate(t1m, "1h", ["value"], key_cols=["event_type"])
    t1d = resample.reaggregate(t1h, "1d", ["value"], key_cols=["event_type"])
    return t1d.select(
        "event_type",
        F.col("window_start").alias("day"),
        F.col("value_cnt").alias("cnt"),
        _r6("value_sum").alias("sum_v"),
        _r6("value_mean").alias("mean_v"),
        _r6("value_min").alias("min_v"),
        _r6("value_max").alias("max_v"),
    )


SQL_CASCADE_1D = """
SELECT event_type, date_trunc('day', ts) AS day,
       count(value) AS cnt,
       round(1e-9 + sum(value), 6) AS sum_v,
       round(1e-9 + avg(value), 6) AS mean_v,
       round(1e-9 + min(value), 6) AS min_v,
       round(1e-9 + max(value), 6) AS max_v
FROM events GROUP BY 1, 2
"""


def q_daily_agg_gate(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    d = resample.resample_to_daily_agg(ev, "ts", "value", agg="mean",
                                       mincounts_perc=0.8, key_cols=["event_type"])
    return d.select("event_type", "day", "n_vals", _r6("agg_value").alias("mean_v"))


SQL_DAILY_AGG_GATE = """
WITH agg AS (
  SELECT event_type, date_trunc('day', ts) AS day,
         count(value) AS n_vals, round(1e-9 + avg(value), 6) AS mean_v
  FROM events GROUP BY 1, 2
)
SELECT event_type, day, n_vals, mean_v
FROM (SELECT *, max(n_vals) OVER (PARTITION BY event_type) AS maxc FROM agg)
WHERE n_vals >= greatest(1, floor(maxc * 0.8))
"""


def q_monthly_matrix_ranks(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    long = resample.resample_to_monthly_agg_matrix(o, "o_orderdate", "o_totalprice", "mean")
    long = long.withColumn("agg_value", _r6("agg_value"))
    w = Window.partitionBy("month").orderBy(F.desc("agg_value"))
    return long.withColumn("rnk", F.dense_rank().over(w).cast("bigint"))


SQL_MONTHLY_MATRIX_RANKS = """
WITH m AS (
  SELECT year(o_orderdate) AS year, month(o_orderdate) AS month,
         round(1e-9 + avg(o_totalprice), 6) AS agg_value
  FROM orders GROUP BY 1, 2
)
SELECT year, month, agg_value,
       CAST(dense_rank() OVER (PARTITION BY month ORDER BY agg_value DESC) AS BIGINT) AS rnk
FROM m
"""


def q_diel_cycle(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    d = resample.diel_cycle(ev.withColumn("ts", F.date_trunc("hour", "ts")), "ts", "value",
                            mincounts=1)
    return d.select(
        "hour",
        F.col("n_vals").alias("cnt"),
        _r6("mean").alias("mean_v"),
        _r6("std").alias("std_v"),
        _r6("median").alias("median_v"),
        _r6("q25").alias("q25_v"),
        _r6("q75").alias("q75_v"),
        _r6("min").alias("min_v"),
        _r6("max").alias("max_v"),
    )


SQL_DIEL_CYCLE = """
SELECT hour(ts) AS hour, count(value) AS cnt,
       round(1e-9 + avg(value), 6) AS mean_v,
       round(1e-9 + stddev_samp(value), 6) AS std_v,
       round(1e-9 + quantile_cont(value, 0.5), 6) AS median_v,
       round(1e-9 + quantile_cont(value, 0.25), 6) AS q25_v,
       round(1e-9 + quantile_cont(value, 0.75), 6) AS q75_v,
       round(1e-9 + min(value), 6) AS min_v,
       round(1e-9 + max(value), 6) AS max_v
FROM events GROUP BY 1
"""



def q_gap_table_1h(spark, sf_dir):
    """Gap detection over the hourly grid, with a SCALE-LAW carve: events
    in epoch-hours where floor(epoch/3600) % 101 == 7 are dropped before
    gridding, so ~1% of interior hours are guaranteed-empty at ANY data
    density. At sf0.01 the natural sparsity adds more gaps; at sf1 the
    densified corpus would otherwise have none (r6 finding: both engines
    agreed on 0 rows — a vacuous pass). The carve is a pure column
    predicate replayed identically by the oracle."""
    ev = _t(spark, sf_dir, "events").filter(
        F.pmod(F.floor(F.unix_timestamp("ts") / 3600), F.lit(101)) != 7)
    r = resample.rollup(ev, "ts", ["value"], "1h", key_cols=["event_type"])
    g = grid.gap_table(grid.gridded(r, "1h", ["event_type"]),
                       ["event_type"], "value_cnt", tier="1h")
    return g.select("event_type", "gap_start", "gap_end", "gap_length")


SQL_GAP_TABLE_1H = """
WITH agg AS (
  SELECT event_type, date_trunc('hour', ts) AS window_start, count(*) AS cnt
  FROM events
  WHERE CAST(floor(epoch(ts) / 3600) AS BIGINT) % 101 <> 7
  GROUP BY 1, 2
),
bounds AS (SELECT min(window_start) AS lo, max(window_start) AS hi FROM agg),
grid AS (
  SELECT e.event_type, g.window_start
  FROM (SELECT DISTINCT event_type FROM agg) e
  CROSS JOIN (SELECT unnest(generate_series((SELECT lo FROM bounds),
                                            (SELECT hi FROM bounds),
                                            INTERVAL 1 HOUR)) AS window_start) g
),
j AS (
  SELECT g.event_type, g.window_start, a.cnt,
         count(a.cnt) OVER (PARTITION BY g.event_type ORDER BY g.window_start) AS run
  FROM grid g LEFT JOIN agg a ON a.event_type = g.event_type AND a.window_start = g.window_start
)
SELECT event_type, min(window_start) AS gap_start, max(window_start) AS gap_end,
       count(*) AS gap_length
FROM j WHERE cnt IS NULL GROUP BY event_type, run
"""


def q_interp_linear_1h(spark, sf_dir):
    g = _hourly_gridded(spark, sf_dir).select(
        "event_type", "window_start", "value_mean"
    )
    filled = gapfill.linear_interpolation(
        g, ["event_type"], "window_start", "value_mean", limit=3
    )
    return filled.select(
        "event_type", "window_start",
        _r6("filled").alias("filled_v"),
        F.col("fill_flag").cast("int").alias("fill_flag"),
    )


SQL_INTERP_LINEAR_1H = """
WITH agg AS (
  SELECT event_type, date_trunc('hour', ts) AS window_start, avg(value) AS mean_v
  FROM events GROUP BY 1, 2
),
bounds AS (SELECT min(window_start) AS lo, max(window_start) AS hi FROM agg),
grid AS (
  SELECT e.event_type, g.window_start
  FROM (SELECT DISTINCT event_type FROM agg) e
  CROSS JOIN (SELECT unnest(generate_series((SELECT lo FROM bounds),
                                            (SELECT hi FROM bounds),
                                            INTERVAL 1 HOUR)) AS window_start) g
),
j AS (
  SELECT g.event_type, g.window_start, a.mean_v,
         CAST(epoch(g.window_start) AS DOUBLE) AS tsn,
         count(a.mean_v) OVER w_prev AS run
  FROM grid g LEFT JOIN agg a ON a.event_type = g.event_type AND a.window_start = g.window_start
  WINDOW w_prev AS (PARTITION BY g.event_type ORDER BY g.window_start
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
k AS (
  SELECT *,
         last_value(mean_v IGNORE NULLS) OVER w_prev AS prev_v,
         last_value(CASE WHEN mean_v IS NOT NULL THEN tsn END IGNORE NULLS) OVER w_prev AS prev_t,
         first_value(mean_v IGNORE NULLS) OVER w_next AS next_v,
         first_value(CASE WHEN mean_v IS NOT NULL THEN tsn END IGNORE NULLS) OVER w_next AS next_t,
         sum(CASE WHEN mean_v IS NULL THEN 1 ELSE 0 END)
             OVER (PARTITION BY event_type, run) AS gap_len
  FROM j
  WINDOW w_prev AS (PARTITION BY event_type ORDER BY window_start
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         w_next AS (PARTITION BY event_type ORDER BY window_start
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT event_type, window_start,
       round(1e-9 + CASE WHEN mean_v IS NOT NULL THEN mean_v
                  WHEN gap_len <= 3 AND prev_v IS NOT NULL AND next_v IS NOT NULL
                  THEN prev_v + (next_v - prev_v) * ((tsn - prev_t) / (next_t - prev_t))
             END, 6) AS filled_v,
       CAST(CASE WHEN mean_v IS NOT NULL THEN 0
                 WHEN gap_len <= 3 AND prev_v IS NOT NULL AND next_v IS NOT NULL THEN 1
            END AS INTEGER) AS fill_flag
FROM k
"""


# ---------------------------------------------------------------------------
# outlier flags
# ---------------------------------------------------------------------------

def q_zscore_outliers(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    f = outliers.flag_zscore(ev, ["event_type"], "value", thres_zscore=2.5)
    return f.filter(F.col("FLAG_ZSCORE_TEST") == 2).select(
        "event_id", "event_type", _r6("value").alias("value_v")
    )


SQL_ZSCORE_OUTLIERS = """
SELECT event_id, event_type, round(1e-9 + value, 6) AS value_v
FROM (
  SELECT *, abs((value - avg(value) OVER (PARTITION BY event_type))
                / nullif(stddev_pop(value) OVER (PARTITION BY event_type), 0)) AS z
  FROM events
) WHERE z > 2.5
"""


def q_abs_limits(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    f = outliers.flag_absolute_limits(ev, "value", minval=-50.0, maxval=50.0)
    return f.select(
        "event_id",
        F.col("FLAG_ABSLIM_TEST").cast("int").alias("flag"),
    )


SQL_ABS_LIMITS = """
SELECT event_id,
       CAST(CASE WHEN value IS NULL THEN NULL
                 WHEN value < -50.0 OR value > 50.0 THEN 2 ELSE 0 END AS INTEGER) AS flag
FROM events
"""


def q_trim_low(spark, sf_dir):
    # trim_limit=0.5 flags a small non-empty set at every gated scale factor
    # (synthetic event values are strictly positive); event_id tie-break keeps
    # the equal-count top trim deterministic across engines.
    ev = _t(spark, sf_dir, "events")
    f = outliers.flag_trim_low(
        ev, ["event_type"], "value", trim_limit=0.5, tiebreak_cols=["event_id"]
    )
    return f.filter(F.col("FLAG_TRIMLOW_TEST") == 2).select(
        "event_id", "event_type", _r6("value").alias("value_v")
    )


SQL_TRIM_LOW = """
WITH nn AS (
  SELECT event_id, event_type, value,
         sum(CASE WHEN value < 0.5 THEN 1 ELSE 0 END)
             OVER (PARTITION BY event_type) AS n_below,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY value DESC, event_id ASC) AS rk
  FROM events WHERE value IS NOT NULL
)
SELECT event_id, event_type, round(1e-9 + value, 6) AS value_v
FROM nn WHERE value < 0.5 OR rk <= n_below
"""


# ---------------------------------------------------------------------------
# analytics: stats / percentiles / histogram / correlation / time-since
# ---------------------------------------------------------------------------

def q_sstats(spark, sf_dir):
    """Summary stats via moment sums (skew/kurt computed manually so both
    engines use identical formulas — diive sstats, core/dfun/stats.py:332)."""
    ev = _t(spark, sf_dir, "events")
    v = F.col("value")
    agg = ev.agg(
        F.count(v).alias("n"),
        _r6(F.avg(v)).alias("mean_v"),
        _r6(F.stddev_samp(v)).alias("sd_v"),
        _r6(F.min(v)).alias("min_v"),
        _r6(F.percentile(v, F.lit(0.05))).alias("p05"),
        _r6(F.percentile(v, F.lit(0.25))).alias("p25"),
        _r6(F.percentile(v, F.lit(0.5))).alias("median_v"),
        _r6(F.percentile(v, F.lit(0.75))).alias("p75"),
        _r6(F.percentile(v, F.lit(0.95))).alias("p95"),
        _r6(F.max(v)).alias("max_v"),
        F.sum(v).alias("_s1"),
        F.sum(v * v).alias("_s2"),
        F.sum(v * v * v).alias("_s3"),
        F.count(v).cast("double").alias("_n"),
    )
    m1 = F.col("_s1") / F.col("_n")
    m2 = F.col("_s2") / F.col("_n") - m1 * m1
    m3 = F.col("_s3") / F.col("_n") - 3 * m1 * F.col("_s2") / F.col("_n") + 2 * m1 * m1 * m1
    return agg.withColumn("skew_m", _r6(m3 / F.pow(m2, 1.5))).drop("_s1", "_s2", "_s3", "_n")


SQL_SSTATS = """
WITH a AS (
  SELECT count(value) AS n,
         round(1e-9 + avg(value), 6) AS mean_v,
         round(1e-9 + stddev_samp(value), 6) AS sd_v,
         round(1e-9 + min(value), 6) AS min_v,
         round(1e-9 + quantile_cont(value, 0.05), 6) AS p05,
         round(1e-9 + quantile_cont(value, 0.25), 6) AS p25,
         round(1e-9 + quantile_cont(value, 0.5), 6) AS median_v,
         round(1e-9 + quantile_cont(value, 0.75), 6) AS p75,
         round(1e-9 + quantile_cont(value, 0.95), 6) AS p95,
         round(1e-9 + max(value), 6) AS max_v,
         sum(value) AS s1, sum(value*value) AS s2, sum(value*value*value) AS s3,
         CAST(count(value) AS DOUBLE) AS nn
  FROM events
)
SELECT n, mean_v, sd_v, min_v, p05, p25, median_v, p75, p95, max_v,
       round(1e-9 + (s3/nn - 3*(s1/nn)*(s2/nn) + 2*(s1/nn)*(s1/nn)*(s1/nn))
             / ((s2/nn - (s1/nn)*(s1/nn)) ^ 1.5), 6) AS skew_m
FROM a
"""


def q_percentiles(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    probs = [i / 20.0 for i in range(21)]
    pct = ev.agg(
        F.percentile(F.col("value"), F.array([F.lit(p) for p in probs])).alias("pv")
    )
    return pct.select(F.posexplode("pv").alias("i", "pv")).select(
        (F.col("i") * 5).cast("bigint").alias("pct"), _r6("pv").alias("pv")
    )


_PROBS_SQL = ", ".join(f"{i / 20.0:.2f}" for i in range(21))
SQL_PERCENTILES = f"""
WITH q AS (SELECT quantile_cont(value, [{_PROBS_SQL}]) AS qs FROM events)
SELECT CAST((i - 1) * 5 AS BIGINT) AS pct, round(1e-9 + qs[i], 6) AS pv
FROM q, (SELECT unnest(generate_series(1, 21)) AS i) g
"""


def q_histogram(spark, sf_dir):
    """Equal-width histogram, 20 bins over [-100, 100) via the floor formula
    (diive Histogram, analysis/histogram.py:19)."""
    ev = _t(spark, sf_dir, "events")
    b = F.floor((F.col("value") - F.lit(-100.0)) / F.lit(10.0)).cast("bigint")
    return (
        ev.filter(F.col("value").between(-100.0, 99.999999))
        .groupBy(b.alias("bin")).agg(F.count(F.lit(1)).alias("cnt"))
    )


SQL_HISTOGRAM = """
SELECT CAST(floor((value - (-100.0)) / 10.0) AS BIGINT) AS bin, count(*) AS cnt
FROM events WHERE value BETWEEN -100.0 AND 99.999999
GROUP BY 1
"""


def q_daily_correlation(spark, sf_dir):
    """Per-day Pearson r between value and time-of-day hour (diive
    DailyCorrelation, analysis/correlation.py:106)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(_r6(F.corr(F.col("value"), F.hour("ts").cast("double"))).alias("corr_v"),
             F.count(F.lit(1)).alias("cnt"))
    )


SQL_DAILY_CORRELATION = """
SELECT date_trunc('day', ts) AS day,
       round(1e-9 + corr(value, CAST(hour(ts) AS DOUBLE)), 6) AS corr_v,
       count(*) AS cnt
FROM events GROUP BY 1
"""


def q_time_since(spark, sf_dir):
    """Records since the value was last >= 30 (diive TimeSince run-length
    counter, variables/temporal.py:139) over the hourly mean series."""
    g = _hourly_gridded(spark, sf_dir).select("event_type", "window_start", "value_mean")
    w = Window.partitionBy("event_type").orderBy("window_start")
    inside = (F.col("value_mean") >= 30.0).cast("int")
    runid = F.sum(F.coalesce(inside, F.lit(0))).over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    )
    out = g.withColumn("_run", runid)
    w2 = Window.partitionBy("event_type", "_run").orderBy("window_start")
    return out.select(
        "event_type", "window_start",
        (F.row_number().over(w2) - 1).cast("bigint").alias("time_since"),
    )


SQL_TIME_SINCE = """
WITH agg AS (
  SELECT event_type, date_trunc('hour', ts) AS window_start, avg(value) AS mean_v
  FROM events GROUP BY 1, 2
),
bounds AS (SELECT min(window_start) AS lo, max(window_start) AS hi FROM agg),
grid AS (
  SELECT e.event_type, g.window_start
  FROM (SELECT DISTINCT event_type FROM agg) e
  CROSS JOIN (SELECT unnest(generate_series((SELECT lo FROM bounds),
                                            (SELECT hi FROM bounds),
                                            INTERVAL 1 HOUR)) AS window_start) g
),
j AS (
  SELECT g.event_type, g.window_start,
         sum(CASE WHEN a.mean_v >= 30.0 THEN 1 ELSE 0 END)
             OVER (PARTITION BY g.event_type ORDER BY g.window_start
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
  FROM grid g LEFT JOIN agg a ON a.event_type = g.event_type AND a.window_start = g.window_start
)
SELECT event_type, window_start,
       CAST(row_number() OVER (PARTITION BY event_type, run ORDER BY window_start) - 1
            AS BIGINT) AS time_since
FROM j
"""


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

QUERIES.update({
    "rollup_1m": q_rollup_1m,
    "rollup_1h_gate90": q_rollup_1h_gate90,
    "cascade_1d": q_cascade_1d,
    "daily_agg_gate": q_daily_agg_gate,
    "monthly_matrix_ranks": q_monthly_matrix_ranks,
    "diel_cycle": q_diel_cycle,
    "gap_table_1h": q_gap_table_1h,
    "interp_linear_1h": q_interp_linear_1h,
    "zscore_outliers": q_zscore_outliers,
    "abs_limits": q_abs_limits,
    "trim_low": q_trim_low,
    "sstats": q_sstats,
    "percentiles": q_percentiles,
    "histogram": q_histogram,
    "daily_correlation": q_daily_correlation,
    "time_since": q_time_since,
})

ORACLES.update({
    "rollup_1m": SQL_ROLLUP_1M,
    "rollup_1h_gate90": SQL_ROLLUP_1H_GATE90,
    "cascade_1d": SQL_CASCADE_1D,
    "daily_agg_gate": SQL_DAILY_AGG_GATE,
    "monthly_matrix_ranks": SQL_MONTHLY_MATRIX_RANKS,
    "diel_cycle": SQL_DIEL_CYCLE,
    "gap_table_1h": SQL_GAP_TABLE_1H,
    "interp_linear_1h": SQL_INTERP_LINEAR_1H,
    "zscore_outliers": SQL_ZSCORE_OUTLIERS,
    "abs_limits": SQL_ABS_LIMITS,
    "trim_low": SQL_TRIM_LOW,
    "sstats": SQL_SSTATS,
    "percentiles": SQL_PERCENTILES,
    "histogram": SQL_HISTOGRAM,
    "daily_correlation": SQL_DAILY_CORRELATION,
    "time_since": SQL_TIME_SINCE,
})





# ---------------------------------------------------------------------------
# streaming rollup certification (availableNow drain == batch rollup)
# ---------------------------------------------------------------------------

def q_rollup_stream_1m(spark, sf_dir):
    """Structured-Streaming tier-0 rollup (streaming/rollup_stream.py) run
    to completion with an availableNow trigger over the events parquet and
    returned as a batch DataFrame — certifying §2.9's batch==stream
    contract in the driver record: the watermarked tumbling-window
    streaming aggregate must value-match the plain batch SQL rollup."""
    import os
    import tempfile
    import uuid
    from diive_spark.streaming.rollup_stream import (run_available_now,
                                                     streaming_rollup)
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    # the file-stream source needs a DIRECTORY; expose the single parquet
    # through a temp dir symlink
    src_dir = tempfile.mkdtemp(prefix="gate_stream_src_")
    os.symlink(f"{sf_dir}/events.parquet",
               os.path.join(src_dir, "events.parquet"))
    sdf = streaming_rollup(
        spark, src_dir, schema, "ts", ["value"], "1m",
        key_cols=["event_type"])
    name = f"gate_stream_{uuid.uuid4().hex[:12]}"
    out = run_available_now(sdf, tempfile.mkdtemp(prefix="gate_stream_ckpt_"),
                            query_name=name)
    return out.select(
        "event_type",
        # back to NTZ so the schema matches the batch oracle (UTC session:
        # identical wall-clock)
        F.col("window_end").cast("timestamp_ntz").alias("window_end"),
        F.col("value_cnt").alias("cnt"),
        _r6("value_sum").alias("sum_v"),
        _r6("value_mean").alias("mean_v"),
        _r6("value_min").alias("min_v"),
        _r6("value_max").alias("max_v"),
    )


SQL_ROLLUP_STREAM_1M = SQL_ROLLUP_1M

QUERIES["rollup_stream_1m"] = q_rollup_stream_1m
ORACLES["rollup_stream_1m"] = SQL_ROLLUP_STREAM_1M

