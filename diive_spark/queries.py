"""Query catalog: named queries over the driver test tables + matching
ANSI-SQL oracles (DuckDB dialect) — the per-round correctness gate.

Each entry exercises one operator family from SURVEY.md §2 through the
engine's own operator library where applicable. Float aggregates are rounded
to 6 decimals on BOTH sides so cross-engine summation-order noise (~1e-13
relative) can't flip the driver's value hash.

Conventions: every computed column is aliased identically in the Spark plan
and the SQL; tables are read as ``{sf_dir}/{name}.parquet`` (driver
pre-registers the same files as DuckDB views).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from diive_spark.operators import gapfill, grid, outliers, resample


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _r6(c):
    # +1e-9 before rounding: synthetic 2-decimal inputs produce means that
    # sit EXACTLY on .5e-6 rounding boundaries, where ~1e-13 cross-engine
    # summation-order noise flips the 6th decimal. The shift moves every
    # such value off the boundary; the SQL oracles apply the same shift.
    c = F.col(c) if isinstance(c, str) else c
    return F.round(c + F.lit(1e-9), 6)


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


# ---------------------------------------------------------------------------
# gap machinery
# ---------------------------------------------------------------------------

def _hourly_gridded(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    r = resample.rollup(ev, "ts", ["value"], "1h", key_cols=["event_type"])
    return grid.gridded(r, "1h", ["event_type"])


def q_gap_table_1h(spark, sf_dir):
    g = grid.gap_table(_hourly_gridded(spark, sf_dir), ["event_type"], "value_cnt",
                       tier="1h")
    return g.select("event_type", "gap_start", "gap_end", "gap_length")


SQL_GAP_TABLE_1H = """
WITH agg AS (
  SELECT event_type, date_trunc('hour', ts) AS window_start, count(*) AS cnt
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

QUERIES = {
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
}

ORACLES = {
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
}


# ---------------------------------------------------------------------------
# training-data pipeline: dedup / similarity / text analysis
# ---------------------------------------------------------------------------

def q_dedup_exact(spark, sf_dir):
    from diive_spark.operators import dedup
    docs = _t(spark, sf_dir, "documents")
    return dedup.exact_dedup(docs, "doc_id").select(
        "doc_id", "canonical_id", "group_size", "is_dup"
    )


SQL_DEDUP_EXACT = """
SELECT doc_id,
       min(doc_id) OVER (PARTITION BY md5(text)) AS canonical_id,
       count(*) OVER (PARTITION BY md5(text)) AS group_size,
       CAST(doc_id != min(doc_id) OVER (PARTITION BY md5(text)) AS INTEGER) AS is_dup
FROM documents
"""


def q_ngram_jaccard(spark, sf_dir):
    """CERTIFIES THE CAPPED CANDIDATE PLAN (the one that survives web scale):
    shingles in more than ``max_doc_freq`` documents are excluded from
    candidate generation, bounding every shared-shingle bucket to
    max_doc_freq^2/2 pairs; Jaccard for surviving candidates is still exact
    over the FULL shingle sets (see dedup.ngram_jaccard_pairs). The cap is
    active on the gate corpus (drops the head stop-shingles) and the oracle
    reproduces it with the matching HAVING filter."""
    from diive_spark.operators import dedup
    docs = _t(spark, sf_dir, "documents")
    return dedup.ngram_jaccard_pairs(docs, "doc_id", n=3, threshold=0.02,
                                     max_doc_freq=5)


SQL_NGRAM_JACCARD = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
sh AS (
  SELECT DISTINCT doc_id, words[i] || ' ' || words[i+1] || ' ' || words[i+2] AS shingle
  FROM toks, (SELECT unnest(generate_series(1, 2000)) AS i) g
  WHERE i + 2 <= len(words)
),
keep AS (SELECT shingle FROM sh GROUP BY 1 HAVING count(*) <= 5),
capped AS (SELECT sh.* FROM sh JOIN keep USING (shingle)),
cand AS (
  SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
  FROM capped a JOIN capped b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
inter AS (
  SELECT c.id1, c.id2, count(*) AS inter
  FROM cand c
  JOIN sh a ON a.doc_id = c.id1
  JOIN sh b ON b.doc_id = c.id2 AND b.shingle = a.shingle
  GROUP BY 1, 2
)
SELECT id1, id2, round(1e-9 + inter * 1.0 / (s1.n_sh + s2.n_sh - inter), 6) AS jaccard
FROM inter JOIN sizes s1 ON s1.doc_id = id1 JOIN sizes s2 ON s2.doc_id = id2
WHERE inter * 1.0 / (s1.n_sh + s2.n_sh - inter) >= 0.02
"""


def q_text_quality(spark, sf_dir):
    from diive_spark.operators import textstats
    docs = _t(spark, sf_dir, "documents")
    return textstats.add_text_stats(docs).select(
        "doc_id", "n_words", "avg_word_len", "stopword_ratio", "quality_score"
    )


_STOP_SQL = " + ".join(
    f"CAST((length(p) - length(replace(p, ' {w} ', ''))) / {len(w) + 2} AS BIGINT)"
    for w in ["the", "a", "of", "and", "to", "in", "is", "it"]
)
SQL_TEXT_QUALITY = f"""
WITH b AS (
  SELECT doc_id, ' ' || replace(text, ' ', '  ') || ' ' AS p,
         CAST(length(text) AS BIGINT) AS n_chars_c,
         CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_words
  FROM documents
),
s AS (SELECT doc_id, n_chars_c, n_words, {_STOP_SQL} AS stop_hits FROM b)
SELECT doc_id, n_words,
       round(1e-9 + (n_chars_c - (n_words - 1)) * 1.0 / n_words, 6) AS avg_word_len,
       round(1e-9 + stop_hits * 1.0 / n_words, 6) AS stopword_ratio,
       round(1e-9 + (least(n_words / 50.0, 1.0) + least(stop_hits * 1.0 / n_words * 5.0, 1.0)) / 2.0, 6)
         AS quality_score
FROM s
"""


def q_lang_id(spark, sf_dir):
    from diive_spark.operators import textstats
    docs = _t(spark, sf_dir, "documents")
    return textstats.language_id(docs).select("doc_id", "pred_lang", "lang_score")


def _lang_score_sql(lang):
    from diive_spark.operators.textstats import LANG_MARKERS
    return " + ".join(
        f"CAST((length(p) - length(replace(p, ' {w} ', ''))) / {len(w) + 2} AS BIGINT)"
        for w in LANG_MARKERS[lang]
    )


SQL_LANG_ID = f"""
WITH b AS (SELECT doc_id, ' ' || replace(lower(text), ' ', '  ') || ' ' AS p FROM documents),
s AS (
  SELECT doc_id,
         {_lang_score_sql('en')} AS s_en, {_lang_score_sql('es')} AS s_es,
         {_lang_score_sql('de')} AS s_de, {_lang_score_sql('fr')} AS s_fr,
         {_lang_score_sql('zh')} AS s_zh
  FROM b
),
long AS (
  SELECT doc_id, lang, score FROM s
  UNPIVOT (score FOR lang IN (s_en AS 'en', s_es AS 'es', s_de AS 'de',
                              s_fr AS 'fr', s_zh AS 'zh'))
)
SELECT doc_id, lang AS pred_lang, score AS lang_score
FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY score DESC, lang DESC) AS rk FROM long)
WHERE rk = 1
"""


def q_fingerprint(spark, sf_dir):
    from diive_spark.operators import textstats
    docs = _t(spark, sf_dir, "documents")
    return textstats.fingerprint(docs).select("doc_id", "fp")


SQL_FINGERPRINT = """
SELECT doc_id, ('0x' || substr(md5(lower(text)), 1, 15))::BIGINT AS fp
FROM documents
"""


def q_token_count(spark, sf_dir):
    from diive_spark.operators import textstats
    docs = _t(spark, sf_dir, "documents")
    return textstats.token_count(docs).select("doc_id", "n_ws_tokens", "n_bpe_est")


SQL_TOKEN_COUNT = """
SELECT doc_id,
       CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_ws_tokens,
       greatest(CAST(ceil(length(text) / 3.4) AS BIGINT),
                CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT)) AS n_bpe_est
FROM documents
"""


def q_simhash(spark, sf_dir):
    from diive_spark.operators import dedup
    docs = _t(spark, sf_dir, "documents")
    return dedup.simhash(docs, "doc_id")


SQL_SIMHASH = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
sh AS (
  SELECT DISTINCT doc_id, words[i] || ' ' || words[i+1] || ' ' || words[i+2] AS shingle
  FROM toks, (SELECT unnest(generate_series(1, 2000)) AS i) g
  WHERE i + 2 <= len(words)
),
h AS (SELECT doc_id, ('0x' || substr(md5(shingle), 1, 8))::BIGINT AS hv FROM sh),
bits AS (
  SELECT doc_id, b.i AS bit,
         sum(CASE WHEN (hv >> b.i) & 1 = 1 THEN 1 ELSE -1 END) AS s
  FROM h, (SELECT unnest(generate_series(0, 31)) AS i) b
  GROUP BY 1, 2
)
SELECT doc_id,
       CAST(sum(CASE WHEN s > 0 THEN CAST(1 AS BIGINT) << bit ELSE 0 END) AS BIGINT) AS simhash
FROM bits GROUP BY 1
"""


def q_ann_cosine_topk(spark, sf_dir):
    from diive_spark.operators import similarity
    embs = _t(spark, sf_dir, "embeddings")
    return similarity.cosine_topk_bruteforce(
        embs, embs.filter(F.col("vec_id") < 10), k=5
    )


SQL_ANN_COSINE_TOPK = """
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS nbr_id,
         round(1e-9 + list_dot_product(q.e, c.e) /
               (sqrt(list_dot_product(q.e, q.e)) * sqrt(list_dot_product(c.e, c.e))), 6) AS sim
  FROM v q JOIN v c ON q.vec_id != c.vec_id
  WHERE q.vec_id < 10
)
SELECT query_id, nbr_id, sim,
       CAST(row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, nbr_id ASC) AS BIGINT) AS rnk
FROM scored
QUALIFY rnk <= 5
"""


def q_embedding_near_dups(spark, sf_dir):
    """Bucketed hyperplane-LSH plan (no O(n^2) BroadcastNestedLoopJoin); the
    verify step makes precision exact, and the banding s-curve is tuned so
    the expected missed-pair count stays << 1 at any gated scale: per-pair
    miss prob is (1 - p^planes)^tables with p = 1 - acos(0.35)/pi = 0.614,
    so 2 planes x 32 tables -> 0.623^32 ~= 2.7e-7 (even 10^5 qualifying
    pairs expect ~0.03 misses). The all-pairs SQL below is therefore an
    exact oracle (verified: 0 missed pairs at sf0.001 and sf0.01). The naive
    all-pairs dedup.embedding_near_dups remains as the test-only baseline."""
    from diive_spark.operators import similarity
    embs = _t(spark, sf_dir, "embeddings")
    return similarity.cosine_lsh_pairs(embs, threshold=0.35, n_planes=2, n_tables=32)


SQL_EMBEDDING_NEAR_DUPS = """
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings)
SELECT a.vec_id AS id1, b.vec_id AS id2,
       round(1e-9 + list_dot_product(a.e, b.e) /
             (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))), 6) AS sim
FROM v a JOIN v b ON a.vec_id < b.vec_id
WHERE list_dot_product(a.e, b.e) /
      (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))) >= 0.35 - 5e-7
  AND round(1e-9 + list_dot_product(a.e, b.e) /
            (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))), 6) >= 0.35
"""


def q_minhash_lsh(spark, sf_dir):
    """MinHash LSH near-dup pairs. The banding is probabilistic but
    DETERMINISTIC (md5-derived band hashes), so the SQL oracle reproduces the
    entire pipeline — signatures, bucketing, exact-Jaccard verify — and the
    gate is a full value check, not rows-only. Recall properties are covered
    by tests/test_dedup_similarity.py.

    CERTIFIES THE CAPPED PLAN: shingles in more than ``max_doc_freq``
    documents are dropped BEFORE signatures and verification (the standard
    stop-shingle preprocessing; Jaccard is then defined over the capped
    universe), so the certified bucketing is the one whose buckets stay
    bounded at web scale."""
    from diive_spark.operators import dedup
    docs = _t(spark, sf_dir, "documents")
    return dedup.minhash_lsh_pairs(docs, "doc_id", threshold=0.02,
                                   max_doc_freq=5)


def q_ann_ivf(spark, sf_dir):
    """IVF approximate top-k. Approximate vs brute force by design, but the
    quantizer is deterministic (md5-ordered centroid pick, tie-broken cell
    assignment), so the SQL oracle replays the exact IVF plan; recall vs
    brute force covered by tests/test_dedup_similarity.py."""
    from diive_spark.operators import similarity
    embs = _t(spark, sf_dir, "embeddings")
    return similarity.cosine_topk_ivf(
        embs, embs.filter(F.col("vec_id") < 10), k=5, n_centroids=8, nprobe=4
    )


QUERIES.update({
    "dedup_exact": q_dedup_exact,
    "ngram_jaccard": q_ngram_jaccard,
    "text_quality": q_text_quality,
    "lang_id": q_lang_id,
    "fingerprint": q_fingerprint,
    "token_count": q_token_count,
    "simhash": q_simhash,
    "ann_cosine_topk": q_ann_cosine_topk,
    "embedding_near_dups": q_embedding_near_dups,
    "minhash_lsh": q_minhash_lsh,
    "ann_ivf": q_ann_ivf,
})

ORACLES.update({
    "dedup_exact": SQL_DEDUP_EXACT,
    "ngram_jaccard": SQL_NGRAM_JACCARD,
    "text_quality": SQL_TEXT_QUALITY,
    "lang_id": SQL_LANG_ID,
    "fingerprint": SQL_FINGERPRINT,
    "token_count": SQL_TOKEN_COUNT,
    "simhash": SQL_SIMHASH,
    "ann_cosine_topk": SQL_ANN_COSINE_TOPK,
    "embedding_near_dups": SQL_EMBEDDING_NEAR_DUPS,
})


# ---------------------------------------------------------------------------
# analytics extras: 2-D grid agg, cumulatives, hires broadcast-back, filters
# ---------------------------------------------------------------------------

def q_grid_agg_2d(spark, sf_dir):
    from diive_spark.operators import gridagg
    ev = _t(spark, sf_dir, "events").withColumn("hour", F.hour("ts").cast("double"))
    out = gridagg.grid_aggregate(
        ev, "value", "hour", "value", "equal_width",
        n_bins_x=10, n_bins_y=6, x_range=(-100.0, 100.0), y_range=(0.0, 24.0),
        aggfunc="mean", min_n_vals_per_bin=3,
    )
    return out.select("xbin", "ybin", "n_vals", _r6("agg_value").alias("mean_z"))


SQL_GRID_AGG_2D = """
WITH b AS (
  SELECT CASE WHEN floor((value - (-100.0)) / 20.0) >= 10 THEN 9
              ELSE CAST(floor((value - (-100.0)) / 20.0) AS INTEGER) END AS xbin,
         CASE WHEN floor(hour(ts) / 4.0) >= 6 THEN 5
              ELSE CAST(floor(hour(ts) / 4.0) AS INTEGER) END AS ybin,
         value
  FROM events
  WHERE value BETWEEN -100.0 AND 100.0 AND hour(ts) BETWEEN 0 AND 24
)
SELECT xbin, ybin, count(value) AS n_vals,
       CASE WHEN count(value) >= 3 THEN round(1e-9 + avg(value), 6) END AS mean_z
FROM b GROUP BY 1, 2
"""


def q_grid_agg_2d_quantile(spark, sf_dir):
    """GridAggregator quantile path (pd.qcut ≙): bin edges are exact
    interpolating percentiles (one distributed aggregate — verified
    bit-identical to DuckDB quantile_cont), bucketing is a pure CASE
    expression. No global window, no rowid join (the round-2 scale-killer);
    plan contains no Window at all (asserted in tests/test_analytics.py)."""
    from diive_spark.operators import gridagg
    ev = _t(spark, sf_dir, "events").select(
        F.col("value").alias("x"),
        # decorrelated continuous second axis: sub-second microseconds
        (F.unix_micros(F.col("ts").cast("timestamp")) % 1000000 / F.lit(10000.0)).alias("y"),
    )
    out = gridagg.grid_aggregate(
        ev, "x", "y", "x", "quantile",
        n_bins_x=4, n_bins_y=4, aggfunc="mean", min_n_vals_per_bin=3,
    )
    return out.select("xbin", "ybin", "n_vals", _r6("agg_value").alias("mean_z"))


SQL_GRID_AGG_2D_QUANTILE = """
WITH src AS (
  SELECT value AS x, (epoch_us(ts) % 1000000) / 10000.0 AS y FROM events
),
e AS (
  SELECT quantile_cont(x, [0.25, 0.5, 0.75]) AS xe,
         quantile_cont(y, [0.25, 0.5, 0.75]) AS ye
  FROM src
),
b AS (
  SELECT CASE WHEN x <= xe[1] THEN 0 WHEN x <= xe[2] THEN 1
              WHEN x <= xe[3] THEN 2 ELSE 3 END AS xbin,
         CASE WHEN y <= ye[1] THEN 0 WHEN y <= ye[2] THEN 1
              WHEN y <= ye[3] THEN 2 ELSE 3 END AS ybin,
         x
  FROM src, e
)
SELECT xbin, ybin, count(x) AS n_vals,
       CASE WHEN count(x) >= 3 THEN round(1e-9 + avg(x), 6) END AS mean_z
FROM b GROUP BY 1, 2
"""


def q_doy_cumulative(spark, sf_dir):
    from diive_spark.operators import features
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(F.sum("value").alias("v"))
    out = features.doy_cumulatives_per_year(daily, "d", "v")
    return out.select("year", "doy", _r6("cumsum").alias("cum_v"))


SQL_DOY_CUMULATIVE = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, sum(value) AS v FROM events GROUP BY 1
)
SELECT year(d) AS year, dayofyear(d) AS doy,
       round(1e-9 + sum(v) OVER (PARTITION BY year(d) ORDER BY dayofyear(d)
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS cum_v
FROM daily
"""


def q_agg_as_hires(spark, sf_dir):
    from diive_spark.operators import frames
    ev = _t(spark, sf_dir, "events")
    out = frames.aggregated_as_hires(ev, "ts", "value", "day", "mean")
    return out.select("event_id", _r6("value_mean_day").alias("daily_mean"))


SQL_AGG_AS_HIRES = """
SELECT event_id,
       round(1e-9 + avg(value) OVER (PARTITION BY date_trunc('day', ts)), 6) AS daily_mean
FROM events
"""


def q_keep_records_where(spark, sf_dir):
    from diive_spark.operators import frames
    ev = _t(spark, sf_dir, "events").select("event_id", "ts", "value")
    out = frames.keep_records_where(ev, "value", -10.0, 10.0,
                                    protect_cols=["event_id"])
    return out.select("event_id", _r6("value").alias("value_kept"))


SQL_KEEP_RECORDS_WHERE = """
SELECT event_id,
       CASE WHEN value >= -10.0 AND value <= 10.0 THEN round(1e-9 + value, 6) END AS value_kept
FROM events
"""


QUERIES.update({
    "grid_agg_2d": q_grid_agg_2d,
    "grid_agg_2d_quantile": q_grid_agg_2d_quantile,
    "doy_cumulative": q_doy_cumulative,
    "agg_as_hires": q_agg_as_hires,
    "keep_records_where": q_keep_records_where,
})
ORACLES.update({
    "grid_agg_2d": SQL_GRID_AGG_2D,
    "grid_agg_2d_quantile": SQL_GRID_AGG_2D_QUANTILE,
    "doy_cumulative": SQL_DOY_CUMULATIVE,
    "agg_as_hires": SQL_AGG_AS_HIRES,
    "keep_records_where": SQL_KEEP_RECORDS_WHERE,
})


def q_stepwise_screening(spark, sf_dir):
    """Chained outlier tests + QCF + cleaned hourly resample (the reference's
    StepwiseMeteoScreeningDb flow, meteoscreening.py:37)."""
    from diive_spark.operators.stepwise import StepwiseScreening
    ev = _t(spark, sf_dir, "events")
    out = (
        StepwiseScreening(ev, ["event_type"], "ts", "value")
        .flag_absolute_limits(-60.0, 60.0)
        .flag_zscore(thres=3.0)
        .finalize(resample_tier="1h")
    )
    return out.select(
        "event_type", "window_end",
        F.col("value_CLEANED_cnt").alias("cnt"),
        _r6("value_CLEANED_mean").alias("mean_clean"),
    )


SQL_STEPWISE_SCREENING = """
WITH flagged AS (
  SELECT event_type, ts, value,
         CASE WHEN value < -60.0 OR value > 60.0 THEN 2 ELSE 0 END AS f1,
         CASE WHEN abs((value - avg(value) OVER (PARTITION BY event_type))
                       / nullif(stddev_pop(value) OVER (PARTITION BY event_type), 0)) > 3.0
              THEN 2 ELSE 0 END AS f2
  FROM events WHERE value IS NOT NULL
),
cleaned AS (
  SELECT event_type, ts, value FROM flagged WHERE f1 = 0 AND f2 = 0
)
SELECT event_type,
       date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
       count(value) AS cnt,
       round(1e-9 + avg(value), 6) AS mean_clean
FROM cleaned GROUP BY 1, 2
"""


def q_profile_lineitem(spark, sf_dir):
    from diive_spark.operators import sstats as ss
    li = _t(spark, sf_dir, "lineitem")
    prof = ss.profile_dataframe(li, cols=["l_quantity", "l_extendedprice", "l_discount"])
    return prof.select(
        "column", "n", "n_missing",
        _r6("mean").alias("mean_v"), _r6("sd").alias("sd_v"),
        _r6("min").alias("min_v"), _r6("q25").alias("q25_v"),
        _r6("median").alias("median_v"), _r6("q75").alias("q75_v"),
        _r6("max").alias("max_v"),
    )


def _profile_col_sql(c):
    return f"""
SELECT '{c}' AS "column", count({c}) AS n, count(*) - count({c}) AS n_missing,
       round(1e-9 + avg({c}), 6) AS mean_v, round(1e-9 + stddev_samp({c}), 6) AS sd_v,
       round(1e-9 + min({c}), 6) AS min_v, round(1e-9 + quantile_cont({c}, 0.25), 6) AS q25_v,
       round(1e-9 + quantile_cont({c}, 0.5), 6) AS median_v,
       round(1e-9 + quantile_cont({c}, 0.75), 6) AS q75_v, round(1e-9 + max({c}), 6) AS max_v
FROM lineitem"""


SQL_PROFILE_LINEITEM = " UNION ALL ".join(
    _profile_col_sql(c) for c in ["l_quantity", "l_extendedprice", "l_discount"]
)


QUERIES.update({
    "stepwise_screening": q_stepwise_screening,
    "profile_lineitem": q_profile_lineitem,
})
ORACLES.update({
    "stepwise_screening": SQL_STEPWISE_SCREENING,
    "profile_lineitem": SQL_PROFILE_LINEITEM,
})


def q_minhash_signatures(spark, sf_dir):
    """Long-form MinHash signatures — verifies the universal-hash MinHash
    math itself against SQL (the LSH banding on top stays rows-only)."""
    from diive_spark.operators import dedup
    docs = _t(spark, sf_dir, "documents")
    sig = dedup.minhash_signatures(docs, "doc_id", k=16, seed=42)
    long = sig.select(
        "doc_id",
        F.explode(
            F.array(*[
                F.struct(F.lit(i).alias("perm"), F.col(f"mh_{i}").alias("minhash"))
                for i in range(16)
            ])
        ).alias("s"),
    ).select("doc_id", F.col("s.perm").cast("bigint").alias("perm"), "s.minhash")
    return long


def _minhash_sql():
    import random
    rng = random.Random(42)
    p = (1 << 31) - 1
    perms = [(rng.randrange(1, p), rng.randrange(0, p)) for _ in range(16)]
    perm_rows = ", ".join(f"({i}, {a}::BIGINT, {b}::BIGINT)" for i, (a, b) in enumerate(perms))
    return f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
sh AS (
  SELECT DISTINCT doc_id, words[i] || ' ' || words[i+1] || ' ' || words[i+2] AS shingle
  FROM toks, (SELECT unnest(generate_series(1, 2000)) AS i) g
  WHERE i + 2 <= len(words)
),
h AS (SELECT doc_id, ('0x' || substr(md5(shingle), 1, 8))::BIGINT AS hv FROM sh),
perms(perm, a, b) AS (VALUES {perm_rows})
SELECT doc_id, CAST(perm AS BIGINT) AS perm,
       min((a * hv + b) % {p}) AS minhash
FROM h CROSS JOIN perms
GROUP BY doc_id, perm
"""


QUERIES["minhash_signatures"] = q_minhash_signatures
ORACLES["minhash_signatures"] = _minhash_sql()


def q_median_fill_1h(spark, sf_dir):
    """Interp(limit=3) + single-tier rolling-median fill (49-slot centered
    window, min 2 samples) on the hourly grid — SQL-checkable slice of the
    gap-fill cascade (the multi-tier first-success loop stays kernel-side)."""
    g = _hourly_gridded(spark, sf_dir).select("event_type", "window_start", "value_mean")
    filled = gapfill.gapfill_cascade(
        g, ["event_type"], "window_start", "value_mean",
        tier_seconds=3600, interp_limit=3, window_tiers=[49], min_samples=2,
    )
    return filled.select(
        "event_type", "window_start",
        _r6("filled").alias("filled_v"),
        F.col("fill_flag").cast("int").alias("fill_flag"),
    )


SQL_MEDIAN_FILL_1H = """
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
             OVER (PARTITION BY event_type, run) AS gap_len,
         median(mean_v) OVER w_med AS rmed,
         count(mean_v) OVER w_med AS rcnt
  FROM j
  WINDOW w_prev AS (PARTITION BY event_type ORDER BY window_start
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         w_next AS (PARTITION BY event_type ORDER BY window_start
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING),
         w_med AS (PARTITION BY event_type ORDER BY window_start
                   ROWS BETWEEN 24 PRECEDING AND 24 FOLLOWING)
),
f AS (
  SELECT *,
         CASE WHEN mean_v IS NOT NULL THEN mean_v
              WHEN gap_len <= 3 AND prev_v IS NOT NULL AND next_v IS NOT NULL
              THEN prev_v + (next_v - prev_v) * ((tsn - prev_t) / (next_t - prev_t))
         END AS interp_v
  FROM k
)
SELECT event_type, window_start,
       round(1e-9 + CASE WHEN interp_v IS NOT NULL THEN interp_v
                  WHEN rcnt >= 2 THEN rmed END, 6) AS filled_v,
       CAST(CASE WHEN mean_v IS NOT NULL THEN 0
                 WHEN interp_v IS NOT NULL THEN 1
                 WHEN rcnt >= 2 THEN 2 END AS INTEGER) AS fill_flag
FROM f
"""


QUERIES["median_fill_1h"] = q_median_fill_1h
ORACLES["median_fill_1h"] = SQL_MEDIAN_FILL_1H


def q_climatology_fill_1h(spark, sf_dir):
    """Interp + hour-of-day climatology fallback fill (the model-free
    analogue of the reference's timestamp-features fallback model,
    ml/common.py:1175-1212)."""
    g = _hourly_gridded(spark, sf_dir).select("event_type", "window_start", "value_mean")
    interp = gapfill.linear_interpolation(g, ["event_type"], "window_start",
                                          "value_mean", limit=3)
    out = gapfill.climatology_fill(interp, ["event_type"], "window_start",
                                   "value_mean", each_month=False, min_samples=3)
    return out.select(
        "event_type", "window_start",
        _r6("filled").alias("filled_v"),
        F.col("fill_flag").cast("int").alias("fill_flag"),
    )


SQL_CLIMATOLOGY_FILL_1H = """
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
),
f AS (
  SELECT *,
         CASE WHEN mean_v IS NOT NULL THEN mean_v
              WHEN gap_len <= 3 AND prev_v IS NOT NULL AND next_v IS NOT NULL
              THEN prev_v + (next_v - prev_v) * ((tsn - prev_t) / (next_t - prev_t))
         END AS interp_v
  FROM f0
), f0 AS (SELECT * FROM k),
clim AS (
  SELECT event_type, hour(window_start) AS h,
         avg(mean_v) AS clim_v, count(mean_v) AS clim_n
  FROM j WHERE mean_v IS NOT NULL GROUP BY 1, 2
)
SELECT f.event_type, f.window_start,
       round(1e-9 + CASE WHEN f.interp_v IS NOT NULL THEN f.interp_v
                  WHEN c.clim_n >= 3 THEN c.clim_v END, 6) AS filled_v,
       CAST(CASE WHEN f.mean_v IS NOT NULL THEN 0
                 WHEN f.interp_v IS NOT NULL THEN 1
                 WHEN c.clim_n >= 3 THEN 3 END AS INTEGER) AS fill_flag
FROM f LEFT JOIN clim c ON c.event_type = f.event_type AND c.h = hour(f.window_start)
"""


QUERIES["climatology_fill_1h"] = q_climatology_fill_1h
ORACLES["climatology_fill_1h"] = SQL_CLIMATOLOGY_FILL_1H


def q_json_props(spark, sf_dir):
    """JSON metadata extraction from the events props column (engine-new;
    the reference has no JSON surface, SURVEY.md §2.8) + per-type stats."""
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        ev.withColumn("k", k)
        .groupBy("event_type")
        .agg(F.count("k").alias("cnt"),
             _r6(F.avg("k")).alias("mean_k"),
             F.min("k").alias("min_k"),
             F.max("k").alias("max_k"))
    )


SQL_JSON_PROPS = """
SELECT event_type, count(k) AS cnt, round(1e-9 + avg(k), 6) AS mean_k,
       min(k) AS min_k, max(k) AS max_k
FROM (SELECT event_type, json_extract_string(props, '$.k')::BIGINT AS k FROM events)
GROUP BY 1
"""

QUERIES["json_props"] = q_json_props
ORACLES["json_props"] = SQL_JSON_PROPS


def q_gap_stats_monthly(spark, sf_dir):
    """GapStats monthly breakdown (gapfinder.py:440-466) over the 1h-gridded
    events rollup: per (event_type, calendar month) total/missing records,
    missing %, and gap count at the gap_start month."""
    g = _hourly_gridded(spark, sf_dir)
    out = grid.gap_stats_monthly(g, ["event_type"], "value_cnt")
    return out.select(
        "event_type", "MONTH",
        F.col("total_records").cast("bigint").alias("total_records"),
        F.col("missing_records").cast("bigint").alias("missing_records"),
        "missing_pct",
        F.col("n_gaps").cast("bigint").alias("n_gaps"),
    )


SQL_GAP_STATS_MONTHLY = """
WITH agg AS (
  SELECT event_type, date_trunc('hour', ts) AS window_start, count(*) AS cnt
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
  SELECT g.event_type, g.window_start, a.cnt,
         count(a.cnt) OVER (PARTITION BY g.event_type ORDER BY g.window_start) AS run
  FROM grid g LEFT JOIN agg a ON a.event_type = g.event_type AND a.window_start = g.window_start
),
base AS (
  SELECT event_type, CAST(month(window_start) AS INTEGER) AS MONTH,
         CAST(count(*) AS BIGINT) AS total_records,
         CAST(sum(CASE WHEN cnt IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS missing_records
  FROM j GROUP BY 1, 2
),
gaps AS (
  SELECT event_type, min(window_start) AS gap_start
  FROM j WHERE cnt IS NULL GROUP BY event_type, run
),
gc AS (
  SELECT event_type, CAST(month(gap_start) AS INTEGER) AS MONTH,
         CAST(count(*) AS BIGINT) AS n_gaps
  FROM gaps GROUP BY 1, 2
)
SELECT b.event_type, b.MONTH, b.total_records, b.missing_records,
       round(100.0 * b.missing_records / greatest(b.total_records, 1) + 1e-9, 2) AS missing_pct,
       CAST(coalesce(gc.n_gaps, 0) AS BIGINT) AS n_gaps
FROM base b LEFT JOIN gc ON b.event_type = gc.event_type AND b.MONTH = gc.MONTH
"""

QUERIES["gap_stats_monthly"] = q_gap_stats_monthly
ORACLES["gap_stats_monthly"] = SQL_GAP_STATS_MONTHLY


def q_classical_decompose(spark, sf_dir):
    """Classical seasonal-trend decomposition (period 24) of the hourly mean
    series per event_type (decomposition_utils.py:160 semantics)."""
    from diive_spark.operators import analysis
    g = _hourly_gridded(spark, sf_dir).select("event_type", "window_start", "value_mean")
    out = analysis.classical_decompose(g, ["event_type"], "window_start",
                                       "value_mean", period=24)
    return out.select(
        "event_type", "window_start",
        _r6("trend").alias("trend_v"),
        _r6("seasonal").alias("seasonal_v"),
        _r6("residual").alias("residual_v"),
    )


SQL_CLASSICAL_DECOMPOSE = """
WITH agg AS (
  SELECT event_type, date_trunc('hour', ts) AS window_start, avg(value) AS v
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
seq AS (
  SELECT g.event_type, g.window_start, a.v,
         row_number() OVER (PARTITION BY g.event_type ORDER BY g.window_start) - 1 AS rn
  FROM grid g LEFT JOIN agg a ON a.event_type = g.event_type AND a.window_start = g.window_start
),
tr AS (
  SELECT *,
         CASE WHEN count(v) OVER w25 = 25
              THEN (sum(v) OVER w25
                    - 0.5 * lag(v, 12) OVER wseq
                    - 0.5 * lead(v, 12) OVER wseq) / 24 END AS trend
  FROM seq
  WINDOW wseq AS (PARTITION BY event_type ORDER BY rn),
         w25 AS (PARTITION BY event_type ORDER BY rn
                 ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)
),
ph AS (
  SELECT event_type, rn % 24 AS phase, avg(v - trend) AS pm
  FROM tr GROUP BY 1, 2
),
grand AS (SELECT event_type, avg(pm) AS gm FROM ph GROUP BY 1)
SELECT t.event_type, t.window_start,
       round(1e-9 + t.trend, 6) AS trend_v,
       round(1e-9 + (p.pm - gr.gm), 6) AS seasonal_v,
       round(1e-9 + (t.v - t.trend - (p.pm - gr.gm)), 6) AS residual_v
FROM tr t
JOIN ph p ON p.event_type = t.event_type AND p.phase = t.rn % 24
JOIN grand gr ON gr.event_type = t.event_type
"""

QUERIES["classical_decompose"] = q_classical_decompose
ORACLES["classical_decompose"] = SQL_CLASSICAL_DECOMPOSE


def q_harmonics(spark, sf_dir):
    """Harmonic amplitudes/phases at k/24h over the hourly mean series per
    event_type — the exact-DFT distributed-sums path (harmonic.py:19)."""
    from diive_spark.operators import analysis
    g = _hourly_gridded(spark, sf_dir).select("event_type", "window_start", "value_mean")
    out = analysis.harmonic_coefficients(g, ["event_type"], "window_start",
                                         "value_mean", period=24, n_harmonics=3)
    return out.select(
        "event_type", "harmonic",
        _r6("frequency").alias("freq_v"),
        _r6("amplitude").alias("amp_v"),
        _r6("phase").alias("phase_v"),
    )


def _harmonics_sql():
    ks = [1, 2, 3]
    sums = ",\n         ".join(
        f"sum(v * cos(2 * pi() * {k} * t / 24)) AS c{k},\n         "
        f"sum(v * sin(2 * pi() * {k} * t / 24)) AS s{k}"
        for k in ks
    )
    parts = [
        f"""SELECT event_type, {k} AS harmonic,
       round(1e-9 + {k} / 24.0, 6) AS freq_v,
       round(1e-9 + sqrt(pow(2 * c{k} / n, 2) + pow(2 * s{k} / n, 2)), 6) AS amp_v,
       round(1e-9 + atan2(-2 * s{k} / n, 2 * c{k} / n), 6) AS phase_v
FROM sums"""
        for k in ks
    ]
    return f"""
WITH agg AS (
  SELECT event_type, date_trunc('hour', ts) AS window_start, avg(value) AS v
  FROM events GROUP BY 1, 2
),
seq AS (
  SELECT event_type, v,
         row_number() OVER (PARTITION BY event_type ORDER BY window_start) - 1 AS t
  FROM agg WHERE v IS NOT NULL
),
sums AS (
  SELECT event_type, count(*) AS n,
         {sums}
  FROM seq GROUP BY 1
)
{" UNION ALL ".join(parts)}
"""


QUERIES["harmonics"] = q_harmonics
ORACLES["harmonics"] = _harmonics_sql()


def q_zscore_rolling(spark, sf_dir):
    """Centered rolling z-score (zscore.py:315 semantics: non-null records,
    min_periods=3, sample SD) over the hourly mean series per event_type —
    exercises the join-free range-frame plan against a plain SQL rolling
    window on the null-filtered series."""
    g = _hourly_gridded(spark, sf_dir).select("event_type", "window_start", "value_mean")
    f = outliers.flag_zscore_rolling(g, ["event_type"], "window_start",
                                     "value_mean", thres_zscore=2.0, winsize=24)
    return f.select("event_type", "window_start",
                    F.col("FLAG_ZSCOREROLLING_TEST").alias("flag"))


SQL_ZSCORE_ROLLING = """
WITH agg AS (
  SELECT event_type, date_trunc('hour', ts) AS window_start, avg(value) AS v
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
g2 AS (
  SELECT g.event_type, g.window_start, a.v
  FROM grid g LEFT JOIN agg a ON a.event_type = g.event_type AND a.window_start = g.window_start
),
nn AS (SELECT * FROM g2 WHERE v IS NOT NULL),
st AS (
  SELECT event_type, window_start, v,
         avg(v) OVER w AS m, stddev_samp(v) OVER w AS sd, count(v) OVER w AS c
  FROM nn
  WINDOW w AS (PARTITION BY event_type ORDER BY window_start
               ROWS BETWEEN 11 PRECEDING AND 12 FOLLOWING)
)
SELECT event_type, window_start,
       CAST(CASE WHEN c >= 3 AND abs((v - m) / nullif(sd, 0)) > 2.0
                 THEN 2 ELSE 0 END AS INTEGER) AS flag
FROM st
UNION ALL
SELECT event_type, window_start, CAST(NULL AS INTEGER) AS flag
FROM g2 WHERE v IS NULL
"""

QUERIES["zscore_rolling"] = q_zscore_rolling
ORACLES["zscore_rolling"] = SQL_ZSCORE_ROLLING


def q_zscore_increments(spark, sf_dir):
    """Increment z-score (incremental.py:103: |double-diff|, |diff-prev|,
    |diff-next| over non-null records, all-three rule) on the hourly mean
    series — exercises the ignore-nulls neighbour plan."""
    g = _hourly_gridded(spark, sf_dir).select("event_type", "window_start", "value_mean")
    f = outliers.flag_zscore_increments(g, ["event_type"], "window_start",
                                        "value_mean", thres_zscore=2.0)
    return f.select("event_type", "window_start",
                    F.col("FLAG_INCREMENTS_TEST").alias("flag"))


SQL_ZSCORE_INCREMENTS = """
WITH agg AS (
  SELECT event_type, date_trunc('hour', ts) AS window_start, avg(value) AS v
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
g2 AS (
  SELECT g.event_type, g.window_start, a.v
  FROM grid g LEFT JOIN agg a ON a.event_type = g.event_type AND a.window_start = g.window_start
),
nn AS (SELECT * FROM g2 WHERE v IS NOT NULL),
d AS (
  SELECT *, lag(v) OVER w AS pv, lead(v) OVER w AS nv
  FROM nn WINDOW w AS (PARTITION BY event_type ORDER BY window_start)
),
dd AS (
  SELECT *, abs((v - pv) - (nv - v)) AS ddd, abs(v - pv) AS ddp, abs(nv - v) AS ddn
  FROM d
),
z AS (
  SELECT event_type, window_start,
         (CASE WHEN abs((ddd - avg(ddd) OVER gw) / nullif(stddev_pop(ddd) OVER gw, 0)) > 2.0 THEN 2 ELSE 0 END
        + CASE WHEN abs((ddp - avg(ddp) OVER gw) / nullif(stddev_pop(ddp) OVER gw, 0)) > 2.0 THEN 2 ELSE 0 END
        + CASE WHEN abs((ddn - avg(ddn) OVER gw) / nullif(stddev_pop(ddn) OVER gw, 0)) > 2.0 THEN 2 ELSE 0 END) AS total
  FROM dd WINDOW gw AS (PARTITION BY event_type)
)
SELECT event_type, window_start,
       CAST(CASE WHEN total = 6 THEN 2 ELSE 0 END AS INTEGER) AS flag
FROM z
UNION ALL
SELECT event_type, window_start, CAST(NULL AS INTEGER) AS flag
FROM g2 WHERE v IS NULL
"""

QUERIES["zscore_increments"] = q_zscore_increments
ORACLES["zscore_increments"] = SQL_ZSCORE_INCREMENTS


def q_compound_extremes(spark, sf_dir):
    """CompoundExtremes (compoundextremes.py:33) over lineitem: monthly mean
    quantity vs extendedprice, seasonal (calendar-month) sample-SD z-scores,
    four-way classification."""
    from diive_spark.operators import analysis
    li = _t(spark, sf_dir, "lineitem").withColumn(
        "ts", F.col("l_shipdate").cast("timestamp"))
    out = analysis.compound_extremes(
        li, "ts", "l_quantity", "l_extendedprice",
        agg="monthly", agg_func="mean", threshold=1.5,
        var1_extreme="high", var2_extreme="low", standardize_by="season",
    )
    return out.select(
        "period",
        _r6("v1").alias("v1_v"), _r6("v2").alias("v2_v"),
        _r6("z1").alias("z1_v"), _r6("z2").alias("z2_v"),
        "category",
    )


SQL_COMPOUND_EXTREMES = """
WITH per AS (
  SELECT date_trunc('month', l_shipdate) AS m,
         avg(l_quantity) AS v1, avg(l_extendedprice) AS v2
  FROM lineitem GROUP BY 1
),
z AS (
  SELECT *,
         (v1 - avg(v1) OVER w) / nullif(stddev_samp(v1) OVER w, 0) AS z1,
         (v2 - avg(v2) OVER w) / nullif(stddev_samp(v2) OVER w, 0) AS z2
  FROM per WINDOW w AS (PARTITION BY month(m))
)
SELECT strftime(m, '%Y-%m') AS period,
       round(1e-9 + v1, 6) AS v1_v, round(1e-9 + v2, 6) AS v2_v,
       round(1e-9 + z1, 6) AS z1_v, round(1e-9 + z2, 6) AS z2_v,
       CASE WHEN z1 >= 1.5 AND z2 <= -1.5 THEN 'compound'
            WHEN z1 >= 1.5 THEN 'var1_only'
            WHEN z2 <= -1.5 THEN 'var2_only'
            ELSE 'none' END AS category
FROM z WHERE z1 IS NOT NULL AND z2 IS NOT NULL
"""

QUERIES["compound_extremes"] = q_compound_extremes
ORACLES["compound_extremes"] = SQL_COMPOUND_EXTREMES


def _minhash_lsh_sql(threshold=0.02, k=16, bands=4, seed=42, max_doc_freq=5):
    """Full MinHash-LSH pipeline in SQL: signatures -> md5 band hashes ->
    bucket-join candidates -> exact-Jaccard verify. Reproduces the Spark
    plan's bucketing exactly (band hash = md5 of the comma-joined row
    values), so the gated query is fully oracled, not rows-only. The
    ``max_doc_freq`` HAVING filter mirrors dedup.cap_shingle_doc_freq:
    signatures, candidate buckets AND the Jaccard verify all run on the
    capped shingle universe."""
    import random
    rng = random.Random(seed)
    p = (1 << 31) - 1
    perms = [(rng.randrange(1, p), rng.randrange(0, p)) for _ in range(k)]
    perm_rows = ", ".join(f"({i}, {a}::BIGINT, {b}::BIGINT)" for i, (a, b) in enumerate(perms))
    rows = k // bands
    mh_cols = ",\n       ".join(
        f"max(CASE WHEN perm = {i} THEN mh END) AS mh_{i}" for i in range(k)
    )
    band_cases = " ".join(
        "WHEN {b} THEN {expr}".format(
            b=b,
            expr=" || ',' || ".join(f"mh_{b * rows + r}::VARCHAR" for r in range(rows)),
        )
        for b in range(bands)
    )
    return f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
sh_raw AS (
  SELECT DISTINCT doc_id, words[i] || ' ' || words[i+1] || ' ' || words[i+2] AS shingle
  FROM toks, (SELECT unnest(generate_series(1, 2000)) AS i) g
  WHERE i + 2 <= len(words)
),
keep AS (SELECT shingle FROM sh_raw GROUP BY 1 HAVING count(*) <= {max_doc_freq}),
sh AS (SELECT sh_raw.* FROM sh_raw JOIN keep USING (shingle)),
h AS (SELECT doc_id, ('0x' || substr(md5(shingle), 1, 8))::BIGINT AS hv FROM sh),
perms(perm, a, b) AS (VALUES {perm_rows}),
sig AS (
  SELECT doc_id, perm, min((a * hv + b) % {p}) AS mh
  FROM h CROSS JOIN perms GROUP BY 1, 2
),
wide AS (SELECT doc_id, {mh_cols} FROM sig GROUP BY doc_id),
bandlong AS (
  SELECT doc_id, b.band,
         ('0x' || substr(md5(CASE b.band {band_cases} END), 1, 8))::BIGINT AS bh
  FROM wide, (SELECT unnest(generate_series(0, {bands - 1})) AS band) b
),
cands AS (
  SELECT DISTINCT a.doc_id AS id1, c.doc_id AS id2
  FROM bandlong a JOIN bandlong c ON a.band = c.band AND a.bh = c.bh
  WHERE a.doc_id < c.doc_id
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
inter AS (
  SELECT cand.id1, cand.id2, count(*) AS n_int
  FROM cands cand
  JOIN sh s1 ON s1.doc_id = cand.id1
  JOIN sh s2 ON s2.doc_id = cand.id2 AND s2.shingle = s1.shingle
  GROUP BY 1, 2
)
SELECT i.id1, i.id2,
       round(1e-9 + n_int / (z1.n_sh + z2.n_sh - n_int), 6) AS jaccard
FROM inter i
JOIN sizes z1 ON z1.doc_id = i.id1
JOIN sizes z2 ON z2.doc_id = i.id2
WHERE round(1e-9 + n_int / (z1.n_sh + z2.n_sh - n_int), 6) >= {threshold}
"""


ORACLES["minhash_lsh"] = _minhash_lsh_sql()


SQL_ANN_IVF = """
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
hashed AS (
  SELECT vec_id, e, ('0x' || substr(md5(vec_id::VARCHAR), 1, 8))::BIGINT AS h
  FROM v
),
cents AS (
  SELECT row_number() OVER (ORDER BY h, vec_id) - 1 AS centroid_id, e AS cent
  FROM (SELECT * FROM hashed ORDER BY h, vec_id LIMIT 8)
),
assign AS (
  SELECT vec_id, e, centroid_id,
         row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, centroid_id ASC) AS rk
  FROM (
    SELECT v.vec_id, v.e, c.centroid_id,
           list_dot_product(v.e, c.cent)
           / nullif(sqrt(list_dot_product(v.e, v.e)) * sqrt(list_dot_product(c.cent, c.cent)), 0) AS csim
    FROM v CROSS JOIN cents c
  )
),
assigned AS (SELECT vec_id AS nbr_id, e AS cv, centroid_id FROM assign WHERE rk = 1),
probes AS (
  SELECT vec_id AS query_id, e AS qv, centroid_id
  FROM assign WHERE vec_id < 10 AND rk <= 4
),
scored AS (
  SELECT p.query_id, a.nbr_id,
         round(1e-9 + list_dot_product(a.cv, p.qv)
               / nullif(sqrt(list_dot_product(a.cv, a.cv)) * sqrt(list_dot_product(p.qv, p.qv)), 0), 6) AS sim
  FROM assigned a JOIN probes p ON a.centroid_id = p.centroid_id
  WHERE p.query_id != a.nbr_id
)
SELECT query_id, nbr_id, sim,
       CAST(row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, nbr_id ASC) AS BIGINT) AS rnk
FROM scored QUALIFY rnk <= 5
"""

ORACLES["ann_ivf"] = SQL_ANN_IVF


def q_ustar_mp(spark, sf_dir):
    """USTAR moving-point threshold detection (Papale 2006 / ONEFlux core)
    over a deterministic flux-like derivation of the events table: USTAR and
    TA are decorrelated modular transforms of the microsecond timestamp, NEE
    saturates at USTAR=0.3 plus md5-seeded jitter, all records nighttime.

    Gate runs ta_classes=1 so the SQL oracle can replay the ENTIRE pipeline
    (season split incl. the end-of-period month shift, tie-aware equal-count
    USTAR classes via rank-boundary values, empty-class 0.0 quirk, Fw2
    forward-mode plateau, first-class and correlation checks, period/season
    minimums). The full 7-TA-class stratification + bootstrap is covered by
    tests/test_ustar.py against a positional tie-extension oracle."""
    from diive_spark.operators import ustar
    from diive_spark.operators.dedup import h32
    ev = _t(spark, sf_dir, "events")
    # calendar-derived microsecond position: tz-INDEPENDENT for the NTZ
    # input (unix_micros(cast) would shift with the session timezone; the
    # sub-second part alone is invariant, whole-second parts are not)
    eu = (
        (F.dayofmonth("ts") * 86400 + F.hour("ts") * 3600
         + F.minute("ts") * 60 + F.second("ts")).cast("bigint") * 1000000
        + F.unix_micros(F.col("ts").cast("timestamp")) % 1000000
    )
    us = (eu % 79999) / F.lit(100000.0)
    jitter = h32(F.col("event_id").cast("string")) / F.lit(4294967296.0) - F.lit(0.5)
    base = ev.select(
        F.lit("all").alias("k"),
        F.col("ts"),
        us.alias("USTAR"),
        ((eu % 991) / F.lit(991.0) * 20.0).alias("TA"),
        F.lit(0.0).alias("SW_IN"),
        # ramp to the knee at USTAR=0.3, then a GENTLE DECLINE: per-class
        # decrement ~0.08 >> class-mean jitter ~0.006, so the Fw2 plateau
        # comparisons have robust margins (no cross-engine coin flips) and
        # detection deterministically fires at the knee
        (F.least(us, F.lit(0.3)) / F.lit(0.3) * 5.0
         - F.greatest(us - F.lit(0.3), F.lit(0.0)) * 2.0 + jitter).alias("NEE"),
    )
    thr = ustar.ustar_mp_thresholds(
        base, ["k"], "ts", "NEE", "TA", "USTAR", "SW_IN", ta_classes=1,
    )
    return thr.select("season", "n_night", _r6("threshold").alias("threshold"))


SQL_USTAR_MP = """
WITH pos AS (
  SELECT *, (day(ts) * 86400 + hour(ts) * 3600 + minute(ts) * 60
             + CAST(floor(second(ts)) AS BIGINT)) * 1000000
            + (epoch_us(ts) % 1000000) AS eu
  FROM events
),
src AS (
  SELECT (eu % 79999) / 100000.0 AS ustar,
         (eu % 991) / 991.0 * 20.0 AS ta,
         least((eu % 79999) / 100000.0, 0.3) / 0.3 * 5.0
           - greatest((eu % 79999) / 100000.0 - 0.3, 0.0) * 2.0
           + (('0x' || substr(md5(event_id::VARCHAR), 1, 8))::BIGINT
              / 4294967296.0 - 0.5) AS nee,
         CASE WHEN day(ts) = 1 AND hour(ts) = 0 AND minute(ts) = 0
              THEN CASE WHEN month(ts) = 1 THEN 12 ELSE month(ts) - 1 END
              ELSE month(ts) END AS m
  FROM pos
),
seasoned AS (SELECT *, CAST((m - 1) // 3 + 1 AS INTEGER) AS season FROM src),
tot AS (SELECT count(*) AS n FROM seasoned),
scount AS (SELECT season, count(*) AS n_night FROM seasoned GROUP BY 1),
eligible AS (
  SELECT season FROM scount, tot WHERE n_night >= 100 AND tot.n >= 3000
),
cors AS (SELECT season, corr(ta, ustar) AS c FROM seasoned GROUP BY 1),
ranked AS (
  SELECT s.*, row_number() OVER (PARTITION BY s.season ORDER BY ustar) AS rn,
         count(*) OVER (PARTITION BY s.season) AS cnt
  FROM seasoned s JOIN eligible e ON e.season = s.season
),
bvals AS (
  SELECT season, ustar AS bv FROM ranked
  WHERE rn % (cnt // 20) = 0 AND rn // (cnt // 20) BETWEEN 1 AND 19
),
cls AS (
  SELECT r.season, r.ustar, r.nee,
         (SELECT count(*) FROM bvals b
          WHERE b.season = r.season AND b.bv < r.ustar) AS uc
  FROM ranked r
),
cmeans0 AS (
  SELECT season, uc, avg(ustar) AS um, avg(nee) AS fm FROM cls GROUP BY 1, 2
),
grid AS (
  SELECT e.season, g.c AS uc
  FROM eligible e, (SELECT unnest(generate_series(0, 19)) AS c) g
),
cmeans AS (
  SELECT g.season, g.uc, coalesce(m.um, 0.0) AS um, coalesce(m.fm, 0.0) AS fm
  FROM grid g LEFT JOIN cmeans0 m ON m.season = g.season AND m.uc = g.uc
),
fw AS (
  SELECT season, uc, um, fm,
         avg(fm) OVER w1 AS m1, count(fm) OVER w1 AS n1,
         avg(fm) OVER w2 AS m2, count(fm) OVER w2 AS n2,
         lead(fm) OVER (PARTITION BY season ORDER BY uc) AS fnext
  FROM cmeans
  WINDOW w1 AS (PARTITION BY season ORDER BY uc
                ROWS BETWEEN 1 FOLLOWING AND 10 FOLLOWING),
         w2 AS (PARTITION BY season ORDER BY uc
                ROWS BETWEEN 2 FOLLOWING AND 11 FOLLOWING)
),
hits AS (
  SELECT season, uc, um FROM fw
  WHERE uc <= 18 AND n1 > 0 AND n2 > 0 AND fm >= m1 AND fnext >= m2
),
thr AS (SELECT season, min_by(um, uc) AS threshold FROM hits GROUP BY 1),
u0 AS (SELECT season, um AS um0 FROM cmeans WHERE uc = 0)
SELECT CAST(s.season AS INTEGER) AS season,
       coalesce(sc.n_night, 0) AS n_night,
       CASE WHEN e.season IS NOT NULL AND abs(co.c) <= 0.5 AND u0.um0 <= 0.2
            THEN round(1e-9 + t.threshold, 6) END AS threshold
FROM (SELECT unnest(generate_series(1, 4)) AS season) s
LEFT JOIN scount sc ON sc.season = s.season
LEFT JOIN eligible e ON e.season = s.season
LEFT JOIN cors co ON co.season = s.season
LEFT JOIN thr t ON t.season = s.season
LEFT JOIN u0 ON u0.season = s.season
"""


def q_rank_drivers(spark, sf_dir):
    """rank_drivers (correlation.py:18-105): rank candidate driver series by
    max |Pearson r| against the click series over lags -2..2, on the hourly
    pivot of per-type mean values."""
    from diive_spark.operators import features
    ev = _t(spark, sf_dir, "events")
    hourly = (
        ev.groupBy(F.date_trunc("hour", "ts").alias("h"))
        .pivot("event_type", ["click", "view", "error", "purchase"])
        .agg(F.avg("value"))
    )
    out = features.rank_drivers(hourly, "h", "click",
                                ["view", "error", "purchase"], max_lag=2)
    return out.select(
        "feature",
        _r6("max_abs_corr").alias("max_abs_corr_v"),
        F.col("best_lag").cast("int").alias("best_lag"),
        F.col("rank").cast("bigint").alias("rank"),
    )


def _rank_drivers_sql(feats=("view", "error", "purchase"), max_lag=2):
    shifted, rows = [], []
    for f in feats:
        for lag in range(-max_lag, max_lag + 1):
            name = f"{f}_l{lag + max_lag}"
            if lag > 0:
                expr = f"lag({f}, {lag}) OVER (ORDER BY h)"
            elif lag < 0:
                expr = f"lead({f}, {-lag}) OVER (ORDER BY h)"
            else:
                expr = f
            shifted.append(f"{expr} AS {name}")
            rows.append(f"SELECT '{f}' AS feature, {lag} AS lag, "
                        f"abs(corr(click, {name})) AS abs_corr FROM l")
    cases = ",\n         ".join(
        f"avg(CASE WHEN event_type = '{t}' THEN value END) AS {t}"
        for t in ("click", *feats)
    )
    return f"""
WITH h AS (
  SELECT date_trunc('hour', ts) AS h,
         {cases}
  FROM events GROUP BY 1
),
l AS (SELECT *, {", ".join(shifted)} FROM h),
stacked AS ({" UNION ALL ".join(rows)}),
best AS (
  SELECT feature, max(abs_corr) AS max_corr, arg_max(lag, abs_corr) AS best_lag
  FROM stacked GROUP BY 1
)
SELECT feature, round(1e-9 + max_corr, 6) AS max_abs_corr_v,
       CAST(best_lag AS INTEGER) AS best_lag,
       CAST(dense_rank() OVER (ORDER BY max_corr DESC) AS BIGINT) AS rank
FROM best
"""


QUERIES["rank_drivers"] = q_rank_drivers
ORACLES["rank_drivers"] = _rank_drivers_sql()


def q_quadrature_cumulative(spark, sf_dir):
    """Uncertainty-propagation cumulative sqrt(cumsum(x^2)) per event_type
    (SURVEY §2.4; diive CLAUDE.md uncertainty idiom), event_id tie-break.

    The gate feeds INTEGER centi-units (round(value*100)) so every term
    and every partial sum of squares is an exactly-representable double
    (≤ 8e12 « 2^53): the running sum is then bit-identical regardless of
    each engine's window-sum association (Spark sequential vs DuckDB
    segment tree) — at sf0.1 the raw-double version flipped one 6th
    decimal in ~96k cumulative rows."""
    from diive_spark.operators import features
    ev = _t(spark, sf_dir, "events").withColumn(
        "value", F.round(F.col("value") * 100, 0))
    out = features.quadrature_cumulative(ev, ["event_type"], "ts", "value",
                                         tiebreak_cols=["event_id"])
    return out.select("event_id", "event_type",
                      _r6("cum_quadrature").alias("cumq_v"))


SQL_QUADRATURE_CUMULATIVE = """
SELECT event_id, event_type,
       round(1e-9 + sqrt(sum(round(value * 100) * round(value * 100)) OVER (
           PARTITION BY event_type ORDER BY ts, event_id
           ROWS UNBOUNDED PRECEDING)), 6) AS cumq_v
FROM events
"""

QUERIES["quadrature_cumulative"] = q_quadrature_cumulative
ORACLES["quadrature_cumulative"] = SQL_QUADRATURE_CUMULATIVE

QUERIES["ustar_mp"] = q_ustar_mp
ORACLES["ustar_mp"] = SQL_USTAR_MP


def q_random_uncertainty(spark, sf_dir):
    """PAS20 random uncertainty, ONEFlux methods 1+2, over an hourly
    flux-like rollup of events (per event_type series): method 1 = sample SD
    of measured fluxes in a ±7-day / ±1-hour-of-day meteo-similar window,
    method 2 = median of method-1 uncertainties of ±20%-similar fluxes in
    ±14 days. Meteorology (TA/VPD/SWIN) is derived from calendar hour
    positions (tz-independent, exact in both engines); a deterministic
    hour%7 mask creates the flux gaps; a rare always-unmeasured class with
    50x flux magnitude sits outside every ±20% band, so methods 1 and 2
    both fail there and METHOD 4 (the flux-rank-neighbour fallback) must
    serve it — the gate certifies the 1 -> 2 -> 4 hierarchy. The engine
    path is slab+halo grouped-map kernels for 1/2 and the flux-rank window
    for 4; the SQL oracle is the equivalent self-joins + a rank-window
    median. Method 3 (whole-record band median; needs >28-day isolation to
    differ from 2 on this 30-day corpus) is pytest-oracled in
    tests/test_uncertainty.py."""
    from diive_spark.operators import uncertainty as un
    ev = _t(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hts")
    ).agg(F.avg("value").alias("gf"))
    # meteorology must be AUTOCORRELATED for similarity windows to match
    # anything (real TA/VPD persist for days): piecewise-constant blocks,
    # all integer-derived -> bit-exact in both engines
    day, hour = F.dayofmonth("hts").cast("bigint"), F.hour("hts").cast("bigint")
    hix = day * 24 + hour
    extreme = hix % 97 == 0  # out-of-band class: 50x flux, never measured
    gf2 = F.when(extreme, F.col("gf") * 50.0).otherwise(F.col("gf"))
    src = hourly.select(
        "event_type", F.col("hts").alias("ts"),
        F.when((F.hour("hts") % 7 == 3) | extreme, None).otherwise(gf2).alias("flux"),
        gf2.alias("gf"),
        ((day / F.lit(5)).cast("bigint") % 4 * 5.0).alias("ta"),
        ((day / F.lit(3)).cast("bigint") % 5 * 0.04).alias("vpd"),
        (hour * 25.0).alias("swin"),
    )
    out = un.random_uncertainty_pas20(
        src, ["event_type"], "ts", "flux", "gf", "ta", "vpd", "swin",
        methods=(1, 2, 4),
    )
    method = (
        F.when(F.col("flux_RANDUNC").isNull(), None)
        .when(F.col("RANDUNC_N_M4").isNotNull(), 4)
        .when(F.col("RANDUNC_N_M2").isNotNull(), 2).otherwise(1)
    )
    return out.select(
        "event_type", "ts",
        _r6("flux_RANDUNC").alias("randunc"),
        method.cast("int").alias("method"),
    )


SQL_RANDOM_UNCERTAINTY = """
WITH hourly0 AS (
  SELECT event_type, date_trunc('hour', ts) AS hts, avg(value) AS gf0
  FROM events GROUP BY 1, 2
),
hourly AS (
  SELECT event_type, hts,
         CASE WHEN (day(hts) * 24 + hour(hts)) % 97 = 0 THEN gf0 * 50.0
              ELSE gf0 END AS gf,
         CASE WHEN hour(hts) % 7 = 3
                   OR (day(hts) * 24 + hour(hts)) % 97 = 0 THEN NULL
              ELSE gf0 END AS flux
  FROM hourly0
),
src AS (
  SELECT event_type, hts, flux, gf,
         (day(hts) // 5 % 4) * 5.0 AS ta,
         (day(hts) // 3 % 5) * 0.04 * 10.0 AS vpd_hpa,
         hour(hts) * 25.0 AS swin
  FROM hourly
),
m1 AS (
  SELECT i.event_type, i.hts,
         count(j.flux) AS n1,
         CASE WHEN count(j.flux) >= 6 THEN stddev_samp(j.flux) END AS unc1
  FROM src i LEFT JOIN src j
    ON j.event_type = i.event_type
   AND j.flux IS NOT NULL
   AND abs(epoch(j.hts) - epoch(i.hts)) <= 7 * 86400
   AND (CASE WHEN (hour(i.hts) + 23) % 24 <= (hour(i.hts) + 1) % 24
             THEN hour(j.hts) BETWEEN (hour(i.hts) + 23) % 24
                                  AND (hour(i.hts) + 1) % 24
             ELSE hour(j.hts) >= (hour(i.hts) + 23) % 24
                  OR hour(j.hts) <= (hour(i.hts) + 1) % 24 END)
   AND abs(j.ta - i.ta) < 2.5
   AND abs(j.vpd_hpa - i.vpd_hpa) < 5.0
   AND abs(j.swin - i.swin) < least(greatest(i.swin, 20.0), 50.0)
  WHERE i.flux IS NOT NULL
  GROUP BY 1, 2
),
need AS (
  SELECT s.*, m1.unc1 FROM src s
  LEFT JOIN m1 ON m1.event_type = s.event_type AND m1.hts = s.hts
),
m2 AS (
  SELECT i.event_type, i.hts, median(j.unc1) AS unc2
  FROM need i JOIN need j
    ON j.event_type = i.event_type
   AND j.unc1 IS NOT NULL
   AND abs(epoch(j.hts) - epoch(i.hts)) <= 14 * 86400
   AND j.gf BETWEEN i.gf - greatest(abs(i.gf) * 0.2, 2.0)
                AND i.gf + greatest(abs(i.gf) * 0.2, 2.0)
  WHERE i.unc1 IS NULL
  GROUP BY 1, 2
),
after2 AS (
  SELECT n.event_type, n.hts, n.gf, coalesce(n.unc1, m2.unc2) AS unc12,
         CASE WHEN n.unc1 IS NOT NULL THEN 1
              WHEN m2.unc2 IS NOT NULL THEN 2 END AS method12
  FROM need n
  LEFT JOIN m2 ON m2.event_type = n.event_type AND m2.hts = n.hts
),
m4 AS (
  SELECT event_type, hts, unc12, method12,
         median(unc12) OVER (PARTITION BY event_type
                             ORDER BY gf NULLS LAST, hts
                             ROWS BETWEEN 5 PRECEDING AND 4 FOLLOWING) AS unc4
  FROM after2
)
SELECT event_type, hts AS ts,
       round(1e-9 + coalesce(unc12, unc4), 6) AS randunc,
       CASE WHEN unc12 IS NOT NULL THEN method12
            WHEN unc4 IS NOT NULL THEN 4 END AS method
FROM m4
"""

QUERIES["random_uncertainty"] = q_random_uncertainty
ORACLES["random_uncertainty"] = SQL_RANDOM_UNCERTAINTY


def q_bin_fit_linear(spark, sf_dir):
    """BinFitterCP linear path (reference fits/fitter.py:17): equal-width
    x bins -> per-bin means -> least-squares line -> 95% prediction band
    (t-quantile formula, fitter.py:92). The fit here is expressed as pure
    Spark column expressions over the centered bin sums (one tiny broadcast
    of the 6 sufficient statistics) so the ENTIRE pipeline incl. the band is
    SQL-oracle-able; tests/test_fits.py proves the operator's lstsq path
    (bin_fit_cp) equals these closed forms and covers the quadratic/cubic
    fits + parameter covariance CI. dof is fixed at 12-2=10 (bin occupancy
    over value in [0,120] verified at both gated SFs); the same t quantile
    constant is embedded in both engines."""
    from diive_spark.operators import fits
    from diive_spark.operators.dedup import h32
    ev = _t(spark, sf_dir, "events")
    jit = h32(F.col("event_id").cast("string")) / F.lit(4294967296.0) - F.lit(0.5)
    src = ev.select(
        F.col("value").alias("x"),
        (F.col("value") * 0.3 + jit * 20.0).alias("y"),
    )
    bins = fits.bin_aggregate_xy(src, "x", "y", 12, "mean",
                                 x_range=(0.0, 120.0))
    stats = bins.agg(
        F.count(F.lit(1)).cast("double").alias("_n"),
        F.sum("x_agg").alias("_sx"), F.sum("y_agg").alias("_sy"),
        F.sum(F.col("x_agg") * F.col("y_agg")).alias("_sxy"),
        F.sum(F.col("x_agg") * F.col("x_agg")).alias("_sxx"),
        F.sum(F.col("y_agg") * F.col("y_agg")).alias("_syy"),
    )
    j = bins.crossJoin(F.broadcast(stats))
    n, sx, sy = F.col("_n"), F.col("_sx"), F.col("_sy")
    sxx_c = F.col("_sxx") - sx * sx / n
    sxy_c = F.col("_sxy") - sx * sy / n
    syy_c = F.col("_syy") - sy * sy / n
    slope = sxy_c / sxx_c
    icept = (sy - slope * sx) / n
    rss = syy_c - slope * sxy_c
    se = F.sqrt(rss / (n - 2))
    dx = F.col("x_agg") - sx / n
    dy = F.lit(fits.t_ppf(0.975, 10)) * se * F.sqrt(1.0 + 1.0 / n + dx * dx / sxx_c)
    fit_y = slope * F.col("x_agg") + icept
    return j.select(
        "bin", "counts",
        _r6("x_agg").alias("x_mean"), _r6("y_agg").alias("y_mean"),
        _r6(fit_y).alias("fit_y"),
        _r6(fit_y - dy).alias("lo_pred"), _r6(fit_y + dy).alias("hi_pred"),
    )


def _bin_fit_linear_sql():
    from diive_spark.operators.fits import t_ppf
    q = repr(t_ppf(0.975, 10))
    return f"""
WITH src AS (
  SELECT value AS x,
         value * 0.3 + (('0x' || substr(md5(event_id::VARCHAR), 1, 8))::BIGINT
                        / 4294967296.0 - 0.5) * 20.0 AS y
  FROM events WHERE value >= 0.0 AND value <= 120.0
),
b AS (
  SELECT CASE WHEN floor(x / 10.0) >= 12 THEN 11
              ELSE CAST(floor(x / 10.0) AS INTEGER) END AS bin,
         avg(x) AS x_mean, avg(y) AS y_mean, count(*) AS counts
  FROM src GROUP BY 1
),
st AS (
  SELECT CAST(count(*) AS DOUBLE) AS n,
         sum(x_mean) AS sx, sum(y_mean) AS sy,
         sum(x_mean * y_mean) AS sxy, sum(x_mean * x_mean) AS sxx,
         sum(y_mean * y_mean) AS syy
  FROM b
),
f AS (
  SELECT b.*, n, sx, sy,
         (sxy - sx * sy / n) / (sxx - sx * sx / n) AS slope,
         sxx - sx * sx / n AS sxx_c,
         (syy - sy * sy / n) - (sxy - sx * sy / n) / (sxx - sx * sx / n)
           * (sxy - sx * sy / n) AS rss
  FROM b, st
)
SELECT bin, counts,
       round(1e-9 + x_mean, 6) AS x_mean, round(1e-9 + y_mean, 6) AS y_mean,
       round(1e-9 + slope * x_mean + (sy - slope * sx) / n, 6) AS fit_y,
       round(1e-9 + slope * x_mean + (sy - slope * sx) / n
             - {q} * sqrt(rss / (n - 2))
               * sqrt(1.0 + 1.0 / n + (x_mean - sx / n) * (x_mean - sx / n)
                      / sxx_c), 6) AS lo_pred,
       round(1e-9 + slope * x_mean + (sy - slope * sx) / n
             + {q} * sqrt(rss / (n - 2))
               * sqrt(1.0 + 1.0 / n + (x_mean - sx / n) * (x_mean - sx / n)
                      / sxx_c), 6) AS hi_pred
FROM f
"""


QUERIES["bin_fit_linear"] = q_bin_fit_linear
ORACLES["bin_fit_linear"] = _bin_fit_linear_sql()


def q_ale_linear(spark, sf_dir):
    """First-order ALE (Apley & Zhu; reference driveranalysis/ale.py:192)
    of an interaction model f = 0.3x - 0.05xz + z over the events table:
    x = value, z = a calendar-derived second driver. The model is a pure
    column expression (the engine's model-runtime-free ALE contract), the
    interaction term makes the per-bin delta depend on the DATA (mean z per
    bin), and the whole estimator — binning, per-bin deltas, edge
    accumulation, data-weighted centering — is replayed by the SQL oracle.
    Bin edges are pinned (every bin populated at both gated SFs): the
    interpolated-quantile grid is NOT bit-identical across engines at every
    probability (verified: 1-ulp disagreement at p=0.625 flips boundary
    rows), so the quantile-edge path is certified by grid_agg_2d_quantile +
    pytest instead."""
    from diive_spark.operators import ale
    ev = _t(spark, sf_dir, "events")
    day, hour = F.dayofmonth("ts").cast("bigint"), F.hour("ts").cast("bigint")
    src = ev.select(
        F.col("value").alias("x"),
        (((day * 24 + hour) % 37) / 37.0 * 10.0).alias("z"),
    )

    def predict(f):
        return 0.3 * f["x"] - 0.05 * f["x"] * f["z"] + f["z"]

    out = ale.accumulated_local_effects(
        src, predict, "x", ["x", "z"],
        edges=[0.0, 5.0, 15.0, 30.0, 50.0, 80.0, 120.0, 200.0, 500.0])
    return out.select(
        "edge_idx", _r6("edge").alias("edge"), _r6("ale").alias("ale"),
        "bin_count",
    )


SQL_ALE_LINEAR = """
WITH src AS (
  SELECT value AS x,
         ((day(ts) * 24 + hour(ts)) % 37) / 37.0 * 10.0 AS z
  FROM events WHERE value IS NOT NULL
),
e AS (SELECT [0.0, 5.0, 15.0, 30.0, 50.0, 80.0, 120.0, 200.0, 500.0] AS ed),
b AS (
  SELECT CAST(1 + (x > ed[2])::INT + (x > ed[3])::INT + (x > ed[4])::INT
            + (x > ed[5])::INT + (x > ed[6])::INT + (x > ed[7])::INT
            + (x > ed[8])::INT AS INTEGER) AS bin,
         x, z, ed
  FROM src, e
),
d AS (
  SELECT bin,
         avg((0.3 * ed[bin + 1] - 0.05 * ed[bin + 1] * z + z)
           - (0.3 * ed[bin] - 0.05 * ed[bin] * z + z)) AS delta,
         count(*) AS bin_count
  FROM b GROUP BY bin, ed
),
acc AS (
  SELECT bin, bin_count,
         sum(delta) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS ale_hi,
         sum(delta) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) - delta AS ale_lo
  FROM d
),
wm AS (
  SELECT sum((ale_lo + ale_hi) / 2.0 * bin_count) / sum(bin_count) AS w
  FROM acc
),
edges AS (
  SELECT bin AS edge_idx, ale_hi - w AS ale, bin_count
  FROM acc, wm
  UNION ALL
  SELECT 0, 0.0 - w, NULL FROM wm
)
SELECT g.edge_idx,
       round(1e-9 + e.ed[g.edge_idx + 1], 6) AS edge,
       round(1e-9 + g.ale, 6) AS ale,
       g.bin_count
FROM edges g, e
"""

QUERIES["ale_linear"] = q_ale_linear
ORACLES["ale_linear"] = SQL_ALE_LINEAR


def q_flux_partition_night(spark, sf_dir):
    """Nighttime NEE partitioning (Reichstein/REddyProc shape,
    operators/fluxpart.py) over a deterministic Lloyd-Taylor derivation of
    the hourly events rollup: rref_t = 2 + mean(value)/100 (data-driven),
    TA a modular calendar transform, NEE = rref_t * exp(150*b(TA)) with
    md5-seeded multiplicative jitter; hours 18-06 are nighttime. The SQL
    oracle replays the ENTIRE pipeline — per-window log-space E0 fits with
    the 5/95 residual-trim refit, the +-1-SD validity bounds, best-3-by-SD
    averaging, through-origin Rref anchors, the anchor interpolation with
    constant ends, and RECO/GPP composition — so the flagship flux operator
    is value-certified end to end."""
    from diive_spark.operators import fluxpart
    from diive_spark.operators.dedup import h32
    ev = _t(spark, sf_dir, "events")
    hourly = ev.groupBy(F.date_trunc("hour", "ts").alias("hts")).agg(
        F.avg("value").alias("v"))
    day, hour = F.dayofmonth("hts").cast("bigint"), F.hour("hts").cast("bigint")
    ta = ((day * 24 + hour) % 89) / 89.0 * 20.0
    b = fluxpart._lt_b(ta)
    jit = 1.0 + (h32(F.col("hts").cast("string")) / F.lit(4294967296.0)
                 - F.lit(0.5)) * 0.1
    src = hourly.select(
        F.lit("all").alias("k"),
        F.col("hts").alias("ts"),
        ((2.0 + F.col("v") / 100.0) * F.exp(150.0 * b) * jit).alias("NEE"),
        ta.alias("TA"),
        ((hour < 6) | (hour >= 18)).cast("int").alias("NIGHT"),
    )
    out = fluxpart.partition_nee_nighttime(src, ["k"], "ts", "NEE", "TA",
                                           "NIGHT")
    return out.select(
        "ts", _r6("E0").alias("e0"), _r6("RREF").alias("rref"),
        _r6("RECO").alias("reco"), _r6("GPP").alias("gpp"),
    )


def _flux_partition_night_sql():
    b1 = repr(1.0 / (288.15 - 227.13))  # the operator's Python-folded constant
    return f"""
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS hts, avg(value) AS v FROM events GROUP BY 1
),
src AS (
  SELECT hts AS ts,
         ((day(hts) * 24 + hour(hts)) % 89) / 89.0 * 20.0 AS ta,
         CASE WHEN hour(hts) < 6 OR hour(hts) >= 18 THEN 1 ELSE 0 END AS night,
         (2.0 + v / 100.0)
           * exp(150.0 * ({b1} - 1.0 / ((((day(hts) * 24 + hour(hts)) % 89)
                                          / 89.0 * 20.0 + 273.15) - 227.13)))
           * (1.0 + (('0x' || substr(md5(hts::VARCHAR), 1, 8))::BIGINT
                     / 4294967296.0 - 0.5) * 0.1) AS nee
  FROM hourly
),
base AS (
  SELECT *, {b1} - 1.0 / ((ta + 273.15) - 227.13) AS b,
         -- day origin: first NIGHT-VALID date (the engine's shared grid)
         datediff('day', (SELECT min(ts::DATE) FROM src
                          WHERE night = 1 AND nee IS NOT NULL
                            AND ta IS NOT NULL), ts::DATE) + 1 AS d
  FROM src
),
nightv AS (
  SELECT * FROM base
  WHERE night = 1 AND nee IS NOT NULL AND ta IS NOT NULL
),
nightr AS (SELECT * FROM nightv WHERE nee > 0),
ew AS (
  SELECT n.*, ln(nee) AS y, CAST(w.k AS INTEGER) AS win
  FROM nightr n,
       LATERAL unnest(generate_series(
         greatest(CAST(ceil((d - 15) / 5.0) AS BIGINT), 0),
         CAST(floor((d - 1) / 5.0) AS BIGINT))) AS w(k)
),
pa AS (
  SELECT win, CAST(count(*) AS DOUBLE) AS n,
         sum(b) AS sx, sum(y) AS sy, sum(b * y) AS sxy,
         sum(b * b) AS sxx, max(ta) - min(ta) AS trange
  FROM ew GROUP BY 1
  HAVING count(*) > 6 AND max(ta) - min(ta) >= 5.0
),
fit0 AS (
  SELECT win,
         (sxy - sx * sy / n) / nullif(sxx - sx * sx / n, 0.0) AS e0_0,
         (sy - (sxy - sx * sy / n) / nullif(sxx - sx * sx / n, 0.0) * sx) / n AS i0
  FROM pa
),
resid AS (
  SELECT ew.*, ew.y - (f.i0 + f.e0_0 * ew.b) AS r
  FROM ew JOIN fit0 f ON f.win = ew.win
),
qs AS (
  SELECT win, quantile_cont(r, 0.05) AS rlo, quantile_cont(r, 0.95) AS rhi
  FROM resid GROUP BY 1
),
trimmed AS (
  SELECT resid.* FROM resid JOIN qs ON qs.win = resid.win
  WHERE r BETWEEN rlo AND rhi
),
pb AS (
  SELECT win, CAST(count(*) AS DOUBLE) AS n,
         sum(b) AS sx, sum(y) AS sy, sum(b * y) AS sxy,
         sum(b * b) AS sxx, sum(y * y) AS syy
  FROM trimmed GROUP BY 1
),
fits AS (
  SELECT win,
         (sxy - sx * sy / n) / nullif(sxx - sx * sx / n, 0.0) AS e0w,
         sqrt(greatest((syy - sy * sy / n)
                       - (sxy - sx * sy / n) / nullif(sxx - sx * sx / n, 0.0)
                         * (sxy - sx * sy / n), 0.0)
              / nullif(n - 2, 0.0) / nullif(sxx - sx * sx / n, 0.0)) AS sd
  FROM pb
),
valid AS (
  SELECT * FROM fits
  WHERE e0w IS NOT NULL AND sd IS NOT NULL
    AND e0w - sd > 30.0 AND e0w + sd < 350.0
),
best AS (
  SELECT e0w FROM (
    SELECT e0w, row_number() OVER (ORDER BY sd, win) AS rk FROM valid
  ) WHERE rk <= 3
),
e0f AS (
  SELECT CASE WHEN count(*) >= 3 THEN round(avg(e0w), 2) END AS e0 FROM best
),
rw AS (
  -- Rref stage: NIGHT-VALID rows, no positivity filter (negative anchor
  -- slopes are dropped AFTER the fit, as in the engine/reference)
  SELECT n.ts, n.nee, exp(e.e0 * n.b) AS f, n.d, CAST(w.k AS INTEGER) AS win
  FROM nightv n, e0f e,
       LATERAL unnest(generate_series(
         greatest(CAST(ceil((d - 7) / 4.0) AS BIGINT), 0),
         CAST(floor((d - 1) / 4.0) AS BIGINT))) AS w(k)
  WHERE e.e0 IS NOT NULL
),
anchors AS (
  SELECT win, sum(f * nee) / nullif(sum(f * f), 0.0) AS rref,
         to_timestamp(avg(epoch(ts)))::TIMESTAMP AS ats
  FROM rw GROUP BY 1
  HAVING count(*) > 2 AND sum(f * nee) / nullif(sum(f * f), 0.0) >= 0.0
),
un AS (
  SELECT ts, CAST(NULL AS DOUBLE) AS rref, 0 AS is_anchor FROM base
  UNION ALL
  SELECT ats AS ts, rref, 1 AS is_anchor FROM anchors
),
marked AS (
  SELECT *,
    last_value(rref IGNORE NULLS) OVER
      (ORDER BY ts, is_anchor DESC ROWS UNBOUNDED PRECEDING) AS pv,
    last_value(CASE WHEN rref IS NOT NULL THEN floor(epoch(ts)) END IGNORE NULLS) OVER
      (ORDER BY ts, is_anchor DESC ROWS UNBOUNDED PRECEDING) AS pt,
    first_value(rref IGNORE NULLS) OVER
      (ORDER BY ts, is_anchor DESC
       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
    first_value(CASE WHEN rref IS NOT NULL THEN floor(epoch(ts)) END IGNORE NULLS) OVER
      (ORDER BY ts, is_anchor DESC
       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
  FROM un
),
interp AS (
  SELECT ts,
         CASE WHEN pv IS NOT NULL AND nv IS NOT NULL
              -- floor: Spark's unix_timestamp truncates to whole seconds
              THEN pv + (nv - pv) * coalesce(
                     (floor(epoch(ts)) - pt) / nullif(nt - pt, 0.0), 0.0)
              ELSE coalesce(pv, nv) END AS rref
  FROM marked WHERE is_anchor = 0
)
SELECT b.ts,
       round(1e-9 + e.e0, 6) AS e0,
       round(1e-9 + i.rref, 6) AS rref,
       round(1e-9 + i.rref * exp(e.e0 * b.b), 6) AS reco,
       round(1e-9 + i.rref * exp(e.e0 * b.b) - b.nee, 6) AS gpp
FROM base b
LEFT JOIN interp i ON i.ts = b.ts
CROSS JOIN e0f e
"""


QUERIES["flux_partition_night"] = q_flux_partition_night
ORACLES["flux_partition_night"] = _flux_partition_night_sql()


def q_ale_interaction_2d(spark, sf_dir):
    """Second-order (interaction) ALE surface (Apley & Zhu; reference
    driveranalysis/ale.py:258) of f = 0.1·x·z - 2z + x over events: per-cell
    mean second difference over the four corners, double cumulative
    accumulation, zero padding, double centering — all replayed by the SQL
    oracle. Edges pinned for cross-engine reproducibility (every cell
    populated at both gated SFs)."""
    from diive_spark.operators import ale
    ev = _t(spark, sf_dir, "events")
    day, hour = F.dayofmonth("ts").cast("bigint"), F.hour("ts").cast("bigint")
    src = ev.select(
        F.col("value").alias("x"),
        (((day * 24 + hour) % 37) / 37.0 * 10.0).alias("z"),
    )

    def predict(f):
        return 0.1 * f["x"] * f["z"] - 2.0 * f["z"] + f["x"]

    out = ale.accumulated_local_effects_2d(
        src, predict, "x", "z", ["x", "z"],
        x_edges=[0.0, 10.0, 30.0, 70.0, 500.0],
        y_edges=[0.0, 2.5, 5.0, 7.5, 10.0],
    )
    return out.select("x_idx", "y_idx", _r6("x_edge").alias("x_edge"),
                      _r6("y_edge").alias("y_edge"), _r6("ale").alias("ale"),
                      "cell_count")


SQL_ALE_INTERACTION_2D = """
WITH src AS (
  SELECT value AS x,
         ((day(ts) * 24 + hour(ts)) % 37) / 37.0 * 10.0 AS z
  FROM events WHERE value IS NOT NULL
),
e AS (SELECT [0.0, 10.0, 30.0, 70.0, 500.0] AS xe,
             [0.0, 2.5, 5.0, 7.5, 10.0] AS ye),
b AS (
  SELECT CAST(1 + (x > xe[2])::INT + (x > xe[3])::INT + (x > xe[4])::INT
         AS INTEGER) AS xb,
         CAST(1 + (z > ye[2])::INT + (z > ye[3])::INT + (z > ye[4])::INT
         AS INTEGER) AS yb,
         x, z, xe, ye
  FROM src, e
),
cells AS (
  SELECT xb, yb,
         avg((0.1 * xe[xb + 1] * ye[yb + 1] - 2.0 * ye[yb + 1] + xe[xb + 1])
           - (0.1 * xe[xb] * ye[yb + 1] - 2.0 * ye[yb + 1] + xe[xb])
           - (0.1 * xe[xb + 1] * ye[yb] - 2.0 * ye[yb] + xe[xb + 1])
           + (0.1 * xe[xb] * ye[yb] - 2.0 * ye[yb] + xe[xb])) AS d,
         count(*) AS cell_count
  FROM b GROUP BY xb, yb, xe, ye
),
grid AS (
  SELECT gx.x AS xb, gy.y AS yb
  FROM (SELECT unnest(generate_series(1, 4)) AS x) gx,
       (SELECT unnest(generate_series(1, 4)) AS y) gy
),
full_g AS (
  SELECT g.xb, g.yb, coalesce(c.d, 0.0) AS d, coalesce(c.cell_count, 0) AS cell_count
  FROM grid g LEFT JOIN cells c ON c.xb = g.xb AND c.yb = g.yb
),
acc AS (
  SELECT xb, yb, cell_count,
         sum(cx) OVER (PARTITION BY xb ORDER BY yb ROWS UNBOUNDED PRECEDING) AS a
  FROM (
    SELECT xb, yb, cell_count,
           sum(d) OVER (PARTITION BY yb ORDER BY xb ROWS UNBOUNDED PRECEDING) AS cx
    FROM full_g
  )
),
mat AS (
  SELECT xb AS x_idx, yb AS y_idx, a, cell_count FROM acc
  UNION ALL
  SELECT gx.x AS x_idx, gy.y AS y_idx, 0.0, NULL
  FROM (SELECT unnest(generate_series(0, 4)) AS x) gx,
       (SELECT unnest(generate_series(0, 4)) AS y) gy
  WHERE gx.x = 0 OR gy.y = 0
),
rm AS (SELECT y_idx, avg(a) AS r FROM mat GROUP BY 1),
cm AS (SELECT x_idx, avg(a) AS c FROM mat GROUP BY 1),
gm AS (SELECT avg(a) AS g FROM mat)
SELECT CAST(m.x_idx AS INTEGER) AS x_idx, CAST(m.y_idx AS INTEGER) AS y_idx,
       round(1e-9 + e.xe[m.x_idx + 1], 6) AS x_edge,
       round(1e-9 + e.ye[m.y_idx + 1], 6) AS y_edge,
       round(1e-9 + m.a - rm.r - cm.c + gm.g, 6) AS ale,
       m.cell_count
FROM mat m
JOIN rm ON rm.y_idx = m.y_idx
JOIN cm ON cm.x_idx = m.x_idx
CROSS JOIN gm CROSS JOIN e
"""

QUERIES["ale_interaction_2d"] = q_ale_interaction_2d
ORACLES["ale_interaction_2d"] = SQL_ALE_INTERACTION_2D


def q_histogram_fd(spark, sf_dir):
    """Freedman-Diaconis histogram (histogram.py:19-130 'fd' method:
    bin width = 2*IQR/n^(1/3)) over the events values."""
    from diive_spark.operators import sstats as ss
    ev = _t(spark, sf_dir, "events")
    out = ss.histogram(ev, "value", method="fd")
    return out.select(
        F.col("bin").cast("int").alias("bin"),
        F.col("counts").cast("bigint").alias("counts"),
        _r6("bin_start").alias("bin_start_v"),
    )


SQL_HISTOGRAM_FD = """
WITH st AS (
  SELECT min(value) AS lo, max(value) AS hi, count(value) AS n,
         quantile_cont(value, 0.75) - quantile_cont(value, 0.25) AS iqr
  FROM events
),
params AS (
  SELECT lo, hi, n,
         CASE WHEN 2 * iqr / pow(n, 1.0/3.0) > 0
              THEN greatest(1, CAST(floor((hi - lo) / (2 * iqr / pow(n, 1.0/3.0))) AS INTEGER))
              ELSE 1 END AS n_bins
  FROM st
),
binned AS (
  SELECT least(CAST(floor((value - p.lo) / ((p.hi - p.lo) / p.n_bins)) AS INTEGER),
               p.n_bins - 1) AS bin
  FROM events, params p
  WHERE value IS NOT NULL
),
bins AS (
  SELECT CAST(unnest(generate_series(0, (SELECT n_bins FROM params) - 1)) AS INTEGER) AS bin
)
SELECT b.bin,
       CAST(coalesce(count(x.bin), 0) AS BIGINT) AS counts,
       round(1e-9 + (SELECT lo FROM params)
             + b.bin * ((SELECT (hi - lo) / n_bins FROM params)), 6) AS bin_start_v
FROM bins b LEFT JOIN binned x ON x.bin = b.bin
GROUP BY b.bin
"""

QUERIES["histogram_fd"] = q_histogram_fd
ORACLES["histogram_fd"] = SQL_HISTOGRAM_FD


# ---------------------------------------------------------------------------
# true MDS gap-fill (ONEFlux marginal distribution sampling)
# ---------------------------------------------------------------------------

def q_mds_fill(spark, sf_dir):
    """True MDS gap-fill (operators/mds.py; reference gapfilling/mds.py:83 +
    similarity.py:150) over an hourly flux-like rollup of events, gridded to
    the global hour span per event_type. Deterministic hour%7 mask creates
    the gaps; piecewise-constant calendar-derived meteorology (TA blocks 5 K
    apart so only same-block matches, VPD blocks 3 hPa apart, SWIN = 25*hour
    with the ONEFlux target-clamped tolerance) drives similarity. The
    cascade is bounded to its first 6 passes (1@14d, 1@28d, 2@14d, 3@1d,
    3@3d, 3@5d) so the SQL oracle can enumerate the same pass list; the
    oracle replays the clipped-offset record windows with a generated
    offsets relation (clipping duplicates edge records — reproduced
    exactly), the strict-< tolerances, the >=2-sample acceptance and the
    first-success-wins pass priority."""
    from diive_spark.operators import mds as mdsmod
    ev = _t(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hts")
    ).agg(F.avg("value").alias("v"))
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"))
    grid_df = (
        ev.select("event_type").distinct()
        .crossJoin(F.broadcast(bounds))
        .select("event_type", F.explode(F.sequence(
            "lo", "hi", F.expr("interval 1 hour"))).alias("hts")))
    day = F.dayofmonth("hts").cast("bigint")
    hour = F.hour("hts").cast("bigint")
    work = (
        grid_df.join(hourly, on=["event_type", "hts"], how="left")
        .select(
            "event_type", "hts",
            F.when(hour % 7 == 3, None).otherwise(F.col("v")).alias("flux"),
            ((day / F.lit(5)).cast("bigint") % 4 * 5.0).alias("ta"),
            ((day / F.lit(3)).cast("bigint") % 5 * 3.0).alias("vpd"),
            (hour * 25.0).alias("swin"),
        ))
    out = mdsmod.mds_fill(work, ["event_type"], "hts", "flux",
                          "swin", "ta", "vpd", 24, max_passes=6)
    g = "flux_gfMDS"
    return out.select(
        "event_type", F.col("hts").alias("ts"),
        _r6(g).alias("filled_v"),
        F.col(f"{g}_METHOD").alias("method"),
        F.col(f"{g}_TW").alias("tw"),
        F.col(f"FLAG_{g}_ISFILLED").alias("flag"),
        F.col(f"{g}_N").alias("n_pool"),
    )


SQL_MDS_FILL = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hts, avg(value) AS v
  FROM events GROUP BY 1, 2
),
bounds AS (
  SELECT date_trunc('hour', min(ts)) AS lo, date_trunc('hour', max(ts)) AS hi
  FROM events
),
grid AS (
  SELECT et.event_type, gs.hts
  FROM (SELECT DISTINCT event_type FROM events) et,
       (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hts
        FROM bounds) gs
),
base AS (
  SELECT g.event_type, g.hts,
         CASE WHEN hour(g.hts) % 7 = 3 THEN NULL ELSE h.v END AS flux,
         (day(g.hts) // 5 % 4) * 5.0 AS ta,
         (day(g.hts) // 3 % 5) * 3.0 AS vpd,
         hour(g.hts) * 25.0 AS swin,
         hour(g.hts) AS hr,
         row_number() OVER (PARTITION BY g.event_type ORDER BY g.hts) - 1 AS rid
  FROM grid g
  LEFT JOIN hourly h ON h.event_type = g.event_type AND h.hts = g.hts
),
nk AS (SELECT event_type, max(rid) AS rmax FROM base GROUP BY 1),
passes(pno, method, tw) AS (
  VALUES (1, 1, 14), (2, 1, 28), (3, 2, 14), (4, 3, 1), (5, 3, 3), (6, 3, 5)
),
offs AS (
  SELECT p.pno, p.method, p.tw, unnest(range(-(p.tw * 12 - 1), p.tw * 12)) AS off
  FROM passes p
),
sel AS (
  SELECT t.event_type, t.rid, o.pno, o.method, o.tw,
         count(*) AS n_sel, avg(c.flux) AS mean_sel
  FROM base t
  JOIN nk ON nk.event_type = t.event_type
  JOIN offs o ON TRUE
  JOIN base c ON c.event_type = t.event_type
            AND c.rid = least(greatest(t.rid + o.off, 0), nk.rmax)
  WHERE t.flux IS NULL AND c.flux IS NOT NULL
    AND CASE WHEN o.method = 3 THEN abs(c.hr - t.hr) < 1.1
             WHEN o.method = 2 THEN
                  abs(c.swin - t.swin) < least(greatest(t.swin, 20.0), 50.0)
             ELSE abs(c.swin - t.swin) < least(greatest(t.swin, 20.0), 50.0)
                  AND abs(c.ta - t.ta) < 2.5 AND abs(c.vpd - t.vpd) < 5.0
        END
  GROUP BY 1, 2, 3, 4, 5
  HAVING count(*) >= 2
),
win AS (SELECT event_type, rid, min(pno) AS pno FROM sel GROUP BY 1, 2),
fill AS (
  SELECT w.event_type, w.rid, s.method, s.tw, s.n_sel, s.mean_sel
  FROM win w
  JOIN sel s ON s.event_type = w.event_type AND s.rid = w.rid
            AND s.pno = w.pno
)
SELECT b.event_type, b.hts AS ts,
       round(1e-9 + coalesce(b.flux, f.mean_sel), 6) AS filled_v,
       CAST(coalesce(f.method, 0) AS BIGINT) AS method,
       CAST(coalesce(f.tw, 0) AS DOUBLE) AS tw,
       CAST(coalesce(f.method * 1000 + f.tw, 0) AS BIGINT) AS flag,
       CAST(coalesce(f.n_sel, 0) AS BIGINT) AS n_pool
FROM base b
LEFT JOIN fill f ON f.event_type = b.event_type AND f.rid = b.rid
"""

QUERIES["mds_fill"] = q_mds_fill
ORACLES["mds_fill"] = SQL_MDS_FILL


# ---------------------------------------------------------------------------
# USTAR bootstrap CUT scenarios (driver-oracled end-to-end)
# ---------------------------------------------------------------------------

def q_ustar_bootstrap(spark, sf_dir):
    """Seasonal USTAR bootstrap (ustar.py ustar_mp_bootstrap; reference
    ustar_bootstrap.py / ONEFlux CUT scenarios) over the same deterministic
    flux-like derivation as the ``ustar_mp`` gate. The gate runs the
    SQL-replayable hash resampler (draw j of resample b = md5-h32("b:j") %
    N over (ustar, nee)-ordered rows): 8 full-record resamples, each
    re-detected with the complete MP pipeline (tie-aware classes, Fw2
    plateau, first-class + correlation checks), max finite season threshold
    per resample, CUT_16/50/84 = linear-interpolated percentiles of the
    sample distribution. The rng-seeded production path is pytest-oracled
    in tests/test_ustar.py; this gate certifies the bootstrap pipeline
    end-to-end in the driver record."""
    from diive_spark.operators import ustar
    from diive_spark.operators.dedup import h32
    ev = _t(spark, sf_dir, "events")
    eu = (
        (F.dayofmonth("ts") * 86400 + F.hour("ts") * 3600
         + F.minute("ts") * 60 + F.second("ts")).cast("bigint") * 1000000
        + F.unix_micros(F.col("ts").cast("timestamp")) % 1000000
    )
    us = (eu % 79999) / F.lit(100000.0)
    jitter = h32(F.col("event_id").cast("string")) / F.lit(4294967296.0) - F.lit(0.5)
    base = ev.select(
        F.lit("all").alias("k"),
        F.col("ts"),
        us.alias("USTAR"),
        ((eu % 991) / F.lit(991.0) * 20.0).alias("TA"),
        F.lit(0.0).alias("SW_IN"),
        (F.least(us, F.lit(0.3)) / F.lit(0.3) * 5.0
         - F.greatest(us - F.lit(0.3), F.lit(0.0)) * 2.0 + jitter).alias("NEE"),
    )
    cut = ustar.ustar_mp_bootstrap(
        base, ["k"], "ts", "NEE", "TA", "USTAR", "SW_IN",
        n_boot=8, resample="hash", ta_classes=1,
    )
    return cut.select(
        "scenario", _r6("threshold").alias("threshold"),
        F.col("n_samples").cast("bigint").alias("n_samples"))


SQL_USTAR_BOOTSTRAP = """
WITH pos AS (
  SELECT *, (day(ts) * 86400 + hour(ts) * 3600 + minute(ts) * 60
             + CAST(floor(second(ts)) AS BIGINT)) * 1000000
            + (epoch_us(ts) % 1000000) AS eu
  FROM events
),
src AS (
  SELECT (eu % 79999) / 100000.0 AS ustar,
         (eu % 991) / 991.0 * 20.0 AS ta,
         least((eu % 79999) / 100000.0, 0.3) / 0.3 * 5.0
           - greatest((eu % 79999) / 100000.0 - 0.3, 0.0) * 2.0
           + (('0x' || substr(md5(event_id::VARCHAR), 1, 8))::BIGINT
              / 4294967296.0 - 0.5) AS nee,
         CASE WHEN day(ts) = 1 AND hour(ts) = 0 AND minute(ts) = 0
              THEN CASE WHEN month(ts) = 1 THEN 12 ELSE month(ts) - 1 END
              ELSE month(ts) END AS m
  FROM pos
),
base AS (
  SELECT *, row_number() OVER (ORDER BY ustar, nee) AS rn FROM src
),
tot AS (SELECT count(*) AS n FROM base),
picks AS (
  SELECT d.b,
         ('0x' || substr(md5(d.b::VARCHAR || ':' || j.j::VARCHAR), 1, 8))::BIGINT
           % tot.n + 1 AS rn
  FROM (SELECT unnest(generate_series(0, 7)) AS b) d,
       tot,
       (SELECT unnest(generate_series(0, (SELECT n FROM tot) - 1)) AS j) j
),
res AS (
  SELECT p.b, s.ustar, s.ta, s.nee,
         CAST((s.m - 1) // 3 + 1 AS INTEGER) AS season
  FROM picks p JOIN base s ON s.rn = p.rn
),
scount AS (SELECT b, season, count(*) AS n_bs FROM res GROUP BY 1, 2),
eligible AS (
  SELECT b, season FROM scount, tot WHERE n_bs >= 100 AND tot.n >= 3000
),
cors AS (SELECT b, season, corr(ta, ustar) AS c FROM res GROUP BY 1, 2),
ranked AS (
  SELECT r.*, row_number() OVER (PARTITION BY r.b, r.season ORDER BY ustar) AS rnn,
         count(*) OVER (PARTITION BY r.b, r.season) AS cnt
  FROM res r JOIN eligible e ON e.b = r.b AND e.season = r.season
),
bvals AS (
  SELECT b, season, ustar AS bv FROM ranked
  WHERE rnn % (cnt // 20) = 0 AND rnn // (cnt // 20) BETWEEN 1 AND 19
),
cls AS (
  SELECT r.b, r.season, r.ustar, r.nee,
         (SELECT count(*) FROM bvals v
          WHERE v.b = r.b AND v.season = r.season AND v.bv < r.ustar) AS uc
  FROM ranked r
),
cmeans0 AS (
  SELECT b, season, uc, avg(ustar) AS um, avg(nee) AS fm FROM cls GROUP BY 1, 2, 3
),
grid AS (
  SELECT e.b, e.season, g.c AS uc
  FROM eligible e, (SELECT unnest(generate_series(0, 19)) AS c) g
),
cmeans AS (
  SELECT g.b, g.season, g.uc, coalesce(m.um, 0.0) AS um, coalesce(m.fm, 0.0) AS fm
  FROM grid g LEFT JOIN cmeans0 m
    ON m.b = g.b AND m.season = g.season AND m.uc = g.uc
),
fw AS (
  SELECT b, season, uc, um, fm,
         avg(fm) OVER w1 AS m1, count(fm) OVER w1 AS n1,
         avg(fm) OVER w2 AS m2, count(fm) OVER w2 AS n2,
         lead(fm) OVER (PARTITION BY b, season ORDER BY uc) AS fnext
  FROM cmeans
  WINDOW w1 AS (PARTITION BY b, season ORDER BY uc
                ROWS BETWEEN 1 FOLLOWING AND 10 FOLLOWING),
         w2 AS (PARTITION BY b, season ORDER BY uc
                ROWS BETWEEN 2 FOLLOWING AND 11 FOLLOWING)
),
hits AS (
  SELECT b, season, uc, um FROM fw
  WHERE uc <= 18 AND n1 > 0 AND n2 > 0 AND fm >= m1 AND fnext >= m2
),
thr AS (SELECT b, season, min_by(um, uc) AS threshold FROM hits GROUP BY 1, 2),
u0 AS (SELECT b, season, um AS um0 FROM cmeans WHERE uc = 0),
sthr AS (
  SELECT e.b,
         CASE WHEN abs(co.c) <= 0.5 AND u0.um0 <= 0.2 THEN t.threshold END AS th
  FROM eligible e
  LEFT JOIN cors co ON co.b = e.b AND co.season = e.season
  LEFT JOIN thr t ON t.b = e.b AND t.season = e.season
  LEFT JOIN u0 ON u0.b = e.b AND u0.season = e.season
),
samples AS (
  SELECT b, max(th) AS sample FROM sthr WHERE th IS NOT NULL GROUP BY 1
),
pcts AS (
  SELECT quantile_cont(sample, 0.16) AS q16,
         quantile_cont(sample, 0.50) AS q50,
         quantile_cont(sample, 0.84) AS q84,
         count(*) AS ns
  FROM samples
)
SELECT s.scenario,
       round(1e-9 + CASE s.scenario WHEN 'CUT_16' THEN q16
                                    WHEN 'CUT_50' THEN q50
                                    ELSE q84 END, 6) AS threshold,
       CAST(ns AS BIGINT) AS n_samples
FROM (SELECT unnest(['CUT_16', 'CUT_50', 'CUT_84']) AS scenario) s, pcts
"""

QUERIES["ustar_bootstrap"] = q_ustar_bootstrap
ORACLES["ustar_bootstrap"] = SQL_USTAR_BOOTSTRAP


# ---------------------------------------------------------------------------
# daytime partitioning (respiration-dominant pipeline certification)
# ---------------------------------------------------------------------------

def q_flux_partition_day(spark, sf_dir):
    """Daytime Lasslop/ONEFlux partitioning (fluxpart.partition_nee_daytime)
    over a deterministic derivation of the hourly events rollup whose light
    response is INVERTED (NEE grows with Rg): every 4-day window's LRC fit
    lands on the degenerate-parameter cascade's respiration-only branch,
    which is CLOSED FORM (r = Σ tfac·NEE / Σ tfac²) — so the SQL oracle
    replays the whole pipeline value-for-value: the closed-form log-space
    nighttime E0 fit, the per-window day masks (measured-radiation Rg>4
    split), the respiration projections, the two-neighbour window
    interpolation with constant ends, and GPP ≡ 0 under alpha=beta=0. The
    LRC/VPD fitting branches are planted-parameter pytest-oracled
    (tests/test_fluxpart.py); this gate certifies the daytime pipeline in
    the driver record."""
    from diive_spark.operators import fluxpart
    from diive_spark.operators.dedup import h32
    ev = _t(spark, sf_dir, "events")
    hourly = ev.groupBy(F.date_trunc("hour", "ts").alias("hts")).agg(
        F.avg("value").alias("v"))
    day, hour = F.dayofmonth("hts").cast("bigint"), F.hour("hts").cast("bigint")
    ta = ((day * 24 + hour) % 89) / 89.0 * 20.0
    b = fluxpart._lt_b(ta)
    rg = F.when((hour >= 6) & (hour <= 17),
                ((hour - 5) * (18 - hour)).cast("double") * 12.0).otherwise(0.0)
    jit = 1.0 + (h32(F.col("hts").cast("string")) / F.lit(4294967296.0)
                 - F.lit(0.5)) * 0.1
    src = hourly.select(
        F.lit("all").alias("k"),
        F.col("hts").alias("ts"),
        ((2.0 + F.col("v") / 100.0) * F.exp(150.0 * b) * jit
         + rg * 0.004).alias("NEE"),
        ta.alias("TA"),
        rg.alias("SW_IN"),
    )
    out = fluxpart.partition_nee_daytime(src, ["k"], "ts", "NEE", "TA",
                                         "SW_IN")
    return out.select(
        "ts", _r6("E0_DT").alias("e0"),
        _r6("RECO_DT").alias("reco"), _r6("GPP_DT").alias("gpp"),
    )


def _flux_partition_day_sql():
    b1 = repr(1.0 / (288.15 - 227.13))  # the operator's Python-folded constant
    return f"""
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS hts, avg(value) AS v FROM events GROUP BY 1
),
src AS (
  SELECT hts AS ts,
         ((day(hts) * 24 + hour(hts)) % 89) / 89.0 * 20.0 AS ta,
         CASE WHEN hour(hts) >= 6 AND hour(hts) <= 17
              THEN CAST((hour(hts) - 5) * (18 - hour(hts)) AS DOUBLE) * 12.0
              ELSE 0.0 END AS rg,
         (2.0 + v / 100.0)
           * exp(150.0 * ({b1} - 1.0 / ((((day(hts) * 24 + hour(hts)) % 89)
                                          / 89.0 * 20.0 + 273.15) - 227.13)))
           * (1.0 + (('0x' || substr(md5(hts::VARCHAR), 1, 8))::BIGINT
                     / 4294967296.0 - 0.5) * 0.1)
           + CASE WHEN hour(hts) >= 6 AND hour(hts) <= 17
                  THEN CAST((hour(hts) - 5) * (18 - hour(hts)) AS DOUBLE) * 12.0
                  ELSE 0.0 END * 0.004 AS nee
  FROM hourly
),
base AS (
  SELECT *, {b1} - 1.0 / ((ta + 273.15) - 227.13) AS b,
         CAST(floor((epoch(ts) - (SELECT min(epoch(ts)) FROM src))
                    / 86400.0) AS BIGINT) AS day0
  FROM src
),
-- closed-form log-space nighttime E0 (Rg <= 4, NEE > 0)
e0fit AS (
  SELECT CAST(count(*) AS DOUBLE) AS n, sum(b) AS sx, sum(ln(nee)) AS sy,
         sum(b * ln(nee)) AS sxy, sum(b * b) AS sxx
  FROM base WHERE rg <= 4.0 AND nee > 0 AND nee IS NOT NULL
),
e0v AS (
  SELECT CASE WHEN n >= 24 AND (n * sxx - sx * sx) != 0
              AND (n * sxy - sx * sy) / (n * sxx - sx * sx) BETWEEN 50 AND 400
              THEN (n * sxy - sx * sy) / (n * sxx - sx * sx) END AS e0
  FROM e0fit
),
wb AS (SELECT *, exp((SELECT e0 FROM e0v) * b) AS tfac FROM base),
-- 4-day windows in 2-day steps over the day0 span; day rows are Rg > 4
wins AS (
  SELECT CAST(w.s AS BIGINT) AS wstart
  FROM (SELECT unnest(generate_series(0, (SELECT max(day0) FROM base), 2)) AS s) w
),
wfit AS (
  SELECT w.wstart,
         sum(r.tfac * r.nee) / sum(r.tfac * r.tfac) AS rw,
         avg(epoch(r.ts)) AS c, count(*) AS nd
  FROM wins w
  JOIN wb r ON r.day0 >= w.wstart AND r.day0 < w.wstart + 4
           AND r.rg > 4.0 AND r.nee IS NOT NULL AND r.ta IS NOT NULL
  GROUP BY 1
  HAVING count(*) >= 30 AND sum(r.tfac * r.nee) / sum(r.tfac * r.tfac) > 0
),
win AS (
  SELECT row_number() OVER (ORDER BY wstart) AS i, rw, c FROM wfit
),
nwin AS (SELECT count(*) AS n FROM win),
interp AS (
  SELECT r.ts, r.tfac,
         coalesce((SELECT max(i) FROM win WHERE c < epoch(r.ts)), 1) AS li,
         coalesce((SELECT min(i) FROM win WHERE c >= epoch(r.ts)),
                  (SELECT n FROM nwin)) AS ri
  FROM wb r
),
woven AS (
  SELECT p.ts, p.tfac, l.rw AS rl, l.c AS cl, rr.rw AS rr, rr.c AS cr
  FROM interp p
  JOIN win l ON l.i = p.li
  JOIN win rr ON rr.i = p.ri
)
SELECT b.ts,
       round(1e-9 + e0v.e0, 6) AS e0,
       round(1e-9 + CASE WHEN e0v.e0 IS NOT NULL AND w.ts IS NOT NULL THEN
         ((1.0 - CASE WHEN w.cr > w.cl
                      THEN least(greatest((epoch(b.ts) - w.cl) / (w.cr - w.cl),
                                          0.0), 1.0) ELSE 0.0 END) * w.rl
          + CASE WHEN w.cr > w.cl
                 THEN least(greatest((epoch(b.ts) - w.cl) / (w.cr - w.cl),
                                     0.0), 1.0) ELSE 0.0 END * w.rr)
         * w.tfac END, 6) AS reco,
       round(1e-9 + CASE WHEN e0v.e0 IS NOT NULL AND w.ts IS NOT NULL
                         THEN 0.0 END, 6) AS gpp
FROM base b
LEFT JOIN woven w ON w.ts = b.ts, e0v
"""


QUERIES["flux_partition_day"] = q_flux_partition_day
ORACLES["flux_partition_day"] = _flux_partition_day_sql()


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


def q_timestamp_shift(spark, sf_dir):
    """Timestamp-shift detection (operators/timeshift.py; reference
    preprocessing/qaqc/detect_timestamp_shifts.py): a 14-day 30-min
    radiation grid anchored at the events table's first date carries a
    planted 30-minute clock error (measured = potential shifted one slot
    earlier, scaled 0.85). Variants: 'fft' = k=1 Fourier phase method
    (expects 30.0 every day), 'noon' = daily peak-time difference. The
    crosscorr method is per-day Arrow (non-SQL) — covered by pytest +
    reference-execution parity instead."""
    import math as _math

    from diive_spark.operators import timeshift
    ev = _t(spark, sf_dir, "events")
    d0 = ev.agg(F.min(F.to_date("ts")).alias("d0"))
    grid = (spark.range(14 * 48).crossJoin(F.broadcast(d0))
            .withColumn("ts", F.timestamp_seconds(
                F.unix_timestamp(F.col("d0").cast("timestamp"))
                + F.col("id") * 1800))
            .withColumn("hf", (F.col("id") % 48).cast("double") * 0.5))
    pot = F.greatest(F.lit(0.0),
                     900.0 * F.sin(_math.pi * (F.col("hf") - 6.0) / 12.0))
    meas = 0.85 * F.greatest(
        F.lit(0.0), 900.0 * F.sin(_math.pi * (F.col("hf") + 0.5 - 6.0) / 12.0))
    grid = grid.withColumn("pot", pot).withColumn("meas", meas) \
               .withColumn("site", F.lit("S"))
    # dt_min passed explicitly: the gate's constant literal key would
    # constant-fold the inference window into an unpartitioned global
    # window (harmless at 672 rows, but noisy and needless — the oracle
    # SQL hardcodes the 30-min grid too)
    fft = timeshift.fft_phase_shift(grid, ["site"], "ts", "meas", "pot",
                                    dt_min=30.0)
    noon = timeshift.noon_shift(grid, ["site"], "ts", "meas", "pot")
    a = fft.select(
        F.lit("fft").alias("variant"), "date",
        _r6("shift_minutes").alias("shift_minutes"),
        _r6("amplitude_meas").alias("amplitude"))
    b = noon.select(
        F.lit("noon").alias("variant"), "date",
        _r6("shift_minutes").alias("shift_minutes"),
        F.lit(None).cast("double").alias("amplitude"))
    return a.unionByName(b)


SQL_TIMESTAMP_SHIFT = """
WITH d0 AS (SELECT CAST(min(ts) AS DATE) AS d0 FROM events),
g AS (
  SELECT CAST(d0 AS TIMESTAMP) + to_minutes(30 * i) AS ts,
         ((i % 48) * 0.5) AS hf
  FROM d0, (SELECT unnest(generate_series(0, 14 * 48 - 1)) AS i)
),
v AS (
  SELECT ts, CAST(ts AS DATE) AS date,
         greatest(0, 900 * sin(pi() * (hf - 6.0) / 12.0)) AS pot,
         0.85 * greatest(0, 900 * sin(pi() * (hf + 0.5 - 6.0) / 12.0)) AS meas
  FROM g
),
fr AS (
  SELECT date, meas, pot,
         CAST(ROW_NUMBER() OVER (PARTITION BY date ORDER BY ts) - 1
              AS DOUBLE) AS n,
         CAST(COUNT(*) OVER (PARTITION BY date) AS DOUBLE) AS nn
  FROM v
),
ffta AS (
  SELECT date, count(*) AS cnt,
         sum(meas * cos(-2 * pi() * n / nn)) AS mre,
         sum(meas * sin(-2 * pi() * n / nn)) AS mim,
         sum(pot * cos(-2 * pi() * n / nn)) AS pre,
         sum(pot * sin(-2 * pi() * n / nn)) AS pim,
         sum(meas) AS msum, sum(pot) AS psum
  FROM fr GROUP BY 1
),
fft AS (
  SELECT date,
         cnt >= 0.9 * 48 AND psum > 0 AND msum / psum >= 0.6 AS ok,
         (((atan2(mim, mre) - atan2(pim, pre) + pi()) % (2 * pi())
           + 2 * pi()) % (2 * pi()) - pi()) / (2 * pi()) * 1440 AS shift_raw,
         sqrt(mre * mre + mim * mim) AS amp
  FROM ffta
),
noon AS (
  SELECT date,
         -(max(struct_pack(v := meas, nt := -epoch(ts)))).nt AS tm,
         -(max(struct_pack(v := pot, nt := -epoch(ts)))).nt AS tp,
         sum(meas) AS msum, sum(pot) AS psum
  FROM v GROUP BY 1
)
SELECT 'fft' AS variant, date,
       CASE WHEN ok THEN round(1e-9 + shift_raw, 6) END AS shift_minutes,
       CASE WHEN ok THEN round(1e-9 + amp, 6) ELSE 0.0 END AS amplitude
FROM fft
UNION ALL
SELECT 'noon', date, round(1e-9 + (tp - tm) / 60.0, 6),
       CAST(NULL AS DOUBLE)
FROM noon WHERE msum / psum > 0.7
"""

QUERIES["timestamp_shift"] = q_timestamp_shift
ORACLES["timestamp_shift"] = SQL_TIMESTAMP_SHIFT


def q_wind_rot_lag(spark, sf_dir):
    """Wind double rotation + MaxCovariance lag search
    (operators/windlag.py; reference flux/hires/windrotation.py +
    lag.py). Deterministic wind components from event_id; variants:
    'rotation' = per-event_type rotation angles + rotated-component means
    (v2/w2 means ≈ 0 certify the rotation), 'lag' = per-shift
    pairwise-complete sample covariance of value vs its 7-record lag
    (flag_max marks the detected lag = +7). The find_peaks auto
    validation is non-SQL — pytest-covered."""
    from diive_spark.operators import windlag
    ev = _t(spark, sf_dir, "events").select("event_id", "event_type", "value")
    wind = (ev
            .withColumn("u", 3.0 + 2.0 * F.sin(F.col("event_id") * 0.017))
            .withColumn("v", 1.0 + F.sin(F.col("event_id") * 0.031))
            .withColumn("w", 0.3 + 0.2 * F.sin(F.col("event_id") * 0.057)))
    rot = windlag.double_rotation(wind, ["event_type"], "u", "v", "w")
    rota = rot.groupBy("event_type").agg(
        _r6(F.min("theta")).alias("theta"), _r6(F.min("phi")).alias("phi"),
        _r6(F.avg("u_rot")).alias("u2_mean"),
        _r6(F.avg("v_rot")).alias("v2_mean"),
        _r6(F.avg("w_rot")).alias("w2_mean"))
    a = rota.select(
        F.lit("rotation").alias("variant"), "event_type", "theta", "phi",
        "u2_mean", "v2_mean", "w2_mean",
        F.lit(None).cast("bigint").alias("shift"),
        F.lit(None).cast("double").alias("cov"),
        F.lit(None).cast("double").alias("cov_abs"),
        F.lit(None).cast("int").alias("flag_max"))
    kw = Window.partitionBy("event_type").orderBy("event_id")
    lagged = (ev.withColumn("ref", F.col("value") / 100.0)
              .withColumn("lagv", F.lag(F.col("value") / 100.0, 7).over(kw)))
    mc = windlag.max_covariance(lagged, ["event_type"], "event_id",
                                "ref", "lagv",
                                winsize_from=-12, winsize_to=12)
    b = mc.select(
        F.lit("lag").alias("variant"), "event_type",
        F.lit(None).cast("double").alias("theta"),
        F.lit(None).cast("double").alias("phi"),
        F.lit(None).cast("double").alias("u2_mean"),
        F.lit(None).cast("double").alias("v2_mean"),
        F.lit(None).cast("double").alias("w2_mean"),
        F.col("shift"), _r6("cov").alias("cov"),
        _r6("cov_abs").alias("cov_abs"),
        F.col("flag_peak_max_cov_abs").cast("int").alias("flag_max"))
    return a.unionByName(b)


SQL_WIND_ROT_LAG = """
WITH w AS (
  SELECT event_id, event_type, value,
         3.0 + 2.0 * sin(event_id * 0.017) AS u,
         1.0 + sin(event_id * 0.031) AS v,
         0.3 + 0.2 * sin(event_id * 0.057) AS w
  FROM events
),
m AS (
  SELECT event_type, avg(u) AS um, avg(v) AS vm, avg(w) AS wm
  FROM w GROUP BY 1
),
ang AS (
  SELECT event_type, atan2(vm, um) AS theta,
         atan2(wm, um * cos(atan2(vm, um)) + vm * sin(atan2(vm, um))) AS phi
  FROM m
),
rot AS (
  SELECT w.event_type, theta, phi,
         (w.u * cos(theta) + w.v * sin(theta)) * cos(phi)
           + w.w * sin(phi) AS u2,
         -w.u * sin(theta) + w.v * cos(theta) AS v2,
         -(w.u * cos(theta) + w.v * sin(theta)) * sin(phi)
           + w.w * cos(phi) AS w2
  FROM w JOIN ang USING (event_type)
),
rota AS (
  SELECT event_type,
         round(1e-9 + min(theta), 6) AS theta,
         round(1e-9 + min(phi), 6) AS phi,
         round(1e-9 + avg(u2), 6) AS u2_mean,
         round(1e-9 + avg(v2), 6) AS v2_mean,
         round(1e-9 + avg(w2), 6) AS w2_mean
  FROM rot GROUP BY 1
),
r AS (
  SELECT event_type, value / 100.0 AS ref,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY event_id) AS rn
  FROM events
),
rl AS (
  SELECT event_type, ref, rn,
         lag(ref, 7) OVER (PARTITION BY event_type ORDER BY rn) AS lagv
  FROM r
),
shifts AS (SELECT unnest(generate_series(-12, 12)) AS shift),
cv AS (
  SELECT a.event_type, s.shift, covar_samp(a.ref, b.lagv) AS cov
  FROM rl a JOIN shifts s ON TRUE
  JOIN rl b ON b.event_type = a.event_type AND b.rn = a.rn + s.shift
  GROUP BY 1, 2
),
mx AS (
  SELECT event_type, shift, cov, abs(cov) AS cov_abs,
         CASE WHEN ROW_NUMBER() OVER (PARTITION BY event_type
                ORDER BY abs(cov) DESC, shift ASC) = 1
              THEN 1 ELSE 0 END AS flag_max
  FROM cv
)
SELECT 'rotation' AS variant, event_type, theta, phi, u2_mean, v2_mean,
       w2_mean, CAST(NULL AS BIGINT) AS shift, CAST(NULL AS DOUBLE) AS cov,
       CAST(NULL AS DOUBLE) AS cov_abs, CAST(NULL AS INTEGER) AS flag_max
FROM rota
UNION ALL
SELECT 'lag', event_type, NULL, NULL, NULL, NULL, NULL, shift,
       round(1e-9 + cov, 6), round(1e-9 + cov_abs, 6), flag_max
FROM mx
"""

QUERIES["wind_rot_lag"] = q_wind_rot_lag
ORACLES["wind_rot_lag"] = SQL_WIND_ROT_LAG


# ---------------------------------------------------------------------------
# Gate consolidation: the driver records at most 50 queries() entries
# (r3 evidence: 53 registered -> exactly the first 50 in registration order
# got CORRECTNESS rows). Same-family variant gates are therefore merged
# into UNION gates with a `variant` discriminator — each variant keeps its
# full value oracle, the merged gate certifies every underlying operator,
# and the registry below pins the final order at exactly 50 entries with
# the newest/previously-unrecorded gates early.
# ---------------------------------------------------------------------------

_SINGLE_QUERIES = dict(QUERIES)
_SINGLE_ORACLES = dict(ORACLES)


def _variant_union_sql(parts):
    """UNION ALL of (variant, select_list, oracle_sql) with NULL padding."""
    sels = []
    for variant, cols, sql in parts:
        collist = ", ".join(cols)
        sels.append(
            f"SELECT '{variant}' AS variant, {collist} FROM ({sql.strip()})")
    return "\nUNION ALL\n".join(sels)


def q_histogram_modes(spark, sf_dir):
    """Histogram family: fixed-n binning + Freedman-Diaconis auto-binning
    (both previously standalone gates) as one union, variant-tagged."""
    a = _SINGLE_QUERIES["histogram"](spark, sf_dir).select(
        F.lit("n20").alias("variant"), "bin",
        F.col("cnt").alias("counts"),
        F.lit(None).cast("double").alias("bin_start_v"))
    b = _SINGLE_QUERIES["histogram_fd"](spark, sf_dir).select(
        F.lit("fd").alias("variant"), "bin", "counts", "bin_start_v")
    return a.unionByName(b)


SQL_HISTOGRAM_MODES = _variant_union_sql([
    ("n20", ["bin", "cnt AS counts", "CAST(NULL AS DOUBLE) AS bin_start_v"],
     _SINGLE_ORACLES["histogram"]),
    ("fd", ["bin", "counts", "bin_start_v"], _SINGLE_ORACLES["histogram_fd"]),
])


def q_zscore_family(spark, sf_dir):
    """zScore global/day-night outliers + zScoreIncrements as one union."""
    a = _SINGLE_QUERIES["zscore_outliers"](spark, sf_dir).select(
        F.lit("global").alias("variant"), "event_id", "event_type",
        "value_v",
        F.lit(None).cast("timestamp_ntz").alias("window_start"),
        F.lit(None).cast("int").alias("flag"))
    b = _SINGLE_QUERIES["zscore_increments"](spark, sf_dir).select(
        F.lit("increments").alias("variant"),
        F.lit(None).cast("long").alias("event_id"), "event_type",
        F.lit(None).cast("double").alias("value_v"), "window_start", "flag")
    return a.unionByName(b)


def q_limit_flags(spark, sf_dir):
    """AbsoluteLimits + TrimLow flag gates as one union."""
    a = _SINGLE_QUERIES["abs_limits"](spark, sf_dir).select(
        F.lit("abs_limits").alias("variant"), "event_id",
        F.lit(None).cast("string").alias("event_type"), "flag",
        F.lit(None).cast("double").alias("value_v"))
    b = _SINGLE_QUERIES["trim_low"](spark, sf_dir).select(
        F.lit("trim_low").alias("variant"), "event_id", "event_type",
        F.lit(None).cast("int").alias("flag"), "value_v")
    return a.unionByName(b)


def q_ale_1d2d(spark, sf_dir):
    """First- and second-order ALE as one union (1D rows pad the y axis)."""
    a = _SINGLE_QUERIES["ale_linear"](spark, sf_dir).select(
        F.lit("1d").alias("variant"),
        F.col("edge_idx").alias("x_idx"),
        F.lit(None).cast("int").alias("y_idx"),
        F.col("edge").alias("x_edge"),
        F.lit(None).cast("double").alias("y_edge"),
        "ale", F.col("bin_count").alias("n_cell"))
    b = _SINGLE_QUERIES["ale_interaction_2d"](spark, sf_dir).select(
        F.lit("2d").alias("variant"), "x_idx", "y_idx", "x_edge", "y_edge",
        "ale", F.col("cell_count").alias("n_cell"))
    return a.unionByName(b)


def q_cumulatives(spark, sf_dir):
    """Per-year DOY cumulative + quadrature cumulative as one union."""
    a = _SINGLE_QUERIES["doy_cumulative"](spark, sf_dir).select(
        F.lit("doy").alias("variant"), "year", "doy",
        F.lit(None).cast("long").alias("event_id"),
        F.lit(None).cast("string").alias("event_type"),
        F.col("cum_v"))
    b = _SINGLE_QUERIES["quadrature_cumulative"](spark, sf_dir).select(
        F.lit("quadrature").alias("variant"),
        F.lit(None).cast("int").alias("year"),
        F.lit(None).cast("int").alias("doy"),
        "event_id", "event_type",
        F.col("cumq_v").alias("cum_v"))
    return a.unionByName(b)


def q_gapfill_fills_1h(spark, sf_dir):
    """The three fill methods (linear interpolation, rolling-median
    cascade, climatology fallback) share one output shape — one union
    certifies all three."""
    parts = []
    for variant, name in (("interp", "interp_linear_1h"),
                          ("median", "median_fill_1h"),
                          ("climatology", "climatology_fill_1h")):
        parts.append(_SINGLE_QUERIES[name](spark, sf_dir).select(
            F.lit(variant).alias("variant"), "event_type", "window_start",
            "filled_v", "fill_flag"))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _int_cast(col, typ):
    return f"CAST({col} AS {typ})"


SQL_ZSCORE_FAMILY = _variant_union_sql([
    ("global", ["event_id", "event_type", "value_v",
                "CAST(NULL AS TIMESTAMP) AS window_start",
                "CAST(NULL AS INTEGER) AS flag"],
     _SINGLE_ORACLES["zscore_outliers"]),
    ("increments", ["CAST(NULL AS BIGINT) AS event_id", "event_type",
                    "CAST(NULL AS DOUBLE) AS value_v", "window_start",
                    "flag"],
     _SINGLE_ORACLES["zscore_increments"]),
])

SQL_LIMIT_FLAGS = _variant_union_sql([
    ("abs_limits", ["event_id", "CAST(NULL AS VARCHAR) AS event_type",
                    "flag", "CAST(NULL AS DOUBLE) AS value_v"],
     _SINGLE_ORACLES["abs_limits"]),
    ("trim_low", ["event_id", "event_type",
                  "CAST(NULL AS INTEGER) AS flag", "value_v"],
     _SINGLE_ORACLES["trim_low"]),
])

SQL_ALE_1D2D = _variant_union_sql([
    ("1d", ["edge_idx AS x_idx", "CAST(NULL AS INTEGER) AS y_idx",
            "edge AS x_edge", "CAST(NULL AS DOUBLE) AS y_edge", "ale",
            "bin_count AS n_cell"],
     _SINGLE_ORACLES["ale_linear"]),
    ("2d", ["x_idx", "y_idx", "x_edge", "y_edge", "ale",
            "cell_count AS n_cell"],
     _SINGLE_ORACLES["ale_interaction_2d"]),
])

SQL_CUMULATIVES = _variant_union_sql([
    ("doy", ["year", "doy", "CAST(NULL AS BIGINT) AS event_id",
             "CAST(NULL AS VARCHAR) AS event_type", "cum_v"],
     _SINGLE_ORACLES["doy_cumulative"]),
    ("quadrature", ["CAST(NULL AS INTEGER) AS year",
                    "CAST(NULL AS INTEGER) AS doy", "event_id", "event_type",
                    "cumq_v AS cum_v"],
     _SINGLE_ORACLES["quadrature_cumulative"]),
])

SQL_GAPFILL_FILLS_1H = _variant_union_sql([
    ("interp", ["event_type", "window_start", "filled_v", "fill_flag"],
     _SINGLE_ORACLES["interp_linear_1h"]),
    ("median", ["event_type", "window_start", "filled_v", "fill_flag"],
     _SINGLE_ORACLES["median_fill_1h"]),
    ("climatology", ["event_type", "window_start", "filled_v", "fill_flag"],
     _SINGLE_ORACLES["climatology_fill_1h"]),
])

def q_grid_agg(spark, sf_dir):
    """GridAggregator equal-width + quantile binning as one union."""
    a = _SINGLE_QUERIES["grid_agg_2d"](spark, sf_dir).select(
        F.lit("equal_width").alias("variant"), "xbin", "ybin", "n_vals",
        "mean_z")
    b = _SINGLE_QUERIES["grid_agg_2d_quantile"](spark, sf_dir).select(
        F.lit("quantile").alias("variant"), "xbin", "ybin", "n_vals",
        "mean_z")
    return a.unionByName(b)


SQL_GRID_AGG = _variant_union_sql([
    ("equal_width", ["xbin", "ybin", "n_vals", "mean_z"],
     _SINGLE_ORACLES["grid_agg_2d"]),
    ("quantile", ["xbin", "ybin", "n_vals", "mean_z"],
     _SINGLE_ORACLES["grid_agg_2d_quantile"]),
])

_SSTATS_COLS = ["mean_v", "sd_v", "min_v", "p05", "p25", "median_v",
                "p75", "p95", "max_v", "skew_m"]


def q_series_stats(spark, sf_dir):
    """sstats summary + percentiles101 grid as one union."""
    a = _SINGLE_QUERIES["sstats"](spark, sf_dir).select(
        F.lit("sstats").alias("variant"), "n", *_SSTATS_COLS,
        F.lit(None).cast("bigint").alias("pct"),
        F.lit(None).cast("double").alias("pv"))
    b = _SINGLE_QUERIES["percentiles"](spark, sf_dir).select(
        F.lit("percentiles").alias("variant"),
        F.lit(None).cast("long").alias("n"),
        *[F.lit(None).cast("double").alias(c) for c in _SSTATS_COLS],
        "pct", "pv")
    return a.unionByName(b)


SQL_SERIES_STATS = _variant_union_sql([
    ("sstats", ["n", *_SSTATS_COLS,
                "CAST(NULL AS BIGINT) AS pct", "CAST(NULL AS DOUBLE) AS pv"],
     _SINGLE_ORACLES["sstats"]),
    ("percentiles", ["CAST(NULL AS BIGINT) AS n",
                     *[f"CAST(NULL AS DOUBLE) AS {c}" for c in _SSTATS_COLS],
                     "pct", "pv"],
     _SINGLE_ORACLES["percentiles"]),
])

_MERGED_QUERIES = {
    "grid_agg": q_grid_agg,
    "series_stats": q_series_stats,
    "histogram_modes": q_histogram_modes,
    "zscore_family": q_zscore_family,
    "limit_flags": q_limit_flags,
    "ale_1d2d": q_ale_1d2d,
    "cumulatives": q_cumulatives,
    "gapfill_fills_1h": q_gapfill_fills_1h,
}
_MERGED_ORACLES = {
    "grid_agg": SQL_GRID_AGG,
    "series_stats": SQL_SERIES_STATS,
    "histogram_modes": SQL_HISTOGRAM_MODES,
    "zscore_family": SQL_ZSCORE_FAMILY,
    "limit_flags": SQL_LIMIT_FLAGS,
    "ale_1d2d": SQL_ALE_1D2D,
    "cumulatives": SQL_CUMULATIVES,
    "gapfill_fills_1h": SQL_GAPFILL_FILLS_1H,
}

#: names folded into union gates (still defined above; not registered)
_MERGED_AWAY = {
    "histogram", "histogram_fd", "zscore_outliers", "zscore_increments",
    "abs_limits", "trim_low", "ale_linear", "ale_interaction_2d",
    "doy_cumulative", "quadrature_cumulative", "interp_linear_1h",
    "median_fill_1h", "climatology_fill_1h",
    "grid_agg_2d", "grid_agg_2d_quantile", "sstats", "percentiles",
}

#: final driver registry: exactly 50 entries; previously-unrecorded and
#: round-4 gates pinned right after the flagship so a runtime-bounded
#: driver still reaches them
_FINAL_ORDER = [
    "rollup_1m",
    "timestamp_shift", "wind_rot_lag",
    "flux_partition_night", "ale_1d2d", "histogram_modes",
    "mds_fill", "ustar_bootstrap", "flux_partition_day", "rollup_stream_1m",
    "rollup_1h_gate90", "cascade_1d", "daily_agg_gate",
    "monthly_matrix_ranks", "diel_cycle", "gap_table_1h",
    "gapfill_fills_1h", "zscore_family", "limit_flags", "series_stats",
    "daily_correlation", "time_since", "dedup_exact",
    "ngram_jaccard", "text_quality", "lang_id", "fingerprint",
    "token_count", "simhash", "ann_cosine_topk", "embedding_near_dups",
    "minhash_lsh", "ann_ivf", "grid_agg",
    "cumulatives", "agg_as_hires", "keep_records_where",
    "stepwise_screening", "profile_lineitem", "minhash_signatures",
    "json_props", "gap_stats_monthly", "classical_decompose", "harmonics",
    "zscore_rolling", "compound_extremes", "rank_drivers", "ustar_mp",
    "random_uncertainty", "bin_fit_linear",
]

_ALL_QUERIES = {**_SINGLE_QUERIES, **_MERGED_QUERIES}
_ALL_ORACLES = {**_SINGLE_ORACLES, **_MERGED_ORACLES}
assert len(_FINAL_ORDER) == 50, len(_FINAL_ORDER)
assert set(_FINAL_ORDER) == (
    (set(_SINGLE_QUERIES) - _MERGED_AWAY) | set(_MERGED_QUERIES)
), "registry drift"

QUERIES = {n: _ALL_QUERIES[n] for n in _FINAL_ORDER}
ORACLES = {n: _ALL_ORACLES[n] for n in _FINAL_ORDER if n in _ALL_ORACLES}
