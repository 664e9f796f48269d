"""Analysis singles: fills (median/climatology), json props, gap stats, seasonal decomposition, harmonics, z-score family singles, compound extremes, rank drivers, cumulatives, bin fits, ALE, FD histogram.

Split from the monolithic queries.py catalog; registration order is
preserved by the package __init__ importing sections in the original
sequence. Conventions (aliasing, _r6 rounding) in queries._shared.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401

from diive_spark.operators import gapfill, grid, outliers, resample  # noqa: F401

from ._shared import QUERIES, ORACLES, _hourly_gridded, _r6, _t  # noqa: F401



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

    The gate is integer-exact END TO END (the sf1 rehearsal lesson): it
    feeds INTEGER centi-units (round(value*100)) so every term and every
    partial sum of squares is an exactly-representable double (≤ 8e12 «
    2^53) and the running sum is bit-identical regardless of each
    engine's window-sum association (Spark sequential vs DuckDB segment
    tree) — and it EMITS the integer-rounded sqrt as BIGINT: a 6-decimal
    rounding of the ~1e6-magnitude sqrt sat within a few ULPs of
    half-boundaries, where Spark's BigDecimal HALF_UP and DuckDB's
    scaled-multiply round() disagree (9 flips in 1e6 rows at sf1);
    integer rounding of the IEEE-exact sqrt has no such zone."""
    from diive_spark.operators import features
    ev = _t(spark, sf_dir, "events").withColumn(
        "value", F.round(F.col("value") * 100, 0))
    out = features.quadrature_cumulative(ev, ["event_type"], "ts", "value",
                                         tiebreak_cols=["event_id"])
    return out.select("event_id", "event_type",
                      F.round(F.col("cum_quadrature"), 0).cast("long")
                      .alias("cumq_v"))


SQL_QUADRATURE_CUMULATIVE = """
SELECT event_id, event_type,
       CAST(round(sqrt(sum(round(value * 100) * round(value * 100)) OVER (
           PARTITION BY event_type ORDER BY ts, event_id
           ROWS UNBOUNDED PRECEDING))) AS BIGINT) AS cumq_v
FROM events
"""

QUERIES["quadrature_cumulative"] = q_quadrature_cumulative
ORACLES["quadrature_cumulative"] = SQL_QUADRATURE_CUMULATIVE




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


