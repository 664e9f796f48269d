"""Flux-tower gates: USTAR MP + bootstrap, random uncertainty, nighttime/daytime NEE partitioning, MDS gap-fill, timestamp-shift detection, wind rotation + covariance lag.

Split from the monolithic queries.py catalog; registration order is
preserved by the package __init__ importing sections in the original
sequence. Conventions (aliasing, _r6 rounding) in queries._shared.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401

from diive_spark.operators import gapfill, grid, outliers, resample  # noqa: F401

from ._shared import QUERIES, ORACLES, _hourly_gridded, _r6, _t  # noqa: F401

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
    # the fft and noon branches both consume this 672-row grid, and their
    # duplicated subtrees each re-scan events for the d0 aggregate (r8
    # runtime plan check: 2x Scan parquet, no broadcast reuse). A lazy
    # localCheckpoint pins one materialization both branches read.
    grid = grid.localCheckpoint(eager=False)
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
    # the 7-record lag is derived inside the per-key kernel (r8: the
    # F.lag window pre-pass paid a full extra sort+shuffle of the events
    # table before the kernel's own per-key sort — value-identical)
    lagged = ev.withColumn("ref", F.col("value") / 100.0)
    mc = windlag.max_covariance(lagged, ["event_type"], "event_id",
                                "ref", None, lag_records=7,
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
-- probe key materialized BEFORE the join: with `b.rn = a.rn + s.shift`
-- written inline across three tables the planner loses rn as a hash key
-- and probes per event_type only — quadratic per key (measured: sf1's
-- 200k-row keys ran >15 min; this form runs in seconds)
probe AS (
  SELECT a.event_type, s.shift, a.rn + s.shift AS brn, a.ref
  FROM rl a JOIN shifts s ON TRUE
),
cv AS (
  SELECT p.event_type, p.shift, covar_samp(p.ref, b.lagv) AS cov
  FROM probe p JOIN rl b ON b.event_type = p.event_type AND b.rn = p.brn
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


