"""High-resolution lag / self-heating gates (round-6): SCOP open-path
self-heating physics + scaling-factor optimizer as FULL SQL replays, and
PWB (pre-whitening bootstrap) lag detection against reference-executed
golden values.

Fixture design notes (cross-engine determinism, the r5 lesson):

- The SCOP fixture is generated from ``range(N)`` with ONLY IEEE-exact
  arithmetic (+,-,*,/ of small rationals) and md5-derived jitter — no
  transcendentals — so Spark and DuckDB compute bit-identical inputs.
  The JAR09 surface-temperature model is likewise transcendental-free,
  making the whole physics chain (aerodynamic resistance, two-pass
  running-Hampel outlier removal, Burba eq. 8) exactly replayable.
- The optimizer input FCT is quantized to a 2^-20 dyadic grid and the
  target's jitter to 2^-34, so every running cumsum A = Σ(target-ref),
  B = Σfct and every bucketed weight sum is an EXACTLY-representable
  double: the |B|-weighted-median breakpoint selection (the engine's
  closed-form L1 optimum, selfheating.py:154) is then deterministic in
  BOTH engines regardless of summation association.
- The PWB fixture is a seeded numpy AR(1) world (PCG64 streams are
  stable by numpy policy); the oracle rows are golden values produced by
  EXECUTING the reference implementation (tests/reference_harness.py
  pattern, RNG consumption matched — see
  tests/test_partition_hires_gates.py) and embedded as a VALUES table.

Reference: /root/reference/diive/flux/lowres/selfheating.py (ScopPhysics
/ ScopOptimizer), /root/reference/diive/flux/hires/lag_pwb.py
(PreWhiteningBootstrap).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from diive_spark.operators.dedup import h32

from ._shared import ORACLES, QUERIES, _r6

SCOP_N = 4000
_HW = 97  # Hampel window (=> 48 preceding / 48 following)


def _jit(tag: str):
    """Uniform [-0.5, 0.5) jitter from an md5 prefix — identical in Spark
    (h32) and DuckDB ('0x'||substr(md5(..),1,8))::BIGINT."""
    return (h32(F.concat(F.lit(tag), F.col("i").cast("string")))
            / F.lit(4294967296.0) - F.lit(0.5))


def _scop_fixture(spark):
    """Deterministic 4000-row half-hourly open-path world: diel triangle
    waves + md5 jitter, an RA spike every 211 rows and a gas-density
    spike every 173 rows for the Hampel passes to remove."""
    df = spark.range(SCOP_N).select(F.col("id").alias("i"))
    hh = F.col("i") % 48
    tri = F.abs(hh - 24) / F.lit(24.0)
    return df.select(
        "i",
        (F.to_timestamp(F.lit("2024-01-01 00:00:00"))
         + F.make_interval(secs=F.col("i") * 1800)).alias("ts"),
        F.lit("S").alias("site"),
        ((hh >= 12) & (hh < 36)).cast("long").alias("DAYTIME"),
        (F.lit(18.0) - 12.0 * tri + 2.0 * _jit("t")).alias("TA"),
        (F.lit(1.5) + 2.0 * (1.0 - tri) + _jit("u")
         + F.when(F.col("i") % 211 == 0, 25.0).otherwise(0.0)).alias("U"),
        (F.lit(0.75) + 0.1 * _jit("g")
         + F.when(F.col("i") % 173 == 0, 3.0).otherwise(0.0)).alias("GAS"),
        (F.lit(0.008) + 0.004 * (1.0 - tri)).alias("RHO_V"),
        F.lit(1.2).alias("RHO_A"),
        F.lit(1005.0).alias("CP"),
        (F.lit(-5.0) + 10.0 * tri + _jit("n")).alias("FC_CP"),
        (0.25 * _jit("e")).alias("EPS"),
    ).withColumn("USTAR", F.lit(0.05) + 0.12 * F.col("U"))


def _scop_physics_df(spark):
    from diive_spark.operators.selfheating import scop_physics
    return scop_physics(
        _scop_fixture(spark), ["site"], "ts",
        ta_col="TA", gas_density_col="GAS", rho_a_col="RHO_A",
        rho_v_col="RHO_V", u_col="U", ustar_col="USTAR", cp_col="CP",
        method="JAR09", daytime_col="DAYTIME",
        remove_outliers=True, n_sigmas=5, hampel_window=_HW)


def q_scop_physics(spark, sf_dir):
    """SCOP JAR09 self-heating physics (operators/selfheating.py:78;
    reference flux/lowres/selfheating.py ScopPhysics.run): aerodynamic
    resistance with a centred 97-record running-Hampel pass, linear
    day/night surface-temperature model, Burba et al. (2006) eq. 8
    unscaled flux-correction term with a second Hampel pass — the FULL
    chain replayed by the SQL oracle, including both two-level rolling
    median/MAD windows."""
    out = _scop_physics_df(spark)
    return out.select(
        "i",
        _r6("RA").alias("ra"),
        _r6("T_SURF").alias("t_surf"),
        _r6("K_AIR").alias("k_air"),
        _r6(F.col("LV") * 1000.0).alias("lv_mj"),
        _r6(F.col("FCT_UNSC") * 1e6).alias("fct_u"),
    )


def q_scop_sf(spark, sf_dir):
    """SCOP scaling-factor optimizer (operators/selfheating.py:174;
    reference ScopOptimizer.run): per (daytime, class-variable quantile
    bin), the EXACT minimizer of sum|cumsum(target + xi*FCT) -
    cumsum(reference)| — the |B|-weighted median of the breakpoints
    -A/B (the closed form the reference reaches via scipy
    minimize_scalar). FCT is quantized to a dyadic 2^-20 grid so both
    engines' cumsums are exact; the SQL oracle replays edges, binning,
    cumsums, breakpoint selection, clipping and the L1 cost."""
    from diive_spark.operators.selfheating import scop_optimizer
    phys = _scop_physics_df(spark)
    opt_in = phys.withColumn(
        "FCT_Q", F.round(F.col("FCT_UNSC") * 1048576.0, 0) / 1048576.0
    ).withColumn(
        "FC_OP", F.col("FC_CP") - 2.5 * F.col("FCT_Q") + F.col("EPS"))
    sf = scop_optimizer(
        opt_in, ["site"], "ts",
        target_col="FC_OP", reference_col="FC_CP", fct_col="FCT_Q",
        class_col="U", daytime_col="DAYTIME",
        n_classes=5, min_n=10, n_bootstrap=0)
    return sf.select(
        F.col("DAYTIME").alias("daytime"),
        F.col("GROUP_CLASSVAR").alias("bin"),
        _r6("GROUP_CLASSVAR_MIN").alias("cls_min"),
        _r6("GROUP_CLASSVAR_MAX").alias("cls_max"),
        _r6("SF_MEDIAN").alias("sf"),
        _r6("SOS_MEDIAN").alias("sos"),
        F.col("NUMVALS_AVG").alias("nvals"),
    )


_SCOP_BASE_SQL = f"""
base AS (
  SELECT i, i % 48 AS hh,
         abs((i % 48) - 24) / 24.0 AS tri,
         CASE WHEN (i % 48) >= 12 AND (i % 48) < 36 THEN 1 ELSE 0 END AS day,
         ('0x' || substr(md5('t' || i::VARCHAR), 1, 8))::BIGINT
           / 4294967296.0 - 0.5 AS jt,
         ('0x' || substr(md5('u' || i::VARCHAR), 1, 8))::BIGINT
           / 4294967296.0 - 0.5 AS ju,
         ('0x' || substr(md5('g' || i::VARCHAR), 1, 8))::BIGINT
           / 4294967296.0 - 0.5 AS jg,
         ('0x' || substr(md5('n' || i::VARCHAR), 1, 8))::BIGINT
           / 4294967296.0 - 0.5 AS jn,
         ('0x' || substr(md5('e' || i::VARCHAR), 1, 8))::BIGINT
           / 4294967296.0 - 0.5 AS je
  FROM range({SCOP_N}) t(i)
),
fx AS (
  SELECT i, day,
         18.0 - 12.0 * tri + 2.0 * jt AS ta,
         1.5 + 2.0 * (1.0 - tri) + ju
           + CASE WHEN i % 211 = 0 THEN 25.0 ELSE 0.0 END AS u,
         0.75 + 0.1 * jg
           + CASE WHEN i % 173 = 0 THEN 3.0 ELSE 0.0 END AS gas,
         0.008 + 0.004 * (1.0 - tri) AS rho_v,
         1.2 AS rho_a, 1005.0 AS cp,
         -5.0 + 10.0 * tri + jn AS fc_cp,
         0.25 * je AS eps
  FROM base
),
fx2 AS (SELECT *, 0.05 + 0.12 * u AS ustar FROM fx),
-- Hampel pass 1 on RA = u/ustar^2 (centred 97, median/MAD, 5 sigma)
ra0 AS (SELECT *, u / (ustar * ustar) AS ra FROM fx2),
ra1 AS (
  SELECT *, median(ra) OVER w AS med
  FROM ra0 WINDOW w AS (ORDER BY i ROWS BETWEEN 48 PRECEDING
                        AND 48 FOLLOWING)
),
ra2 AS (SELECT *, abs(ra - med) AS adev FROM ra1),
ra3 AS (
  SELECT *, median(adev) OVER w * 1.4826 AS mad
  FROM ra2 WINDOW w AS (ORDER BY i ROWS BETWEEN 48 PRECEDING
                        AND 48 FOLLOWING)
),
ra4 AS (
  SELECT i, day, ta, u, gas, rho_v, rho_a, cp, fc_cp, eps, ustar,
         CASE WHEN adev > mad * 5 THEN NULL ELSE ra END AS ra
  FROM ra3
),
-- JAR09 physics + Burba eq. 8
ph0 AS (
  SELECT *,
         CASE WHEN day = 1 THEN 0.93 * ta + 3.17
              ELSE 1.05 * ta + 1.52 END AS t_surf,
         0.02425 + 0.00007 * ta AS k_air,
         (2.501 - 0.00237 * ta) * 0.01801528 AS lv
  FROM ra4
),
ph1 AS (
  SELECT *, ((t_surf - ta) * gas / (ra * (ta + 273.15)))
            * (1 + 1.6077 * rho_v / (rho_a - rho_v)) AS fct
  FROM ph0
),
-- Hampel pass 2 on FCT
f1 AS (
  SELECT *, median(fct) OVER w AS fmed
  FROM ph1 WINDOW w AS (ORDER BY i ROWS BETWEEN 48 PRECEDING
                        AND 48 FOLLOWING)
),
f2 AS (SELECT *, abs(fct - fmed) AS fdev FROM f1),
f3 AS (
  SELECT *, median(fdev) OVER w * 1.4826 AS fmad
  FROM f2 WINDOW w AS (ORDER BY i ROWS BETWEEN 48 PRECEDING
                       AND 48 FOLLOWING)
),
phys AS (
  SELECT i, day, ta, u, gas, rho_v, rho_a, cp, fc_cp, eps, ra, t_surf,
         k_air, lv,
         CASE WHEN fdev > fmad * 5 THEN NULL ELSE fct END AS fct
  FROM f3
)"""

SQL_SCOP_PHYSICS = f"""
WITH {_SCOP_BASE_SQL}
SELECT i, round(1e-9 + ra, 6) AS ra,
       round(1e-9 + t_surf, 6) AS t_surf,
       round(1e-9 + k_air, 6) AS k_air,
       round(1e-9 + lv * 1000.0, 6) AS lv_mj,
       round(1e-9 + fct * 1e6, 6) AS fct_u
FROM phys
"""

SQL_SCOP_SF = f"""
WITH {_SCOP_BASE_SQL},
q AS (
  SELECT *, round(fct * 1048576.0) / 1048576.0 AS fct_q FROM phys
),
tgt AS (
  SELECT i, day, u, fct_q, fc_cp,
         fc_cp - 2.5 * fct_q + eps AS fc_op
  FROM q
),
edges AS (
  SELECT day, quantile_cont(u, [0.2, 0.4, 0.6, 0.8]) AS e
  FROM tgt GROUP BY 1
),
binned AS (
  SELECT t.*, (CASE WHEN t.u > e.e[1] THEN 1 ELSE 0 END
             + CASE WHEN t.u > e.e[2] THEN 1 ELSE 0 END
             + CASE WHEN t.u > e.e[3] THEN 1 ELSE 0 END
             + CASE WHEN t.u > e.e[4] THEN 1 ELSE 0 END) AS bin
  FROM tgt t JOIN edges e ON e.day = t.day
),
valid AS (SELECT * FROM binned WHERE fct_q IS NOT NULL),
cums AS (
  SELECT day, bin, u, i,
         sum(fc_op - fc_cp) OVER w AS a,
         sum(fct_q) OVER w AS b
  FROM valid
  WINDOW w AS (PARTITION BY day, bin ORDER BY i ROWS UNBOUNDED PRECEDING)
),
bp AS (SELECT day, bin, -a / b AS x, abs(b) AS wgt FROM cums WHERE b <> 0),
tot AS (SELECT day, bin, sum(wgt) AS tw FROM bp GROUP BY 1, 2),
cw AS (
  SELECT bp.*, sum(wgt) OVER (PARTITION BY day, bin ORDER BY x
                              ROWS UNBOUNDED PRECEDING) AS cwgt
  FROM bp
),
pick AS (
  SELECT c.day, c.bin,
         least(greatest(min(c.x), 0.0), 50.0) AS f
  FROM cw c JOIN tot ON tot.day = c.day AND tot.bin = c.bin
  WHERE c.cwgt >= 0.5 * tot.tw
  GROUP BY 1, 2
),
cost AS (
  SELECT c.day, c.bin, p.f, sum(abs(c.a + p.f * c.b)) AS sos
  FROM cums c JOIN pick p ON p.day = c.day AND p.bin = c.bin
  GROUP BY 1, 2, 3
),
stats AS (
  SELECT day, bin, min(u) AS cls_min, max(u) AS cls_max,
         count(*) AS nvals
  FROM valid GROUP BY 1, 2
)
SELECT s.day AS daytime, s.bin,
       round(1e-9 + s.cls_min, 6) AS cls_min,
       round(1e-9 + s.cls_max, 6) AS cls_max,
       round(1e-9 + c.f, 6) AS sf,
       round(1e-9 + c.sos, 6) AS sos,
       s.nvals
FROM stats s JOIN cost c ON c.day = s.day AND c.bin = s.bin
WHERE s.nvals >= 10
"""

QUERIES["scop_physics"] = q_scop_physics
ORACLES["scop_physics"] = SQL_SCOP_PHYSICS
QUERIES["scop_sf"] = q_scop_sf
ORACLES["scop_sf"] = SQL_SCOP_SF


# ---------------------------------------------------------------------------
# PWB lag detection (reference-executed goldens)
# ---------------------------------------------------------------------------

PWB_HZ = 10
PWB_NBOOT = 49
PWB_SEGMENTS = (("segA", 23, 2), ("segB", 12, 9))  # (key, lag, seed)


def pwb_fixture_arrays(n=6000):
    """Seeded AR(1) wind/scalar/sonic world per segment, quantized to a
    1/4096 grid (JSON-lossless for the reference subprocess)."""
    import numpy as np

    out = {}
    for key, lag, seed in PWB_SEGMENTS:
        rng = np.random.default_rng(seed)

        def ar1(a, scale):
            e = rng.normal(0, scale, n + 500)
            x = np.empty(n + 500)
            x[0] = e[0]
            for i in range(1, n + 500):
                x[i] = a * x[i - 1] + e[i]
            return x[500:]

        w = ar1(0.9, 0.3)
        tsonic = 0.6 * w + ar1(0.9, 0.2) + 293.0
        scalar = (np.concatenate([np.zeros(lag), 0.15 * w[:-lag]])
                  + 0.5 * ar1(0.95, 0.4) + 400.0)
        q = lambda a: np.round(a * 4096) / 4096  # noqa: E731
        out[key] = (q(w), q(scalar), q(tsonic))
    return out


def q_pwb_lag(spark, sf_dir):
    """PWB lag detection (operators/pwb.py:336; reference
    flux/hires/lag_pwb.py PreWhiteningBootstrap): Breitung stationarity,
    AIC AR pre-whitening, 4-combination block bootstrap, KDE-MAP winning
    lag + HDI — per segment through the engine's applyInPandas path. The
    oracle rows are REFERENCE-EXECUTED golden values (RNG consumption
    matched; regenerated + asserted by
    tests/test_partition_hires_gates.py)."""
    import numpy as np
    import pandas as pd

    from diive_spark.operators.pwb import pwb_lag_detection

    frames = []
    for key, (w, s, t) in pwb_fixture_arrays().items():
        frames.append(pd.DataFrame({
            "seg": key, "rec": np.arange(len(w)), "W": w, "S": s, "T": t}))
    sdf = spark.createDataFrame(pd.concat(frames))
    out = pwb_lag_detection(
        sdf, ["seg"], "rec", w_col="W", scalar_col="S", tsonic_col="T",
        hz=PWB_HZ, n_bootstrap=PWB_NBOOT)
    return out.select(
        "seg",
        _r6("tlag_s").alias("tlag_s"),
        F.col("tlag_records").alias("tlag_rec"),
        _r6("hdi_lo_s").alias("hdi_lo"),
        _r6("hdi_hi_s").alias("hdi_hi"),
        F.col("is_reliable").cast("int").alias("reliable"),
        F.col("combination").alias("combo"),
        _r6("tlag_pw_s").alias("tlag_pw"),
        _r6("corr_pw").alias("corr_pw"),
        _r6("cov_pwb").alias("cov_pwb"),
        F.col("ar_order_scalar").alias("ar_s"),
        F.col("ar_order_w").alias("ar_w"),
        F.col("ar_order_tsonic").alias("ar_t"),
        F.col("n_used").alias("n_used"),
    )


#: reference-executed goldens — regenerated by
#: scripts/gen_gate_goldens.py, asserted equal to a live reference
#: execution in tests/test_partition_hires_gates.py
PWB_GOLDEN_ROWS: list[tuple] = []  # filled below by generated literal

SQL_PWB_LAG_TEMPLATE = """
SELECT * FROM (VALUES
{rows}
) AS t(seg, tlag_s, tlag_rec, hdi_lo, hdi_hi, reliable, combo, tlag_pw,
       corr_pw, cov_pwb, ar_s, ar_w, ar_t, n_used)
"""

QUERIES["pwb_lag"] = q_pwb_lag
# ORACLES["pwb_lag"] registered from the generated goldens module (below)
try:
    from ._goldens import PWB_GOLDEN_SQL
    ORACLES["pwb_lag"] = PWB_GOLDEN_SQL
except ImportError:  # goldens not generated yet: rows-only check
    pass
