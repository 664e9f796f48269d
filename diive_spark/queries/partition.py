"""Flux-partitioning family gates (round-6): the ONEFlux nighttime
partitioning pipeline against REFERENCE-EXECUTED golden values, and the
REddyProc-daytime deterministic stages (potential radiation + Lasslop
light-response NEP prediction) as FULL SQL replays.

Why two oracle styles: the nighttime ONEFlux pipeline is built on
iterated Levenberg-Marquardt Lloyd-Taylor fits — not SQL-expressible —
but the engine matches the EXECUTED reference value-for-value (1e-9,
shared-optimizer protocol, tests/test_oneflux_nt.py), so the oracle is
the reference's own output on the same fixture, embedded as VALUES and
re-asserted live by tests/test_partition_hires_gates.py. The daytime
REddyProc deterministic stages are closed-form (solar geometry,
rectangular-hyperbola LRC) and replay exactly in SQL; the daytime FITS
stay certified by the shared-optimizer pytest
(tests/test_daytime_rp.py).

Reference: /root/reference/diive/flux/partitioning/nighttime_oneflux.py,
daytime_reddyproc.py (+ REddyProc fCalcPotRadiation).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ._shared import ORACLES, QUERIES, _r6

NT_LAT = 46.0
NT_DAYS = 365

DAY_LAT, DAY_LON, DAY_UTC = 46.0, 8.0, 1
DAY_N = 4800  # 100 days x 48 half-hours
DAY_THETA = (0.05, 18.0, 0.06, 2.5, 150.0)  # k, beta, alpha, rref, e0


def nt_fixture_pdf():
    """One seeded year of half-hourly NEE/TA/SW_IN (Lloyd-Taylor
    respiration + light uptake + gaps), quantized to a 1/64 grid so the
    reference subprocess sees bit-identical doubles through JSON."""
    import numpy as np
    import pandas as pd

    from diive_spark.operators import oneflux_nt

    rng = np.random.default_rng(11)
    idx = pd.date_range("2023-01-01", periods=NT_DAYS * 48, freq="30min")
    doy = idx.dayofyear.to_numpy(float)
    hr = idx.hour.to_numpy(float) + idx.minute.to_numpy(float) / 60.0
    ta = (8 + 10 * np.sin((doy - 100) / 365 * 2 * np.pi)
          + 5 * np.sin((hr - 9) / 24 * 2 * np.pi)
          + rng.normal(0, 1.0, len(idx)))
    sw = (np.maximum(0.0, 800 * np.sin(np.pi * (hr - 6) / 12))
          * (np.abs(hr - 12) < 6))
    resp = oneflux_nt.lloyd_taylor(ta, 3.0, 150.0)
    uptake = np.where(sw > 0, 0.02 * sw, 0.0)
    nee = resp - uptake + rng.normal(0, 0.4, len(idx))
    nee[rng.integers(0, len(idx), 300)] = np.nan
    nee_f = np.where(np.isfinite(nee), nee, resp - uptake)
    q = lambda a: np.round(a * 64) / 64  # noqa: E731
    return pd.DataFrame({"ts": idx, "NEE": q(nee), "TA": q(ta),
                         "SW_IN": q(sw), "NEE_F": q(nee_f), "TA_F": q(ta),
                         "doy": doy, "hr": hr})


def q_nt_oneflux(spark, sf_dir):
    """ONEFlux nighttime NEE partitioning (operators/oneflux_nt.py:329;
    reference nighttime_oneflux.py:273-392): potential-daylight night
    mask, 14-day/5-day-stride trimmed Lloyd-Taylor E0 fits, best-3
    selection with SE gates, 4-day Rref re-analysis with ordinary +
    robust passes, RECO/GPP composition — through the engine's
    per-(key, year) applyInPandas path, certified as daily means against
    the EXECUTED reference (goldens in queries/_goldens.py)."""
    from diive_spark.operators.oneflux_nt import (
        partition_nee_nighttime_oneflux)

    pdf = nt_fixture_pdf().drop(columns=["doy", "hr"]).assign(site="A")
    out = partition_nee_nighttime_oneflux(
        spark.createDataFrame(pdf), ["site"], "ts",
        nee_col="NEE", ta_col="TA", swin_col="SW_IN",
        nee_f_col="NEE_F", ta_f_col="TA_F", lat=NT_LAT)
    return out.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("d")).agg(
        F.count("RECO_NT_OF").alias("n"),
        _r6(F.avg("RECO_NT_OF")).alias("reco"),
        _r6(F.avg("RECO_NT_OF_ROB")).alias("reco_rob"),
        _r6(F.avg("GPP_NT_OF")).alias("gpp"),
        _r6(F.avg("RREF_NT_OF")).alias("rref"),
        _r6(F.min("E0_NT_OF")).alias("e0"),
    )


SQL_NT_ONEFLUX_TEMPLATE = """
SELECT * FROM (VALUES
{rows}
) AS t(d, n, reco, reco_rob, gpp, rref, e0)
"""


def q_day_rp_stages(spark, sf_dir):
    """REddyProc-daytime deterministic stages
    (operators/daytime_rp.py:71/328; reference daytime_reddyproc.py +
    fCalcPotRadiation): the solartime/Cescatti potential radiation and
    the Lasslop light-response NEP prediction (VPD-modified Amax,
    rectangular hyperbola, Lloyd-Taylor respiration) evaluated over a
    4800-point driver grid through the engine's numpy kernels on the
    distributed mapInPandas path — FULL SQL replay."""
    import numpy as np
    import pandas as pd

    from diive_spark.operators.daytime_rp import (potrad_reddyproc,
                                                  predict_nep)

    def compute(it):
        for pdf in it:
            i = pdf["id"].to_numpy()
            doy = (60 + i // 48).astype(float)
            hr = (i % 48) / 2.0
            vpd = 30.0 * ((i % 97) / 96.0)
            temp = -5.0 + 35.0 * ((i % 89) / 88.0)
            pot = potrad_reddyproc(doy, hr, DAY_LAT, DAY_LON, DAY_UTC)
            rg = pot * 0.75
            nep = predict_nep(np.asarray(DAY_THETA), rg, vpd, temp, False)
            yield pd.DataFrame({"i": i, "potrad": pot, "nep": nep})

    grid = spark.range(DAY_N).repartition(8)
    out = grid.mapInPandas(compute, schema="i long, potrad double, nep double")
    return out.select("i", _r6("potrad").alias("potrad"),
                      _r6("nep").alias("nep"))


SQL_DAY_RP_STAGES = f"""
WITH g AS (
  SELECT i, CAST(60 + i // 48 AS DOUBLE) AS doy,
         (i % 48) / 2.0 AS hr,
         30.0 * ((i % 97) / 96.0) AS vpd,
         -5.0 + 35.0 * ((i % 89) / 88.0) AS temp
  FROM range({DAY_N}) t(i)
),
sol AS (
  SELECT *, 2.0 * pi() * (doy - 1.0) / 365.24 AS fy FROM g
),
sol2 AS (
  SELECT *,
         hr + {DAY_LON} / 15.0 - {DAY_UTC}
           + (0.0072 * cos(fy) - 0.0528 * cos(2 * fy)
              - 0.0012 * cos(3 * fy) - 0.1229 * sin(fy)
              - 0.1565 * sin(2 * fy) - 0.0041 * sin(3 * fy)) AS solar_hour,
         (0.33281 - 22.984 * cos(fy) - 0.3499 * cos(2 * fy)
          - 0.1398 * cos(3 * fy) + 3.7872 * sin(fy)
          + 0.03205 * sin(2 * fy) + 0.07187 * sin(3 * fy))
           * pi() / 180.0 AS decl,
         {DAY_LAT} * pi() / 180.0 AS lat_r
  FROM sol
),
sol3 AS (
  SELECT *,
         CASE WHEN (solar_hour - 12.0) * pi() / 12.0 < -pi()
              THEN (solar_hour - 12.0) * pi() / 12.0 + 2 * pi()
              ELSE (solar_hour - 12.0) * pi() / 12.0 END AS h
  FROM sol2
),
sol4 AS (
  SELECT *,
         asin(sin(decl) * sin(lat_r)
              + cos(decl) * cos(lat_r) * cos(h)) AS elev,
         1366.1 * (1.00011 + 0.034221 * cos(fy) + 0.00128 * sin(fy)
                   + 0.000719 * cos(2 * fy)
                   + 0.000077 * sin(2 * fy)) AS ext
  FROM sol3
),
pot AS (
  SELECT i, vpd, temp,
         CASE WHEN elev <= 0.0 THEN 0.0 ELSE ext * sin(elev) END AS potrad
  FROM sol4
),
lrc AS (
  SELECT i, potrad,
         CASE WHEN vpd > 10.0
              THEN {DAY_THETA[1]} * exp(-{DAY_THETA[0]} * (vpd - 10.0))
              ELSE {DAY_THETA[1]} END AS amax,
         potrad * 0.75 AS rg,
         {DAY_THETA[3]} * exp({DAY_THETA[4]}
             * (1.0 / ((273.15 + 15.0) - 227.13)
                - 1.0 / ((temp + 273.15) - 227.13))) AS reco
  FROM pot
)
SELECT i, round(1e-9 + potrad, 6) AS potrad,
       round(1e-9 + (amax * {DAY_THETA[2]} * rg)
                    / ({DAY_THETA[2]} * rg + amax) - reco, 6) AS nep
FROM lrc
"""

QUERIES["day_rp_stages"] = q_day_rp_stages
ORACLES["day_rp_stages"] = SQL_DAY_RP_STAGES

QUERIES["nt_oneflux"] = q_nt_oneflux
try:
    from ._goldens import NT_ONEFLUX_GOLDEN_SQL
    ORACLES["nt_oneflux"] = NT_ONEFLUX_GOLDEN_SQL
except ImportError:  # goldens not generated yet: rows-only check
    pass
