"""Open-path IRGA self-heating correction (SCOP: Self-heating COrrection
Procedure) — Burba/Jarvi sensor-heating physics, scaling-factor
optimization against a closed-path reference, and the final correction.

Reference: /root/reference/diive/flux/lowres/selfheating.py
(``ScopPhysics`` / ``ScopOptimizer`` / ``ScopApplicator``). Structure
mirrored; the plotting/diagnostics layer is out of scope.

- :func:`scop_physics` (ScopPhysics.run, selfheating.py:267-288): the
  unscaled flux correction term FCT_UNSC from instrument-surface heating.
  Surface temperature models: JAR09 (day/night linear), BUR06 (quadratic)
  — both feed Burba et al. (2006) eq. 8:
  FCT = (Ts−Ta)·ρ_gas / (ra·Ta_K) · (1 + 1.6077·ρ_v/ρ_d); BUR08 models
  the three instrument surfaces (top/bottom window, spar) with
  boundary-layer thicknesses σ(u) and sums their sensible heat
  S = S_bot + S_top + 0.15·S_spar, FCT = S/(ρ_a·c_p)·ρ_gas/Ta_K.
  EVERYTHING is a column expression (one pass, no shuffle) except the
  optional "fast" running-Hampel outlier removal on ra and FCT
  (selfheating.py:505-530: centered 1440-record rolling median/MAD,
  5σ) — sliding-window aggregates per key.
- :func:`scop_optimizer` (ScopOptimizer.run, selfheating.py:878-969):
  per (daytime, class-variable quantile bin), the scaling factor ξ
  minimizing Σ|cumsum(target + ξ·FCT) − cumsum(reference)| on [0, 50].
  The cost is piecewise-linear CONVEX in ξ: cost(ξ) = Σᵢ|Aᵢ + ξ·Bᵢ|
  with A = cumsum(target−ref), B = cumsum(FCT) — so the engine solves it
  EXACTLY as the |B|-weighted median of the breakpoints −A/B (clipped),
  where the reference runs scipy ``minimize_scalar``; same optimum,
  closed form, deterministic. Optional circular-block bootstrap
  (block 12) with a seeded per-bin RNG (the reference's is unseeded —
  documented divergence for reproducibility).
- :func:`scop_applicator` (ScopApplicator, selfheating.py:1131-1260):
  backward merge-asof of the per-(daytime, bin) SF onto the class
  variable (rows below the lowest bin backfill from it), a
  month/daytime/hour/minute diel-median SF fallback for rows missing the
  class variable, then corrected = flux + SF·FCT (H2O: ·Lv → W m-2).

At 100 TB: physics is map-only; the optimizer shuffles once on
(key, daytime, bin) with bounded bins; the applicator is one broadcast
range-join (the SF table is tiny) + one diel-median groupBy.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from diive_spark.functions.thermo import aerodynamic_resistance

HAMPEL_K = 1.4826


def air_thermal_conductivity(ta) -> F.Column:
    """k_air [W m-1 K-1], linear approximation (selfheating.py:436-458)."""
    return F.lit(0.02425) + F.lit(0.00007) * ta


def latent_heat_vaporization_j_umol(ta) -> F.Column:
    """Lv [J µmol-1] (selfheating.py:461-481)."""
    return (F.lit(2.501) - F.lit(0.00237) * ta) * F.lit(0.01801528)


def _fast_hampel_null(df, key_cols, ts_col, col, n_sigmas=5, window=1440):
    """The reference's ``_remove_outliers_fast`` (selfheating.py:505-530):
    centered rolling median / MAD (min_periods=1), outliers → null."""
    w = Window.partitionBy(*key_cols).orderBy(ts_col).rowsBetween(
        -((window - 1) // 2), window // 2)
    med = F.percentile(F.col(col), F.lit(0.5)).over(w)
    df = df.withColumn("_absdev", F.abs(F.col(col) - med)) \
           .withColumn("_med", med)
    mad = F.percentile(F.col("_absdev"), F.lit(0.5)).over(w) * HAMPEL_K
    out = F.col("_absdev") > mad * n_sigmas
    return df.withColumn(
        col, F.when(out, F.lit(None)).otherwise(F.col(col))
    ).drop("_absdev", "_med")


def scop_physics(
    df: DataFrame, key_cols: list[str], ts_col: str, *,
    ta_col: str, gas_density_col: str, rho_a_col: str, rho_v_col: str,
    u_col: str, ustar_col: str, cp_col: str,
    method: str = "JAR09", flux_type: str = "CO2",
    daytime_col: str | None = None,
    lat: float | None = None, lon: float | None = None, utc_offset: int = 1,
    remove_outliers: bool = True, n_sigmas: int = 5,
    hampel_window: int = 1440,
) -> DataFrame:
    """Append RA, T_SURF (bulk surface temperature; per-surface S for
    BUR08 — named T_SURF, not the reference's TS, to avoid Spark's
    case-insensitive clash with a ``ts`` timestamp column),
    K_AIR, LV and FCT_UNSC [µmol m-2 s-1]. ``daytime_col`` (1/0) or
    lat/lon/utc_offset for the potential-radiation daytime flag
    (threshold 20 W m-2, the reference's DaytimeNighttimeFlag)."""
    if method not in ("JAR09", "BUR06", "BUR08"):
        raise ValueError(f"unknown method {method!r}")
    if daytime_col is None:
        from diive_spark.functions.solar import daytime_nighttime_flag
        if lat is None or lon is None:
            raise ValueError("daytime_col or lat/lon required")
        df = daytime_nighttime_flag(df, ts_col, lat, lon, utc_offset,
                                    nighttime_threshold=20.0)
        daytime_col = "DAYTIME"
    ta = F.col(ta_col)
    u = F.col(u_col)
    day = F.col(daytime_col) == 1
    df = df.withColumn("RA", aerodynamic_resistance(u, F.col(ustar_col)))
    if remove_outliers:
        df = _fast_hampel_null(df, key_cols, ts_col, "RA",
                               n_sigmas=n_sigmas, window=hampel_window)
    df = df.withColumn("K_AIR", air_thermal_conductivity(ta)) \
           .withColumn("LV", latent_heat_vaporization_j_umol(ta))
    rho_d = F.col(rho_a_col) - F.col(rho_v_col)
    gas = F.col(gas_density_col)
    ta_k = ta + 273.15

    if method == "BUR08":
        # three instrument surfaces (selfheating.py:547-619)
        ts_top = F.when(day, 1.005 * ta + 0.24).otherwise(1.008 * ta - 0.41)
        sig_top = 0.0028 * F.sqrt(F.lit(0.045) / u) + 0.00025 / u + 0.0045
        r_top = F.lit(0.0225)
        s_top = F.col("K_AIR") * ((r_top + sig_top) * (ts_top - ta)
                                  / (r_top * sig_top))
        ts_bot = F.when(day, 0.944 * ta + 2.57).otherwise(0.883 * ta + 2.17)
        sig_bot = 0.004 * F.sqrt(F.lit(0.065) / u) + 0.004
        s_bot = F.col("K_AIR") * (ts_bot - ta) / sig_bot
        ts_spar = F.when(day, 1.01 * ta + 0.36).otherwise(1.01 * ta - 0.17)
        sig_spar = 0.0058 * F.sqrt(F.lit(0.005) / u)
        r_spar = F.lit(0.0025)
        s_spar = F.col("K_AIR") * ((ts_spar - ta)
                                   / (r_spar * F.log((r_spar + sig_spar)
                                                     / r_spar)))
        s_all = s_bot + s_top + 0.15 * s_spar
        df = df.withColumn("TS_TOP", ts_top).withColumn("TS_BOTTOM", ts_bot) \
               .withColumn("TS_SPAR", ts_spar).withColumn("S", s_all)
        fct = (s_all / (F.col(rho_a_col) * F.col(cp_col))) * (gas / ta_k)
        df = df.withColumn("T_SURF", F.lit(None).cast("double"))
    else:
        if method == "BUR06":
            ts_s = 0.0025 * ta * ta + 0.9 * ta + 2.07
        else:  # JAR09
            ts_s = F.when(day, 0.93 * ta + 3.17).otherwise(1.05 * ta + 1.52)
        df = df.withColumn("T_SURF", ts_s) \
               .withColumn("S", F.lit(None).cast("double"))
        # Burba et al. (2006) eq. 8 (selfheating.py:619-641)
        fct = ((F.col("T_SURF") - ta) * gas / (F.col("RA") * ta_k)) \
            * (1 + 1.6077 * F.col(rho_v_col) / rho_d)
    df = df.withColumn("FCT_UNSC", fct)
    if remove_outliers:
        df = _fast_hampel_null(df, key_cols, ts_col, "FCT_UNSC",
                               n_sigmas=n_sigmas, window=hampel_window)
    return df


def exact_l1_factor(target, ref, fct, lo=0.0, hi=50.0):
    """EXACT minimizer of Σ|cumsum(target + ξ·fct) − cumsum(ref)| on
    [lo, hi]: |B|-weighted median of the breakpoints −A/B (pure numpy).
    Returns (factor, cost_at_factor)."""
    a = np.cumsum(np.asarray(target, float) - np.asarray(ref, float))
    b = np.cumsum(np.asarray(fct, float))
    nz = b != 0
    if not nz.any():
        return lo, float(np.abs(a).sum())
    x = -a[nz] / b[nz]
    w = np.abs(b[nz])
    order = np.argsort(x)
    x, w = x[order], w[order]
    cw = np.cumsum(w)
    f = float(x[np.searchsorted(cw, 0.5 * cw[-1])])
    f = min(max(f, lo), hi)
    cost = float(np.abs(a + f * b).sum())
    return f, cost


def scop_optimizer(
    df: DataFrame, key_cols: list[str], ts_col: str, *,
    target_col: str, reference_col: str, fct_col: str,
    class_col: str, daytime_col: str,
    n_classes: int = 5, min_n: int = 10, n_bootstrap: int = 0,
    block_size: int = 12, bounds: tuple[float, float] = (0.0, 50.0),
) -> DataFrame:
    """Per-(key, daytime, class-quantile-bin) scaling factors. Returns
    (key..., DAYTIME, GROUP_CLASSVAR, GROUP_CLASSVAR_MIN/MAX, SF_MEDIAN,
    SF_Q25, SF_Q75, SOS_MEDIAN, NUMVALS_AVG)."""
    import pandas as pd
    from pyspark.sql.types import (DoubleType, LongType, StructField,
                                   StructType)

    sel = df.select(
        *key_cols, F.col(ts_col).alias("_ts"),
        F.col(target_col).cast("double").alias("_target"),
        F.col(reference_col).cast("double").alias("_ref"),
        F.col(fct_col).cast("double").alias("_fct"),
        F.col(class_col).cast("double").alias("_cls"),
        F.col(daytime_col).cast("long").alias("DAYTIME"),
    ).filter(F.col("DAYTIME").isNotNull() & F.col("_cls").isNotNull())
    # pd.qcut bin edges = exact interpolated quantiles per (key, daytime)
    probs = [i / n_classes for i in range(1, n_classes)]
    edges = sel.groupBy(*key_cols, "DAYTIME").agg(
        F.percentile("_cls", F.array([F.lit(p) for p in probs]))
        .alias("_edges"))
    binned = sel.join(F.broadcast(edges), [*key_cols, "DAYTIME"])
    bin_expr = F.lit(0)
    for i in range(len(probs)):
        bin_expr = F.when(F.col("_cls") <= F.col("_edges")[i], bin_expr) \
            .otherwise(F.lit(i + 1))
    binned = binned.withColumn("_bin", bin_expr.cast("long"))

    gcols = [*key_cols, "DAYTIME", "_bin"]
    key_fields = [f for f in binned.schema.fields
                  if f.name in (*key_cols, "DAYTIME")]
    schema = StructType(key_fields + [
        StructField("GROUP_CLASSVAR", LongType()),
        StructField("GROUP_CLASSVAR_MIN", DoubleType()),
        StructField("GROUP_CLASSVAR_MAX", DoubleType()),
        StructField("SF_MEDIAN", DoubleType()),
        StructField("SF_Q25", DoubleType()),
        StructField("SF_Q75", DoubleType()),
        StructField("SOS_MEDIAN", DoubleType()),
        StructField("NUMVALS_AVG", LongType()),
    ])
    lo, hi = bounds

    def kernel(kv, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_ts")
        valid = pdf.dropna(subset=["_target", "_ref", "_fct", "_cls"])
        empty = pdf.iloc[0:0][[f.name for f in key_fields]]
        if len(valid) < min_n:
            return empty.assign(
                GROUP_CLASSVAR=np.array([], np.int64),
                GROUP_CLASSVAR_MIN=[], GROUP_CLASSVAR_MAX=[],
                SF_MEDIAN=[], SF_Q25=[], SF_Q75=[], SOS_MEDIAN=[],
                NUMVALS_AVG=np.array([], np.int64))
        t = valid["_target"].to_numpy()
        r = valid["_ref"].to_numpy()
        c = valid["_fct"].to_numpy()
        n = len(valid)
        if n_bootstrap > 0:
            # seeded per bin: deterministic, unlike the reference's
            # unseeded np.random (documented divergence); crc32, not
            # hash() — Python string hashing is salted per process
            import zlib
            seed = zlib.crc32("|".join(str(v) for v in kv).encode())
            rng = np.random.default_rng(seed)
            facs, costs = [], []
            nb = int(np.ceil(n / block_size))
            for _ in range(n_bootstrap):
                starts = rng.integers(0, n, size=nb)
                idx = ((starts[:, None] + np.arange(block_size)[None, :])
                       .ravel() % n)[:n]
                f, s = exact_l1_factor(t[idx], r[idx], c[idx], lo, hi)
                facs.append(f)
                costs.append(s)
        else:
            f, s = exact_l1_factor(t, r, c, lo, hi)
            facs, costs = [f], [s]
        row = {f.name: pdf[f.name].iloc[0] for f in key_fields}
        row.update({
            "GROUP_CLASSVAR": int(pdf["_bin"].iloc[0]),
            "GROUP_CLASSVAR_MIN": float(valid["_cls"].min()),
            "GROUP_CLASSVAR_MAX": float(valid["_cls"].max()),
            "SF_MEDIAN": float(np.median(facs)),
            "SF_Q25": float(np.percentile(facs, 25)),
            "SF_Q75": float(np.percentile(facs, 75)),
            "SOS_MEDIAN": float(np.median(costs)),
            "NUMVALS_AVG": n,
        })
        return pd.DataFrame([row])[[f.name for f in schema.fields]]

    return binned.groupBy(*gcols).applyInPandas(kernel, schema=schema)


def scop_applicator(
    df: DataFrame, key_cols: list[str], ts_col: str, *,
    flux_col: str, fct_col: str, class_col: str, daytime_col: str,
    sf_df: DataFrame, flux_type: str = "CO2", lv_col: str | None = None,
    corrected_col: str | None = None,
) -> DataFrame:
    """Assign SF_MEDIAN by backward merge-asof on the class variable per
    (key, daytime) — rows below the lowest bin backfill from it; rows
    missing the class variable impute SF from the
    month/daytime/hour/minute diel median (selfheating.py:1229-1366);
    then corrected = flux + SF·FCT (H2O with ``lv_col``: FCT·Lv, W m-2)."""
    corrected_col = corrected_col or f"{flux_col}_CORRECTED"
    sf = sf_df.select(*key_cols, F.col("DAYTIME").alias("_sfd"),
                      "GROUP_CLASSVAR", "GROUP_CLASSVAR_MIN", "SF_MEDIAN")
    joined = df.join(
        F.broadcast(sf),
        on=[*[df[k] == sf[k] for k in key_cols],
            df[daytime_col] == sf["_sfd"],
            df[class_col].isNotNull()
            & ((df[class_col] >= sf["GROUP_CLASSVAR_MIN"])
               | (sf["GROUP_CLASSVAR"] == 0))],
        how="left").drop(*[sf[k] for k in key_cols]).drop("_sfd")
    # backward asof: keep the matching bin with the LARGEST lower edge
    # (the GROUP_CLASSVAR==0 arm admits the lowest bin as the backfill)
    pick = Window.partitionBy(*[df[k] for k in key_cols], df[ts_col]) \
        .orderBy(F.col("GROUP_CLASSVAR_MIN").desc_nulls_last())
    joined = joined.withColumn("_rk", F.row_number().over(pick)) \
        .filter(F.col("_rk") == 1).drop("_rk", "GROUP_CLASSVAR_MIN")
    joined = joined.withColumnRenamed("SF_MEDIAN", "SF") \
                   .withColumnRenamed("GROUP_CLASSVAR", "CLASSVAR_GROUP")
    # diel-median fallback for rows with no SF (missing class variable);
    # group keys materialized as columns so the self-derived join is
    # unambiguous
    joined = (joined.withColumn("_m", F.month(ts_col))
              .withColumn("_h", F.hour(ts_col))
              .withColumn("_mi", F.minute(ts_col)))
    mdv = joined.groupBy(*key_cols, "_m", daytime_col, "_h", "_mi").agg(
        F.percentile("SF", F.lit(0.5)).alias("_sf_mdv"))
    joined = joined.join(F.broadcast(mdv),
                         on=[*key_cols, "_m", daytime_col, "_h", "_mi"],
                         how="left")
    joined = joined.withColumn("SF", F.coalesce("SF", "_sf_mdv")) \
                   .drop("_sf_mdv", "_m", "_h", "_mi")
    fct = F.col(fct_col) * F.col("SF")
    if flux_type == "H2O" and lv_col is not None:
        fct = fct * F.col(lv_col)
    joined = joined.withColumn("FCT", fct)
    return joined.withColumn(corrected_col, F.col(flux_col) + F.col("FCT"))
