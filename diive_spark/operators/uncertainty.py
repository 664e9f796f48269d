"""Random + joint flux uncertainty (PAS20 / Pastorello et al. 2020, ONEFlux).

Reference: ``RandomUncertaintyPAS20`` / ``JointUncertaintyPAS20``
(/root/reference/diive/flux/lowres/uncertainty.py:81-893; the exact
vectorized semantics are documented in the reference CHANGELOG.md:649),
themselves ports of ONEFlux ``nee_proc/src/randunc.c`` / ``compute_join``.
Re-expressed from scratch for Spark.

Hierarchy (each method fills only what earlier methods left undefined):
- **Method 1** (ONEFlux): per measured record, sample SD (N-1) of measured
  fluxes in a ±7-day window, ±1-hour time-of-day band (wrap-aware), under
  similar meteorology (|ΔTA| < 2.5 °C, |ΔVPD| < 5 hPa, |ΔSW_IN| < the
  record's own SW_IN clamped into [20, 50] W m-2); needs ≥ 6 matches.
- **Method 2** (ONEFlux): median of method-1 uncertainties of similar
  fluxes (within ±20 %, floor 2 µmol) in a ±14-day window (no time-of-day
  restriction — the C reference, not the paper's ±5-day text).
- **Method 3** (diive extension): same flux-similarity median over the
  WHOLE record (no time window).
- **Method 4** (diive extension): median of the uncertainties of the 10
  records centered at the record's flux-rank position.

Execution shape per method — this is the module's scale story:
- Methods 1+2 are ±window pooling, the same pattern as the MDS median
  cascade: slab+halo grouped maps (halo = the window radius), vectorized
  numpy kernels inside, per-(key, slab) parallelism, exactness by halo
  construction. No O(n²) join, no single-task stage.
- Method 3's band is VALUE-based with no time bound, but it only serves
  records still missing after m2 (rare on dense records): the small todo
  set is broadcast against the (gapfilled, unc) projection and reduced with
  one groupBy median.
- Method 4 needs the global flux-rank order per key; it is a per-key
  windowed median over the flux sort — a per-key single-task sort, the same
  documented single-series stance as sstats (it serves only the records
  outside every ±20 % band; skip it via ``methods`` at extreme per-key
  cardinality).

Cumulative propagation (CHANGELOG-documented semantics): random errors are
independent → quadrature running sum sqrt(cumsum(randunc²)), counted only
where the flux contributes; the USTAR-scenario term is fully correlated →
running spread of the cumulative scenario sums; both combine in quadrature.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from diive_spark.operators.halo import apply_with_halo

TA_TOLERANCE = 2.5      # deg C  (ONEFlux GF_DRIVER_2A_TOLERANCE_MIN)
VPD_TOLERANCE = 5.0     # hPa    (GF_DRIVER_2B_TOLERANCE_MIN)
SWIN_TOL_MIN = 20.0     # W m-2  (GF_DRIVER_1_TOLERANCE_MIN)
SWIN_TOL_MAX = 50.0     # W m-2  (GF_DRIVER_1_TOLERANCE_MAX)
FLUX_SIM_FRAC = 0.2     # ±20 % flux-similarity band ...
FLUX_SIM_FLOOR = 2.0    # ... but never narrower than ±2 µmol
M3_BROADCAST_ROW_CAP = 2_000_000  # todo rows above this shuffle-join instead
JOINT_DIVISOR_1SIGMA = 2.0   # 16th/84th percentiles bracket ±1σ (NEE)
JOINT_DIVISOR_IQR = 1.349    # 25th/75th IQR (LE/H energy fluxes)

DAY_NS = 86_400_000_000_000


def _flux_band(gf: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    tol = np.maximum(np.abs(gf) * FLUX_SIM_FRAC, FLUX_SIM_FLOOR)
    return gf - tol, gf + tol


def _m1_kernel(ts_ns, flux, ta, vpd_hpa, swin, winsize_days, winsize_hours,
               min_vals):
    """Method-1 per-row SD over the meteo-similar ±window; returns
    (randunc, n_vals) arrays (NaN where undefined / not measured)."""
    n = len(ts_ns)
    unc = np.full(n, np.nan)
    nvals = np.full(n, np.nan)
    hr = (ts_ns % DAY_NS) / 3.6e12  # hour-of-day fraction (NTZ-calendar)
    w = np.int64(winsize_days * DAY_NS)
    los = np.searchsorted(ts_ns, ts_ns - w, side="left")
    his = np.searchsorted(ts_ns, ts_ns + w, side="right")
    meas = np.isfinite(flux)
    for i in np.flatnonzero(meas):
        lo, hi = los[i], his[i]
        hw = hr[lo:hi]
        s = (hr[i] - winsize_hours) % 24.0
        e = (hr[i] + winsize_hours) % 24.0
        tod = ((hw >= s) & (hw <= e)) if s <= e else ((hw >= s) | (hw <= e))
        fw = flux[lo:hi]
        sel = (tod
               & (np.abs(ta[lo:hi] - ta[i]) < TA_TOLERANCE)
               & (np.abs(vpd_hpa[lo:hi] - vpd_hpa[i]) < VPD_TOLERANCE)
               & (np.abs(swin[lo:hi] - swin[i])
                  < np.clip(swin[i], SWIN_TOL_MIN, SWIN_TOL_MAX))
               & np.isfinite(fw))
        k = int(sel.sum())
        nvals[i] = k
        if k >= min_vals:
            unc[i] = np.std(fw[sel], ddof=1)
    return unc, nvals


def _m2_kernel(ts_ns, gf, unc_in, winsize_days):
    """Method-2: median of existing uncertainties of ±20 %-similar fluxes in
    a ±window (no time-of-day band); fills only rows with no uncertainty."""
    n = len(ts_ns)
    out = unc_in.copy()
    nvals = np.full(n, np.nan)
    w = np.int64(winsize_days * DAY_NS)
    los = np.searchsorted(ts_ns, ts_ns - w, side="left")
    his = np.searchsorted(ts_ns, ts_ns + w, side="right")
    for i in np.flatnonzero(~np.isfinite(unc_in)):
        lo_t, hi_t = _flux_band(np.asarray([gf[i]]))
        gw = gf[los[i]:his[i]]
        rw = unc_in[los[i]:his[i]]
        sel = (gw >= lo_t[0]) & (gw <= hi_t[0]) & np.isfinite(rw)
        k = int(sel.sum())
        nvals[i] = k
        if k > 0:
            out[i] = np.median(rw[sel])
    return out, nvals


def random_uncertainty_pas20(
    df: DataFrame, key_cols: list[str], ts_col: str,
    flux_col: str, gapfilled_col: str,
    ta_col: str, vpd_col: str, swin_col: str,
    vpd_in_kpa: bool = True,
    methods: tuple = (1, 2, 3, 4),
    winsize_days_m1: int = 7, winsize_hours_m1: int = 1,
    winsize_days_m2: int = 14, min_vals_m1: int = 6,
    slab_days: int | None = None,
) -> DataFrame:
    """Hierarchical per-record random uncertainty; appends
    ``{flux}_RANDUNC`` plus ``RANDUNC_N_M{1..4}`` match-count diagnostics
    (NaN where a method did not run for that record)."""
    unc_col = f"{flux_col}_RANDUNC"
    vpd_factor = 10.0 if vpd_in_kpa else 1.0
    work = df.withColumn("_vpd_hpa", F.col(vpd_col) * F.lit(vpd_factor))

    base_cols = [c for c in df.columns]
    out_schema_m1 = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields]
        + [f"{unc_col} double", "RANDUNC_N_M1 double"]
    )

    def m1(pdf: pd.DataFrame) -> pd.DataFrame:
        ts_ns = pdf[ts_col].to_numpy(dtype="datetime64[ns]").astype(np.int64)
        unc, nv = _m1_kernel(
            ts_ns,
            pdf[flux_col].to_numpy(float),
            pdf[ta_col].to_numpy(float),
            pdf["_vpd_hpa"].to_numpy(float),
            pdf[swin_col].to_numpy(float),
            winsize_days_m1, winsize_hours_m1, min_vals_m1,
        )
        out = pdf[base_cols + ["_halo"]].copy()
        out[unc_col] = unc
        out["RANDUNC_N_M1"] = nv
        return out

    slab = (slab_days or 3 * winsize_days_m1) * 86400
    halo1 = winsize_days_m1 * 86400 + 60
    if 1 in methods:
        out = apply_with_halo(work, key_cols, ts_col, m1, out_schema_m1,
                              slab_seconds=slab, halo_seconds=halo1)
    else:
        # skipping the costliest stage must actually skip it (docstring
        # contract); later methods then start from an all-null hierarchy
        out = (work.drop("_vpd_hpa")
               .withColumn(unc_col, F.lit(None).cast("double"))
               .withColumn("RANDUNC_N_M1", F.lit(None).cast("double")))

    if 2 in methods:
        schema_m2 = out_schema_m1 + ", RANDUNC_N_M2 double"

        def m2(pdf: pd.DataFrame) -> pd.DataFrame:
            ts_ns = pdf[ts_col].to_numpy(dtype="datetime64[ns]").astype(np.int64)
            unc, nv = _m2_kernel(
                ts_ns, pdf[gapfilled_col].to_numpy(float),
                pdf[unc_col].to_numpy(float), winsize_days_m2,
            )
            res = pdf[base_cols + ["_halo", "RANDUNC_N_M1"]].copy()
            res[unc_col] = unc
            res["RANDUNC_N_M2"] = nv
            return res

        slab2 = max(slab, 3 * winsize_days_m2 * 86400)
        out = apply_with_halo(out, key_cols, ts_col, m2, schema_m2,
                              slab_seconds=slab2,
                              halo_seconds=winsize_days_m2 * 86400 + 60)

    if 3 in methods:
        # whole-record flux-band median for leftovers: broadcast the (small)
        # todo set against the (gf, unc) projection, one groupBy median.
        # On sparse/gappy records the methods-1/2-unserved set can be a large
        # fraction of the data, so guard the broadcast with a count and fall
        # back to a plain shuffle band join when it is big (the band predicate
        # and aggregation are identical either way).
        gf, unc = F.col(gapfilled_col), F.col(unc_col)
        tol = F.greatest(F.abs(gf) * FLUX_SIM_FRAC, F.lit(FLUX_SIM_FLOOR))
        todo = out.filter(unc.isNull() & gf.isNotNull()).select(
            *key_cols,
            F.col(ts_col).alias("_m3_ts"),
            (gf - tol).alias("_m3_lo"), (gf + tol).alias("_m3_hi"),
        )
        n_todo = todo.limit(M3_BROADCAST_ROW_CAP + 1).count()
        todo_side = (F.broadcast(todo) if n_todo <= M3_BROADCAST_ROW_CAP
                     else todo)
        pool = out.filter(unc.isNotNull()).select(
            *key_cols, gf.alias("_m3_gf"), unc.alias("_m3_unc"))
        med = (
            pool.join(todo_side, on=key_cols)
            .filter(F.col("_m3_gf").between(F.col("_m3_lo"), F.col("_m3_hi")))
            .groupBy(*key_cols, "_m3_ts")
            .agg(F.percentile("_m3_unc", F.lit(0.5)).alias("_m3_med"),
                 F.count(F.lit(1)).cast("double").alias("RANDUNC_N_M3"))
            .withColumnRenamed("_m3_ts", ts_col)
        )
        out = out.join(F.broadcast(med), on=[*key_cols, ts_col], how="left")
        out = out.withColumn(unc_col, F.coalesce(unc, F.col("_m3_med"))).drop("_m3_med")
    if 4 in methods:
        # 10 flux-rank neighbours (5 before, self slot, 4 after) — per-key
        # windowed median over the flux sort; serves only final leftovers
        w = Window.partitionBy(*key_cols).orderBy(
            F.asc_nulls_last(gapfilled_col), ts_col).rowsBetween(-5, 4)
        unc = F.col(unc_col)
        m4 = F.percentile(unc, F.lit(0.5)).over(w)
        n4 = F.count(unc).over(w).cast("double")
        out = (
            out.withColumn("_m4", m4).withColumn("_n4", n4)
            .withColumn("RANDUNC_N_M4",
                        F.when(unc.isNull(), F.col("_n4")).cast("double"))
            .withColumn(unc_col, F.coalesce(unc, F.col("_m4")))
            .drop("_m4", "_n4")
        )
    return out.drop("_vpd_hpa") if "_vpd_hpa" in out.columns else out


def joint_uncertainty_pas20(
    df: DataFrame, randunc_col: str,
    scenario_lower_col: str, scenario_upper_col: str,
    divisor: float = JOINT_DIVISOR_1SIGMA,
    out_col: str | None = None,
) -> DataFrame:
    """ONEFlux ``compute_join``: JOINTUNC = sqrt(RANDUNC² + ((upper-lower)
    / divisor)²) — NULL where any input is missing (null propagates).
    Divisor 2.0 for the 16/84 NEE scenarios, 1.349 for the 25/75 LE/H IQR."""
    if out_col is None:
        out_col = (randunc_col[:-len("_RANDUNC")] + "_JOINTUNC"
                   if randunc_col.endswith("_RANDUNC")
                   else f"{randunc_col}_JOINTUNC")
    r = F.col(randunc_col)
    scen = (F.col(scenario_upper_col) - F.col(scenario_lower_col)) / F.lit(divisor)
    return (
        df.withColumn(f"{out_col}_SCENARIO", scen)
        .withColumn(out_col, F.sqrt(r * r + scen * scen))
    )


def cumulative_uncertainty(
    df: DataFrame, key_cols: list[str], ts_col: str,
    flux_col: str, randunc_col: str,
    scenario_lower_col: str | None = None,
    scenario_upper_col: str | None = None,
    divisor: float = JOINT_DIVISOR_1SIGMA,
) -> DataFrame:
    """Cumulative flux with propagated uncertainty bounds (uncertainty.py
    ``_calc_cumulative``): FLUX_CUM (skipna running sum), UNC_CUMULATIVE,
    FLUX+UNC / FLUX-UNC. The random term accumulates in quadrature, counted
    only where the flux contributes; with scenario columns the fully
    correlated scenario term (running spread of the cumulative scenario
    sums) is combined in quadrature."""
    w = (Window.partitionBy(*key_cols).orderBy(ts_col)
         .rowsBetween(Window.unboundedPreceding, 0))
    flux, r = F.col(flux_col), F.col(randunc_col)
    out = df.withColumn("FLUX_CUM", F.sum(flux).over(w))
    var = F.when(flux.isNotNull(), r * r)
    cum_rand = F.sqrt(F.sum(var).over(w))
    if scenario_lower_col is not None and scenario_upper_col is not None:
        cum_scen = (
            (F.sum(scenario_upper_col).over(w) - F.sum(scenario_lower_col).over(w))
            / F.lit(divisor)
        )
        out = (out.withColumn("UNC_RANDOM_CUMULATIVE", cum_rand)
               .withColumn("UNC_SCENARIO_CUMULATIVE", cum_scen)
               .withColumn("UNC_CUMULATIVE",
                           F.sqrt(cum_rand * cum_rand + cum_scen * cum_scen)))
    else:
        out = out.withColumn("UNC_CUMULATIVE", cum_rand)
    return (out.withColumn("FLUX+UNC", F.col("FLUX_CUM") + F.col("UNC_CUMULATIVE"))
            .withColumn("FLUX-UNC", F.col("FLUX_CUM") - F.col("UNC_CUMULATIVE")))
