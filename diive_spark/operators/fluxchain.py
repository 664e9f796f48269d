"""Flux processing chain L2 -> L4.2 — the level-function orchestrator.

Reference: ``run_chain`` (/root/reference/diive/flux/fluxprocessingchain/
run_chain.py:51) over the per-level functions (levels/level2.py:85,
level31.py:52, level32.py:88, level33.py:43, level41.py:125, level42.py:177).
The engine mirrors the chain's STRUCTURAL contracts (SURVEY.md §2.11):

- each level is a pure DataFrame -> DataFrame function;
- scenario/level columns are APPENDED, never replaced (``NEE`` ->
  ``NEE_L31`` -> ``NEE_L31_L33_CUT_50`` -> ``..._L41``; the reference's
  dotted level names ('NEE_L3.1') become underscore names — a dot is
  struct-access syntax in Spark column references);
- quality accumulates as FLAG_*_TEST columns re-aggregated into a QCF per
  level (outliers.flag_qcf);
- observed values are never overwritten by fills.

Domain simplifications (documented, not hidden): L2 runs the always-on
missing test plus caller-supplied flag columns (EddyPro's SSITC etc. arrive
as data columns) and optional absolute limits; L3.2 uses the engine's Hampel
with the chain's Papale-2006 defaults; L3.3 takes constant USTAR thresholds
OR detects them per key (Papale-2006 MP detection incl. seeded bootstrap
CUT_16/50/84 scenarios, operators/ustar.py — the reference chain's default);
L4.1 fills with the engine's cascade + closed-form model fill in place of
RF/XGBoost (same fill pipeline shape, see gapfill.linear_model_fill).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from diive_spark.operators import features, gapfill, outliers


def run_level2(
    df: DataFrame, key_cols: list[str], ts_col: str, flux_col: str,
    flag_cols: list[str] | None = None,
    abs_limits: tuple[float, float] | None = None,
    qcf_col: str = "FLAG_L2_QCF",
) -> DataFrame:
    """Level-2 quality flags: always-on missing-values test + caller flag
    columns (values 0/1/2, e.g. EddyPro SSITC_TEST) + optional absolute
    limits, re-aggregated into a QCF (level2.py:85)."""
    out = df.withColumn(
        f"FLAG_L2_MISSING_{flux_col}_TEST",
        F.when(F.col(flux_col).isNull(), F.lit(2)).otherwise(F.lit(0)).cast("int"),
    )
    tests = [f"FLAG_L2_MISSING_{flux_col}_TEST"]
    for c in flag_cols or []:
        name = f"FLAG_L2_{c}_TEST"
        out = out.withColumn(name, F.col(c).cast("int"))
        tests.append(name)
    if abs_limits is not None:
        name = f"FLAG_L2_ABSLIM_{flux_col}_TEST"
        out = outliers.flag_absolute_limits(out, flux_col, *abs_limits, flag_col=name)
        tests.append(name)
    return outliers.flag_qcf(out, tests, qcf_col=qcf_col)


def run_level31(
    df: DataFrame, key_cols: list[str], ts_col: str, flux_col: str,
    strg_col: str | None = None,
    set_storage_to_zero: bool = False,
    gapfill_storage_term: bool = True,
    tier_seconds: int = 1800,
    src_col: str | None = None,
) -> DataFrame:
    """Level-3.1 single-point storage correction (level31.py:52, and the
    standalone class flux/lowres/storage_correction.py:21 it wraps):
    ``{flux}_L31 = flux + storage``; a gappy storage term is filled first
    with the reference's EXPANDING rolling median (window 3, 5, 7, ...,
    min 3 valid values per window, 0.0 fallback so every flux record
    carries a storage term — storage_correction.py:229, replayed exactly
    by gapfill.storage_gapfill_expanding and REFERENCE-EXECUTED-tested in
    tests/test_reference_parity.py). The ISFILLED flag is informational,
    deliberately NOT a _TEST column — provenance, not quality.

    ``src_col`` lets the chain feed a quality-FILTERED series (e.g. the
    appended ``{flux}_L2_QCF``) while keeping the reference-style output
    name ``{flux}_L31`` — the input columns are never overwritten."""
    src = src_col or flux_col
    out_col = f"{flux_col}_L31"
    if strg_col is None or set_storage_to_zero:
        return df.withColumn(out_col, F.col(src)).withColumn(
            f"FLAG_{strg_col or 'STRG'}_ISFILLED", F.lit(0)
        )
    work = df
    strg_use = strg_col
    if gapfill_storage_term:
        work = gapfill.storage_gapfill_expanding(
            work, key_cols, ts_col, strg_col, gate_col=src,
            filled_col="_strg_filled",
            flag_col=f"FLAG_{strg_col}_ISFILLED",
        )
        strg_use = "_strg_filled"
    out = work.withColumn(out_col, F.col(src) + F.col(strg_use))
    return out.drop("_strg_filled") if "_strg_filled" in out.columns else out


def run_level32(
    df: DataFrame, key_cols: list[str], ts_col: str, flux_col: str,
    tier_seconds: int = 1800,
    window_length: int = 48 * 13, n_sigma: float = 5.5,
    daytime_col: str | None = None,
    qcf_col: str = "FLAG_L32_QCF",
) -> DataFrame:
    """Level-3.2 outlier detection — unconditional in the chain
    (run_chain.py docstring): Hampel with the Papale-2006 defaults
    (window 48*13 records, double-differencing, sigma 5.5, day/night when a
    daytime flag is available)."""
    name = f"FLAG_L32_HAMPEL_{flux_col}_TEST"
    kwargs = dict(flag_col=name, use_differencing=True)
    if daytime_col is not None:
        kwargs.update(daytime_col=daytime_col, n_sigma_daytime=n_sigma,
                      n_sigma_nighttime=n_sigma)
    else:
        kwargs.update(n_sigma=n_sigma)
    out = outliers.flag_hampel(
        df, key_cols, ts_col, flux_col, tier_seconds, window_length, **kwargs
    )
    return outliers.flag_qcf(out, [name], qcf_col=qcf_col)


def run_level33_constant_ustar(
    df: DataFrame, flux_col: str, ustar_col: str,
    thresholds: dict[str, float],
    nighttime_col: str | None = None,
    src_col: str | None = None,
) -> DataFrame:
    """Level-3.3 USTAR filtering with pre-computed constant thresholds
    (level33.py:43): one SCENARIO per threshold (CUT_16/CUT_50/CUT_84
    convention) — each appends a flag column and a filtered series column
    ``{flux}_L33_{scenario}``; low-turbulence rejection applies at night
    when a nighttime flag is given (USTAR filtering is a nighttime
    phenomenon), everywhere otherwise.

    ``src_col`` feeds a quality-filtered series (e.g. ``{flux}_QCF``) while
    keeping the ``{flux}_L33_{scenario}`` naming; inputs are never
    overwritten. A constant threshold is the special case of a constant
    per-record threshold column — this delegates to
    run_level33_variable_ustar so the two L3.3 paths can never diverge."""
    out = df
    thr_cols = {}
    for scenario, thr in thresholds.items():
        c = f"_thr_const_{scenario}"
        out = out.withColumn(c, F.lit(float(thr)))
        thr_cols[scenario] = c
    out = run_level33_variable_ustar(out, flux_col, ustar_col, thr_cols,
                                     nighttime_col=nighttime_col,
                                     src_col=src_col)
    return out.drop(*thr_cols.values())


def run_level33_variable_ustar(
    df: DataFrame, flux_col: str, ustar_col: str,
    threshold_cols: dict[str, str],
    nighttime_col: str | None = None,
    src_col: str | None = None,
) -> DataFrame:
    """Level-3.3 with PER-RECORD (variable) thresholds
    (ustarthreshold.py:156 FlagMultipleVariableUstarThresholds): each
    scenario's threshold is a COLUMN (e.g. seasonal detected thresholds
    mapped onto records via ustar.seasonal_thresholds_to_records), so the
    rejection rule can vary through time. A constant threshold is just a
    constant column, making this a strict generalization of
    run_level33_constant_ustar. NULL thresholds reject nothing (flag 0)."""
    src = src_col or flux_col
    out = df
    for scenario, thr_col in threshold_cols.items():
        low = F.col(ustar_col) < F.col(thr_col)
        if nighttime_col is not None:
            low = low & (F.col(nighttime_col) == 1)
        flag = f"FLAG_L33_USTAR_{scenario}_TEST"
        out = out.withColumn(
            flag,
            F.when(F.col(src).isNull(), F.lit(None))
            .when(low, F.lit(2)).otherwise(F.lit(0)).cast("int"),
        ).withColumn(
            f"{flux_col}_L33_{scenario}",
            F.when(F.col(flag) < 2, F.col(src)),
        )
    return out


def run_level33_detected(
    df: DataFrame, key_cols: list[str], ts_col: str, flux_col: str,
    ustar_col: str, ta_col: str, swin_col: str,
    nighttime_col: str | None = None,
    src_col: str | None = None,
    n_boot: int | None = None,
    seed: int = 42,
    percentiles: tuple = (16, 50, 84),
    **detect_kwargs,
) -> DataFrame:
    """Level-3.3 with DETECTED thresholds — the reference chain's default
    (run_chain.py: level33 runs ustarthreshold.py detection, not constants).

    Per key, the Papale-2006 moving-point detector (ustar.py) finds the
    annual threshold; with ``n_boot`` the seeded bootstrap emits the
    CUT_16/50/84 percentile scenarios instead (ONEFlux CUT convention).
    Thresholds are broadcast-joined back (tiny: one row per key) and applied
    exactly like the constant path. A key with NO detected threshold gets
    flag 0 everywhere (no rejection — documented, mirrors ONEFlux's
    threshold-not-found marker).

    Returns (df_with_scenarios, scenario_names)."""
    from diive_spark.operators import ustar as ustar_ops

    nee_src = src_col or flux_col
    if n_boot:
        scen = ustar_ops.ustar_mp_bootstrap(
            df, key_cols, ts_col, nee_src, ta_col, ustar_col, swin_col,
            n_boot=n_boot, seed=seed, percentiles=percentiles, **detect_kwargs)
        names = [f"CUT_{int(p)}" for p in percentiles]
        wide = scen.groupBy(*key_cols).pivot("scenario", names).agg(
            F.first("threshold"))
    else:
        thr = ustar_ops.ustar_mp_thresholds(
            df, key_cols, ts_col, nee_src, ta_col, ustar_col, swin_col,
            **detect_kwargs)
        names = ["MP"]
        wide = ustar_ops.ustar_mp_annual(thr, key_cols).withColumnRenamed(
            "ustar_threshold", "MP")
    wide = wide.select(*key_cols, *[F.col(n).alias(f"_thr_{n}") for n in names])
    out = df.join(F.broadcast(wide), on=key_cols, how="left")
    for scenario in names:
        low = F.col(ustar_col) < F.col(f"_thr_{scenario}")
        if nighttime_col is not None:
            low = low & (F.col(nighttime_col) == 1)
        flag = f"FLAG_L33_USTAR_{scenario}_TEST"
        out = out.withColumn(
            flag,
            F.when(F.col(nee_src).isNull(), F.lit(None))
            .when(low, F.lit(2)).otherwise(F.lit(0)).cast("int"),
        ).withColumn(
            f"{flux_col}_L33_{scenario}",
            F.when(F.col(flag) < 2, F.col(nee_src)),
        )
    return out.drop(*[f"_thr_{n}" for n in names]), names


def run_level41(
    df: DataFrame, key_cols: list[str], ts_col: str,
    scenario_cols: list[str],
    tier_seconds: int = 1800,
    interp_limit: int = 3,
    window_tiers: list[int] = (5, 13, 49),
    model_features: list[str] | None = None,
    model: str = "linear",
) -> DataFrame:
    """Level-4.1 gap-filling per scenario (level41.py:125): cascade
    (interp + rolling-median tiers) then a model fill for what remains
    (same flag model, observed never overwritten). ``model`` picks the
    leftover-filler: ``'linear'`` (closed-form, default),
    ``'random_forest'`` / ``'gbt'`` (Spark MLlib tree ensembles,
    operators/mlfill.py — the reference chain's RandomForestTS class of
    fill). Appends ``{scenario}_L41`` plus per-scenario flag columns."""
    out = df
    for sc in scenario_cols:
        filled = gapfill.gapfill_cascade(
            out, key_cols, ts_col, sc, tier_seconds=tier_seconds,
            interp_limit=interp_limit, window_tiers=list(window_tiers),
        )
        if model == "linear":
            filled = gapfill.linear_model_fill(
                filled, key_cols, ts_col, sc, feature_cols=model_features,
            )
        else:
            from diive_spark.operators.mlfill import tree_model_fill
            filled = tree_model_fill(
                filled, key_cols, ts_col, sc, feature_cols=model_features,
                model=model,
            )
        out = (
            filled.withColumnRenamed("filled", f"{sc}_L41")
            .withColumnRenamed("fill_flag", f"FLAG_L41_{sc}_FILL")
            .withColumnRenamed("fill_granular", f"FLAG_L41_{sc}_FILL_GRANULAR")
        )
    return out


def run_level42(
    df: DataFrame, key_cols: list[str], ts_col: str, filled_cols: list[str],
) -> DataFrame:
    """Level-4.2 cumulatives + uncertainty (level42.py:177 shape): per-year
    running sum (doy cumulative, times.py:1948 semantics, keeping every
    chain column) and quadrature cumulative per filled scenario."""
    from pyspark.sql import Window

    out = df
    for c in filled_cols:
        w = (
            Window.partitionBy(*key_cols, F.year(ts_col))
            .orderBy(F.dayofyear(ts_col), ts_col)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        out = out.withColumn(f"{c}_CUMSUM_YEAR", F.sum(c).over(w))
        out = features.quadrature_cumulative(
            out, key_cols, ts_col, c, out_col=f"{c}_CUMQUAD"
        )
    return out


def run_chain(
    df: DataFrame, key_cols: list[str], ts_col: str, flux_col: str,
    strg_col: str | None = None,
    ustar_col: str | None = None,
    ustar_thresholds: dict[str, float] | None = None,
    flag_cols: list[str] | None = None,
    abs_limits: tuple[float, float] | None = None,
    nighttime_col: str | None = None,
    daytime_col: str | None = None,
    tier_seconds: int = 1800,
    model_features: list[str] | None = None,
    ta_col: str | None = None,
    swin_col: str | None = None,
    ustar_n_boot: int | None = None,
    ustar_detect_kwargs: dict | None = None,
) -> DataFrame:
    """L2 -> L3.1 -> L3.2 -> L3.3 -> L4.1 -> L4.2 convenience driver
    (run_chain.py:51 contract: fixed sensible defaults; use the per-level
    functions for full control). Lazily composes ONE Spark plan (detection,
    when enabled, adds one bounded per-key grouped-map stage).

    L3.3 threshold source, mirroring the reference chain's precedence:
    explicit ``ustar_thresholds`` constants win; otherwise, when
    ``ustar_col`` plus ``ta_col``/``swin_col`` are given, thresholds are
    DETECTED per key (Papale-2006 MP; with ``ustar_n_boot`` the bootstrap
    CUT_16/50/84 scenarios — the chain's default in the reference)."""
    out = run_level2(df, key_cols, ts_col, flux_col, flag_cols, abs_limits)
    # qcf.py filtered-series step: the L2-filtered series is APPENDED as
    # {flux}_L2_QCF — raw observed values stay in {flux} (the reference chain
    # keeps raw and filtered series as separate columns)
    l2_qcf = f"{flux_col}_L2_QCF"
    out = out.withColumn(
        l2_qcf, F.when(F.col("FLAG_L2_QCF") < 2, F.col(flux_col))
    )
    out = run_level31(out, key_cols, ts_col, flux_col, strg_col,
                      tier_seconds=tier_seconds, src_col=l2_qcf)
    corrected = f"{flux_col}_L31"
    out = run_level32(out, key_cols, ts_col, corrected,
                      tier_seconds=tier_seconds, daytime_col=daytime_col)
    # append the outlier-filtered series; {flux}_L31 keeps its pre-L3.2 values
    l32_qcf = f"{corrected}_QCF"
    out = out.withColumn(
        l32_qcf, F.when(F.col("FLAG_L32_QCF") < 2, F.col(corrected))
    )
    scenarios = []
    if ustar_col is not None and ustar_thresholds:
        out = run_level33_constant_ustar(out, corrected, ustar_col,
                                         ustar_thresholds, nighttime_col,
                                         src_col=l32_qcf)
        scenarios = [f"{corrected}_L33_{s}" for s in ustar_thresholds]
    elif ustar_col is not None and ta_col is not None and swin_col is not None:
        out, names = run_level33_detected(
            out, key_cols, ts_col, corrected, ustar_col, ta_col, swin_col,
            nighttime_col=nighttime_col, src_col=l32_qcf,
            n_boot=ustar_n_boot, **(ustar_detect_kwargs or {}))
        scenarios = [f"{corrected}_L33_{s}" for s in names]
    else:
        scenarios = [l32_qcf]
    out = run_level41(out, key_cols, ts_col, scenarios,
                      tier_seconds=tier_seconds, model_features=model_features)
    return run_level42(out, key_cols, ts_col, [f"{s}_L41" for s in scenarios])
