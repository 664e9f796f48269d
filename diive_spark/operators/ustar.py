"""USTAR moving-point threshold detection (Papale et al. 2006 / ONEFlux).

Reference: ``UstarMovingPointDetection``
(/root/reference/diive/flux/lowres/ustar_mp_detection.py:22-530, itself a
port of ONEFlux ``ustar_mp/src/ustar.c``) and the bootstrap wrapper
(ustar_bootstrap.py). Semantics re-expressed from scratch for Spark:

- nighttime records (SW_IN < 10 W/m2, all of NEE/TA/USTAR/SW_IN finite) are
  stratified season -> temperature classes -> USTAR classes;
- per USTAR class, mean NEE; the threshold is the first class whose NEE
  holds the forward-mode plateau condition (Fw2 by default: the class and
  its successor both >= the mean of the following 10 classes);
- median across valid temperature classes -> season threshold; max across
  seasons -> annual threshold (conservative, Papale 2006).

Class binning uses the VALUE-INTERVAL formulation: with boundary values
b_c = sorted_vals[n_per*(c+1)-1], class(v) = #{c : b_c < v}. This is exactly
equivalent to ONEFlux's positional binning with the tie-extension loop
(equal values are never split across classes: all rows equal to a boundary
value fall in that boundary's class, and a boundary swallowed by a tie run
yields an empty class) — the equivalence is cross-checked in
tests/test_ustar.py against an independent positional+extension oracle.
It is also what makes the detection ORACLE-ABLE: the same boundary values
and CASE bucketing are reproducible in SQL via row_number().

Distribution stance: detection is embarrassingly parallel across keys
(site/tower) — one ``applyInPandas`` group per key, a vectorized numpy
kernel inside (class means via bincount, a 20-iteration plateau scan).
A key's full record (years of 30-min data, ~17k rows/yr) is far below
executor memory; the night subset is smaller still. The bootstrap runs all
resamples inside the same kernel from pre-extracted arrays (no per-iteration
DataFrame), seeded per key -> deterministic.

Divergence from the reference (documented): the reference RAISES when a
record has < 3000 valid rows; a per-key raise would fail the whole job at
scale, so this implementation emits NULL thresholds for such keys instead
(``n_night`` stays populated for diagnosis).
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType, IntegerType, LongType, StringType, StructField, StructType,
)

THRESHOLD_NOT_FOUND = 10.0  # ONEFlux marker; surfaced as NULL
DEFAULT_SEASONS = ((1, 2, 3), (4, 5, 6), (7, 8, 9), (10, 11, 12))


def _season_month(ts: pd.Series) -> np.ndarray:
    """Month used for season grouping, with the ONEFlux end-of-period shift:
    a record stamped day-1 00:0x (hour 0, minute 0) belongs to the previous
    month; January wraps to December."""
    month = ts.dt.month.to_numpy().astype(np.int64).copy()
    shift = (
        (ts.dt.day.to_numpy() == 1)
        & (ts.dt.hour.to_numpy() == 0)
        & (ts.dt.minute.to_numpy() == 0)
    )
    month[shift] -= 1
    month[month == 0] = 12
    return month


def _interval_classes(vals: np.ndarray, n_classes: int):
    """Tie-aware equal-count class id per value (see module docstring).

    Returns (class_ids, boundary_values) or (None, None) when there are
    fewer rows than classes."""
    N = len(vals)
    n_per = N // n_classes
    if n_per < 1:
        return None, None
    svals = np.sort(vals)
    bounds = svals[[min(n_per * (c + 1) - 1, N - 1) for c in range(n_classes - 1)]]
    # class(v) = number of boundary values strictly below v
    return np.searchsorted(bounds, vals, side="left"), bounds


def _class_means(cls: np.ndarray, vals: np.ndarray, n_classes: int) -> np.ndarray:
    """Per-class mean; EMPTY classes are 0.0 (the ONEFlux reset value —
    they still participate in the forward-window means)."""
    cnt = np.bincount(cls, minlength=n_classes).astype(np.float64)
    tot = np.bincount(cls, weights=vals, minlength=n_classes)
    return np.divide(tot, cnt, out=np.zeros(n_classes), where=cnt > 0)


def _plateau_threshold(
    u_mean: np.ndarray, f_mean: np.ndarray, n: int,
    window: int = 10, threshold_check: float = 1.0,
) -> float:
    """Forward-mode threshold: first class i where, for each y in 0..n-1,
    f_mean[i+y] >= threshold_check * mean(f_mean[i+1+y : i+1+y+window]);
    an empty forward window invalidates that i (ONEFlux forward_mode with
    the percentile check disabled)."""
    C = len(u_mean)
    if n < 1 or C - n <= 0:
        return THRESHOLD_NOT_FOUND
    for i in range(C - n + 1):
        ok = True
        for y in range(n):
            seg = f_mean[i + 1 + y: i + 1 + y + window]
            if seg.size == 0 or f_mean[i + y] < threshold_check * seg.mean():
                ok = False
                break
        if ok:
            return float(u_mean[i])
    return THRESHOLD_NOT_FOUND


def _pearson(x: np.ndarray, y: np.ndarray) -> float:
    dx, dy = x - x.mean(), y - y.mean()
    denom = np.sqrt((dx * dx).sum()) * np.sqrt((dy * dy).sum())
    return float((dx * dy).sum() / denom) if denom > 0.0 else np.nan


def _detect_ustar_class(
    nee: np.ndarray, ustar: np.ndarray, cfg: dict,
) -> float:
    cls, _ = _interval_classes(ustar, cfg["ustar_classes"])
    if cls is None:
        return THRESHOLD_NOT_FOUND
    u_mean = _class_means(cls, ustar, cfg["ustar_classes"])
    f_mean = _class_means(cls, nee, cfg["ustar_classes"])
    if u_mean[0] > cfg["first_ustar_mean_check"]:
        return THRESHOLD_NOT_FOUND  # lowest class not in low-turbulence regime
    return _plateau_threshold(u_mean, f_mean, cfg["forward_mode_n"])


def _detect_season(
    nee: np.ndarray, ta: np.ndarray, ustar: np.ndarray, cfg: dict,
) -> float:
    N = len(nee)
    if N // cfg["ta_classes"] < cfg["min_samples_ta_class"]:
        return THRESHOLD_NOT_FOUND
    tcls, _ = _interval_classes(ta, cfg["ta_classes"])
    found = []
    for c in range(cfg["ta_classes"]):
        m = tcls == c
        if m.sum() < cfg["min_samples_ta_class"]:
            continue
        corr = _pearson(ta[m], ustar[m])
        if not np.isfinite(corr) or abs(corr) > cfg["corr_check"]:
            continue  # temperature and turbulence confounded in this class
        th = _detect_ustar_class(nee[m], ustar[m], cfg)
        if th != THRESHOLD_NOT_FOUND:
            found.append(th)
    return float(np.median(found)) if found else THRESHOLD_NOT_FOUND


def _seasonal_thresholds(
    nee: np.ndarray, ta: np.ndarray, ustar: np.ndarray, month: np.ndarray,
    cfg: dict,
) -> list[float]:
    """Per-season thresholds (NaN where not detectable), incl. the ONEFlux
    one-big-season fallback when EVERY season is under the per-season
    minimum."""
    min_season = cfg["min_samples_ta_class"] * cfg["ta_classes"]
    masks = [np.isin(month, g) for g in cfg["season_groups"]]
    counts = [int(m.sum()) for m in masks]
    if all(c < min_season for c in counts):
        if len(nee) < cfg["min_samples_season"]:
            return [np.nan] * len(masks)
        th = _detect_season(nee, ta, ustar, cfg)
        th = th if th != THRESHOLD_NOT_FOUND else np.nan
        return [th] * len(masks)
    out = []
    for m, c in zip(masks, counts):
        if c < min_season:
            out.append(np.nan)
            continue
        th = _detect_season(nee[m], ta[m], ustar[m], cfg)
        out.append(th if th != THRESHOLD_NOT_FOUND else np.nan)
    return out


def _night_arrays(pdf: pd.DataFrame, cfg: dict):
    nee = pdf["_nee"].to_numpy(dtype=np.float64)
    ta = pdf["_ta"].to_numpy(dtype=np.float64)
    ustar = pdf["_ustar"].to_numpy(dtype=np.float64)
    swin = pdf["_swin"].to_numpy(dtype=np.float64)
    valid = (np.isfinite(nee) & np.isfinite(ta)
             & np.isfinite(ustar) & np.isfinite(swin))
    night = valid & (swin < cfg["night_threshold"])
    month = _season_month(pdf["_ts"])
    return nee, ta, ustar, month, valid, night


def _cfg(
    ta_classes, ustar_classes, forward_mode_n, season_groups, night_threshold,
    min_samples_period, min_samples_season, min_samples_ta_class,
    corr_check, first_ustar_mean_check,
) -> dict:
    return dict(
        ta_classes=ta_classes, ustar_classes=ustar_classes,
        forward_mode_n=forward_mode_n,
        season_groups=[list(g) for g in (season_groups or DEFAULT_SEASONS)],
        night_threshold=night_threshold,
        min_samples_period=min_samples_period,
        min_samples_season=min_samples_season,
        min_samples_ta_class=min_samples_ta_class,
        corr_check=corr_check,
        first_ustar_mean_check=first_ustar_mean_check,
    )


def ustar_mp_thresholds(
    df: DataFrame, key_cols: list[str], ts_col: str,
    nee_col: str, ta_col: str, ustar_col: str, swin_col: str,
    ta_classes: int = 7, ustar_classes: int = 20, forward_mode_n: int = 2,
    season_groups: list[list[int]] | None = None,
    night_threshold: float = 10.0,
    min_samples_period: int = 3000, min_samples_season: int = 160,
    min_samples_ta_class: int = 100,
    corr_check: float = 0.5, first_ustar_mean_check: float = 0.2,
) -> DataFrame:
    """Seasonal USTAR thresholds per key: one row per (key..., season) with
    ``n_night`` (night+valid record count after the end-of-period month
    shift) and ``threshold`` (m/s, NULL where detection failed or the key
    has under ``min_samples_period`` valid records)."""
    cfg = _cfg(ta_classes, ustar_classes, forward_mode_n, season_groups,
               night_threshold, min_samples_period, min_samples_season,
               min_samples_ta_class, corr_check, first_ustar_mean_check)
    work = df.select(
        *key_cols,
        F.col(ts_col).alias("_ts"),
        F.col(nee_col).cast("double").alias("_nee"),
        F.col(ta_col).cast("double").alias("_ta"),
        F.col(ustar_col).cast("double").alias("_ustar"),
        F.col(swin_col).cast("double").alias("_swin"),
    )
    key_fields = [f for f in work.schema.fields if f.name in key_cols]
    schema = StructType(key_fields + [
        StructField("season", IntegerType()),
        StructField("n_night", LongType()),
        StructField("threshold", DoubleType()),
    ])
    n_seasons = len(cfg["season_groups"])

    def detect(pdf: pd.DataFrame) -> pd.DataFrame:
        nee, ta, ustar, month, valid, night = _night_arrays(pdf, cfg)
        counts = [int((np.isin(month[night], g)).sum())
                  for g in cfg["season_groups"]]
        if len(pdf) < cfg["min_samples_period"] or int(valid.sum()) < cfg["min_samples_period"]:
            ths = [np.nan] * n_seasons
        else:
            ths = _seasonal_thresholds(
                nee[night], ta[night], ustar[night], month[night], cfg)
        out = pd.DataFrame({
            "season": np.arange(1, n_seasons + 1, dtype=np.int32),
            "n_night": np.asarray(counts, dtype=np.int64),
            "threshold": np.asarray(ths, dtype=np.float64),
        })
        for f in key_fields:
            out[f.name] = pdf[f.name].iloc[0]
        return out[[f.name for f in key_fields] + ["season", "n_night", "threshold"]]

    return work.groupBy(*key_cols).applyInPandas(
        lambda _, pdf: detect(pdf), schema=schema
    )


def seasonal_thresholds_to_records(
    df: DataFrame, key_cols: list[str], ts_col: str,
    thr_df: DataFrame,
    season_groups: list[list[int]] | None = None,
    out_col: str = "ustar_threshold_seasonal",
) -> DataFrame:
    """Map per-(key, season) thresholds (ustar_mp_thresholds output) onto
    every record as a PER-RECORD threshold column — the variable-threshold
    form consumed by fluxchain.run_level33_variable_ustar
    (ustarthreshold.py FlagMultipleVariableUstarThresholds semantics).
    Records use the season their (month-shifted) timestamp falls in; NULL
    where that season's detection failed. Broadcast join: thr_df is one row
    per (key, season)."""
    groups = [list(g) for g in (season_groups or DEFAULT_SEASONS)]
    month = F.month(ts_col)
    shift = ((F.dayofmonth(ts_col) == 1) & (F.hour(ts_col) == 0)
             & (F.minute(ts_col) == 0))
    m = F.when(shift, F.when(month == 1, 12).otherwise(month - 1)).otherwise(month)
    season = None
    for i, g in enumerate(groups, start=1):
        cond = m.isin(g)
        season = F.when(cond, i) if season is None else season.when(cond, i)
    out = df.withColumn("_season", season.cast("int"))
    thr = thr_df.select(*key_cols, F.col("season").alias("_season"),
                        F.col("threshold").alias(out_col))
    return out.join(F.broadcast(thr), on=[*key_cols, "_season"],
                    how="left").drop("_season")


def ustar_mp_annual(thr_df: DataFrame, key_cols: list[str]) -> DataFrame:
    """Annual threshold per key = max across valid seasonal thresholds
    (Papale 2006: filter the whole record by the highest threshold found).
    NULL when no season detected."""
    return thr_df.groupBy(*key_cols).agg(
        F.max("threshold").alias("ustar_threshold")
    )


def ustar_mp_bootstrap(
    df: DataFrame, key_cols: list[str], ts_col: str,
    nee_col: str, ta_col: str, ustar_col: str, swin_col: str,
    n_boot: int = 32, seed: int = 42,
    percentiles: tuple = (16, 50, 84),
    resample: str = "rng",
    **detect_kwargs,
) -> DataFrame:
    """Bootstrap CUT scenarios (ustar_bootstrap.py / ONEFlux): resample the
    full record with replacement ``n_boot`` times (keeping night+valid rows
    of each resample), recompute the annual threshold per resample, and emit
    the requested percentiles of the resulting distribution as scenarios
    ``CUT_16`` / ``CUT_50`` / ``CUT_84``.

    Deterministic: the generator is seeded per key from (seed, key string),
    so re-runs and stage retries produce identical scenarios. All resamples
    run inside one grouped-map kernel from pre-extracted arrays.

    ``resample='hash'`` draws index j of resample b as
    ``md5_h32(f"{b}:{j}") % N`` over the key's rows in (ustar, nee) order —
    statistically i.i.d.-uniform like the rng draw but REPLAYABLE in plain
    SQL (DuckDB md5), which is how the driver gate certifies the whole
    bootstrap pipeline end-to-end."""
    cfg = _cfg(
        detect_kwargs.pop("ta_classes", 7),
        detect_kwargs.pop("ustar_classes", 20),
        detect_kwargs.pop("forward_mode_n", 2),
        detect_kwargs.pop("season_groups", None),
        detect_kwargs.pop("night_threshold", 10.0),
        detect_kwargs.pop("min_samples_period", 3000),
        detect_kwargs.pop("min_samples_season", 160),
        detect_kwargs.pop("min_samples_ta_class", 100),
        detect_kwargs.pop("corr_check", 0.5),
        detect_kwargs.pop("first_ustar_mean_check", 0.2),
    )
    if detect_kwargs:
        raise TypeError(f"unknown kwargs: {sorted(detect_kwargs)}")
    work = df.select(
        *key_cols,
        F.col(ts_col).alias("_ts"),
        F.col(nee_col).cast("double").alias("_nee"),
        F.col(ta_col).cast("double").alias("_ta"),
        F.col(ustar_col).cast("double").alias("_ustar"),
        F.col(swin_col).cast("double").alias("_swin"),
    )
    key_fields = [f for f in work.schema.fields if f.name in key_cols]
    schema = StructType(key_fields + [
        StructField("scenario", StringType()),
        StructField("threshold", DoubleType()),
        StructField("n_samples", IntegerType()),
    ])

    def boot(pdf: pd.DataFrame) -> pd.DataFrame:
        if resample == "hash":
            # SQL-replayable draw order: (ustar, nee) is a.s. a total order
            pdf = pdf.sort_values(["_ustar", "_nee"]).reset_index(drop=True)
        nee, ta, ustar, month, valid, night = _night_arrays(pdf, cfg)
        key_str = "|".join(str(pdf[f.name].iloc[0]) for f in key_fields)
        rng = np.random.default_rng((seed, zlib.crc32(key_str.encode())))
        samples = []
        N = len(pdf)
        enough = N >= cfg["min_samples_period"] and int(valid.sum()) >= cfg["min_samples_period"]
        if enough:
            import hashlib
            for b in range(n_boot):
                if resample == "hash":
                    idx = np.array([
                        int(hashlib.md5(f"{b}:{j}".encode())
                            .hexdigest()[:8], 16) % N
                        for j in range(N)], dtype=np.int64)
                else:
                    idx = rng.integers(0, N, N)
                sel = idx[night[idx]]
                if sel.size == 0:
                    continue
                ths = _seasonal_thresholds(
                    nee[sel], ta[sel], ustar[sel], month[sel], cfg)
                finite = [t for t in ths if np.isfinite(t)]
                if finite:
                    samples.append(max(finite))
        rows = []
        for p in percentiles:
            thr = float(np.percentile(samples, p)) if samples else np.nan
            rows.append((f"CUT_{int(p)}", thr, len(samples)))
        out = pd.DataFrame(rows, columns=["scenario", "threshold", "n_samples"])
        out["n_samples"] = out["n_samples"].astype(np.int32)
        for f in key_fields:
            out[f.name] = pdf[f.name].iloc[0]
        return out[[f.name for f in key_fields] + ["scenario", "threshold", "n_samples"]]

    if resample == "hash":
        # The hash draw is a pure function of (b, j), so the n_boot
        # resamples are independent — run each as its OWN task instead of
        # a sequential loop inside one grouped-map task (r8: the md5 draw
        # is ~1 µs/record of per-row Python; 8 resamples x 1M records ran
        # ~15 s single-task at sf1, ~2-3 s spread). The rng path keeps the
        # in-kernel loop: its generator state is shared across resamples.
        # Values are identical: each task sorts the same full record the
        # same way, computes the same threshold, and np.percentile over
        # the per-resample thresholds is permutation-invariant.
        wb = work.withColumn(
            "_b", F.explode(F.array(*[F.lit(b) for b in range(n_boot)])))
        schema_b = StructType(key_fields + [StructField("_thr", DoubleType())])

        def boot_one(pdf: pd.DataFrame) -> pd.DataFrame:
            import hashlib
            b = int(pdf["_b"].iloc[0])
            pdf = pdf.sort_values(["_ustar", "_nee"]).reset_index(drop=True)
            nee, ta, ustar, month, valid, night = _night_arrays(pdf, cfg)
            N = len(pdf)
            thr = np.nan
            enough = (N >= cfg["min_samples_period"]
                      and int(valid.sum()) >= cfg["min_samples_period"])
            if enough:
                idx = np.array([
                    int(hashlib.md5(f"{b}:{j}".encode()).hexdigest()[:8], 16)
                    % N for j in range(N)], dtype=np.int64)
                sel = idx[night[idx]]
                if sel.size:
                    ths = _seasonal_thresholds(
                        nee[sel], ta[sel], ustar[sel], month[sel], cfg)
                    finite = [t for t in ths if np.isfinite(t)]
                    if finite:
                        thr = max(finite)
            out = pd.DataFrame({"_thr": [thr]})
            for f in key_fields:
                out[f.name] = pdf[f.name].iloc[0]
            return out[[f.name for f in key_fields] + ["_thr"]]

        def finalize(pdf: pd.DataFrame) -> pd.DataFrame:
            samples = [float(t) for t in pdf["_thr"] if np.isfinite(t)]
            rows = []
            for p in percentiles:
                thr = float(np.percentile(samples, p)) if samples else np.nan
                rows.append((f"CUT_{int(p)}", thr, len(samples)))
            out = pd.DataFrame(
                rows, columns=["scenario", "threshold", "n_samples"])
            out["n_samples"] = out["n_samples"].astype(np.int32)
            for f in key_fields:
                out[f.name] = pdf[f.name].iloc[0]
            return out[[f.name for f in key_fields]
                       + ["scenario", "threshold", "n_samples"]]

        # pin the grouped-map width: AQE size-based coalescing would fold
        # the (byte-small, Python-CPU-heavy) resample groups back onto one
        # partition (the halo.apply_with_halo trap)
        sc = df.sparkSession.sparkContext
        wb = wb.repartition(max(sc.defaultParallelism, 1), *key_cols, "_b")
        per_b = wb.groupBy(*key_cols, "_b").applyInPandas(
            lambda _, pdf: boot_one(pdf), schema=schema_b)
        return per_b.groupBy(*key_cols).applyInPandas(
            lambda _, pdf: finalize(pdf), schema=schema)

    return work.groupBy(*key_cols).applyInPandas(
        lambda _, pdf: boot(pdf), schema=schema
    )


# --------------------------------------------------------------------------- #
# Vekuri quantile-based detection (ustar_vekuri_detection.py)
# --------------------------------------------------------------------------- #

VEKURI_CORR_CHECK = 0.4
VEKURI_STABILITY = 0.95
VEKURI_WINDOW = 10
VEKURI_MIN_VALID = 100
VEKURI_MIN_SEASON = 50
# the Vekuri reference defaults to METEOROLOGICAL seasons (DJF/MAM/JJA/SON,
# ustar_vekuri_detection.py:176), unlike the MP detector's calendar quarters
VEKURI_SEASONS = ((12, 1, 2), (3, 4, 5), (6, 7, 8), (9, 10, 11))


def _qcut_classes(vals: np.ndarray, q: int):
    """pd.qcut(duplicates='drop') class ids: interpolated quantile edges,
    right-closed intervals, class(v) = #inner-edges strictly below v."""
    edges = np.unique(np.quantile(vals, np.linspace(0.0, 1.0, q + 1)))
    if edges.size < 2:
        return None
    return np.searchsorted(edges[1:-1], vals, side="left")


def ustar_vekuri_thresholds(
    df: DataFrame, key_cols: list[str], ts_col: str,
    nee_col: str, ta_col: str, ustar_col: str,
    swin_col: str | None = None,
    ta_classes: int = 6, ustar_classes: int = 20,
    season_groups: list[list[int]] | None = None,
    night_threshold: float = 10.0,
) -> DataFrame:
    """Quantile-based USTAR threshold detection (Vekuri variant, reference
    ustar_vekuri_detection.py:18-345): plain-month seasons, pd.qcut
    temperature and USTAR classes (equal data mass regardless of the value
    distribution — cheaper and simpler than ONEFlux's tie-extension bins),
    |corr(TA, USTAR)| < 0.4 independence check, ascending stability search
    (first class whose mean flux >= 0.95 x the mean of the next 10 class
    means), median across TA classes, max across seasons for the annual.

    Same execution shape as the MP detector: one grouped map per key.
    Keys with < 100 valid records emit NULLs (the reference raises).
    Default seasons are METEOROLOGICAL (DJF/MAM/JJA/SON), matching the
    reference — not the MP detector's calendar quarters."""
    groups = [list(g) for g in (season_groups or VEKURI_SEASONS)]
    work = df.select(
        *key_cols,
        F.col(ts_col).alias("_ts"),
        F.col(nee_col).cast("double").alias("_nee"),
        F.col(ta_col).cast("double").alias("_ta"),
        F.col(ustar_col).cast("double").alias("_ustar"),
        (F.col(swin_col).cast("double") if swin_col else F.lit(None).cast("double")).alias("_swin"),
    )
    key_fields = [f for f in work.schema.fields if f.name in key_cols]
    schema = StructType(key_fields + [
        StructField("season", IntegerType()),
        StructField("n_valid", LongType()),
        StructField("threshold", DoubleType()),
    ])

    def detect(pdf: pd.DataFrame) -> pd.DataFrame:
        nee = pdf["_nee"].to_numpy(float)
        ta = pdf["_ta"].to_numpy(float)
        us = pdf["_ustar"].to_numpy(float)
        sw = pdf["_swin"].to_numpy(float)
        month = pdf["_ts"].dt.month.to_numpy()  # plain month (no shift here)
        valid = np.isfinite(nee) & np.isfinite(ta) & np.isfinite(us)
        if np.isfinite(sw).any():
            valid &= sw < night_threshold
        rows = []
        enough = int(valid.sum()) >= VEKURI_MIN_VALID
        for si, g in enumerate(groups, start=1):
            m = valid & np.isin(month, g)
            cnt = int(m.sum())
            thr = np.nan
            if enough and cnt >= VEKURI_MIN_SEASON:
                found = []
                tcls = _qcut_classes(ta[m], ta_classes)
                if tcls is not None:
                    s_nee, s_ta, s_us = nee[m], ta[m], us[m]
                    for c in np.unique(tcls):
                        cm = tcls == c
                        corr = _pearson(s_ta[cm], s_us[cm])
                        if not np.isfinite(corr) or abs(corr) >= VEKURI_CORR_CHECK:
                            continue
                        ucls = _qcut_classes(s_us[cm], ustar_classes)
                        if ucls is None:
                            continue
                        ids = np.unique(ucls)
                        if ids.size < 3:
                            continue
                        um = np.array([s_us[cm][ucls == i].mean() for i in ids])
                        fm = np.array([s_nee[cm][ucls == i].mean() for i in ids])
                        t = _plateau_threshold(um, fm, n=1,
                                               window=VEKURI_WINDOW,
                                               threshold_check=VEKURI_STABILITY)
                        if t != THRESHOLD_NOT_FOUND:
                            found.append(t)
                if found:
                    thr = float(np.median(found))
            rows.append((si, cnt, thr))
        out = pd.DataFrame(rows, columns=["season", "n_valid", "threshold"])
        out["season"] = out["season"].astype(np.int32)
        out["n_valid"] = out["n_valid"].astype(np.int64)
        for f in key_fields:
            out[f.name] = pdf[f.name].iloc[0]
        return out[[f.name for f in key_fields] + ["season", "n_valid", "threshold"]]

    return work.groupBy(*key_cols).applyInPandas(
        lambda _, pdf: detect(pdf), schema=schema)
