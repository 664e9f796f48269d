"""True MDS (marginal-distribution-sampling) gap-fill — ONEFlux cascade.

The reference's flagship model-free gap-filler
(/root/reference/diive/gapfilling/mds.py:83 `_MdsGapFillingBase`, delegating
to the shared cascade /root/reference/diive/gapfilling/similarity.py:150
`mds_gapfill_cascade`): each missing flux value is replaced by the average
measured flux under meteorologically similar conditions (SWIN, TA, VPD within
tolerances), searched over six expanding-window passes; first success wins.
This engine reimplements those semantics Spark-first — nothing is copied;
reference file:line cites are for semantic parity only.

Pass cascade (ONEFlux ``gf_mds`` stage order, similarity.py:309-336):

  1. all drivers (SWIN+TA+VPD), windows 14 & 28 days   (method 1)
  2. SWIN only, 14 days                                 (method 2)
  3. diurnal +/- 1 h, windows 1, 3, 5 days              (method 3)
  4. all drivers, windows 42..154 days                  (method 1)
  5. SWIN only, windows 28..154 days                    (method 2)
  6. diurnal +/- 1 h, windows 7..427 days               (method 3)

Tolerances (ONEFlux ``GF_DRIVER_*``, similarity.py:26-30): TA ±2.5 °C,
VPD ±5 hPa, SWIN ± the *target's own* SWIN clamped into [20, 50] W m⁻².
A fill is accepted when ≥ ``min_samples`` similar measured values exist
(ONEFlux gap-filling uses 2; the uncertainty variant uses 10). The window
around a gap is ``time_window × nperday − 1`` record *positions* centred on
it, clipped at the series edges (clipping duplicates edge records — kept,
it is part of the reference semantics). Quality collapse (1/2/3) and the
granular ``method*1000 + window`` flag follow similarity.py:117-146.

Spark execution model: one ``applyInPandas`` kernel per key — windows are
record-position ranges over a single key's regular grid, and the marginal-gap
rule needs the key's global first/last valid record, so the series is the
natural unit. At 100 TB the parallelism is ACROSS keys (millions of sources /
sites); a single key's series (a site-decade at 30 min ≈ 350 k records, a
source-year of 1-minute windows ≈ 526 k) is bounded driver data for one
executor task. The cascade's largest window (427 d) makes slab+halo
unattractive (halo ≈ whole series); per-key grouping is the honest plan.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ONEFlux meteorological-similarity tolerances (reference similarity.py:26-30,
# mirroring oneflux_steps/common/common.h GF_DRIVER_*).
SWIN_TOL_MIN = 20.0   # W m-2
SWIN_TOL_MAX = 50.0   # W m-2
TA_TOL = 2.5          # deg C
VPD_TOL = 5.0         # hPa
HR_TOL = 1.1          # hours (±1 h time-of-day, strict <)

BASE_WINDOW_DAYS = 14   # cascade expands in multiples of this (_TW_ORIG)

METHOD_ALL = 1    # SWIN + TA + VPD similar
METHOD_SWIN = 2   # SWIN only
METHOD_MDC = 3    # mean diurnal cycle (same time-of-day ± 1 h)

#: records/day the marginal-gap rule reckons with (ONEFlux hardcodes 48
#: regardless of the actual resolution, similarity.py:221)
_MARGINAL_NPERDAY = 48


def pass_configs(max_passes: int | None = None) -> list[tuple[int, int, float]]:
    """The cascade's (pass_no, method, time_window_days) sequence, in
    first-success-wins priority order. ``max_passes`` truncates (used by
    bounded gate fixtures so a DuckDB oracle can enumerate the same list)."""
    cfg: list[tuple[int, int, float]] = []
    for it in range(2):                                  # loop 1
        cfg.append((METHOD_ALL, (it + 1) * BASE_WINDOW_DAYS))
    cfg.append((METHOD_SWIN, BASE_WINDOW_DAYS))          # loop 2
    for it in range(3):                                  # loop 3
        cfg.append((METHOD_MDC, 2 * it + 1))
    for it in range(2, 11):                              # loop 4
        cfg.append((METHOD_ALL, (it + 1) * BASE_WINDOW_DAYS))
    for it in range(1, 11):                              # loop 5
        cfg.append((METHOD_SWIN, (it + 1) * BASE_WINDOW_DAYS))
    for it in range(61):                                 # loop 6
        cfg.append((METHOD_MDC, (it + 1) * (BASE_WINDOW_DAYS * 0.5)))
    out = [(i + 1, m, float(tw)) for i, (m, tw) in enumerate(cfg)]
    return out[:max_passes] if max_passes is not None else out


def quality_from(method, time_window):
    """Collapse (method, window) to the ONEFlux 1/2/3 quality (vectorized;
    reference similarity.py:117 ``mds_quality_from``, byte-identical rule)."""
    m = np.asarray(method)
    tw = np.asarray(time_window)
    q = (m > 0).astype(np.int64)
    q += (((m == METHOD_ALL) & (tw > 14)) | ((m == METHOD_SWIN) & (tw > 14))
          | ((m == METHOD_MDC) & (tw > 1))).astype(np.int64)
    q += (((m == METHOD_ALL) & (tw > 56)) | ((m == METHOD_SWIN) & (tw > 28))
          | ((m == METHOD_MDC) & (tw > 5))).astype(np.int64)
    return q if q.ndim else int(q)


def granular_flag(method, time_window):
    """``method*1000 + round(window)``; 0 = measured (similarity.py:134)."""
    m = np.asarray(method)
    tw = np.asarray(time_window)
    flag = np.where(m > 0, m * 1000 + np.rint(tw).astype(np.int64), 0)
    return flag if flag.ndim else int(flag)


def _window_positions(index: int, tw_days: float, nperday: int, n: int):
    """Clipped record positions of the ``tw_days``-wide window centred on
    ``index``: offsets −⌈half⌉ .. +half−1 with half = tw/2·nperday, clipped
    into [0, n−1] (duplicates at the edges kept — reference
    similarity.py:240-247 ``window_idx``)."""
    half = tw_days / 2.0 * nperday
    off = np.concatenate([-np.arange(half), np.arange(half - 1) + 1])
    return np.clip(index + off, 0, n - 1).astype(np.int64)


def mds_cascade_arrays(
    flux, swin, ta, vpd, hr, nperday: int, *,
    min_samples: int = 2,
    swin_tol: tuple[float, float] = (SWIN_TOL_MIN, SWIN_TOL_MAX),
    ta_tol: float = TA_TOL,
    vpd_tol: float = VPD_TOL,
    ddof: int = 1,
    sym_mean: bool = False,
    fill_all: bool = False,
    longest_marginal_gap: int = 60,
    max_passes: int | None = None,
) -> dict:
    """Run the full cascade over one key's regular series (numpy arrays,
    np.nan = missing). Returns per-record arrays: filled / sd / count /
    method / time_window / quality / flag. This is the per-key kernel behind
    :func:`mds_fill`; it is also directly unit-testable.

    Candidates are always the ORIGINAL measured values — a filled record
    never becomes a candidate for later gaps (reference semantics: the
    cascade reduces over ``tofill``, which keeps its NaNs)."""
    flux = np.asarray(flux, dtype=np.float64)
    swin = np.asarray(swin, dtype=np.float64)
    ta = np.asarray(ta, dtype=np.float64)
    vpd = np.asarray(vpd, dtype=np.float64)
    hr = np.asarray(hr, dtype=np.float64)
    n = flux.size

    filled = np.full(n, np.nan)
    sd = np.full(n, np.nan)
    count = np.zeros(n, dtype=np.int64)
    method = np.zeros(n, dtype=np.int64)
    time_window = np.zeros(n, dtype=np.float64)

    measured = np.isfinite(flux)
    ok = np.flatnonzero(measured)
    if ok.size == 0:
        z = np.zeros(n, dtype=np.int64)
        return dict(filled=filled, sd=sd, count=count, method=method,
                    time_window=time_window, quality=z, flag=z.copy())

    # Marginal-gap exclusion: leading/trailing all-missing stretches longer
    # than longest_marginal_gap days (at the HARDCODED 48 rec/day, reference
    # similarity.py:219-227) are never filled.
    margin = _MARGINAL_NPERDAY * longest_marginal_gap
    large = np.zeros(n, dtype=bool)
    first_ok, last_ok = int(ok[0]), int(ok[-1])
    if first_ok > margin:
        large[: first_ok + 1 - margin] = True
    if last_ok < n - margin:
        large[last_ok + margin:] = True

    eligible = ~large if fill_all else (~large & ~measured)

    def pending():
        return np.flatnonzero(eligible & ~np.isfinite(filled))

    ta_fin = np.isfinite(ta)
    swin_fin = np.isfinite(swin)
    vpd_fin = np.isfinite(vpd)

    def settle(index, cand, m, tw):
        vals = flux[cand]
        if sym_mean and m in (METHOD_ALL, METHOD_SWIN):
            # Vekuri (2023) symmetric mean: average the above-/below-target
            # SWIN sub-means (candidates equal to the target count in both).
            cs = swin[cand]
            hi = vals[cs >= swin[index]]
            lo = vals[cs <= swin[index]]
            halves = [h.mean() for h in (hi, lo) if h.size]
            filled[index] = float(np.mean(halves)) if halves else np.nan
        else:
            filled[index] = float(vals.mean())
        sd[index] = float(vals.std(ddof=ddof)) if vals.size > ddof else np.nan
        count[index] = vals.size
        method[index] = m
        time_window[index] = tw

    for _pass_no, m, tw in pass_configs(max_passes):
        todo = pending()
        if todo.size == 0:
            break
        for index in todo:
            w = _window_positions(index, tw, nperday, n)
            cand = w[measured[w]]
            if m == METHOD_MDC:
                sel = cand[np.abs(hr[cand] - hr[index]) < HR_TOL]
            else:
                if cand.size < min_samples:
                    continue
                tol = min(max(swin[index], swin_tol[0]), swin_tol[1])
                keep = (np.abs(swin[cand] - swin[index]) < tol) & swin_fin[cand]
                if m == METHOD_ALL:
                    keep &= (np.abs(ta[cand] - ta[index]) < ta_tol) & ta_fin[cand]
                    keep &= (np.abs(vpd[cand] - vpd[index]) < vpd_tol) & vpd_fin[cand]
                sel = cand[keep]
            if sel.size >= min_samples:
                settle(index, sel, m, tw)

    return dict(filled=filled, sd=sd, count=count, method=method,
                time_window=time_window,
                quality=np.asarray(quality_from(method, time_window)),
                flag=np.asarray(granular_flag(method, time_window)))


def mds_fill(
    df: DataFrame, key_cols: list[str], ts_col: str,
    flux_col: str, swin_col: str, ta_col: str, vpd_col: str,
    nperday: int, *,
    min_samples: int = 2,
    swin_tol: tuple[float, float] = (SWIN_TOL_MIN, SWIN_TOL_MAX),
    ta_tol: float = TA_TOL,
    vpd_tol: float = VPD_TOL,
    ddof: int = 1,
    sym_mean: bool = False,
    fill_all: bool = False,
    longest_marginal_gap: int = 60,
    max_passes: int | None = None,
    max_records_per_key: int = 2_000_000,
) -> DataFrame:
    """Gap-fill ``flux_col`` by marginal distribution sampling per key.

    Appends (``g = flux_col + '_gfMDS'``): ``g`` (measured where available,
    else the MDS fill), ``g_SD`` / ``g_N`` (pool sample-SD and size),
    ``g_METHOD`` (0/1/2/3), ``g_TW`` (window days), ``g_QUALITY`` (ONEFlux
    collapsed 0-3) and ``FLAG_{g}_ISFILLED`` (granular method*1000+window,
    0 = measured). The input must be a regular per-key grid (run
    ``grid.gridded`` first); ``nperday`` is records per day (48 half-hourly).

    One shuffle (groupBy key) + one Arrow-batched kernel; no driver data.

    100 TB posture: the cascade's pass-6 ±420-day window makes slab+halo
    degenerate, so each KEY is one task (parallelism is across keys —
    sites/sources). That concentrates a very long single key in one
    executor; ``max_records_per_key`` (default 2M records ≈ 114 years of
    half-hourly data ≈ a few hundred MB of kernel arrays) turns the silent
    executor-OOM failure mode into a loud per-key error naming the limit
    and this knob. Raise it deliberately if the executors have the memory.
    """
    import pandas as pd
    from pyspark.sql.types import (DoubleType, LongType, StructField,
                                   StructType)

    work = df.select(
        *key_cols,
        F.col(ts_col).alias("_ts"),
        F.col(flux_col).cast("double").alias("_flux"),
        F.col(swin_col).cast("double").alias("_swin"),
        F.col(ta_col).cast("double").alias("_ta"),
        F.col(vpd_col).cast("double").alias("_vpd"),
        (F.hour(ts_col) + F.minute(ts_col) / 60.0
         + F.second(ts_col) / 3600.0).alias("_hr"),
    )
    g = f"{flux_col}_gfMDS"
    key_fields = [f for f in work.schema.fields if f.name in key_cols]
    schema = StructType(key_fields + [
        StructField("_ts", work.schema["_ts"].dataType),
        StructField(g, DoubleType()),
        StructField(f"{g}_SD", DoubleType()),
        StructField(f"{g}_N", LongType()),
        StructField(f"{g}_METHOD", LongType()),
        StructField(f"{g}_TW", DoubleType()),
        StructField(f"{g}_QUALITY", LongType()),
        StructField(f"FLAG_{g}_ISFILLED", LongType()),
    ])

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) > max_records_per_key:
            key_desc = {f.name: pdf[f.name].iloc[0] for f in key_fields}
            raise ValueError(
                f"mds_fill key {key_desc} has {len(pdf)} records, over the "
                f"max_records_per_key={max_records_per_key} single-task "
                "bound (the pass-6 ±420-day window pins each key to one "
                "task); split the key or raise max_records_per_key")
        pdf = pdf.sort_values("_ts").reset_index(drop=True)
        res = mds_cascade_arrays(
            pdf["_flux"].to_numpy(), pdf["_swin"].to_numpy(),
            pdf["_ta"].to_numpy(), pdf["_vpd"].to_numpy(),
            pdf["_hr"].to_numpy(), nperday,
            min_samples=min_samples, swin_tol=swin_tol, ta_tol=ta_tol,
            vpd_tol=vpd_tol, ddof=ddof, sym_mean=sym_mean, fill_all=fill_all,
            longest_marginal_gap=longest_marginal_gap, max_passes=max_passes)
        out = pdf[[f.name for f in key_fields] + ["_ts"]].copy()
        flux = pdf["_flux"].to_numpy()
        out[g] = np.where(np.isfinite(flux), flux, res["filled"])
        out[f"{g}_SD"] = res["sd"]
        out[f"{g}_N"] = res["count"]
        out[f"{g}_METHOD"] = res["method"]
        out[f"{g}_TW"] = res["time_window"]
        out[f"{g}_QUALITY"] = res["quality"]
        out[f"FLAG_{g}_ISFILLED"] = res["flag"]
        return out

    parts = work.groupBy(*key_cols).applyInPandas(
        lambda _, pdf: kernel(pdf), schema=schema)
    parts = parts.withColumnRenamed("_ts", ts_col) \
                 .dropDuplicates([*key_cols, ts_col])
    return df.join(parts, on=[*key_cols, ts_col], how="left")
