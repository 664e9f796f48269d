"""Timestamp-shift (clock-error) detection via radiation phase analysis.

Reference: /root/reference/diive/preprocessing/qaqc/detect_timestamp_shifts.py
(``DetectTimestampShifts``). Measured shortwave radiation is compared
against theoretical potential radiation; a systematic offset between the
two diel patterns exposes a datalogger clock error, a wrong UTC offset, or
an un-flagged DST transition. Three methods, structure mirrored:

- :func:`fft_phase_shift` (detect_timestamp_shifts.py:114-186): per day,
  project measured and potential radiation onto the k=1 Fourier basis (one
  cycle per day) and convert the phase-angle difference to minutes
  (Δt = Δφ/2π · 1440). Short daytime gaps are linearly interpolated
  (pandas ``limit`` semantics) and remaining gaps zero-filled; days below
  ``min_clearness`` (measured/potential daily sum) or with <90 % of the
  expected records report NULL. Engine shape: the Fourier projection is a
  plain groupBy aggregation — Σ y·cos θ and Σ y·sin θ with
  θ = −2πn/N over the day's row positions — so the whole method is
  JVM-side expressions: one shuffle on (key, date), no Python.
- :func:`noon_shift` (detect_timestamp_shifts.py:288-314): per clear day,
  the difference between the times of the measured and potential daily
  maxima (first occurrence, matching pandas ``idxmax``). One groupBy with
  ``max(struct(value, −t))`` argmax aggregates — also pure JVM.
- :func:`crosscorr_shift` (detect_timestamp_shifts.py:188-286): per day,
  upsample to 1-min resolution (PCHIP for potential — the sun moves
  smoothly; linear for measured — clouds make sharp edges), restrict to
  daytime (potential > 10 W m-2), and search the ±``max_shift_min`` lag
  maximising the Pearson correlation. Per-(key, day) Arrow kernel: each
  group is ≤1440 upsampled points × ≤2·max_shift lags — bounded work,
  embarrassingly parallel across days/keys. The PCHIP derivatives follow
  Fritsch & Carlson exactly as scipy's ``PchipInterpolator`` implements
  them (weighted harmonic mean, one-sided three-point edges) — scipy is
  not a dependency.

Positive ``shift_minutes`` = the measured peak is EARLIER than the
potential peak, in all three methods (the reference's sign convention).

When ``pot_col`` is absent, potential radiation is computed from
lat/lon/utc_offset with ``functions.solar.potential_radiation``
(``method='stull'`` — the reference class calls the plain ``potrad``).

At 100 TB: every method is one shuffle on (key, date); day groups are
bounded (≤ 2880 rows at 30 s sampling), so no skew and no large state.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StructField, StructType


def _with_pot(df, ts_col, pot_col, lat, lon, utc_offset):
    if pot_col in df.columns:
        return df, pot_col
    if lat is None or lon is None:
        raise ValueError("lat and lon are required when pot_col is not in df")
    from diive_spark.functions.solar import potential_radiation

    df = df.withColumn(
        "_pot", potential_radiation(F.col(ts_col), lat, lon, utc_offset,
                                    method="stull"))
    return df, "_pot"


def _interp_in_day(value, part_cols, order_col, limit):
    """Pandas ``interpolate(method='linear', limit=n)`` within a partition:
    interior null runs use the run's true anchors but only the first
    ``limit`` positions fill; trailing nulls forward-fill the last value
    (within ``limit``); leading nulls stay null."""
    full = (Window.partitionBy(*part_cols).orderBy(order_col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    ahead = (Window.partitionBy(*part_cols).orderBy(order_col)
             .rowsBetween(Window.currentRow, Window.unboundedFollowing))
    pos = F.row_number().over(Window.partitionBy(*part_cols).orderBy(order_col))
    pos_if_val = F.when(value.isNotNull(), pos)
    prev_v = F.last(value, ignorenulls=True).over(full)
    prev_p = F.last(pos_if_val, ignorenulls=True).over(full)
    next_v = F.first(value, ignorenulls=True).over(ahead)
    next_p = F.first(pos_if_val, ignorenulls=True).over(ahead)
    k = pos - prev_p
    interp = prev_v + (next_v - prev_v) * k / (next_p - prev_p)
    fill = F.when(next_v.isNotNull(), interp).otherwise(prev_v)
    return F.when(value.isNotNull(), value).when(
        prev_v.isNotNull() & (k <= limit), fill)


def fft_phase_shift(
    df: DataFrame, key_cols: list[str], ts_col: str, meas_col: str,
    pot_col: str = "POTRAD", lat: float | None = None,
    lon: float | None = None, utc_offset: int = 1,
    min_clearness: float = 0.6, dt_min: float | None = None,
    interp_limit: int = 4,
) -> DataFrame:
    """Daily time shift from the k=1 Fourier phase difference.

    Returns (key..., date, shift_minutes, amplitude_meas); shift NULL and
    amplitude 0 for incomplete or cloudy days (the reference's NaN rows).
    ``dt_min`` = sampling interval in minutes; inferred per key from the
    median timestamp difference when None (the reference's fallback)."""
    df, pot_col = _with_pot(df, ts_col, pot_col, lat, lon, utc_offset)
    work = df.select(
        *key_cols, F.col(ts_col).alias("_ts"),
        F.col(meas_col).cast("double").alias("_meas"),
        F.col(pot_col).cast("double").alias("_pot"),
    ).withColumn("_date", F.to_date("_ts"))

    if dt_min is None:
        kw = Window.partitionBy(*key_cols).orderBy("_ts")
        diffs = work.withColumn(
            "_dt", F.col("_ts").cast("double")
            - F.lag(F.col("_ts").cast("double")).over(kw))
        freq = diffs.groupBy(*key_cols).agg(
            (F.percentile("_dt", F.lit(0.5)) / 60.0).alias("_dt_min"))
        work = work.join(F.broadcast(freq), key_cols)
    else:
        work = work.withColumn("_dt_min", F.lit(float(dt_min)))

    day = [*key_cols, "_date"]
    filled = work.withColumn(
        "_y", F.coalesce(_interp_in_day(F.col("_meas"), day, "_ts",
                                        interp_limit), F.lit(0.0))
    ).withColumn("_yp", F.coalesce(F.col("_pot"), F.lit(0.0)))
    n = F.row_number().over(Window.partitionBy(*day).orderBy("_ts")) - 1
    filled = filled.withColumn("_n", n.cast("double"))

    day_n = F.count(F.lit(1)).over(Window.partitionBy(*day)).cast("double")
    theta = F.lit(-2.0 * math.pi) * F.col("_n") / day_n
    filled = filled.withColumn("_cos", F.cos(theta)) \
                   .withColumn("_sin", F.sin(theta))
    agg = filled.groupBy(*day).agg(
        F.count(F.lit(1)).cast("double").alias("_cnt"),
        F.first("_dt_min").alias("_dt_min"),
        F.sum(F.col("_y") * F.col("_cos")).alias("_mre"),
        F.sum(F.col("_y") * F.col("_sin")).alias("_mim"),
        F.sum(F.col("_yp") * F.col("_cos")).alias("_pre"),
        F.sum(F.col("_yp") * F.col("_sin")).alias("_pim"),
        F.sum("_y").alias("_msum"), F.sum("_yp").alias("_psum"),
    )
    points_per_day = F.floor(F.lit(1440.0) / F.col("_dt_min"))
    complete = F.col("_cnt") >= 0.9 * points_per_day
    clear = (F.col("_psum") > 0) & (F.col("_msum") / F.col("_psum")
                                    >= min_clearness)
    dphi = F.atan2("_mim", "_mre") - F.atan2("_pim", "_pre")
    two_pi = 2.0 * math.pi
    # wrap to [-pi, pi]: ((d + pi) mod 2pi + 2pi) mod 2pi - pi (sign-safe)
    wrapped = (F.lit(math.pi) + dphi) % two_pi
    wrapped = ((wrapped + two_pi) % two_pi) - math.pi
    shift = wrapped / two_pi * 1440.0
    amp = F.sqrt(F.col("_mre") ** 2 + F.col("_mim") ** 2)
    ok = complete & clear
    return agg.select(
        *key_cols, F.col("_date").alias("date"),
        F.when(ok, shift).alias("shift_minutes"),
        F.when(ok, amp).otherwise(F.lit(0.0)).alias("amplitude_meas"),
    )


def noon_shift(
    df: DataFrame, key_cols: list[str], ts_col: str, meas_col: str,
    pot_col: str = "POTRAD", lat: float | None = None,
    lon: float | None = None, utc_offset: int = 1,
    clearness_threshold: float = 0.7,
) -> DataFrame:
    """Daily peak-time difference (potential − measured, minutes), clear
    days only. ``max(struct(value, −t))`` picks the FIRST occurrence of
    the maximum, matching pandas ``idxmax``."""
    df, pot_col = _with_pot(df, ts_col, pot_col, lat, lon, utc_offset)
    work = df.select(
        *key_cols, F.col(ts_col).alias("_ts"),
        F.col(meas_col).cast("double").alias("_meas"),
        F.col(pot_col).cast("double").alias("_pot"),
    ).withColumn("_date", F.to_date("_ts")) \
     .withColumn("_negts", -F.col("_ts").cast("double"))

    def argmax_ts(vcol):
        return -F.max(F.when(F.col(vcol).isNotNull(),
                             F.struct(F.col(vcol), F.col("_negts"))))["_negts"]

    agg = work.groupBy(*key_cols, "_date").agg(
        F.sum("_meas").alias("_msum"), F.sum("_pot").alias("_psum"),
        argmax_ts("_meas").alias("_t_meas"),
        argmax_ts("_pot").alias("_t_pot"),
    )
    return agg.filter(F.col("_msum") / F.col("_psum") > clearness_threshold) \
        .select(
            *key_cols, F.col("_date").alias("date"),
            ((F.col("_t_pot") - F.col("_t_meas")) / 60.0)
            .alias("shift_minutes"))


def _pchip_derivatives(x, y):
    """Fritsch–Carlson monotone-cubic derivatives, exactly as scipy's
    ``PchipInterpolator._find_derivatives`` (weighted harmonic mean of
    slopes; one-sided three-point edge formula with the sign/3x clamps)."""
    h = np.diff(x)
    m = np.diff(y) / h
    n = len(x)
    d = np.zeros(n)
    if n == 2:
        d[:] = m[0]
        return d
    sm = np.sign(m)
    cond = (sm[1:] != sm[:-1]) | (m[1:] == 0) | (m[:-1] == 0)
    w1 = 2 * h[1:] + h[:-1]
    w2 = h[1:] + 2 * h[:-1]
    with np.errstate(divide="ignore", invalid="ignore", over="ignore"):
        whmean = (w1 / m[:-1] + w2 / m[1:]) / (w1 + w2)
        d[1:-1] = np.where(cond, 0.0, 1.0 / whmean)

    def edge(h0, h1, m0, m1):
        de = ((2 * h0 + h1) * m0 - h0 * m1) / (h0 + h1)
        if np.sign(de) != np.sign(m0):
            return 0.0
        if (np.sign(m0) != np.sign(m1)) and (abs(de) > 3 * abs(m0)):
            return 3 * m0
        return de

    d[0] = edge(h[0], h[1], m[0], m[1])
    d[-1] = edge(h[-1], h[-2], m[-1], m[-2])
    return d


def pchip_interpolate(x, y, xq):
    """Evaluate the PCHIP cubic Hermite through (x, y) at xq (numpy-only
    scipy ``pchip_interpolate`` equivalent, extrapolating the end cubics)."""
    x = np.asarray(x, float)
    y = np.asarray(y, float)
    xq = np.asarray(xq, float)
    if len(x) == 1:
        return np.full_like(xq, y[0])
    d = _pchip_derivatives(x, y)
    i = np.clip(np.searchsorted(x, xq, side="right") - 1, 0, len(x) - 2)
    h = x[i + 1] - x[i]
    t = (xq - x[i]) / h
    h00 = (1 + 2 * t) * (1 - t) ** 2
    h10 = t * (1 - t) ** 2
    h01 = t * t * (3 - 2 * t)
    h11 = t * t * (t - 1)
    return (h00 * y[i] + h10 * h * d[i] + h01 * y[i + 1] + h11 * h * d[i + 1])


def crosscorr_day_kernel(ts_sec, meas, pot, max_shift_min=120,
                         upsample_sec=60, min_clearness=0.5):
    """One day's cross-correlation lag search (pure numpy; the reference's
    crosscorr body, detect_timestamp_shifts.py:215-283). Returns
    (shift_minutes, max_corr), (nan, nan) for cloudy/dark days, or None
    when the day produces NO output row (the reference's bare
    ``continue``: <5 positive potential records or empty daytime)."""
    pot_sum = float(np.nansum(pot))
    meas_sum = float(np.nansum(meas))
    if pot_sum < 100:
        return (np.nan, np.nan)
    if meas_sum / pot_sum < min_clearness:
        return (np.nan, np.nan)
    if int((pot > 0).sum()) < 5:
        return None
    # 1-min grid from the first to the last record of the day
    grid = np.arange(ts_sec[0], ts_sec[-1] + 1, upsample_sec, dtype=np.float64)
    # potential: PCHIP through the valid records (sun moves smoothly)
    pv = np.isfinite(pot)
    pot_hr = (pchip_interpolate(ts_sec[pv], pot[pv], grid)
              if pv.sum() >= 2 else np.zeros_like(grid))
    pot_hr = np.nan_to_num(pot_hr)
    # measured: linear (clouds make sharp edges; cubics ring)
    mv = np.isfinite(meas)
    meas_hr = (np.interp(grid, ts_sec[mv], meas[mv])
               if mv.sum() >= 1 else np.zeros_like(grid))
    sun_up = pot_hr > 10
    if not sun_up.any():
        return None
    p = pot_hr[sun_up]
    mres = meas_hr[sun_up]
    p = p - p.mean()
    mres = mres - mres.mean()
    corr = np.correlate(p, mres, mode="full")
    # lag indices step by one grid cell = upsample_sec seconds; express in
    # minutes so max_shift_min and the returned shift stay in minute units
    # for any upsample_sec (reference hardcodes 60 s, we generalize).
    lags_min = np.arange(-(len(mres) - 1), len(p)) * (upsample_sec / 60.0)
    mask = (lags_min >= -max_shift_min) & (lags_min <= max_shift_min)
    lw, cw = lags_min[mask], corr[mask]
    if len(cw) == 0:
        return (np.nan, np.nan)
    bi = int(np.argmax(cw))
    denom = float(np.std(p) * np.std(mres) * len(p))
    return (float(lw[bi]), float(cw[bi] / denom) if denom > 0 else 0.0)


def crosscorr_shift(
    df: DataFrame, key_cols: list[str], ts_col: str, meas_col: str,
    pot_col: str = "POTRAD", lat: float | None = None,
    lon: float | None = None, utc_offset: int = 1,
    max_shift_min: int = 120, min_clearness: float = 0.5,
) -> DataFrame:
    """1-minute-precision daily shift via upsampled cross-correlation.
    Per-(key, day) Arrow kernel over :func:`crosscorr_day_kernel`."""
    import pandas as pd

    df, pot_col = _with_pot(df, ts_col, pot_col, lat, lon, utc_offset)
    work = df.select(
        *key_cols, F.col(ts_col).alias("_ts"),
        F.col(meas_col).cast("double").alias("_meas"),
        F.col(pot_col).cast("double").alias("_pot"),
    ).withColumn("_date", F.to_date("_ts"))
    key_fields = [f for f in work.schema.fields
                  if f.name in (*key_cols, "_date")]
    schema = StructType(key_fields + [
        StructField("shift_minutes", DoubleType()),
        StructField("max_corr", DoubleType()),
    ])

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_ts")
        ts_sec = (pdf["_ts"].to_numpy(dtype="datetime64[ns]")
                  .astype(np.int64) / 1e9)
        res = crosscorr_day_kernel(
            ts_sec, pdf["_meas"].to_numpy(float), pdf["_pot"].to_numpy(float),
            max_shift_min=max_shift_min, min_clearness=min_clearness)
        head = pdf.iloc[:1][[f.name for f in key_fields]]
        if res is None:
            out = head.iloc[0:0].copy()
            out["shift_minutes"] = np.array([], dtype=float)
            out["max_corr"] = np.array([], dtype=float)
            return out
        out = head.copy()
        out["shift_minutes"], out["max_corr"] = res
        return out

    out = work.groupBy(*key_cols, "_date").applyInPandas(
        lambda _, pdf: kernel(pdf), schema=schema)
    return out.withColumnRenamed("_date", "date")
