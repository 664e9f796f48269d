"""High-resolution wind rotation and covariance lag detection.

References:
- /root/reference/diive/flux/hires/windrotation.py (``WindDoubleRotation``,
  ``reynolds_decomposition``): double rotation (Wilczak et al. 2001) —
  yaw angle θ = atan2(v̄, ū) aligns the mean wind with x, pitch angle
  φ = atan2(w̄1, ū1) zeroes the mean vertical wind; the angles come from
  the segment MEANS and are applied sample-wise to the 20 Hz records.
- /root/reference/diive/flux/hires/lag.py (``MaxCovariance``): per
  segment, the covariance between a reference scalar and a lagged series
  across a window of record shifts; the shift with maximum |cov| is the
  time lag. An auto-peak validation step (scipy ``find_peaks`` semantics:
  prominence/width-height peak score, top-decile threshold) flags
  high-quality peaks.

Engine shapes:
- :func:`double_rotation` is PURE JVM: one groupBy for the segment means
  (θ, φ per key), a broadcast join-back, and per-record trig expressions
  — no Python in the hot path, fully SQL-replayable.
- :func:`reynolds_fluctuations` is a window-mean subtraction.
- :func:`max_covariance` runs one bounded Arrow kernel per segment key:
  a 30-min averaging interval at 20 Hz is 36 000 records × ~2 000 shifts
  of vectorized dot products — small, and embarrassingly parallel across
  segments. ``find_peaks`` is reimplemented in numpy (plateau-midpoint
  local maxima + contour-line prominences, exactly scipy's published
  definitions); the peak score and top-decile filter mirror the
  reference's ``find_auto_peak``.

At 100 TB: segments are the natural partition unit (bounded size, keyed
by (site, interval)); nothing crosses segment boundaries, so the whole
surface is one shuffle.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (BooleanType, DoubleType, LongType,
                               StructField, StructType)


def rotation_angles(df: DataFrame, key_cols: list[str], u_col: str,
                    v_col: str, w_col: str) -> DataFrame:
    """Per-key double-rotation angles from the mean wind
    (windrotation.py:108-143): θ = atan2(v̄, ū); ū1 = ū·cosθ + v̄·sinθ;
    φ = atan2(w̄, ū1). Returns (key..., theta, phi, u_mean, v_mean,
    w_mean)."""
    m = df.groupBy(*key_cols).agg(
        F.avg(u_col).alias("u_mean"), F.avg(v_col).alias("v_mean"),
        F.avg(w_col).alias("w_mean"))
    theta = F.atan2("v_mean", "u_mean")
    m = m.withColumn("theta", theta)
    u1 = F.col("u_mean") * F.cos("theta") + F.col("v_mean") * F.sin("theta")
    return m.withColumn("phi", F.atan2(F.col("w_mean"), u1))


def double_rotation(
    df: DataFrame, key_cols: list[str], u_col: str, v_col: str, w_col: str,
    out_suffix: str = "_rot",
) -> DataFrame:
    """Append double-rotated wind components (windrotation.py:145-173):

        u1 = u·cosθ + v·sinθ;  v1 = −u·sinθ + v·cosθ;  w1 = w
        u2 = u1·cosφ + w1·sinφ;  v2 = v1;  w2 = −u1·sinφ + w1·cosφ

    After rotation mean(v2) ≈ 0 and mean(w2) ≈ 0 per key. Adds
    ``{u,v,w}{out_suffix}`` plus the key's ``theta`` / ``phi``."""
    angles = rotation_angles(df, key_cols, u_col, v_col, w_col) \
        .select(*key_cols, "theta", "phi")
    out = df.join(F.broadcast(angles), key_cols)
    u1 = F.col(u_col) * F.cos("theta") + F.col(v_col) * F.sin("theta")
    v1 = -F.col(u_col) * F.sin("theta") + F.col(v_col) * F.cos("theta")
    w1 = F.col(w_col)
    return (out
            .withColumn(u_col + out_suffix,
                        u1 * F.cos("phi") + w1 * F.sin("phi"))
            .withColumn(v_col + out_suffix, v1)
            .withColumn(w_col + out_suffix,
                        -u1 * F.sin("phi") + w1 * F.cos("phi")))


def reynolds_fluctuations(df: DataFrame, key_cols: list[str],
                          cols: list[str],
                          suffix: str = "_prime") -> DataFrame:
    """x′ = x − mean(x) per key (windrotation.py:22-47
    ``reynolds_decomposition``), as window-mean subtractions."""
    kw = Window.partitionBy(*key_cols)
    for c in cols:
        df = df.withColumn(c + suffix, F.col(c) - F.avg(c).over(kw))
    return df


def find_peaks_numpy(x):
    """Local maxima with scipy ``find_peaks`` semantics (numpy-only):
    plateau midpoints, ``peak_heights``, contour-line ``prominences``
    and ``width_heights`` = height − 0.5·prominence (scipy's default
    rel_height used by the reference's width filter). NaNs are treated
    as −inf (cannot be peaks or bases)."""
    x = np.asarray(x, float)
    x = np.where(np.isfinite(x), x, -np.inf)
    n = len(x)
    peaks = []
    i = 1
    while i < n - 1:
        if x[i - 1] < x[i]:
            j = i
            while j < n - 1 and x[j + 1] == x[i]:
                j += 1
            if j < n - 1 and x[j + 1] < x[i]:
                peaks.append((i + j) // 2)
                i = j + 1
                continue
        i += 1
    peaks = np.asarray(peaks, dtype=np.int64)
    heights = x[peaks] if len(peaks) else np.empty(0)
    proms = np.empty(len(peaks))
    for pi, p in enumerate(peaks):
        h = x[p]
        lmin = h
        k = p - 1
        while k >= 0 and x[k] <= h:
            lmin = min(lmin, x[k])
            k -= 1
        rmin = h
        k = p + 1
        while k < n and x[k] <= h:
            rmin = min(rmin, x[k])
            k += 1
        proms[pi] = h - max(lmin, rmin)
    width_heights = heights - 0.5 * proms
    return peaks, heights, proms, width_heights


def max_cov_kernel(ref, lagged, shifts):
    """Per-shift pairwise-complete sample covariance (the reference's
    polars ``pl.cov(reference, lagged.shift(-shift))``, lag.py:218-267:
    positive shift pairs ref[n] with lagged[n+shift]; ddof=1; means over
    the valid pairs only). Returns (cov, cov_abs) arrays over shifts."""
    ref = np.asarray(ref, float)
    lagged = np.asarray(lagged, float)
    n = len(ref)
    cov = np.full(len(shifts), np.nan)
    for i, s in enumerate(shifts):
        if s >= 0:
            a, b = ref[:n - s], lagged[s:]
        else:
            a, b = ref[-s:], lagged[:n + s]
        if len(a) == 0:
            continue
        valid = np.isfinite(a) & np.isfinite(b)
        nv = int(valid.sum())
        if nv < 2:
            continue
        av, bv = a[valid], b[valid]
        cov[i] = float((av - av.mean()) @ (bv - bv.mean())) / (nv - 1)
    return cov, np.abs(cov)


def auto_peak_flags(cov_abs):
    """The reference's ``find_auto_peak`` validation (lag.py:164-217):
    peak score = sqrt(prominence · width_height · peak_height), keep the
    top decile (pandas linear-interpolated quantile), and flag the
    max-|cov| record iff it is one of the top-scoring peaks. Returns
    (flag_peak_max, flag_peak_auto) boolean arrays."""
    m = len(cov_abs)
    flag_max = np.zeros(m, bool)
    flag_auto = np.zeros(m, bool)
    finite = np.isfinite(cov_abs)
    if not finite.any():
        return flag_max, flag_auto
    # pandas idxmax: first occurrence of the maximum (NaNs skipped)
    idx_max = int(np.nanargmax(np.where(finite, cov_abs, -np.inf)))
    flag_max[idx_max] = True
    peaks, heights, proms, whs = find_peaks_numpy(cov_abs)
    if len(peaks) == 0:
        return flag_max, flag_auto
    score = np.sqrt(proms * whs * heights)
    thr = float(np.quantile(score, 0.9)) if len(score) else np.inf
    top = peaks[score >= thr]
    if idx_max in top:
        flag_auto[idx_max] = True
    return flag_max, flag_auto


def max_covariance(
    df: DataFrame, key_cols: list[str], order_col: str,
    ref_col: str, lagged_col: str | None,
    winsize_from: int = -1000, winsize_to: int = 1000,
    shift_stepsize: int = 1,
    lag_records: int | None = None,
) -> DataFrame:
    """Per-key covariance lag search. Returns one row per (key, shift):
    (key..., shift, cov, cov_abs, flag_peak_max_cov_abs,
    flag_peak_auto). Negative shift moves the lagged series "upwards"
    (the reference's convention).

    ``lag_records`` (with ``lagged_col=None``): derive the lagged series
    INSIDE the per-key kernel as ``ref`` shifted by that many records —
    value-identical to pre-computing ``F.lag(ref, n)`` over a
    (key, order) window, but without paying that window's extra full
    sort+shuffle pass before the kernel's own (guide §2.4: two
    operations keyed the same way should establish the partitioning
    once — here the kernel already sorts per key)."""
    import pandas as pd

    if (lagged_col is None) == (lag_records is None):
        raise ValueError("pass exactly one of lagged_col / lag_records")
    shifts = list(range(int(winsize_from),
                        int(winsize_to) + shift_stepsize, shift_stepsize))
    lag_expr = (F.col(lagged_col) if lagged_col is not None
                else F.lit(None)).cast("double").alias("_lag")
    work = df.select(
        *key_cols, F.col(order_col).alias("_ord"),
        F.col(ref_col).cast("double").alias("_ref"), lag_expr)
    key_fields = [f for f in work.schema.fields if f.name in key_cols]
    schema = StructType(key_fields + [
        StructField("shift", LongType()),
        StructField("cov", DoubleType()),
        StructField("cov_abs", DoubleType()),
        StructField("flag_peak_max_cov_abs", BooleanType()),
        StructField("flag_peak_auto", BooleanType()),
    ])

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_ord")
        lag_arr = (pdf["_ref"].shift(lag_records).to_numpy()
                   if lag_records is not None else pdf["_lag"].to_numpy())
        cov, cov_abs = max_cov_kernel(
            pdf["_ref"].to_numpy(), lag_arr, shifts)
        fmax, fauto = auto_peak_flags(cov_abs)
        out = pd.DataFrame({
            "shift": np.asarray(shifts, np.int64), "cov": cov,
            "cov_abs": cov_abs, "flag_peak_max_cov_abs": fmax,
            "flag_peak_auto": fauto})
        for f in key_fields:
            out[f.name] = pdf[f.name].iloc[0]
        return out[[f.name for f in schema.fields]]

    return work.groupBy(*key_cols).applyInPandas(
        lambda _, pdf: kernel(pdf), schema=schema)


R_GAS = 8.31446261815324  # universal gas constant, m3 Pa K-1 mol-1


def flux_detection_limit(
    df: DataFrame, key_cols: list[str], order_col: str, *,
    u_col: str, v_col: str, w_col: str, c_col: str,
    sonic_temp_col: str, h2o_col: str, press_col: str,
    default_lag: float, noise_range: int = 20,
    lag_range: tuple[int, int] = (-180, 180),
    lag_stepsize: int = 1, sampling_rate: int = 20,
) -> DataFrame:
    """Flux detection limit per segment — Langford et al. (2015) noise
    criterion (reference flux/hires/fluxdetectionlimit.py, composition
    mirrored):

    1. air pressure split: e = h2o·press, p_d = press − e; sonic→air
       temperature Ta = Tsonic/(1 + 0.32·h2o) (fluxdetectionlimit.py
       :241-258);
    2. turbulent fluctuations w′, c′ via double rotation + Reynolds
       decomposition (:337-347);
    3. cross-covariance over the record-shift window (:348-380,
       :func:`max_covariance`);
    4. covariance → flux units with 1/(R·T̄a/p̄_d) (SAB18 eq. 16, :382-406);
    5. noise RMSE from the two edge lag windows (±[160, 180] s by
       default), LAN15 eq. 9 in the STR20 form
       sqrt(0.5·(sd_L² + mean_L² + sd_R² + mean_R²)); FDL = 3·RMSE
       (:408-444);
    6. signal = flux at ``−default_lag·sampling_rate`` records and at the
       max-|cov| lag; signal-to-noise ratios (:284-303).

    One row per key. (The reference's ``_max_abs_covariance`` helper with
    its site-specific −28-record fallback is not called by its own
    ``run()`` — not mirrored.) Everything after the bounded per-key
    covariance kernel is plain grouped aggregation."""
    from diive_spark.functions.thermo import air_temp_from_sonic_temp

    lag_from = lag_range[0] * sampling_rate
    lag_to = lag_range[1] * sampling_rate
    winsize = noise_range * sampling_rate

    work = df.select(
        *key_cols, F.col(order_col).alias("_ord"),
        F.col(u_col).alias("_u"), F.col(v_col).alias("_v"),
        F.col(w_col).alias("_w"), F.col(c_col).alias("_c"),
        air_temp_from_sonic_temp(F.col(sonic_temp_col).cast("double"),
                                 F.col(h2o_col).cast("double")).alias("_ta"),
        (F.col(press_col) - F.col(h2o_col) * F.col(press_col)).alias("_pd"),
    )
    rot = double_rotation(work, key_cols, "_u", "_v", "_w")
    rot = reynolds_fluctuations(rot, key_cols, ["_w_rot", "_c"])
    cov = max_covariance(rot, key_cols, "_ord", "_w_rot_prime", "_c_prime",
                         winsize_from=lag_from, winsize_to=lag_to,
                         shift_stepsize=lag_stepsize)
    factor = work.groupBy(*key_cols).agg(
        (F.lit(1.0) / (F.lit(R_GAS) * F.avg("_ta") / F.avg("_pd")))
        .alias("_factor"))
    cov = cov.join(F.broadcast(factor), key_cols) \
        .withColumn("cov_flux", F.col("cov") * F.col("_factor"))

    sig_shift = int(-default_lag * sampling_rate)
    left = (F.col("shift") >= lag_from) & (F.col("shift")
                                           <= lag_from + winsize)
    right = (F.col("shift") >= abs(lag_to) - winsize) & (F.col("shift")
                                                         <= abs(lag_to))
    agg = cov.groupBy(*key_cols).agg(
        F.stddev_samp(F.when(left, F.col("cov_flux"))).alias("_sdl"),
        F.avg(F.when(left, F.col("cov_flux"))).alias("_ml"),
        F.stddev_samp(F.when(right, F.col("cov_flux"))).alias("_sdr"),
        F.avg(F.when(right, F.col("cov_flux"))).alias("_mr"),
        F.first(F.when(F.col("shift") == sig_shift, F.col("cov_flux")),
                ignorenulls=True).alias("flux_signal_at_default_lag"),
        F.first(F.when(F.col("flag_peak_max_cov_abs"), F.col("cov_flux")),
                ignorenulls=True).alias("flux_signal_at_cov_max_lag"),
        F.first(F.when(F.col("flag_peak_max_cov_abs"), F.col("shift")),
                ignorenulls=True).alias("cov_max_shift"),
    )
    rmse = F.sqrt(0.5 * (F.col("_sdl") ** 2 + F.col("_ml") ** 2
                         + F.col("_sdr") ** 2 + F.col("_mr") ** 2))
    sig = F.col("flux_signal_at_default_lag")
    out = agg.withColumn("flux_noise_rmse", rmse) \
        .withColumn("flux_detection_limit", rmse * 3.0) \
        .withColumn("signal_to_noise",
                    F.when(sig != 0, F.abs(sig) / F.col("flux_noise_rmse"))) \
        .withColumn("signal_to_detection_limit",
                    F.when(sig != 0,
                           F.abs(sig) / F.col("flux_detection_limit")))
    return out.select(
        *key_cols, "flux_detection_limit", "flux_noise_rmse",
        "cov_max_shift", "flux_signal_at_default_lag",
        "flux_signal_at_cov_max_lag", "signal_to_noise",
        "signal_to_detection_limit")


def apply_time_lag(
    df: DataFrame, key_cols: list[str], order_col: str,
    scalar_cols: list[str], lags: DataFrame,
    lag_col: str = "lag_records", suffix: str = "_LAGGED",
) -> DataFrame:
    """Apply per-segment detected time lags to scalar columns — the
    numeric core of the reference's ``TlagApplier``
    (flux/hires/apply_tlag.py:346-608: each scalar column is shifted
    BACKWARD by the segment's ``round(tlag_s · hz)`` records; everything
    else passes through; the file/CLI orchestration layer is out of
    scope).

    ``lags`` maps key → integer record lag (positive = the scalar lags
    behind the wind: row n takes the scalar from row n + lag). A variable
    per-key shift cannot use the constant-offset ``F.lag``; it is one
    self-equi-join on (key, rn + lag) — rn from a per-key window — with
    the tiny lag table broadcast onto both sides."""
    kw = Window.partitionBy(*key_cols).orderBy(order_col)
    with_rn = df.join(F.broadcast(lags.select(*key_cols, lag_col)),
                      key_cols, "left") \
        .withColumn("_rn", F.row_number().over(kw))
    donor = with_rn.select(
        *key_cols,
        (F.col("_rn") - F.coalesce(F.col(lag_col), F.lit(0))).alias("_rn"),
        *[F.col(c).alias(c + suffix) for c in scalar_cols])
    return with_rn.join(donor, [*key_cols, "_rn"], "left") \
        .drop("_rn")
