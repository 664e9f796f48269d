"""PWB time-lag detection: pre-whitening with block-bootstrap
(Vitale et al. 2024 / RFlux v3.2.0).

Reference: /root/reference/diive/flux/hires/lag_pwb.py
(``PreWhiteningBootstrap``; the batch/TUI/plot layers are out of scope).
For weak-signal trace gases (N2O, CH4) the raw scalar×wind
cross-correlation peak is too broad for covariance maximisation; PWB
sharpens it. Pipeline mirrored (lag_pwb.py:643-775):

1. linearly interpolate interior NaN (na.approx), drop rows still NaN;
2. Breitung (2002) variance-ratio unit-root test on each aligned series
   (egcm ``bvr.test`` 1 % critical value 0.00537748); any unit root →
   first-difference all series;
3. AR(p) per series (scalar, W, T_SONIC): FFT autocorrelation +
   Levinson-Durbin over orders 1..⌊100·log10 N⌋, AIC-selected
   (R ``ar(aic=TRUE)``);
4. pre-whiten by convolving with (1, −φ) — leading p records NaN;
5. diagnostic full-data PW CCF (scalar-AR pair) → tlag_pw; raw
   detrended cross-covariance → cov at the selected lag;
6. moving-block bootstrap (overlapping blocks, L = 2·lag_max records,
   R ``tsboot(sim="fixed")``) × four RFlux combinations
   (scalar×W / scalar×T_SONIC under scalar/W/T_SONIC AR filters),
   batch FFT CCF per replicate, centered rolling-mean smoothing +
   two-pass locf edge fill, per-replicate windowed |CCF| argmax;
7. winning combination = highest |mean smoothed CCF| at its mode lag;
8. lag = KDE MAP mode of the winner's bootstrap lags (Scott-bandwidth
   Gaussian KDE with tie-breaking jitter — R ``bayestestR::map_estimate``),
   95 % HDI; reliable (S1) when the HDI range < 0.5 s.

All numerics are numpy-native here (no scipy): the FFT correlations,
the Levinson-Durbin recursion, the KDE and the filters are implemented
in this module and double as the scipy stand-ins when the parity tests
EXECUTE the reference.

Spark shape: one bounded Arrow kernel per averaging segment (36 000
records × 99 bootstrap FFTs ≈ a second of numpy) — embarrassingly
parallel across segments, one summary row out per key.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BVR_CV_1PCT = 0.00537748023783321  # egcm bvr_qtab 1 %, n=1250 column
SMOOTH_WIDTH_CCF = 5
SMOOTH_WIDTH_CCOV = 31
HDI_MASS = 0.95
S1_MAX_HDI_RANGE_S = 0.5


def interp_interior_nan(x):
    """R ``zoo::na.approx``-style linear interpolation of NaN; edge NaN
    clamp to the nearest valid value (np.interp boundary behaviour, the
    reference's convention)."""
    x = np.asarray(x, float).copy()
    ok = np.isfinite(x)
    if ok.sum() < 2 or ok.all():
        return x
    idx = np.arange(len(x))
    x[~ok] = np.interp(idx[~ok], idx[ok], x[ok])
    return x


def breitung_is_stationary(x, alpha=0.01):
    """Breitung (2002) variance-ratio unit-root test, egcm ``bvr.test``
    semantics: ρ = Σ cumsum(e)² / (n²·Σe²) < the tabulated 1 % critical
    value ⇒ stationary (lag_pwb.py:775-809)."""
    if alpha != 0.01:
        raise ValueError("critical value tabulated for alpha=0.01 only")
    e = np.asarray(x, float)
    e = e - e.mean()
    sse = float(e @ e)
    if sse == 0.0:
        return True
    s = np.cumsum(e)
    rho = float(s @ s) / (len(e) ** 2 * sse)
    return rho < BVR_CV_1PCT


def ar_select_aic(x, max_order=None):
    """AR(p) by AIC over 1..max_order (default ⌊100·log10 N⌋, the R
    ``ar()`` bound): one FFT autocorrelation pass + the Levinson-Durbin
    recursion, AIC = n·log σ²_p + 2p. Returns (phi, p); p = 0 (empty
    phi) when white noise wins."""
    v = np.asarray(x, float)
    v = v[np.isfinite(v)]
    v = v - v.mean()
    n = v.size
    if max_order is None:
        max_order = int(np.floor(100 * np.log10(n)))
    max_order = min(max_order, n - 1)
    nfft = 1 << (n + max_order - 1).bit_length()
    spec = np.fft.rfft(v, n=nfft)
    r = np.fft.irfft(spec * np.conj(spec), n=nfft)[:max_order + 1] / n
    if r[0] <= 0:
        return np.empty(0), 0
    best = (n * np.log(r[0]), np.empty(0), 0)
    a = np.array([r[1] / r[0]])
    var = r[0] * (1.0 - a[0] ** 2)
    if var > 0:
        aic = n * np.log(var) + 2.0
        if aic < best[0]:
            best = (aic, a.copy(), 1)
    for p in range(2, max_order + 1):
        if var <= 0:
            break
        k = (r[p] - float(a @ r[1:p][::-1])) / var
        a = np.append(a - k * a[::-1], k)
        var *= 1.0 - k * k
        if var > 0:
            aic = n * np.log(var) + 2.0 * p
            if aic < best[0]:
                best = (aic, a.copy(), p)
    return best[1], best[2]


def prewhiten(x, phi):
    """x̃_t = x_c_t − Σ φ_i·x_c_{t−i} (R ``stats::filter`` convolution,
    sides=1); the first p outputs are NaN (uninitialised delay line)."""
    xc = np.asarray(x, float) - np.nanmean(x)
    p = len(phi)
    if p == 0:
        return xc
    filled = np.where(np.isfinite(xc), xc, 0.0)
    out = np.convolve(filled, np.concatenate([[1.0], -np.asarray(phi)]))[
        :len(filled)]
    out[:p] = np.nan
    return out


def linear_detrend(x):
    """Least-squares linear detrend (scipy.signal.detrend 'linear')."""
    x = np.asarray(x, float)
    t = np.arange(len(x), dtype=float)
    t = t - t.mean()
    slope = float(t @ (x - x.mean())) / float(t @ t)
    return x - x.mean() - slope * t


def smooth_centered(arr, width):
    """Centered rolling mean, NaN at the half-width edges
    (R ``rollapply(width, fill=NA)``); works on 1-D or row-wise 2-D."""
    a = np.atleast_2d(np.asarray(arr, float))
    if width <= 1:
        out = a.copy()
    else:
        m = a.shape[1]
        half = width // 2
        cs = np.zeros((a.shape[0], m + 1))
        np.cumsum(a, axis=1, out=cs[:, 1:])
        out = np.full_like(a, np.nan)
        out[:, half:m - half] = (cs[:, width:] - cs[:, :m - width + 1]) \
            / width
    return out[0] if np.ndim(arr) == 1 else out


def locf_two_pass(arr):
    """Forward- then backward-fill NaN per row (R two-pass
    ``zoo::na.locf``); 1-D or 2-D."""
    a = np.atleast_2d(np.asarray(arr, float)).copy()
    nb, m = a.shape
    cols = np.arange(m)
    rows = np.arange(nb)[:, None]
    miss = np.isnan(a)
    fwd = np.where(~miss, cols, 0)
    np.maximum.accumulate(fwd, axis=1, out=fwd)
    a = np.where(miss, a[rows, fwd], a)
    miss = np.isnan(a)
    if miss.any():
        bwd = np.where(~miss, cols, m - 1)
        bwd[:, ::-1] = np.minimum.accumulate(bwd[:, ::-1], axis=1)
        a = np.where(miss, a[rows, bwd], a)
    return a[0] if np.ndim(arr) == 1 else a


def batch_ccf(x_mat, y_mat, lag_max):
    """Normalised FFT cross-correlation rows for lags −lag_max..+lag_max
    (positive lag = y delayed behind x). Inputs NaN-free 2-D."""
    xm = x_mat - x_mat.mean(axis=1, keepdims=True)
    ym = y_mat - y_mat.mean(axis=1, keepdims=True)
    m = xm.shape[1]
    nfft = 1 << (m + lag_max - 1).bit_length()
    fx = np.fft.rfft(xm, n=nfft, axis=1)
    fy = np.fft.rfft(ym, n=nfft, axis=1)
    full = np.fft.irfft(fy * np.conj(fx), n=nfft, axis=1)
    norm = np.sqrt((xm ** 2).sum(axis=1) * (ym ** 2).sum(axis=1))
    full /= np.where(norm == 0.0, 1.0, norm)[:, None]
    return np.concatenate([full[:, nfft - lag_max:], full[:, :lag_max + 1]],
                          axis=1)


def ccf_pair(x, y, lag_max, normalised=True):
    """Single-pair CCF/cross-covariance for lags −lag_max..+lag_max;
    joint leading-NaN trim (na.omit), biased covariance (÷N)."""
    x = np.asarray(x, float)
    y = np.asarray(y, float)
    bad = np.isnan(x) | np.isnan(y)
    if normalised and bad.any():
        first = int(np.argmax(~bad))
        x, y = x[first:], y[first:]
    xc = np.where(np.isnan(x), 0.0, x - np.nanmean(x))
    yc = np.where(np.isnan(y), 0.0, y - np.nanmean(y))
    out = batch_ccf(xc[None, :], yc[None, :], lag_max)[0]
    if not normalised:
        norm = np.sqrt(float(xc @ xc) * float(yc @ yc))
        out *= norm / max(len(xc), len(yc))
    return out


def gaussian_kde_map(samples, rng):
    """KDE MAP mode with tie-breaking jitter (bayestestR
    ``map_estimate`` semantics; Scott-bandwidth Gaussian KDE on a
    512-point grid, lag_pwb.py:1232-1258)."""
    samples = np.asarray(samples, float)
    if len(np.unique(samples)) == 1:
        return int(samples[0])
    z = samples + rng.normal(0, 0.0001, len(samples))
    sigma = z.std(ddof=1)
    bw = sigma * len(z) ** (-1.0 / 5.0)
    grid = np.linspace(z.min(), z.max(), 512)
    dens = np.exp(-0.5 * ((grid[:, None] - z[None, :]) / bw) ** 2).sum(axis=1)
    return int(round(float(grid[np.argmax(dens)])))


def hdi(samples, credible_mass=HDI_MASS):
    """Shortest interval containing ``credible_mass`` of the samples."""
    s = np.sort(np.asarray(samples, float))
    n = s.size
    n_in = int(np.floor(credible_mass * n))
    n_iv = n - n_in
    if n_iv <= 0:
        return float(s[0]), float(s[-1])
    widths = s[n_in:] - s[:n_iv]
    i = int(np.argmin(widths))
    return float(s[i]), float(s[i + n_in])


def pwb_detect(w, scalar, tsonic, *, hz=20, lag_max_s=10.0, n_bootstrap=99,
               block_length_s=None, wdt=5, seed=0,
               lws=None, uws=None):
    """One segment's full PWB detection (pure numpy). Returns a dict:
    tlag_s / tlag_records / hdi_lo_s / hdi_hi_s / hdi_range_s /
    is_reliable / is_edge_pinned / combination / tlag_pw_s / corr_pw /
    cov_pwb / ar_order_{scalar,w,tsonic} / n_used. ``seed`` drives the
    bootstrap and MAP jitter (deterministic per segment)."""
    rng = np.random.default_rng(seed)
    lag_max = int(round(lag_max_s * hz))
    block_len = int(round((block_length_s if block_length_s is not None
                           else 2 * lag_max_s) * hz))
    w = interp_interior_nan(w)
    s = interp_interior_nan(scalar)
    t = interp_interior_nan(tsonic)
    ok = np.isfinite(w) & np.isfinite(s) & np.isfinite(t)
    w, s, t = w[ok], s[ok], t[ok]
    if not all(breitung_is_stationary(v) for v in (s, w, t)):
        w, s, t = np.diff(w), np.diff(s), np.diff(t)
    n = len(s)

    phi_s, p_s = ar_select_aic(s)
    phi_w, p_w = ar_select_aic(w)
    phi_t, p_t = ar_select_aic(t)
    s_fa, w_fa, t_fa = (prewhiten(v, phi_s) for v in (s, w, t))
    s_fw, w_fw = prewhiten(s, phi_w), prewhiten(w, phi_w)
    s_ft, t_ft = prewhiten(s, phi_t), prewhiten(t, phi_t)

    raw_ccov = ccf_pair(linear_detrend(w), linear_detrend(s), lag_max,
                        normalised=False)
    pw_ccf = ccf_pair(w_fa, s_fa, lag_max)
    lo_idx = 0 if lws is None else max(0, lag_max + int(round(lws * hz)))
    hi_idx = (2 * lag_max if uws is None
              else min(2 * lag_max, lag_max + int(round(uws * hz))))

    def win_argmax(mat):
        a = np.abs(np.atleast_2d(mat))
        idx = np.nanargmax(a[:, lo_idx:hi_idx + 1], axis=1) + lo_idx
        return idx[0] if np.ndim(mat) == 1 else idx

    tl0 = int(win_argmax(pw_ccf))
    tlag_pw_records = tl0 - lag_max
    corr_pw = float(pw_ccf[tl0])

    def boot(x_pw, y_pw):
        x0 = np.where(np.isnan(x_pw), 0.0, x_pw)
        y0 = np.where(np.isnan(y_pw), 0.0, y_pw)
        n_starts = max(1, len(x0) - block_len + 1)
        n_blocks = -(-len(x0) // block_len)
        starts = rng.integers(0, n_starts, size=(n_bootstrap, n_blocks))
        pick = (starts[:, :, None] + np.arange(block_len)[None, None, :]) \
            .reshape(n_bootstrap, -1)[:, :len(x0)]
        pick = np.minimum(pick, len(x0) - 1)
        ccfs = batch_ccf(x0[pick], y0[pick], lag_max)
        mean_smooth = locf_two_pass(smooth_centered(ccfs.mean(axis=0), wdt))
        per_rep = locf_two_pass(smooth_centered(ccfs, wdt))
        lags = win_argmax(per_rep).astype(int) - lag_max
        return {"lags": lags, "mode_lag": gaussian_kde_map(lags, rng),
                "mean_smooth_ccf": mean_smooth}

    combos = {"cw": boot(w_fa, s_fa), "wc": boot(w_fw, s_fw),
              "ct": boot(t_fa, s_fa), "tc": boot(t_ft, s_ft)}
    best_key, best_corr = next(iter(combos)), -np.inf
    for key, c in combos.items():
        i = c["mode_lag"] + lag_max
        if 0 <= i < len(c["mean_smooth_ccf"]) \
                and np.isfinite(c["mean_smooth_ccf"][i]):
            v = abs(c["mean_smooth_ccf"][i])
            if v > best_corr:
                best_corr, best_key = v, key
    best = combos[best_key]
    tlag_records = int(best["mode_lag"])
    hdi_lo, hdi_hi = hdi(best["lags"] / hz)
    edge_pinned = tlag_records in (lo_idx - lag_max, hi_idx - lag_max)
    cov_i = tlag_records + lag_max
    cov_pwb = (float(raw_ccov[cov_i]) if 0 <= cov_i < len(raw_ccov)
               else np.nan)
    hdi_range = hdi_hi - hdi_lo
    return {
        "tlag_s": np.nan if edge_pinned else tlag_records / hz,
        "tlag_records": tlag_records,
        "hdi_lo_s": np.nan if edge_pinned else hdi_lo,
        "hdi_hi_s": np.nan if edge_pinned else hdi_hi,
        "hdi_range_s": np.nan if edge_pinned else hdi_range,
        "is_reliable": bool(not edge_pinned
                            and hdi_range < S1_MAX_HDI_RANGE_S),
        "is_edge_pinned": bool(edge_pinned),
        "combination": best_key,
        "tlag_pw_s": tlag_pw_records / hz,
        "corr_pw": corr_pw,
        "cov_pwb": cov_pwb,
        "ar_order_scalar": p_s, "ar_order_w": p_w, "ar_order_tsonic": p_t,
        "n_used": n,
    }


def pwb_lag_detection(
    df: DataFrame, key_cols: list[str], order_col: str, *,
    w_col: str, scalar_col: str, tsonic_col: str,
    hz: int = 20, lag_max_s: float = 10.0, n_bootstrap: int = 99,
    block_length_s: float | None = None, wdt: int = 5,
    lws: float | None = None, uws: float | None = None,
) -> DataFrame:
    """Per-segment PWB lag detection: one summary row per key. The
    bootstrap seed derives from the key (crc32) — deterministic across
    runs and executors (the reference leaves seeding to the caller)."""
    import zlib

    import pandas as pd
    from pyspark.sql.types import (BooleanType, DoubleType, LongType,
                                   StringType, StructField, StructType)

    work = df.select(
        *key_cols, F.col(order_col).alias("_ord"),
        F.col(w_col).cast("double").alias("_w"),
        F.col(scalar_col).cast("double").alias("_s"),
        F.col(tsonic_col).cast("double").alias("_t"))
    key_fields = [f for f in work.schema.fields if f.name in key_cols]
    schema = StructType(key_fields + [
        StructField("tlag_s", DoubleType()),
        StructField("tlag_records", LongType()),
        StructField("hdi_lo_s", DoubleType()),
        StructField("hdi_hi_s", DoubleType()),
        StructField("hdi_range_s", DoubleType()),
        StructField("is_reliable", BooleanType()),
        StructField("is_edge_pinned", BooleanType()),
        StructField("combination", StringType()),
        StructField("tlag_pw_s", DoubleType()),
        StructField("corr_pw", DoubleType()),
        StructField("cov_pwb", DoubleType()),
        StructField("ar_order_scalar", LongType()),
        StructField("ar_order_w", LongType()),
        StructField("ar_order_tsonic", LongType()),
        StructField("n_used", LongType()),
    ])

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_ord")
        seed = zlib.crc32("|".join(
            str(pdf[f.name].iloc[0]) for f in key_fields).encode())
        res = pwb_detect(
            pdf["_w"].to_numpy(), pdf["_s"].to_numpy(),
            pdf["_t"].to_numpy(), hz=hz, lag_max_s=lag_max_s,
            n_bootstrap=n_bootstrap, block_length_s=block_length_s,
            wdt=wdt, seed=seed, lws=lws, uws=uws)
        row = {f.name: pdf[f.name].iloc[0] for f in key_fields}
        row.update(res)
        return pd.DataFrame([row])[[f.name for f in schema.fields]]

    return work.groupBy(*key_cols).applyInPandas(
        lambda _, pdf: kernel(pdf), schema=schema)


def chunked_pwb_pipeline(
    df: DataFrame, key_cols: list[str], ts_col: str, *,
    u_col: str, v_col: str, w_col: str, scalar_col: str, tsonic_col: str,
    hz: int = 20, chunk_seconds: int = 1800, min_chunk_seconds: int = 300,
    lag_max_s: float = 10.0, n_bootstrap: int = 99,
    lws: float | None = None, uws: float | None = None,
) -> tuple[DataFrame, DataFrame]:
    """The detect-and-remove pipeline over wall-clock chunks — the engine
    composition of the reference's per-file two-phase loop
    (flux/hires/detect_and_remove_tlag.py): chunk on the :00/:30
    wall-clock grid (a leading partial chunk shorter than
    ``min_chunk_seconds`` is dropped, mirroring the grid-alignment rule),
    double-rotate each chunk's wind in place, run PWB per chunk, then
    shift the scalar by each chunk's detected lag
    (:func:`diive_spark.operators.windlag.apply_time_lag`).

    Returns ``(corrected_df, lags_df)``. Where the reference loops files
    on one machine, every stage here is keyed by (key..., chunk) — the
    natural 100 TB partition unit."""
    from diive_spark.operators.windlag import apply_time_lag, double_rotation

    chunk = (F.floor(F.col(ts_col).cast("double") / chunk_seconds)
             * chunk_seconds).cast("long").alias("_chunk")
    work = df.withColumn("_chunk", chunk)
    gkeys = [*key_cols, "_chunk"]
    # drop sub-minimum leading/trailing partial chunks (grid rule)
    sizes = work.groupBy(*gkeys).agg(F.count(F.lit(1)).alias("_n"))
    work = work.join(
        F.broadcast(sizes.filter(
            F.col("_n") >= min_chunk_seconds * hz).drop("_n")), gkeys)
    rotated = double_rotation(work, gkeys, u_col, v_col, w_col)
    lags = pwb_lag_detection(
        rotated, gkeys, ts_col, w_col=f"{w_col}_rot",
        scalar_col=scalar_col, tsonic_col=tsonic_col, hz=hz,
        lag_max_s=lag_max_s, n_bootstrap=n_bootstrap, lws=lws, uws=uws)
    lag_table = lags.select(
        *gkeys,
        F.round(F.coalesce(F.col("tlag_s"), F.lit(0.0)) * hz)
        .cast("long").alias("lag_records"))
    corrected = apply_time_lag(work, gkeys, ts_col, [scalar_col], lag_table)
    return corrected, lags
