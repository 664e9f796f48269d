"""ONEFlux nighttime partitioning NEE → RECO + GPP (Reichstein 2005,
ONEFlux variant).

Reference: /root/reference/diive/flux/partitioning/nighttime_oneflux.py
(itself a vectorized port of ``oneflux.partition.nighttime``). The engine
already carries the REddyProc nighttime method (fluxpart.py) and both
daytime methods; this module completes the partitioning family with the
ONEFlux nighttime semantics, structure mirrored:

per calendar year (nighttime_oneflux.py:273-392):
1. night = SW_IN < 10 AND sun below the Linacre-1992 true-solar horizon
   (``sunrise_sunset``, :94-120);
2. full-year trimmed (10 %) Lloyd-Taylor LM fit of (Rref, E0) as the
   fallback, E0 clamped to [0, 450] (:305-312);
3. 14-day/5-day-step windowed fits (≥6 night records, ≥5 K temperature
   range) collecting E0 standard errors (:314-338);
4. representative E0 = mean of the ≤3 lowest-SE windows with
   30 < E0 < 350 (:343-355); the ONEFlux well-constrained gate
   (SE < 100, SE/E0 < 0.5, 50 < E0 < 450 in ≥1 window) must pass or the
   year stays unpartitioned (:367-377);
5. Rref re-analysis with E0 fixed (8-day/4-day-step): closed-form
   through-origin slope on the Lloyd-Taylor factor, ordinary and
   95 %-trimmed robust, window-midpoint anchors linearly interpolated
   (``ipolmiss``) over decimal julian day (:222-271);
6. RECO = LT(Ta_f, Rref(t), E0); GPP = RECO − NEE_f (gap-filled series
   for continuity), plus the ROB variants.

The optimizer is :func:`leastsq_lm` — a scipy-free Levenberg-Marquardt
with MINPACK's calling convention (forward-difference Jacobian, step
retry on non-convergence, covariance-based parameter standard errors).
It is deliberately pluggable: the parity tests inject it as the
``scipy.optimize.leastsq`` stub so the REFERENCE code executes its own
window logic / percentile / gates against the same optimizer, and the
optimizer itself is validated by planted-parameter recovery.

Spark shape: one Arrow kernel per (key, year) — a year of half-hourly
data is ≤17 600 records and ~75 bounded LM solves; embarrassingly
parallel across site-years, no driver data.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TREF = 15.0
T0 = -46.02
STEP_SIZE = 5
WINDOW_SIZE = 14
MIN_ENTRIES = 6
MIN_TRANGE = 5.0
DAY_MIN_SW_IN = 10.0
TRIM_PERC = 10.0
REANALYSE_STEP = 4
REANALYSE_WINDOW = 8
_STEP_BOUND_FACTOR = 0.25
_NO_CONVERGENCE_RETRY = 20

OUT_COLS = ["NEE_NIGHT_OF", "RECO_NT_OF", "RECO_NT_OF_ROB", "GPP_NT_OF",
            "GPP_NT_OF_ROB", "RREF_NT_OF", "E0_NT_OF"]


def lloyd_taylor(ta, rref, e0, tref=TREF, t0=T0):
    """R = Rref·exp(E0·(1/(Tref−T0) − 1/(Ta−T0))), temperatures in °C."""
    return rref * np.exp(e0 * (1.0 / (tref - t0) - 1.0 / (ta - t0)))


def sunrise_sunset(doy, lat):
    """Linacre (1992) true-solar sunrise/sunset decimal hours (the ONEFlux
    ``sunrs`` formulation: equinox day 80, 23.45° declination amplitude)."""
    pi = 3.1415926
    lat_rad = lat * pi / 180.0
    decl = (23.45 * pi / 180.0) * np.sin(2.0 * pi / 365.0 * (doy - 80))
    hs = np.arccos(-np.tan(lat_rad) * np.tan(decl))
    hours = 24.0 / (2.0 * pi)
    return 12.0 - hs * hours, 12.0 + hs * hours


def rank_percentile(array, percent):
    """The ONEFlux ``pct`` rank percentile: value at the smallest integer
    rank strictly above n·p/100, averaged with the previous rank when the
    critical rank is itself an integer."""
    v = array[~np.isnan(array)]
    n = v.size
    if n <= 1:
        raise ValueError("no non-NA value in percentile calculation")
    critical = n * percent / 100.0
    if n <= critical:
        return float(np.max(v))
    s = np.sort(v)
    k = int(np.floor(critical)) + 1
    if float(critical).is_integer() and k >= 2:
        return float((s[k - 1] + s[k - 2]) / 2.0)
    return float(s[k - 1])


def leastsq_lm(func, x0, full_output=True, maxfev=2000, factor=100.0,
               ftol=1.49012e-8, xtol=1.49012e-8):
    """Levenberg-Marquardt least squares with MINPACK's ``leastsq``
    calling convention (scipy-free).

    Forward-difference Jacobian, multiplicative damping, convergence on
    relative cost or step size. Returns
    ``(pars, cov_x, {'fvec', 'nfev'}, msg, ier)`` with ier == 1 on
    convergence — the exact tuple shape ONEFlux-style callers expect, so
    the reference's own fitting code can run against this optimizer."""
    x = np.asarray(x0, dtype=float).copy()
    npar = x.size
    nfev = 0

    def call(p):
        nonlocal nfev
        nfev += 1
        return np.asarray(func(p), dtype=float)

    f = call(x)
    cost = float(f @ f)
    lam = 1e-3 / max(factor, 1e-12)
    eps = np.sqrt(np.finfo(float).eps)
    ier = 5
    jtj = None
    for _ in range(400):
        if nfev >= maxfev:
            ier = 5
            break
        jac = np.empty((f.size, npar))
        for j in range(npar):
            h = eps * max(abs(x[j]), 1.0)
            xp = x.copy()
            xp[j] += h
            jac[:, j] = (call(xp) - f) / h
        jtj = jac.T @ jac
        g = jac.T @ f
        if np.all(np.abs(g) < 1e-14):
            ier = 1
            break
        improved = False
        for _try in range(50):
            try:
                step = np.linalg.solve(
                    jtj + lam * np.diag(np.maximum(np.diag(jtj), 1e-12)), -g)
            except np.linalg.LinAlgError:
                lam *= 10
                continue
            xn = x + step
            fn = call(xn)
            cn = float(fn @ fn)
            if np.isfinite(cn) and cn <= cost:
                rel = (cost - cn) / max(cost, 1e-300)
                srel = float(np.max(np.abs(step)
                                    / np.maximum(np.abs(xn), 1.0)))
                x, f, cost = xn, fn, cn
                lam = max(lam * 0.3, 1e-14)
                improved = True
                if rel < ftol or srel < xtol:
                    ier = 1
                break
            lam *= 10
            if nfev >= maxfev:
                break
        if not improved or ier == 1:
            if not improved:
                ier = 1 if cost == 0 or lam > 1e12 else ier
            break
    cov_x = None
    if jtj is not None:
        try:
            cov_x = np.linalg.inv(jtj)
        except np.linalg.LinAlgError:
            cov_x = None
    return x, cov_x, {"fvec": f, "nfev": nfev}, "lm", ier


def _leastsq_fit(func, x0, entries, maxfev, retry=True):
    """ONEFlux wrapper: step bound 0.25, one ×20 maxfev retry, SE from
    cov·s² (nighttime_oneflux.py:148-166)."""
    pars, cov_x, info, _msg, ier = leastsq_lm(
        func, x0, maxfev=maxfev, factor=_STEP_BOUND_FACTOR)
    if ier != 1 and info["nfev"] >= maxfev and retry:
        return _leastsq_fit(func, x0, entries,
                            maxfev * _NO_CONVERGENCE_RETRY, retry=False)
    npar = len(x0)
    residuals = info["fvec"]
    if entries > npar and cov_x is not None:
        s2 = float(residuals @ residuals) / (entries - npar)
        std = np.sqrt(np.abs(np.diag(cov_x * s2)))
    else:
        std = np.full(npar, np.nan)
    return np.asarray(pars, float), std, residuals


def fit_lloyd_taylor_trimmed(nee_night, tair, xguess=(2.0, 200.0),
                             trim_perc=TRIM_PERC):
    """Trimmed Lloyd-Taylor (Rref, E0) fit (ONEFlux ``nlinlts1``):
    residuals above the (100−trim) rank percentile are zeroed each
    evaluation. Returns (rref, e0, rref_se, e0_se) or None."""
    ok_t = ~np.isnan(tair)
    if ok_t.sum() < 6 or (ok_t & ~np.isnan(nee_night)).sum() < 6:
        return None
    dep = nee_night.copy()
    dep[~ok_t] = np.nan
    nan_dep = np.isnan(dep)

    def resid(par):
        r = dep - lloyd_taylor(tair, par[0], par[1])
        r[nan_dep] = 0.0
        if trim_perc:
            a = np.abs(r)
            r[a > rank_percentile(a, 100.0 - trim_perc)] = 0.0
        return r

    pars, std, _ = _leastsq_fit(resid, list(xguess), entries=len(dep),
                                maxfev=1000 * (len(dep) + 1))
    return float(pars[0]), float(pars[1]), float(std[0]), float(std[1])


def _interp_missing(values, x):
    mask = ~np.isnan(values)
    if mask.sum() < 2 or mask.all():
        return values
    return np.interp(x, x[mask], values[mask])


def reanalyse_rref(nee_night, tair, tair_f, julday_dec, e0,
                   step=REANALYSE_STEP, window=REANALYSE_WINDOW):
    """Rref re-analysis with E0 fixed (ONEFlux ``reanalyse_rref``):
    closed-form through-origin slope per window (ordinary + 95 %-trimmed
    robust), anchors at window-midpoint indices, linear interpolation."""
    n = nee_night.size
    rref_ord = np.full(n, np.nan)
    rref_trim = np.full(n, np.nan)
    julday_int = (julday_dec + 0.5).astype(np.int64)
    last_day = int(julday_dec[-1])
    valid = ~np.isnan(tair) & ~np.isnan(nee_night)
    for j in range(1, last_day, step):
        mask = (julday_int >= j) & (julday_int < j + window) & valid
        cnt = int(mask.sum())
        if cnt <= 2:
            continue
        idx = np.where(mask)[0]
        mid = int(round(idx.mean()))
        fac = lloyd_taylor(tair[mask], 1.0, e0)
        sub = nee_night[mask]
        den = float(fac @ fac)
        if den > 0:
            b = float(fac @ sub) / den
            rref_ord[mid] = b if b > 1e-6 else 1e-6
        dev = np.abs(sub - sub.mean())
        keep = dev < rank_percentile(dev, 95.0)
        if keep.sum() > 0:
            den_t = float(fac[keep] @ fac[keep])
            if den_t > 0:
                b = float(fac[keep] @ sub[keep]) / den_t
                rref_trim[mid] = b if b > 1e-6 else 1e-6
    rref_ord = _interp_missing(rref_ord, julday_dec)
    rref_trim = _interp_missing(rref_trim, julday_dec)
    return (lloyd_taylor(tair_f, rref_ord, e0),
            lloyd_taylor(tair_f, rref_trim, e0), rref_ord)


def partition_year_arrays(nee, tair, sw_in, nee_f, tair_f, doy, hr, lat):
    """One year of the ONEFlux nighttime partitioning (pure numpy;
    nighttime_oneflux.py:273-392 step for step). Returns a dict of the
    seven OUT_COLS arrays."""
    n = nee.size
    out = {c: np.full(n, np.nan) for c in OUT_COLS}
    if lat is not None and np.isfinite(lat):
        sunrise, sunset = sunrise_sunset(doy, lat)
        daylight = (hr > sunrise) & (hr < sunset)
    else:
        daylight = np.zeros(n, dtype=bool)
    with np.errstate(invalid="ignore"):
        night = (sw_in < DAY_MIN_SW_IN) & ~daylight
    nee_night = np.where(night, nee, np.nan)
    out["NEE_NIGHT_OF"] = nee_night

    full = fit_lloyd_taylor_trimmed(nee_night, tair)
    e0_1 = np.nan if full is None else max(0.0, min(450.0, full[1]))

    julmin, julmax = int(doy[0]), int(np.max(doy))
    valid = ~np.isnan(nee_night) & ~np.isnan(tair)
    win_e0, win_e0_se = [], []
    for jday in range(julmin, julmax + 1, STEP_SIZE):
        m = (doy >= jday) & (doy < jday + WINDOW_SIZE) & valid
        if int(m.sum()) <= MIN_ENTRIES:
            continue
        if np.max(tair[m]) - np.min(tair[m]) < MIN_TRANGE:
            continue
        fit = fit_lloyd_taylor_trimmed(nee_night[m], tair[m])
        if fit is None:
            continue
        win_e0.append(fit[1])
        win_e0_se.append(fit[3])
    win_e0 = np.asarray(win_e0)
    win_e0_se = np.asarray(win_e0_se)

    best_e0 = np.nan
    if win_e0.size:
        in_range = (win_e0 > 30.0) & (win_e0 < 350.0)
        if in_range.sum() > 1:
            idx_in = np.where(in_range)[0]
            order = np.argsort(win_e0_se[in_range])
            sel = idx_in[order[:min(3, order.size)]]
            best_e0 = float(np.mean(win_e0[sel]))
    if not np.isfinite(best_e0):
        best_e0 = e0_1
    if not np.isfinite(best_e0):
        return out
    out["E0_NT_OF"][:] = best_e0

    with np.errstate(invalid="ignore", divide="ignore"):
        constrained = ((win_e0_se < 100.0) & (win_e0_se / win_e0 < 0.5)
                       & (win_e0 > 50.0) & (win_e0 < 450.0))
    if not constrained.any():
        return out

    julday_dec = doy + hr / 24.0
    reco, reco_rob, rref_ord = reanalyse_rref(
        nee_night, tair, tair_f, julday_dec, best_e0)
    out["RECO_NT_OF"] = reco
    out["RECO_NT_OF_ROB"] = reco_rob
    out["RREF_NT_OF"] = rref_ord
    out["GPP_NT_OF"] = reco - nee_f
    out["GPP_NT_OF_ROB"] = reco_rob - nee_f
    return out


def partition_nee_nighttime_oneflux(
    df: DataFrame, key_cols: list[str], ts_col: str, *,
    nee_col: str, ta_col: str, swin_col: str,
    nee_f_col: str | None = None, ta_f_col: str | None = None,
    lat: float | None = None,
) -> DataFrame:
    """Append the seven ONEFlux nighttime-partitioning columns per
    (key, calendar year). Gap-filled inputs default to the raw series
    (the reference accepts either)."""
    import pandas as pd
    from pyspark.sql.types import DoubleType, StructField, StructType

    nee_f_col = nee_f_col or nee_col
    ta_f_col = ta_f_col or ta_col
    # lazy-checkpoint the caller's frame so the kernel's input projection
    # and the (key, ts) join-back share ONE materialization — the join side
    # otherwise re-executes df's whole upstream (r8 plan audit: a second
    # raw scan + aggregate per call). Lowres 30-min flux tier by contract:
    # tier-sized, safe to pin.
    df = df.localCheckpoint(eager=False)
    work = df.select(
        *key_cols, F.col(ts_col).alias("_ts"),
        F.col(nee_col).cast("double").alias("_nee"),
        F.col(ta_col).cast("double").alias("_ta"),
        F.col(swin_col).cast("double").alias("_sw"),
        F.col(nee_f_col).cast("double").alias("_nee_f"),
        F.col(ta_f_col).cast("double").alias("_ta_f"),
        F.year(ts_col).alias("_yr"),
        F.dayofyear(ts_col).cast("double").alias("_doy"),
        (F.hour(ts_col) + F.minute(ts_col) / 60.0
         + F.second(ts_col) / 3600.0).alias("_hr"),
    )
    key_fields = [f for f in work.schema.fields if f.name in key_cols]
    schema = StructType(key_fields + [
        StructField("_ts", work.schema["_ts"].dataType),
        *[StructField(c, DoubleType()) for c in OUT_COLS],
    ])

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_ts").reset_index(drop=True)
        res = partition_year_arrays(
            pdf["_nee"].to_numpy(), pdf["_ta"].to_numpy(),
            pdf["_sw"].to_numpy(), pdf["_nee_f"].to_numpy(),
            pdf["_ta_f"].to_numpy(), pdf["_doy"].to_numpy(),
            pdf["_hr"].to_numpy(), lat)
        out = pdf[[f.name for f in key_fields] + ["_ts"]].copy()
        for c in OUT_COLS:
            out[c] = res[c]
        return out

    parts = work.groupBy(*key_cols, "_yr").applyInPandas(
        lambda _, pdf: kernel(pdf), schema=schema)
    parts = parts.withColumnRenamed("_ts", ts_col) \
                 .dropDuplicates([*key_cols, ts_col])
    return df.join(parts, on=[*key_cols, ts_col], how="left")
