"""Nighttime flux partitioning NEE -> RECO + GPP (Reichstein 2005 /
REddyProc nighttime method) — closed-form engine analogue.

Reference: /root/reference/diive/flux/partitioning/nighttime_reddyproc.py
(itself a REddyProc port). Structure mirrored:

1. nighttime records carry pure respiration; the Lloyd & Taylor (1994)
   model R = Rref * exp(E0 * b), b = 1/(Tref-T0) - 1/(Ta-T0) (Kelvin,
   Tref = 288.15, T0 = 227.13) is fit to nighttime NEE vs temperature;
2. ONE temperature sensitivity E0 per key from centered 15-day windows in
   5-day steps: per window fit, trim the 5/95 residual tails, refit, keep
   only windows with >6 records, >=5 K temperature range and the ±1-SD
   interval inside [30, 350]; average the three lowest-SD estimates
   (fRegrE0fromShortTerm);
3. with E0 fixed, time-varying Rref from centered 7-day windows in 4-day
   steps as the through-origin slope of NEE on the Lloyd-Taylor factor
   (negative slopes dropped), anchored at the window's mean time and
   linearly interpolated to every record (constant beyond the ends);
4. RECO = LloydTaylor(Ta, Rref_t, E0); GPP = RECO - NEE.

Engine divergences (documented, deliberate):
- the per-window E0 fit is the LOG-SPACE linear regression ln(NEE) on b
  (exactly the model, linear in (ln Rref, E0)) instead of the reference's
  nonlinear ``leastsq`` — same estimator family, closed-form, distributed
  as cross-product sums; the residual trim is on log residuals;
- windows are CALENDAR-day based (the reference uses record-index days,
  identical on gap-free grids).

Execution shape: every step is groupBy/window algebra — records explode to
their <=3 covering E0 windows (sequence(), JVM exprs), window fits are one
aggregation per (key, window), the best-3 selection is a per-key top-k, and
Rref interpolation is the running last/first-ignorenulls pattern. No
driver-side data, no per-row Python.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TREF_K = 288.15
T0_K = 227.13
E0_WINDOW_HALF = 7
E0_STEP = 5
E0_MIN_ENTRIES = 6
E0_TEMP_RANGE = 5.0
E0_TRIM_PERC = 0.05
E0_NUM_BEST = 3
E0_MIN, E0_MAX = 30.0, 350.0
RREF_WINDOW_HALF = 3   # 7-day centered window
RREF_STEP = 4
RREF_MIN_ENTRIES = 2


def _lt_b(ta_col) -> F.Column:
    """Lloyd-Taylor exponent factor b: R = Rref * exp(E0 * b)."""
    ta_k = ta_col + 273.15
    return F.lit(1.0 / (TREF_K - T0_K)) - 1.0 / (ta_k - F.lit(T0_K))


def _linfit_aggs(x, y):
    """Sufficient statistics for a simple linear regression of y on x."""
    return [
        F.count(F.lit(1)).cast("double").alias("_n"),
        F.sum(x).alias("_sx"), F.sum(y).alias("_sy"),
        F.sum(x * y).alias("_sxy"), F.sum(x * x).alias("_sxx"),
        F.sum(y * y).alias("_syy"),
    ]


def _slope_icept():
    n, sx, sy = F.col("_n"), F.col("_sx"), F.col("_sy")
    sxx_c = F.col("_sxx") - sx * sx / n
    sxy_c = F.col("_sxy") - sx * sy / n
    slope = sxy_c / F.nullif(sxx_c, F.lit(0.0))
    icept = (sy - slope * sx) / n
    # sd(slope) = sqrt(RSS / (n-2) / Sxx_c)
    syy_c = F.col("_syy") - sy * sy / n
    rss = syy_c - slope * sxy_c
    sd = F.sqrt(F.greatest(rss, F.lit(0.0)) / F.nullif(n - 2, F.lit(0.0))
                / F.nullif(sxx_c, F.lit(0.0)))
    return slope, icept, sd


def estimate_e0(
    df: DataFrame, key_cols: list[str], ts_col: str,
    nee_col: str, ta_col: str, night_col: str,
) -> DataFrame:
    """One E0 (K) per key (fRegrE0fromShortTerm analogue). Returns
    (key..., e0, n_windows); e0 NULL when fewer than three windows qualify."""
    # ONE canonical day origin for the whole partitioning pipeline: the
    # first NIGHT-VALID date (night flag + nee/ta present). The log-space
    # fit additionally needs nee > 0, but that must not shift the window
    # grid (the Rref stage shares this origin and has no positivity filter)
    nightv = df.filter(
        (F.col(night_col) == 1) & F.col(nee_col).isNotNull()
        & F.col(ta_col).isNotNull()
    )
    kw = Window.partitionBy(*key_cols)
    day = F.datediff(F.col(ts_col), F.min(F.to_date(ts_col)).over(kw)) + 1
    night = nightv.withColumn("_day", day).filter(F.col(nee_col) > 0)
    # centered 15-day windows, 5-day mid steps: record day D is covered by
    # window k when |mid_k - D| <= half, mid_k = (half+1) + k*step
    half, step = E0_WINDOW_HALF, E0_STEP
    k_lo = F.ceil((F.col("_day") - half - (half + 1)) / step).cast("int")
    k_hi = F.floor((F.col("_day") + half - (half + 1)) / step).cast("int")
    exploded = night.withColumn(
        "_win", F.explode(F.sequence(F.greatest(k_lo, F.lit(0)), k_hi))
    ).withColumn("_b", _lt_b(F.col(ta_col))) \
     .withColumn("_y", F.log(F.col(nee_col)))

    gcols = [*key_cols, "_win"]
    pass_a = exploded.groupBy(*gcols).agg(
        *_linfit_aggs(F.col("_b"), F.col("_y")),
        (F.max(ta_col) - F.min(ta_col)).alias("_trange"),
    )
    s0, i0, _ = _slope_icept()
    pass_a = pass_a.filter(
        (F.col("_n") > E0_MIN_ENTRIES) & (F.col("_trange") >= E0_TEMP_RANGE)
    ).select(*gcols, s0.alias("_e0_0"), i0.alias("_i0"))

    # trim the 5/95 residual tails per window, refit
    with_fit = exploded.join(pass_a, gcols)
    resid = F.col("_y") - (F.col("_i0") + F.col("_e0_0") * F.col("_b"))
    with_fit = with_fit.withColumn("_r", resid)
    qs = with_fit.groupBy(*gcols).agg(
        F.percentile("_r", F.lit(E0_TRIM_PERC)).alias("_rlo"),
        F.percentile("_r", F.lit(1.0 - E0_TRIM_PERC)).alias("_rhi"),
    )
    trimmed = with_fit.join(qs, gcols).filter(
        F.col("_r").between(F.col("_rlo"), F.col("_rhi")))
    pass_b = trimmed.groupBy(*gcols).agg(*_linfit_aggs(F.col("_b"), F.col("_y")))
    s1, _, sd1 = _slope_icept()
    fits = pass_b.select(*gcols, s1.alias("_e0"), sd1.alias("_sd")).filter(
        F.col("_e0").isNotNull() & F.col("_sd").isNotNull()
        & (F.col("_e0") - F.col("_sd") > E0_MIN)
        & (F.col("_e0") + F.col("_sd") < E0_MAX)
    )
    best_w = Window.partitionBy(*key_cols).orderBy("_sd", "_win")
    best = fits.withColumn("_rk", F.row_number().over(best_w)).filter(
        F.col("_rk") <= E0_NUM_BEST)
    return best.groupBy(*key_cols).agg(
        F.when(F.count(F.lit(1)) >= E0_NUM_BEST,
               F.round(F.avg("_e0"), 2)).alias("e0"),
        F.count(F.lit(1)).alias("n_windows"),
    )


def partition_nee_nighttime(
    df: DataFrame, key_cols: list[str], ts_col: str,
    nee_col: str, ta_col: str, night_col: str,
    reco_col: str = "RECO", gpp_col: str = "GPP",
) -> DataFrame:
    """Full nighttime partitioning: appends ``RECO`` and ``GPP`` (plus the
    per-record ``RREF`` anchor interpolation and the key's ``E0``); all
    NULL for keys whose E0 estimation failed (the reference aborts)."""
    e0_df = estimate_e0(df, key_cols, ts_col, nee_col, ta_col, night_col)
    work = df.join(F.broadcast(e0_df.select(*key_cols, "e0")),
                   on=key_cols, how="left")
    b = _lt_b(F.col(ta_col))
    factor = F.exp(F.col("e0") * b)
    work = work.withColumn("_f", factor)

    # Rref per centered 7-day window (4-day steps), through-origin slope of
    # nighttime NEE on the LT factor, anchored at the window's mean time.
    # Day index anchored at the night-valid minimum date — the SAME origin
    # estimate_e0 uses, so both stages share one window grid.
    half, step = RREF_WINDOW_HALF, RREF_STEP
    nt = work.filter(
        (F.col(night_col) == 1) & F.col(nee_col).isNotNull()
        & F.col(ta_col).isNotNull() & F.col("e0").isNotNull()
    )
    kw = Window.partitionBy(*key_cols)
    nt = nt.withColumn(
        "_day", F.datediff(F.col(ts_col), F.min(F.to_date(ts_col)).over(kw)) + 1)
    k_lo = F.ceil((F.col("_day") - half - (half + 1)) / step).cast("int")
    k_hi = F.floor((F.col("_day") + half - (half + 1)) / step).cast("int")
    expl = nt.withColumn(
        "_win", F.explode(F.sequence(F.greatest(k_lo, F.lit(0)), k_hi)))
    anchors = expl.groupBy(*key_cols, "_win").agg(
        (F.sum(F.col("_f") * F.col(nee_col))
         / F.nullif(F.sum(F.col("_f") * F.col("_f")), F.lit(0.0))).alias("_rref"),
        F.count(F.lit(1)).alias("_n"),
        F.timestamp_seconds(F.avg(F.unix_timestamp(ts_col))).alias("_anchor_ts"),
    ).filter((F.col("_n") > RREF_MIN_ENTRIES) & (F.col("_rref") >= 0))

    # interpolate Rref anchors to every record: attach anchors as sparse
    # rows, running last/first ignorenulls, time-weighted line between,
    # constant beyond the ends (the engine's interpolation idiom)
    marked = work.withColumn("_rref", F.lit(None).cast("double")) \
                 .withColumn("_is_anchor", F.lit(0))
    a_rows = anchors.select(
        *key_cols, F.col("_anchor_ts").alias(ts_col),
        F.col("_rref"), F.lit(1).alias("_is_anchor"))
    union = marked.select(*key_cols, ts_col, "_rref", "_is_anchor").unionByName(
        a_rows)
    ord_w = Window.partitionBy(*key_cols).orderBy(ts_col, F.desc("_is_anchor"))
    fwd = ord_w.rowsBetween(Window.unboundedPreceding, 0)
    bwd = ord_w.rowsBetween(0, Window.unboundedFollowing)
    ts_sec = F.unix_timestamp(ts_col).cast("double")
    union = (
        union.withColumn("_pv", F.last("_rref", ignorenulls=True).over(fwd))
        .withColumn("_pt", F.last(F.when(F.col("_rref").isNotNull(), ts_sec),
                                  ignorenulls=True).over(fwd))
        .withColumn("_nv", F.first("_rref", ignorenulls=True).over(bwd))
        .withColumn("_nt", F.first(F.when(F.col("_rref").isNotNull(), ts_sec),
                                   ignorenulls=True).over(bwd))
    )
    frac = (ts_sec - F.col("_pt")) / F.nullif(F.col("_nt") - F.col("_pt"),
                                              F.lit(0.0))
    interp = (
        F.when(F.col("_pv").isNotNull() & F.col("_nv").isNotNull(),
               F.col("_pv") + (F.col("_nv") - F.col("_pv")) * F.coalesce(frac, F.lit(0.0)))
        .otherwise(F.coalesce(F.col("_pv"), F.col("_nv")))
    )
    # The join back is on (key, ts): the sanitizer's keep-last contract makes
    # that unique, but a duplicate timestamp slipping through would fan rows
    # out n×n. Dedup the attach side (its interp value is identical for
    # duplicate (key, ts) rows), so the join stays shape-preserving either way.
    rref_per_record = union.filter(F.col("_is_anchor") == 0).select(
        *key_cols, ts_col, interp.alias("RREF")
    ).dropDuplicates([*key_cols, ts_col])

    out = work.join(rref_per_record, on=[*key_cols, ts_col], how="left")
    reco = F.col("RREF") * F.col("_f")
    return (
        out.withColumn(reco_col, reco)
        .withColumn(gpp_col, reco - F.col(nee_col))
        .withColumnRenamed("e0", "E0")
        .drop("_f")
    )


# --------------------------------------------------------------------------- #
# Daytime (Lasslop 2010) partitioning — simplified engine analogue
# --------------------------------------------------------------------------- #

LRC_WINSIZE_DAYS = 4
LRC_STEP_DAYS = 2
RG_NIGHT_MAX = 4.0          # ONEFlux measured-radiation day/night split (W m-2)
LRC_MIN_DAY_ENTRIES = 30
LRC_BETA_FACTORS = (0.5, 1.0, 2.0)
LRC_GUESS = (0.01, 30.0, 5.0)   # (alpha, beta, rref) start, ONEFlux FGUESS0
ALPHA_MAX = 0.22                 # ONEFlux parameter-validity bound
BETA_MAX = 250.0
VPD0_HPA = 10.0                  # Lasslop 2010 VPD limitation threshold (hPa)
# ONEFlux prior standard deviations per model (daytime_oneflux.py:96-101)
SIGM_LLOYDVPD = (10.0, 600.0, 50.0, 80.0)       # (alpha, beta, k, rref)
SIGM_LLOYD = (10.0, 600.0, 80.0)                # (alpha, beta, rref)
SIGM_LLOYD_AFIX = (600.0, 80.0)                 # (beta, rref)
SIGM_LLOYDVPD_AFIX = (600.0, 50.0, 80.0)        # (beta, k, rref)


def _lm_fit_lrc(nee, rg, tfac, x0, n_iter=50):
    """Damped Gauss-Newton (Levenberg-Marquardt) fit of the rectangular-
    hyperbola light-response curve NEE = -a*b*Rg/(a*Rg+b) + r*tfac with an
    ANALYTIC Jacobian; parameters projected positive each step. Returns
    (params, rmse) or (None, inf) when singular/diverged."""
    p = np.asarray(x0, dtype=np.float64).copy()

    def model(q):
        a, b, r = q
        den = a * rg + b
        return -a * b * rg / den + r * tfac

    def sse(q):
        d = model(q) - nee
        return float(d @ d)

    lam, best = 1e-3, sse(p)
    if not np.isfinite(best):
        return None, np.inf
    accepted = False
    for _ in range(n_iter):
        a, b, r = p
        den = a * rg + b
        J = np.column_stack([
            -(b * b) * rg / (den * den),
            -(a * a) * (rg * rg) / (den * den),
            tfac,
        ])
        res = model(p) - nee
        JtJ = J.T @ J
        g = J.T @ res
        try:
            step = np.linalg.solve(JtJ + lam * np.diag(np.diag(JtJ)), g)
        except np.linalg.LinAlgError:
            return None, np.inf
        cand = np.maximum(p - step, 1e-6)
        s = sse(cand)
        if s < best:
            p, best, lam = cand, s, max(lam / 3.0, 1e-12)
            accepted = True
            if np.max(np.abs(step) / np.maximum(np.abs(p), 1e-9)) < 1e-10:
                break
        else:
            lam *= 5.0
            if lam > 1e12:
                break
    if not accepted:
        # the data never moved the fit off the starting guess (e.g. NEE
        # uncorrelated with Rg): reject the window instead of blessing x0
        return None, np.inf
    return p, math.sqrt(best / len(nee))


def _fvpd(vpd, k):
    """Lasslop 2010 VPD limitation f(VPD) = min(exp(-k(VPD-VPD0)), 1)
    (reference daytime_oneflux.py:17-18,126-133 ``_gpp_vpd``)."""
    with np.errstate(over="ignore"):
        return np.minimum(np.exp(-k * (vpd - VPD0_HPA)), 1.0)


def _lm_fit_generic(model, jac, nee, x0, sigm, sigd=None, n_iter=60):
    """Prior-penalized damped Gauss-Newton (LM) with an analytic Jacobian.
    The ONEFlux daytime fits are UNCONSTRAINED but penalized: the residual
    vector is augmented with (par - mprior)/sigm, mprior = the starting
    guess (reference daytime_oneflux.py:286-291 ``_nlinlts2`` with the
    SIGM_* tables at :96-101). The loose priors barely perturb a
    well-conditioned fit but stop the hyperbola degenerating (beta -> inf)
    on adversarial windows; the fallback cascade still TRIGGERS on negative
    fitted values, so no positivity projection. Returns (params, data_rmse)
    or (None, inf) on a singular/diverged/never-improved fit."""
    p = np.asarray(x0, dtype=np.float64).copy()
    mprior = np.asarray(x0, dtype=np.float64).copy()
    inv_sigm = 1.0 / np.asarray(sigm, dtype=np.float64)
    # per-record data sigma (ONEFlux sigd, _nlinlts2: r = (dep - pred)/sigd);
    # None = unweighted. A tiny floor guards degenerate zero-SD pools.
    inv_sigd = (1.0 / np.maximum(np.asarray(sigd, dtype=np.float64), 1e-9)
                if sigd is not None else None)

    def objective(q):
        d = model(q) - nee
        if inv_sigd is not None:
            d = d * inv_sigd
        d = d[np.isfinite(d)]
        if d.size != len(nee):
            return np.inf, np.inf
        pres = (q - mprior) * inv_sigm
        return float(d @ d) + float(pres @ pres), float(d @ d)

    lam, (best, best_data) = 1e-3, objective(p)
    if not np.isfinite(best):
        return None, np.inf
    accepted = False
    for _ in range(n_iter):
        J = jac(p)
        res = model(p) - nee
        if inv_sigd is not None:
            J = J * inv_sigd[:, None]
            res = res * inv_sigd
        if not (np.all(np.isfinite(J)) and np.all(np.isfinite(res))):
            break
        J = np.vstack([J, np.diag(inv_sigm)])
        res = np.append(res, (p - mprior) * inv_sigm)
        JtJ = J.T @ J
        g = J.T @ res
        try:
            step = np.linalg.solve(
                JtJ + lam * np.diag(np.maximum(np.diag(JtJ), 1e-12)), g)
        except np.linalg.LinAlgError:
            return None, np.inf
        cand = p - step
        s, s_data = objective(cand)
        if s < best:
            p, best, best_data, lam = cand, s, s_data, max(lam / 3.0, 1e-12)
            accepted = True
            if np.max(np.abs(step) / np.maximum(np.abs(p), 1e-9)) < 1e-10:
                break
        else:
            lam *= 5.0
            if lam > 1e12:
                break
    if not accepted:
        return None, np.inf
    return p, math.sqrt(best_data / len(nee))


def _fit_lrc_vpd(nee, rg, tfac, vpd, x0, sigd=None):
    """4-param HLRC_LloydVPD fit: NEE = -a·B·Rg/(a·Rg+B) + r·tfac with
    B = b·f(VPD) (reference daytime_oneflux.py:141 ``_hlrc_lloydvpd``)."""
    def parts(q):
        a, b, k, r = q
        fv = _fvpd(vpd, k)
        B = b * fv
        den = a * rg + B
        return a, b, k, r, fv, B, den

    def model(q):
        a, b, k, r, fv, B, den = parts(q)
        return -a * B * rg / den + r * tfac

    def jac(q):
        a, b, k, r, fv, B, den = parts(q)
        dA = -(B * B) * rg / (den * den)
        dB = -(a * a) * (rg * rg) / (den * den)
        # df(VPD)/dk is zero where the min() clamps at 1; ON the clamp
        # boundary (e.g. the k=0 starting guess) take the k-increasing side
        # where vpd > VPD0 so the VPD term can engage at all (matches a
        # forward-difference jacobian there)
        active = (vpd > VPD0_HPA) & (fv <= 1.0)
        dfv_dk = np.where(active, -(vpd - VPD0_HPA) * fv, 0.0)
        return np.column_stack([dA, dB * fv, dB * b * dfv_dk, tfac])

    return _lm_fit_generic(model, jac, nee, x0, SIGM_LLOYDVPD, sigd)


def _fit_lrc_novpd(nee, rg, tfac, x0, sigd=None):
    """3-param HLRC_Lloyd fit (unconstrained — cascade variant of
    ``_lm_fit_lrc``; reference daytime_oneflux.py:135)."""
    def model(q):
        a, b, r = q
        return -a * b * rg / (a * rg + b) + r * tfac

    def jac(q):
        a, b, r = q
        den = a * rg + b
        return np.column_stack([
            -(b * b) * rg / (den * den),
            -(a * a) * (rg * rg) / (den * den),
            tfac,
        ])

    return _lm_fit_generic(model, jac, nee, x0, SIGM_LLOYD, sigd)


def _fit_lrc_afix(nee, rg, tfac, vpd, alpha, x0, with_vpd, sigd=None):
    """alpha-fixed variants: HLRC_Lloyd_afix (b, r) / HLRC_LloydVPD_afix
    (b, k, r) (reference daytime_oneflux.py:149,155)."""
    if with_vpd:
        def model(q):
            b, k, r = q
            B = b * _fvpd(vpd, k)
            return -alpha * B * rg / (alpha * rg + B) + r * tfac

        def jac(q):
            b, k, r = q
            fv = _fvpd(vpd, k)
            B = b * fv
            den = alpha * rg + B
            dB = -(alpha * alpha) * (rg * rg) / (den * den)
            active = (vpd > VPD0_HPA) & (fv <= 1.0)
            dfv_dk = np.where(active, -(vpd - VPD0_HPA) * fv, 0.0)
            return np.column_stack([dB * fv, dB * b * dfv_dk, tfac])
    else:
        def model(q):
            b, r = q
            return -alpha * b * rg / (alpha * rg + b) + r * tfac

        def jac(q):
            b, r = q
            den = alpha * rg + b
            return np.column_stack(
                [-(alpha * alpha) * (rg * rg) / (den * den), tfac])

    return _lm_fit_generic(model, jac, nee, x0,
                           SIGM_LLOYDVPD_AFIX if with_vpd else SIGM_LLOYD_AFIX,
                           sigd)


SIGM_LLOYDTEMP = (800.0, 1000.0)   # (rref, e0) priors, ONEFlux
E0_WINDOW_GUESS = 100.0            # FGUESS0[4]


def _fit_lloydtemp(nee, bvec, rb):
    """Per-window nighttime Lloyd-Taylor fit R = rref·exp(E0·b)
    (reference daytime_oneflux.py:436-443 ``LloydTemp``): nonlinear,
    prior-penalized, start (rb, 100). Returns (rref, e0) or None."""
    def model(q):
        r, e0 = q
        return r * np.exp(e0 * bvec)

    def jac(q):
        r, e0 = q
        e = np.exp(e0 * bvec)
        return np.column_stack([e, r * bvec * e])

    p, _rmse = _lm_fit_generic(model, jac, nee, (rb, E0_WINDOW_GUESS),
                               SIGM_LLOYDTEMP)
    return None if p is None else (float(p[0]), float(p[1]))


def _params_valid(a, b, k, r):
    """Window acceptance (reference ``_check_parameters``,
    daytime_oneflux.py:311-318): strict bounds 0 ≤ α < 0.22, 0 ≤ β < 250,
    k ≥ 0, Rref > 0, and α must have MOVED off its starting guess
    (``p[0] != FGUESS0[0]`` — a fit whose alpha never left 0.01 is
    rejected). α = β = 0 is the valid respiration-only outcome.

    Documented divergence: the reference additionally rejects β > 100 when
    β < its standard error; the hand-rolled LM here does not propagate
    parameter std-errors, so that SE rule is intentionally skipped."""
    return (0.0 <= a < ALPHA_MAX and 0.0 <= b < BETA_MAX
            and k >= 0.0 and r > 0.0 and a != LRC_GUESS[0])


def _window_beta_guess(values):
    """Beta starting guess = |p03 − p97| of the window's NEE, with the
    reference's exact order-statistic indexing (daytime_oneflux.py:323-336
    ``_percentiles_fn``: idx = int(v·n) for v ≤ 0.5 else int(v·(n+1)),
    clipped). Falls back to the fixed FGUESS0 beta when the window is
    empty or degenerate."""
    v = values[np.isfinite(values)]
    n = v.shape[0]
    if n <= 0:
        return LRC_GUESS[1]
    order = np.argsort(v)
    lo = v[order[min(int(0.03 * n), n - 1)]]
    hi = v[order[min(int(0.97 * (n + 1)), n - 1)]]
    b = abs(float(lo) - float(hi))
    return b if b > 0 else LRC_GUESS[1]


def fit_lrc_windows(nee, rg, tfac, vpd, day0, day_valid,
                    winsize_days=LRC_WINSIZE_DAYS, step_days=LRC_STEP_DAYS,
                    min_day_entries=LRC_MIN_DAY_ENTRIES, ts=None,
                    e0_ctx=None, sigd=None, night_valid=None):
    """Per-window LRC fits with the ONEFlux degenerate-parameter fallback
    cascade (reference daytime_oneflux.py:375 ``_estimate_parasets``):

    for each 4-day window (2-day step) and each of three beta starting
    guesses — fit the full VPD model (a, b, k, r); if the fitted k < 0,
    drop the VPD term and refit (a, b, r); if then alpha > 0.22 and the
    previous accepted window had alpha > 0, fix alpha from it and refit the
    remaining parameters (the VPD branch refits (b, k, r) and falls back
    again on k < 0); if alpha or beta went negative, fall back to the
    respiration-only closed-form fit. Lowest-RMSE guess wins; windows whose
    winner fails the validity bounds are dropped. ``vpd=None`` skips the
    VPD model entirely (the engine's pre-round-4 behaviour).

    ``e0_ctx=(bvec, night_valid, min_night_entries)`` switches E0 to the
    ONEFlux PER-WINDOW refit (daytime_oneflux.py:398-455 stage A): each
    window's E0 comes from a nonlinear prior-penalized Lloyd-Taylor fit on
    the surrounding ~12-day nighttime data (window i-2..i+2, clipped to
    the record ends), with the ONEFlux fallback chain — too few nighttime
    rows (<= min_night_entries) or E0 outside [50, 400] falls back to the
    previous accepted window's E0 (bound-clamped when there is none).
    ``tfac`` is ignored in that mode (recomputed per window from bvec).

    Starting guesses follow the reference per window
    (daytime_oneflux.py:430-434): beta0 = |p03 − p97| of the window's NEE
    (times the three BETAFAC multipliers) and rref0 = the surrounding
    ~12-day nighttime NEE mean; ``night_valid`` supplies the nighttime mask
    for the rref guess (taken from ``e0_ctx`` when present). The LM prior is
    centred on these guesses exactly as the reference centres mprior on
    fguess. Only when no nighttime mask is available at all does rref0 fall
    back to the fixed FGUESS0 value — the one documented guess divergence.

    Returns (P, centers, models, e0s): P rows = (alpha, beta, k, rref);
    models = 0 full VPD, 1 no-VPD, 2 alpha-fixed no-VPD, 3 alpha-fixed
    VPD, 4 respiration-only; e0s = the E0 used by each accepted window.
    Pure numpy — unit-testable without Spark."""
    params, centers, models, e0s = [], [], [], []
    if ts is None:
        ts = day0.astype(np.float64)
    max_day = int(day0.max())
    n_windows = max_day // step_days + 1
    if e0_ctx is not None:
        bvec, night_e0, min_night = e0_ctx
        if night_valid is None:
            night_valid = night_e0

    def resp_only(nee_w, tfac_w, sigd_w):
        wgt = (1.0 / np.maximum(sigd_w, 1e-9) ** 2
               if sigd_w is not None else np.ones_like(tfac_w))
        den = float((tfac_w * tfac_w * wgt).sum())
        if den <= 0:
            return None
        return float((tfac_w * nee_w * wgt).sum()) / den

    for wi, start in enumerate(range(0, int(day0.max()) + 1, step_days)):
        m = day_valid & (day0 >= start) & (day0 < start + winsize_days)
        if m.sum() < min_day_entries:
            continue
        # ~12-day surrounding nighttime window (i-2 .. i+2, clipped to the
        # record ends; the reference's day_end2 clip is INCLUSIVE of the
        # final day — max(julday) with julday <= day_end2 — hence max_day+1)
        nb = 0 if wi <= 1 else (wi - 2) * step_days
        ne = (max_day + 1 if wi >= n_windows - 2
              else (wi + 2) * step_days + winsize_days)
        nmask = (night_valid & (day0 >= nb) & (day0 < ne)
                 if night_valid is not None else None)
        # per-window starting guesses (reference daytime_oneflux.py:430-434)
        allm = m | (night_valid & (day0 >= start)
                    & (day0 < start + winsize_days)) \
            if night_valid is not None else m
        beta_base = _window_beta_guess(nee[allm])
        rref0 = (float(nee[nmask].mean())
                 if nmask is not None and nmask.sum() > 0 else LRC_GUESS[2])
        if e0_ctx is not None:
            e0_w = None
            if nmask.sum() > min_night:
                rb = rref0
                fit = _fit_lloydtemp(nee[nmask], bvec[nmask], rb)
                if fit is not None and 50.0 <= fit[1] <= 400.0:
                    e0_w = fit[1]
                elif fit is not None:
                    # out-of-bounds: previous accepted window, else clamp
                    e0_w = (e0s[-1] if e0s
                            else min(max(fit[1], 50.0), 400.0))
            if e0_w is None:
                if not e0s:
                    continue  # no nighttime signal yet: window dropped
                e0_w = e0s[-1]
            tfac = np.exp(e0_w * bvec)
        nee_w, rg_w, tfac_w = nee[m], rg[m], tfac[m]
        vpd_w = vpd[m] if vpd is not None else None
        sigd_w = None
        if sigd is not None:
            sigd_w = np.asarray(sigd, dtype=np.float64)[m].copy()
            # ONEFlux rule (daytime_oneflux.py:414-417): any undefined
            # sigma in the window -> ALL weights 1 for that window
            if not np.all(np.isfinite(sigd_w)):
                sigd_w = None
        prev_alpha = params[-1][0] if params else None
        best = None  # (rmse, (a, b, k, r), model)
        for f in LRC_BETA_FACTORS:
            beta0 = beta_base * f
            a = b = k = r = None
            wm = None
            if vpd_w is not None:
                p4, rmse = _fit_lrc_vpd(
                    nee_w, rg_w, tfac_w, vpd_w,
                    (LRC_GUESS[0], beta0, 0.0, rref0), sigd=sigd_w)
                if p4 is not None:
                    a, b, k, r = p4
                    wm = 0
                    if k < 0:  # VPD made it worse: drop the term
                        p4 = None
                if p4 is None:
                    p3, rmse = _fit_lrc_novpd(
                        nee_w, rg_w, tfac_w, (LRC_GUESS[0], beta0, rref0),
                        sigd=sigd_w)
                    if p3 is None:
                        continue
                    a, b, r = p3
                    k, wm = 0.0, 1
            else:
                p3, rmse = _fit_lrc_novpd(
                    nee_w, rg_w, tfac_w, (LRC_GUESS[0], beta0, rref0),
                    sigd=sigd_w)
                if p3 is None:
                    continue
                a, b, r = p3
                k, wm = 0.0, 1
            # alpha ran away: pin it to the previous window's accepted value
            if a > ALPHA_MAX and prev_alpha is not None and prev_alpha > 0:
                if vpd_w is not None and wm == 0:
                    pf, rmse = _fit_lrc_afix(
                        nee_w, rg_w, tfac_w, vpd_w, prev_alpha,
                        (beta0, 0.0, rref0), with_vpd=True,
                        sigd=sigd_w)
                    if pf is not None and pf[1] >= 0:
                        b, k, r = pf
                        a, wm = prev_alpha, 3
                    else:  # k went negative again: alpha-fixed, no VPD
                        pf, rmse = _fit_lrc_afix(
                            nee_w, rg_w, tfac_w, None, prev_alpha,
                            (beta0, rref0), with_vpd=False,
                            sigd=sigd_w)
                        if pf is None:
                            continue
                        b, r = pf
                        a, k, wm = prev_alpha, 0.0, 2
                else:
                    pf, rmse = _fit_lrc_afix(
                        nee_w, rg_w, tfac_w, None, prev_alpha,
                        (beta0, rref0), with_vpd=False, sigd=sigd_w)
                    if pf is None:
                        continue
                    b, r = pf
                    a, k, wm = prev_alpha, 0.0, 2
            # light response collapsed: respiration-only window
            if a < 0 or b < 0:
                r0 = resp_only(nee_w, tfac_w, sigd_w)
                if r0 is None:
                    continue
                a, b, k, r, wm = 0.0, 0.0, 0.0, r0, 4
                d = r * tfac_w - nee_w
                rmse = math.sqrt(float(d @ d) / len(nee_w))
            if not _params_valid(a, b, k, r):
                continue
            if best is None or rmse < best[0]:
                best = (rmse, (float(a), float(b), float(k), float(r)), wm)
        if best is None:
            continue
        params.append(best[1])
        centers.append(float(ts[m].mean()))
        models.append(best[2])
        e0s.append(float(e0_w) if e0_ctx is not None else np.nan)
    return (np.asarray(params, dtype=np.float64).reshape(-1, 4),
            np.asarray(centers, dtype=np.float64),
            np.asarray(models, dtype=np.int64),
            np.asarray(e0s, dtype=np.float64))


def partition_nee_daytime(
    df, key_cols: list[str], ts_col: str,
    nee_col: str, ta_col: str, rg_col: str,
    vpd_col: str | None = None,
    winsize_days: int = LRC_WINSIZE_DAYS, step_days: int = LRC_STEP_DAYS,
    min_day_entries: int = LRC_MIN_DAY_ENTRIES,
    e0_mode: str = "global",
    weighted: bool = False,
    reco_col: str = "RECO_DT", gpp_col: str = "GPP_DT",
):
    """Daytime flux partitioning — the Lasslop et al. (2010) / ONEFlux
    light-response-curve method (reference
    /root/reference/diive/flux/partitioning/daytime_oneflux.py). Structure
    mirrored:

    - day/night split by MEASURED radiation (Rg > 4 W m-2), not geometry;
    - per 4-day window (2-day steps): fit NEE = -a·B·Rg/(a·Rg+B) +
      Rref·LT(Ta) with B = beta·f(VPD), f(VPD) = min(exp(-k(VPD-VPD0)), 1)
      (daytime_oneflux.py:17-18,141) on the window's daytime rows with E0
      held fixed, three beta starting guesses, lowest-RMSE fit wins, and the
      ONEFlux degenerate-parameter fallback cascade (k<0 → drop the VPD
      term; alpha>0.22 → fix alpha from the previous window; alpha/beta<0 →
      respiration-only) — see :func:`fit_lrc_windows`. ``vpd_col=None``
      omits the VPD model (correct on VPD-quiet data).
    - per record, RECO and the MODEL GPP (with the record's own f(VPD)) are
      evaluated under the two neighbouring valid windows' parameter sets
      and combined with linear distance weights (constant beyond the
      first/last window) — the reference's compute_flux two-window scheme.

    ``e0_mode``: ``'global'`` (default — ONE nighttime E0 per key,
    closed-form log-space fit, SQL-replayable; the driver gate runs this)
    or ``'per_window'`` — the ONEFlux per-window E0 refit
    (daytime_oneflux.py:398-455): each window's E0 from a nonlinear
    prior-penalized Lloyd-Taylor fit on the surrounding ~12-day nighttime
    data with the previous-window / bound-clamp fallback chain, and RECO
    evaluated under each window's own E0 in the two-window interpolation.

    ``weighted=True`` reproduces the ONEFlux sigma weighting: per-record
    NEE uncertainty from the MDS cascade in its uncertainty mode
    (operators/mds.py fill_all, min_samples=10 — the engine's
    _uncert_via_gapfill analogue, daytime_oneflux.py:344) divides the fit
    residuals; windows containing any undefined sigma fall back to unit
    weights (the reference's rule). Requires ``vpd_col``.

    Remaining documented simplification vs the ONEFlux port: the LM is
    hand-rolled (not scipy leastsq) and the MDS sigma runs in float64
    (the reference keeps ONEFlux's float32 boundary behaviour).

    Execution: one grouped map per key (windows are bounded slices of a
    per-key series; the LM solves are <=4x4). Appends RECO_DT, GPP_DT and
    the key's E0_DT; all NULL when E0 or every window fit fails."""
    from pyspark.sql.types import DoubleType, StructField, StructType

    sel = [
        *key_cols,
        F.col(ts_col).alias("_ts"),
        F.col(nee_col).cast("double").alias("_nee"),
        F.col(ta_col).cast("double").alias("_ta"),
        F.col(rg_col).cast("double").alias("_rg"),
    ]
    if vpd_col is not None:
        sel.append(F.col(vpd_col).cast("double").alias("_vpd"))
    # lazy-checkpoint the caller's frame so the kernel's input projection
    # and the (key, ts) join-back share ONE materialization — the join side
    # otherwise re-executes df's whole upstream (r8 plan audit: a second
    # raw scan + aggregate per call). Lowres 30-min flux tier by contract:
    # tier-sized, safe to pin.
    df = df.localCheckpoint(eager=False)
    work = df.select(*sel)
    key_fields = [f for f in work.schema.fields if f.name in key_cols]
    schema = StructType(key_fields + [
        StructField("_ts", work.schema["_ts"].dataType),
        StructField(reco_col, DoubleType()),
        StructField(gpp_col, DoubleType()),
        StructField("E0_DT", DoubleType()),
    ])
    import pandas as pd

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_ts").reset_index(drop=True)
        n = len(pdf)
        ts = pdf["_ts"].to_numpy(dtype="datetime64[ns]").astype(np.int64) / 1e9
        nee = pdf["_nee"].to_numpy(float)
        ta = pdf["_ta"].to_numpy(float)
        rg = pdf["_rg"].to_numpy(float)
        vpd = pdf["_vpd"].to_numpy(float) if vpd_col is not None else None
        out = pdf[[f.name for f in key_fields] + ["_ts"]].copy()
        nanv = np.full(n, np.nan)

        # one nighttime E0 per key (log-space Lloyd-Taylor, see estimate_e0)
        night = (np.isfinite(nee) & np.isfinite(ta) & np.isfinite(rg)
                 & (rg <= RG_NIGHT_MAX) & (nee > 0))
        bvec = 1.0 / (TREF_K - T0_K) - 1.0 / (ta + 273.15 - T0_K)
        e0 = np.nan
        if e0_mode != "per_window" and night.sum() >= 24:
            # closed-form simple regression (not lstsq/SVD): the exact same
            # sum formula a SQL oracle computes, so the driver gate can
            # replay the E0 fit value-for-value
            x, yv = bvec[night], np.log(nee[night])
            nn = float(len(x))
            sx, sy = float(x.sum()), float(yv.sum())
            sxy, sxx = float((x * yv).sum()), float((x * x).sum())
            denom = nn * sxx - sx * sx
            if denom != 0.0:
                slope = (nn * sxy - sx * sy) / denom
                if np.isfinite(slope) and 50.0 <= slope <= 400.0:
                    e0 = float(slope)
        if e0_mode != "per_window" and not np.isfinite(e0):
            out[reco_col], out[gpp_col], out["E0_DT"] = nanv, nanv, nanv
            return out

        tfac_all = np.exp(e0 * bvec) if e0_mode != "per_window" else None
        day_valid = (np.isfinite(nee) & np.isfinite(ta) & np.isfinite(rg)
                     & (rg > RG_NIGHT_MAX))
        if vpd is not None:
            day_valid &= np.isfinite(vpd)
        day0 = np.floor((ts - ts[0]) / 86400.0).astype(np.int64)
        e0_ctx = ((bvec, night, 10) if e0_mode == "per_window" else None)
        sigd = None
        if weighted:
            if vpd is None:
                raise ValueError("weighted fits need vpd_col (MDS drivers)")
            from diive_spark.operators.mds import mds_cascade_arrays
            dt = np.median(np.diff(ts)) if n > 1 else 1800.0
            nperday = max(int(round(86400.0 / dt)), 1)
            hr_arr = (pdf["_ts"].dt.hour.to_numpy()
                      + pdf["_ts"].dt.minute.to_numpy() / 60.0)
            unc = mds_cascade_arrays(nee, rg, ta, vpd, hr_arr, nperday,
                                     min_samples=10, fill_all=True)
            sigd = unc["sd"]
        P, C, _models, E0s = fit_lrc_windows(
            nee, rg, tfac_all, vpd, day0, day_valid,
            winsize_days=winsize_days, step_days=step_days,
            min_day_entries=min_day_entries, ts=ts, e0_ctx=e0_ctx,
            sigd=sigd, night_valid=night)
        if len(P) == 0:
            out[reco_col], out[gpp_col], out["E0_DT"] = nanv, nanv, nanv
            return out

        def flux_under(pi):
            a, b, k, r = P[pi]
            tf = (np.exp(E0s[pi] * bvec) if e0_mode == "per_window"
                  else tfac_all)
            reco = r * tf
            beff = b * _fvpd(vpd, k) if vpd is not None else np.full(n, b)
            num = a * beff * rg
            den = a * rg + beff
            gpp = np.where((rg > 0) & (den != 0), num / np.where(den != 0, den, 1.0), 0.0)
            return reco, gpp

        # two-neighbour distance weighting (compute_flux scheme), constant
        # beyond the first/last window centre
        idx = np.searchsorted(C, ts)
        left = np.clip(idx - 1, 0, len(C) - 1)
        right = np.clip(idx, 0, len(C) - 1)
        span = C[right] - C[left]
        wgt = np.where(span > 0, (ts - C[left]) / np.where(span > 0, span, 1.0), 0.0)
        wgt = np.clip(wgt, 0.0, 1.0)
        reco = np.zeros(n)
        gpp = np.zeros(n)
        for pi in range(len(C)):  # bounded: one vector op per window
            rme, gme = flux_under(pi)
            lw = (left == pi)
            rw = (right == pi)
            reco += np.where(lw, (1 - wgt) * rme, 0.0) + np.where(rw, wgt * rme, 0.0)
            gpp += np.where(lw, (1 - wgt) * gme, 0.0) + np.where(rw, wgt * gme, 0.0)
        bad = ~np.isfinite(ta) | ~np.isfinite(rg)
        reco[bad] = np.nan
        gpp[bad] = np.nan
        out[reco_col] = reco
        out[gpp_col] = gpp
        if e0_mode == "per_window":
            e0_rec = np.zeros(n)
            for pi in range(len(C)):
                lw, rw = (left == pi), (right == pi)
                e0_rec += np.where(lw, (1 - wgt) * E0s[pi], 0.0) \
                    + np.where(rw, wgt * E0s[pi], 0.0)
            out["E0_DT"] = e0_rec
        else:
            out["E0_DT"] = e0
        return out

    parts = work.groupBy(*key_cols).applyInPandas(
        lambda _, pdf: kernel(pdf), schema=schema)
    # dedup before the (key, ts) join back: duplicate timestamps (outside the
    # sanitizer's keep-last contract) would otherwise fan out n×n
    parts = parts.withColumnRenamed("_ts", ts_col) \
                 .dropDuplicates([*key_cols, ts_col])
    return df.join(parts, on=[*key_cols, ts_col], how="left")
