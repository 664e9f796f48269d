"""REddyProc daytime partitioning NEE → GPP + RECO (Lasslop et al. 2010).

Reference: /root/reference/diive/flux/partitioning/daytime_reddyproc.py
(itself a numpy port of REddyProc's ``partitionNEEGL`` /
``PartitioningLasslop10.R``). This is the fourth and last member of the
partitioning family (nighttime REddyProc + ONEFlux, daytime ONEFlux are
already in-engine); emits ``*_DT_RP`` columns. Algorithm structure
mirrored (daytime_reddyproc.py:696-783):

1. day/night split: night = Rg ≤ 4 AND potential radiation ≤ 0 (REddyProc
   ``fCalcPotRadiation`` solar-time formulation, :115-163);
2. nighttime E0 per 12-day window on the 4-day/2-day reference grid
   (Lloyd-Taylor in Kelvin, Tref = window median temperature, sequential
   previous-window start, bounds [50, 400]); failed windows retried at 24
   then 48 days; ≥5 finite windows (or 10 %) required;
3. Gaussian-process smoothing of E0 across each year's windows (mlegp
   semantics: Gaussian correlation, profiled constant mean and variance,
   ML over (log β, log nugget-scale) from a 3×3 multistart; constant-E0
   shortcut when CV < 1 %), then per-window RRef by through-origin
   regression with E0 fixed, forward-filled;
4. light-response fit per 4-day window: θ = (k, β, α, RRef, E0) with the
   Lasslop priors and NEE-uncertainty weighting (σ floored at its 30 %
   quantile), three β starting points, and the REddyProc bounds cascade
   (no VPD>VPD0 data or k<0 → fix k=0; α>0.22 → take the previous
   window's α; reject α/β/RRef<0 or β≥250; reject β>100 with SE(β)≥β);
5. RECO/GPP per record by the REddyProc two-neighbour association
   weights over the windows' mean-valid-record anchors.

Engine numerics (deliberately NOT ports of R's internals): both the
nighttime E0 fit and the LRC penalized least squares run on
:func:`diive_spark.operators.oneflux_nt.leastsq_lm` (the cost is a
residual vector [(NEP−flux)/σ, (θ−prior)/σ_prior] — exactly LM-shaped),
and the GP hyperparameters on :func:`nelder_mead`. The reference reaches
its optima through R-port Gauss-Newton/BFGS; optima agree to the
tolerances its own docstring states for cross-implementation runs, and
the deterministic stages (masks, grids, association weights, RRef
regression, interpolation) agree exactly — both verified by EXECUTING
the reference in the parity tests.

Spark shape: one Arrow kernel per key (windows are whole-series; years
only matter inside the GP smoother) — parallel across site keys; a year
of half-hourly data is ~17.5k records and ~180 bounded solves.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from diive_spark.operators.oneflux_nt import leastsq_lm

TREF_K = 273.15 + 15.0
T0_K = 227.13
VPD0 = 10.0
DAY_MAX_SW_IN = 4.0
SOLAR_CONST = 1366.1  # fCalcExtRadiation total solar irradiance
WIN_REF_DAYS = 4
STRIDE_DAYS = 2
WIN_NIGHT_DAYS = 12
WIN_EXTEND = (24, 48)
MIN_NREC = 10
E0_MIN, E0_MAX = 50.0, 400.0
LASSLOP_SDPRIOR = np.array([50.0, 600.0, 10.0, 80.0, np.nan])
SD_MINSD, SD_PERC = 0.7, 0.2

OUT_COLS = ("RECO_DT_RP", "GPP_DT_RP", "K_DT_RP", "BETA_DT_RP",
            "ALPHA_DT_RP", "RREF_DT_RP", "E0_DT_RP")


def potrad_reddyproc(doy, hour, lat, lon, utc_offset):
    """REddyProc ``fCalcPotRadiation`` (solartime/Cescatti geometry +
    Lanini eccentricity), W m-2, zero at/below the horizon."""
    fy = 2.0 * np.pi * (doy - 1.0) / 365.24
    eq_time = (0.0072 * np.cos(fy) - 0.0528 * np.cos(2 * fy)
               - 0.0012 * np.cos(3 * fy) - 0.1229 * np.sin(fy)
               - 0.1565 * np.sin(2 * fy) - 0.0041 * np.sin(3 * fy))
    solar_hour = hour + lon / 15.0 - utc_offset + eq_time
    h = (solar_hour - 12.0) * np.pi / 12.0
    h = np.where(h < -np.pi, h + 2 * np.pi, h)
    decl = ((0.33281 - 22.984 * np.cos(fy) - 0.3499 * np.cos(2 * fy)
             - 0.1398 * np.cos(3 * fy) + 3.7872 * np.sin(fy)
             + 0.03205 * np.sin(2 * fy) + 0.07187 * np.sin(3 * fy))
            * np.pi / 180.0)
    lat_r = lat * np.pi / 180.0
    elev = np.arcsin(np.sin(decl) * np.sin(lat_r)
                     + np.cos(decl) * np.cos(lat_r) * np.cos(h))
    ext = SOLAR_CONST * (1.00011 + 0.034221 * np.cos(fy)
                         + 0.00128 * np.sin(fy)
                         + 0.000719 * np.cos(2 * fy)
                         + 0.000077 * np.sin(2 * fy))
    return np.where(elev <= 0.0, 0.0, ext * np.sin(elev))


def nelder_mead(fn, x0, xatol=1e-8, fatol=1e-8, maxiter=2000):
    """Standard Nelder-Mead simplex (Gao-Han adaptive coefficients off;
    the classic 1/2/0.5/0.5 scheme scipy defaults to). Returns
    (x_best, f_best). scipy-free; also serves as the ``scipy.optimize
    .minimize(method='Nelder-Mead')`` stand-in for reference execution."""
    x0 = np.asarray(x0, float)
    n = x0.size
    sim = [x0]
    for i in range(n):
        p = x0.copy()
        p[i] = p[i] + 0.05 if p[i] != 0 else 0.00025
        sim.append(p)
    sim = np.array(sim)
    fs = np.array([fn(p) for p in sim])
    for _ in range(maxiter):
        order = np.argsort(fs)
        sim, fs = sim[order], fs[order]
        if (np.max(np.abs(sim[1:] - sim[0])) <= xatol
                and np.max(np.abs(fs[1:] - fs[0])) <= fatol):
            break
        centroid = sim[:-1].mean(axis=0)
        xr = centroid + (centroid - sim[-1])
        fr = fn(xr)
        if fr < fs[0]:
            xe = centroid + 2.0 * (centroid - sim[-1])
            fe = fn(xe)
            if fe < fr:
                sim[-1], fs[-1] = xe, fe
            else:
                sim[-1], fs[-1] = xr, fr
        elif fr < fs[-2]:
            sim[-1], fs[-1] = xr, fr
        else:
            xc = centroid + 0.5 * (sim[-1] - centroid)
            fc = fn(xc)
            if fc < fs[-1]:
                sim[-1], fs[-1] = xc, fc
            else:
                sim[1:] = sim[0] + 0.5 * (sim[1:] - sim[0])
                fs[1:] = np.array([fn(p) for p in sim[1:]])
    order = np.argsort(fs)
    return sim[order][0], float(fs[order][0])


def window_grid(n, dts):
    """Reference-window centers (REddyProc applyWindows: 4-day windows on
    a 2-day stride; 1-based central record indices)."""
    n_day = int(np.ceil(n / dts))
    start_days = np.arange(1, n_day - WIN_REF_DAYS / 2 + 1e-9,
                           STRIDE_DAYS).astype(int)
    i_central = 1 + ((start_days - 1) + WIN_REF_DAYS // 2) * dts
    return start_days, i_central


def window_records(i_central, win_days, dts, n):
    half = win_days / 2 * dts
    lo = np.maximum(1, (i_central - half).astype(int))
    hi = np.minimum(n, (i_central - 1 + half).astype(int))
    return lo, hi


def is_valid_night(nee_w, temp_w, isnight_w):
    """Night-valid mask; freezing (≤ −1 °C) records are dropped when ≥12
    non-freezing remain (REddyProc isFilterMeteoQualityFlag path)."""
    v = isnight_w & ~np.isnan(nee_w) & np.isfinite(temp_w)
    warm_enough = temp_w > -1
    if int((v & warm_enough).sum()) >= 12:
        v &= warm_enough
    return v


def _fit_e0_window_lm(reco, temp_k, prev_e0, tref_k):
    """Lloyd-Taylor (RRef, E0) via the engine LM; same gates as the
    reference's nls wrapper (bounds [50, 400] → NaN)."""
    b = 1.0 / (tref_k - T0_K) - 1.0 / (temp_k - T0_K)
    start = np.array([float(np.nanmean(reco)),
                      prev_e0 if np.isfinite(prev_e0) else 100.0])

    def resid(p):
        with np.errstate(over="ignore", invalid="ignore"):
            return reco - p[0] * np.exp(p[1] * b)

    pars, cov, info, _m, ier = leastsq_lm(resid, start, maxfev=400)
    if ier != 1 or cov is None:
        return np.nan, np.nan, np.nan
    rref, e0 = float(pars[0]), float(pars[1])
    r = info["fvec"]
    s2 = float(r @ r) / max(len(reco) - 2, 1)
    sd_e0 = float(np.sqrt(abs(cov[1, 1] * s2)))
    if not np.isfinite(e0) or e0 < E0_MIN or e0 > E0_MAX:
        return np.nan, np.nan, np.nan
    return e0, sd_e0, rref


def nighttime_pass(nee, temp, is_night, i_central, win_days, dts, n):
    lo_a, hi_a = window_records(i_central, win_days, dts, n)
    nw = i_central.size
    e0 = np.full(nw, np.nan)
    sde0 = np.full(nw, np.nan)
    prev_e0 = np.nan
    for w in range(nw):
        sl = slice(lo_a[w] - 1, hi_a[w])
        v = is_valid_night(nee[sl], temp[sl], is_night[sl])
        if v.sum() < MIN_NREC:
            prev_e0 = np.nan
            continue
        reco = nee[sl][v]
        temp_k = temp[sl][v] + 273.15
        tref_k = float(np.median(temp[sl][v])) + 273.15
        e0[w], sde0[w], _ = _fit_e0_window_lm(reco, temp_k, prev_e0, tref_k)
        prev_e0 = e0[w]
    return e0, sde0


def gp_smooth(x, z, nug):
    """mlegp-semantics GP: Gaussian correlation exp(−β·d²) + scaled
    per-point nugget, constant GLS mean and profiled σ², ML over
    (log β, log nugget-scale) from a 3×3 multistart. Cholesky-based.
    Returns (predict(xnew) → (fit, se), nugget_vec)."""
    x = np.asarray(x, float)
    z = np.asarray(z, float)
    nug = np.asarray(nug, float)
    npts = x.size
    d2 = (x[:, None] - x[None, :]) ** 2

    def neg_ll(v):
        beta, nscale = np.exp(v[0]), np.exp(v[1])
        a = np.exp(-beta * d2) + np.diag(nscale * nug)
        try:
            chol = np.linalg.cholesky(a)
        except np.linalg.LinAlgError:
            return 1e300
        ai_z = np.linalg.solve(chol.T, np.linalg.solve(chol, z))
        ai_1 = np.linalg.solve(chol.T, np.linalg.solve(chol, np.ones(npts)))
        mu = float(ai_z.sum() / ai_1.sum())
        r = z - mu
        ai_r = np.linalg.solve(chol.T, np.linalg.solve(chol, r))
        sig2 = float(r @ ai_r) / npts
        if not np.isfinite(sig2) or sig2 <= 0:
            return 1e300
        logdet = npts * np.log(sig2) + 2 * np.log(np.diag(chol)).sum()
        return 0.5 * (npts * np.log(2 * np.pi) + logdet
                      + float(r @ ai_r) / sig2)

    xr = max(x.max() - x.min(), 1e-9)
    best = None
    for f0 in (0.1, 1.0, 10.0):
        for s0 in (0.1, 1.0, 10.0):
            xb, fb = nelder_mead(neg_ll, [np.log(f0 / xr ** 2), np.log(s0)])
            if best is None or fb < best[1]:
                best = (xb, fb)
    beta, nscale = np.exp(best[0][0]), np.exp(best[0][1])
    k = np.exp(-beta * d2)
    nugget_vec = nscale * nug
    a = k + np.diag(nugget_vec)
    ai = np.linalg.inv(a)
    mu = float((ai @ z).sum() / (ai @ np.ones(npts)).sum())
    zc = z - mu
    sig2 = float(zc @ (ai @ zc)) / npts
    vinv = np.linalg.inv(sig2 * (k + np.diag(nugget_vec)))

    def predict(xnew):
        xnew = np.atleast_1d(np.asarray(xnew, float))
        rr = np.exp(-beta * (xnew[:, None] - x[None, :]) ** 2)
        fit = mu + sig2 * (rr @ (vinv @ zc))
        var = sig2 - sig2 ** 2 * np.einsum("ij,jk,ik->i", rr, vinv, rr)
        return fit, np.sqrt(np.clip(var, 0, None))

    return predict, nugget_vec


def smooth_tempsens(e0fit, sde0fit, i_central, start_days):
    """Per-year GP smoothing of the window E0 series (REddyProc
    partGLSmoothTempSens): duplicated consecutive E0 treated as missing,
    CV < 1 % shortcut, missing windows predicted with the 90 %-quantile
    nugget; years with no fit take the global mean/1.5× q90 SD."""
    e0 = e0fit.astype(float).copy()
    e0[np.concatenate([[False], np.diff(e0) == 0])] = np.nan
    sde0 = sde0fit.astype(float)
    year = np.ceil(start_days / 365).astype(int)
    out_e0, out_sd = (np.full(e0.size, np.nan) for _ in range(2))
    for yr in np.unique(year):
        ym = year == yr
        fin = ym & np.isfinite(e0)
        if not fin.any():
            continue
        ef, sf, xf = e0[fin], sde0[fin], i_central[fin].astype(float)
        if np.std(ef, ddof=1) / np.mean(ef) < 0.01:
            out_e0[ym] = np.mean(ef)
            out_sd[ym] = np.max(sf)
            continue
        predict, nugget = gp_smooth(xf, ef, sf ** 2)
        fit, se = predict(i_central[ym].astype(float))
        # windows without their own fit take the 90 %-quantile nugget
        nug_all = np.repeat(np.quantile(nugget, 0.9), int(ym.sum()))
        nug_all[np.isfinite(e0[ym])] = nugget
        out_e0[ym] = fit
        out_sd[ym] = se + np.sqrt(nug_all)
    still = ~np.isfinite(out_e0)
    if still.any() and not still.all():
        out_e0 = np.where(still, out_e0[~still].mean(), out_e0)
        out_sd = np.where(still, 1.5 * np.quantile(out_sd[~still], 0.9),
                          out_sd)
    return out_e0, out_sd


def rref_windows(nee, temp, is_night, e0_smooth, i_central, dts, n):
    """Per-window RRef with E0 fixed: through-origin regression on the
    Lloyd-Taylor factor, clamped ≥ 0, forward-filled (first value padded
    backwards)."""
    lo_a, hi_a = window_records(i_central, WIN_NIGHT_DAYS, dts, n)
    nw = i_central.size
    rref = np.full(nw, np.nan)
    for w in range(nw):
        sl = slice(lo_a[w] - 1, hi_a[w])
        v = is_valid_night(nee[sl], temp[sl], is_night[sl])
        if v.sum() < MIN_NREC:
            continue
        reco = nee[sl][v]
        if reco.size >= 3:
            tk = temp[sl][v] + 273.15
            tfac = np.exp(e0_smooth[w] * (1.0 / (TREF_K - T0_K)
                                          - 1.0 / (tk - T0_K)))
            rref[w] = max(0.0, float(tfac @ reco) / float(tfac @ tfac))
    # forward fill (first value padded backwards): vectorized locf
    fin = np.isfinite(rref)
    if fin.any():
        src = np.maximum.accumulate(np.where(fin, np.arange(nw), -1))
        src = np.where(src < 0, int(np.flatnonzero(fin)[0]), src)
        rref = rref[src]
    return rref


def predict_nep(theta, rg, vpd, temp, fix_vpd):
    k, beta, alpha, rref, e0 = theta
    with np.errstate(over="ignore", invalid="ignore"):
        if fix_vpd:
            amax = np.full(rg.shape, beta)
        else:
            amax = np.where(vpd > VPD0, beta * np.exp(-k * (vpd - VPD0)),
                            beta)
        reco = rref * np.exp(e0 * (1.0 / (TREF_K - T0_K)
                                   - 1.0 / (temp + 273.15 - T0_K)))
        gpp = (amax * alpha * rg) / (alpha * rg + amax)
    return gpp - reco


def _fit_lrc_subset(theta_full, iopt, flux, sdflux, prior, sdprior, rg,
                    vpd, temp):
    """Penalized least squares over the free subset ``iopt`` of θ via LM:
    residuals = [(NEP−flux)/σ, (θ−prior)/σ_prior (finite entries)].
    Returns dict(theta, value, conv, cov) — cov from (JᵀJ)⁻¹ on the free
    parameters (the Gauss-Newton curvature the reference reads from
    optimHess)."""
    iopt = np.asarray(iopt)
    pr_idx = np.asarray([i for i in iopt if np.isfinite(sdprior[i])])

    def resid(p):
        theta = theta_full.copy()
        theta[iopt] = p
        fix_vpd = theta[0] == 0
        nep = predict_nep(theta, rg, vpd, temp, fix_vpd)
        data_r = (nep - flux) / sdflux
        pri_r = ((theta[pr_idx] - prior[pr_idx]) / sdprior[pr_idx]
                 if pr_idx.size else np.empty(0))
        out = np.concatenate([data_r, pri_r])
        return np.where(np.isfinite(out), out, 1e6)

    pars, cov, info, _m, ier = leastsq_lm(
        resid, theta_full[iopt].astype(float), maxfev=800)
    theta_opt = theta_full.copy()
    theta_opt[iopt] = pars
    f = info["fvec"]
    return dict(theta=theta_opt, iopt=list(iopt), value=float(f @ f),
                convergence=0 if ier == 1 else 1, cov=cov)


def _get_iopt(fixed_vpd, fixed_alpha):
    """Free-parameter index set: k (0) drops when the VPD term is fixed,
    alpha (2) drops when pinned to the previous window."""
    free = [1, 3]
    if not fixed_vpd:
        free.insert(0, 0)
    if not fixed_alpha:
        free.insert(-1, 2)
    return sorted(free)


def _lrc_bounds_cascade(theta0, prior, day, last_good):
    """The REddyProc bounds/refit cascade (partGLFitLRCOneWindow):
    k<0 → fix VPD term; α>0.22 → previous window's α; then the
    admissibility checks."""
    nee, sdnee, rg, vpd, temp = day
    fin = np.isfinite(nee) & np.isfinite(sdnee)
    nee, sdnee, rg, vpd, temp = (nee[fin], sdnee[fin], rg[fin], vpd[fin],
                                 temp[fin])
    fc_unc = np.maximum(sdnee, np.quantile(sdnee, 0.3))
    last_good = last_good.copy()
    if not np.isfinite(last_good[2]):
        last_good[2] = 0.22

    def run(theta_start, iopt):
        return _fit_lrc_subset(theta_start, iopt, -nee, fc_unc, prior,
                               LASSLOP_SDPRIOR, rg, vpd, temp)

    is_fixed_vpd = np.nansum(vpd >= VPD0) == 0
    th0 = theta0.copy()
    res = run(th0, _get_iopt(is_fixed_vpd, False))
    th = res["theta"]
    if not np.isfinite(th[0]) or th[0] < 0:
        th0[0] = 0
        res = run(th0, _get_iopt(True, False))
        th = res["theta"]
        if (not np.isfinite(th[2]) or th[2] > 0.22) \
                and np.isfinite(last_good[2]):
            th0[2] = last_good[2]
            res = run(th0, _get_iopt(True, True))
    else:
        if (not np.isfinite(th[2]) or th[2] > 0.22) \
                and np.isfinite(last_good[2]):
            th0[2] = last_good[2]
            res = run(th0, _get_iopt(is_fixed_vpd, True))
            th = res["theta"]
            if not np.isfinite(th[0]) or th[0] < 0:
                th0[0] = 0
                res = run(th0, _get_iopt(True, True))
    if res["convergence"] != 0:
        res["theta"] = np.full(5, np.nan)
    th = res["theta"]
    if np.isfinite(th[0]) and (th[2] < 0 or th[3] < 0 or th[1] < 0
                               or th[1] >= 250):
        res["theta"] = np.full(5, np.nan)
        res["convergence"] = 1002
    return res


def fit_lrc_window(day, e0, sde0, rref_night, last_good):
    """Three-start LRC fit + admissibility (REddyProc semantics); returns
    the winning dict or None."""
    nee_fin = day[0][np.isfinite(day[0])]
    beta_prior = abs(np.quantile(nee_fin, 0.03) - np.quantile(nee_fin, 0.97))
    prior = np.array([0.05, beta_prior, 0.1, rref_night, e0])
    results = []
    for beta_factor in (1.0, 1.3, 0.8):  # the three REddyProc beta starts
        start = prior.copy()
        start[1] *= beta_factor
        results.append(_lrc_bounds_cascade(start, prior, day, last_good))
    valid = [r for r in results if np.isfinite(r["theta"][0])]
    if not valid:
        return None
    best = min(valid, key=lambda r: r["value"])
    cov = best["cov"]
    if cov is None:
        return None
    sd_beta = np.nan
    if 1 in best["iopt"]:
        j = best["iopt"].index(1)
        # cost ≈ Σr² → Hessian ≈ 2·JᵀJ; cov(θ) = H⁻¹ (reference optimHess)
        sd_beta = float(np.sqrt(max(cov[j, j] / 2.0, 0.0)))
    theta = best["theta"]
    if not np.isfinite(theta[1]):
        return None
    if theta[1] > 100 and np.isfinite(sd_beta) and sd_beta >= theta[1]:
        return None
    return best


def associate_rows(anchors, nrec):
    """REddyProc .partGPAssociateSpecialRows: for every record, the
    before/after anchor indices and their linear distance weights (the
    anchor rows themselves and everything outside the anchor span get
    0.5/0.5 on a single anchor)."""
    n_a = anchors.size
    i_before = np.zeros(nrec, int)
    i_after = np.zeros(nrec, int)
    w_before = np.zeros(nrec)
    w_after = np.zeros(nrec)
    for s in range(n_a):
        r = anchors[s] - 1
        i_before[r] = i_after[r] = anchors[s]
        w_before[r] = w_after[r] = 0.5
    for s in range(n_a):
        curr = anchors[s]
        prev = anchors[s] if s == 0 else anchors[s - 1]
        nxt = anchors[s] if s == n_a - 1 else anchors[s + 1]
        if curr - prev > 1:
            rows = np.arange(prev + 1, curr)
            i_after[rows - 1] = curr
            w_after[rows - 1] = np.arange(1, curr - prev) / (curr - prev)
        if nxt - curr > 1:
            rows = np.arange(curr + 1, nxt)
            i_before[rows - 1] = curr
            w_before[rows - 1] = np.arange(nxt - curr - 1, 0, -1) \
                / (nxt - curr)
    # outside the anchor span: single-anchor 0.5/0.5 association
    for sl, anchor in ((slice(None, anchors[0]), anchors[0]),
                       (slice(anchors[-1] - 1, None), anchors[-1])):
        i_before[sl] = i_after[sl] = anchor
        w_before[sl] = w_after[sl] = 0.5
    return i_before, i_after, w_before, w_after


def interpolate_fluxes(i_mean, params, rg, vpd, temp, nrec):
    """Two-neighbour parameter interpolation of RECO and GPP
    (partGLInterpolateFluxes): duplicate anchors keep the first,
    temperature floored at −40 °C for prediction."""
    _, keep = np.unique(i_mean, return_index=True)
    keep = np.sort(keep)
    i_mean = i_mean[keep]
    params = params[keep]
    order = np.argsort(i_mean)
    i_mean, params = i_mean[order], params[order]
    row_of = {m: i for i, m in enumerate(i_mean)}
    i_b, i_a, w_b, w_a = associate_rows(i_mean, nrec)
    p_b = params[[row_of[m] for m in i_b]]
    p_a = params[[row_of[m] for m in i_a]]
    temp_k = np.maximum(-40.0, temp) + 273.15

    def reco_of(p):
        return p[:, 3] * np.exp(p[:, 4] * (1.0 / (TREF_K - T0_K)
                                           - 1.0 / (temp_k - T0_K)))

    def gpp_of(p):
        k, beta, alpha = p[:, 0], p[:, 1], p[:, 2]
        with np.errstate(over="ignore", invalid="ignore"):
            amax = np.where(k == 0, beta,
                            np.where(vpd > VPD0,
                                     beta * np.exp(-k * (vpd - VPD0)), beta))
            return (amax * alpha * rg) / (alpha * rg + amax)

    reco = w_b * reco_of(p_b) + w_a * reco_of(p_a)
    gpp = w_b * gpp_of(p_b) + w_a * gpp_of(p_a)
    return reco, gpp


def replace_missing_sd(sd, nee):
    """REddyProc replaceMissingSdByPercentage: max(0.7, 0.2·|NEE|)."""
    sd = sd.astype(float).copy()
    fill = ~np.isfinite(sd)
    sd[fill] = np.maximum(SD_MINSD, np.abs(nee[fill] * SD_PERC))
    return sd


def partition_daytime_arrays(nee, sd_nee, ta, vpd, rg, doy, hour, lat, lon,
                             utc_offset, dts):
    """The full per-key pipeline (pure numpy). Returns dict of OUT_COLS."""
    n = nee.size
    out = {c: np.full(n, np.nan) for c in OUT_COLS}
    potrad = potrad_reddyproc(doy, hour, lat, lon, utc_offset)
    with np.errstate(invalid="ignore"):
        is_night = (rg <= DAY_MAX_SW_IN) & (potrad <= 0.0)
        is_day = (rg > DAY_MAX_SW_IN) & (potrad > 0.0)
    start_days, i_central = window_grid(n, dts)
    nw = i_central.size

    e0, sde0 = nighttime_pass(nee, ta, is_night, i_central,
                              WIN_NIGHT_DAYS, dts, n)
    for win_days in WIN_EXTEND:
        miss = ~np.isfinite(e0)
        if not miss.any():
            break
        e0x, sdx = nighttime_pass(nee, ta, is_night, i_central, win_days,
                                  dts, n)
        e0[miss], sde0[miss] = e0x[miss], sdx[miss]
    n_fin = int(np.isfinite(e0).sum())
    if n_fin < 5 and n_fin < 0.1 * nw:
        return out

    e0_sm, sde0_sm = smooth_tempsens(e0, sde0, i_central, start_days)
    rref_win = rref_windows(nee, ta, is_night, e0_sm, i_central, dts, n)

    lo_a, hi_a = window_records(i_central, WIN_REF_DAYS, dts, n)
    i_mean_list, params_list, central_list = [], [], []
    last_good = np.full(5, np.nan)
    for w in range(nw):
        if not np.isfinite(e0_sm[w]):
            continue
        sl = slice(lo_a[w] - 1, hi_a[w])
        valid = (is_day[sl] & np.isfinite(nee[sl]) & np.isfinite(ta[sl])
                 & np.isfinite(rg[sl]) & np.isfinite(sd_nee[sl])
                 & np.isfinite(vpd[sl]))
        if valid.sum() < MIN_NREC:
            valid = (is_day[sl] & np.isfinite(nee[sl]) & np.isfinite(ta[sl])
                     & np.isfinite(rg[sl]) & np.isfinite(sd_nee[sl]))
            if valid.sum() < MIN_NREC:
                continue
        i_mean = (lo_a[w] - 1) \
            + int(round(float(np.nonzero(valid)[0].mean()) + 1))
        day = (nee[sl][valid], sd_nee[sl][valid], rg[sl][valid],
               vpd[sl][valid], ta[sl][valid])
        res = fit_lrc_window(day, e0_sm[w], sde0_sm[w], rref_win[w],
                             last_good)
        if res is None:
            continue
        last_good = res["theta"]
        i_mean_list.append(i_mean)
        params_list.append(res["theta"])
        central_list.append(int(i_central[w]))
    if not params_list:
        return out

    reco, gpp = interpolate_fluxes(
        np.asarray(i_mean_list, int), np.asarray(params_list), rg, vpd,
        ta, n)
    out["RECO_DT_RP"] = reco
    out["GPP_DT_RP"] = gpp
    for c, p in zip(central_list, params_list):
        if 0 <= c - 1 < n:
            out["K_DT_RP"][c - 1] = p[0]
            out["BETA_DT_RP"][c - 1] = p[1]
            out["ALPHA_DT_RP"][c - 1] = p[2]
            out["RREF_DT_RP"][c - 1] = p[3]
            out["E0_DT_RP"][c - 1] = p[4]
    return out


def partition_nee_daytime_reddyproc(
    df: DataFrame, key_cols: list[str], ts_col: str, *,
    nee_col: str, ta_col: str, rg_col: str, vpd_col: str,
    sd_nee_col: str | None = None,
    lat: float, lon: float, utc_offset: int = 1,
    records_per_day: int = 48,
) -> DataFrame:
    """Append the seven ``*_DT_RP`` columns per key. ``sd_nee_col`` (NEE
    uncertainty for the fit weighting) defaults to the REddyProc
    percentage fallback max(0.7, 0.2·|NEE|)."""
    import pandas as pd
    from pyspark.sql.types import DoubleType, StructField, StructType

    sel = [
        *key_cols, F.col(ts_col).alias("_ts"),
        F.col(nee_col).cast("double").alias("_nee"),
        F.col(ta_col).cast("double").alias("_ta"),
        F.col(rg_col).cast("double").alias("_rg"),
        F.col(vpd_col).cast("double").alias("_vpd"),
        F.dayofyear(ts_col).cast("double").alias("_doy"),
        (F.hour(ts_col) + F.minute(ts_col) / 60.0
         + F.second(ts_col) / 3600.0).alias("_hr"),
    ]
    if sd_nee_col is not None:
        sel.append(F.col(sd_nee_col).cast("double").alias("_sd"))
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
        *[StructField(c, DoubleType()) for c in OUT_COLS],
    ])

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_ts").reset_index(drop=True)
        nee = pdf["_nee"].to_numpy()
        sd = (pdf["_sd"].to_numpy() if sd_nee_col is not None
              else np.full(len(pdf), np.nan))
        sd = replace_missing_sd(sd, nee)
        res = partition_daytime_arrays(
            nee, sd, pdf["_ta"].to_numpy(), pdf["_vpd"].to_numpy(),
            pdf["_rg"].to_numpy(), pdf["_doy"].to_numpy(),
            pdf["_hr"].to_numpy(), lat, lon, utc_offset, records_per_day)
        out = pdf[[f.name for f in key_fields] + ["_ts"]].copy()
        for c in OUT_COLS:
            out[c] = res[c]
        return out

    parts = work.groupBy(*key_cols).applyInPandas(
        lambda _, pdf: kernel(pdf), schema=schema)
    parts = parts.withColumnRenamed("_ts", ts_col) \
                 .dropDuplicates([*key_cols, ts_col])
    return df.join(parts, on=[*key_cols, ts_col], how="left")
