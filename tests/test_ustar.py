"""USTAR moving-point threshold detection vs an INDEPENDENT oracle.

The oracle below reimplements the ONEFlux flow positionally — equal-count
classes with the C boundary tie-EXTENSION loop over sorted arrays — i.e. a
different algorithm from the operator's value-interval searchsorted
formulation. Exact agreement on tie-heavy data is the proof of the
equivalence claimed in diive_spark/operators/ustar.py."""

import numpy as np
import pandas as pd
import pytest

from diive_spark.operators import fluxchain, ustar

NOT_FOUND = 10.0


# ------------------------------------------------------------------ oracle

def _oracle_bounds(sorted_vals, n_classes, n_per):
    """(start, end) inclusive index pairs with forward tie extension,
    mirroring ustar.c's boundary loop; empty classes are (-1, -1)."""
    N = len(sorted_vals)
    bounds = [(-1, -1)] * n_classes
    end = 0
    broke = False
    for i in range(n_classes - 1):
        start = end
        end = n_per * (i + 1) - 1
        if start >= N:
            broke = True
            break
        end = min(end, N - 1)
        v = sorted_vals[end]
        end += 1
        while end < N and sorted_vals[end] == v:
            end += 1
        bounds[i] = (start, end - 1)
    if not broke and end < N:
        bounds[n_classes - 1] = (end, N - 1)
    return bounds


def _oracle_means(arr_sorted, bounds):
    out = np.zeros(len(bounds))
    for k, (s, e) in enumerate(bounds):
        if s >= 0 and e >= s:
            out[k] = arr_sorted[s:e + 1].mean()
    return out


def _oracle_forward(u_mean, f_mean, n=2, ws=10):
    C = len(u_mean)
    if C - n <= 0:
        return NOT_FOUND
    for i in range(C - n + 1):
        means = []
        bad = False
        for y in range(n):
            seg = f_mean[i + 1 + y: i + 1 + y + ws]
            if seg.size == 0:
                bad = True
                break
            means.append(seg.mean())
        if bad:
            continue
        if all(f_mean[i + y] >= means[y] for y in range(n)):
            return float(u_mean[i])
    return NOT_FOUND


def _oracle_ustar_class(nee, us, n_ustar=20):
    n_per = len(us) // n_ustar
    if n_per < 1:
        return NOT_FOUND
    o = np.argsort(us, kind="stable")
    b = _oracle_bounds(us[o], n_ustar, n_per)
    um, fm = _oracle_means(us[o], b), _oracle_means(nee[o], b)
    if um[0] > 0.2:
        return NOT_FOUND
    return _oracle_forward(um, fm)


def _oracle_season(nee, ta, us, n_ta=7, min_ta=100):
    n_per = len(nee) // n_ta
    if n_per < min_ta:
        return NOT_FOUND
    o = np.argsort(ta, kind="stable")
    tas, uss, nes = ta[o], us[o], nee[o]
    found = []
    for s, e in _oracle_bounds(tas, n_ta, n_per):
        if s < 0 or e - s + 1 < min_ta:
            continue
        tc, uc, nc = tas[s:e + 1], uss[s:e + 1], nes[s:e + 1]
        dx, dy = tc - tc.mean(), uc - uc.mean()
        den = np.sqrt((dx * dx).sum()) * np.sqrt((dy * dy).sum())
        if den == 0 or abs((dx * dy).sum() / den) > 0.5:
            continue
        th = _oracle_ustar_class(nc, uc)
        if th != NOT_FOUND:
            found.append(th)
    return float(np.median(found)) if found else NOT_FOUND


def _oracle_detect(pdf, min_period=3000):
    ts = pd.to_datetime(pdf["ts"])
    month = ts.dt.month.to_numpy().copy()
    shift = (ts.dt.day.to_numpy() == 1) & (ts.dt.hour.to_numpy() == 0) & (
        ts.dt.minute.to_numpy() == 0)
    month[shift] -= 1
    month[month == 0] = 12
    nee = pdf["NEE"].to_numpy(float)
    ta = pdf["TA"].to_numpy(float)
    us = pdf["USTAR"].to_numpy(float)
    sw = pdf["SW_IN"].to_numpy(float)
    valid = np.isfinite(nee) & np.isfinite(ta) & np.isfinite(us) & np.isfinite(sw)
    night = valid & (sw < 10.0)
    if len(pdf) < min_period or valid.sum() < min_period:
        return [np.nan] * 4
    groups = [(1, 2, 3), (4, 5, 6), (7, 8, 9), (10, 11, 12)]
    counts = [np.isin(month[night], g).sum() for g in groups]
    if all(c < 700 for c in counts):
        if night.sum() < 160:
            return [np.nan] * 4
        th = _oracle_season(nee[night], ta[night], us[night])
        th = th if th != NOT_FOUND else np.nan
        return [th] * 4
    out = []
    for g, c in zip(groups, counts):
        if c < 700:
            out.append(np.nan)
            continue
        m = night & np.isin(month, g)
        th = _oracle_season(nee[m], ta[m], us[m])
        out.append(th if th != NOT_FOUND else np.nan)
    return out


# ------------------------------------------------------------------ data

def make_flux(n=6000, seed=1, thr=0.3, start="2023-01-01", quantize=None):
    rng = np.random.default_rng(seed)
    ts = pd.date_range(start, periods=n, freq="30min")
    us = rng.uniform(0.01, 0.8, n)
    if quantize:
        us = np.round(us / quantize) * quantize  # heavy ties
    ta = rng.uniform(0.0, 25.0, n)  # decorrelated from ustar
    sw = np.where(rng.uniform(size=n) < 0.5, 0.0, 250.0)
    nee = np.minimum(us, thr) / thr * 5.0 + rng.normal(0, 0.2, n)
    return pd.DataFrame({"site": "s1", "ts": ts, "NEE": nee, "TA": ta,
                         "USTAR": us, "SW_IN": sw})


# ------------------------------------------------------------------ tests

@pytest.mark.parametrize("quantize", [None, 0.05])
def test_mp_detection_matches_positional_oracle(spark, quantize):
    """Value-interval kernel == positional tie-extension oracle, with and
    without heavy USTAR ties (0.05-quantized -> every class boundary tied)."""
    pdf = make_flux(quantize=quantize)
    got = (ustar.ustar_mp_thresholds(
        spark.createDataFrame(pdf), ["site"], "ts", "NEE", "TA", "USTAR", "SW_IN")
        .orderBy("season").toPandas())
    want = _oracle_detect(pdf)
    assert list(got["season"]) == [1, 2, 3, 4]
    # rtol: bincount-weighted means vs slice means differ by summation
    # order (~1 ulp); class SELECTION must agree exactly
    np.testing.assert_allclose(
        got["threshold"].to_numpy(float), np.asarray(want, float),
        rtol=1e-9, equal_nan=True)
    # detection found the planted plateau in the covered seasons
    covered = got["threshold"].notna()
    assert covered.sum() >= 1
    assert ((got.loc[covered, "threshold"] > 0.2)
            & (got.loc[covered, "threshold"] < 0.45)).all()


def test_mp_detection_planted_threshold_and_annual(spark):
    pdf = make_flux(n=9000, seed=7, thr=0.35)
    df = spark.createDataFrame(pdf)
    thr = ustar.ustar_mp_thresholds(df, ["site"], "ts", "NEE", "TA",
                                    "USTAR", "SW_IN")
    ann = ustar.ustar_mp_annual(thr, ["site"]).collect()[0]
    assert 0.25 < ann["ustar_threshold"] < 0.65  # max over noisy seasons
    # n_night bookkeeping: sums to the night+valid record count
    tot = thr.agg({"n_night": "sum"}).collect()[0][0]
    assert tot == int((pdf["SW_IN"] < 10).sum())


def test_mp_detection_below_min_period_yields_nulls(spark):
    pdf = make_flux(n=1000)
    got = ustar.ustar_mp_thresholds(
        spark.createDataFrame(pdf), ["site"], "ts", "NEE", "TA", "USTAR",
        "SW_IN").toPandas()
    assert got["threshold"].isna().all()
    assert (got["n_night"] > 0).any()  # diagnostics still populated


def test_mp_one_big_season_fallback(spark):
    # 4 seasons, each under 700 night records -> pool everything
    parts = [make_flux(n=500, seed=s, start=f"2023-{m:02d}-15")
             for s, m in zip(range(4), (1, 4, 7, 10))]
    pdf = pd.concat(parts, ignore_index=True)
    got = (ustar.ustar_mp_thresholds(
        spark.createDataFrame(pdf), ["site"], "ts", "NEE", "TA", "USTAR",
        "SW_IN", min_samples_period=100)
        .orderBy("season").toPandas())
    want = _oracle_detect(pdf, min_period=100)
    np.testing.assert_allclose(got["threshold"].to_numpy(float),
                               np.asarray(want, float), rtol=1e-9,
                               equal_nan=True)
    # fallback broadcast the pooled threshold to every season slot
    assert got["threshold"].notna().all()
    assert got["threshold"].nunique() == 1


def test_month_shift_first_minute_belongs_to_previous_month():
    ts = pd.Series(pd.to_datetime([
        "2024-01-01 00:00:00", "2024-01-01 00:00:59",  # shift -> Dec
        "2024-01-01 00:01:00", "2024-02-01 00:00:00",  # Feb 1 -> Jan
    ]))
    assert list(ustar._season_month(ts)) == [12, 12, 1, 1]


def test_bootstrap_deterministic_and_ordered(spark):
    pdf = make_flux(n=6000, seed=3)
    df = spark.createDataFrame(pdf)
    kw = dict(n_boot=8, seed=11)
    a = ustar.ustar_mp_bootstrap(df, ["site"], "ts", "NEE", "TA", "USTAR",
                                 "SW_IN", **kw).orderBy("scenario").toPandas()
    b = ustar.ustar_mp_bootstrap(df, ["site"], "ts", "NEE", "TA", "USTAR",
                                 "SW_IN", **kw).orderBy("scenario").toPandas()
    pd.testing.assert_frame_equal(a, b)  # seeded -> retry-safe
    assert list(a["scenario"]) == ["CUT_16", "CUT_50", "CUT_84"]
    t = a.set_index("scenario")["threshold"]
    assert t["CUT_16"] <= t["CUT_50"] <= t["CUT_84"]
    assert 0.15 < t["CUT_50"] < 0.5
    assert (a["n_samples"] == 8).all()


def test_chain_runs_l33_from_detected_thresholds(spark):
    """VERDICT r2 ask: the chain's L3.3 from DETECTED (not caller-given)
    thresholds, bootstrap CUT scenarios included."""
    pdf = make_flux(n=6000, seed=5)
    pdf["NIGHTTIME"] = (pdf["SW_IN"] < 10).astype(int)
    df = spark.createDataFrame(pdf)
    out = fluxchain.run_chain(
        df, ["site"], "ts", "NEE",
        ustar_col="USTAR", ta_col="TA", swin_col="SW_IN",
        nighttime_col="NIGHTTIME", ustar_n_boot=6,
    )
    cols = out.columns
    for sc in ("CUT_16", "CUT_50", "CUT_84"):
        assert f"NEE_L31_L33_{sc}" in cols
        assert f"NEE_L31_L33_{sc}_L41" in cols
    res = out.select(
        "USTAR", "NIGHTTIME", "NEE_L31_QCF",
        "FLAG_L33_USTAR_CUT_84_TEST", "NEE_L31_L33_CUT_84",
    ).toPandas()
    rej = res["FLAG_L33_USTAR_CUT_84_TEST"] == 2
    assert rej.sum() > 50                       # detection actually filtered
    assert (res.loc[rej, "NIGHTTIME"] == 1).all()  # nighttime-only rejection
    assert res.loc[rej, "NEE_L31_L33_CUT_84"].isna().all()
    # rejected records all sit below the strictest detected threshold
    assert res.loc[rej, "USTAR"].max() < 0.65


def _oracle_vekuri_season(pdf_season):
    """Direct pandas oracle using pd.qcut (the reference's own binning)."""
    found = []
    tcls = pd.qcut(pdf_season["TA"], 6, duplicates="drop")
    for _, g in pdf_season.groupby(tcls, observed=True):
        corr = g[["TA", "USTAR"]].corr().iloc[0, 1]
        if not np.isfinite(corr) or abs(corr) >= 0.4:
            continue
        ucls = pd.qcut(g["USTAR"], 20, duplicates="drop")
        um, fm = [], []
        for _, gg in g.groupby(ucls, observed=True):
            um.append(gg["USTAR"].mean())
            fm.append(gg["NEE"].mean())
        if len(um) < 3:
            continue
        um, fm = np.asarray(um), np.asarray(fm)
        for i in range(len(um) - 1):
            seg = fm[i + 1: i + 11]
            if seg.size and fm[i] >= 0.95 * seg.mean():
                found.append(um[i])
                break
    return float(np.median(found)) if found else np.nan


def test_vekuri_matches_pd_qcut_oracle(spark):
    """The kernel's interpolated-edge class ids must equal pd.qcut's (the
    reference uses pd.qcut directly), end to end through the detection."""
    pdf = make_flux(n=6000, seed=21, thr=0.28)
    got = (ustar.ustar_vekuri_thresholds(
        spark.createDataFrame(pdf), ["site"], "ts", "NEE", "TA", "USTAR",
        swin_col="SW_IN").orderBy("season").toPandas())
    # oracle per season (plain months, night filter, >=50 rows)
    ts = pd.to_datetime(pdf["ts"])
    night = pdf["SW_IN"] < 10
    want = []
    for g in [(12, 1, 2), (3, 4, 5), (6, 7, 8), (9, 10, 11)]:  # DJF/MAM/...
        sub = pdf[night & ts.dt.month.isin(g)]
        want.append(_oracle_vekuri_season(sub) if len(sub) >= 50 else np.nan)
    np.testing.assert_allclose(got["threshold"].to_numpy(float),
                               np.asarray(want), rtol=1e-9, equal_nan=True)
    covered = got["threshold"].notna()
    assert covered.sum() >= 1
    assert ((got.loc[covered, "threshold"] > 0.15)
            & (got.loc[covered, "threshold"] < 0.45)).all()


def test_vekuri_below_minimums_yields_nulls(spark):
    pdf = make_flux(n=150, seed=3)  # night rows < 100 valid minimum
    got = ustar.ustar_vekuri_thresholds(
        spark.createDataFrame(pdf), ["site"], "ts", "NEE", "TA", "USTAR",
        swin_col="SW_IN").toPandas()
    assert got["threshold"].isna().all()


def test_seasonal_thresholds_to_records_and_variable_l33(spark):
    """Seasonal MP thresholds mapped per record + variable-threshold L3.3
    (ustarthreshold.py FlagMultipleVariableUstarThresholds semantics):
    rejection varies through time with the season's threshold; NULL-season
    thresholds reject nothing."""
    pdf = make_flux(n=9000, seed=8)  # seasons 1-2 covered, 3-4 empty
    df = spark.createDataFrame(pdf)
    thr = ustar.ustar_mp_thresholds(df, ["site"], "ts", "NEE", "TA",
                                    "USTAR", "SW_IN")
    thr_pd = thr.orderBy("season").toPandas().set_index("season")["threshold"]
    mapped = ustar.seasonal_thresholds_to_records(df, ["site"], "ts", thr)
    got = mapped.select("ts", "ustar_threshold_seasonal").orderBy("ts").toPandas()
    months = pd.to_datetime(got["ts"]).dt.month
    for season, g in [(1, (1, 2, 3)), (2, (4, 5, 6))]:
        rows = got[months.isin(g)]
        if pd.isna(thr_pd.loc[season]):
            assert rows["ustar_threshold_seasonal"].isna().all()
        else:
            # month-shift moves first-minute rows to the PREVIOUS season,
            # so compare on the bulk (non-boundary) rows
            vals = rows["ustar_threshold_seasonal"].dropna().unique()
            assert len(vals) >= 1 and np.isclose(
                vals, thr_pd.loc[season]).any()
    out = fluxchain.run_level33_variable_ustar(
        mapped, "NEE", "USTAR",
        {"SEAS": "ustar_threshold_seasonal"}).toPandas()
    rej = out["FLAG_L33_USTAR_SEAS_TEST"] == 2
    assert rej.sum() > 100
    # every rejected record sits below ITS OWN record-level threshold
    assert (out.loc[rej, "USTAR"]
            < out.loc[rej, "ustar_threshold_seasonal"]).all()
    # null-threshold records are never rejected
    nullthr = out["ustar_threshold_seasonal"].isna() & out["NEE"].notna()
    assert (out.loc[nullthr, "FLAG_L33_USTAR_SEAS_TEST"] == 0).all()
    assert out.loc[rej, "NEE_L33_SEAS"].isna().all()
