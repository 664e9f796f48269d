"""PAS20 random/joint uncertainty vs a direct per-row oracle implementing
the reference loop semantics (uncertainty.py methods 1-4, compute_join)."""

import numpy as np
import pandas as pd
import pytest

from diive_spark.operators import uncertainty as unc_ops


def _oracle(pdf, methods=(1, 2, 3, 4)):
    ts = pd.to_datetime(pdf["ts"])
    sec = ts.astype("int64").to_numpy() / 1e9
    flux = pdf["flux"].to_numpy(float)
    gf = pdf["gf"].to_numpy(float)
    ta = pdf["ta"].to_numpy(float)
    vpd = pdf["vpd"].to_numpy(float) * 10.0  # kPa -> hPa
    sw = pdf["swin"].to_numpy(float)
    hr = (ts.dt.hour + ts.dt.minute / 60.0 + ts.dt.second / 3600.0).to_numpy()
    n = len(pdf)
    unc = np.full(n, np.nan)
    for i in range(n):
        if not np.isfinite(flux[i]):
            continue
        inwin = np.abs(sec - sec[i]) <= 7 * 86400
        s, e = (hr[i] - 1) % 24.0, (hr[i] + 1) % 24.0
        tod = ((hr >= s) & (hr <= e)) if s <= e else ((hr >= s) | (hr <= e))
        sel = (inwin & tod & np.isfinite(flux)
               & (np.abs(ta - ta[i]) < 2.5)
               & (np.abs(vpd - vpd[i]) < 5.0)
               & (np.abs(sw - sw[i]) < np.clip(sw[i], 20.0, 50.0)))
        if sel.sum() >= 6:
            unc[i] = np.std(flux[sel], ddof=1)
    if 2 in methods:
        snap = unc.copy()
        for i in np.flatnonzero(~np.isfinite(snap)):
            tol = max(abs(gf[i]) * 0.2, 2.0)
            sel = ((np.abs(sec - sec[i]) <= 14 * 86400)
                   & (gf >= gf[i] - tol) & (gf <= gf[i] + tol)
                   & np.isfinite(snap))
            if sel.sum() > 0:
                unc[i] = np.median(snap[sel])
    if 3 in methods:
        snap = unc.copy()
        for i in np.flatnonzero(~np.isfinite(snap)):
            if not np.isfinite(gf[i]):
                continue
            tol = max(abs(gf[i]) * 0.2, 2.0)
            sel = (gf >= gf[i] - tol) & (gf <= gf[i] + tol) & np.isfinite(snap)
            if sel.sum() > 0:
                unc[i] = np.median(snap[sel])
    if 4 in methods:
        snap = unc.copy()
        order = np.argsort(gf, kind="stable")  # nan last, ties by ts order
        pos = np.empty(n, dtype=int)
        pos[order] = np.arange(n)
        snap_sorted = snap[order]
        for i in np.flatnonzero(~np.isfinite(snap)):
            seg = snap_sorted[max(0, pos[i] - 5): pos[i] + 5]
            valid = seg[np.isfinite(seg)]
            if valid.size:
                unc[i] = np.median(valid)
    return unc


def make_series(n=960, seed=4, start="2023-06-01"):
    rng = np.random.default_rng(seed)
    ts = pd.date_range(start, periods=n, freq="30min")
    ta = 12 + 8 * np.sin(2 * np.pi * np.arange(n) / 48) + rng.normal(0, 1.5, n)
    swin = np.maximum(0.0, 500 * np.sin(2 * np.pi * (np.arange(n) % 48) / 48 - np.pi / 2) + rng.normal(0, 20, n))
    vpd = np.abs(0.8 + 0.4 * np.sin(2 * np.pi * np.arange(n) / 48) + rng.normal(0, 0.2, n))
    flux = -10 + 5 * np.sin(2 * np.pi * (np.arange(n) % 48) / 48) + rng.normal(0, 1.0, n)
    flux[rng.choice(n, 200, replace=False)] = np.nan  # gaps
    gf = np.where(np.isfinite(flux), flux, -10 + rng.normal(0, 1.0, n))
    return pd.DataFrame({"site": "s1", "ts": ts, "flux": flux, "gf": gf,
                         "ta": ta, "vpd": vpd, "swin": swin})


@pytest.fixture(scope="module")
def series(spark):
    pdf = make_series()
    return spark.createDataFrame(pdf), pdf


def _run(spark_df, methods):
    return (unc_ops.random_uncertainty_pas20(
        spark_df, ["site"], "ts", "flux", "gf", "ta", "vpd", "swin",
        methods=methods)
        .orderBy("ts").toPandas())


def test_method1_matches_reference_loop(spark, series):
    df, pdf = series
    got = _run(df, methods=(1,))
    want = _oracle(pdf, methods=(1,))
    np.testing.assert_allclose(got["flux_RANDUNC"].to_numpy(float), want,
                               rtol=1e-10, equal_nan=True)
    # measured rows get an n-vals diagnostic, gap rows don't
    meas = pdf["flux"].notna().to_numpy()
    assert got.loc[meas, "RANDUNC_N_M1"].notna().all()
    assert got.loc[~meas, "RANDUNC_N_M1"].isna().all()
    # method 1 actually produced estimates on this data
    assert np.isfinite(want).sum() > 400


def test_methods_1_to_4_hierarchy_matches_reference_loop(spark, series):
    df, pdf = series
    got = _run(df, methods=(1, 2, 3, 4))
    want = _oracle(pdf, methods=(1, 2, 3, 4))
    np.testing.assert_allclose(got["flux_RANDUNC"].to_numpy(float), want,
                               rtol=1e-10, equal_nan=True)
    # the hierarchy filled strictly more than method 1 alone
    m1_only = _oracle(pdf, methods=(1,))
    assert np.isfinite(want).sum() > np.isfinite(m1_only).sum()
    # every gap-filled record ends with an estimate (methods 3/4 guarantee)
    assert got.loc[pdf["gf"].notna().to_numpy(), "flux_RANDUNC"].notna().all()


def test_method4_serves_out_of_band_fluxes(spark):
    pdf = make_series(seed=9)
    # one absurd flux magnitude: outside every ±20% band -> only m4 can fill
    pdf.loc[10, "flux"] = np.nan
    pdf.loc[10, "gf"] = 5000.0
    df = pytest.importorskip("pyspark").sql.SparkSession.getActiveSession().createDataFrame(pdf)
    got = _run(df, methods=(1, 2, 3, 4))
    want = _oracle(pdf, methods=(1, 2, 3, 4))
    row = got.set_index(got["ts"].astype(str)).loc[str(pdf["ts"].iloc[10])]
    assert np.isfinite(row["flux_RANDUNC"])
    np.testing.assert_allclose(got["flux_RANDUNC"].to_numpy(float), want,
                               rtol=1e-10, equal_nan=True)
    assert np.isfinite(row["RANDUNC_N_M4"])


def test_methods_gate_actually_skips_method1(spark, series):
    # review fix: methods=(2,) must not run (or emit) method 1 — with no
    # m1 estimates to pool from, the hierarchy stays empty
    df, _ = series
    got = _run(df, methods=(2,))
    assert got["flux_RANDUNC"].isna().all()
    assert got["RANDUNC_N_M1"].isna().all()


def test_joint_and_cumulative_propagation(spark, series):
    df, pdf = series
    filled = unc_ops.random_uncertainty_pas20(
        df, ["site"], "ts", "flux", "gf", "ta", "vpd", "swin")
    # synthetic USTAR scenario spread around gf
    filled = (filled.withColumn("low", filled["gf"] - 1.0)
              .withColumn("high", filled["gf"] + 1.0))
    joint = unc_ops.joint_uncertainty_pas20(
        filled, "flux_RANDUNC", "low", "high")
    got = joint.orderBy("ts").toPandas()
    r = got["flux_RANDUNC"].to_numpy(float)
    expect = np.sqrt(r ** 2 + 1.0)  # (high-low)/2 = 1
    np.testing.assert_allclose(got["flux_JOINTUNC"].to_numpy(float), expect,
                               rtol=1e-12, equal_nan=True)
    cum = unc_ops.cumulative_uncertainty(
        joint, ["site"], "ts", "gf", "flux_RANDUNC",
        scenario_lower_col="low", scenario_upper_col="high").orderBy("ts").toPandas()
    gf = got["gf"].to_numpy(float)
    np.testing.assert_allclose(cum["FLUX_CUM"].to_numpy(float),
                               np.nancumsum(gf), rtol=1e-12)
    want_rand = np.sqrt(np.nancumsum(np.where(np.isfinite(gf), r ** 2, np.nan)))
    np.testing.assert_allclose(cum["UNC_RANDOM_CUMULATIVE"].to_numpy(float),
                               want_rand, rtol=1e-10)
    # scenario term: fully correlated running spread = n * (2/2) = n
    n_idx = np.arange(1, len(gf) + 1, dtype=float)
    np.testing.assert_allclose(cum["UNC_SCENARIO_CUMULATIVE"].to_numpy(float),
                               n_idx, rtol=1e-12)
    total = np.sqrt(want_rand ** 2 + n_idx ** 2)
    np.testing.assert_allclose(cum["UNC_CUMULATIVE"].to_numpy(float), total,
                               rtol=1e-10)
    np.testing.assert_allclose((cum["FLUX+UNC"] - cum["FLUX-UNC"]).to_numpy(float),
                               2 * total, rtol=1e-10)


def test_halo_slab_equals_global_kernel(spark):
    """Slab+halo exactness: method 1+2 across slab boundaries must equal the
    oracle's global computation (the series spans 3 slabs)."""
    pdf = make_series(n=48 * 50, seed=13)  # 50 days -> several 21d slabs
    df = pytest.importorskip("pyspark").sql.SparkSession.getActiveSession().createDataFrame(pdf)
    got = _run(df, methods=(1, 2))
    want = _oracle(pdf, methods=(1, 2))
    np.testing.assert_allclose(got["flux_RANDUNC"].to_numpy(float), want,
                               rtol=1e-10, equal_nan=True)
