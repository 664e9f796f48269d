"""Flux processing chain L2 -> L4.2: level-contract tests on a synthetic
flux-like series (quality flags, storage correction, outlier rejection,
USTAR scenarios, gap-filling, cumulatives)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from diive_spark.operators import fluxchain


@pytest.fixture(scope="module")
def fluxdata(spark):
    rng = np.random.default_rng(42)
    n = 48 * 40  # 40 days at 30 min
    ts = pd.date_range("2023-05-01", periods=n, freq="30min")
    hour = ts.hour.to_numpy()
    day = ((8 <= hour) & (hour < 20)).astype(int)
    # NEE-like: negative daytime uptake, positive nighttime respiration
    nee = np.where(day, -8 + rng.normal(0, 1, n), 3 + rng.normal(0, 0.5, n))
    nee[rng.choice(n, 40, replace=False)] = np.nan   # instrument gaps
    ssitc = rng.choice([0, 0, 0, 1, 2], size=n)       # EddyPro-style flag
    strg = rng.normal(0.2, 0.05, n)
    strg[rng.choice(n, 60, replace=False)] = np.nan   # gappy storage term
    ustar = np.abs(rng.normal(0.25, 0.1, n))
    nee[500] = 80.0  # gross outlier for L3.2
    pdf = pd.DataFrame({
        "site": "s1", "ts": ts, "NEE": nee, "SSITC": ssitc,
        "SC_SINGLE": strg, "USTAR": ustar,
        "DAYTIME": day, "NIGHTTIME": 1 - day,
    })
    return spark.createDataFrame(pdf), pdf


def test_run_chain_end_to_end(spark, fluxdata):
    df, pdf = fluxdata
    out = fluxchain.run_chain(
        df, ["site"], "ts", "NEE",
        strg_col="SC_SINGLE",
        ustar_col="USTAR",
        ustar_thresholds={"CUT_16": 0.15, "CUT_50": 0.2, "CUT_84": 0.25},
        flag_cols=["SSITC"],
        abs_limits=(-50.0, 50.0),
        nighttime_col="NIGHTTIME",
        daytime_col="DAYTIME",
    )
    cols = out.columns
    # scenario columns APPENDED, never replaced: original + every level's
    for c in ("NEE", "NEE_L31", "NEE_L31_L33_CUT_50",
              "NEE_L31_L33_CUT_50_L41",
              "NEE_L31_L33_CUT_50_L41_CUMSUM_YEAR",
              "NEE_L31_L33_CUT_50_L41_CUMQUAD",
              "FLAG_L2_QCF", "FLAG_L32_QCF",
              "FLAG_L33_USTAR_CUT_84_TEST", "FLAG_SC_SINGLE_ISFILLED"):
        assert c in cols, c
    res = out.orderBy("ts").toPandas()
    assert len(res) == len(pdf)  # one row per input record throughout

    # L2: SSITC==2 and the gross outlier's abs-limit rejection null the flux
    ssitc2 = pdf["SSITC"].to_numpy() == 2
    assert res.loc[ssitc2, "NEE_L31"].isna().all()
    assert np.isnan(res.loc[500, "NEE_L31"])  # 80.0 > abs limit 50

    # append-only contract: raw observed values are NEVER lost — L2-rejected
    # rows keep their raw NEE, the filtered series lives in NEE_L2_QCF
    raw_kept = ssitc2 & pdf["NEE"].notna().to_numpy()
    np.testing.assert_allclose(
        res.loc[raw_kept, "NEE"], pdf.loc[raw_kept, "NEE"], rtol=0)
    assert res.loc[raw_kept, "NEE_L2_QCF"].isna().all()
    # L3.2-rejected rows keep their NEE_L31 value; only NEE_L31_QCF is nulled
    l32_rej = (res["FLAG_L32_QCF"] == 2) & res["NEE_L31"].notna()
    assert l32_rej.sum() > 0
    assert res.loc[l32_rej, "NEE_L31_QCF"].isna().all()
    assert res.loc[l32_rej, "NEE_L31"].notna().all()

    # L3.1: storage-corrected values = NEE + storage where both observed
    ok = (~ssitc2) & pdf["NEE"].notna() & pdf["SC_SINGLE"].notna()
    ok &= pdf["NEE"].abs() <= 50
    got = res.loc[ok, "NEE_L31"].to_numpy(dtype=float)
    exp = (pdf["NEE"] + pdf["SC_SINGLE"])[ok].to_numpy()
    nn = ~np.isnan(got)  # L3.2 also rejects day/night-transition diffs
    assert nn.mean() > 0.9
    np.testing.assert_allclose(got[nn], exp[nn], rtol=1e-12)
    # gappy storage slots were median-filled (informational flag)
    assert res["FLAG_SC_SINGLE_ISFILLED"].sum() > 30

    # L3.3: stricter scenarios reject at least as much (monotone in cut)
    n16 = res["NEE_L31_L33_CUT_16"].notna().sum()
    n50 = res["NEE_L31_L33_CUT_50"].notna().sum()
    n84 = res["NEE_L31_L33_CUT_84"].notna().sum()
    assert n16 >= n50 >= n84
    # nighttime-only rejection: daytime records never USTAR-flagged
    dayrows = res[pdf["DAYTIME"].to_numpy() == 1]
    assert (dayrows["FLAG_L33_USTAR_CUT_84_TEST"].dropna() != 2).all()

    # L4.1: fills only gaps, observed never overwritten; high completeness
    for sc in ("CUT_16", "CUT_50", "CUT_84"):
        base = res[f"NEE_L31_L33_{sc}"]
        filled = res[f"NEE_L31_L33_{sc}_L41"]
        obs = base.notna()
        np.testing.assert_allclose(filled[obs], base[obs], rtol=0)
        assert filled.notna().mean() > 0.97
        flags = res[f"FLAG_L41_NEE_L31_L33_{sc}_FILL"]
        assert set(flags.dropna().unique()) <= {0, 1, 2, 4}

    # L4.2: yearly cumulative is (running) and quadrature is monotone
    cq = res["NEE_L31_L33_CUT_50_L41_CUMQUAD"].to_numpy(dtype=float)
    assert (np.diff(cq[~np.isnan(cq)]) >= -1e-9).all()


def test_levels_are_pure_and_composable(spark, fluxdata):
    df, _ = fluxdata
    l2 = fluxchain.run_level2(df, ["site"], "ts", "NEE", flag_cols=["SSITC"])
    # input frame untouched (pure function), QCF present on the output only
    assert "FLAG_L2_QCF" not in df.columns and "FLAG_L2_QCF" in l2.columns
    l31 = fluxchain.run_level31(l2, ["site"], "ts", "NEE", "SC_SINGLE")
    assert "NEE_L31" in l31.columns and "NEE" in l31.columns
    # set_storage_to_zero passthrough
    z = fluxchain.run_level31(l2, ["site"], "ts", "NEE", "SC_SINGLE",
                              set_storage_to_zero=True)
    pz = z.select("NEE", "NEE_L31").toPandas()
    nn = pz["NEE"].notna()
    np.testing.assert_allclose(pz.loc[nn, "NEE_L31"], pz.loc[nn, "NEE"], rtol=0)


def test_level41_tree_model_fills_leftovers(spark):
    import pandas as pd
    import numpy as np
    from diive_spark.operators import fluxchain
    rng = np.random.default_rng(6)
    n = 48 * 12
    ts = pd.date_range("2023-06-01", periods=n, freq="30min")
    hod = ts.hour.to_numpy() + ts.minute.to_numpy() / 60.0
    truth = 4 + 3 * np.sin(2 * np.pi * hod / 24)
    vals = truth + rng.normal(0, 0.3, n)
    # a long gap the cascade can't fully serve -> model fill takes over
    vals[200:340] = np.nan
    vals[rng.random(n) < 0.05] = np.nan
    df = spark.createDataFrame(pd.DataFrame({
        "site": "s", "ts": ts, "NEE_CUT_50": vals}))
    out = fluxchain.run_level41(
        df, ["site"], "ts", ["NEE_CUT_50"], model="random_forest",
    ).toPandas()
    assert out["NEE_CUT_50_L41"].notna().all()
    flags = out["FLAG_L41_NEE_CUT_50_FILL"]
    assert (flags == 4).sum() > 50       # tree model served the long gap
    filled_long = out.loc[200:339, "NEE_CUT_50_L41"].to_numpy()
    assert np.median(np.abs(filled_long - truth[200:340])) < 1.0
