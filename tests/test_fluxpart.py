"""Nighttime NEE partitioning (closed-form Lloyd-Taylor) vs planted truth."""

import numpy as np
import pandas as pd
import pytest

from diive_spark.operators import fluxpart

TREF_K, T0_K = 288.15, 227.13


def make_data(n_days=60, e0=150.0, seed=2, noise=0.05, n_outliers=10):
    rng = np.random.default_rng(seed)
    n = n_days * 48
    ts = pd.date_range("2023-04-01", periods=n, freq="30min")
    hod = ts.hour.to_numpy() + ts.minute.to_numpy() / 60.0
    night = ((hod < 6) | (hod >= 18)).astype(int)
    t_frac = np.arange(n) / n
    ta = (8.0 + 10.0 * t_frac * 2  # seasonal warming
          + 6.0 * np.sin(2 * np.pi * (hod - 10) / 24)
          + rng.normal(0, 0.8, n))
    b = 1.0 / (TREF_K - T0_K) - 1.0 / (ta + 273.15 - T0_K)
    rref_true = 2.0 + 2.0 * t_frac  # drifting reference respiration
    reco_true = rref_true * np.exp(e0 * b)
    gpp_true = np.where(night == 1, 0.0,
                        8.0 * np.maximum(np.sin(np.pi * (hod - 6) / 12), 0))
    nee = reco_true * np.exp(rng.normal(0, noise, n)) - gpp_true
    # a few gross nighttime outliers: the trim-refit must absorb them
    out_idx = rng.choice(np.flatnonzero(night == 1), n_outliers, replace=False)
    nee[out_idx] *= 8.0
    return pd.DataFrame({"site": "s1", "ts": ts, "NEE": nee, "TA": ta,
                         "NIGHT": night, "RECO_TRUE": reco_true,
                         "GPP_TRUE": gpp_true})


@pytest.fixture(scope="module")
def parted(spark):
    pdf = make_data()
    out = fluxpart.partition_nee_nighttime(
        spark.createDataFrame(pdf), ["site"], "ts", "NEE", "TA", "NIGHT"
    ).orderBy("ts").toPandas()
    return out, pdf


def test_e0_recovered(parted):
    out, _ = parted
    e0 = out["E0"].dropna().unique()
    assert len(e0) == 1
    assert abs(e0[0] - 150.0) < 20.0


def test_reco_tracks_truth_and_identity(parted):
    out, pdf = parted
    ok = out["RECO"].notna()
    assert ok.mean() > 0.95
    reco, truth = out.loc[ok, "RECO"], pdf.loc[ok.to_numpy(), "RECO_TRUE"]
    rel = np.abs(reco.to_numpy() - truth.to_numpy()) / truth.to_numpy()
    assert np.median(rel) < 0.15
    assert np.corrcoef(reco, truth)[0, 1] > 0.95
    # partitioning identity: GPP = RECO - NEE, exactly
    np.testing.assert_allclose(
        out.loc[ok, "GPP"].to_numpy(),
        (out.loc[ok, "RECO"] - out.loc[ok, "NEE"]).to_numpy(), rtol=1e-12)


def test_gpp_daytime_positive_nighttime_small(parted):
    out, pdf = parted
    ok = out["GPP"].notna().to_numpy()
    day = (pdf["NIGHT"].to_numpy() == 0) & ok & (pdf["GPP_TRUE"].to_numpy() > 4)
    assert (out.loc[day, "GPP"] > 0).mean() > 0.95
    # at night GPP is just the respiration residual: small vs daytime uptake
    night = (pdf["NIGHT"].to_numpy() == 1) & ok
    assert out.loc[night, "GPP"].abs().median() < 1.5


def test_rref_interpolation_tracks_drift(parted):
    out, pdf = parted
    ok = out["RREF"].notna().to_numpy()
    t_frac = np.arange(len(pdf)) / len(pdf)
    want = 2.0 + 2.0 * t_frac
    rel = np.abs(out.loc[ok, "RREF"].to_numpy() - want[ok]) / want[ok]
    assert np.median(rel) < 0.1


def test_insufficient_data_yields_nulls(spark):
    pdf = make_data(n_days=6)  # too short for 3 valid E0 windows
    out = fluxpart.partition_nee_nighttime(
        spark.createDataFrame(pdf), ["site"], "ts", "NEE", "TA", "NIGHT"
    ).toPandas()
    assert out["E0"].isna().all()
    assert out["RECO"].isna().all() and out["GPP"].isna().all()


def make_daytime_data(n_days=40, seed=5, alpha=0.06, beta=18.0, rref=2.5,
                      e0=140.0, noise=0.3):
    rng = np.random.default_rng(seed)
    n = n_days * 48
    ts = pd.date_range("2023-05-01", periods=n, freq="30min")
    hod = ts.hour.to_numpy() + ts.minute.to_numpy() / 60.0
    rg = np.maximum(0.0, 700 * np.sin(np.pi * (hod - 6) / 12))
    rg = np.where((hod < 6) | (hod >= 18), 0.0, rg) + rng.uniform(0, 3, n)
    ta = 12 + 7 * np.sin(2 * np.pi * (hod - 14) / 24) + rng.normal(0, 1, n)
    b = 1 / (TREF_K - T0_K) - 1 / (ta + 273.15 - T0_K)
    reco_true = rref * np.exp(e0 * b)
    gpp_true = alpha * beta * rg / (alpha * rg + beta)
    nee = reco_true - gpp_true + rng.normal(0, noise, n)
    return pd.DataFrame({"site": "s1", "ts": ts, "NEE": nee, "TA": ta,
                         "SW_IN": rg, "RECO_TRUE": reco_true,
                         "GPP_TRUE": gpp_true})


def test_daytime_partitioning_recovers_planted_lrc(spark):
    pdf = make_daytime_data()
    out = fluxpart.partition_nee_daytime(
        spark.createDataFrame(pdf), ["site"], "ts", "NEE", "TA", "SW_IN"
    ).orderBy("ts").toPandas()
    e0 = out["E0_DT"].dropna().unique()
    assert len(e0) == 1 and abs(e0[0] - 140.0) < 30.0
    ok = out["GPP_DT"].notna()
    assert ok.mean() > 0.95
    # model GPP tracks the planted light response where it matters (day)
    day = ok.to_numpy() & (pdf["GPP_TRUE"].to_numpy() > 2.0)
    rel = (np.abs(out.loc[day, "GPP_DT"].to_numpy()
                  - pdf.loc[day, "GPP_TRUE"].to_numpy())
           / pdf.loc[day, "GPP_TRUE"].to_numpy())
    assert np.median(rel) < 0.15
    # RECO tracks Lloyd-Taylor truth
    relr = (np.abs(out.loc[ok, "RECO_DT"].to_numpy()
                   - pdf.loc[ok.to_numpy(), "RECO_TRUE"].to_numpy())
            / pdf.loc[ok.to_numpy(), "RECO_TRUE"].to_numpy())
    assert np.median(relr) < 0.2
    # nighttime model GPP is ~0 (Rg ~ 0 -> light response vanishes)
    night = ok.to_numpy() & (pdf["SW_IN"].to_numpy() <= 4.0)
    assert out.loc[night, "GPP_DT"].abs().median() < 0.5


def test_daytime_partitioning_insufficient_data_yields_nulls(spark):
    # 1 day: ~22 daytime rows < the 30-entry window minimum -> no window fits
    pdf = make_daytime_data(n_days=1)
    out = fluxpart.partition_nee_daytime(
        spark.createDataFrame(pdf), ["site"], "ts", "NEE", "TA", "SW_IN"
    ).toPandas()
    assert out["GPP_DT"].isna().all() and out["RECO_DT"].isna().all()
