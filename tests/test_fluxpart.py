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


# --------------------------------------------------------------------------- #
# Daytime VPD limitation term + degenerate-parameter fallback cascade
# --------------------------------------------------------------------------- #
def make_daytime_data_vpd(n_days=40, seed=5, alpha=0.06, beta=18.0, k=0.08,
                          rref=2.5, e0=140.0, noise=0.25):
    """Planted Lasslop-with-VPD data: dry afternoons push VPD well past
    VPD0=10 hPa so the limitation term is ACTIVE (f(VPD) down to ~0.3)."""
    rng = np.random.default_rng(seed)
    n = n_days * 48
    ts = pd.date_range("2023-05-01", periods=n, freq="30min")
    hod = ts.hour.to_numpy() + ts.minute.to_numpy() / 60.0
    rg = np.maximum(0.0, 700 * np.sin(np.pi * (hod - 6) / 12))
    rg = np.where((hod < 6) | (hod >= 18), 0.0, rg) + rng.uniform(0, 3, n)
    ta = 12 + 7 * np.sin(2 * np.pi * (hod - 14) / 24) + rng.normal(0, 1, n)
    # VPD peaks mid-afternoon at ~25 hPa, nights ~3 hPa
    vpd = np.maximum(0.5, 3 + 22 * np.maximum(0.0, np.sin(
        np.pi * (hod - 8) / 13)) + rng.normal(0, 0.8, n))
    b = 1 / (TREF_K - T0_K) - 1 / (ta + 273.15 - T0_K)
    reco_true = rref * np.exp(e0 * b)
    fv = np.minimum(np.exp(-k * (vpd - 10.0)), 1.0)
    beff = beta * fv
    gpp_true = alpha * beff * rg / (alpha * rg + beff)
    nee = reco_true - gpp_true + rng.normal(0, noise, n)
    return pd.DataFrame({"site": "s1", "ts": ts, "NEE": nee, "TA": ta,
                         "SW_IN": rg, "VPD": vpd, "RECO_TRUE": reco_true,
                         "GPP_TRUE": gpp_true})


def test_daytime_vpd_recovers_planted_model(spark):
    pdf = make_daytime_data_vpd()
    out = fluxpart.partition_nee_daytime(
        spark.createDataFrame(pdf), ["site"], "ts", "NEE", "TA", "SW_IN",
        vpd_col="VPD",
    ).orderBy("ts").toPandas()
    ok = out["GPP_DT"].notna()
    assert ok.mean() > 0.95
    day = ok.to_numpy() & (pdf["GPP_TRUE"].to_numpy() > 2.0)
    rel = (np.abs(out.loc[day, "GPP_DT"].to_numpy()
                  - pdf.loc[day, "GPP_TRUE"].to_numpy())
           / pdf.loc[day, "GPP_TRUE"].to_numpy())
    assert np.median(rel) < 0.15


def test_daytime_vpd_term_beats_novpd_in_dry_air(spark):
    """Where VPD limitation is active (dry afternoons), the full model's GPP
    must track the planted values more closely than the VPD-less fit — the
    round-3 documented bias this term removes."""
    # moderate planted k: strong enough to bias the VPD-less fit, mild
    # enough that its windows still pass the validity bounds (at k >= 0.05
    # the VPD-less alpha runs past 0.22 and every window drops — itself the
    # failure mode the term exists to prevent)
    pdf = make_daytime_data_vpd(k=0.03)
    sdf = spark.createDataFrame(pdf)
    with_vpd = fluxpart.partition_nee_daytime(
        sdf, ["site"], "ts", "NEE", "TA", "SW_IN", vpd_col="VPD",
        gpp_col="GPP_V", reco_col="RECO_V").select("ts", "GPP_V")
    no_vpd = fluxpart.partition_nee_daytime(
        sdf, ["site"], "ts", "NEE", "TA", "SW_IN",
        gpp_col="GPP_N", reco_col="RECO_N").select("ts", "GPP_N")
    both = (with_vpd.join(no_vpd, "ts").orderBy("ts").toPandas()
            .merge(pdf[["ts", "VPD", "GPP_TRUE"]], on="ts"))
    dry = (both["VPD"] > 18) & (both["GPP_TRUE"] > 2) & both["GPP_V"].notna() \
        & both["GPP_N"].notna()
    err_v = np.abs(both.loc[dry, "GPP_V"] - both.loc[dry, "GPP_TRUE"]).median()
    err_n = np.abs(both.loc[dry, "GPP_N"] - both.loc[dry, "GPP_TRUE"]).median()
    assert err_v < err_n * 0.7, (err_v, err_n)


def _window_inputs(pdf, e0=140.0):
    ts = pdf["ts"].to_numpy(dtype="datetime64[ns]").astype(np.int64) / 1e9
    nee = pdf["NEE"].to_numpy(float)
    ta = pdf["TA"].to_numpy(float)
    rg = pdf["SW_IN"].to_numpy(float)
    b = 1 / (TREF_K - T0_K) - 1 / (ta + 273.15 - T0_K)
    tfac = np.exp(e0 * b)
    day0 = np.floor((ts - ts[0]) / 86400.0).astype(np.int64)
    day_valid = np.isfinite(nee) & (rg > 4.0)
    return nee, rg, tfac, day0, day_valid


def test_fit_lrc_windows_recovers_k():
    pdf = make_daytime_data_vpd(k=0.08, noise=0.1)
    nee, rg, tfac, day0, day_valid = _window_inputs(pdf)
    P, C, models, _e0s = fluxpart.fit_lrc_windows(
        nee, rg, tfac, pdf["VPD"].to_numpy(float), day0, day_valid)
    assert len(P) > 10
    # most windows keep the full VPD model and recover k near the plant
    assert (models == 0).mean() > 0.6
    kk = P[models == 0, 2]
    assert abs(np.median(kk) - 0.08) < 0.04


def test_fit_lrc_windows_k_negative_drops_vpd_term():
    """Uptake that GROWS with VPD fits k < 0 -> the cascade must drop the
    VPD term (model 1, k forced to 0) rather than keep a negative k."""
    pdf = make_daytime_data_vpd(k=0.0, noise=0.1)
    # plant a MILD anti-VPD response (uptake boosted in dry air): the
    # 4-param fit prefers k < 0, and the refit without the VPD term stays
    # well-conditioned (a strong anti-response degenerates the hyperbola
    # and the window is legitimately dropped by the validity bounds)
    boost = 1.0 + 0.01 * np.maximum(pdf["VPD"].to_numpy() - 10.0, 0.0)
    nee = (pdf["RECO_TRUE"].to_numpy()
           - pdf["GPP_TRUE"].to_numpy() * boost)
    nee_pdf = pdf.assign(NEE=nee)
    nee_arr, rg, tfac, day0, day_valid = _window_inputs(nee_pdf)
    P, C, models, _e0s = fluxpart.fit_lrc_windows(
        nee_arr, rg, tfac, pdf["VPD"].to_numpy(float), day0, day_valid)
    assert len(P) > 5
    assert np.all(P[:, 2] >= 0.0)           # no negative k survives
    assert (models == 1).mean() > 0.5       # VPD term dropped


def test_fit_lrc_windows_respiration_only_fallback():
    """NEE that INCREASES with light (no uptake) drives alpha/beta negative;
    the cascade must land on the respiration-only model (4) with a=b=0."""
    pdf = make_daytime_data_vpd(noise=0.1)
    nee = pdf["RECO_TRUE"].to_numpy() + 0.004 * pdf["SW_IN"].to_numpy() \
        + np.random.default_rng(0).normal(0, 0.1, len(pdf))
    nee_pdf = pdf.assign(NEE=nee)
    nee_arr, rg, tfac, day0, day_valid = _window_inputs(nee_pdf)
    P, C, models, _e0s = fluxpart.fit_lrc_windows(
        nee_arr, rg, tfac, pdf["VPD"].to_numpy(float), day0, day_valid)
    assert len(P) > 5
    assert (models == 4).mean() > 0.5
    m4 = models == 4
    assert np.all(P[m4, 0] == 0.0) and np.all(P[m4, 1] == 0.0)
    # the closed-form respiration projection absorbs the positive light
    # slope (so r is biased ABOVE the planted rref — the reference's
    # LloydT_E0fix on the same rows behaves the same way), but stays
    # positive and bounded
    assert np.all(P[m4, 3] > 0)
    assert 2.5 < np.median(P[m4, 3]) < 8.0


def test_daytime_per_window_e0_tracks_drifting_sensitivity(spark):
    """ONEFlux per-window E0 refit: plant a temperature sensitivity that
    CHANGES mid-record — per-window E0 must track both regimes (a single
    global E0 cannot), and GPP must stay accurate in both halves."""
    half_days = 24
    p1 = make_daytime_data_vpd(n_days=half_days, k=0.0, e0=90.0, seed=2)
    p2 = make_daytime_data_vpd(n_days=half_days, k=0.0, e0=220.0, seed=4)
    p2 = p2.assign(ts=p2["ts"] + pd.Timedelta(days=half_days))
    pdf = pd.concat([p1, p2], ignore_index=True)
    out = fluxpart.partition_nee_daytime(
        spark.createDataFrame(pdf), ["site"], "ts", "NEE", "TA", "SW_IN",
        vpd_col="VPD", e0_mode="per_window",
    ).orderBy("ts").toPandas()
    ok = out["E0_DT"].notna() & (out["E0_DT"] > 0)
    assert ok.mean() > 0.9
    n_half = half_days * 48
    e0_first = out.loc[: n_half - 1, "E0_DT"].iloc[100: n_half - 300].median()
    e0_second = out.loc[n_half:, "E0_DT"].iloc[300:-100].median()
    assert abs(e0_first - 90.0) < 40.0, e0_first
    assert abs(e0_second - 220.0) < 60.0, e0_second
    assert e0_second - e0_first > 60.0  # the drift is resolved
    day = (pdf["GPP_TRUE"].to_numpy() > 2.0) & out["GPP_DT"].notna().to_numpy()
    rel = (np.abs(out.loc[day, "GPP_DT"].to_numpy()
                  - pdf.loc[day, "GPP_TRUE"].to_numpy())
           / pdf.loc[day, "GPP_TRUE"].to_numpy())
    assert np.median(rel) < 0.2


def test_daytime_weighted_fits_with_mds_sigma(spark):
    """ONEFlux sigma weighting: heteroscedastic noise (afternoon noise 6x)
    with the MDS-uncertainty weights — the weighted fit must still recover
    the planted model, and at least match the unweighted GPP accuracy."""
    pdf = make_daytime_data_vpd(k=0.05, noise=0.15, seed=8)
    hod = pdf["ts"].dt.hour.to_numpy() + pdf["ts"].dt.minute.to_numpy() / 60.0
    extra = np.where((hod >= 12) & (hod < 17), 1.0, 0.0)
    rng = np.random.default_rng(1)
    pdf = pdf.assign(NEE=pdf["NEE"] + rng.normal(0, 0.9, len(pdf)) * extra)
    sdf = spark.createDataFrame(pdf)
    wtd = fluxpart.partition_nee_daytime(
        sdf, ["site"], "ts", "NEE", "TA", "SW_IN", vpd_col="VPD",
        weighted=True, gpp_col="GPP_W", reco_col="RECO_W",
    ).orderBy("ts").toPandas()
    unw = fluxpart.partition_nee_daytime(
        sdf, ["site"], "ts", "NEE", "TA", "SW_IN", vpd_col="VPD",
        gpp_col="GPP_U", reco_col="RECO_U",
    ).orderBy("ts").toPandas()
    day = (pdf["GPP_TRUE"].to_numpy() > 2.0)
    okw = wtd["GPP_W"].notna().to_numpy() & day
    oku = unw["GPP_U"].notna().to_numpy() & day
    assert okw.mean() > 0.3 and oku.mean() > 0.3
    err_w = np.median(np.abs(wtd.loc[okw, "GPP_W"].to_numpy()
                             - pdf.loc[okw, "GPP_TRUE"].to_numpy()))
    err_u = np.median(np.abs(unw.loc[oku, "GPP_U"].to_numpy()
                             - pdf.loc[oku, "GPP_TRUE"].to_numpy()))
    assert err_w < 1.0          # recovers the planted model
    assert err_w <= err_u * 1.1  # weighting never hurts here
