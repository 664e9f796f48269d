"""ONEFlux nighttime partitioning (operators/oneflux_nt.py) vs the
reference flux/partitioning/nighttime_oneflux.py: planted-parameter
recovery for the scipy-free LM, and reference-EXECUTION parity for the
full per-year pipeline (the reference runs with the ENGINE's leastsq_lm
injected in place of scipy's — shared optimizer, genuinely cross-checked
window logic / percentiles / gates / re-analysis)."""

import numpy as np
import pandas as pd

from diive_spark.operators import oneflux_nt
from tests.reference_harness import run_reference

LAT = 46.0


def _year_frame(n_days=365, seed=4, rref=3.0, e0=150.0):
    rng = np.random.default_rng(seed)
    idx = pd.date_range("2023-01-01", periods=n_days * 48, freq="30min")
    doy = idx.dayofyear.to_numpy(float)
    hr = idx.hour.to_numpy(float) + idx.minute.to_numpy(float) / 60.0
    ta = (8 + 10 * np.sin((doy - 100) / 365 * 2 * np.pi)
          + 5 * np.sin((hr - 9) / 24 * 2 * np.pi)
          + rng.normal(0, 1.0, len(idx)))
    sw = np.maximum(0.0, 800 * np.sin(np.pi * (hr - 6) / 12)) \
        * (np.abs(hr - 12) < 6)
    resp = oneflux_nt.lloyd_taylor(ta, rref, e0)
    uptake = np.where(sw > 0, 0.02 * sw, 0.0)
    nee = resp - uptake + rng.normal(0, 0.4, len(idx))
    nee[rng.integers(0, len(idx), 300)] = np.nan  # gaps in measured NEE
    nee_f = np.where(np.isfinite(nee), nee, resp - uptake)
    # quantize to 1/64 steps: exactly-representable doubles survive the
    # pandas to_json round-trip into the reference subprocess losslessly
    q = lambda a: np.round(a * 64) / 64  # noqa: E731
    return pd.DataFrame({"ts": idx, "NEE": q(nee), "TA": q(ta),
                         "SW_IN": q(sw), "NEE_F": q(nee_f), "TA_F": q(ta),
                         "doy": doy, "hr": hr})


def test_leastsq_lm_recovers_lloyd_taylor_params():
    rng = np.random.default_rng(1)
    ta = rng.uniform(-5, 25, 800)
    y = oneflux_nt.lloyd_taylor(ta, 2.5, 180.0) + rng.normal(0, 0.05, 800)

    def resid(p):
        return y - oneflux_nt.lloyd_taylor(ta, p[0], p[1])

    pars, cov, info, _msg, ier = oneflux_nt.leastsq_lm(resid, [2.0, 200.0])
    assert ier == 1
    assert abs(pars[0] - 2.5) < 0.05
    assert abs(pars[1] - 180.0) < 6.0
    assert cov is not None and cov.shape == (2, 2)
    # trimmed wrapper survives heavy outliers
    y2 = y.copy()
    y2[::50] += 40.0
    fit = oneflux_nt.fit_lloyd_taylor_trimmed(y2, ta)
    assert fit is not None
    assert abs(fit[0] - 2.5) < 0.1 and abs(fit[1] - 180.0) < 12.0


def test_rank_percentile_matches_executed_reference():
    rng = np.random.default_rng(2)
    vals = rng.normal(0, 1, 57)
    vals[5] = np.nan
    vals_json = [None if np.isnan(v) else float(v) for v in vals]
    ref = run_reference(f"""
import numpy as np
from diive.flux.partitioning.nighttime_oneflux import _pct
vals = np.array([np.nan if v is None else v for v in {vals_json!r}])
print(json.dumps({{"p": [
    _pct(vals, p) for p in (50.0, 90.0, 95.0, 99.0, 10.0)]}}))
""")
    got = [oneflux_nt.rank_percentile(vals, p)
           for p in (50.0, 90.0, 95.0, 99.0, 10.0)]
    assert np.allclose(got, ref["p"])


def test_partition_year_matches_executed_reference(tmp_path):
    """Full per-year pipeline parity: the reference module runs with the
    engine's leastsq_lm monkey-patched over its scipy import, so both
    sides share the optimizer and every other step (night mask, windowed
    fits, E0 selection + gates, Rref re-analysis, interpolation) is
    genuinely cross-checked value-for-value."""
    pdf = _year_frame()
    payload = tmp_path / "year.json"
    payload.write_text(pdf.to_json())
    ref = run_reference(f"""
sys.path.insert(0, "/root/repo")
from diive_spark.operators.oneflux_nt import leastsq_lm
import diive.flux.partitioning.nighttime_oneflux as nt
nt.leastsq = leastsq_lm
pdf = pd.read_json({str(payload)!r})
res = nt._partition_one_year(
    nee=pdf["NEE"].to_numpy(), tair=pdf["TA"].to_numpy(),
    sw_in=pdf["SW_IN"].to_numpy(), nee_f=pdf["NEE_F"].to_numpy(),
    tair_f=pdf["TA_F"].to_numpy(), doy=pdf["doy"].to_numpy(),
    hr=pdf["hr"].to_numpy(), lat={LAT}, verbose=0)
def ser(a):
    return [None if not np.isfinite(v) else float(v) for v in a]
print(json.dumps({{k: ser(v) for k, v in res.items()}}))
""")
    got = oneflux_nt.partition_year_arrays(
        pdf["NEE"].to_numpy(), pdf["TA"].to_numpy(),
        pdf["SW_IN"].to_numpy(), pdf["NEE_F"].to_numpy(),
        pdf["TA_F"].to_numpy(), pdf["doy"].to_numpy(),
        pdf["hr"].to_numpy(), LAT)
    for col in oneflux_nt.OUT_COLS:
        want = np.array([np.nan if v is None else v for v in ref[col]])
        g = got[col]
        assert np.array_equal(np.isnan(g), np.isnan(want)), col
        m = np.isfinite(want)
        assert np.allclose(g[m], want[m], rtol=1e-9, atol=1e-12), col


def test_partition_spark_recovers_planted_params(spark):
    pdf = _year_frame(rref=3.0, e0=150.0).assign(site="A")
    out = oneflux_nt.partition_nee_nighttime_oneflux(
        spark.createDataFrame(pdf.drop(columns=["doy", "hr"])),
        ["site"], "ts", nee_col="NEE", ta_col="TA", swin_col="SW_IN",
        nee_f_col="NEE_F", ta_f_col="TA_F", lat=LAT,
    ).toPandas().sort_values("ts").reset_index(drop=True)
    assert len(out) == len(pdf)
    e0 = out["E0_NT_OF"].dropna().iloc[0]
    assert abs(e0 - 150.0) < 25.0
    # RECO tracks the planted respiration
    truth = oneflux_nt.lloyd_taylor(pdf["TA"].to_numpy(), 3.0, 150.0)
    reco = out["RECO_NT_OF"].to_numpy()
    m = np.isfinite(reco)
    assert m.sum() > 0.9 * len(pdf)
    rel = np.abs(reco[m] - truth[m]) / np.maximum(truth[m], 0.5)
    assert np.median(rel) < 0.15
    # GPP = RECO - NEE_f wherever both defined
    gpp = out["GPP_NT_OF"].to_numpy()
    assert np.allclose(gpp[m], reco[m] - pdf["NEE_F"].to_numpy()[m],
                       equal_nan=True)