"""Timestamp-shift detection (operators/timeshift.py) vs the reference's
DetectTimestampShifts (preprocessing/qaqc/detect_timestamp_shifts.py):
planted-offset recovery for all three methods plus reference-EXECUTION
parity for fft_phase_shift / noon_shift / crosscorr."""

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from diive_spark.operators import timeshift
from tests.reference_harness import run_reference

LAT, LON, UTC_OFF = 46.58, 11.43, 1


def _radiation_frame(shift_min=30, days=20, dt_min=30, seed=7,
                     cloudy_days=(), gap_slots=()):
    """Clear-sky-ish measured radiation = potential shifted EARLIER by
    ``shift_min`` (positive convention), scaled 0.85; selected days get
    heavy clouds, selected slots NaN."""
    idx = pd.date_range("2024-06-01", periods=days * 24 * 60 // dt_min,
                        freq=f"{dt_min}min")
    rng = np.random.default_rng(seed)

    def stull(ts):
        doy = ts.dayofyear.to_numpy(dtype=float)
        utc = ts - pd.Timedelta(hours=UTC_OFF)
        doy = utc.dayofyear.to_numpy(dtype=float)
        h = (utc.hour.to_numpy(float) + utc.minute.to_numpy(float) / 60.0)
        phi = math.radians(LAT)
        delta = math.radians(23.45) * np.cos(
            2 * math.pi * (doy - 173) / 365.25)
        lam = math.radians(LON)
        sin_psi = (math.sin(phi) * np.sin(delta)
                   - math.cos(phi) * np.cos(delta)
                   * np.cos(math.pi * h / 12.0 + lam))
        return np.maximum(1361.0 * sin_psi, 0.0)

    pot = stull(idx)
    meas = 0.85 * stull(idx + pd.Timedelta(minutes=shift_min))
    meas = meas + rng.normal(0, 2.0, len(idx))
    meas = np.maximum(meas, 0.0)
    day_idx = ((idx - idx[0]).days).to_numpy()
    for d in cloudy_days:
        meas[day_idx == d] *= 0.1
    for s in gap_slots:
        meas[s] = np.nan
    return pd.DataFrame({"ts": idx, "SW_IN": meas, "POTRAD": pot})


def _to_spark(spark, pdf):
    return spark.createDataFrame(pdf.assign(site="A"))


def test_fft_phase_shift_recovers_planted_offset(spark):
    pdf = _radiation_frame(shift_min=30, cloudy_days=(3,), gap_slots=(100,))
    out = timeshift.fft_phase_shift(
        _to_spark(spark, pdf), ["site"], "ts", "SW_IN", "POTRAD"
    ).toPandas().sort_values("date")
    assert len(out) == 20
    ok = out["shift_minutes"].dropna()
    # cloudy day gated out (NULL shift, amplitude 0)
    cloudy = out[out["date"] == pd.Timestamp("2024-06-04").date()]
    assert cloudy["shift_minutes"].isna().all()
    assert (cloudy["amplitude_meas"] == 0).all()
    assert len(ok) >= 15
    assert abs(ok.median() - 30.0) < 3.0


def test_noon_shift_recovers_planted_offset(spark):
    pdf = _radiation_frame(shift_min=60, cloudy_days=(5,))
    out = timeshift.noon_shift(
        _to_spark(spark, pdf), ["site"], "ts", "SW_IN", "POTRAD"
    ).toPandas()
    # cloudy day excluded entirely (clearness filter)
    assert pd.Timestamp("2024-06-06").date() not in set(out["date"])
    # 30-min sampling quantizes the peak-time difference
    assert abs(out["shift_minutes"].median() - 60.0) <= 30.0


def test_crosscorr_lag_machinery_recovers_sharp_feature():
    """The lag search itself recovers a planted offset when the signal has
    a sharp feature (alignment gain dominates). On smooth clear-sky bells
    the reference's UN-normalized overlap correlation is edge-loss-biased
    toward lag 0 — verified by EXECUTING the reference (it reports 0.0 for
    a 23-min planted shift on smooth 30-min data); the engine mirrors that
    behavior exactly (see the executed-reference parity test below)."""
    ts = np.arange(0, 86400, 60, dtype=float)
    t_h = ts / 3600.0
    pot = 900.0 * np.exp(-((t_h - 12.0) / 0.6) ** 2)  # narrow peak
    meas = 0.9 * 900.0 * np.exp(-((t_h + 37.0 / 60.0 - 12.0) / 0.6) ** 2)
    shift, corr = timeshift.crosscorr_day_kernel(ts, meas, pot)
    # 34 = the reference's exact deterministic output for a 37-min planted
    # shift: the un-normalized overlap correlation under the daytime mask
    # biases the argmax a few minutes toward 0 even on narrow peaks
    assert shift == 34.0
    assert corr > 0.7
    # dark day -> (nan, nan) row; near-zero-potential day -> no row
    s, c = timeshift.crosscorr_day_kernel(ts, meas * 0.1, pot)
    assert np.isnan(s) and np.isnan(c)
    # >=100 daily potential sum but <5 positive records -> no output row
    assert timeshift.crosscorr_day_kernel(
        ts, meas, np.where(ts < 180, 40.0, 0.0)) is None


def test_crosscorr_zero_shift_and_gates(spark):
    pdf = _radiation_frame(shift_min=0, cloudy_days=(2,))
    out = timeshift.crosscorr_shift(
        _to_spark(spark, pdf), ["site"], "ts", "SW_IN", "POTRAD"
    ).toPandas().sort_values("date")
    cloudy = out[out["date"] == pd.Timestamp("2024-06-03").date()]
    assert cloudy["shift_minutes"].isna().all()
    ok = out["shift_minutes"].dropna()
    assert len(ok) >= 15
    assert (ok == 0.0).all()
    assert (out["max_corr"].dropna() > 0.95).all()


def test_auto_potrad_when_pot_missing(spark):
    pdf = _radiation_frame(shift_min=0).drop(columns=["POTRAD"])
    out = timeshift.fft_phase_shift(
        _to_spark(spark, pdf), ["site"], "ts", "SW_IN", "POTRAD",
        lat=LAT, lon=LON, utc_offset=UTC_OFF,
    ).toPandas()
    ok = out["shift_minutes"].dropna()
    # the synthetic Stull approximation differs slightly from the engine's
    # potrad (eccentricity/declination constants): near-zero, not exact
    assert len(ok) >= 10 and abs(ok.median()) < 10.0
    with pytest.raises(ValueError):
        timeshift.noon_shift(_to_spark(spark, pdf), ["site"], "ts",
                             "SW_IN", "POTRAD")


def test_day_local_interpolation_matches_pandas(spark):
    rng = np.random.default_rng(3)
    idx = pd.date_range("2024-01-01", periods=96, freq="30min")
    v = rng.normal(100, 10, 96)
    v[[0, 1, 10, 11, 12, 13, 14, 15, 16, 40, 94, 95]] = np.nan
    pdf = pd.DataFrame({"ts": idx, "v": v, "site": "A"})
    sdf = spark.createDataFrame(pdf).withColumn("_date", F.to_date("ts"))
    filled = sdf.withColumn(
        "fill", timeshift._interp_in_day(
            F.col("v"), ["site", "_date"], "ts", 4)
    ).toPandas().sort_values("ts")["fill"].to_numpy()
    expected = np.concatenate([
        pd.Series(v[:48]).interpolate(method="linear", limit=4).to_numpy(),
        pd.Series(v[48:]).interpolate(method="linear", limit=4).to_numpy(),
    ])
    assert np.allclose(filled, expected, equal_nan=True)


def test_pchip_matches_reference_conditions():
    x = np.array([0.0, 1.0, 2.5, 3.0, 5.0])
    y = np.array([0.0, 2.0, 2.0, 3.0, 2.0])
    xq = np.linspace(0, 5, 101)
    out = timeshift.pchip_interpolate(x, y, xq)
    # interpolates the knots exactly
    assert np.allclose(timeshift.pchip_interpolate(x, y, x), y)
    # monotone segments stay inside their bracket (no overshoot)
    seg = out[(xq >= 1.0) & (xq <= 2.5)]
    assert seg.min() >= 2.0 - 1e-12 and seg.max() <= 2.0 + 1e-12
    # linear data reproduces the line exactly
    yl = 3.0 * x + 1.0
    assert np.allclose(timeshift.pchip_interpolate(x, yl, xq), 3 * xq + 1)


_REF_COMMON = r"""
import scipy, scipy.signal, scipy.interpolate
scipy.__version__ = "1.11.0"
def _corr(a, b, mode='full', method='auto'):
    return np.correlate(np.asarray(a, float), np.asarray(b, float), mode)
scipy.signal.correlate = _corr
sys.path.insert(0, "/root/repo")
from diive_spark.operators.timeshift import pchip_interpolate as _pchip_eval
def _pchip(xi, yi, x, der=0, axis=0):
    return _pchip_eval(np.asarray(xi, float), np.asarray(yi, float),
                       np.asarray(x, float))
scipy.interpolate.pchip_interpolate = _pchip
from diive.preprocessing.qaqc.detect_timestamp_shifts import DetectTimestampShifts
import io
pdf = pd.read_json(io.StringIO(PDF_JSON))
pdf["ts"] = pd.to_datetime(pdf["ts"], unit="ms")
pdf = pdf.set_index("ts")
det = DetectTimestampShifts(pdf, col_meas="SW_IN", col_pot="POTRAD")
"""


def _ref_snippet(body, pdf):
    payload = pdf.to_json(date_unit="ms")
    return f"PDF_JSON = {payload!r}\n" + _REF_COMMON + body


def test_fft_phase_shift_matches_executed_reference(spark):
    """Engine fft_phase_shift == the reference's DetectTimestampShifts
    .fft_phase_shift EXECUTED on the same frame (NaN-positions + values)."""
    pdf = _radiation_frame(shift_min=17, cloudy_days=(4,),
                           gap_slots=(60, 61, 200))
    ref = run_reference(_ref_snippet(r"""
res = det.fft_phase_shift()
print(json.dumps({
    "dates": [str(d.date()) for d in res.index],
    "shift": [None if not np.isfinite(v) else float(v)
              for v in res["shift_minutes"]],
    "amp": [float(v) for v in res["amplitude_meas"]],
}))
""", pdf))
    out = timeshift.fft_phase_shift(
        _to_spark(spark, pdf), ["site"], "ts", "SW_IN", "POTRAD"
    ).toPandas().sort_values("date").reset_index(drop=True)
    assert [str(d) for d in out["date"]] == ref["dates"]
    for got, want in zip(out["shift_minutes"], ref["shift"]):
        if want is None:
            assert pd.isna(got)
        else:
            assert abs(got - want) < 1e-6
    assert np.allclose(out["amplitude_meas"], ref["amp"], rtol=1e-9)


def test_noon_shift_matches_executed_reference(spark):
    pdf = _radiation_frame(shift_min=41, cloudy_days=(1, 8))
    ref = run_reference(_ref_snippet(r"""
res = det.noon_shift()
print(json.dumps({
    "dates": [str(d.date()) for d in res.index],
    "shift": [float(v) for v in res],
}))
""", pdf))
    out = timeshift.noon_shift(
        _to_spark(spark, pdf), ["site"], "ts", "SW_IN", "POTRAD"
    ).toPandas().sort_values("date").reset_index(drop=True)
    assert [str(d) for d in out["date"]] == ref["dates"]
    assert np.allclose(out["shift_minutes"], ref["shift"])


def test_crosscorr_matches_executed_reference(spark):
    """Lag-search parity. The reference run stubs scipy.signal.correlate
    with the numpy equivalent (same definition) and pchip with the
    ENGINE's Fritsch-Carlson evaluator — so the pchip values themselves
    are self-parity (documented); the grouping, clearness/darkness gates,
    daytime mask, lag window and normalization are genuinely
    cross-checked."""
    pdf = _radiation_frame(shift_min=37, cloudy_days=(6,), gap_slots=(300,))
    ref = run_reference(_ref_snippet(r"""
res = det.crosscorr()
print(json.dumps({
    "dates": [str(d.date()) for d in res.index],
    "shift": [None if not np.isfinite(v) else float(v)
              for v in res["shift_minutes"]],
    "corr": [None if not np.isfinite(v) else float(v)
             for v in res["max_corr"]],
}))
""", pdf))
    out = timeshift.crosscorr_shift(
        _to_spark(spark, pdf), ["site"], "ts", "SW_IN", "POTRAD"
    ).toPandas().sort_values("date").reset_index(drop=True)
    assert [str(d) for d in out["date"]] == ref["dates"]
    for got, want in zip(out["shift_minutes"], ref["shift"]):
        assert (pd.isna(got) and want is None) or got == want
    for got, want in zip(out["max_corr"], ref["corr"]):
        assert (pd.isna(got) and want is None) or abs(got - want) < 1e-9


def test_crosscorr_upsample_sec_returns_minutes():
    """ADVICE r5: lag indices step by upsample_sec — shift must come back
    in MINUTES for any grid, and max_shift_min must mask in minutes."""
    ts = np.arange(0, 86400, 60, dtype=float)
    t_h = ts / 3600.0
    pot = 900.0 * np.exp(-((t_h - 12.0) / 0.6) ** 2)
    meas = 0.9 * 900.0 * np.exp(-((t_h + 37.0 / 60.0 - 12.0) / 0.6) ** 2)
    s60, _ = timeshift.crosscorr_day_kernel(ts, meas, pot, upsample_sec=60)
    s30, _ = timeshift.crosscorr_day_kernel(ts, meas, pot, upsample_sec=30)
    s120, _ = timeshift.crosscorr_day_kernel(ts, meas, pot, upsample_sec=120)
    # all grids agree on the minute-scale answer (finer grid = finer quantum)
    assert abs(s30 - s60) <= 1.0
    assert abs(s120 - s60) <= 2.0
    # masking in minutes: a 10-min window cannot return a 34-min lag
    s_cap, _ = timeshift.crosscorr_day_kernel(
        ts, meas, pot, upsample_sec=30, max_shift_min=10)
    assert abs(s_cap) <= 10.0
