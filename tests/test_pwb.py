"""PWB time-lag detection (operators/pwb.py) vs the reference
flux/hires/lag_pwb.py (Vitale et al. 2024): planted-lag recovery and
reference-EXECUTION parity. The reference runs with numpy shims for its
four scipy imports (correlate/detrend/lfilter/gaussian_kde — the same
math the engine uses), and both sides consume an identically-shaped RNG
stream, so the bootstrap draws align and the comparison is value-exact
on the lag distribution, mode, HDI and CCF diagnostics."""

import numpy as np
import pandas as pd

from diive_spark.operators import pwb
from tests.reference_harness import run_reference


def _segment(hz=10, n=6000, lag=23, seed=2):
    rng = np.random.default_rng(seed)

    def ar1(a, scale):
        e = rng.normal(0, scale, n + 500)
        x = np.empty(n + 500)
        x[0] = e[0]
        for i in range(1, n + 500):
            x[i] = a * x[i - 1] + e[i]
        return x[500:]

    w = ar1(0.9, 0.3)
    tsonic = 0.6 * w + ar1(0.9, 0.2) + 293.0
    scalar = np.r_[np.zeros(lag), 0.15 * w[:-lag]] \
        + 0.5 * ar1(0.95, 0.4) + 400.0
    q = lambda a: np.round(a * 4096) / 4096  # noqa: E731 (JSON-lossless)
    return q(w), q(scalar), q(tsonic)


def test_pwb_recovers_planted_lag():
    w, s, t = _segment()
    res = pwb.pwb_detect(w, s, t, hz=10, seed=42)
    # the full-data pre-whitened CCF nails the planted 2.3 s exactly
    assert res["tlag_pw_s"] == 2.3
    # bootstrap mode within the smoothing width of the truth, tight HDI
    assert abs(res["tlag_s"] - 2.3) <= 0.3
    assert res["hdi_lo_s"] - 0.01 <= 2.3 + 0.3
    assert res["is_reliable"]
    assert not res["is_edge_pinned"]
    assert res["ar_order_scalar"] >= 1 and res["ar_order_w"] >= 1


def test_pwb_primitives():
    rng = np.random.default_rng(1)
    # AR selection recovers a planted AR(2)
    e = rng.normal(0, 1, 6000)
    x = np.empty(6000)
    x[:2] = e[:2]
    for i in range(2, 6000):
        x[i] = 0.5 * x[i - 1] + 0.3 * x[i - 2] + e[i]
    phi, p = pwb.ar_select_aic(x)
    assert p >= 2
    assert abs(phi[0] - 0.5) < 0.08 and abs(phi[1] - 0.3) < 0.08
    # pre-whitened residuals are near-white (lag-1 autocorr ~ 0)
    r = pwb.prewhiten(x, phi)
    rv = r[np.isfinite(r)]
    assert abs(np.corrcoef(rv[1:], rv[:-1])[0, 1]) < 0.05
    # stationarity: white noise passes, random walk fails
    assert pwb.breitung_is_stationary(e)
    assert not pwb.breitung_is_stationary(np.cumsum(e))
    # HDI brackets the mass of a known sample
    lo, hi = pwb.hdi(np.r_[np.zeros(97), 50.0, -50.0])
    assert lo == 0.0 and hi == 0.0


def test_pwb_matches_executed_reference(tmp_path):
    w, s, t = _segment(n=4000, lag=17)
    pdf = pd.DataFrame({"W": w, "S": s, "T": t})
    payload = tmp_path / "seg.json"
    payload.write_text(pdf.to_json())
    ref = run_reference(f"""
import numpy as np
import scipy, scipy.signal, scipy.stats
scipy.__version__ = "1.11.0"
def _corr(a, v, mode='full', method='auto'):
    return np.correlate(np.asarray(a, float), np.asarray(v, float), mode)
scipy.signal.correlate = _corr
sys.path.insert(0, "/root/repo")
from diive_spark.operators.pwb import linear_detrend
def _detrend(x, type='linear', axis=-1):
    return linear_detrend(x) if type == 'linear' else x - np.mean(x)
scipy.signal.detrend = _detrend
def _lfilter(b, a, x):
    return np.convolve(np.asarray(x, float), np.asarray(b, float))[:len(x)]
scipy.signal.lfilter = _lfilter
class _KDE:
    def __init__(self, z, bw_method=None):
        self.z = np.asarray(z, float)
        self.bw = self.z.std(ddof=1) * len(self.z) ** (-1.0 / 5.0)
    def __call__(self, grid):
        g = np.atleast_1d(np.asarray(grid, float))
        return np.exp(-0.5 * ((g[:, None] - self.z[None, :])
                              / self.bw) ** 2).sum(axis=1)
scipy.stats.gaussian_kde = _KDE
import diive.flux.hires.lag_pwb as lp
lp._signal_correlate = _corr
lp._detrend = _detrend
lp.lfilter = _lfilter
lp.gaussian_kde = _KDE
pdf = pd.read_json({str(payload)!r})
det = lp.PreWhiteningBootstrap(
    df=pdf, var_w="W", var_scalar="S", var_tsonic="T", hz=10,
    lag_max_s=10.0, n_bootstrap=99, random_state=42)
det.run()
print(json.dumps({{
    "tlag_pw_s": det.tlag_pw_s, "corr_pw": det.corr_pw,
    "tlag_records": int(det._tlag_records),
    "tlag_s": None if not np.isfinite(det.tlag_s) else det.tlag_s,
    "hdi_lo_s": None if not np.isfinite(det.hdi_lo_s) else det.hdi_lo_s,
    "hdi_hi_s": None if not np.isfinite(det.hdi_hi_s) else det.hdi_hi_s,
    "best": det._best_combination,
    "ar_orders": det._ar_orders,
    "cov_pwb": det.cov_pwb,
    "lags": [int(v) for v in det._bootstrap_lags],
    "is_reliable": bool(det.is_reliable),
}}))
""", timeout=900)
    got = pwb.pwb_detect(w, s, t, hz=10, seed=42)
    assert got["tlag_pw_s"] == ref["tlag_pw_s"]
    assert abs(got["corr_pw"] - ref["corr_pw"]) < 1e-9
    assert got["ar_order_scalar"] == ref["ar_orders"]["scalar"]
    assert got["ar_order_w"] == ref["ar_orders"]["w"]
    assert got["ar_order_tsonic"] == ref["ar_orders"]["tsonic"]
    # identically-shaped RNG streams -> identical bootstrap lag draws
    assert got["tlag_records"] == ref["tlag_records"]
    assert got["combination"] == ref["best"]
    assert got["tlag_s"] == ref["tlag_s"]
    assert abs(got["hdi_lo_s"] - ref["hdi_lo_s"]) < 1e-12
    assert abs(got["hdi_hi_s"] - ref["hdi_hi_s"]) < 1e-12
    assert abs(got["cov_pwb"] - ref["cov_pwb"]) < 1e-9
    assert got["is_reliable"] == ref["is_reliable"]


def test_pwb_spark_wrapper(spark):
    w, s, t = _segment(n=3000, lag=12)
    pdf = pd.DataFrame({"seg": "A", "rec": np.arange(len(w)),
                        "W": w, "S": s, "T": t})
    out = pwb.pwb_lag_detection(
        spark.createDataFrame(pdf), ["seg"], "rec",
        w_col="W", scalar_col="S", tsonic_col="T", hz=10,
    ).toPandas()
    assert len(out) == 1
    row = out.iloc[0]
    assert row["tlag_pw_s"] == 1.2
    assert abs(row["tlag_s"] - 1.2) <= 0.3
    assert row["combination"] in ("cw", "wc", "ct", "tc")
    # deterministic: same key -> same seed -> same result
    out2 = pwb.pwb_lag_detection(
        spark.createDataFrame(pdf), ["seg"], "rec",
        w_col="W", scalar_col="S", tsonic_col="T", hz=10).toPandas()
    pd.testing.assert_frame_equal(out.sort_index(axis=1),
                                  out2.sort_index(axis=1))


def test_chunked_pwb_pipeline(spark):
    """Two 10-minute chunks with DIFFERENT planted lags: the pipeline
    detects each chunk's lag on the rotated wind and aligns the scalar
    per chunk."""
    hz = 10
    rng = np.random.default_rng(7)

    def chunk(lag, n=6000):
        def ar1(a, scale):
            e = rng.normal(0, scale, n + 300)
            x = np.empty(n + 300)
            x[0] = e[0]
            for i in range(1, n + 300):
                x[i] = a * x[i - 1] + e[i]
            return x[300:]
        w = ar1(0.9, 0.3)
        t = 0.6 * w + ar1(0.9, 0.2) + 293.0
        s = np.r_[np.zeros(lag), 0.2 * w[:-lag]] + 0.3 * ar1(0.9, 0.3) + 400
        return w, s, t

    from pyspark.sql import functions as F

    frames = []
    base = 1_700_000_400  # on the 600 s wall-clock grid
    for ci, lag in enumerate((12, 31)):
        w, s, t = chunk(lag)
        frames.append(pd.DataFrame({
            "site": "A",
            "ts": base + ci * 600 + np.arange(len(w)) / hz,
            "u": 2.0 + w * 0.5, "v": 0.3 + w * 0.1, "w": w * 0.2,
            "scalar": s, "tsonic": t}))
    pdf = pd.concat(frames)
    sdf = spark.createDataFrame(pdf).withColumn(
        "ts", F.timestamp_seconds(F.col("ts")))
    corrected, lags = pwb.chunked_pwb_pipeline(
        sdf, ["site"], "ts", u_col="u", v_col="v", w_col="w",
        scalar_col="scalar", tsonic_col="tsonic", hz=hz,
        chunk_seconds=600, min_chunk_seconds=60, lag_max_s=5.0)
    lag_rows = lags.toPandas().sort_values("_chunk").reset_index(drop=True)
    assert len(lag_rows) == 2
    assert abs(lag_rows["tlag_s"].iloc[0] - 1.2) <= 0.4
    assert abs(lag_rows["tlag_s"].iloc[1] - 3.1) <= 0.4
    out = corrected.toPandas()
    assert "scalar_LAGGED" in out.columns
    assert len(out) == len(pdf)
    # after alignment the scalar correlates with w at lag ~0 per chunk
    for ci in range(2):
        sub = out[out["_chunk"] == out["_chunk"].min() + ci * 600] \
            .sort_values("ts")
        a = sub["w"].to_numpy()
        b = sub["scalar_LAGGED"].to_numpy()
        m = np.isfinite(a) & np.isfinite(b)
        lag_detected = int(round(lag_rows["tlag_s"].iloc[ci] * hz))
        planted = (12, 31)[ci]
        # residual misalignment bounded by detection error
        assert abs(lag_detected - planted) <= 4
