"""Wind double rotation + MaxCovariance lag search (operators/windlag.py)
vs the reference flux/hires/windrotation.py and lag.py: physical
invariants, planted-lag recovery, a pandas independent covariance oracle
(the exact semantic the reference's polars pipeline computes), and
reference-EXECUTION parity for the rotation."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from diive_spark.operators import windlag
from tests.reference_harness import run_reference


def _wind_frame(n=2000, seed=11, tilt_deg=7.0, yaw_deg=35.0):
    rng = np.random.default_rng(seed)
    u = 3.0 + rng.normal(0, 0.8, n)
    v = rng.normal(0, 0.6, n)
    w = rng.normal(0, 0.3, n)
    # tilt the sonic: rotate the true wind into a misaligned frame
    a, b = np.radians(yaw_deg), np.radians(tilt_deg)
    um = u * np.cos(a) * np.cos(b) - v * np.sin(a) + w * np.cos(a) * np.sin(b)
    vm = u * np.sin(a) * np.cos(b) + v * np.cos(a) + w * np.sin(a) * np.sin(b)
    wm = -u * np.sin(b) + w * np.cos(b)
    return pd.DataFrame({"rec": np.arange(n), "u": um, "v": vm, "w": wm,
                         "seg": "S1"})


def test_double_rotation_invariants(spark):
    pdf = _wind_frame()
    out = windlag.double_rotation(
        spark.createDataFrame(pdf), ["seg"], "u", "v", "w"
    ).toPandas()
    # rotated means: v2 ~ 0 and w2 ~ 0 by construction
    assert abs(out["v_rot"].mean()) < 1e-12
    assert abs(out["w_rot"].mean()) < 1e-12
    # rotation preserves per-record wind speed
    s0 = pdf[["u", "v", "w"]].pow(2).sum(axis=1)
    s1 = out[["u_rot", "v_rot", "w_rot"]].pow(2).sum(axis=1)
    assert np.allclose(np.sort(s0), np.sort(s1))
    # mean horizontal wind ends up entirely in u2
    assert out["u_rot"].mean() > 2.9


def test_double_rotation_matches_executed_reference(spark):
    pdf = _wind_frame(n=600, seed=3)
    ref = run_reference(f"""
import io
pdf = pd.read_json(io.StringIO({pdf.to_json()!r}))
from diive.flux.hires.windrotation import WindDoubleRotation, reynolds_decomposition
wr = WindDoubleRotation(u=pdf["u"], v=pdf["v"], w=pdf["w"])
wp = reynolds_decomposition(wr.w2)
print(json.dumps({{
    "theta": wr.theta, "phi": wr.phi,
    "u2": list(wr.u2)[:50], "v2": list(wr.v2)[:50], "w2": list(wr.w2)[:50],
    "wp": list(wp)[:50],
}}))
""")
    out = windlag.double_rotation(
        spark.createDataFrame(pdf), ["seg"], "u", "v", "w")
    out = windlag.reynolds_fluctuations(out, ["seg"], ["w_rot"]) \
        .toPandas().sort_values("rec").reset_index(drop=True)
    assert abs(out["theta"].iloc[0] - ref["theta"]) < 1e-12
    assert abs(out["phi"].iloc[0] - ref["phi"]) < 1e-12
    assert np.allclose(out["u_rot"][:50], ref["u2"], atol=1e-12)
    assert np.allclose(out["v_rot"][:50], ref["v2"], atol=1e-12)
    assert np.allclose(out["w_rot"][:50], ref["w2"], atol=1e-12)
    assert np.allclose(out["w_rot_prime"][:50], ref["wp"], atol=1e-12)


def test_max_cov_kernel_matches_pandas_cov_oracle():
    """Per-shift covariance == pandas ``ref.cov(lagged.shift(-s))`` —
    the exact semantic of the reference's polars pipeline
    (lag.py:218-267), including pairwise-complete NaN handling."""
    rng = np.random.default_rng(5)
    ref = pd.Series(rng.normal(0, 1, 400))
    lagged = pd.Series(np.r_[np.full(7, np.nan), ref[:-7]]
                       + rng.normal(0, 0.1, 400))
    lagged[50:60] = np.nan
    shifts = list(range(-15, 16))
    cov, cov_abs = windlag.max_cov_kernel(ref.to_numpy(),
                                          lagged.to_numpy(), shifts)
    for i, s in enumerate(shifts):
        want = ref.cov(lagged.shift(-s))
        assert abs(cov[i] - want) < 1e-12, s
    assert np.nanargmax(cov_abs) == shifts.index(7)


def test_find_peaks_numpy_known_fixture():
    """Hand-computed scipy semantics: strict maxima, plateau midpoint,
    contour-line prominences, width_heights = h - prom/2."""
    x = np.array([0.0, 2, 1, 3, 3, 3, 1, 5, 0.5, 2, 0.5])
    peaks, heights, proms, whs = windlag.find_peaks_numpy(x)
    assert list(peaks) == [1, 4, 7, 9]
    assert list(heights) == [2, 3, 5, 2]
    # prominences = h - max(left base, right base): 2-1, 3-1, 5-0.5, 2-0.5
    assert list(proms) == [1.0, 2.0, 4.5, 1.5]
    assert np.allclose(whs, heights - 0.5 * np.asarray(proms))
    # endpoints and all-flat arrays yield no peaks
    assert len(windlag.find_peaks_numpy(np.ones(5))[0]) == 0


def test_max_covariance_planted_lag_spark(spark):
    rng = np.random.default_rng(9)
    n = 3000
    base = rng.normal(0, 1, n)
    pdf = pd.DataFrame({
        "rec": np.arange(n), "seg": "A",
        "c_ref": base,
        "c_lag": np.r_[np.full(13, np.nan), base[:-13]]
        + rng.normal(0, 0.05, n),
    })
    out = windlag.max_covariance(
        spark.createDataFrame(pdf), ["seg"], "rec", "c_ref", "c_lag",
        winsize_from=-50, winsize_to=50,
    ).toPandas().sort_values("shift").reset_index(drop=True)
    assert len(out) == 101
    peak = out[out["flag_peak_max_cov_abs"]]
    assert len(peak) == 1 and peak["shift"].iloc[0] == 13
    # the planted sharp peak passes the auto-validation too
    assert out[out["flag_peak_auto"]]["shift"].tolist() == [13]


def test_auto_peak_rejects_flat_profile():
    """A monotone |cov| profile has no interior peak: flag_peak_auto
    stays all-False while flag_peak_max still marks the max record."""
    cov_abs = np.linspace(0, 1, 41)
    fmax, fauto = windlag.auto_peak_flags(cov_abs)
    assert fmax.sum() == 1 and int(np.flatnonzero(fmax)[0]) == 40
    assert fauto.sum() == 0


def test_flux_detection_limit_matches_pandas_oracle(spark):
    """flux_detection_limit == an independent pandas implementation of
    the reference's composition (rotation + Reynolds + pandas .cov lag
    search + SAB18 conversion + LAN15/STR20 noise RMSE) on a planted
    10 Hz segment with a known scalar lag."""
    rng = np.random.default_rng(7)
    hz = 10
    n = 600 * hz  # 10-minute segment
    w = rng.normal(0, 0.4, n)
    u = 2.5 + rng.normal(0, 0.7, n)
    v = rng.normal(0, 0.5, n)
    lag_rec = 14  # scalar delayed 1.4 s behind the wind signal
    c = 320.0 + np.r_[np.full(lag_rec, 0.0), 5.0 * w[:-lag_rec]] \
        + rng.normal(0, 0.3, n)
    sonic_k = 293.15 + rng.normal(0, 0.5, n)
    h2o = np.full(n, 0.01) + rng.normal(0, 1e-4, n)
    press = np.full(n, 96000.0) + rng.normal(0, 50, n)
    pdf = pd.DataFrame({"rec": np.arange(n), "seg": "S",
                        "u": u, "v": v, "w": w, "c": c,
                        "t_sonic": sonic_k, "h2o": h2o, "press": press})
    # a scalar DELAYED by k records peaks at shift +k under the
    # reference's pairing (ref[n] vs lagged[n+shift]); its signal lookup
    # reads shift == -default_lag*rate, so default_lag=-1.4 points at it
    lag_range, noise_range, default_lag = (-60, 60), 10, -1.4

    out = windlag.flux_detection_limit(
        spark.createDataFrame(pdf), ["seg"], "rec",
        u_col="u", v_col="v", w_col="w", c_col="c",
        sonic_temp_col="t_sonic", h2o_col="h2o", press_col="press",
        default_lag=default_lag, noise_range=noise_range,
        lag_range=lag_range, sampling_rate=hz,
    ).toPandas()
    assert len(out) == 1
    row = out.iloc[0]

    # ---- independent pandas oracle --------------------------------------
    ta = sonic_k / (1 + 0.32 * h2o)
    pd_pa = press - h2o * press
    um, vm, wm = u.mean(), v.mean(), w.mean()
    theta = np.arctan2(vm, um)
    u1 = u * np.cos(theta) + v * np.sin(theta)
    phi = np.arctan2(wm, um * np.cos(theta) + vm * np.sin(theta))
    w2 = -u1 * np.sin(phi) + w * np.cos(phi)
    wp = pd.Series(w2 - w2.mean())
    cp = pd.Series(c - c.mean())
    shifts = list(range(lag_range[0] * hz, lag_range[1] * hz + 1))
    covs = pd.Series([wp.cov(cp.shift(-s)) for s in shifts], index=shifts)
    factor = 1 / (8.31446261815324 * ta.mean() / pd_pa.mean())
    cov_flux = covs * factor
    lag_from, lag_to = lag_range[0] * hz, lag_range[1] * hz
    winsize = noise_range * hz
    leftw = cov_flux[(covs.index >= lag_from)
                     & (covs.index <= lag_from + winsize)]
    rightw = cov_flux[(covs.index >= abs(lag_to) - winsize)
                      & (covs.index <= abs(lag_to))]
    rmse = np.sqrt(0.5 * (leftw.std() ** 2 + leftw.mean() ** 2
                          + rightw.std() ** 2 + rightw.mean() ** 2))
    sig = cov_flux.loc[int(-default_lag * hz)]
    max_shift = cov_flux.abs().idxmax()

    assert abs(row["flux_noise_rmse"] - rmse) < 1e-12
    assert abs(row["flux_detection_limit"] - 3 * rmse) < 1e-12
    assert abs(row["flux_signal_at_default_lag"] - sig) < 1e-12
    assert row["cov_max_shift"] == max_shift
    assert abs(row["signal_to_noise"] - abs(sig) / rmse) < 1e-9
    # the planted 14-record delay -> positive shift under the pairing
    assert row["cov_max_shift"] == lag_rec
    # a real flux signal clears its own detection limit
    assert row["signal_to_detection_limit"] > 1.0
