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
