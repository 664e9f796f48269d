"""Property-based tests (hypothesis) for the round-5 numeric kernels —
pure numpy, no Spark session: invariants that must hold on arbitrary
well-formed inputs, not just the fixtures."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from diive_spark.functions.thermo import wind_direction_agg  # noqa: F401
from diive_spark.operators import pwb, selfheating, timeshift, windlag

_floats = st.floats(min_value=-100, max_value=100, allow_nan=False,
                    allow_infinity=False)


@settings(max_examples=60, deadline=None)
@given(st.lists(_floats, min_size=20, max_size=120),
       st.floats(min_value=0.1, max_value=10, allow_nan=False),
       st.integers(min_value=0, max_value=2 ** 31))
def test_exact_l1_factor_never_beaten_by_grid(target_base, scale, seed):
    """The closed-form weighted-median minimizer is never worse than any
    point of a dense grid over the feasible interval."""
    rng = np.random.default_rng(seed)
    n = len(target_base)
    fct = np.abs(rng.normal(1.0, 0.3, n)) * scale + 1e-6
    ref = np.asarray(target_base, float)
    target = ref - rng.uniform(0, 10) * fct
    f, cost = selfheating.exact_l1_factor(target, ref, fct)
    a = np.cumsum(target - ref)
    b = np.cumsum(fct)
    grid = np.linspace(0.0, 50.0, 2001)
    gcost = np.abs(a[None, :] + grid[:, None] * b[None, :]).sum(axis=1)
    assert cost <= gcost.min() + 1e-6 * max(1.0, gcost.min())
    assert 0.0 <= f <= 50.0


@settings(max_examples=60, deadline=None)
@given(st.lists(_floats, min_size=3, max_size=40, unique=True))
def test_pchip_interpolates_knots_and_preserves_monotonicity(xs):
    xs = np.sort(np.asarray(xs, float))
    if np.min(np.diff(xs)) < 1e-6:
        return
    ys = np.cumsum(np.abs(np.sin(xs)) + 0.1)  # strictly increasing
    # knots reproduced
    assert np.allclose(timeshift.pchip_interpolate(xs, ys, xs), ys,
                       rtol=1e-10)
    # PCHIP on monotone data stays monotone (the Fritsch-Carlson point)
    xq = np.linspace(xs[0], xs[-1], 300)
    out = timeshift.pchip_interpolate(xs, ys, xq)
    assert np.all(np.diff(out) >= -1e-9)


@settings(max_examples=40, deadline=None)
@given(st.lists(_floats, min_size=5, max_size=60))
def test_find_peaks_are_local_maxima_with_valid_prominence(vals):
    x = np.asarray(vals, float)
    peaks, heights, proms, whs = windlag.find_peaks_numpy(x)
    for p, h, pr in zip(peaks, heights, proms):
        assert 0 < p < len(x) - 1
        # strictly above the nearest non-equal neighbours
        left = p
        while left > 0 and x[left - 1] == x[p]:
            left -= 1
        right = p
        while right < len(x) - 1 and x[right + 1] == x[p]:
            right += 1
        assert left == 0 or x[left - 1] < x[p]
        assert right == len(x) - 1 or x[right + 1] < x[p]
        assert 0 <= pr <= h - np.min(x) + 1e-12
    assert np.all(np.diff(peaks) > 0)


@settings(max_examples=40, deadline=None)
@given(st.lists(st.floats(min_value=-50, max_value=50, allow_nan=False),
                min_size=10, max_size=200),
       st.floats(min_value=0.5, max_value=0.99))
def test_hdi_contains_mass_and_is_minimal_width(samples, mass):
    s = np.asarray(samples, float)
    lo, hi = pwb.hdi(s, credible_mass=mass)
    inside = np.mean((s >= lo) & (s <= hi))
    assert inside >= np.floor(mass * len(s)) / len(s) - 1e-12
    # no other interval over the same order statistics is shorter
    ss = np.sort(s)
    n_in = int(np.floor(mass * len(ss)))
    if len(ss) - n_in > 0:
        widths = ss[n_in:] - ss[:len(ss) - n_in]
        assert hi - lo <= widths.min() + 1e-12


@settings(max_examples=30, deadline=None)
@given(st.integers(min_value=2, max_value=6),
       st.integers(min_value=0, max_value=2 ** 31))
def test_leastsq_lm_solves_linear_problems_exactly(npar, seed):
    """On a pure linear least-squares problem LM must land on the normal
    -equations solution (one damped Gauss-Newton path to the optimum)."""
    from diive_spark.operators.oneflux_nt import leastsq_lm
    rng = np.random.default_rng(seed)
    A = rng.normal(0, 1, (40, npar))
    x_true = rng.normal(0, 2, npar)
    y = A @ x_true + rng.normal(0, 0.01, 40)

    def resid(p):
        return y - A @ np.asarray(p)

    pars, cov, info, _m, ier = leastsq_lm(resid, np.zeros(npar))
    x_ls, *_ = np.linalg.lstsq(A, y, rcond=None)
    assert ier == 1
    assert np.allclose(pars, x_ls, atol=1e-6)


@settings(max_examples=40, deadline=None)
@given(st.lists(st.floats(min_value=0, max_value=359.99, allow_nan=False),
                min_size=3, max_size=80),
       st.floats(min_value=0, max_value=359.99))
def test_circular_mean_rotation_equivariance(angles, rot):
    """Rotating every input angle rotates the Kanda vector MEAN by the
    same amount (numpy replica of the aggregation expression)."""
    a = np.asarray(angles, float)

    def kanda_mean(v):
        ph = np.radians(v)
        return np.degrees(np.arctan2(np.sin(ph).mean(),
                                     np.cos(ph).mean())) % 360

    m0 = kanda_mean(a)
    m1 = kanda_mean((a + rot) % 360)
    diff = (m1 - m0 - rot) % 360
    # degenerate resultants (vector sum near zero) have unstable angles
    ph = np.radians(a)
    if np.hypot(np.sin(ph).mean(), np.cos(ph).mean()) > 1e-3:
        assert min(diff, 360 - diff) < 1e-6


# --------------------------------------------------------------------------- #
# FLAC codec properties (round 6): lossless on ARBITRARY well-formed input
# --------------------------------------------------------------------------- #
@settings(max_examples=40, deadline=None)
@given(st.lists(st.integers(min_value=-32768, max_value=32767),
                min_size=1, max_size=3000),
       st.sampled_from([192, 256, 1024, 4096]),
       st.booleans(),
       st.sampled_from([0, 2]))
def test_flac_roundtrip_arbitrary_mono(samples, block_size, use_lpc,
                                       partition_order):
    """Any int16 sequence (any length incl. < one block, extremes, runs)
    survives encode->decode EXACTLY at any block size / predictor mix."""
    from diive_spark.functions.codecs import decode_flac, encode_flac

    x = np.asarray(samples, dtype=np.int64)
    blob = encode_flac(x, 16000, block_size=block_size, use_lpc=use_lpc,
                       partition_order=partition_order)
    y, rate = decode_flac(blob)
    assert rate == 16000
    assert np.array_equal(np.asarray(y, dtype=np.int64), x)


@settings(max_examples=25, deadline=None)
@given(st.integers(min_value=1, max_value=500),
       st.integers(min_value=1, max_value=4),
       st.integers(min_value=0, max_value=2 ** 31))
def test_flac_roundtrip_multichannel(n, n_ch, seed):
    """1-4 independent channels round-trip exactly (stereo decorrelation
    engages only at 2 channels; others stay independent)."""
    from diive_spark.functions.codecs import decode_flac, encode_flac

    rng = np.random.default_rng(seed)
    a = rng.integers(-2000, 2000, size=(n, n_ch)).astype(np.int64)
    y, _ = decode_flac(encode_flac(a, 8000, stereo_mode="auto"))
    y = np.asarray(y, dtype=np.int64)
    if n_ch == 1:
        y = y[:, None]
    assert np.array_equal(y, a)
