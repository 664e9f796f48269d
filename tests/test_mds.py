"""True MDS gap-fill (operators/mds.py) vs an INDEPENDENT nested-loop oracle.

The oracle below re-derives the ONEFlux cascade semantics (reference
/root/reference/diive/gapfilling/similarity.py:150) with plain Python loops
and integer ranges — deliberately nothing shared with the numpy kernel — so
agreement is evidence, not tautology.
"""

import math

import numpy as np
import pandas as pd
import pytest

from diive_spark.operators import mds


# --------------------------------------------------------------------------- #
# Independent oracle
# --------------------------------------------------------------------------- #
def _oracle_passes():
    """(method, tw) priority list, built from the published cascade spec."""
    out = [(1, 14.0), (1, 28.0), (2, 14.0), (3, 1.0), (3, 3.0), (3, 5.0)]
    out += [(1, float(d)) for d in range(42, 155, 14)]          # 42..154
    out += [(2, float(d)) for d in range(28, 155, 14)]          # 28..154
    out += [(3, (i + 1) * 7.0) for i in range(61)]              # 7..427
    return out


def oracle_mds(flux, swin, ta, vpd, hr, nperday, min_samples=2,
               longest_marginal_gap=60, fill_all=False, max_passes=None,
               sym_mean=False):
    n = len(flux)
    res = {i: None for i in range(n)}

    def finite(x):
        return x is not None and not math.isnan(x)

    measured = [finite(flux[i]) for i in range(n)]
    ok = [i for i in range(n) if measured[i]]
    excluded = set()
    if ok:
        margin = 48 * longest_marginal_gap
        if ok[0] > margin:
            excluded |= set(range(0, ok[0] + 1 - margin))
        if ok[-1] < n - margin:
            excluded |= set(range(ok[-1] + margin, n))

    def eligible(i):
        if i in excluded:
            return False
        return True if fill_all else not measured[i]

    passes = _oracle_passes()
    if max_passes is not None:
        passes = passes[:max_passes]
    for pno, (m, tw) in enumerate(passes, start=1):
        for i in range(n):
            if not eligible(i) or res[i] is not None:
                continue
            half = tw / 2.0 * nperday
            offsets = [-o for o in range(math.ceil(half))]
            offsets += [o for o in range(1, math.ceil(half - 1) + 1)]
            window = [min(max(i + o, 0), n - 1) for o in offsets]
            cand = [j for j in window if measured[j]]
            if m in (1, 2):
                if len(cand) < min_samples:
                    continue
                tol = min(max(swin[i], 20.0), 50.0)
                sel = [j for j in cand
                       if finite(swin[j]) and abs(swin[j] - swin[i]) < tol]
                if m == 1:
                    sel = [j for j in sel
                           if finite(ta[j]) and abs(ta[j] - ta[i]) < 2.5
                           and finite(vpd[j]) and abs(vpd[j] - vpd[i]) < 5.0]
            else:
                sel = [j for j in cand if abs(hr[j] - hr[i]) < 1.1]
            if len(sel) >= min_samples:
                vals = [flux[j] for j in sel]
                if sym_mean and m in (1, 2):
                    hi = [flux[j] for j in sel if swin[j] >= swin[i]]
                    lo = [flux[j] for j in sel if swin[j] <= swin[i]]
                    halves = [sum(h) / len(h) for h in (hi, lo) if h]
                    mean = sum(halves) / len(halves) if halves else float("nan")
                else:
                    mean = sum(vals) / len(vals)
                if len(vals) > 1:
                    mu = sum(vals) / len(vals)
                    sdv = math.sqrt(sum((v - mu) ** 2 for v in vals)
                                    / (len(vals) - 1))
                else:
                    sdv = float("nan")
                res[i] = dict(mean=mean, sd=sdv, n=len(vals), method=m, tw=tw)
    return res


def _make_series(rng, n, nperday, gap_frac=0.15):
    hrs = (np.arange(n) % nperday) * (24.0 / nperday)
    swin = np.maximum(0.0, 600.0 * np.sin(np.pi * (hrs - 5) / 14)
                      + rng.normal(0, 40, n))
    ta = 12 + 8 * np.sin(2 * np.pi * np.arange(n) / (nperday * 30)) \
        + 5 * np.sin(np.pi * (hrs - 5) / 14) + rng.normal(0, 1.2, n)
    vpd = np.maximum(0.0, 4 + 6 * np.sin(np.pi * (hrs - 6) / 14)
                     + rng.normal(0, 1.5, n))
    flux = -0.02 * swin + 2.0 + 0.1 * ta + rng.normal(0, 0.8, n)
    gaps = rng.random(n) < gap_frac
    flux[gaps] = np.nan
    # a few driver gaps too (similarity requires finite drivers)
    for arr in (swin, ta, vpd):
        arr[rng.random(n) < 0.02] = np.nan
    return flux, swin, ta, vpd, hrs


def _assert_matches_oracle(res, orc, n):
    for i in range(n):
        o = orc[i]
        if o is None:
            assert res["method"][i] == 0, i
            assert not np.isfinite(res["filled"][i]), i
        else:
            assert res["method"][i] == o["method"], i
            assert res["time_window"][i] == o["tw"], i
            assert res["count"][i] == o["n"], i
            assert res["filled"][i] == pytest.approx(o["mean"], rel=1e-12), i
            if o["n"] > 1:
                assert res["sd"][i] == pytest.approx(o["sd"], rel=1e-9,
                                                     abs=1e-12), i


def test_mds_kernel_vs_independent_oracle():
    rng = np.random.default_rng(7)
    nperday = 24
    n = nperday * 40
    flux, swin, ta, vpd, hrs = _make_series(rng, n, nperday)
    res = mds.mds_cascade_arrays(flux, swin, ta, vpd, hrs, nperday)
    orc = oracle_mds(list(flux), list(swin), list(ta), list(vpd), list(hrs),
                     nperday)
    assert sum(1 for o in orc.values() if o) > 50  # the case is non-trivial
    _assert_matches_oracle(res, orc, n)
    # flags / quality consistent with (method, tw)
    q = mds.quality_from(res["method"], res["time_window"])
    fl = mds.granular_flag(res["method"], res["time_window"])
    assert np.array_equal(res["quality"], q)
    assert np.array_equal(res["flag"], fl)


def test_mds_kernel_oracle_sym_mean_and_fill_all():
    rng = np.random.default_rng(11)
    nperday = 24
    n = nperday * 25
    flux, swin, ta, vpd, hrs = _make_series(rng, n, nperday, gap_frac=0.2)
    res = mds.mds_cascade_arrays(flux, swin, ta, vpd, hrs, nperday,
                                 sym_mean=True, fill_all=True,
                                 min_samples=10)
    orc = oracle_mds(list(flux), list(swin), list(ta), list(vpd), list(hrs),
                     nperday, sym_mean=True, fill_all=True, min_samples=10)
    # fill_all predicts at measured records too
    assert any(np.isfinite(flux[i]) and res["method"][i] > 0 for i in range(n))
    _assert_matches_oracle(res, orc, n)


def test_mds_quality_collapse_table():
    cases = {(1, 14): 1, (1, 28): 2, (1, 56): 2, (1, 70): 3,
             (2, 14): 1, (2, 28): 2, (2, 42): 3,
             (3, 1): 1, (3, 3): 2, (3, 5): 2, (3, 7): 3, (0, 0): 0}
    for (m, tw), want in cases.items():
        assert mds.quality_from(m, tw) == want, (m, tw)
    assert mds.granular_flag(1, 14) == 1014
    assert mds.granular_flag(3, 427) == 3427
    assert mds.granular_flag(0, 0) == 0


def test_mds_marginal_gap_rule():
    nperday = 24
    lmg_days = 2
    margin = 48 * lmg_days
    n = margin + 200
    flux = np.full(n, np.nan)
    flux[margin + 50:] = 1.0   # first valid record well past the margin
    hrs = (np.arange(n) % nperday) * 1.0
    swin = np.full(n, 100.0)
    ta = np.full(n, 10.0)
    vpd = np.full(n, 5.0)
    res = mds.mds_cascade_arrays(flux, swin, ta, vpd, hrs, nperday,
                                 longest_marginal_gap=lmg_days)
    first_ok = margin + 50
    cut = first_ok + 1 - margin
    assert np.all(res["method"][:cut] == 0)          # excluded, never filled
    assert np.all(~np.isfinite(res["filled"][:cut]))
    assert np.all(res["method"][cut:first_ok] > 0)   # inside margin: filled


def test_mds_first_success_wins_and_min_samples():
    # A gap whose 14-day all-driver pool has exactly 2 similar records fills
    # with method 1 @ 14 d; starving TA similarity leaves only the SWIN pass.
    nperday = 24
    n = nperday * 20
    hrs = (np.arange(n) % nperday) * 1.0
    swin = np.full(n, 300.0)
    ta = np.full(n, 15.0)
    vpd = np.full(n, 8.0)
    flux = np.full(n, 5.0)
    gap = n // 2
    flux[gap] = np.nan
    res = mds.mds_cascade_arrays(flux, swin, ta, vpd, hrs, nperday)
    assert res["method"][gap] == 1 and res["time_window"][gap] == 14.0
    assert res["flag"][gap] == 1014
    assert res["filled"][gap] == pytest.approx(5.0)

    ta2 = ta + np.where(np.arange(n) != gap, 100.0, 0.0)  # TA never similar
    res2 = mds.mds_cascade_arrays(flux, swin, ta2, vpd, hrs, nperday)
    assert res2["method"][gap] == 2 and res2["time_window"][gap] == 14.0
    assert res2["flag"][gap] == 2014


def test_mds_fill_spark_matches_kernel(spark):
    rng = np.random.default_rng(3)
    nperday = 24
    n = nperday * 20
    frames = []
    per_key = {}
    for key in ("alpha", "beta"):
        flux, swin, ta, vpd, hrs = _make_series(rng, n, nperday)
        ts = pd.date_range("2024-03-01", periods=n, freq="1h")
        frames.append(pd.DataFrame({
            "source": key, "ts": ts, "nee": flux, "swin": swin,
            "ta": ta, "vpd": vpd}))
        per_key[key] = (flux, swin, ta, vpd, hrs, ts)
    df = spark.createDataFrame(pd.concat(frames))
    out = mds.mds_fill(df, ["source"], "ts", "nee", "swin", "ta", "vpd",
                       nperday).toPandas()
    assert len(out) == 2 * n
    for key, (flux, swin, ta, vpd, hrs, ts) in per_key.items():
        res = mds.mds_cascade_arrays(flux, swin, ta, vpd, hrs, nperday)
        sub = out[out["source"] == key].sort_values("ts").reset_index(drop=True)
        want = np.where(np.isfinite(flux), flux, res["filled"])
        got = sub["nee_gfMDS"].to_numpy()
        assert np.allclose(got, want, equal_nan=True)
        assert np.array_equal(sub["nee_gfMDS_METHOD"].to_numpy(),
                              res["method"])
        assert np.array_equal(sub["FLAG_nee_gfMDS_ISFILLED"].to_numpy(),
                              res["flag"])
        assert np.array_equal(sub["nee_gfMDS_QUALITY"].to_numpy(),
                              res["quality"])
        # measured records keep flag 0 and their own value
        meas = np.isfinite(flux)
        assert np.all(sub.loc[meas, "FLAG_nee_gfMDS_ISFILLED"] == 0)
        assert np.allclose(sub.loc[meas, "nee_gfMDS"], flux[meas])


def test_mds_fill_long_key_guardrail(spark):
    """A key over max_records_per_key fails LOUDLY with an error naming
    the key, the size and the knob — not a silent executor OOM."""
    import pytest
    rng = np.random.default_rng(4)
    nperday = 24
    n = nperday * 10
    flux, swin, ta, vpd, hrs = _make_series(rng, n, nperday)
    pdf = pd.DataFrame({
        "source": "century", "ts": pd.date_range("2024-03-01", periods=n,
                                                 freq="1h"),
        "nee": flux, "swin": swin, "ta": ta, "vpd": vpd})
    df = spark.createDataFrame(pdf)
    with pytest.raises(Exception, match="max_records_per_key"):
        mds.mds_fill(df, ["source"], "ts", "nee", "swin", "ta", "vpd",
                     nperday, max_records_per_key=100).toPandas()
    # at/under the bound: runs normally
    out = mds.mds_fill(df, ["source"], "ts", "nee", "swin", "ta", "vpd",
                       nperday, max_records_per_key=n).toPandas()
    assert len(out) == n
