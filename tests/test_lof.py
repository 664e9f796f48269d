"""Local Outlier Factor: exact-oracle tests against a brute-force O(n^2)
hand-rolled LOF (paper formulas, same deterministic left tie-preference),
plus Spark-level flag semantics (nulls, day/night split, seeded outliers,
stepwise integration)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from diive_spark.operators import lof
from diive_spark.operators.stepwise import StepwiseScreening


def brute_lof(vals: np.ndarray, k: int) -> np.ndarray:
    """Textbook LOF (Breunig et al. 2000) with sklearn's +1e-10 stabilizer.
    Neighbours = k smallest by (distance, sorted-value position): on exact
    distance ties the smaller value wins, matching the kernel's rule."""
    n = len(vals)
    k = min(k, n - 1)
    order = np.argsort(vals, kind="mergesort")
    pos = np.empty(n, dtype=int)
    pos[order] = np.arange(n)
    D = np.abs(vals[:, None] - vals[None, :])
    kdist = np.empty(n)
    nbrs = []
    for a in range(n):
        cand = sorted((D[a, b], pos[b], b) for b in range(n) if b != a)
        nbrs.append([b for _, _, b in cand[:k]])
        kdist[a] = cand[k - 1][0]
    lrd = np.array([
        1.0 / (np.mean([max(kdist[b], D[a, b]) for b in nbrs[a]]) + 1e-10)
        for a in range(n)
    ])
    return np.array([np.mean([lrd[b] for b in nbrs[a]]) / lrd[a] for a in range(n)])


@pytest.mark.parametrize("seed,n,k", [(0, 60, 5), (1, 200, 20), (2, 97, 10)])
def test_lof_scores_match_bruteforce(seed, n, k):
    rng = np.random.default_rng(seed)
    vals = np.round(rng.normal(10, 3, n), 2)  # 2-decimal data -> real ties
    vals[:3] += 40  # clear outliers
    np.testing.assert_allclose(lof.lof_scores_1d(vals, k), brute_lof(vals, k),
                               rtol=1e-12)


def test_lof_constant_series_no_outliers():
    vals = np.full(50, 7.0)
    assert (lof._lof_flags(vals, 20, 0.1) == 0).all()
    assert (lof._lof_flags(vals, 20, "auto") == 0).all()


def test_flag_lof_spark_seeded_outliers(spark):
    rng = np.random.default_rng(42)
    n = 500
    ts = pd.date_range("2024-01-01", periods=n, freq="30min")
    vals = rng.normal(5, 1, n)
    vals[[50, 200, 400]] = [60.0, -55.0, 70.0]  # isolated in value space
    vals[100] = np.nan
    pdf = pd.DataFrame({"ts": ts, "value": vals, "key": "a"})
    df = spark.createDataFrame(pdf)
    out = lof.flag_lof(df, ["key"], "ts", "value", n_neighbors=20,
                       contamination=0.01).toPandas().sort_values("ts")
    flagged = set(np.where(out["FLAG_LOF_TEST"].to_numpy() == 2)[0])
    assert {50, 200, 400} <= flagged
    # contamination=0.01 of 499 non-null -> few flags beyond the seeded ones
    assert len(flagged) <= 6
    # null value -> null flag
    assert pd.isna(out["FLAG_LOF_TEST"].iloc[100])
    # exact parity with the driver-side oracle on the non-null subset
    nn = ~np.isnan(vals)
    expected = lof._lof_flags(vals[nn], 20, 0.01)
    got = out["FLAG_LOF_TEST"].to_numpy(dtype=float)[nn]
    np.testing.assert_array_equal(got, expected)


def test_flag_lof_daynight_split(spark):
    """Day/night variant (reference lof.py:267-277): each subset is scored
    independently — a value anomalous only within its subset is caught."""
    rng = np.random.default_rng(7)
    n = 480
    ts = pd.date_range("2024-06-01", periods=n, freq="30min")
    is_day = np.array([(8 <= t.hour < 20) for t in ts])
    vals = np.where(is_day, rng.normal(20, 1, n), rng.normal(2, 0.5, n))
    # 12.0 sits between the day and night clouds: globally "between clusters",
    # within the night subset it is a far outlier
    night_idx = np.where(~is_day)[0][10]
    vals[night_idx] = 12.0
    pdf = pd.DataFrame({"ts": ts, "value": vals, "key": "a", "is_day": is_day})
    df = spark.createDataFrame(pdf)
    split = lof.flag_lof(df, ["key"], "ts", "value", n_neighbors=20,
                         contamination="auto", daytime_col="is_day").toPandas()
    split = split.sort_values("ts").reset_index(drop=True)
    assert split.loc[night_idx, "FLAG_LOF_TEST"] == 2


def test_flag_lof_slab_bucketing(spark):
    """slab= groups by time bucket: row counts preserved, flags per bucket."""
    ts = pd.date_range("2024-01-01", periods=200, freq="1d")
    rng = np.random.default_rng(3)
    pdf = pd.DataFrame({"ts": ts, "value": rng.normal(0, 1, 200), "key": "a"})
    df = spark.createDataFrame(pdf)
    out = lof.flag_lof(df, ["key"], "ts", "value", n_neighbors=5,
                       contamination="auto", slab="30 days")
    assert out.count() == 200
    assert "_lof_slab" not in out.columns


def test_stepwise_includes_lof(spark):
    rng = np.random.default_rng(11)
    ts = pd.date_range("2024-01-01", periods=300, freq="30min")
    vals = rng.normal(0, 1, 300)
    vals[42] = 25.0
    pdf = pd.DataFrame({"ts": ts, "value": vals, "key": "a"})
    df = spark.createDataFrame(pdf)
    out = (
        StepwiseScreening(df, ["key"], "ts", "value")
        .flag_absolute_limits(-100, 100)
        .flag_lof(n_neighbors=20, contamination="auto")
        .finalize()
    ).toPandas().sort_values("ts").reset_index(drop=True)
    assert out.loc[42, "FLAG_QCF"] == 2
    assert pd.isna(out.loc[42, "value_CLEANED"])
