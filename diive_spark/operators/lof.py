"""Local Outlier Factor — density-based anomaly flagging.

Reference: ``LocalOutlierFactor``
(/root/reference/diive/preprocessing/outlier_detection/lof.py:42-124): runs
sklearn's LOF on the VALUES of a series (a 1-D density estimate, euclidean
metric), optionally split into daytime/nighttime subsets, flags the detected
fraction 2 and the rest 0; NaN values carry no flag.

This implementation is sklearn-free (the container has no sklearn) and
reproduces the original LOF paper formulas exactly as sklearn computes them
(Breunig et al., SIGMOD 2000; sklearn's +1e-10 lrd stabilizer included):

  k-dist(p)      = distance to p's k-th nearest neighbour (self excluded)
  reach_k(p, o)  = max(k-dist(o), d(p, o))
  lrd(p)         = 1 / (mean_{o in kNN(p)} reach_k(p, o) + 1e-10)
  LOF(p)         = mean_{o in kNN(p)} lrd(o) / lrd(p)

Thresholding mirrors sklearn's fit_predict: with float ``contamination`` c,
outliers are the points whose -LOF falls strictly below the c-quantile of
-LOF; with ``contamination='auto'`` outliers are LOF > 1.5.

Determinism note: in 1-D the kNN set is a contiguous window in value order;
on exact distance ties at the window boundary this implementation prefers the
LEFT (smaller-value) neighbour — a fixed, documented rule (sklearn breaks
such ties by ball-tree index order, which is data-layout dependent).

Spark mapping: LOF is global in VALUE space (not a time-local window), so the
unit of distribution is the whole series: applyInPandas per
(key_cols [, daytime flag] [, time slab]). The vectorized 1-D kernel is
O(n*k) numpy; a year of 30-min data (~17.5k rows, k=20) scores in
milliseconds. For unbounded series pass ``slab`` to bucket by time — a
documented approximation that keeps every task bounded at web scale.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def lof_scores_1d(vals: np.ndarray, n_neighbors: int) -> np.ndarray:
    """LOF score per point for a 1-D float sample (no NaNs). Higher = more
    isolated; inliers sit near 1. Exact kNN via minimal-cost contiguous
    windows in sorted order (vectorized, O(n*k))."""
    n = vals.shape[0]
    if n < 2:
        return np.ones(n)
    k = min(n_neighbors, n - 1)
    order = np.argsort(vals, kind="mergesort")
    sv = vals[order].astype(np.float64)
    i = np.arange(n)

    # candidate windows [s, s+k] containing i, s = i-k+j for j in 0..k;
    # cost(s) = k-th neighbour distance = max(sv[i]-sv[s], sv[s+k]-sv[i]).
    # cost is quasi-convex in s (max of a non-increasing and a non-decreasing
    # term), so minimizers form a contiguous range; min(cost) == k-dist.
    cost = np.full((n, k + 1), np.inf)
    right_d = np.full((n, k), np.inf)  # dist to the j-th right neighbour
    for j in range(k + 1):
        left = np.full(n, np.inf)
        lo = k - j  # distance back to window start
        if lo == 0:
            left[:] = 0.0
        else:
            left[lo:] = sv[lo:] - sv[:-lo]
        right = np.full(n, np.inf)
        hi = j  # distance forward to window end
        if hi == 0:
            right[:] = 0.0
        else:
            right[:-hi] = sv[hi:] - sv[:-hi]
            right_d[:-hi, hi - 1] = right[:-hi]
        c = np.maximum(left, right)
        valid = (i - k + j >= 0) & (i + j <= n - 1)
        cost[valid, j] = c[valid]
    jstar = np.argmax(cost == cost.min(axis=1, keepdims=True), axis=1)
    kdist = cost[i, jstar]

    # greedy kNN window: the leftmost minimal-cost window that still contains
    # every STRICTLY closer point. (The leftmost minimal-cost window alone can
    # exclude a strictly closer right point when duplicate values tie at the
    # left boundary; greedy takes all strictly-closer first, then fills
    # remaining slots with k-dist ties left-first.)
    n_right_strict = (right_d < kdist[:, None]).sum(axis=1)
    start = np.maximum(i - k + jstar, i + n_right_strict - k)
    win = start[:, None] + np.arange(k + 1)[None, :]  # (n, k+1) sorted positions
    mask = np.ones((n, k + 1), dtype=bool)
    mask[i, i - start] = False  # self column
    nbr = win[mask].reshape(n, k)  # k neighbour positions per point
    dist = np.abs(sv[nbr] - sv[:, None])
    reach = np.maximum(kdist[nbr], dist)
    lrd = 1.0 / (reach.mean(axis=1) + 1e-10)
    lof_sorted = lrd[nbr].mean(axis=1) / lrd
    out = np.empty(n)
    out[order] = lof_sorted
    return out


def _lof_flags(vals: np.ndarray, n_neighbors: int, contamination) -> np.ndarray:
    """0/2 flags for a non-null value array, sklearn fit_predict semantics."""
    n = vals.shape[0]
    if n < 2:
        return np.zeros(n, dtype=np.int32)
    scores = lof_scores_1d(vals, n_neighbors)
    if contamination == "auto":
        outlier = scores > 1.5
    else:
        nof = -scores
        outlier = nof < np.percentile(nof, 100.0 * contamination)
    return np.where(outlier, 2, 0).astype(np.int32)


def flag_lof(
    df: DataFrame, key_cols: list[str], ts_col: str, value_col: str,
    n_neighbors: int = 20, contamination: float | str = 0.01,
    daytime_col: str | None = None,
    slab: str | None = None,
    flag_col: str = "FLAG_LOF_TEST",
) -> DataFrame:
    """Flag LOF outliers per series (reference lof.py:42; day/night variant
    lof.py:267-277 when ``daytime_col`` — a boolean column — is given, each
    subset is scored independently). Null values carry a null flag.

    ``slab`` (e.g. ``'90 days'``) additionally buckets each series by
    event-time before scoring — the scale path for unbounded series."""
    if contamination != "auto" and not (0 < contamination <= 0.5):
        raise ValueError(f"contamination must be 'auto' or in (0, 0.5], got {contamination}")
    group_cols = list(key_cols)
    work = df
    drop_cols = []
    if daytime_col is not None:
        group_cols.append(daytime_col)
    if slab is not None:
        work = work.withColumn("_lof_slab", F.window(F.col(ts_col), slab).start)
        group_cols.append("_lof_slab")
        drop_cols.append("_lof_slab")

    schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in work.schema.fields
    ) + f", {flag_col} int"

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        out = pdf.copy()
        v = pdf[value_col]
        nn = v.notna()
        flags = np.full(len(pdf), np.nan)
        if nn.sum() >= 2:
            flags[nn.to_numpy()] = _lof_flags(
                v[nn].to_numpy(dtype=np.float64), n_neighbors, contamination
            )
        elif nn.sum() == 1:
            flags[nn.to_numpy()] = 0
        out[flag_col] = pd.array(
            [None if np.isnan(x) else int(x) for x in flags], dtype="Int32"
        )
        return out

    grouped = work.groupBy(*group_cols) if group_cols else work.groupBy(F.lit(1))
    out = grouped.applyInPandas(kernel, schema=schema)
    return out.drop(*drop_cols) if drop_cols else out
