"""Time-lag analysis: recommended EddyPro lag windows from found-lag
histograms.

Reference: /root/reference/diive/flux/lowres/timelag_analysis.py
(``TimeLagAnalysis``; plotting layer out of scope). The numeric core:
per gas, histogram the ``*_TLAG_ACTUAL`` series over UNIQUE-value bins
(the reference Histogram 'uniques' method = np.histogram over the
distinct values as edges, last two values sharing a bin), trim the
fringe bins where non-physical lags accumulate, find the peak lag
(top-count bin), walk outward from the peak until the normalized
histogram gradient magnitude drops below a threshold
(``detect_peak_range``, timelag_analysis.py:267-348), and pad the
detected range by one EddyPro 0.05 s step (``adjust_range_for_eddypro``,
:221-258).

Engine shape: the per-value counts are one groupBy; the per-key
recommendation walks a bounded histogram (≤ #distinct lag steps) in an
Arrow kernel — parallel across keys/gases.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def detect_peak_range(bins, counts, peak, gradient_threshold=0.15):
    """Gradient-based peak-range edges (timelag_analysis.py:267-348):
    normalize counts, np.gradient, locate the bin closest to ``peak``,
    then search left/right for the first bin with |gradient| below the
    threshold (peak bin itself if none)."""
    bins = np.asarray(bins, float)
    counts = np.asarray(counts, float)
    mx = counts.max()
    gradient = np.gradient(counts / mx if mx > 0 else counts)
    peak_idx = int(np.argmin(np.abs(bins - peak)))
    left = peak_idx
    for i in range(peak_idx - 1, -1, -1):
        if abs(gradient[i]) < gradient_threshold:
            left = i
            break
    right = peak_idx
    for i in range(peak_idx + 1, len(gradient)):
        if abs(gradient[i]) < gradient_threshold:
            right = i
            break
    return float(bins[left]), float(bins[right])


def adjust_range_for_eddypro(min_lag, max_lag, step=0.05):
    """Pad by one discrete EddyPro step (timelag_analysis.py:221-258)."""
    return min_lag - step, max_lag + step


def uniques_edge_histogram(values, ignore_fringe_bins=(5, 10)):
    """The reference Histogram 'uniques' contract (analysis/histogram.py
    with method='uniques' + ignore_fringe_bins): np.histogram over the
    distinct values as EDGES — bin starts are the distinct values minus
    the last, the final bin merges the two largest values — then trim
    ``ignore_fringe_bins=(a, b)`` bins from the start/end."""
    v = np.asarray(values, float)
    v = v[np.isfinite(v)]
    uniq, per_value = np.unique(v, return_counts=True)
    return _edge_hist_from_counts(uniq, per_value, ignore_fringe_bins)


def _edge_hist_from_counts(uniq, per_value, ignore_fringe_bins):
    if uniq.size < 2:
        return uniq, per_value.astype(np.int64)
    counts = per_value[:-1].copy()
    counts[-1] += per_value[-1]
    bins = uniq[:-1]
    a, b = ignore_fringe_bins
    counts = counts[a:len(counts) - b]
    bins = bins[a:len(bins) - b]
    return bins, counts.astype(np.int64)


def recommend_lag_window(values, ignore_fringe_bins=(5, 10),
                         histogram_startbin=0.0, histogram_endbin=10.0,
                         gradient_threshold=0.15, eddypro_step=0.05):
    """One gas's full recommendation (``analyze_gas``,
    timelag_analysis.py:349-441): peak = top-count bin of the trimmed
    uniques histogram (first on ties, pandas stable sort), range from the
    display-filtered histogram, EddyPro padding. Returns a dict or None
    when the histogram is empty after trimming. ``values`` is either a
    raw array or a pre-aggregated ``(sorted_distinct, counts)`` pair."""
    if isinstance(values, tuple):
        bins, counts = _edge_hist_from_counts(values[0], values[1],
                                              ignore_fringe_bins)
    else:
        bins, counts = uniques_edge_histogram(values, ignore_fringe_bins)
    if bins.size == 0:
        return None
    order = np.argsort(-counts, kind="stable")
    peak = float(bins[order[0]])
    keep = (bins >= histogram_startbin) & (bins <= histogram_endbin)
    if not keep.any():
        return None
    peak_min, peak_max = detect_peak_range(
        bins[keep], counts[keep], peak, gradient_threshold)
    ep_min, ep_max = adjust_range_for_eddypro(peak_min, peak_max,
                                              eddypro_step)
    return dict(peak=peak, peak_min=peak_min, peak_max=peak_max,
                eddypro_min=ep_min, eddypro_max=ep_max,
                n_vals=int(counts.sum()))


def timelag_recommendation(
    df: DataFrame, key_cols: list[str], tlag_col: str,
    ignore_fringe_bins: tuple[int, int] = (5, 10),
    histogram_startbin: float = 0.0, histogram_endbin: float = 10.0,
    gradient_threshold: float = 0.15, eddypro_step: float = 0.05,
) -> DataFrame:
    """Per-key recommended lag window. One groupBy for the per-value
    counts, then a bounded per-key kernel walk. Returns (key..., peak,
    peak_min, peak_max, eddypro_min, eddypro_max, n_vals)."""
    import pandas as pd
    from pyspark.sql.types import DoubleType, LongType, StructField, \
        StructType

    counts = df.filter(F.col(tlag_col).isNotNull()).groupBy(
        *key_cols, F.col(tlag_col).alias("_v")).agg(
        F.count(F.lit(1)).alias("_n"))
    key_fields = [f for f in counts.schema.fields if f.name in key_cols]
    schema = StructType(key_fields + [
        StructField("peak", DoubleType()),
        StructField("peak_min", DoubleType()),
        StructField("peak_max", DoubleType()),
        StructField("eddypro_min", DoubleType()),
        StructField("eddypro_max", DoubleType()),
        StructField("n_vals", LongType()),
    ])

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_v")
        rec = recommend_lag_window(
            (pdf["_v"].to_numpy(float), pdf["_n"].to_numpy(np.int64)),
            ignore_fringe_bins, histogram_startbin, histogram_endbin,
            gradient_threshold, eddypro_step)
        head = pdf.iloc[:1][[f.name for f in key_fields]].copy()
        if rec is None:
            return head.iloc[0:0].reindex(
                columns=[f.name for f in schema.fields])
        for k, v in rec.items():
            head[k] = v
        return head[[f.name for f in schema.fields]]

    return counts.groupBy(*key_cols).applyInPandas(
        lambda _, pdf: kernel(pdf), schema=schema)
