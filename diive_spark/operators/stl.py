"""STL — Seasonal-Trend decomposition by Loess, statsmodels-free.

Reference: ``SeasonalTrend`` with ``method='stl'`` (the DEFAULT,
/root/reference/diive/analysis/seasonaltrend.py:25-310 ->
core/times/decomposition_utils.py:22 stl_decompose, statsmodels.tsa.STL).
The container has no statsmodels, so this implements the published STL
algorithm directly (Cleveland, Cleveland, McRae & Terpenning, "STL: A
Seasonal-Trend Decomposition Procedure Based on Loess", Journal of Official
Statistics 6(1), 1990):

  inner loop (n_inner passes):
    1. detrend:            D = y - T
    2. cycle-subseries     loess(q=seasonal) each phase's subseries,
       smoothing:          extended one cycle at both ends -> C (n + 2p)
    3. low-pass:           L = loess(MA_p(MA_p(MA_3(C))), q=lowpass)
    4. seasonal:           S = C[p:p+n] - L
    5. deseasonalize:      A = y - S
    6. trend:              T = loess(A, q=trend)
  outer loop (robust passes): bisquare weights from |y - T - S| downweight
  outliers in every loess fit.

Loess here is degree-1 local regression with tricube weights over the q
nearest points — on the regular positional grid the q-neighbourhood is a
contiguous window, so each fit is closed-form weighted least squares and the
whole smoother is O(n*q).

Spark mapping: like LOF / detect_seasonality, STL is global over one series,
so the unit of distribution is the series: applyInPandas per key. Null
values are positionally compressed before decomposition and the components
re-expanded (statsmodels STL refuses NaNs outright; compressing keeps the
reference's "regular grid" assumption for the gap slots only)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _odd_at_least(x: float, lo: int = 3) -> int:
    n = max(int(np.ceil(x)), lo)
    return n if n % 2 == 1 else n + 1


def _loess_grid(y: np.ndarray, q: int, eval_pos: np.ndarray,
                rho: np.ndarray | None = None) -> np.ndarray:
    """Degree-1 loess of y (positions 0..n-1) evaluated at eval_pos.
    q-nearest neighbourhoods on a sorted grid are contiguous windows."""
    n = len(y)
    q_eff = min(q, n)
    x = np.arange(n, dtype=np.float64)
    out = np.empty(len(eval_pos))
    for i, x0 in enumerate(eval_pos):
        s = int(np.clip(round(x0) - (q_eff - 1) // 2, 0, n - q_eff))
        xs = x[s:s + q_eff]
        ys = y[s:s + q_eff]
        d = np.abs(xs - x0)
        dmax = d.max()
        if q > n:  # STL convention: widen the tricube for short series
            dmax += (q - n) / 2.0
        w = (1.0 - np.minimum(d / max(dmax, 1e-9), 1.0) ** 3) ** 3
        if rho is not None:
            w = w * rho[s:s + q_eff]
        sw = w.sum()
        if sw <= 0:
            out[i] = ys.mean()
            continue
        xbar = (w * xs).sum() / sw
        ybar = (w * ys).sum() / sw
        sxx = (w * (xs - xbar) ** 2).sum()
        if sxx > 1e-12:
            b = (w * (xs - xbar) * (ys - ybar)).sum() / sxx
        else:
            b = 0.0
        out[i] = ybar + b * (x0 - xbar)
    return out


def _ma(y: np.ndarray, w: int) -> np.ndarray:
    return np.convolve(y, np.full(w, 1.0 / w), mode="valid")


def stl_kernel(
    y: np.ndarray, period: int,
    seasonal: int = 7, trend: int | None = None, lowpass: int | None = None,
    n_inner: int = 2, n_outer: int = 0,
    base_weights: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """STL on a dense float array (no NaNs). Returns (trend, seasonal,
    residual). Parameter defaults follow the paper/statsmodels:
    trend = smallest odd >= 1.5p / (1 - 1.5/seasonal); lowpass = smallest
    odd >= p."""
    n = len(y)
    p = period
    n_s = _odd_at_least(seasonal)
    n_t = trend if trend is not None else _odd_at_least(1.5 * p / (1 - 1.5 / n_s))
    n_l = lowpass if lowpass is not None else _odd_at_least(p)
    T = np.zeros(n)
    S = np.zeros(n)
    base = np.ones(n) if base_weights is None else np.clip(base_weights, 0.0, 1.0)
    if not base.any():
        base = np.ones(n)  # all-zero quality -> uniform (reference contract)
    rho = base.copy()
    for _outer in range(n_outer + 1):
        for _inner in range(n_inner):
            D = y - T
            C = np.empty(n + 2 * p)
            for k in range(p):
                sub = D[k::p]
                sub_rho = rho[k::p]
                # extended slots j in [0, n+2p) with j % p == k map to
                # subseries positions (j - p - k) / p
                slots = np.arange(k, n + 2 * p, p)
                pos = (slots - p - k) / p
                C[slots] = _loess_grid(sub, n_s, pos, sub_rho)
            L = _loess_grid(_ma(_ma(_ma(C, p), p), 3), n_l, np.arange(n, dtype=float))
            S = C[p:p + n] - L
            A = y - S
            T = _loess_grid(A, n_t, np.arange(n, dtype=float), rho)
        if _outer < n_outer:
            r = np.abs(y - T - S)
            h = 6.0 * np.median(r)
            if h <= 0:
                rho = base.copy()
            else:
                u = np.minimum(r / h, 1.0)
                rho = base * (1.0 - u ** 2) ** 2
    return T, S, y - T - S


def stl_decompose(
    df: DataFrame, key_cols: list[str], ts_col: str, value_col: str,
    period: int,
    seasonal: int = 7, trend: int | None = None, lowpass: int | None = None,
    robust: bool = False, n_inner: int | None = None, n_outer: int | None = None,
    quality_col: str | None = None,
) -> DataFrame:
    """STL per series key (SeasonalTrend method='stl'). Adds trend /
    seasonal / residual columns; null values get null components (they are
    positionally compressed out before the decomposition, like the gapless
    input statsmodels requires). robust=True enables the bisquare outer
    loop (statsmodels defaults: inner=1, outer=15 robust; inner=2, outer=0
    otherwise). ``quality_col`` enables quality-weighted fitting
    (quality_weighted_decompose, decomposition_utils.py:318): 0-1 weights,
    clipped, multiplied into every loess fit — low-quality values keep their
    output rows but influence the trend/seasonal less."""
    if n_inner is None:
        n_inner = 1 if robust else 2
    if n_outer is None:
        n_outer = 15 if robust else 0
    schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields
    ) + ", trend double, seasonal double, residual double"
    vcol, tcol = value_col, ts_col

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        out = pdf.sort_values(tcol).reset_index(drop=True)
        v = out[vcol].to_numpy(dtype=np.float64)
        nn = ~np.isnan(v)
        T = np.full(len(v), np.nan)
        S = np.full(len(v), np.nan)
        R = np.full(len(v), np.nan)
        if nn.sum() >= 2 * period + 1:
            bw = None
            if quality_col is not None:
                bw = out[quality_col].to_numpy(dtype=np.float64)[nn]
                bw = np.where(np.isnan(bw), 0.0, bw)
            t, s, r = stl_kernel(v[nn], period, seasonal, trend, lowpass,
                                 n_inner, n_outer, base_weights=bw)
            T[nn], S[nn], R[nn] = t, s, r
        out["trend"] = T
        out["seasonal"] = S
        out["residual"] = R
        return out

    return df.groupBy(*key_cols).applyInPandas(kernel, schema=schema)
