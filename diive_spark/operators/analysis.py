"""Analysis extras: seasonal-trend decomposition, harmonic analysis,
seasonality detection, Granger causality, optimum-range finder.

Reference modules (user-facing API in /root/reference/diive/analysis/):
- seasonaltrend.py:25 (classical path -> core/times/decomposition_utils.py:160,
  statsmodels seasonal_decompose semantics)
- harmonic.py:19 (FFT harmonic extraction at multiples of 1/period)
- granger.py:17 (statsmodels grangercausalitytests, ssr_ftest p-values)
- optimumrange.py:26 (quantile-bin y(x), rolling smooth, walk out from peak)

Spark mapping (no statsmodels/scipy in the engine):
- classical decomposition is pure window expressions: centered moving-average
  trend (even periods use the 2xMA endpoint-half-weight filter), per-phase
  detrended means for the seasonal, residual by subtraction. Exact
  statsmodels-parity formulas, distributed per series key.
- harmonic coefficients are the exact DFT at the target harmonic frequencies:
  a_k = 2/n * sum(y cos), b_k = 2/n * sum(y sin) — plain distributed
  aggregations, no FFT needed for a handful of harmonics.
- seasonality detection needs the FULL spectrum, so it runs numpy rfft per
  series inside applyInPandas (a series fits one task by the same argument
  as LOF; the raw 100 TB never reaches this stage — rollups do).
- Granger causality is OLS via distributed cross-product sums: X'X / X'y are
  (2L+1)^2 sums aggregated JVM-side, the tiny normal equations solve on the
  driver, the F-test p-value uses a hand-rolled regularized incomplete beta
  (Lentz continued fraction — Abramowitz & Stegun 26.5.8 / NR 6.4).
- optimum range bins x by distributed approx quantiles, aggregates y per bin
  (<= n_bins rows), then runs the rolling smooth + outward walk driver-side
  over that bounded curve.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# classical seasonal-trend decomposition (pure window exprs)
# ---------------------------------------------------------------------------

def classical_decompose(
    df: DataFrame, key_cols: list[str], ts_col: str, value_col: str,
    period: int,
) -> DataFrame:
    """Additive classical decomposition (decomposition_utils.py:160 /
    statsmodels seasonal_decompose): value = trend + seasonal + residual.

    trend: centered moving average over ``period`` records — odd periods use
    the plain centered mean; even periods the 2xMA filter
    (half weight on both endpoints of a period+1 window). Edges where the
    window is incomplete get null trend, like statsmodels.
    seasonal: per-phase mean of the detrended series, centered to sum 0.
    """
    if period < 2:
        raise ValueError(f"period must be >= 2, got {period}")
    v = F.col(value_col)
    w_seq = Window.partitionBy(*key_cols).orderBy(ts_col)
    half = period // 2
    if period % 2 == 1:
        frame = w_seq.rowsBetween(-half, half)
        trend = F.when(F.count(v).over(frame) == period, F.avg(v).over(frame))
    else:
        frame = w_seq.rowsBetween(-half, half)
        total = F.sum(v).over(frame)
        cnt = F.count(v).over(frame)
        first = F.lag(v, half).over(w_seq)
        last = F.lead(v, half).over(w_seq)
        trend = F.when(
            (cnt == period + 1) & first.isNotNull() & last.isNotNull(),
            (total - 0.5 * first - 0.5 * last) / period,
        )
    base = (
        df.withColumn("_rn", F.row_number().over(w_seq) - 1)
        .withColumn("trend", trend)
        .withColumn("_detr", v - F.col("trend"))
        .withColumn("_phase", F.col("_rn") % period)
    )
    w_phase = Window.partitionBy(*key_cols, "_phase")
    w_all = Window.partitionBy(*key_cols)
    phase_mean = F.avg("_detr").over(w_phase)
    base = base.withColumn("_pm", phase_mean)
    # center the seasonal: subtract the mean of the period's phase means
    # (statsmodels: period_averages -= period_averages.mean()); averaging the
    # DISTINCT phase means via a per-(key,phase) first value
    one_per_phase = F.when(F.row_number().over(w_phase.orderBy(ts_col)) == 1, F.col("_pm"))
    base = base.withColumn("_pm1", one_per_phase)
    grand = F.avg("_pm1").over(w_all)
    return (
        base.withColumn("seasonal", F.col("_pm") - grand)
        .withColumn("residual", v - F.col("trend") - F.col("seasonal"))
        .drop("_rn", "_detr", "_phase", "_pm", "_pm1")
    )


def seasonality_strength(decomposed: DataFrame, key_cols: list[str]) -> DataFrame:
    """strength = var(seasonal) / (var(seasonal) + var(residual)) per key
    (decomposition_utils.py:509-513 style seasonal-power fraction)."""
    return decomposed.groupBy(*key_cols).agg(
        (
            F.var_pop("seasonal")
            / F.nullif(F.var_pop("seasonal") + F.var_pop("residual"), F.lit(0.0))
        ).alias("seasonality_strength")
    )


# ---------------------------------------------------------------------------
# harmonic analysis
# ---------------------------------------------------------------------------

def harmonic_coefficients(
    df: DataFrame, key_cols: list[str], ts_col: str, value_col: str,
    period: int, n_harmonics: int = 10,
) -> DataFrame:
    """Amplitude/phase/power of harmonics k=1..n at multiples of 1/period
    (harmonic.py:19-113). Computed as the exact DFT at each target frequency
    over the record index of non-null rows: a_k = 2/n sum(y cos(2 pi k t/P)),
    b_k = -2/n sum(y sin(...)); amplitude = |a - ib|, phase = atan2(-b', a')
    matching numpy's rfft angle convention. Distributed sums only — one
    shuffle on the key, no FFT, no windowing (rectangular window; the
    reference's default hamming window trades leakage for exactness at the
    target bins, documented deviation)."""
    v = F.col(value_col)
    w_seq = Window.partitionBy(*key_cols).orderBy(ts_col)
    nn = df.filter(v.isNotNull()).withColumn("_t", F.row_number().over(w_seq) - 1)
    aggs = [F.count(v).alias("_n")]
    for k in range(1, n_harmonics + 1):
        ang = 2.0 * math.pi * k * F.col("_t") / period
        aggs.append(F.sum(v * F.cos(ang)).alias(f"_c{k}"))
        aggs.append(F.sum(v * F.sin(ang)).alias(f"_s{k}"))
    wide = nn.groupBy(*key_cols).agg(*aggs)
    rows = []
    for k in range(1, n_harmonics + 1):
        re = 2.0 * F.col(f"_c{k}") / F.col("_n")
        im = -2.0 * F.col(f"_s{k}") / F.col("_n")  # rfft sign convention
        rows.append(F.struct(
            F.lit(k).alias("harmonic"),
            (F.lit(float(k)) / period).alias("frequency"),
            F.sqrt(re * re + im * im).alias("amplitude"),
            F.atan2(im, re).alias("phase"),
            (re * re + im * im).alias("power"),
        ))
    return wide.select(
        *key_cols, F.explode(F.array(*rows)).alias("_h")
    ).select(*key_cols, "_h.harmonic", "_h.frequency", "_h.amplitude",
             "_h.phase", "_h.power")


def detect_seasonality(
    df: DataFrame, key_cols: list[str], ts_col: str, value_col: str,
    max_period: int | None = None, n_top: int = 5,
) -> DataFrame:
    """Dominant seasonal period per series via the detrended periodogram
    (decomposition_utils.py:425-530, semantics mirrored exactly): linear
    detrend, rfft power, periods 2..max_period, spectral PEAKS (local
    maxima) ranked by power — primary = strongest peak (max-power bin when
    the spectrum has no interior peak), ``strength`` = peak power over
    total power in the period band, the reference's 365/[7,30]/0 fallback
    when no period fits the band. Returns primary_period, strength and
    the ranked (period, power) peak lists per series; one applyInPandas
    task per key."""
    types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    schema = ", ".join(
        [f"`{c}` {types[c]}" for c in key_cols]
        + ["primary_period int", "strength double",
           "top_periods array<int>", "top_power array<double>"]
    )
    vcol, tcol = value_col, ts_col

    def kernel(keys: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        s = pdf.sort_values(tcol)[vcol].dropna().to_numpy(dtype=np.float64)
        n = len(s)
        out = {c: [keys[i]] for i, c in enumerate(key_cols)}
        if n < 4:
            out.update(primary_period=[None], strength=[0.0],
                       top_periods=[[]], top_power=[[]])
            return pd.DataFrame(out)
        from diive_spark.operators.pwb import linear_detrend
        from diive_spark.operators.windlag import find_peaks_numpy

        mp = min(max_period or 730, n // 2)
        power = np.abs(np.fft.rfft(linear_detrend(s))) ** 2
        freqs = np.fft.rfftfreq(n)
        band = []
        for i in range(1, len(freqs)):
            if freqs[i] > 0:
                period = 1.0 / freqs[i]
                if 2 <= period <= mp:
                    band.append((int(np.round(period)), float(power[i])))
        if not band:
            # reference fallback: no period fits the band
            out.update(primary_period=[365], strength=[0.0],
                       top_periods=[[365, 7, 30]], top_power=[[]])
            return pd.DataFrame(out)
        periods = [p for p, _ in band]
        pw = np.array([w for _, w in band])
        peaks = find_peaks_numpy(pw)[0]
        if len(peaks):
            ranked = sorted(((periods[p], float(pw[p])) for p in peaks),
                            key=lambda t: -t[1])[:n_top]
            strength = float(pw[peaks].sum() / pw.sum()) if pw.sum() > 0 \
                else 0.0
        else:
            m = int(np.argmax(pw))
            ranked = [(periods[m], float(pw[m]))]
            strength = 0.0
        out.update(
            primary_period=[int(ranked[0][0])],
            strength=[min(strength, 1.0)],
            top_periods=[[int(p) for p, _ in ranked]],
            top_power=[[w for _, w in ranked]],
        )
        return pd.DataFrame(out)

    return df.groupBy(*key_cols).applyInPandas(kernel, schema=schema)


# ---------------------------------------------------------------------------
# Granger causality (distributed OLS cross-products + driver-side F-test)
# ---------------------------------------------------------------------------

def _betainc(a: float, b: float, x: float) -> float:
    """Regularized incomplete beta I_x(a, b) via the Lentz continued fraction
    (Abramowitz & Stegun 26.5.8; Numerical Recipes 6.4 'betacf'). Public
    textbook algorithm, accurate to ~1e-12 for the F-test's parameter range."""
    if x <= 0.0:
        return 0.0
    if x >= 1.0:
        return 1.0

    def betacf(a, b, x):
        MAXIT, EPS, FPMIN = 200, 3e-14, 1e-300
        qab, qap, qam = a + b, a + 1.0, a - 1.0
        c, d = 1.0, 1.0 - qab * x / qap
        if abs(d) < FPMIN:
            d = FPMIN
        d = 1.0 / d
        h = d
        for m in range(1, MAXIT + 1):
            m2 = 2 * m
            aa = m * (b - m) * x / ((qam + m2) * (a + m2))
            d = 1.0 + aa * d
            if abs(d) < FPMIN:
                d = FPMIN
            c = 1.0 + aa / c
            if abs(c) < FPMIN:
                c = FPMIN
            d = 1.0 / d
            h *= d * c
            aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
            d = 1.0 + aa * d
            if abs(d) < FPMIN:
                d = FPMIN
            c = 1.0 + aa / c
            if abs(c) < FPMIN:
                c = FPMIN
            d = 1.0 / d
            delta = d * c
            h *= delta
            if abs(delta - 1.0) < EPS:
                break
        return h

    lbeta = math.lgamma(a + b) - math.lgamma(a) - math.lgamma(b)
    front = math.exp(lbeta + a * math.log(x) + b * math.log(1.0 - x))
    if x < (a + 1.0) / (a + b + 2.0):
        return front * betacf(a, b, x) / a
    return 1.0 - front * betacf(b, a, 1.0 - x) / b


def f_sf(f_stat: float, d1: int, d2: int) -> float:
    """Survival function of the F(d1, d2) distribution:
    P(F > f) = I_{d2/(d2 + d1 f)}(d2/2, d1/2)."""
    if f_stat <= 0:
        return 1.0
    return _betainc(d2 / 2.0, d1 / 2.0, d2 / (d2 + d1 * f_stat))


def granger_causality(
    df: DataFrame, key_cols: list[str], ts_col: str,
    x_col: str, y_col: str, max_lag: int = 5,
) -> pd.DataFrame:
    """Does x Granger-cause y? Per key and per lag L in 1..max_lag, the
    ssr F-test (granger.py:66-92 / statsmodels grangercausalitytests):
    restricted OLS  y_t ~ const + y_{t-1..t-L}
    unrestricted    y_t ~ const + y_{t-1..t-L} + x_{t-1..t-L}
    F = ((RSS_r - RSS_u)/L) / (RSS_u/(n - 2L - 1)).

    Distribution stance: rows where y or x is null are dropped and the
    remaining records re-aligned (reference dropna + index intersection);
    lag columns come from one window pass; all of X'X / X'y / y'y are plain
    sums aggregated JVM-side (one shuffle), and only the (2L+1)x(2L+1)
    normal equations + the F p-value run on the driver per key.

    Returns a pandas DataFrame (keys..., lag, f_stat, p_value, n_obs) —
    driver-side by design: one row per (key, lag)."""
    nn = df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
    w = Window.partitionBy(*key_cols).orderBy(ts_col)
    lagged = nn.select(
        *key_cols,
        F.col(y_col).alias("_y"),
        *[F.lag(y_col, L).over(w).alias(f"_yl{L}") for L in range(1, max_lag + 1)],
        *[F.lag(x_col, L).over(w).alias(f"_xl{L}") for L in range(1, max_lag + 1)],
    ).cache()  # one scan + window pass feeds all max_lag aggregations
    results = []
    for L in range(1, max_lag + 1):
        feats = [f"_yl{i}" for i in range(1, L + 1)] + [f"_xl{i}" for i in range(1, L + 1)]
        cond = None
        for c in feats:
            cnn = F.col(c).isNotNull()
            cond = cnn if cond is None else (cond & cnn)
        rows = lagged.filter(cond)
        terms = ["_y"] + feats
        aggs = [F.count(F.lit(1)).alias("_n")]
        aggs += [F.sum(F.col(c)).alias(f"s_{c}") for c in terms]
        for i, a in enumerate(terms):
            for b in terms[i:]:
                aggs.append(F.sum(F.col(a) * F.col(b)).alias(f"p_{a}_{b}"))
        stats = rows.groupBy(*key_cols).agg(*aggs).collect()
        for r in stats:
            n = int(r["_n"])
            if n < 2 * L + 2:
                continue

            def xtx_xty(cols):
                k = len(cols) + 1  # +1 for the intercept
                A = np.empty((k, k))
                b = np.empty(k)
                A[0, 0] = n
                b[0] = r["s__y"]
                for i, c in enumerate(cols, start=1):
                    A[0, i] = A[i, 0] = r[f"s_{c}"]
                    key = f"p__y_{c}" if f"p__y_{c}" in r.__fields__ else f"p_{c}__y"
                    b[i] = r[key]
                for i, a_ in enumerate(cols, start=1):
                    for j, c_ in enumerate(cols, start=1):
                        if j < i:
                            continue
                        key = f"p_{a_}_{c_}" if f"p_{a_}_{c_}" in r.__fields__ else f"p_{c_}_{a_}"
                        A[i, j] = A[j, i] = r[key]
                return A, b

            yy = r["p__y__y"]
            rss = {}
            try:
                for name, cols in (("r", feats[:L]), ("u", feats)):
                    A, bvec = xtx_xty(cols)
                    beta = np.linalg.solve(A, bvec)
                    rss[name] = float(yy - beta @ bvec)
                d2 = n - 2 * L - 1
                denom = rss["u"] / d2 if d2 > 0 else float("nan")
                f_stat = (((rss["r"] - rss["u"]) / L) / denom
                          if denom and denom > 0 else float("nan"))
            except np.linalg.LinAlgError:
                # a degenerate key (constant series -> singular X'X) must not
                # abort the other keys; it simply has no defined F-test
                f_stat, d2 = float("nan"), n - 2 * L - 1
            p = f_sf(f_stat, L, d2) if math.isfinite(f_stat) else float("nan")
            results.append(
                {**{c: r[c] for c in key_cols}, "lag": L, "f_stat": f_stat,
                 "p_value": p, "n_obs": n}
            )
    lagged.unpersist()
    return pd.DataFrame(results)


def significant_lag(granger_df: pd.DataFrame, alpha: float = 0.05):
    """First lag with p < alpha per key (granger.py:94-105), or None."""
    sig = granger_df[granger_df["p_value"] < alpha].sort_values("lag")
    return int(sig["lag"].iloc[0]) if len(sig) else None


# ---------------------------------------------------------------------------
# optimum range
# ---------------------------------------------------------------------------

def find_optimum_range(
    df: DataFrame, x_col: str, y_col: str,
    n_bins: int = 100, bins_agg: str = "median",
    rwinsize: float = 0.1, ragg: str = "mean",
    define_optimum: str = "max", threshold: float = 0.95,
    prominence_threshold: float = 1.0,
    ts_col: str | None = None,
    relative_error: float = 0.0,
) -> dict:
    """FindOptimumRange (optimumrange.py:26-245): quantile-bin x, aggregate
    y per bin, smooth with a centered rolling window, walk outward from the
    peak while the smoothed curve stays within (1-threshold) of the curve
    range, and report the x-range + prominence.

    Distribution stance: bin edges come from approxQuantile (distributed
    sketch), the per-bin aggregate is one shuffle ending in <= n_bins rows;
    the rolling smooth + outward walk run driver-side over that bounded
    curve — at any corpus size the driver sees n_bins numbers, never rows.
    ``ts_col`` adds the per-year in/below/above-optimum counts
    (optimumrange.py:146-163), computed distributed."""
    # relative_error=0.0 computes exact quantiles (full pass); at web scale
    # pass e.g. 1e-4 for the Greenwald-Khanna sketch (single-digit-MB state)
    probs = [i / n_bins for i in range(n_bins + 1)]
    edges = df.filter(F.col(x_col).isNotNull()).approxQuantile(x_col, probs, relative_error)
    edges = sorted(set(edges))  # duplicates='drop' (pd.qcut contract)
    if len(edges) < 3:
        raise ValueError("not enough distinct x values to form bins")

    # interval (edges[i], edges[i+1]] with the first interval closed on the
    # left — pd.qcut semantics. The .otherwise clamps values ABOVE the top
    # edge into the last bin: with relative_error > 0 the sketch's top edge
    # can sit below the true max, and an unhandled row would get a NULL bin
    # (crashing the int() below).
    bucket = F.when(F.col(x_col) <= edges[1], 0)
    for i in range(1, len(edges) - 1):
        bucket = bucket.when(F.col(x_col) <= edges[i + 1], i)
    bucket = bucket.otherwise(len(edges) - 2)

    agg_fn = F.expr(f"percentile({y_col}, 0.5)") if bins_agg == "median" else F.avg(y_col)
    per_bin = (
        df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
        .withColumn("_bin", bucket)
        .groupBy("_bin")
        .agg(agg_fn.alias("_agg"), F.count(F.lit(1)).alias("_cnt"))
        .orderBy("_bin")
        .collect()
    )
    curve = pd.Series([r["_agg"] for r in per_bin],
                      index=[int(r["_bin"]) for r in per_bin]).sort_index()
    winsize = max(int(round(len(curve) * rwinsize)), 1)
    roll = curve.rolling(winsize, center=True)
    smoothed = (roll.median() if ragg == "median" else roll.mean()).dropna()

    peak_bin = int(smoothed.idxmin() if define_optimum == "min" else smoothed.idxmax())
    peak_val = float(smoothed.loc[peak_bin])
    cmin, cmax = float(smoothed.min()), float(smoothed.max())
    crange = cmax - cmin
    if define_optimum == "max":
        in_range = smoothed >= cmax - (1 - threshold) * crange
    else:
        in_range = smoothed <= cmin + (1 - threshold) * crange
    pos = list(smoothed.index)
    pi = pos.index(peak_bin)
    left = pi
    while left > 0 and in_range.iloc[left - 1]:
        left -= 1
    right = pi
    while right < len(pos) - 1 and in_range.iloc[right + 1]:
        right += 1
    start_bin, end_bin = pos[left], pos[right]
    optimum_xstart = edges[start_bin] if start_bin > 0 else edges[0]
    optimum_xend = edges[end_bin + 1]
    optimum_ymean = float(curve.loc[start_bin:end_bin].mean())

    cstd = float(smoothed.std())
    prominence = abs(peak_val - float(smoothed.mean())) / cstd if cstd > 0 else 0.0

    result = dict(
        optimum_xstart=float(optimum_xstart),
        optimum_xend=float(optimum_xend),
        optimum_ymean=optimum_ymean,
        optimum_start_bin=int(start_bin),
        optimum_end_bin=int(end_bin),
        roptimum_bin=peak_bin,
        roptimum_val=peak_val,
        n_xbins=len(curve),
        rwinsize=winsize,
        optimum_prominence=round(prominence, 3),
        is_optimum_prominent=bool(prominence >= prominence_threshold),
    )
    if ts_col is not None:
        cat = (
            F.when(F.col(x_col) < optimum_xstart, "vals_belowoptimum")
            .when(F.col(x_col) <= optimum_xend, "vals_inoptimum")
            .otherwise("vals_aboveoptimum")
        )
        counts = (
            df.filter(F.col(x_col).isNotNull())
            .withColumn("_cat", cat)
            .groupBy(F.year(ts_col).alias("year"))
            .agg(
                F.sum(F.when(F.col("_cat") == "vals_belowoptimum", 1).otherwise(0)).alias("vals_belowoptimum"),
                F.sum(F.when(F.col("_cat") == "vals_inoptimum", 1).otherwise(0)).alias("vals_inoptimum"),
                F.sum(F.when(F.col("_cat") == "vals_aboveoptimum", 1).otherwise(0)).alias("vals_aboveoptimum"),
                F.count(F.lit(1)).alias("vals_total"),
            )
            .orderBy("year")
            .toPandas()
        )
        result["vals_in_optimum_range_df"] = counts
    return result


# ---------------------------------------------------------------------------
# stratified binning (decoupling) + compound extremes
# ---------------------------------------------------------------------------

def stratified_analysis(
    df: DataFrame, z_col: str, x_col: str, y_col: str,
    n_bins_z: int = 48, n_bins_x: int = 2, agg: str = "median",
    relative_error: float = 0.0,
) -> DataFrame:
    """StratifiedAnalysis / decoupling sorting-bins method
    (/root/reference/diive/analysis/decoupling.py:25-226): quantile-bin z,
    within each z bin quantile-bin x, aggregate x/y per (z-bin, x-bin) with
    counts and 16th/84th-percentile error bars.

    Distribution stance: z-bin edges come from one approxQuantile sketch
    (exact at relativeError=0); x-binning inside each z bin is ntile over a
    per-z-bin window (rank-based quantile bins, pd.qcut semantics up to tie
    placement); the final aggregate has <= n_bins_z * n_bins_x rows. Rows
    with nulls in z/x/y are dropped (pd.qcut NaN-group behavior)."""
    base = df.filter(
        F.col(z_col).isNotNull() & F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
    ).select(F.col(z_col).alias("_z"), F.col(x_col).alias("_x"), F.col(y_col).alias("_y"))
    # relative_error: 0.0 = exact quantile edges; raise for sketch mode at scale
    probs = [i / n_bins_z for i in range(n_bins_z + 1)]
    edges = sorted(set(base.approxQuantile("_z", probs, relative_error)))
    if len(edges) < 3:
        raise ValueError("not enough distinct z values to form bins")
    zb = F.when(F.col("_z") <= edges[1], 0)
    for i in range(1, len(edges) - 1):
        zb = zb.when(F.col("_z") <= edges[i + 1], i)
    # clamp above-top-edge rows into the last bin (sketch mode can report a
    # top edge below the true max; without this they'd group under NULL)
    zb = zb.otherwise(len(edges) - 2)
    binned = base.withColumn("z_bin", zb)
    xw = Window.partitionBy("z_bin").orderBy("_x")
    binned = binned.withColumn("x_bin", F.ntile(n_bins_x).over(xw) - 1)
    agg_fn = (lambda c: F.expr(f"percentile({c}, 0.5)")) if agg == "median" else F.avg
    p = lambda c, q: F.expr(f"percentile({c}, {q})")  # noqa: E731
    out = binned.groupBy("z_bin", "x_bin").agg(
        F.round(agg_fn("_z"), 2).alias("z_label"),
        agg_fn("_x").alias("x_agg"),
        agg_fn("_y").alias("y_agg"),
        F.count(F.lit(1)).alias("y_counts"),
        p("_x", 0.16).alias("x_p16"), p("_x", 0.84).alias("x_p84"),
        p("_y", 0.16).alias("y_p16"), p("_y", 0.84).alias("y_p84"),
    )
    return out.select(
        "z_bin", "z_label", "x_bin", "x_agg", "y_agg", "y_counts",
        "x_p16", "x_p84", "y_p16", "y_p84",
        F.abs(F.col("x_agg") - F.col("x_p16")).alias("xerror_neg"),
        F.abs(F.col("x_agg") - F.col("x_p84")).alias("xerror_pos"),
        F.abs(F.col("y_agg") - F.col("y_p16")).alias("yerror_neg"),
        F.abs(F.col("y_agg") - F.col("y_p84")).alias("yerror_pos"),
    )


AGG_FUNCS = {"mean": F.avg, "median": lambda c: F.expr(f"percentile({c}, 0.5)"),
             "min": F.min, "max": F.max, "sum": F.sum}


def compound_extremes(
    df: DataFrame, ts_col: str, var1: str, var2: str,
    agg: str = "monthly", agg_func: str = "mean",
    var1_extreme: str = "high", var2_extreme: str = "low",
    threshold: float = 2.0,
    var1_threshold: float | None = None, var2_threshold: float | None = None,
    standardize_by: str = "season",
) -> DataFrame:
    """CompoundExtremes (/root/reference/diive/analysis/compoundextremes.py:33):
    aggregate both drivers to monthly/daily periods, z-score each (sample SD;
    'season' standardizes within the calendar month / day-of-year position,
    'record' over the whole record), flag per-variable extremes by tail, and
    classify periods none / var1-only / var2-only / compound.

    Output: (period, v1, v2, z1, z2, var1_extreme, var2_extreme, category,
    label) — one row per period, all computed with windows + one groupBy."""
    t1 = var1_threshold if var1_threshold is not None else threshold
    t2 = var2_threshold if var2_threshold is not None else threshold
    period = (F.date_trunc("month", F.col(ts_col)) if agg == "monthly"
              else F.date_trunc("day", F.col(ts_col))).alias("period")
    fn = AGG_FUNCS[agg_func]
    per = df.groupBy(period).agg(fn(var1).alias("v1"), fn(var2).alias("v2"))
    # materialize the season key as a real column so both z windows share
    # ONE exchange (per-expression window keys would shuffle twice)
    if standardize_by == "record":
        per = per.withColumn("_season", F.lit(0))
    else:
        per = per.withColumn(
            "_season",
            F.month("period") if agg == "monthly" else F.dayofyear("period"),
        )
    w = Window.partitionBy("_season")

    def z(c):
        sd = F.nullif(F.stddev_samp(c).over(w), F.lit(0.0))
        return (F.col(c) - F.avg(c).over(w)) / sd

    per = per.withColumn("z1", z("v1")).withColumn("z2", z("v2")).drop("_season")
    per = per.filter(F.col("z1").isNotNull() & F.col("z2").isNotNull())

    def flag(zc, direction, thr):
        return (F.col(zc) >= thr) if direction == "high" else (F.col(zc) <= -thr)

    f1, f2 = flag("z1", var1_extreme, t1), flag("z2", var2_extreme, t2)
    category = (
        F.when(f1 & f2, "compound")
        .when(f1, "var1_only")
        .when(f2, "var2_only")
        .otherwise("none")
    )
    fmt = "yyyy-MM" if agg == "monthly" else "yyyy-MM-dd"
    return per.select(
        F.date_format("period", fmt).alias("period"),
        "v1", "v2", "z1", "z2",
        f1.alias("var1_extreme"), f2.alias("var2_extreme"),
        category.alias("category"),
    )


def harmonic_spectrum(
    df: DataFrame, key_cols: list[str], ts_col: str, value_col: str,
    n_harmonics: int = 10, window: str = "hamming",
) -> DataFrame:
    """Windowed harmonic (Fourier) decomposition per series — the
    reference's ``harmonic_decompose`` (decomposition_utils.py:214-316),
    semantics mirrored: drop NaN, apply the taper window (hamming / hann
    / blackman — numpy's cosine-sum tapers, the same coefficients scipy
    builds), one-sided FFT amplitudes 2·|X_k|/n with DC excluded, top
    ``n_harmonics`` by power ordered by FREQUENCY, plus the cosine
    reconstruction RMSE against the tapered signal. One bounded
    applyInPandas task per key; returns one row per (key, harmonic).

    Documented taper divergence: numpy's windows are SYMMETRIC while
    scipy's ``get_window`` default is the periodic (fftbins) variant —
    an O(1/n) end-point difference."""
    windows = {"hamming": np.hamming, "hann": np.hanning,
               "blackman": np.blackman}
    taper = windows.get(window, np.hamming)
    types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    schema = ", ".join(
        [f"`{c}` {types[c]}" for c in key_cols]
        + ["rank int", "amplitude double", "phase double",
           "frequency double", "period double", "recon_rmse double"]
    )
    vcol, tcol = value_col, ts_col

    def kernel(keys: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        s = pdf.sort_values(tcol)[vcol].dropna().to_numpy(dtype=np.float64)
        n = len(s)
        base = {c: keys[i] for i, c in enumerate(key_cols)}
        if n < 4:
            return pd.DataFrame(columns=list(base) + [
                "rank", "amplitude", "phase", "frequency", "period",
                "recon_rmse"])
        sw = s * taper(n)
        fft = np.fft.rfft(sw) / n
        freqs = np.fft.rfftfreq(n)
        amps = 2 * np.abs(fft[1:])
        top = np.sort(np.argsort(-(amps ** 2))[:n_harmonics])
        rows = []
        recon = np.zeros(n)
        t = np.arange(n)
        for rank, idx in enumerate(top):
            f_norm = freqs[idx + 1]
            if f_norm <= 0:
                continue
            amp = float(amps[idx])
            ph = float(np.angle(fft[idx + 1]))
            recon += amp * np.cos(2 * np.pi * f_norm * t + ph)
            rows.append({**base, "rank": rank, "amplitude": amp,
                         "phase": ph, "frequency": float(f_norm),
                         "period": float(1.0 / f_norm)})
        rmse = float(np.sqrt(np.mean((sw - recon) ** 2)))
        for r in rows:
            r["recon_rmse"] = rmse
        return pd.DataFrame(rows)

    return df.groupBy(*key_cols).applyInPandas(kernel, schema=schema)
