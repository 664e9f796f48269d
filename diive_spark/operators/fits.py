"""Binned polynomial curve fitting with confidence + prediction bands.

Reference: ``BinFitterCP`` (/root/reference/diive/fits/fitter.py:17-253):
equal-width x bins, per-bin y aggregation, polynomial least squares
(linear / quadratic / quadratic_offset / cubic) on the binned points, 95 %
confidence region from the propagated parameter covariance (±1.96 σ, the
reference's constant) and the classic t-quantile prediction band
(fitter.py:92 ``_predband``). Re-expressed Spark-first.

Distribution stance (same as find_optimum_range): the bin aggregation is
one shuffle ending in ≤ n_bins rows; the (p×p) least-squares solve runs on
those n_bins numbers driver-side — at any corpus size the driver sees
n_bins rows, never data. The prediction grid (``fit_df``) is generated as a
lazy ``spark.range`` plan with the fitted coefficients folded into column
expressions, so band evaluation is distributed and composable.

No scipy in this container: the t quantile comes from bisecting the
Student-t CDF built on the engine's regularized-incomplete-beta
(analysis._betainc, Numerical Recipes 6.4) — checked against tabulated
values in tests/test_fits.py.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from diive_spark.operators.analysis import _betainc
from diive_spark.operators.gridagg import equal_width_bucket

FIT_DEGREES = {"linear": [1, 0], "quadratic": [2, 1],
               "quadratic_offset": [2, 1, 0], "cubic": [3, 2, 1, 0]}


def t_cdf(t: float, dof: float) -> float:
    """Student-t CDF via the regularized incomplete beta."""
    if t == 0.0:
        return 0.5
    x = dof / (dof + t * t)
    p = 0.5 * _betainc(dof / 2.0, 0.5, x)
    return 1.0 - p if t > 0 else p


def t_ppf(q: float, dof: float) -> float:
    """Student-t quantile by bisection on t_cdf (scipy.stats.t.ppf
    replacement; ~1e-10 absolute for the band-use range)."""
    if not 0.0 < q < 1.0:
        raise ValueError(q)
    if q == 0.5:
        return 0.0  # betainc's x->1 rounding floors t_cdf precision at ~3e-8
    lo, hi = -1e6, 1e6
    for _ in range(200):
        mid = 0.5 * (lo + hi)
        if t_cdf(mid, dof) < q:
            lo = mid
        else:
            hi = mid
        if hi - lo < 1e-12 * max(1.0, abs(mid)):
            break
    return 0.5 * (lo + hi)


def bin_aggregate_xy(
    df: DataFrame, x_col: str, y_col: str, n_bins_x: int,
    agg: str = "mean",
    x_range: tuple[float, float] | None = None,
) -> DataFrame:
    """Equal-width x bins with the reference's groupagg stats per bin:
    mean/median of x and y, SD, count, q25/q75 (dfun/fits.py groupagg)."""
    base = df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
    if x_range is None:
        lo_hi = base.agg(F.min(x_col), F.max(x_col)).collect()[0]
        x_range = (float(lo_hi[0]), float(lo_hi[1]))
    xb = equal_width_bucket(F.col(x_col), *x_range, n_bins_x)
    center = {"mean": F.avg, "median": lambda c: F.percentile(c, F.lit(0.5))}[agg]
    return (
        base.withColumn("bin", xb).filter(F.col("bin").isNotNull())
        .groupBy("bin")
        .agg(
            center(F.col(x_col)).alias("x_agg"),
            center(F.col(y_col)).alias("y_agg"),
            F.stddev_samp(x_col).alias("x_sd"),
            F.stddev_samp(y_col).alias("y_sd"),
            F.percentile(F.col(y_col), F.lit(0.25)).alias("y_q25"),
            F.percentile(F.col(y_col), F.lit(0.75)).alias("y_q75"),
            F.count(F.lit(1)).alias("counts"),
        )
    )


def _lstsq_with_cov(x: np.ndarray, y: np.ndarray, powers: list[int]):
    """Least squares + curve_fit-convention covariance:
    cov = s² (XᵀX)⁻¹ with s² = RSS / (N - p) (absolute_sigma=False)."""
    X = np.column_stack([x ** p for p in powers])
    beta, *_ = np.linalg.lstsq(X, y, rcond=None)
    resid = y - X @ beta
    n, p = len(y), len(powers)
    if n <= p:
        raise ValueError(f"need more than {p} bins to fit, got {n}")
    s2 = float(resid @ resid) / (n - p)
    cov = s2 * np.linalg.inv(X.T @ X)
    return beta, cov, float(resid @ resid)


def bin_fit_cp(
    df: DataFrame, x_col: str, y_col: str,
    n_bins_x: int = 10, bins_y_agg: str = "mean",
    fit_type: str = "quadratic_offset",
    n_predictions: int = 1000, conf: float = 0.95,
    x_range: tuple[float, float] | None = None,
) -> dict:
    """BinFitterCP analogue. Returns a dict:
    ``bin_df`` (Spark, per-bin stats), ``fit_params`` / ``fit_params_cov`` /
    ``fit_r2`` / ``fit_equation_str`` (driver scalars from the ≤n_bins
    aggregate), and ``fit_df`` — a LAZY Spark frame of ``n_predictions``
    points with columns (fit_x, nom, std, nom_lower_ci95, nom_upper_ci95,
    lower_predband, upper_predband).

    ``n_bins_x=0`` fits the unbinned data (reference contract) — then the
    driver-side arrays are the raw points, so keep that mode for small
    frames only (the binned mode is the scale path)."""
    if fit_type not in FIT_DEGREES:
        raise ValueError(fit_type)
    powers = FIT_DEGREES[fit_type]

    if n_bins_x and n_bins_x > 0:
        bin_df = bin_aggregate_xy(df, x_col, y_col, n_bins_x, bins_y_agg,
                                  x_range)
        pts = bin_df.select("x_agg", "y_agg").dropna().collect()
        x = np.array([r["x_agg"] for r in pts])
        y = np.array([r["y_agg"] for r in pts])
    else:
        bin_df = None
        pts = df.select(F.col(x_col).alias("x"), F.col(y_col).alias("y")) \
                .dropna().collect()
        x = np.array([r["x"] for r in pts])
        y = np.array([r["y"] for r in pts])

    beta, cov, rss = _lstsq_with_cov(x, y, powers)
    n, p = len(y), len(powers)
    ss_tot = float(((y - y.mean()) ** 2).sum())
    r2 = 1.0 - rss / ss_tot if ss_tot > 0 else float("nan")
    terms = [f"{b:+.4f}x^{pw}" if pw > 1 else (f"{b:+.4f}x" if pw == 1 else f"{b:+.4f}")
             for b, pw in zip(beta, powers)]
    eq = "y = " + "".join(terms).lstrip("+")

    # prediction-band ingredients (fitter.py:92): t quantile, residual SD,
    # x-spread — all scalars
    alpha = 1.0 - conf
    q = t_ppf(1.0 - alpha / 2.0, n - p)
    se = math.sqrt(rss / (n - p))
    x_mean = float(x.mean())
    sxd = float(((x - x_mean) ** 2).sum())
    x_lo, x_hi = float(x.min()), float(x.max())

    spark = df.sparkSession
    n_predictions = max(2, int(n_predictions))  # reference clamp (fitter.py:70)
    step = (x_hi - x_lo) / (n_predictions - 1)
    grid = spark.range(n_predictions).select(
        (F.lit(x_lo) + F.col("id") * F.lit(step)).alias("fit_x"))
    fx = F.col("fit_x")
    nom = None
    for b, pw in zip(beta, powers):
        term = F.lit(float(b)) * fx ** pw if pw else F.lit(float(b))
        nom = term if nom is None else nom + term
    # var(fit) = g' Cov g with g = (x^p0, x^p1, ...)
    var = None
    for i, pi in enumerate(powers):
        for j, pj in enumerate(powers):
            t = F.lit(float(cov[i, j])) * fx ** (pi + pj)
            var = t if var is None else var + t
    std = F.sqrt(var)
    # sxd == 0 (all bins share one x): band undefined -> NULL, not inf
    dy = (F.lit(q * se) * F.sqrt(
        1.0 + F.lit(1.0 / n)
        + (fx - F.lit(x_mean)) ** 2 / F.nullif(F.lit(sxd), F.lit(0.0)))
        if sxd > 0.0 else F.lit(None).cast("double"))
    fit_df = (
        grid.withColumn("nom", nom).withColumn("std", std)
        .withColumn("nom_lower_ci95", F.col("nom") - 1.96 * F.col("std"))
        .withColumn("nom_upper_ci95", F.col("nom") + 1.96 * F.col("std"))
        .withColumn("lower_predband", F.col("nom") - dy)
        .withColumn("upper_predband", F.col("nom") + dy)
    )
    return dict(
        bin_df=bin_df, fit_df=fit_df,
        fit_params=beta, fit_params_cov=cov, fit_r2=r2,
        fit_equation_str=eq, n_bins_used=n, fit_type=fit_type,
        t_quantile=q, residual_se=se,
    )
