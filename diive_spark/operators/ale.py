"""Accumulated Local Effects (Apley & Zhu 2020) — first-order ALE curves.

Reference: /root/reference/diive/analysis/driveranalysis/ale.py:192
(``accumulated_local_effects``): quantile-bin the feature, average the
prediction CHANGE across each narrow bin (other features held at their
observed values), cumulative-sum the per-bin effects into a curve at the
bin edges, and center it so the data-weighted mean is zero.

The reference evaluates a fitted sklearn RF; the engine is model-runtime
free, so the model arrives as a PURE COLUMN EXPRESSION builder
``predict(features: dict[str, Column]) -> Column`` — e.g. the closed-form
OLS coefficients from gapfill.linear_model_fill, a fits.bin_fit_cp
polynomial, or any hand-written expression. That keeps both prediction
evaluations per row inside whole-stage codegen: the whole estimator is two
JVM expression evaluations + one groupBy + a grid_size-row cumsum. No
model serving, no per-row Python.

Scale shape: the only full-data passes are the quantile-edge sketch/exact
percentile and the binned delta aggregation (one shuffle ending in
<= grid_size rows); accumulation + centering run on the bounded bin frame
(single-partition window over <= grid_size rows — bounded by construction).

``accumulated_local_effects_2d`` is the second-order (interaction) surface
(ale.py:258): per cell the mean SECOND difference of the prediction over
the four cell corners (cancels each feature's solo effect), double
cumulative accumulation, zero-padded to edge positions, then double
centering (row/col means, grand mean restored). Same execution shape: four
codegen prediction evaluations per row, one groupBy to <= grid² cells,
bounded-window accumulation.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from diive_spark.operators.gridagg import quantile_edges


def linear_predictor(coefs: dict[str, float], intercept: float = 0.0
                     ) -> Callable[[dict], Column]:
    """Model builder for a linear model (e.g. linear_model_fill output)."""
    def predict(feats: dict) -> Column:
        expr = F.lit(float(intercept))
        for name, b in coefs.items():
            expr = expr + F.lit(float(b)) * feats[name]
        return expr
    return predict


def _bin_col(x: Column, edges: list[float]) -> Column:
    """1-based interval bin (edges[k-1], edges[k]], extremes clipped in."""
    b = F.lit(1)
    for k in range(1, len(edges) - 1):
        b = b + (x > F.lit(edges[k])).cast("int")
    return b


def accumulated_local_effects(
    df: DataFrame,
    predict: Callable[[dict], Column],
    feature: str,
    feature_cols: list[str] | None = None,
    grid_size: int = 20,
    relative_error: float = 0.0,
    edges: list[float] | None = None,
) -> DataFrame:
    """First-order ALE curve for ``feature``.

    Returns a DataFrame with one row per bin EDGE (edge_idx 0..n_bins):
    ``edge`` (the feature value), ``ale`` (centered effect: deviation from
    the average prediction, in target units), ``bin_count`` (observations
    in the bin ENDING at this edge; null at edge 0).

    ``predict`` receives a dict mapping every feature name to a Column and
    must return the prediction Column; it is evaluated twice per row with
    ``feature`` replaced by its bin's upper/lower edge (the Apley & Zhu
    local difference — other features keep their observed values, so the
    model is only evaluated where data actually lives).

    ``edges`` overrides the quantile grid with explicit bin edges (e.g. for
    cross-engine-reproducible audits: interpolated quantiles are only
    bit-identical across engines at some probabilities)."""
    feature_cols = feature_cols or df.columns
    base = df.filter(F.col(feature).isNotNull())
    if edges is None:
        edges = quantile_edges(base, feature, grid_size, relative_error)
    else:
        edges = sorted(set(float(e) for e in edges))
    if len(edges) < 2:
        raise ValueError(f"not enough distinct {feature} values for ALE bins")
    n_bins = len(edges) - 1

    # bin k (1-based) covers (edges[k-1], edges[k]]; everything at/below the
    # first inner edge clips into bin 1, above the last edge into n_bins
    # (reference: searchsorted left, clipped 1..n_bins)
    edge_arr = F.array(*[F.lit(float(e)) for e in edges])
    binned = base.withColumn("_bin", _bin_col(F.col(feature), edges))
    feats_hi = {c: F.col(c) for c in feature_cols}
    feats_lo = dict(feats_hi)
    feats_hi[feature] = F.element_at(edge_arr, F.col("_bin") + 1)
    feats_lo[feature] = F.element_at(edge_arr, F.col("_bin"))
    delta = predict(feats_hi) - predict(feats_lo)

    per_bin = binned.groupBy("_bin").agg(
        F.avg(delta).alias("_d"), F.count(F.lit(1)).alias("bin_count"))
    # complete empty bins (possible after duplicate-edge drops): effect 0,
    # count 0 — the reference's zero-initialized arrays
    spark = df.sparkSession
    grid = spark.range(1, n_bins + 1).select(F.col("id").cast("int").alias("_bin"))
    per_bin = grid.join(per_bin, "_bin", "left").select(
        "_bin",
        F.coalesce("_d", F.lit(0.0)).alias("_d"),
        F.coalesce("bin_count", F.lit(0)).alias("bin_count"),
    )
    # accumulate at edges (edge 0 is the zero reference), then center by the
    # data-weighted mean of the per-bin segment midpoints — all over the
    # bounded <= grid_size-row frame
    w = Window.orderBy("_bin").rowsBetween(Window.unboundedPreceding, 0)
    curve = per_bin.withColumn("_ale_hi", F.sum("_d").over(w))
    curve = curve.withColumn("_ale_lo", F.col("_ale_hi") - F.col("_d"))
    stats = curve.agg(
        (F.sum((F.col("_ale_lo") + F.col("_ale_hi")) / 2.0 * F.col("bin_count"))
         / F.nullif(F.sum("bin_count").cast("double"), F.lit(0.0))).alias("_wm")
    )
    curve = curve.crossJoin(F.broadcast(stats)).withColumn(
        "_wm", F.coalesce("_wm", F.lit(0.0)))
    edge_rows = curve.select(
        F.col("_bin").alias("edge_idx"),
        F.element_at(edge_arr, F.col("_bin") + 1).alias("edge"),
        (F.col("_ale_hi") - F.col("_wm")).alias("ale"),
        "bin_count",
    )
    zero_row = curve.filter(F.col("_bin") == 1).select(
        F.lit(0).alias("edge_idx"),
        F.element_at(edge_arr, F.lit(1)).alias("edge"),
        (F.lit(0.0) - F.col("_wm")).alias("ale"),
        F.lit(None).cast("bigint").alias("bin_count"),
    )
    return zero_row.unionByName(edge_rows).orderBy("edge_idx")


def accumulated_local_effects_2d(
    df: DataFrame,
    predict: Callable[[dict], Column],
    f1: str, f2: str,
    feature_cols: list[str] | None = None,
    grid_size: int = 10,
    relative_error: float = 0.0,
    x_edges: list[float] | None = None,
    y_edges: list[float] | None = None,
) -> DataFrame:
    """Second-order (interaction) ALE surface for (f1, f2): one row per
    EDGE position (x_idx 0..nx, y_idx 0..ny) with ``x_edge``/``y_edge``,
    the double-centered ``ale`` value and the cell count (cell ending at
    this corner; null along the zero row/column). A flat surface means the
    two features act additively."""
    feature_cols = feature_cols or df.columns
    base = df.filter(F.col(f1).isNotNull() & F.col(f2).isNotNull())
    xe = (sorted(set(map(float, x_edges))) if x_edges is not None
          else quantile_edges(base, f1, grid_size, relative_error))
    ye = (sorted(set(map(float, y_edges))) if y_edges is not None
          else quantile_edges(base, f2, grid_size, relative_error))
    if len(xe) < 2 or len(ye) < 2:
        raise ValueError("not enough distinct values for 2-D ALE bins")
    nx, ny = len(xe) - 1, len(ye) - 1

    xe_arr = F.array(*[F.lit(e) for e in xe])
    ye_arr = F.array(*[F.lit(e) for e in ye])
    binned = base.withColumn("_xb", _bin_col(F.col(f1), xe)) \
                 .withColumn("_yb", _bin_col(F.col(f2), ye))

    def corner(dx: int, dy: int) -> Column:
        feats = {c: F.col(c) for c in feature_cols}
        feats[f1] = F.element_at(xe_arr, F.col("_xb") + dx)
        feats[f2] = F.element_at(ye_arr, F.col("_yb") + dy)
        return predict(feats)

    second_diff = corner(1, 1) - corner(0, 1) - corner(1, 0) + corner(0, 0)
    cells = binned.groupBy("_xb", "_yb").agg(
        F.avg(second_diff).alias("_d"), F.count(F.lit(1)).alias("cell_count"))

    spark = df.sparkSession
    gx = spark.range(1, nx + 1).select(F.col("id").cast("int").alias("_xb"))
    gy = spark.range(1, ny + 1).select(F.col("id").cast("int").alias("_yb"))
    full = gx.crossJoin(gy).join(cells, ["_xb", "_yb"], "left").select(
        "_xb", "_yb",
        F.coalesce("_d", F.lit(0.0)).alias("_d"),
        F.coalesce("cell_count", F.lit(0)).alias("cell_count"),
    )
    # double cumulative sum over the bounded cell grid
    wx = (Window.partitionBy("_yb").orderBy("_xb")
          .rowsBetween(Window.unboundedPreceding, 0))
    wy = (Window.partitionBy("_xb").orderBy("_yb")
          .rowsBetween(Window.unboundedPreceding, 0))
    acc = full.withColumn("_cx", F.sum("_d").over(wx))
    acc = acc.withColumn("_acc", F.sum("_cx").over(wy))
    # pad to edge positions: zero row (y_idx 0) and zero column (x_idx 0)
    core = acc.select(F.col("_xb").alias("x_idx"), F.col("_yb").alias("y_idx"),
                      F.col("_acc"), "cell_count")
    zx = spark.range(0, nx + 1).select(F.col("id").cast("int").alias("x_idx"))
    zy = spark.range(0, ny + 1).select(F.col("id").cast("int").alias("y_idx"))
    pad = zx.crossJoin(zy).filter((F.col("x_idx") == 0) | (F.col("y_idx") == 0)) \
        .withColumn("_acc", F.lit(0.0)) \
        .withColumn("cell_count", F.lit(None).cast("bigint"))
    mat = core.unionByName(pad)
    # double centering over the padded EDGE matrix (unweighted, as the
    # reference): subtract row/col means, restore the grand mean
    row_m = mat.groupBy("y_idx").agg(F.avg("_acc").alias("_rm"))
    col_m = mat.groupBy("x_idx").agg(F.avg("_acc").alias("_cm"))
    grand = mat.agg(F.avg("_acc").alias("_gm"))
    out = (mat.join(F.broadcast(row_m), "y_idx")
           .join(F.broadcast(col_m), "x_idx")
           .crossJoin(F.broadcast(grand)))
    return out.select(
        "x_idx", "y_idx",
        F.element_at(xe_arr, F.col("x_idx") + 1).alias("x_edge"),
        F.element_at(ye_arr, F.col("y_idx") + 1).alias("y_edge"),
        (F.col("_acc") - F.col("_rm") - F.col("_cm") + F.col("_gm")).alias("ale"),
        "cell_count",
    ).orderBy("x_idx", "y_idx")
