"""2-D grid aggregation (diive GridAggregator,
/root/reference/diive/analysis/gridaggregator.py:19-459).

Bin (x, y) by quantile (pd.qcut ≙ percentile edges + CASE) / equal-width
(pd.cut ≙ floor formula) / custom edges, aggregate z per cell, mask cells
under a min count, emit long form (and optionally pivot wide on the x bin).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def equal_width_bucket(col: Column, lo: float, hi: float, n_bins: int) -> Column:
    """pd.cut-equivalent bucket index 0..n_bins-1 (right edge inclusive into
    the last bin); null outside [lo, hi]."""
    width = (hi - lo) / n_bins
    raw = F.floor((col - F.lit(lo)) / F.lit(width)).cast("int")
    return (
        F.when(col.isNull() | (col < lo) | (col > hi), None)
        .when(raw >= n_bins, n_bins - 1)
        .otherwise(raw)
        .cast("int")
    )


def custom_edges_bucket(col: Column, edges: list[float]) -> Column:
    """Bucket by explicit edges (len(edges)-1 bins, right-inclusive last)."""
    expr = F.when(col.isNull() | (col < edges[0]) | (col > edges[-1]), None)
    for i in range(len(edges) - 1):
        expr = expr.when(col <= edges[i + 1], i)
    return expr.cast("int")


def quantile_edges(
    df: DataFrame, value_col: str, n_bins: int, relative_error: float = 0.0,
) -> list[float]:
    """Quantile bin edges (pd.qcut semantics: linear-interpolated percentiles
    at i/n_bins, duplicate edges dropped). ``relative_error=0.0`` uses the
    exact interpolating ``percentile`` aggregate (one distributed pass, same
    definition as np.percentile / DuckDB quantile_cont); a positive value
    switches to the approxQuantile Greenwald-Khanna sketch for web scale.
    Nulls never contribute (percentile skips them)."""
    probs = [i / n_bins for i in range(n_bins + 1)]
    nn = df.filter(F.col(value_col).isNotNull())
    if relative_error > 0.0:
        edges = nn.approxQuantile(value_col, probs, relative_error)
    else:
        edges = nn.agg(
            F.percentile(F.col(value_col), F.array(*[F.lit(p) for p in probs]))
        ).collect()[0][0]
    if not edges:  # all-null / empty column: no bins (match the sketch path)
        return []
    return sorted(set(edges))


def quantile_bucket(
    df: DataFrame, value_col: str, n_bins: int, out_col: str,
    relative_error: float = 0.0,
) -> DataFrame:
    """pd.qcut-equivalent bucketing via quantile EDGES + CASE bucketing.

    Scale note: the previous implementation tiled with a no-partition
    ``ntile`` window (every row through ONE task) and joined back on
    ``monotonically_increasing_id`` — a nondeterministic join key under stage
    retry. Edges are a bounded aggregate (n_bins+1 doubles to the driver) and
    the bucketing is a pure column expression — no window, no rowid join, one
    extra pass. Rank ties at an edge all land in the lower bin (pd.qcut
    places ties by value, not rank — identical values always share a bin)."""
    edges = quantile_edges(df, value_col, n_bins, relative_error)
    if len(edges) < 2:
        return df.withColumn(out_col, F.lit(None).cast("int"))
    bucket = custom_edges_bucket(F.col(value_col), edges)
    # clamp values OUTSIDE the reported edges into the end bins: with
    # relative_error > 0 the sketch's extreme edges can sit inside the true
    # range, and pd.qcut semantics put every non-null value in a bin (same
    # hazard fixed in analysis.find_optimum_range). Exact edges are the
    # true min/max, so this is a no-op there.
    v = F.col(value_col)
    bucket = (
        F.when(v.isNull(), None)
        .when(v < edges[0], 0)
        .when(v > edges[-1], len(edges) - 2)
        .otherwise(bucket)
        .cast("int")
    )
    return df.withColumn(out_col, bucket)


AGGS = {
    "mean": F.avg, "sum": F.sum, "min": F.min, "max": F.max,
    "count": lambda c: F.count(c),
    "median": lambda c: F.percentile(c, F.lit(0.5)),
}


def grid_aggregate(
    df: DataFrame,
    x_col: str, y_col: str, z_col: str,
    binning_type: str = "equal_width",
    n_bins_x: int = 10, n_bins_y: int = 10,
    x_range: tuple[float, float] | None = None,
    y_range: tuple[float, float] | None = None,
    custom_x_edges: list[float] | None = None,
    custom_y_edges: list[float] | None = None,
    aggfunc: str = "mean",
    min_n_vals_per_bin: int = 1,
    pivot_wide: bool = False,
    relative_error: float = 0.0,
) -> DataFrame:
    """GridAggregator core (gridaggregator.py:290-422): returns long form
    (xbin, ybin, n_vals, agg_value) with undersized cells masked null
    (reference keeps the cell row, gridaggregator.py min-count mask)."""
    if binning_type == "equal_width":
        if x_range is None or y_range is None:
            lo_hi = df.agg(
                F.min(x_col), F.max(x_col), F.min(y_col), F.max(y_col)
            ).collect()[0]
            x_range = x_range or (lo_hi[0], lo_hi[1])
            y_range = y_range or (lo_hi[2], lo_hi[3])
        xb = equal_width_bucket(F.col(x_col), *x_range, n_bins_x)
        yb = equal_width_bucket(F.col(y_col), *y_range, n_bins_y)
        binned = df.withColumn("xbin", xb).withColumn("ybin", yb)
    elif binning_type == "custom":
        binned = df.withColumn(
            "xbin", custom_edges_bucket(F.col(x_col), custom_x_edges)
        ).withColumn("ybin", custom_edges_bucket(F.col(y_col), custom_y_edges))
    elif binning_type == "quantile":
        binned = quantile_bucket(df, x_col, n_bins_x, "xbin", relative_error)
        binned = quantile_bucket(binned, y_col, n_bins_y, "ybin", relative_error)
    else:
        raise ValueError(binning_type)

    out = (
        binned.filter(F.col("xbin").isNotNull() & F.col("ybin").isNotNull())
        .groupBy("xbin", "ybin")
        .agg(
            F.count(z_col).alias("n_vals"),
            AGGS[aggfunc](F.col(z_col)).alias("agg_value"),
        )
        .withColumn(
            "agg_value",
            F.when(F.col("n_vals") >= min_n_vals_per_bin, F.col("agg_value")),
        )
    )
    if pivot_wide:
        return out.groupBy("ybin").pivot("xbin").agg(F.first("agg_value")).orderBy("ybin")
    return out
