"""2-D grid aggregation (diive GridAggregator,
/root/reference/diive/analysis/gridaggregator.py:19-459).

Bin (x, y) by quantile (pd.qcut ≙ ntile) / equal-width (pd.cut ≙ floor
formula) / custom edges, aggregate z per cell, mask cells under a min count,
emit long form (and optionally pivot wide on the x bin).
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


def quantile_bucket(df: DataFrame, value_col: str, n_bins: int, out_col: str) -> DataFrame:
    """pd.qcut-equivalent: ntile over the value ordering (equal-count bins).
    Nulls are excluded BEFORE tiling (pd.qcut drops NaN first — tiling over
    a window that includes nulls would shift every non-null bucket)."""
    from pyspark.sql import Window

    base = df.withColumn("_qb_rowid", F.monotonically_increasing_id())
    nn = base.filter(F.col(value_col).isNotNull())
    w = Window.orderBy(value_col)
    tiled = nn.select(
        "_qb_rowid", (F.ntile(n_bins).over(w) - 1).cast("int").alias(out_col)
    )
    return base.join(tiled, "_qb_rowid", "left").drop("_qb_rowid")


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
        binned = quantile_bucket(df, x_col, n_bins_x, "xbin")
        binned = quantile_bucket(binned, y_col, n_bins_y, "ybin")
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
