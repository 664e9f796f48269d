"""Frame utilities: projections, shape-preserving filters, trims, low-res
aggregate broadcast-back, neighboring-years pool.

Reference (/root/reference/diive/core/dfun/frames.py and times.py):
- keep_vars (frames.py:27): exact + wildcard column projection.
- keep_records_where (frames.py:61): range predicate on one column;
  non-matching rows get ALL value columns nulled by default
  (shape-preserving), or dropped; invertible; inclusive= both/left/right/
  neither; null predicate values never kept.
- keep_daterange (times.py:1884): inclusive time-range filter.
- keep_years / remove_after_date (times.py:1863/1837).
- trim_frame (frames.py:207): drop leading/trailing all-null region w.r.t.
  one column.
- aggregated_as_hires (frames.py:255-314): compute a low-res aggregate and
  broadcast it back onto the high-res rows via equi-join on the truncated
  date key.
- neighboring_years pool (times/neighbors.py:8).
- add_continuous_record_number (frames.py:543).
"""

from __future__ import annotations

import fnmatch

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def keep_vars(df: DataFrame, patterns: list[str], always_keep: list[str] | None = None) -> DataFrame:
    """Projection by exact names + fnmatch wildcards (frames.py:27)."""
    keep = list(always_keep or [])
    for c in df.columns:
        if c in keep:
            continue
        if any(fnmatch.fnmatch(c, p) for p in patterns):
            keep.append(c)
    return df.select(*keep)


def keep_records_where(
    df: DataFrame,
    col: str,
    lower: float,
    upper: float,
    inclusive: str = "both",
    invert: bool = False,
    drop: bool = False,
    protect_cols: list[str] | None = None,
) -> DataFrame:
    """Shape-preserving range filter (frames.py:61): rows failing the
    predicate keep their timestamp/key columns but have all other columns
    nulled; ``drop=True`` removes them instead. Null predicate values never
    match (tests/test_frames.py:17-75 contract)."""
    c = F.col(col)
    conds = {
        "both": (c >= lower) & (c <= upper),
        "left": (c >= lower) & (c < upper),
        "right": (c > lower) & (c <= upper),
        "neither": (c > lower) & (c < upper),
    }
    pred = conds[inclusive]
    if invert:
        # invert removes the IN-RANGE records; a null condition can't be
        # in-range, so it is KEPT (tests/test_frames.py:54-58 contract)
        pred = c.isNull() | ~pred
    else:
        # null condition values never match (tests/test_frames.py:40-44)
        pred = c.isNotNull() & pred
    if drop:
        return df.filter(pred)
    protect = set(protect_cols or [])
    cols = [
        F.col(x) if x in protect else F.when(pred, F.col(x)).otherwise(F.lit(None)).alias(x)
        for x in df.columns
    ]
    return df.select(*cols)


def select_records_to_code(
    df: DataFrame,
    predicate: str,
    lineage=None,
    tier: str = "selection",
    run_id: str | None = None,
    record_count: bool = False,
) -> DataFrame:
    """Auditable record selection (reference select_records_to_code,
    diive/core/dfun/frames.py:129 — an interactive affordance that hands the
    user a reproducible code snippet; SURVEY.md maps it to "log the
    equivalent SQL in lineage").

    Filters by a SQL predicate and, when a LineageStore is given, commits a
    lineage row whose ``query_text`` holds the exact predicate — so every
    manual selection in a pipeline is replayable from the lineage table.
    ``record_count=True`` additionally materializes the selected row count
    (one extra job)."""
    out = df.filter(F.expr(predicate))
    if lineage is not None:
        from diive_spark.plans.lineage import new_run_id

        lineage.commit([{
            "partition_id": "query",
            "tier": tier,
            "status": "selected",
            "n_rows": int(out.count()) if record_count else -1,
            "checksum": None,
            "elapsed_sec": None,
            "run_id": run_id or new_run_id(),
            "query_text": f"SELECT * FROM input WHERE {predicate}",
        }])
    return out


def keep_daterange(df: DataFrame, ts_col: str, start: str, end: str) -> DataFrame:
    """Inclusive-both time-range filter (times.py:1884)."""
    return df.filter(F.col(ts_col).between(F.lit(start).cast("timestamp"),
                                           F.lit(end).cast("timestamp")))


def keep_years(df: DataFrame, ts_col: str, years: list[int]) -> DataFrame:
    return df.filter(F.year(ts_col).isin(years))


def remove_after_date(df: DataFrame, ts_col: str, month: int, day: int) -> DataFrame:
    """Drop records after MM-DD within each year (times.py:1837)."""
    cutoff = F.make_date(F.year(ts_col), F.lit(month), F.lit(day))
    return df.filter(F.to_date(ts_col) <= cutoff)


def trim_frame(df: DataFrame, ts_col: str, var_col: str) -> DataFrame:
    """Drop the leading/trailing all-null region w.r.t. one variable
    (frames.py:207): keep rows between the first and last non-null."""
    span = df.filter(F.col(var_col).isNotNull()).agg(
        F.min(ts_col).alias("lo"), F.max(ts_col).alias("hi")
    )
    return df.join(F.broadcast(span)).filter(
        F.col(ts_col).between(F.col("lo"), F.col("hi"))
    ).drop("lo", "hi")


def aggregated_as_hires(
    df: DataFrame, ts_col: str, value_col: str,
    to_freq: str = "day", agg: str = "mean",
    out_col: str | None = None,
) -> DataFrame:
    """Compute a low-res aggregate (day/month/year) and broadcast it back
    onto every high-res row (frames.py:255-314 merge-on-date-key)."""
    out_col = out_col or f"{value_col}_{agg}_{to_freq}"
    aggfn = {"mean": F.avg, "sum": F.sum, "min": F.min, "max": F.max,
             "median": lambda c: F.percentile(c, F.lit(0.5))}[agg]
    key = F.date_trunc(to_freq, F.col(ts_col)).alias("_k")
    low = df.groupBy(key).agg(aggfn(F.col(value_col)).alias(out_col))
    return (
        df.withColumn("_k", F.date_trunc(to_freq, F.col(ts_col)))
        .join(F.broadcast(low), "_k", "left")
        .drop("_k")
    )


def neighboring_years_pool(df: DataFrame, ts_col: str, target_year: int, n_neighbors: int = 1) -> DataFrame:
    """Model pool = target year ± nearest neighbours (times/neighbors.py:8)."""
    years = [target_year + d for d in range(-n_neighbors, n_neighbors + 1)]
    return keep_years(df, ts_col, years)


def add_continuous_record_number(
    df: DataFrame, ts_col: str, out_col: str = "RECORD_NUMBER",
    key_cols: list[str] | None = None,
) -> DataFrame:
    """1-based record number in time order (frames.py:543). Global numbering
    (no key_cols) is a single-partition sort — the reference semantics for
    one file; pass ``key_cols`` to number per series distributed."""
    w = (Window.partitionBy(*key_cols) if key_cols else Window).orderBy(ts_col)
    return df.withColumn(out_col, F.row_number().over(w))


def yearmonth_matrix_to_longform(
    df: DataFrame, year_col: str = "year", month_cols: list[str] | None = None,
) -> DataFrame:
    """Wide year x month matrix -> long (year, month, value)
    (transform_yearmonth_matrix_to_longform, frames.py:584): stack()."""
    month_cols = month_cols or [c for c in df.columns if c != year_col]
    pairs = ", ".join(f"'{c}', `{c}`" for c in month_cols)
    return df.selectExpr(
        year_col, f"stack({len(month_cols)}, {pairs}) AS (month, value)"
    )


def detect_new_columns(df: DataFrame, other: DataFrame) -> list[str]:
    """Schema diff (frames.py:240)."""
    return [c for c in df.columns if c not in set(other.columns)]


def combine_variables(
    df: DataFrame, col1: str, col2: str, method: str = "multiply",
    keep_overlap_only: bool = True, out_col: str | None = None,
) -> DataFrame:
    """Element-wise combination of two variables (reference
    variables/utilities.py:24-82 ``combine_variables``): add / subtract /
    multiply / divide, plus ``'fillgaps'`` (keep ``col1``, fill its nulls
    from ``col2`` — ``combine_first``). With ``keep_overlap_only=False``
    a one-sided record survives via the operation's identity (0 for
    add/subtract, 1 for multiply/divide)."""
    a, b = F.col(col1), F.col(col2)
    out_col = out_col or f"{col1}_{method.upper()}_{col2}"
    if method == "fillgaps":
        expr = F.coalesce(a, b)
    else:
        ops = {"add": (lambda x, y: x + y, 0.0),
               "subtract": (lambda x, y: x - y, 0.0),
               "multiply": (lambda x, y: x * y, 1.0),
               "divide": (lambda x, y: x / y, 1.0)}
        if method not in ops:
            raise ValueError(f"Unknown method {method!r}. Choose from "
                             f"{sorted(list(ops) + ['fillgaps'])}.")
        op, identity = ops[method]
        if keep_overlap_only:
            expr = op(a, b)  # null where either side is null
        else:
            expr = F.when(a.isNull() & b.isNull(), F.lit(None)).otherwise(
                op(F.coalesce(a, F.lit(identity)),
                   F.coalesce(b, F.lit(identity))))
    return df.withColumn(out_col, expr)
