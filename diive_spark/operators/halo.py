"""Slab-with-halo grouped-map execution — the engine's scale pattern for
centered-window kernels.

Problem: centered rolling kernels (Hampel median/MAD, rolling-median fill)
need ±w/2 neighbours. A plain ``groupBy(series_key).applyInPandas`` puts an
entire series in one task — fine for one year of 1m rollups (~5e5 rows), a
straggler at 10-year horizons. Solution (SURVEY.md §4.3.4): split each series
into fixed time slabs, *duplicate* rows within ``halo`` slots of each slab
boundary into the neighbouring slab, run the kernel per (key, slab), then
drop halo rows. Windows bounded by ``halo`` never cross two slabs, so the
result is exactly equal to the global kernel (tested in tests/test_halo.py).

All kernels receive/return pandas DataFrames via Arrow (vectorized; no
per-row Python).
"""

from __future__ import annotations

from typing import Callable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def explode_halo_slabs(
    df: DataFrame, ts_col: str, slab_seconds: int, halo_seconds: int,
) -> DataFrame:
    """Single-scan halo duplication: each row explodes into its own slab
    plus (when near a boundary) a halo copy in the neighbouring slab —
    appends ``_slab`` / ``_halo`` columns. One pass over the input (no
    unions, so an expensive upstream plan is never recomputed; scan volume
    1x + halo fraction).

    Callers either hand the groups to a pandas kernel (apply_with_halo) or
    run plain JVM WINDOW expressions partitioned by (keys..., _slab) — the
    slab turns a per-key single-task window into per-(key, slab)
    parallelism; exactness holds for any window whose reach is bounded by
    ``halo_seconds``. Drop ``_halo == 1`` rows (and both columns) after."""
    if halo_seconds >= slab_seconds:
        raise ValueError("halo must be smaller than slab")
    epoch = F.unix_timestamp(F.col(ts_col))
    slab_id = F.floor(epoch / F.lit(slab_seconds))
    # pmod, not %: Spark's % follows the dividend's sign, which would send
    # pre-1970 rows' halo copies to the wrong neighbour slab
    pos_in_slab = F.pmod(epoch, F.lit(slab_seconds))
    targets = F.array_compact(
        F.array(
            F.struct(slab_id.alias("s"), F.lit(0).cast("tinyint").alias("h")),
            # rows near the END of a slab are needed by the NEXT slab's head
            F.when(
                pos_in_slab >= F.lit(slab_seconds - halo_seconds),
                F.struct((slab_id + 1).alias("s"), F.lit(1).cast("tinyint").alias("h")),
            ),
            # rows near the START of a slab are needed by the PREVIOUS slab
            F.when(
                pos_in_slab < F.lit(halo_seconds),
                F.struct((slab_id - 1).alias("s"), F.lit(1).cast("tinyint").alias("h")),
            ),
        )
    )
    return (
        df.withColumn("_t", F.explode(targets))
        .withColumn("_slab", F.col("_t.s"))
        .withColumn("_halo", F.col("_t.h"))
        .drop("_t")
    )


def apply_with_halo(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    kernel: Callable[[pd.DataFrame], pd.DataFrame],
    output_schema: str,
    slab_seconds: int,
    halo_seconds: int,
) -> DataFrame:
    """Run ``kernel`` per (key, slab) with halo duplication.

    The kernel sees rows sorted by ``ts_col`` (halo rows included, marked by
    the ``_halo`` column) and must return one output row per input row,
    keeping the ``_halo`` column; halo outputs are dropped before returning
    to Spark, so ``output_schema`` lists only the real output columns.
    ``halo_seconds`` must be >= max centered-window half-width in seconds
    (half_window_rows * tier_seconds).
    """
    expanded = explode_halo_slabs(df, ts_col, slab_seconds, halo_seconds)
    # Pin the grouped-map exchange to cluster parallelism: the kernel is
    # Python-CPU-bound per ROW, but AQE's size-based coalescing sees only
    # its (tiny) shuffle BYTES and folds a small tier onto ONE partition,
    # serialising every slab through a single Python worker (r8
    # measurement: the whole sf1 gapfill cascade ran as a 1-task stage).
    # An explicit numbered repartition is exempt from AQE coalescing and
    # satisfies the groupBy's clustering, so no second exchange is added;
    # at scale the slab count dwarfs any core count and tasks stay full.
    sc = df.sparkSession.sparkContext
    expanded = expanded.repartition(
        max(sc.defaultParallelism, 1), *key_cols, "_slab")

    out_cols = [c.strip().split()[0] for c in output_schema.split(",")]

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col).reset_index(drop=True)
        out = kernel(pdf)
        return out.loc[out["_halo"] == 0, out_cols]

    return expanded.groupBy(*key_cols, "_slab").applyInPandas(
        lambda _, pdf: run(pdf), schema=output_schema
    )
