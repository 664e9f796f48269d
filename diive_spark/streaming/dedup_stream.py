"""Streaming exact dedup — the ingest-time guard for the raw token table.

The reference dedups at read time (keep-last on duplicate timestamps,
/root/reference/diive/core/times/times.py:1409); a streaming ingest needs the
same guarantee BEFORE rows land in tier-0 storage. Structured Streaming's
``dropDuplicatesWithinWatermark`` keeps per-key state only for the watermark
horizon, so state is bounded at any input rate — the 100-TB-safe form of
streaming dedup (an unbounded ``dropDuplicates`` would grow state forever).

Semantics: the FIRST arrival of a key within the watermark horizon wins
(duplicates arriving later than the horizon are not caught — replay the
batch exact_dedup for full-history guarantees; same division of labour as
rollup_stream vs batch rollup).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def streaming_dedup(
    spark: SparkSession,
    source_dir: str,
    schema: str,
    ts_col: str,
    key_cols: list[str],
    watermark: str = "1 hour",
) -> DataFrame:
    """File-source streaming dedup on ``key_cols`` with bounded state.

    Returns a streaming DataFrame; pair with ``foreachBatch`` (or any sink)
    and a checkpoint dir for exactly-once file output."""
    stream = (
        spark.readStream.schema(schema).parquet(source_dir)
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(key_cols)
    )
    return stream


def streaming_simhash_dedup(
    spark: SparkSession,
    source_dir: str,
    schema: str,
    ts_col: str,
    text_col: str = "text",
    n: int = 3,
    bits: int = 32,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming NEAR-dup ingest guard: per-document SimHash computed as a
    single stateless column expression (dedup.simhash_expr — no shuffle,
    no streaming aggregation), then first-arrival-wins dedup on the
    signature with watermark-bounded state. Catches exact duplicates and
    the near-identical rewrites whose small edits flip no signature bit —
    the cheap in-stream tier of the dedup stack; the banded-hamming /
    MinHash-LSH batch passes remain the full near-dup sweep.

    Returns a streaming DataFrame with a ``simhash`` column appended."""
    from diive_spark.operators.dedup import simhash_expr

    return (
        spark.readStream.schema(schema).parquet(source_dir)
        .withColumn("simhash", simhash_expr(F.col(text_col), n=n, bits=bits))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["simhash"])
    )
