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
