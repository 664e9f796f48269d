"""Per-partition lineage + checkpointed resume (SURVEY.md §4.3.6).

The reference's only checkpointing is pickle save/load
(/root/reference/diive/core/io/files.py:211-223). The engine replaces that
with a lineage *table*: one row per (partition_id, tier) recording status,
row count, value checksum and wall-clock — so a killed job replays only
unfinished partitions (north rule). Storage is an append-only parquet dir
(stand-in for an Iceberg table + snapshot commit in production); partition
outputs are written BEFORE their lineage row, and output writes are
idempotent (dynamic partition overwrite), so a crash between the two leaves
a replayable, never-corrupt state.
"""

from __future__ import annotations

import os
import time
import uuid

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LINEAGE_SCHEMA = (
    "partition_id string, tier string, status string, n_rows bigint, "
    "checksum bigint, elapsed_sec double, run_id string, committed_at double, "
    "query_text string"
)
_LINEAGE_COLS = [f.split(" ")[0] for f in LINEAGE_SCHEMA.split(", ")]


class LineageStore:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def read(self) -> DataFrame:
        if not os.path.exists(self.path):
            return self.spark.createDataFrame([], LINEAGE_SCHEMA)
        return self.spark.read.schema(LINEAGE_SCHEMA).parquet(self.path)

    def done_partitions(self, tier: str) -> set[str]:
        rows = (
            self.read()
            .filter((F.col("tier") == tier) & (F.col("status") == "done"))
            .select("partition_id")
            .collect()
        )
        return {r["partition_id"] for r in rows}

    def commit(self, records: list[dict]) -> None:
        """Append lineage rows (one parquet file per commit — the atomic unit)."""
        if not records:
            return
        pdf = pd.DataFrame.from_records(records)
        pdf["committed_at"] = time.time()
        for c in _LINEAGE_COLS:  # optional fields (e.g. query_text) -> null
            if c not in pdf.columns:
                pdf[c] = None
        pdf = pdf[_LINEAGE_COLS]  # createDataFrame(schema=...) maps by POSITION
        (
            self.spark.createDataFrame(pdf, schema=LINEAGE_SCHEMA)
            .coalesce(1)
            .write.mode("append")
            .parquet(self.path)
        )

    def pending(self, all_partitions: list[str], tier: str) -> list[str]:
        """Anti-join: partitions with no 'done' lineage row for this tier."""
        done = self.done_partitions(tier)
        return [p for p in all_partitions if p not in done]


def checksum_expr(cols: list[str]):
    """Order-insensitive value checksum: XOR-fold of xxhash64 over the row's
    stat columns — cheap, associative, overflow-free under ANSI mode."""
    return F.bit_xor(F.xxhash64(*[F.col(c).cast("string") for c in cols])).alias("checksum")


def new_run_id() -> str:
    return uuid.uuid4().hex[:12]
