"""Parquet I/O helpers (diive load/save_parquet, files.py:67-173).

Thin wrappers: the value-add over bare spark.read is the diive-format
contract (validated timestamp column + optional convention shift) and
multi-path reads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from diive_spark.sources.sanitizer import validate_timestamp_column_name


def load_parquet(
    spark: SparkSession, *paths: str,
    ts_col: str | None = None,
) -> DataFrame:
    """load_parquet / load_parquet_many (files.py:116/173): multi-path read;
    if ``ts_col`` is given its convention name is validated."""
    df = spark.read.parquet(*paths)
    if ts_col is not None:
        validate_timestamp_column_name(ts_col)
        if ts_col not in df.columns:
            raise ValueError(f"{ts_col} not in {df.columns}")
    return df


def save_parquet(
    df: DataFrame, path: str, mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """save_parquet (files.py:67)."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)
