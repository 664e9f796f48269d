"""Token-sequence operators: per-sequence stats + the packed-binary
physical encoding.

Two equivalent per-sequence stat paths (tested equal):

- :func:`token_stats` — JVM array expressions over ``array<int>`` (no
  Python). Simple, but every row materializes a Java array object: at 100 TB
  the scan is allocation/GC-bound.
- :func:`token_stats_binary` — tokens stored as packed little-endian int32
  ``binary`` (:func:`pack_tokens_to_binary`); stats via an Arrow mapInPandas
  kernel using ``np.frombuffer`` + ``reduceat`` (zero per-row allocation).
  Measured ~1.5-2x faster end-to-end on the 1.2M-row bench
  (BENCH/BASELINE.md notes) — the recommended encoding for the raw table.

The per-row invariant (BASELINE.json): tokens round-trip bit-exactly through
pack/unpack (tested).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def token_stats(df: DataFrame, tokens_col: str = "tokens") -> DataFrame:
    """Per-sequence min/max/sum over the token array (JVM expressions)."""
    t = F.col(tokens_col)
    return (
        df.withColumn("tok_min", F.array_min(t))
        .withColumn("tok_max", F.array_max(t))
        .withColumn(
            "tok_sum",
            F.aggregate(t, F.lit(0).cast("bigint"), lambda a, x: a + x.cast("bigint")),
        )
    )


_PACK_DTYPES = {"int32": np.int32, "uint16": np.uint16}


def pack_tokens_to_binary(df: DataFrame, tokens_col: str = "tokens",
                          out_col: str = "tokens_bin",
                          dtype: str = "int32") -> DataFrame:
    """array<int> -> packed little-endian binary (Arrow kernel).

    ``dtype='uint16'`` HALVES the bytes on disk and over the bus when the
    vocabulary fits 16 bits (ids in [0, 65536) — true for GPT-2/BPE-class
    vocabularies, validated per batch) with zero extra decode cost
    (frombuffer just reads a different width). At 100 TB the raw-table scan
    is bandwidth-bound, so this is a direct ~2x on the ingest path; int32
    stays the default for arbitrary vocabularies."""
    other = [c for c in df.columns if c != tokens_col]
    np_dtype = _PACK_DTYPES[dtype]

    def pack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[other].copy()
            arrs = [np.asarray(t) for t in pdf[tokens_col]]
            if np_dtype is np.uint16 and arrs:
                # batch-granularity validation: one flatten + one min/max
                # (not per-row reductions), BEFORE the narrowing cast
                flat = np.concatenate(arrs) if len(arrs) > 1 else arrs[0]
                if len(flat) and (int(flat.min()) < 0
                                  or int(flat.max()) >= 1 << 16):
                    raise ValueError("token id outside uint16 range; "
                                     "use dtype='int32'")
            out[out_col] = [a.astype(np_dtype, copy=False).tobytes()
                            for a in arrs]
            yield out

    schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
         if f.name != tokens_col] + [f"{out_col} binary"]
    )
    return df.mapInPandas(pack, schema=schema)


def unpack_tokens_from_binary(df: DataFrame, bin_col: str = "tokens_bin",
                              out_col: str = "tokens",
                              dtype: str = "int32") -> DataFrame:
    """Inverse of pack_tokens_to_binary (bit-exact round trip, tested)."""
    other = [c for c in df.columns if c != bin_col]
    np_dtype = _PACK_DTYPES[dtype]

    def unpack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[other].copy()
            out[out_col] = [
                np.frombuffer(bytes(b), dtype=np_dtype).astype(np.int32)
                for b in pdf[bin_col]
            ]
            yield out

    schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
         if f.name != bin_col] + [f"{out_col} array<int>"]
    )
    return df.mapInPandas(unpack, schema=schema)


def token_stats_binary(df: DataFrame, bin_col: str = "tokens_bin",
                       keep_cols: list[str] | None = None,
                       dtype: str = "int32") -> DataFrame:
    """Per-sequence min/max/sum over packed-binary tokens: numpy
    frombuffer + reduceat over the whole Arrow batch — no per-row loops, no
    JVM array objects. ``dtype`` must match the packing (uint16 halves the
    bytes scanned for 16-bit vocabularies)."""
    keep = keep_cols or [c for c in df.columns if c != bin_col]
    np_dtype = _PACK_DTYPES[dtype]
    width = np.dtype(np_dtype).itemsize

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            bufs = pdf[bin_col]
            counts = np.fromiter((len(b) // width for b in bufs),
                                 dtype=np.int64, count=len(bufs))
            flat = (np.frombuffer(b"".join(bufs), dtype=np_dtype)
                    if len(bufs) else np.empty(0, np_dtype))
            out = pdf[keep].copy()
            if len(flat):
                offs = np.r_[0, counts.cumsum()[:-1]]
                # reduceat misbehaves on zero-length segments; token arrays
                # are never empty by schema (n_tok >= 16), guard anyway
                assert (counts > 0).all(), "empty token sequence"
                out["tok_min"] = np.minimum.reduceat(flat, offs).astype(np.int32)
                out["tok_max"] = np.maximum.reduceat(flat, offs).astype(np.int32)
                out["tok_sum"] = np.add.reduceat(flat.astype(np.int64), offs)
            else:
                out["tok_min"] = np.empty(0, np.int32)
                out["tok_max"] = np.empty(0, np.int32)
                out["tok_sum"] = np.empty(0, np.int64)
            yield out

    schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
         if f.name in keep]
        + ["tok_min int", "tok_max int", "tok_sum bigint"]
    )
    return df.mapInPandas(stats, schema=schema)
