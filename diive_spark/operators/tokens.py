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


def token_ngram_overlap(
    train: DataFrame,
    eval_df: DataFrame | None = None,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    n: int = 8,
    stride: int = 1,
) -> DataFrame:
    """Train/eval contamination check over PRE-TOKENIZED sequences (the
    standard decontamination step of large-model data pipelines: flag eval
    documents sharing long token n-grams with training documents — public
    recipe, cf. the n-gram overlap decontamination described in the GPT-3
    and PaLM papers).

    Each side is exploded into 64-bit hashes of its token n-gram windows
    (``xxhash64`` over the ``slice`` — the window array itself never
    shuffles, only the 8-byte hash), distinct per document, then matched
    with a hash-bucket join. Returns (train_id, eval_id, n_shared) with
    n_shared = count of DISTINCT shared n-gram hashes.

    Scale posture: the explode carries |tokens|/stride hashes per doc
    (8 bytes each). ``stride > 1`` samples window starts on one side —
    any shared span of length >= n + stride - 1 is still guaranteed to be
    hit (the classic sampling bound), cutting shuffle volume by the
    stride factor at 100 TB. Collisions (2^-64 per pair) are accepted and
    documented rather than re-verified.

    ``eval_df=None`` runs the self-overlap mode (pairs within ``train``,
    id1 < id2) — the long-shared-span near-dup sweep."""
    def grams(df, side, use_stride):
        t = F.col(tokens_col)
        step = stride if use_stride else 1
        starts = F.sequence(
            F.lit(1), F.greatest(F.size(t) - (n - 1), F.lit(0)), F.lit(step))
        return (
            df.select(
                F.col(id_col).alias(side),
                F.explode(
                    F.when(F.size(t) >= n,
                           F.transform(starts, lambda i: F.xxhash64(F.slice(t, i, n))))
                    .otherwise(F.array().cast("array<bigint>"))
                ).alias("gh"),
            )
            .distinct()
        )

    if eval_df is None:
        g = grams(train, "id", use_stride=False)
        a = g.select(F.col("id").alias("train_id"), "gh")
        b = g.select(F.col("id").alias("eval_id"), "gh")
        joined = a.join(b, "gh").filter(F.col("train_id") < F.col("eval_id"))
    else:
        # stride-sample the (big) training side; enumerate eval fully so
        # the detection bound holds
        a = grams(train, "train_id", use_stride=True)
        b = grams(eval_df, "eval_id", use_stride=False)
        joined = a.join(b, "gh")
    return (
        joined.groupBy("train_id", "eval_id")
        .agg(F.count("*").alias("n_shared"))
    )


def pack_sequences(
    df: DataFrame,
    seq_len: int,
    eos_id: int,
    pad_id: int = 0,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    parts: int | None = None,
) -> DataFrame:
    """Concat-and-chunk sequence packing (the GPT-style pretraining data
    prep): within each partition, documents are concatenated in ``id_col``
    order with ``eos_id`` appended after each, and the stream is cut into
    fixed ``seq_len`` examples; the per-partition tail is padded with
    ``pad_id`` and its real length recorded.

    Determinism: range-partition + sort on ``id_col`` makes the packing a
    pure function of (input set, seq_len, parts) — rerun-stable, so a
    resumed job reproduces identical examples. Token conservation (tested):
    sum(n_real) over examples == sum(n_tok) + n_docs (one EOS per doc).

    Scale posture: one range exchange, then a single mapInPandas pass with
    O(seq_len) carry state per partition — no driver state, no second
    shuffle. Output: (part_id, seq_idx, tokens array<int> of exactly
    seq_len, n_real, n_docs) where n_docs counts documents first entering
    the stream since the previous emitted example (so sum(n_docs) over all
    examples == the document count — tested)."""
    src = df.select(id_col, tokens_col)
    if parts is not None:
        src = src.repartitionByRange(parts, id_col)
    src = src.sortWithinPartitions(id_col)

    def pack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        buf: list[int] = []
        starts = 0
        seq_idx = 0
        rows: list[dict] = []

        def flush_full():
            nonlocal buf, starts, seq_idx
            while len(buf) >= seq_len:
                rows.append({
                    "part_id": pid, "seq_idx": seq_idx,
                    "tokens": np.asarray(buf[:seq_len], dtype=np.int32),
                    "n_real": seq_len, "n_docs": starts,
                })
                buf = buf[seq_len:]
                starts = 0
                seq_idx += 1

        for pdf in batches:
            for toks in pdf[tokens_col]:
                starts += 1
                buf.extend(int(x) for x in toks)
                buf.append(eos_id)
                flush_full()
            if rows:
                yield pd.DataFrame(rows)
                rows = []
        if buf:
            n_real = len(buf)
            rows.append({
                "part_id": pid, "seq_idx": seq_idx,
                "tokens": np.asarray(
                    buf + [pad_id] * (seq_len - n_real), dtype=np.int32),
                "n_real": n_real, "n_docs": starts,
            })
        if rows:
            yield pd.DataFrame(rows)

    return src.mapInPandas(
        pack,
        schema="part_id int, seq_idx long, tokens array<int>, "
               "n_real int, n_docs int",
    )


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
