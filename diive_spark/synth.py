"""Deterministic seeded synthetic fixtures (FIXTURES.md F1/F2).

F1: the engine's authoritative input shape (BASELINE.json input_hint) —
``(doc_id:string, tokens:array<int32>, n_tok:int32, source:string)`` — a
pre-tokenized training-sequence table, generated *distributed* via
``mapInPandas`` over ``spark.range`` so the same recipe scales from 10^4
test rows to 10^12 cluster rows without a driver bottleneck.

F2: a diive-format wide 30-min time series mirroring the reference's
bundled CH-DAV fixture (``/root/reference/diive/configs/exampledata/__init__.py:14-32``:
30-min grid, float64 columns). Small by design; built in pandas.

Determinism: every per-row quantity is a pure function of ``doc_id`` via
crc32 (stable across processes, unlike Python ``hash``), so reference
(pandas) and engine (Spark) fixtures agree bit-for-bit at any parallelism.
"""

from __future__ import annotations

import zlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

VOCAB_SIZE = 50257
N_TOK_MIN, N_TOK_SPAN = 16, 2033
# Zipf-skewed source mix (FIXTURES.md F1) — 'web' dominates on purpose so the
# engine's salting/skew handling is exercised, not just declared.
SOURCE_THRESHOLDS = [(55, "web"), (75, "books"), (90, "code"), (97, "wiki"), (100, "chat")]
EVENT_EPOCH = pd.Timestamp("2024-01-01 00:00:00")
DEFAULT_HORIZON_SECONDS = 30 * 86400  # 30 days at test scale

TOKEN_TABLE_DDL = "doc_id string, tokens array<int>, n_tok int, source string"


def _crc(doc_id: str) -> int:
    return zlib.crc32(doc_id.encode("utf-8"))


def _source_for(h: int) -> str:
    m = h % 100
    for thresh, name in SOURCE_THRESHOLDS:
        if m < thresh:
            return name
    return SOURCE_THRESHOLDS[-1][1]


def _gen_batch(ids: np.ndarray, with_tokens: bool) -> pd.DataFrame:
    doc_ids = [f"doc-{i:012d}" for i in ids]
    crcs = np.array([_crc(d) for d in doc_ids], dtype=np.uint64)
    n_tok = (N_TOK_MIN + (crcs % N_TOK_SPAN)).astype(np.int32)
    sources = [_source_for(int(c)) for c in crcs]
    if with_tokens:
        tokens = [
            np.random.default_rng(int(c) ^ 42).integers(0, VOCAB_SIZE, size=int(n), dtype=np.int32)
            for c, n in zip(crcs, n_tok)
        ]
    else:
        tokens = [np.empty(0, dtype=np.int32)] * len(doc_ids)
    return pd.DataFrame(
        {"doc_id": doc_ids, "tokens": tokens, "n_tok": n_tok, "source": sources}
    )


def token_table(
    spark: SparkSession,
    n_rows: int,
    with_tokens: bool = True,
    num_partitions: int | None = None,
) -> DataFrame:
    """Distributed deterministic F1 token table.

    ``with_tokens=False`` keeps the (empty) tokens column but skips RNG work —
    used by throughput benches where only ``n_tok`` matters.
    """
    parts = num_partitions or max(8, spark.sparkContext.defaultParallelism)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            yield _gen_batch(b["id"].to_numpy(), with_tokens)

    return (
        spark.range(0, n_rows, numPartitions=parts)
        .mapInPandas(gen, schema=TOKEN_TABLE_DDL)
    )


def with_event_time(df: DataFrame, horizon_seconds: int = DEFAULT_HORIZON_SECONDS) -> DataFrame:
    """Derive the engine's event-time: a deterministic pure function of doc_id.

    ``event_time = '2024-01-01' + (xxhash64(doc_id) mod horizon) seconds``
    (FIXTURES.md F1). xxhash64 is a built-in JVM expression — no Python.
    """
    return df.withColumn(
        "event_time",
        F.timestamp_seconds(
            F.lit(int(EVENT_EPOCH.timestamp()))
            + F.pmod(F.xxhash64("doc_id"), F.lit(horizon_seconds))
        ),
    )


# Seeded gap windows (FIXTURES.md F1 "gap injection"): drop rows whose
# event_time falls inside these → known missing windows at every tier.
GAP_WINDOWS = [
    ("2024-01-01 01:40:00", "2024-01-01 01:43:00"),   # minutes 100-102
    ("2024-01-04 07:00:00", "2024-01-04 08:00:00"),   # hour 7 of day 3 (0-based)
    ("2024-01-13 00:00:00", "2024-01-14 00:00:00"),   # all of day 12 (0-based)
]


def inject_gaps(df: DataFrame, ts_col: str = "event_time") -> DataFrame:
    cond = F.lit(False)
    for start, end in GAP_WINDOWS:
        cond = cond | (
            (F.col(ts_col) >= F.lit(start).cast("timestamp"))
            & (F.col(ts_col) < F.lit(end).cast("timestamp"))
        )
    return df.filter(~cond)


# ---------------------------------------------------------------------------
# F2 — diive-format wide 30-min time series (reference-parity substrate)
# ---------------------------------------------------------------------------

def wide_timeseries_pdf(
    periods: int = 1488,
    start: str = "2022-07-01 00:15",
    freq: str = "30min",
    seed: int = 42,
) -> pd.DataFrame:
    """Pandas fixture mirroring the bundled CH-DAV month: TIMESTAMP_MIDDLE index,
    TA / SW_IN / VPD / FLUX float64 columns with seeded noise and seeded NaN
    gap runs in FLUX (isolated, 3, 10, 200 records) — FIXTURES.md F2."""
    rng = np.random.default_rng(seed)
    idx = pd.date_range(start, periods=periods, freq=freq, name="TIMESTAMP_MIDDLE")
    hour = idx.hour + idx.minute / 60.0
    doy = idx.dayofyear.to_numpy().astype(float)

    ta = 15.0 + 8.0 * np.sin(2 * np.pi * (hour - 9.0) / 24.0) + 0.02 * doy + rng.normal(0, 0.3, periods)
    solar = np.sin(2 * np.pi * (hour - 6.0) / 24.0)
    sw_in = np.maximum(0.0, 800.0 * solar) + rng.normal(0, 5.0, periods).clip(0)
    vpd = np.maximum(0.0, 0.12 * (ta - 5.0) + rng.normal(0, 0.05, periods))
    flux = -3.0 * sw_in / 800.0 + 0.1 * ta + rng.normal(0, 0.3, periods)

    df = pd.DataFrame({"TA": ta, "SW_IN": sw_in, "VPD": vpd, "FLUX": flux}, index=idx)

    # Seeded NaN gap runs in FLUX: isolated singles, one 3-run, one 10-run, one 200-run.
    gaps: list[int] = [11, 77, 205, 911]
    gaps += list(range(300, 303))
    gaps += list(range(500, 510))
    gaps += list(range(900, 1100))
    gaps = [g for g in gaps if g < periods]
    df.iloc[gaps, df.columns.get_loc("FLUX")] = np.nan
    return df


def wide_timeseries(spark: SparkSession, **kwargs) -> DataFrame:
    pdf = wide_timeseries_pdf(**kwargs).reset_index()
    return spark.createDataFrame(pdf)


def add_impulse_noise(
    pdf_or_series: pd.Series,
    factor_low: float = -15.0,
    factor_high: float = 14.0,
    contamination: float = 0.03,
    seed: int = 42,
) -> pd.Series:
    """Seeded impulse spikes for outlier-test fixtures — same recipe shape as
    the reference's noise generator (``diive/variables/utilities.py:186``):
    a seeded fraction of records is multiplied into spikes scaled between
    factor_low and factor_high."""
    s = pdf_or_series.copy()
    rng = np.random.default_rng(seed)
    n = len(s)
    n_spikes = int(n * contamination)
    pos = rng.choice(n, size=n_spikes, replace=False)
    factors = rng.uniform(factor_low, factor_high, size=n_spikes)
    base = np.nanstd(s.to_numpy())
    vals = s.to_numpy(copy=True)
    vals[pos] = vals[pos] + factors * base
    return pd.Series(vals, index=s.index, name=s.name)
