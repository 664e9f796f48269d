"""Custom stateful streaming operator: per-key online gap monitor.

The batch engine detects gaps by grid anti-join (operators/grid.py). For
live ingest, this is the streaming counterpart: an
``applyInPandasWithState`` operator keeping per-key state
(last_seen event time, running count) and emitting a GAP_ALERT row whenever
a key's new batch arrives more than ``gap_seconds`` after its last seen
event — the streaming analogue of GapFinder's run detection, expressed as
Spark's arbitrary-stateful-processing API (state survives micro-batches via
the checkpoint).

Kernel contract: Arrow-batched pandas in/out, one state object per key —
no per-row Python beyond the tiny per-batch numpy reduction.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "series_key string, batch_events bigint, total_events bigint, "
    "first_seen timestamp, last_seen timestamp, gap_seconds double, is_gap_alert boolean"
)
STATE_SCHEMA = "total bigint, first_seen timestamp, last_seen timestamp"


def _monitor(gap_seconds: float):
    def fn(
        key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        total, first_seen, last_seen = (
            state.get if state.exists else (0, None, None)
        )
        batch_min, batch_max, n = None, None, 0
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            n += len(pdf)
            lo, hi = pdf["event_time"].min(), pdf["event_time"].max()
            batch_min = lo if batch_min is None else min(batch_min, lo)
            batch_max = hi if batch_max is None else max(batch_max, hi)
        gap = (
            (batch_min - last_seen).total_seconds()
            if (last_seen is not None and batch_min is not None)
            else 0.0
        )
        total += n
        first_seen = first_seen or batch_min
        new_last = batch_max if batch_max is not None else last_seen
        state.update((int(total), first_seen, new_last))
        yield pd.DataFrame({
            "series_key": [key[0]],
            "batch_events": [n],
            "total_events": [int(total)],
            "first_seen": [first_seen],
            "last_seen": [new_last],
            "gap_seconds": [float(gap)],
            "is_gap_alert": [gap > gap_seconds],
        })

    return fn


def gap_monitor_stream(
    stream: DataFrame,
    key_col: str = "source",
    gap_seconds: float = 3600.0,
) -> DataFrame:
    """Attach the stateful gap monitor to a streaming DataFrame with
    (key_col, event_time) columns. Use outputMode('update')."""
    return (
        stream.selectExpr(f"{key_col} as series_key", "event_time")
        .groupBy("series_key")
        .applyInPandasWithState(
            _monitor(gap_seconds),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
