#!/usr/bin/env python
"""Measure resume overhead (BASELINE.md planned metric): wall-clock of
kill-at-~50% + replay vs a clean single run, on the same input.

Writes BENCH/RESUME.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from diive_spark import synth  # noqa: E402
from diive_spark.plans import pipeline  # noqa: E402
from diive_spark.session import get_spark  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    rows = int(os.environ.get("RESUME_BENCH_ROWS", "60000"))
    spark = get_spark("resume_bench", master="local[16]", shuffle_partitions="32")
    spark.sparkContext.setLogLevel("ERROR")
    raw = synth.inject_gaps(
        synth.with_event_time(synth.token_table(spark, rows, with_tokens=False))
    ).select("n_tok", "source", "event_time").cache()
    raw.count()

    # warm-up: JIT + codegen caches, so the clean run isn't penalized for
    # going first
    warm_dir = tempfile.mkdtemp(prefix="resume_warm_")
    pipeline.run_pipeline(spark, raw.limit(5000), warm_dir, batch_size=30)

    clean_dir = tempfile.mkdtemp(prefix="resume_clean_")
    t0 = time.time()
    m = pipeline.run_pipeline(spark, raw, clean_dir, batch_size=4)
    t_clean = time.time() - t0
    n_parts = m["n_partitions_total"]

    resume_dir = tempfile.mkdtemp(prefix="resume_killed_")
    kill_after = max(1, (n_parts // 4) // 2)  # ~50% of batches
    t0 = time.time()
    try:
        pipeline.run_pipeline(spark, raw, resume_dir, batch_size=4,
                              fail_after_batches=kill_after)
    except pipeline.KilledForTest:
        pass
    t_partial = time.time() - t0
    t0 = time.time()
    m2 = pipeline.run_pipeline(spark, raw, resume_dir, batch_size=4)
    t_resume = time.time() - t0

    overhead = (t_partial + t_resume) / t_clean - 1.0
    result = {
        "rows": rows,
        "n_partitions": n_parts,
        "clean_sec": round(t_clean, 2),
        "killed_partial_sec": round(t_partial, 2),
        "resume_sec": round(t_resume, 2),
        "partitions_replayed": m2["n_partitions_pending"],
        "resume_overhead_frac": round(overhead, 3),
    }
    print(json.dumps(result))
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "RESUME.md"), "w") as f:
        f.write(f"""# BENCH/RESUME — checkpointed-resume overhead

Protocol: same input ({rows:,} rows, {n_parts} event-date partitions,
batch_size=4). A clean run is timed; then a run killed after
{kill_after} batches (~50%) plus its replay. Replay recomputes ONLY the
partitions without 'done' lineage rows (verified byte-identical outputs in
tests/test_pipeline.py).

| measurement | value |
|---|---|
| clean run | {result['clean_sec']} s |
| killed partial run | {result['killed_partial_sec']} s |
| resume run | {result['resume_sec']} s |
| partitions replayed | {result['partitions_replayed']} / {n_parts} |
| overhead vs clean | {result['resume_overhead_frac']:+.1%} |

Overhead source: one extra lineage anti-join + re-listing; per-partition
work is never repeated for finished partitions.

Generated {time.strftime('%Y-%m-%d %H:%M:%S')} by scripts/resume_bench.py.
""")


if __name__ == "__main__":
    main()
