#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": <total sec>, "unit": "sec", "queries": {...}, "sf": ...}

Extra keys (informational): tokens_per_sec (tier-0 ingest throughput on the
deterministic token table), rollup_points_per_sec, compression_ratio,
filter_docs_per_sec / dedup_docs_per_sec (curation-tier throughput).
Scaling-efficiency evidence (local[8] vs local[32]) lives in
scripts/scaling_bench.py -> BENCH/BASELINE.md.

RECORD HYGIENE (r6 VERDICT items 2+3): the stdout JSON is kept well under
the driver's ~3 KB tail window — per-trial timings and the per-query best
map go to BENCH/last_run_detail.json instead of stdout — and before
measuring, the harness waits (bounded, stderr-only progress) for the host
load to drop so the artifact of record is captured on a quiet machine.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from diive_spark import queries as qcat  # noqa: E402
from diive_spark import synth  # noqa: E402
from diive_spark.compression import gorilla  # noqa: E402
from diive_spark.operators import (bpe, dedup, gapfill, grid, mlfill,  # noqa: E402
                                   privacy, resample, textstats)
from diive_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
TOKEN_ROWS = int(os.environ.get("SPARK_GRAFT_BENCH_TOKENS", "1000000"))

#: headline single-operator queries — the r1-r3 workloads, unchanged (some
#: now live in the catalog's union gates; the singles registry keeps the
#: per-operator work identical so rounds stay comparable)
HEADLINE = [
    "rollup_1m", "rollup_1h_gate90", "cascade_1d", "gap_table_1h",
    "interp_linear_1h", "zscore_outliers", "diel_cycle", "sstats", "time_since",
    # round-4/5 heavy operators (VERDICT r4 item 3): tracked with the same
    # 3-trial per-query dispersion so kernel regressions are visible
    "mds_fill", "flux_partition_day", "timestamp_shift", "wind_rot_lag",
]

N_TRIALS = int(os.environ.get("SPARK_GRAFT_BENCH_TRIALS", "3"))


def _headline_query(name):
    reg = getattr(qcat, "_SINGLE_QUERIES", qcat.QUERIES)
    return reg.get(name) or qcat.QUERIES[name]


def run_light(spark) -> tuple[dict, dict]:
    """One measurement pass over the r4-comparable workload (tier cascade,
    gapfill, gorilla, headline operator queries). Returns (timings, extras)."""
    timings: dict[str, float] = {}
    extras: dict[str, float] = {}

    # --- tier-0 ingest throughput on the engine's native token table -------
    raw = (
        synth.with_event_time(synth.token_table(spark, TOKEN_ROWS, with_tokens=False))
        .select("n_tok", "source", "event_time")
        # event-time range partitioning = window locality: per-task partial-agg
        # hash maps stay cache-sized (see BENCH/BASELINE.md)
        .repartitionByRange(int(CPUS) * 2, "event_time")
        .cache()
    )
    total_tokens = raw.selectExpr("sum(n_tok) s").collect()[0]["s"]  # forces cache

    t0 = time.time()
    t1m = resample.rollup(raw, "event_time", ["n_tok"], "1m", key_cols=["source"]).cache()
    n1m = t1m.count()
    t1h = resample.reaggregate(t1m, "1h", ["n_tok"], key_cols=["source"]).cache()
    n1h = t1h.count()
    t1d = resample.reaggregate(t1h, "1d", ["n_tok"], key_cols=["source"])
    n1d = t1d.count()
    el = time.time() - t0
    timings["token_tier_cascade"] = round(el, 3)
    extras["tokens_per_sec"] = round(total_tokens / el)
    extras["rollup_points_per_sec"] = round((n1m + n1h + n1d) * len(resample.PARTIAL_COLS) / el)

    # --- gap-fill throughput on the 1m grid --------------------------------
    t0 = time.time()
    g = grid.gridded(t1m, "1m", ["source"])
    filled = gapfill.gapfill_cascade(
        g.select("source", "window_start", "value_cnt" if "value_cnt" in g.columns else "n_tok_cnt", "n_tok_mean"),
        ["source"], "window_start", "n_tok_mean",
        tier_seconds=60, interp_limit=3, window_tiers=[5, 13, 49],
    )
    n_filled = filled.filter("fill_flag >= 1").count()
    timings["gapfill_1m_grid"] = round(time.time() - t0, 3)
    extras["filled_windows"] = n_filled

    # --- Gorilla pack of the 1m tier ----------------------------------------
    t0 = time.time()
    packed = gorilla.pack_blocks(t1m, ["source"], "window_end", "n_tok_mean").cache()
    stats = packed.selectExpr(
        "sum(raw_bytes) raw", "sum(packed_bytes) packed", "sum(n_points) pts"
    ).collect()[0]
    el = time.time() - t0
    timings["gorilla_pack_1m"] = round(el, 3)
    extras["compression_ratio"] = round(stats["raw"] / stats["packed"], 3)
    extras["packed_points_per_sec"] = round(stats["pts"] / el)

    # --- Gorilla read-back (decode) throughput ------------------------------
    t0 = time.time()
    n_back = gorilla.unpack_blocks(packed, ["source"]).count()
    el = time.time() - t0
    timings["gorilla_unpack_1m"] = round(el, 3)
    extras["unpacked_points_per_sec"] = round(n_back / el)

    # --- headline operator queries on the driver tables --------------------
    for name in HEADLINE:
        t0 = time.time()
        n = _headline_query(name)(spark, SF_DIR).count()
        timings[name] = round(time.time() - t0, 3)
        _ = n

    # --- curation filter_scan: the corpus-sized quality pass ---------------
    # (text stats + Gopher repetition + PII redaction + fingerprint, one
    # wide projection over 100% of document bytes — the pass a training
    # pipeline runs on everything; first-class leg since r7 so its
    # docs/sec is tracked round-over-round like tokens/sec)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet") \
        .repartition(int(CPUS)).cache()
    n_docs = docs.count()
    t0 = time.time()
    out = textstats.add_text_stats(docs)
    out = textstats.repetition_stats(out)
    out = privacy.redact_pii(out)
    out = textstats.fingerprint(out)
    # tiny aggregate forces every expression on every row
    out.selectExpr("count(*) n", "sum(n_pii_email) e",
                   "sum(CAST(dup_2gram_frac > 0.3 AS BIGINT)) r",
                   "sum(fp % 97) f").collect()
    el = time.time() - t0
    timings["filter_scan"] = round(el, 3)
    extras["filter_docs_per_sec"] = round(n_docs / el)
    docs.unpersist()

    packed.unpersist()
    t1m.unpersist()
    t1h.unpersist()
    raw.unpersist()

    return timings, extras


def run_heavy(spark) -> tuple[dict, dict]:
    """One measurement pass over the heavyweight jobs (MLlib tree fill,
    LSH+CC dedup, BPE tokenize). Separated from run_light and run AFTER all
    of its trials: these jobs (dozens of MLlib level jobs; the LSH+CC
    pipeline; the BPE trainer's driver merge loop) churn the JVM enough to
    slow every query measured after them in the same session by ~15-20%
    (round-6 attribution: same code, r4-shaped suite = 11.9 s vs 14.2 s
    embedded in the full suite, idle host both; phase separation keeps
    every run_light trial — not just trial 1 — in the clean-JVM state the
    r4 record used)."""
    timings: dict[str, float] = {}
    extras: dict[str, float] = {}

    # untimed: rebuild the 1m grid input the tree fill consumes
    raw = (
        synth.with_event_time(synth.token_table(spark, TOKEN_ROWS, with_tokens=False))
        .select("n_tok", "source", "event_time")
        .repartitionByRange(int(CPUS) * 2, "event_time")
    )
    t1m = resample.rollup(raw, "event_time", ["n_tok"], "1m", key_cols=["source"])
    g = grid.gridded(t1m, "1m", ["source"]).cache()
    g.count()

    t0 = time.time()
    tf = mlfill.tree_model_fill(
        g.select("source", "window_start", "n_tok_mean"),
        ["source"], "window_start", "n_tok_mean", num_trees=20)
    n_tree = tf.filter("fill_flag >= 1").count()
    timings["tree_model_fill_1m"] = round(time.time() - t0, 3)
    extras["tree_filled_windows"] = n_tree

    t0 = time.time()
    # single-file parquet reads land on ONE partition; spread the docs so
    # shingling/minhash run wide (at real scale the input is many files)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet") \
        .repartition(int(CPUS))
    n_docs = docs.count()
    pairs = dedup.minhash_lsh_pairs(docs, "doc_id", threshold=0.02,
                                    max_doc_freq=5)
    n_clustered = dedup.connected_components(pairs).count()
    el = time.time() - t0
    timings["dedup_cluster_cc"] = round(el, 3)
    extras["dedup_clustered_ids"] = n_clustered
    extras["dedup_docs_per_sec"] = round(n_docs / el)

    # --- BPE tokenize the corpus (train once, Arrow-batched encode) ---------
    t0 = time.time()
    tok = bpe.train_bpe(docs, num_merges=200)
    tt = bpe.encode_to_token_table(docs, tok)
    n_bpe_tokens = tt.selectExpr("sum(n_tok) s").collect()[0]["s"]
    el = time.time() - t0
    timings["bpe_tokenize_docs"] = round(el, 3)
    extras["bpe_tokens_per_sec"] = round(n_bpe_tokens / el)
    extras["bpe_vocab_size"] = len(tok.vocab)

    g.unpersist()

    return timings, extras


def _cpu_control(spark) -> float:
    """CPU-pure codegen control (sum of crc32(sha2(id)) over range): no IO,
    no shuffle, no Python — a fixed-work yardstick for the HOST's per-core
    throughput at record time. Cross-round comparisons should normalize by
    the control ratio before attributing deltas to code: round-6 idle-host
    measurements hours apart showed the same control drifting 6-10% (and
    per-trial query dispersion of up to ±30%), i.e. 'idle load average' is
    not a sufficient host-state control on this shared sandbox."""
    best = None
    for _ in range(2):
        t0 = time.time()
        spark.range(0, 150_000_000, numPartitions=int(CPUS) * 4).select(
            F.sum(F.crc32(F.sha2(F.col("id").cast("string"), 256)))
        ).collect()
        el = time.time() - t0
        best = el if best is None or el < best else best
    return round(best, 3)


def _median(xs):
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else 0.5 * (s[n // 2 - 1] + s[n // 2])


def _wait_for_idle_host() -> float:
    """Block (bounded) until load1 drops below the threshold, so the
    artifact of record is captured on a quiet host (r6 VERDICT item 2:
    two rounds running the official record carried load1_start ~3 while
    clean evidence runs existed hours earlier). Progress goes to stderr —
    stdout stays reserved for the single JSON record line."""
    budget = float(os.environ.get("SPARK_GRAFT_BENCH_IDLE_WAIT_SEC", "300"))
    thr = float(os.environ.get("SPARK_GRAFT_BENCH_IDLE_LOAD1", "0.5"))
    t0 = time.time()
    load1 = os.getloadavg()[0]
    while load1 >= thr and time.time() - t0 < budget:
        print(f"[bench] waiting for idle host: load1={load1:.2f} "
              f"(threshold {thr}, {int(budget - (time.time() - t0))}s left)",
              file=sys.stderr)
        time.sleep(10)
        load1 = os.getloadavg()[0]
    return load1


def main() -> None:
    load1_start = _wait_for_idle_host()
    spark = get_spark("diive_spark_bench", master=f"local[{CPUS}]",
                      shuffle_partitions=str(max(int(CPUS) * 2, 8)))
    spark.sparkContext.setLogLevel("ERROR")
    control_sec = _cpu_control(spark)

    # N_TRIALS passes per phase: the per-query MEDIAN is the headline
    # (robust to the trial-1 JIT warmup and to host jitter), and the
    # per-trial data is published so noise and regression are
    # distinguishable from the record. ALL light-phase trials run before
    # the first heavy job (see run_heavy on why the ordering matters).
    trial_timings: list[dict] = []
    trial_extras: list[dict] = []
    for _ in range(N_TRIALS):
        t, e = run_light(spark)
        trial_timings.append(t)
        trial_extras.append(e)
    for i in range(N_TRIALS):
        t, e = run_heavy(spark)
        trial_timings[i].update(t)
        trial_extras[i].update(e)

    names = list(trial_timings[0])
    queries = {n: round(_median([t[n] for t in trial_timings]), 3)
               for n in names}
    # best-of-trials: the steady-state number (robust to the ±30% per-trial
    # host jitter observed on this sandbox; same convention as
    # scripts/scaling_bench.py) — published alongside the historical median
    queries_best = {n: round(min(t[n] for t in trial_timings), 3)
                    for n in names}
    per_trial = {n: [t[n] for t in trial_timings] for n in names}
    extras = {k: (round(_median([e[k] for e in trial_extras]), 3)
                  if isinstance(trial_extras[0][k], float)
                  else int(_median([e[k] for e in trial_extras])))
              for k in trial_extras[0]}

    total = round(sum(queries.values()), 3)
    # the r1-r4 workload subset: comparable across rounds even as the suite
    # grows (round 5 added tree fill / CC clustering / new operators)
    legacy = ["token_tier_cascade", "gapfill_1m_grid", "gorilla_pack_1m",
              "gorilla_unpack_1m", "rollup_1m", "rollup_1h_gate90",
              "cascade_1d", "gap_table_1h", "interp_linear_1h",
              "zscore_outliers", "diel_cycle", "sstats", "time_since"]
    legacy_total = round(sum(queries[n] for n in legacy if n in queries), 3)
    legacy_best = round(sum(queries_best[n] for n in legacy if n in queries_best), 3)
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    try:
        sf = float(sf)
    except ValueError:
        sf = SF_DIR
    record = {
        "metric": "rollup-engine headline suite",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "value_r4_comparable": legacy_total,
        "value_best": round(sum(queries_best.values()), 3),
        "value_r4_comparable_best": legacy_best,
        "sf": sf,
        "trials": N_TRIALS,
        "load1_start": round(load1_start, 2),
        "control_sec": control_sec,
        # end-of-run control: mid-run host drift (noisy neighbors eating
        # PARALLEL throughput) is invisible to load1-at-start and to the
        # start control — r7 measured same-code medians swinging 15.2 ->
        # 18.4 -> 15.4 s across an hour with clean start controls. A
        # control_sec_end far from control_sec marks the record as taken
        # on a drifting host.
        "control_sec_end": _cpu_control(spark),
        **extras,
    }
    # per-trial dispersion + per-query bests: side file, NOT stdout — the
    # driver's tail window is ~3 KB and r6's record overflowed it
    # (BENCH_r06 parsed: null); the stdout line must stay well under it
    detail_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "BENCH")
    try:
        os.makedirs(detail_dir, exist_ok=True)
        with open(os.path.join(detail_dir, "last_run_detail.json"), "w") as f:
            json.dump({"per_trial": per_trial, "queries_best": queries_best,
                       **record}, f, indent=1)
    except OSError as exc:
        print(f"[bench] detail side-file write failed: {exc}", file=sys.stderr)
    line = json.dumps(record)
    if len(line) > 2500:
        # keep the record parseable even if the suite grows: drop the
        # per-query map (it stays in the side file) before the extras
        slim = {k: v for k, v in record.items() if k != "queries"}
        line = json.dumps(slim)
    print(line)


if __name__ == "__main__":
    main()
