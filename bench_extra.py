#!/usr/bin/env python
"""Per-leg isolation / profiling harness for the r8 optimization round.

``bench.py`` is FROZEN for measurement; this file exists so sub-phase
timings, noop-sink isolation (guide §1.4) and ``explain("formatted")``
captures can be taken without touching the record harness. Numbers cited
in OPTIMIZATION_r08.md come from here; the official record stays bench.py.

Usage:
    python bench_extra.py [leg ...] [--trials N] [--plans DIR]

Legs: cascade gapfill gorilla headline filter tree dedup bpe all
With --plans DIR, each profiled query's formatted plan is written to
DIR/<name>.txt.
"""

from __future__ import annotations

import argparse
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

HEADLINE = [
    "rollup_1m", "rollup_1h_gate90", "cascade_1d", "gap_table_1h",
    "interp_linear_1h", "zscore_outliers", "diel_cycle", "sstats", "time_since",
    "mds_fill", "flux_partition_day", "timestamp_shift", "wind_rot_lag",
]

T: dict[str, list] = {}


def _headline_query(name):
    reg = getattr(qcat, "_SINGLE_QUERIES", qcat.QUERIES)
    return reg.get(name) or qcat.QUERIES[name]


def rec(name, t0):
    el = round(time.time() - t0, 3)
    T.setdefault(name, []).append(el)
    print(f"    {name}: {el}", file=sys.stderr)
    return time.time()


def _raw_cached(spark):
    raw = (
        synth.with_event_time(synth.token_table(spark, TOKEN_ROWS, with_tokens=False))
        .select("n_tok", "source", "event_time")
        .repartitionByRange(int(CPUS) * 2, "event_time")
        .cache()
    )
    raw.selectExpr("sum(n_tok) s").collect()
    return raw


def leg_cascade(spark):
    raw = _raw_cached(spark)
    spark.sparkContext.setJobDescription("cascade: 1m rollup")
    t0 = time.time()
    t1m = resample.rollup(raw, "event_time", ["n_tok"], "1m", key_cols=["source"]).cache()
    t1m.count()
    t0 = rec("cascade.t1m", t0)
    spark.sparkContext.setJobDescription("cascade: 1h reagg")
    t1h = resample.reaggregate(t1m, "1h", ["n_tok"], key_cols=["source"]).cache()
    t1h.count()
    t0 = rec("cascade.t1h", t0)
    spark.sparkContext.setJobDescription("cascade: 1d reagg")
    resample.reaggregate(t1h, "1d", ["n_tok"], key_cols=["source"]).count()
    rec("cascade.t1d", t0)
    t1h.unpersist()
    return raw, t1m


def leg_gapfill(spark, t1m):
    spark.sparkContext.setJobDescription("gapfill: grid")
    t0 = time.time()
    g = grid.gridded(t1m, "1m", ["source"])
    g.write.format("noop").mode("overwrite").save()
    t0 = rec("gapfill.grid_noop", t0)
    spark.sparkContext.setJobDescription("gapfill: cascade fill")
    filled = gapfill.gapfill_cascade(
        g.select("source", "window_start", "n_tok_cnt", "n_tok_mean"),
        ["source"], "window_start", "n_tok_mean",
        tier_seconds=60, interp_limit=3, window_tiers=[5, 13, 49],
    )
    filled.filter("fill_flag >= 1").count()
    rec("gapfill.fill_count", t0)


def leg_gorilla(spark, t1m):
    spark.sparkContext.setJobDescription("gorilla: pack")
    t0 = time.time()
    packed = gorilla.pack_blocks(t1m, ["source"], "window_end", "n_tok_mean").cache()
    packed.selectExpr("sum(raw_bytes) raw", "sum(packed_bytes) packed",
                      "sum(n_points) pts").collect()
    t0 = rec("gorilla.pack", t0)
    spark.sparkContext.setJobDescription("gorilla: unpack")
    gorilla.unpack_blocks(packed, ["source"]).count()
    rec("gorilla.unpack", t0)
    packed.unpersist()


def leg_headline(spark, plans_dir=None, names=None):
    for name in names or HEADLINE:
        q = _headline_query(name)
        if plans_dir:
            df = q(spark, SF_DIR)
            with open(os.path.join(plans_dir, f"{name}.txt"), "w") as f:
                f.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
        spark.sparkContext.setJobDescription(f"headline: {name}")
        t0 = time.time()
        q(spark, SF_DIR).count()
        rec(f"hl.{name}", t0)


def leg_filter(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet") \
        .repartition(int(CPUS)).cache()
    docs.count()
    # composite (the bench leg)
    spark.sparkContext.setJobDescription("filter_scan: composite")
    t0 = time.time()
    out = textstats.add_text_stats(docs)
    out = textstats.repetition_stats(out)
    out = privacy.redact_pii(out)
    out = textstats.fingerprint(out)
    out.selectExpr("count(*) n", "sum(n_pii_email) e",
                   "sum(CAST(dup_2gram_frac > 0.3 AS BIGINT)) r",
                   "sum(fp % 97) f").collect()
    t0 = rec("filter.composite", t0)
    # isolated stages (noop forces every column)
    spark.sparkContext.setJobDescription("filter_scan: text_stats only")
    textstats.add_text_stats(docs).write.format("noop").mode("overwrite").save()
    t0 = rec("filter.text_stats", t0)
    spark.sparkContext.setJobDescription("filter_scan: repetition only")
    textstats.repetition_stats(docs).write.format("noop").mode("overwrite").save()
    t0 = rec("filter.repetition", t0)
    spark.sparkContext.setJobDescription("filter_scan: pii only")
    privacy.redact_pii(docs).write.format("noop").mode("overwrite").save()
    t0 = rec("filter.pii", t0)
    spark.sparkContext.setJobDescription("filter_scan: fingerprint only")
    textstats.fingerprint(docs).write.format("noop").mode("overwrite").save()
    rec("filter.fingerprint", t0)
    docs.unpersist()


def leg_tree(spark):
    raw = (
        synth.with_event_time(synth.token_table(spark, TOKEN_ROWS, with_tokens=False))
        .select("n_tok", "source", "event_time")
        .repartitionByRange(int(CPUS) * 2, "event_time")
    )
    t1m = resample.rollup(raw, "event_time", ["n_tok"], "1m", key_cols=["source"])
    g = grid.gridded(t1m, "1m", ["source"]).cache()
    g.count()
    spark.sparkContext.setJobDescription("tree_model_fill")
    t0 = time.time()
    tf = mlfill.tree_model_fill(
        g.select("source", "window_start", "n_tok_mean"),
        ["source"], "window_start", "n_tok_mean", num_trees=20)
    tf.filter("fill_flag >= 1").count()
    rec("tree.fill", t0)
    g.unpersist()


def leg_dedup(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet") \
        .repartition(int(CPUS))
    docs.count()
    spark.sparkContext.setJobDescription("dedup: lsh pairs")
    t0 = time.time()
    pairs = dedup.minhash_lsh_pairs(docs, "doc_id", threshold=0.02,
                                    max_doc_freq=5).cache()
    n_pairs = pairs.count()
    t0 = rec("dedup.lsh_pairs", t0)
    spark.sparkContext.setJobDescription("dedup: cc")
    dedup.connected_components(pairs).count()
    rec("dedup.cc", t0)
    print(f"    (pairs={n_pairs})", file=sys.stderr)
    pairs.unpersist()


def leg_bpe(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet") \
        .repartition(int(CPUS))
    docs.count()
    spark.sparkContext.setJobDescription("bpe: train")
    t0 = time.time()
    tok = bpe.train_bpe(docs, num_merges=200)
    t0 = rec("bpe.train", t0)
    spark.sparkContext.setJobDescription("bpe: encode")
    tt = bpe.encode_to_token_table(docs, tok)
    tt.selectExpr("sum(n_tok) s").collect()
    rec("bpe.encode", t0)


def _cpu_control(spark) -> float:
    """Same fixed-work host-speed yardstick as bench.py."""
    best = None
    for _ in range(2):
        t0 = time.time()
        spark.range(0, 150_000_000, numPartitions=int(CPUS) * 4).select(
            F.sum(F.crc32(F.sha2(F.col("id").cast("string"), 256)))
        ).collect()
        el = time.time() - t0
        best = el if best is None or el < best else best
    return round(best, 3)


def _wait_idle():
    budget, thr, t0 = 240.0, 0.7, time.time()
    while os.getloadavg()[0] >= thr and time.time() - t0 < budget:
        print(f"[extra] waiting for idle host: load1={os.getloadavg()[0]:.2f}",
              file=sys.stderr)
        time.sleep(10)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("legs", nargs="*", default=["all"])
    ap.add_argument("--trials", type=int, default=2)
    ap.add_argument("--plans", default=None)
    ap.add_argument("--headline-only", default=None,
                    help="comma list of headline query names")
    args = ap.parse_args()
    legs = set(args.legs or ["all"])
    if args.plans:
        os.makedirs(args.plans, exist_ok=True)

    _wait_idle()
    spark = get_spark("diive_spark_bench_extra", master=f"local[{CPUS}]",
                      shuffle_partitions=str(max(int(CPUS) * 2, 8)))
    spark.sparkContext.setLogLevel("ERROR")
    T["control"] = [_cpu_control(spark)]
    print(f"[control] {T['control'][0]}", file=sys.stderr)

    for trial in range(args.trials):
        print(f"[trial {trial}]", file=sys.stderr)
        want = lambda n: "all" in legs or n in legs  # noqa: E731
        raw = t1m = None
        if want("cascade") or want("gapfill") or want("gorilla"):
            raw, t1m = leg_cascade(spark)
        if want("gapfill"):
            leg_gapfill(spark, t1m)
        if want("gorilla"):
            leg_gorilla(spark, t1m)
        if t1m is not None:
            t1m.unpersist()
            raw.unpersist()
        if want("headline"):
            names = (args.headline_only.split(",")
                     if args.headline_only else None)
            leg_headline(spark, args.plans if trial == 0 else None, names)
        if want("filter"):
            leg_filter(spark)
        if want("tree"):
            leg_tree(spark)
        if want("dedup"):
            leg_dedup(spark)
        if want("bpe"):
            leg_bpe(spark)
        T["control"].append(_cpu_control(spark))
        print(f"[control] {T['control'][-1]}", file=sys.stderr)

    best = {k: min(v) for k, v in T.items()}
    med = {k: sorted(v)[len(v) // 2] for k, v in T.items()}
    print(json.dumps({"sf_dir": SF_DIR, "cpus": CPUS,
                      "best": best, "median": med, "all": T}, indent=1))


if __name__ == "__main__":
    main()
