#!/usr/bin/env python
"""Standalone oracle-parity sweep: every QUERIES entry vs its DuckDB oracle
at $SPARK_GRAFT_TEST_SF, one flushed line per gate with wall-times — the
pytest harness (tests/test_oracle_parity.py) with progress visibility and
per-gate timing, for the large-scale rehearsals (sf0.1 / sf1).

Usage:
    SPARK_GRAFT_TEST_SF=/tmp/sf1 python scripts/oracle_parity_standalone.py \
        [--only name1,name2] [--skip name1,name2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

from diive_spark import queries  # noqa: E402
from diive_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.01")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        if np.issubdtype(pdf[c].dtype, np.datetime64):
            pdf[c] = pdf[c].astype("datetime64[ns]")
    return pdf.sort_values(list(pdf.columns)).reset_index(drop=True)


def _compare(got: pd.DataFrame, want: pd.DataFrame) -> str | None:
    if list(got.columns) != list(want.columns):
        return f"columns {list(got.columns)} vs {list(want.columns)}"
    if len(got) != len(want):
        return f"rows {len(got)} vs {len(want)}"
    for c in got.columns:
        g, w = got[c], want[c]
        if (np.issubdtype(np.asarray(w).dtype, np.floating)
                or np.issubdtype(np.asarray(g).dtype, np.floating)):
            gg = pd.to_numeric(g).astype(float).to_numpy()
            ww = pd.to_numeric(w).astype(float).to_numpy()
            bad = ~((gg == ww) | (np.isnan(gg) & np.isnan(ww)))
            if bad.any():
                return (f"{c}: {int(bad.sum())} mismatches "
                        f"e.g. {gg[bad][:3]} vs {ww[bad][:3]}")
        else:
            mism = (g.astype(str).fillna("<NA>")
                    != w.astype(str).fillna("<NA>"))
            if mism.any():
                return f"{c}: {int(mism.sum())} value mismatches"
    return None


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default="")
    ap.add_argument("--skip", default="")
    args = ap.parse_args()
    only = set(filter(None, args.only.split(",")))
    skip = set(filter(None, args.skip.split(",")))

    spark = get_spark("oracle_parity", master="local[8]",
                      shuffle_partitions="16")
    spark.sparkContext.setLogLevel("ERROR")
    duck = duckdb.connect()
    for t in TABLES:
        duck.execute(
            f"CREATE VIEW {t} AS SELECT * "
            f"FROM read_parquet('{SF_DIR}/{t}.parquet')")

    results = {}
    failed = []
    for name in sorted(queries.QUERIES):
        if only and name not in only:
            continue
        if name in skip:
            continue
        t0 = time.time()
        try:
            if name not in queries.ORACLES:
                n = queries.QUERIES[name](spark, SF_DIR).count()
                results[name] = {"mode": "rows_only", "rows": n,
                                 "sec": round(time.time() - t0, 2)}
                print(f"{name}: rows_only {n} rows "
                      f"{results[name]['sec']}s", flush=True)
                continue
            # spark_sec / duck_sec time query execution + collect ONLY;
            # the pandas normalization (a full multi-column sort of the
            # collected frame) is harness cost, billed separately —
            # before r7 it dominated the big union gates' "spark" walls
            # (token_count read 32 s of which 0.3 s was engine).
            ts = time.time()
            raw = queries.QUERIES[name](spark, SF_DIR).toPandas()
            t_spark = time.time() - ts
            td = time.time()
            raw_want = duck.execute(queries.ORACLES[name]).df()
            t_duck = time.time() - td
            tn = time.time()
            got = _normalize(raw)
            want = _normalize(raw_want)
            t_norm = time.time() - tn
            err = _compare(got, want)
            results[name] = {
                "mode": "value", "rows": len(got), "match": err is None,
                "spark_sec": round(t_spark, 2), "duck_sec": round(t_duck, 2),
                "normalize_sec": round(t_norm, 2),
            }
            if err:
                results[name]["err"] = err
                failed.append(name)
            print(f"{name}: {'OK' if err is None else 'FAIL ' + err} "
                  f"rows={len(got)} spark={t_spark:.1f}s duck={t_duck:.1f}s",
                  flush=True)
        except Exception as exc:  # noqa: BLE001
            results[name] = {"mode": "error", "err": str(exc)[:200],
                             "sec": round(time.time() - t0, 2)}
            failed.append(name)
            print(f"{name}: ERROR {str(exc)[:160]}", flush=True)

    summary = {"sf_dir": SF_DIR, "n": len(results), "failed": failed,
               "results": results}
    out = f"/tmp/oracle_parity_{os.path.basename(SF_DIR.rstrip('/'))}.json"
    with open(out, "w") as f:
        json.dump(summary, f, indent=1)
    print(f"\n{len(results) - len(failed)}/{len(results)} green -> {out}",
          flush=True)


if __name__ == "__main__":
    main()
