#!/usr/bin/env python
"""spark-submit entry point for the rollup pipeline (north rule launch shape).

Cluster usage:
    python scripts/make_pyfiles_zip.py            # -> dist/diive_spark.zip
    spark-submit --py-files dist/diive_spark.zip \
        scripts/submit_rollup.py --input <token-table-path> --output <dir> \
        [--mincounts-perc 0.0] [--batch-size 8]

The script never sets a master: spark-submit supplies it (local demo:
``--master 'local[8]'``). SPARK_SUBMIT_MODE=1 keeps get_spark from forcing a
local master.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

os.environ.setdefault("SPARK_SUBMIT_MODE", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from diive_spark.plans import pipeline  # noqa: E402
from diive_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="token-table parquet path")
    ap.add_argument("--output", required=True, help="tier output directory")
    ap.add_argument("--mincounts-perc", type=float, default=0.0)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--no-pack", action="store_true")
    args = ap.parse_args()

    spark = get_spark("diive_spark_rollup")
    spark.sparkContext.setLogLevel("WARN")
    raw = spark.read.parquet(args.input)
    metrics = pipeline.run_pipeline(
        spark, raw, args.output,
        mincounts_perc=args.mincounts_perc,
        batch_size=args.batch_size,
        pack_tier=None if args.no_pack else "1m",
    )
    print(json.dumps(metrics))


if __name__ == "__main__":
    main()
