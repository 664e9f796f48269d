"""Gap detection + model-free fill cascade with quality flags.

Run: python examples/gapfill_cascade.py
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from diive_spark.session import get_spark
from diive_spark import synth
from diive_spark.operators import resample, grid, gapfill

spark = get_spark("example-gapfill", master="local[8]")
spark.sparkContext.setLogLevel("ERROR")

raw = synth.inject_gaps(synth.with_event_time(synth.token_table(spark, 10_000, with_tokens=False)))
t1h = resample.rollup(raw, "event_time", ["n_tok"], "1h").withColumn("series", F.lit("all"))
g = grid.gridded(t1h, "1h", ["series"])

print("gap table (seeded gaps):")
grid.gap_table(g, ["series"], "n_tok_cnt", tier="1h").orderBy("gap_start").show()

filled = gapfill.gapfill_cascade(
    g.select("series", "window_start", "n_tok_cnt", "n_tok_mean"),
    ["series"], "window_start", "n_tok_mean",
    tier_seconds=3600, interp_limit=3, window_tiers=[5, 13, 49],
)
print("fill flags (0 observed / 1 interp / 2 median):")
filled.groupBy("fill_flag").count().orderBy("fill_flag").show()
