"""Analysis extras: decomposition, harmonics, Granger, optimum range,
compound extremes, LOF, model-based gap fill — on the driver test tables.

Run: python examples/analysis_extras.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from diive_spark.operators import analysis, gapfill, lof, resample
from diive_spark.session import get_spark

spark = get_spark("example-analysis", master="local[8]")
spark.sparkContext.setLogLevel("ERROR")

ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
hourly = resample.rollup(ev, "ts", ["value"], "1h", key_cols=["event_type"])
series = hourly.select("event_type", "window_start", "value_mean")

# 1. classical seasonal-trend decomposition (period = 24 h) + strength
dec = analysis.classical_decompose(series, ["event_type"], "window_start",
                                   "value_mean", period=24)
analysis.seasonality_strength(dec, ["event_type"]).show()

# 2. harmonic amplitudes/phases at k/24h (exact DFT, distributed sums)
analysis.harmonic_coefficients(series, ["event_type"], "window_start",
                               "value_mean", period=24, n_harmonics=3).show(6)

# 3. dominant seasonal period per series (full spectrum, per-series rfft)
analysis.detect_seasonality(series, ["event_type"], "window_start",
                            "value_mean").show(truncate=False)

# 4. Granger causality: does the click series predict the view series?
wide = (
    ev.groupBy(F.date_trunc("hour", "ts").alias("h"))
    .pivot("event_type", ["click", "view"]).agg(F.avg("value"))
    .withColumn("key", F.lit("all"))
)
print(analysis.granger_causality(wide, ["key"], "h", "click", "view", max_lag=3))

# 5. optimum range of one driver for a response
li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
res = analysis.find_optimum_range(li, "l_quantity", "l_extendedprice",
                                  n_bins=25)
print({k: v for k, v in res.items() if not hasattr(v, "shape")})

# 6. compound extremes over two drivers
analysis.compound_extremes(
    li.withColumn("ts", F.col("l_shipdate").cast("timestamp")),
    "ts", "l_quantity", "l_extendedprice", threshold=1.5,
).orderBy("period").show(6)

# 7. Local Outlier Factor flags on the raw events
lof.flag_lof(ev, ["event_type"], "ts", "value", contamination=0.01) \
   .filter(F.col("FLAG_LOF_TEST") == 2).show(6)

# 8. model-based gap fill: OLS on cyclic timestamp features per series
from diive_spark.operators import grid
g = grid.gridded(hourly, "1h", ["event_type"]).select(
    "event_type", "window_start", "value_mean")
filled = gapfill.linear_model_fill(g, ["event_type"], "window_start",
                                   "value_mean", min_train=48)
filled.filter("fill_flag = 4").show(6)
