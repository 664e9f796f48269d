"""True MDS gap-fill + tree-ensemble model fill (round-4 operators).

Run: python examples/mds_and_tree_fill.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd

from diive_spark.operators import mds, mlfill
from diive_spark.session import get_spark

spark = get_spark("example-mds-tree", master="local[8]")
spark.sparkContext.setLogLevel("ERROR")

# synthetic half-hourly flux month with meteorological drivers
rng = np.random.default_rng(42)
nperday = 48
n = nperday * 31
ts = pd.date_range("2024-07-01", periods=n, freq="30min")
hod = ts.hour.to_numpy() + ts.minute.to_numpy() / 60.0
swin = np.maximum(0.0, 800 * np.sin(np.pi * (hod - 5.5) / 13.5)) \
    + rng.uniform(0, 5, n)
ta = 14 + 9 * np.sin(np.pi * (hod - 9) / 15) + rng.normal(0, 1, n)
vpd = np.maximum(0.2, 2 + 14 * np.maximum(0.0, np.sin(np.pi * (hod - 8) / 13))
                 + rng.normal(0, 1, n))
nee = 3.0 - 0.025 * swin + 0.1 * ta + rng.normal(0, 0.8, n)
nee[rng.random(n) < 0.2] = np.nan   # 20% gaps

df = spark.createDataFrame(pd.DataFrame({
    "site": "CH-SYN", "ts": ts, "NEE": nee,
    "SW_IN": swin, "TA": ta, "VPD": vpd}))

# 1) true MDS: meteorological-similarity pooled means, ONEFlux cascade
filled = mds.mds_fill(df, ["site"], "ts", "NEE", "SW_IN", "TA", "VPD",
                      nperday=nperday)
print("MDS granular flag histogram (method*1000 + window days):")
filled.groupBy("FLAG_NEE_gfMDS_ISFILLED").count() \
      .orderBy("FLAG_NEE_gfMDS_ISFILLED").show()

# 2) tree-ensemble fill (Spark MLlib RF) with holdout skill scores
out, scores = mlfill.tree_model_fill(
    df, ["site"], "ts", "NEE", feature_cols=["SW_IN", "TA", "VPD"],
    test_size=0.25, with_scores=True)
print("RF holdout skill (reference prediction_scores metrics):")
scores.show()
print("fill flags (0 observed / 4 model):")
out.groupBy("fill_flag").count().orderBy("fill_flag").show()
