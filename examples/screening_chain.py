"""Stepwise outlier screening -> QCF -> cleaned resample on the events table.

Run: python examples/screening_chain.py
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from diive_spark.session import get_spark
from diive_spark.operators.stepwise import StepwiseScreening

spark = get_spark("example-screening", master="local[8]")
spark.sparkContext.setLogLevel("ERROR")

ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
cleaned = (
    StepwiseScreening(ev, ["event_type"], "ts", "value")
    .flag_absolute_limits(-60.0, 60.0)
    .flag_zscore(thres=3.0, repeat=True)
    .flag_hampel(window_length=48, n_sigma=5.5)
    .finalize(resample_tier="1h")
)
cleaned.orderBy("event_type", "window_end").show(10)
