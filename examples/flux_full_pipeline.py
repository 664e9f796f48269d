"""End-to-end flux pipeline: processing chain with DETECTED USTAR
thresholds -> random uncertainty -> nighttime partitioning -> ALE of the
driver response. Synthetic NEE-like data (no external inputs).

Run: python examples/flux_full_pipeline.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from diive_spark.operators import ale, fluxchain, fluxpart
from diive_spark.operators import uncertainty as unc
from diive_spark.session import get_spark

spark = get_spark("example-flux", master="local[8]")
spark.sparkContext.setLogLevel("ERROR")

# --- synthetic half-hourly NEE with drivers ---------------------------------
rng = np.random.default_rng(7)
n = 48 * 120
ts = pd.date_range("2023-03-01", periods=n, freq="30min")
hod = ts.hour.to_numpy() + ts.minute.to_numpy() / 60.0
night = ((hod < 6) | (hod >= 18)).astype(int)
ta = 10 + 8 * np.sin(2 * np.pi * (hod - 14) / 24) + rng.normal(0, 1, n)
swin = np.where(night == 1, 0.0,
                np.maximum(0, 600 * np.sin(np.pi * (hod - 6) / 12)))
ustar = np.abs(rng.normal(0.25, 0.12, n))
vpd = np.abs(0.6 + 0.3 * np.sin(2 * np.pi * hod / 24) + rng.normal(0, 0.1, n))
b = 1 / (288.15 - 227.13) - 1 / (ta + 273.15 - 227.13)
reco = 2.5 * np.exp(120.0 * b)
gpp = np.where(night == 1, 0.0, 9.0 * swin / (swin + 300.0))
nee = reco - gpp + rng.normal(0, 0.6, n)
nee[rng.choice(n, 300, replace=False)] = np.nan
pdf = pd.DataFrame({"site": "s1", "ts": ts, "NEE": nee, "TA": ta,
                    "SW_IN": swin, "USTAR": ustar, "VPD": vpd,
                    "NIGHTTIME": night})
df = spark.createDataFrame(pdf)

# --- L2 -> L4.2 with per-key DETECTED bootstrap USTAR scenarios --------------
chain = fluxchain.run_chain(
    df, ["site"], "ts", "NEE",
    ustar_col="USTAR", ta_col="TA", swin_col="SW_IN",
    nighttime_col="NIGHTTIME", ustar_n_boot=8,
)
print("chain columns:", len(chain.columns))
chain.select("ts", "NEE", "NEE_L31_L33_CUT_50", "NEE_L31_L33_CUT_50_L41",
             "NEE_L31_L33_CUT_50_L41_CUMSUM_YEAR").show(5)

# --- PAS20 random uncertainty on the filled median scenario ------------------
filled = chain.select("site", "ts", "TA", "VPD", "SW_IN",
                      F.col("NEE_L31_QCF").alias("NEE_obs"),
                      F.col("NEE_L31_L33_CUT_50_L41").alias("NEE_f"))
with_unc = unc.random_uncertainty_pas20(
    filled, ["site"], "ts", "NEE_obs", "NEE_f", "TA", "VPD", "SW_IN")
cum = unc.cumulative_uncertainty(with_unc, ["site"], "ts", "NEE_f",
                                 "NEE_obs_RANDUNC")
cum.select("ts", "FLUX_CUM", "UNC_CUMULATIVE").orderBy(F.desc("ts")).show(3)

# --- nighttime partitioning NEE -> RECO + GPP --------------------------------
parted = fluxpart.partition_nee_nighttime(
    df, ["site"], "ts", "NEE", "TA", "NIGHTTIME")
parted.select("ts", "NEE", "RECO", "GPP", "E0").dropna().show(5)

# --- ALE: how does the detected Lloyd-Taylor response react to TA? -----------
e0 = parted.select("E0").dropna().first()["E0"]
def lt_predict(f):
    bb = F.lit(1 / (288.15 - 227.13)) - 1.0 / (f["TA"] + 273.15 - 227.13)
    return F.exp(F.lit(float(e0)) * bb)
curve = ale.accumulated_local_effects(
    parted.select("TA").dropna(), lt_predict, "TA", ["TA"], grid_size=10)
curve.show(11)
