"""Reference-parity goldens: the engine run on diive's OWN bundled example
files must reproduce the exact expected values from diive's own pytest suite
(the north rule's correctness anchor).

Golden sources (values copied verbatim from the reference tests):
- /root/reference/tests/test_loaddata.py:77-94 (DIIVE-CSV-30MIN load)
- /root/reference/tests/test_time.py:103-127 (detect freq, 30MIN resample)
- /root/reference/tests/test_time.py:129-137 (insert_timestamp)
- /root/reference/tests/test_time.py:20-41 (daily agg properties)
- /root/reference/tests/test_gapfilling.py:186-213 invariant shape
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from diive_spark.functions import timeparts
from diive_spark.operators import resample
from diive_spark.sources import csv as csvsrc
from diive_spark.sources import sanitizer

EXAMPLEDATA = "/root/reference/diive/configs/exampledata"
DIIVE_CSV = (f"{EXAMPLEDATA}/exampledata_DIIVE-CSV-30MIN_CH-DAV_FP2022.5_2022.07_"
             "ID20230206154316_30MIN.diive.csv")
GENERIC_1MIN = (f"{EXAMPLEDATA}/exampledata_GENERIC-CSV-HEADER-1ROW-TS-MIDDLE-FULL-"
                "1MIN_CH-FRU_iDL_BOX1_0_1_TBL1_20240401-0000.dat.csv")


@pytest.fixture(scope="module")
def diive_csv(spark):
    df, meta = csvsrc.read_filetype(spark, DIIVE_CSV, "DIIVE-CSV-30MIN")
    return df.cache(), meta


@pytest.fixture(scope="module")
def generic_1min(spark):
    df, _ = csvsrc.read_filetype(spark, GENERIC_1MIN,
                                 "GENERIC-CSV-HEADER-1ROW-TS-MIDDLE-FULL-1MIN")
    return df.cache()


def test_load_diive_csv_goldens(diive_csv):
    # test_loaddata.py:77-94
    df, meta = diive_csv
    value_cols = [c for c in df.columns if c != "TIMESTAMP_MIDDLE"]
    assert len(value_cols) == 101
    assert df.count() == 1488
    row = df.agg(
        F.sum("NEE_CUT_REF_f").alias("nee"),
        F.min("TIMESTAMP_MIDDLE").alias("first"),
        F.max("TIMESTAMP_MIDDLE").alias("last"),
        *[F.sum(F.col(f"`{c}`")).alias(f"_s_{c}") for c in value_cols],
    ).collect()[0]
    np.testing.assert_allclose(row["nee"], -1038.7633654702822, rtol=1e-9)
    total = sum(row[f"_s_{c}"] for c in value_cols if row[f"_s_{c}"] is not None)
    np.testing.assert_allclose(total, 672538188.9187319, rtol=1e-9)
    assert row["first"] == pd.Timestamp("2022-07-01 00:15:00")
    assert row["last"] == pd.Timestamp("2022-07-31 23:45:00")


def test_detect_freq_golden(diive_csv):
    # test_time.py:103-112 -> '30min'
    df, _ = diive_csv
    freq = sanitizer.detect_frequency(df, "TIMESTAMP_MIDDLE")
    assert freq.freq_seconds == 1800
    assert freq.confidence > 0.99


def test_resampling_to_30min_goldens(generic_1min):
    # test_time.py:114-127 — the canonical downsample on the CH-FRU 1-min file
    df = generic_1min
    r = resample.rollup(
        df, "TIMESTAMP_MIDDLE", ["TA_T1_2_1_Avg", "SW_IN_T1_1_1_Avg"], "30m",
        mincounts_perc=0.9, slots_per_window=30,
    ).cache()
    pdf = r.orderBy("window_end").toPandas().set_index("window_end")

    assert pdf.index[0] == pd.Timestamp("2024-04-01 00:30:00")
    np.testing.assert_allclose(
        pdf.loc[pd.Timestamp("2024-04-09 13:30:00"), "TA_T1_2_1_Avg_mean"],
        2.643333333333333, rtol=1e-12)
    np.testing.assert_allclose(
        pdf.loc[pd.Timestamp("2024-04-09 14:00:00"), "TA_T1_2_1_Avg_mean"],
        2.5, rtol=1e-12)
    np.testing.assert_allclose(pdf["TA_T1_2_1_Avg_mean"].sum(),
                               7984.021494252875, rtol=1e-10)
    np.testing.assert_allclose(
        pdf.loc[pd.Timestamp("2024-04-09 13:30:00"), "SW_IN_T1_1_1_Avg_mean"],
        104.64, rtol=1e-12)
    np.testing.assert_allclose(
        pdf.loc[pd.Timestamp("2024-04-09 14:00:00"), "SW_IN_T1_1_1_Avg_mean"],
        87.08333333333333, rtol=1e-12)
    np.testing.assert_allclose(pdf["SW_IN_T1_1_1_Avg_mean"].sum(),
                               134375.59183908044, rtol=1e-10)
    # 30-min continuous grid on the kept windows' span
    deltas = pdf.index.to_series().diff().dropna()
    assert deltas.min() == pd.Timedelta(minutes=30)


def test_insert_timestamp_goldens(generic_1min):
    # test_time.py:129-137 — middle 19:37:30 -> start 19:37:00, end 19:38:00
    out = timeparts.insert_timestamp_columns(
        generic_1min, "TIMESTAMP_MIDDLE", 60, "middle"
    ).filter(F.col("TIMESTAMP_MIDDLE") == "2024-04-05 19:37:30").collect()[0]
    assert out["TIMESTAMP_START"] == pd.Timestamp("2024-04-05 19:37:00")
    assert out["TIMESTAMP_END"] == pd.Timestamp("2024-04-05 19:38:00")


def test_daily_agg_properties_golden(diive_csv):
    # test_time.py:20-41 — daily max >= daily mean elementwise; strict
    # completeness keeps at most all days; one value per day
    df, _ = diive_csv
    first_col = [c for c in df.columns if c != "TIMESTAMP_MIDDLE"][0]
    mean_d = resample.resample_to_daily_agg(df, "TIMESTAMP_MIDDLE", first_col, "mean").toPandas()
    max_d = resample.resample_to_daily_agg(df, "TIMESTAMP_MIDDLE", first_col, "max").toPandas()
    assert len(mean_d) == 31  # July
    m = mean_d.merge(max_d, on="day", suffixes=("_mean", "_max")).dropna()
    assert (m["agg_value_max"] >= m["agg_value_mean"]).all()
    strict = resample.resample_to_daily_agg(df, "TIMESTAMP_MIDDLE", first_col, "mean",
                                            mincounts_perc=1.0).toPandas()
    assert len(strict) <= len(mean_d)


def test_format_timestamp_fluxnet(generic_1min, spark):
    # test_time.py:138-151 — FLUXNET YYYYMMDDhhmm
    out = generic_1min.select(
        timeparts.format_timestamp_fluxnet(F.col("TIMESTAMP_MIDDLE")).alias("f")
    ).limit(1).collect()[0]
    assert out["f"] == "202403312359"


def test_eddypro_fluxnet_structural(spark):
    # The CH-AWS golden file is absent from this snapshot; the CH-FRU 2012
    # EddyPro FLUXNET file checks the dialect structurally (yyyyMMddHHmm
    # timestamps parse, 30-min dominant frequency).
    p = (f"{EXAMPLEDATA}/exampledata_EDDYPRO-FLUXNET-CSV-30MIN_2012_eddypro_"
         "CH-FRU_FR-20230425-220357_fluxnet_2023-04-26T201227_adv.csv")
    df, _ = csvsrc.read_filetype(spark, p, "EDDYPRO-FLUXNET-CSV-30MIN")
    assert df.count() == 49  # 50-line sample file: header + 49 records
    freq = sanitizer.detect_frequency(df, "TIMESTAMP_END")
    assert freq.freq_seconds == 1800
    first = df.agg(F.min("TIMESTAMP_END").alias("f")).collect()[0]["f"]
    assert first.year == 2012 and first.minute in (0, 30)


def test_toa5_dialect(spark):
    # TOA5 4-row header (device/names/units/aggtype), ts col 'TIMESTAMP'
    p = (f"{EXAMPLEDATA}/exampledata_TOA5-DAT-1MIN_CH-OE2_iDL_BOX1_0_1_TBL1_"
         "20220629-1714.dat")
    df, meta = csvsrc.read_filetype(spark, p, "TOA5-DAT-1MIN")
    assert meta["units"]["TIMESTAMP"] == "TS"
    n = df.count()
    assert n > 10
    assert df.filter(F.col("TIMESTAMP").isNull()).count() == 0
    freq = sanitizer.detect_frequency(df, "TIMESTAMP")
    assert freq.freq_seconds == 60


def test_icos_zip_dialect(spark):
    p = f"{EXAMPLEDATA}/exampledata_ICOS-H2R-CSVZIP-10S_CH-Dav_BM_20230328_L02_F03.zip"
    df = csvsrc.read_zipped_filetype(spark, p, "ICOS-H2R-CSVZIP-10S")
    n = df.count()
    assert n == 98  # 100-line sample: 2 header rows + 98 records
    assert df.filter(F.col("TIMESTAMP").isNull()).count() == 0
    freq = sanitizer.detect_frequency(df, "TIMESTAMP")
    assert freq.freq_seconds == 10
    first = df.agg(F.min("TIMESTAMP").alias("f")).collect()[0]["f"]
    assert str(first) == "2023-03-28 00:00:10"


def test_highfreq_gz_timestamp_reconstruction(spark):
    p = (f"{EXAMPLEDATA}/exampledata_ETH-RECORD-TOA5-CSVGZ-20HZ_CH-FRU_ec_"
         "20240404-1300.csv.gz")
    df = csvsrc.read_highfreq_gz(spark, p, "ETH-RECORD-TOA5-CSVGZ-20HZ")
    n = df.count()
    assert n == 96  # 100-line sample: 4 header rows + 96 records
    bounds = df.agg(F.min("TIMESTAMP_END").alias("lo"),
                    F.max("TIMESTAMP_END").alias("hi")).collect()[0]
    assert str(bounds["lo"]) == "2024-04-04 13:00:00"
    # 50ms nominal rate: span == (n-1) * 50ms
    span_ms = (bounds["hi"] - bounds["lo"]).total_seconds() * 1000
    assert span_ms == (n - 1) * 50
    assert df.select("U").first()["U"] is not None


def test_fluxnet_fullset_structural(spark):
    p = (f"{EXAMPLEDATA}/exampledata_FLUXNET-FULLSET-HH-CSV-30MIN_FLX_CH-Cha_"
         "FLUXNET2015_FULLSET_HH_2005-2020_beta-3.csv")
    df, _ = csvsrc.read_filetype(spark, p, "FLUXNET-FULLSET-HH-CSV-30MIN")
    assert df.count() > 10
    freq = sanitizer.detect_frequency(df, "TIMESTAMP_END")
    assert freq.freq_seconds == 1800


def test_gridaggregator_goldens(spark):
    # the reference's synthetic seeded fixture (tests/test_gridaggregator.py:12)
    # is fully reproducible: np.random.seed(42), 100 uniform x/y/z
    import numpy as np
    from diive_spark.operators import gridagg

    np.random.seed(42)
    pdf = pd.DataFrame({
        "x": np.random.rand(100), "y": np.random.rand(100), "z": np.random.rand(100)
    })
    df = spark.createDataFrame(pdf)

    # quantile binning golden: wide-matrix sum (test_gridaggregator.py:18-34)
    q = gridagg.grid_aggregate(df, "x", "y", "z", "quantile",
                               n_bins_x=5, n_bins_y=5,
                               aggfunc="mean", min_n_vals_per_bin=2).toPandas()
    np.testing.assert_allclose(q["agg_value"].dropna().sum(),
                               12.778815109306617, rtol=1e-12)

    # custom binning golden: wide-matrix sum (test_gridaggregator.py:56-74)
    c = gridagg.grid_aggregate(df, "x", "y", "z", "custom",
                               custom_x_edges=[0, 0.25, 0.5, 0.75, 1],
                               custom_y_edges=[0, 0.3, 0.6, 1],
                               aggfunc="max", min_n_vals_per_bin=1).toPandas()
    np.testing.assert_allclose(c["agg_value"].dropna().sum(),
                               10.860205042306513, rtol=1e-12)
    assert c["xbin"].nunique() == 4 and c["ybin"].nunique() == 3


def test_qcf_goldens(spark):
    # the reference's synthetic QCF decision fixture (tests/test_qaqc.py:11-55)
    from diive_spark.operators import outliers

    cols = [f"FLAG_FC_T{i}_TEST" for i in range(1, 6)]
    rows = [
        [0, 0, 0, 0, 0],  # -> QCF 0
        [1, 0, 0, 0, 0],  # -> QCF 1
        [1, 1, 0, 0, 0],  # -> QCF 1
        [1, 1, 1, 1, 0],  # -> QCF 2 (4 soft)
        [2, 0, 0, 0, 0],  # -> QCF 2 (1 hard)
        [2, 1, 1, 0, 0],  # -> QCF 2
    ]
    pdf = pd.DataFrame(rows, columns=cols, dtype=float)
    pdf["FC"] = np.arange(1.0, 7.0)
    out = outliers.flag_qcf(spark.createDataFrame(pdf)).orderBy("FC").toPandas()
    assert list(out["FLAG_QCF"]) == [0, 1, 1, 2, 2, 2]
    # filtered series drops QCF==2; HQ keeps only QCF==0 (test_qaqc.py:41-55)
    filtered = out["FC"].where(out["FLAG_QCF"] < 2)
    assert filtered.iloc[[3, 4, 5]].isna().all()
    np.testing.assert_allclose(filtered.iloc[[0, 1, 2]], [1.0, 2.0, 3.0])
    hq = out["FC"].where(out["FLAG_QCF"] == 0)
    assert int(hq.notna().sum()) == 1
