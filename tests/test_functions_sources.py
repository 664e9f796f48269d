"""Scalar functions vs numpy oracles (reference formulas) + sanitizer/CSV
ingest pipeline."""

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from diive_spark import synth
from diive_spark.functions import corrections, solar, thermo, timeparts
from diive_spark.sources import csv as csvsrc
from diive_spark.sources import sanitizer


@pytest.fixture(scope="module")
def wide(spark):
    return spark.createDataFrame(synth.wide_timeseries_pdf().reset_index()).cache()


def test_vpd_matches_reference_formula(spark, wide):
    got = wide.select(
        thermo.vpd_from_ta_rh(F.col("TA"), F.lit(65.0)).alias("vpd")
    ).toPandas()["vpd"]
    pdf = synth.wide_timeseries_pdf()
    ta = pdf["TA"].to_numpy()
    expect = 6.1078 * (1 - 65.0 / 100) * np.exp(ta * 17.08085 / (ta + 234.175)) * 0.1
    np.testing.assert_allclose(got.to_numpy(), expect, rtol=1e-12)


def test_thermo_misc(spark):
    df = spark.createDataFrame(pd.DataFrame({"u": [2.0, 3.0], "ustar": [0.5, 0.0],
                                             "ts_k": [300.0, 290.0], "h2o": [0.01, 0.02]}))
    out = df.select(
        thermo.aerodynamic_resistance(F.col("u"), F.col("ustar")).alias("ra"),
        thermo.air_temp_from_sonic_temp(F.col("ts_k"), F.col("h2o")).alias("ta"),
        thermo.latent_heat_of_vaporization(F.lit(20.0)).alias("lhv"),
    ).toPandas()
    assert out["ra"][0] == 2.0 / 0.25 and pd.isna(out["ra"][1])  # ustar<=0 -> null
    np.testing.assert_allclose(out["ta"][0], 300.0 / (1 + 0.32 * 0.01))
    np.testing.assert_allclose(out["lhv"][0], (2.501 - 0.00237 * 20.0) * 1e6)


def test_potential_radiation_oracle(spark, wide):
    lat, lon, off = 46.8, 9.9, 1  # CH-DAV-like site
    got = wide.select(
        "TIMESTAMP_MIDDLE",
        solar.potential_radiation(F.col("TIMESTAMP_MIDDLE"), lat, lon, off).alias("pot"),
    ).orderBy("TIMESTAMP_MIDDLE").toPandas()

    # numpy oracle implementing the same public formula (radiation.py:15-100)
    ts = pd.DatetimeIndex(got["TIMESTAMP_MIDDLE"])
    utc = ts - pd.Timedelta(hours=off)
    doy = utc.dayofyear.to_numpy().astype(float)
    utc_h = (utc.hour + utc.minute / 60.0 + utc.second / 3600.0).to_numpy().astype(float)
    phi, phi_r = math.radians(lat), math.radians(23.45)
    delta = phi_r * np.cos(2 * np.pi * (doy - 173) / 365.25)
    b = 2 * np.pi * (doy - 81) / 365.0
    eot_h = (9.87 * np.sin(2 * b) - 7.53 * np.cos(b) - 1.5 * np.sin(b)) / 60.0
    h_rad = (utc_h + lon / 15.0 + eot_h - 12) * (np.pi / 12)
    sin_psi = np.sin(phi) * np.sin(delta) + np.cos(phi) * np.cos(delta) * np.cos(h_rad)
    rad = 1361.0 * (1 + 0.033 * np.cos(2 * np.pi * doy / 365.0)) * sin_psi
    rad[rad < 0] = 0
    np.testing.assert_allclose(got["pot"].to_numpy(), rad, rtol=1e-10, atol=1e-9)
    # sanity: radiation peaks near midday local time
    peak_hours = got.loc[got["pot"] > got["pot"].max() * 0.95, "TIMESTAMP_MIDDLE"].dt.hour
    assert peak_hours.between(10, 14).all()


def test_daytime_flag(spark, wide):
    out = solar.daytime_nighttime_flag(wide, "TIMESTAMP_MIDDLE", 46.8, 9.9, 1)
    pdf = out.toPandas()
    assert ((pdf["DAYTIME"] + pdf["NIGHTTIME"]) == 1).all()
    night = pdf[pdf["TIMESTAMP_MIDDLE"].dt.hour.isin([0, 1, 2, 23])]
    assert (night["NIGHTTIME"] == 1).all()


def test_vectorize_timestamps(spark, wide):
    out = timeparts.vectorize_timestamps(wide, "TIMESTAMP_MIDDLE").toPandas()
    ts = pd.DatetimeIndex(out["TIMESTAMP_MIDDLE"])
    assert (out["YEARMONTH"] == ts.year * 100 + ts.month).all()
    assert (out["SEASON"] == 2).all()  # July = JJA
    np.testing.assert_allclose(
        out["MONTH_sin"], np.sin(2 * np.pi * ts.month / 12.0), rtol=1e-12
    )
    assert (out["YEARDOY"] == ts.year * 1000 + ts.dayofyear).all()


def test_timestamp_convention_shift(spark, wide):
    shifted = timeparts.shift_timestamp_convention(
        wide, "TIMESTAMP_MIDDLE", 1800, "middle", "end"
    ).toPandas()
    orig = wide.toPandas()
    assert (
        pd.DatetimeIndex(shifted["TIMESTAMP_MIDDLE"])
        == pd.DatetimeIndex(orig["TIMESTAMP_MIDDLE"]) + pd.Timedelta(minutes=15)
    ).all()
    cols = timeparts.insert_timestamp_columns(wide, "TIMESTAMP_MIDDLE", 1800, "middle").toPandas()
    assert (
        pd.DatetimeIndex(cols["TIMESTAMP_END"]) - pd.DatetimeIndex(cols["TIMESTAMP_START"])
        == pd.Timedelta(minutes=30)
    ).all()


def test_corrections(spark):
    pdf = pd.DataFrame({
        "ts": pd.date_range("2024-01-01", periods=96, freq="1h"),
        "v": np.tile([5.0, 5.0, 100.0, 200.0], 24),
        "NIGHTTIME": np.tile([1, 1, 0, 0], 24),
    })
    df = spark.createDataFrame(pdf)
    out = corrections.remove_nighttime_zero_offset(df, "ts", "v", "NIGHTTIME").toPandas()
    # nighttime median is 5 per day -> all values shifted down 5, clamped >= 0
    assert set(np.round(out["v_corrected"].unique(), 6)) == {0.0, 95.0, 195.0}
    clamped = df.select(corrections.setto_threshold(F.col("v"), 100.0, "max").alias("c")).toPandas()
    assert clamped["c"].max() == 100.0
    wd = df.select(corrections.wind_direction_offset(F.lit(350.0), 20.0).alias("w")).toPandas()
    assert (wd["w"] == 10.0).all()
    ev = df.select(corrections.event_flag(
        F.col("ts"), [("2024-01-01 05:00", "2024-01-01 08:00")]).alias("e")).toPandas()
    assert ev["e"].sum() == 4


def test_sanitizer_pipeline(spark):
    # 30-min END-convention series with dupes (keep-last), a gap, unsorted
    ts = pd.date_range("2024-01-01 00:30", periods=20, freq="30min")
    pdf = pd.DataFrame({"TIMESTAMP_END": ts, "v": np.arange(20.0)})
    pdf = pdf.drop(index=[5, 6])                      # 2-slot gap
    dup = pd.DataFrame({"TIMESTAMP_END": [ts[3]], "v": [999.0]})  # later dup wins
    pdf = pd.concat([pdf, dup]).sample(frac=1, random_state=1)    # shuffle
    pdf["_ord"] = range(len(pdf))
    df = spark.createDataFrame(pdf)

    out, freq = sanitizer.sanitize_timestamps(
        df, "TIMESTAMP_END", nominal_freq_seconds=1800,
        output_convention="middle", order_col="_ord",
    )
    assert freq.freq_seconds == 1800 and freq.confidence > 0.5
    res = out.orderBy("TIMESTAMP_MIDDLE").toPandas()
    assert len(res) == 20                              # continuous grid
    assert res["v"].isna().sum() == 2                  # gap materialized
    assert (res.loc[res["v"].notna(), "v"] == 999.0).sum() == 1  # keep-last
    # middle convention: shifted back 15 min
    assert res["TIMESTAMP_MIDDLE"].iloc[0] == pd.Timestamp("2024-01-01 00:15")

    with pytest.raises(sanitizer.TimestampError, match="nominal"):
        sanitizer.sanitize_timestamps(df, "TIMESTAMP_END", nominal_freq_seconds=60,
                                      order_col="_ord")
    with pytest.raises(sanitizer.TimestampError, match="timestamp column"):
        sanitizer.sanitize_timestamps(df.withColumnRenamed("TIMESTAMP_END", "ts"), "ts")


def test_csv_filetype_roundtrip(spark, tmp_path):
    # diive-format CSV: 2 header rows (names + units), NA sentinels
    p = str(tmp_path / "data.csv")
    with open(p, "w") as f:
        f.write("TIMESTAMP_MIDDLE,TA,SW_IN\n")  # DIIVE dialect: middle ts
        f.write("-,degC,W m-2\n")
        for i in range(48):
            ts = pd.Timestamp("2024-01-01") + pd.Timedelta(minutes=30 * (i + 1))
            ta = "-9999" if i == 10 else f"{15 + i * 0.1:.2f}"
            f.write(f"{ts},{ta},{i * 2}\n")
    df, meta = csvsrc.read_filetype(spark, p, "DIIVE-CSV-30MIN")
    assert meta["units"]["TA"] == "degC"
    pdf = df.toPandas()
    assert len(pdf) == 48
    assert pdf["TA"].isna().sum() == 1  # -9999 -> null
    out, freq = sanitizer.sanitize_timestamps(
        df.withColumn("_ord", F.monotonically_increasing_id()),
        "TIMESTAMP_MIDDLE", nominal_freq_seconds=1800, order_col="_ord",
    )
    assert freq.freq_seconds == 1800


def test_read_many_keep_last(spark, tmp_path):
    # overlapping files: later file wins on duplicate timestamps
    for fi, (start, base) in enumerate([(0, 100.0), (24, 200.0)]):
        p = str(tmp_path / f"f{fi}.csv")
        with open(p, "w") as f:
            f.write("TIMESTAMP_END,TA\n")
            for i in range(36):
                ts = pd.Timestamp("2024-01-01") + pd.Timedelta(minutes=30 * (start + i + 1))
                f.write(f"{ts},{base + i}\n")
    merged = csvsrc.read_many(
        spark, [str(tmp_path / "f0.csv"), str(tmp_path / "f1.csv")],
        "GENERIC-CSV-HEADER-1ROW-TS-END-1MIN",
    ).toPandas()
    assert len(merged) == 60  # 36 + 36 - 12 overlap
    overlap = merged[(merged["TA"] >= 200) & (merged["TA"] < 212)]
    assert len(overlap) == 12  # later file won the overlap


def test_detect_frequency_confidence_uses_all_deltas(spark):
    # review regression: confidence denominator must cover ALL deltas, not
    # just the top-5 groups — irregular series must fail the >50% gate
    ts = [pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=60 * i) for i in range(11)]
    cur = ts[-1]
    for i in range(40):  # 40 distinct irregular deltas
        cur = cur + pd.Timedelta(seconds=61 + i)
        ts.append(cur)
    df = spark.createDataFrame(pd.DataFrame({"TIMESTAMP_END": ts, "v": 1.0}))
    freq = sanitizer.detect_frequency(df, "TIMESTAMP_END")
    assert freq.freq_seconds == 60
    assert freq.confidence < 0.5  # 10 of 50 deltas
    with pytest.raises(sanitizer.TimestampError, match="irregular"):
        sanitizer.sanitize_timestamps(df, "TIMESTAMP_END")


def test_measurement_offset_from_replicate(spark):
    pdf = pd.DataFrame({
        "main": [10.5, 11.5, 12.5, None, 14.5],
        "rep": [10.0, 11.0, 12.0, 13.0, None],
    })
    out = corrections.measurement_offset_from_replicate(
        spark.createDataFrame(pdf), "main", "rep"
    ).toPandas()
    # offset = median(main - rep over shared rows) = 0.5
    np.testing.assert_allclose(
        out["main_corrected"].dropna().sort_values(), [10.0, 11.0, 12.0, 14.0]
    )
