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


# ---------------------------------------------------------------------------
# file discovery + remaining dialects + FileSplitter round-trip
# ---------------------------------------------------------------------------

EXAMPLES = "/root/reference/diive/configs/exampledata"


def test_search_files_and_folders(spark, tmp_path):
    from diive_spark.sources import discovery

    (tmp_path / "a" / "b").mkdir(parents=True)
    (tmp_path / "a" / "x.csv").write_text("h\n1\n")
    (tmp_path / "a" / "b" / "y.csv").write_text("h\n2\n")
    (tmp_path / "a" / "b" / "z.dat").write_text("h\n3\n")
    files = discovery.search_files(spark, str(tmp_path), "*.csv")
    assert [f.rsplit("/", 1)[1] for f in files] == ["y.csv", "x.csv"] or \
           sorted(f.rsplit("/", 1)[1] for f in files) == ["x.csv", "y.csv"]
    assert len(files) == 2 and all(f.endswith(".csv") for f in files)
    # pattern * finds everything; sorted like the reference
    assert len(discovery.search_files(spark, str(tmp_path), "*")) == 3
    folders = discovery.search_folders(spark, str(tmp_path))
    names = [f.rstrip("/").rsplit("/", 1)[1] for f in folders]
    assert {"a", "b"} <= set(names)
    # nonexistent dir: empty, no crash (reference os.walk behavior)
    assert discovery.search_files(spark, str(tmp_path / "nope"), "*") == []
    # discovery -> read_many end-to-end (the reference's ingest idiom,
    # filereader.py:629)
    got = discovery.search_files(spark, str(tmp_path / "a"), "x.csv")
    assert len(got) == 1


def test_bico_gz_dialect_three_row_header(spark):
    """ETH-SONICREAD-BICO-CSVGZ-20HZ: 3-row header (names / units / ignored),
    gzip, no timestamp — on the reference's own bundled 20Hz file."""
    p = f"{EXAMPLES}/exampledata_ETH-SONICREAD-BICO-CSVGZ-20HZ_CH-FRU_202307071300.csv.gz"
    df, meta = csvsrc.read_filetype(spark, p, "ETH-SONICREAD-BICO-CSVGZ-20HZ")
    assert "U_[R350-B]" in df.columns
    assert meta["units"]["U_[R350-B]"] == "[m+1_s-1]"
    pdf = df.limit(5).toPandas()
    assert pdf["U_[R350-B]"].dtype == float
    # timestamp reconstruction from the filename pattern (yyyyMMddHHmm)
    ts = csvsrc.create_timestamp_from_file_start(
        df, r"_(\d{12})\.csv", "yyyyMMddHHmm", nominal_freq_ms=50
    ).limit(3).toPandas()
    assert str(ts["TIMESTAMP_END"].iloc[0]).startswith("2023-07-07 13:00:00")


def test_generic_ns_20hz_dialect(spark):
    """GENERIC-CSV-HEADER-1ROW-TS-MIDDLE-FULL-NS-20HZ: positional timestamp
    column 0 with fractional seconds — reference bundled file."""
    p = (f"{EXAMPLES}/exampledata_GENERIC-CSV-HEADER-1ROW-TS-MIDDLE-FULL-NS-20HZ"
         "_CH-DAS_202305130830_30MIN-SPLIT_TR.csv")
    df, _ = csvsrc.read_filetype(spark, p, "GENERIC-CSV-HEADER-1ROW-TS-MIDDLE-FULL-NS-20HZ")
    pdf = df.limit(4).toPandas()
    assert str(pdf.columns[0]) == "TIMESTAMP"
    assert pdf["TIMESTAMP"].notna().all()
    # 50ms resolution preserved (third record is at +0.050s)
    assert pdf["TIMESTAMP"].iloc[2].microsecond == 50000
    # every reference YAML dialect is registered (plus engine extras)
    import os
    ref = {f[:-4] for f in os.listdir("/root/reference/diive/configs/filetypes")
           if f.endswith(".yml")}
    assert ref <= set(csvsrc.FILETYPES)


def test_split_write_roundtrip(spark, tmp_path):
    """FileSplitter: time-range splits, bounded file sizes, lossless."""
    import glob

    pdf = pd.DataFrame({
        "TIMESTAMP_END": pd.date_range("2024-01-01", periods=2000, freq="50ms"),
        "U": np.arange(2000.0),
    })
    df = spark.createDataFrame(pdf)
    out = str(tmp_path / "splits")
    csvsrc.split_write(df, out, "TIMESTAMP_END", n_ranges=4, max_records_per_file=300)
    files = glob.glob(f"{out}/*.parquet")
    assert len(files) >= 7  # 2000 rows / 300 per file
    back = spark.read.parquet(out)
    assert back.count() == 2000
    # each file covers a contiguous time range (range partitioning)
    per_file = (
        back.withColumn("_f", F.input_file_name())
        .groupBy("_f").agg(F.min("U").alias("lo"), F.max("U").alias("hi"),
                           F.count("*").alias("n"))
        .toPandas().sort_values("lo")
    )
    assert (per_file["n"] <= 300).all()
    assert (per_file["hi"] - per_file["lo"] + 1 == per_file["n"]).all()


def test_fluxnet_timestamp_format(spark):
    """FLUXNET yyyyMMddHHmm round-trip (times.py:485-512): format then
    re-parse is the identity on minute-resolution timestamps."""
    ts = pd.date_range("2023-12-31 22:30", periods=8, freq="30min")
    df = spark.createDataFrame(pd.DataFrame({"ts": ts}))
    out = df.select(
        timeparts.format_timestamp_fluxnet(F.col("ts")).alias("fx"),
        F.to_timestamp(timeparts.format_timestamp_fluxnet(F.col("ts")),
                       "yyyyMMddHHmm").alias("back"),
        "ts",
    ).toPandas()
    assert list(out["fx"][:2]) == ["202312312230", "202312312300"]
    assert (out["back"] == out["ts"]).all()  # year/day rollover exact


def test_detect_frequency_three_method_vote(spark):
    """DetectFrequency vote (times.py:348-482): perfectly regular -> all
    methods agree (1.0); gappy-but-dominant -> timedelta with mode fraction;
    regular ends around an irregular middle -> start_end_chunks at 0.70."""
    def mk(ts_list):
        return spark.createDataFrame(pd.DataFrame({"TIMESTAMP_END": ts_list}))

    regular = pd.date_range("2024-01-01", periods=50, freq="30min")
    r = sanitizer.detect_frequency(mk(list(regular)), "TIMESTAMP_END")
    assert (r.freq_seconds, r.confidence, r.detection_method) == (
        1800, 1.0, "all_methods_agree")

    gappy = list(regular[:20]) + list(regular[25:])  # 5-slot hole
    g = sanitizer.detect_frequency(mk(gappy), "TIMESTAMP_END")
    assert g.freq_seconds == 1800 and g.detection_method == "timedelta"
    assert 0.9 < g.confidence < 1.0  # mode fraction, not full certainty

    # irregular middle dominating the delta histogram, regular 5-row ends:
    # mode fraction <= 0.5 but first/last chunks agree -> progressive wins
    mid = [pd.Timestamp("2024-01-01 03:00") + pd.Timedelta(seconds=int(s))
           for s in np.cumsum(np.arange(100, 100 + 17 * 60, 60))]
    ends = list(pd.date_range("2024-01-01", periods=5, freq="10s")) + mid + \
        list(pd.date_range("2024-01-02", periods=5, freq="10s"))
    p = sanitizer.detect_frequency(mk(ends), "TIMESTAMP_END")
    assert p.detection_method in ("start_end_chunks", "timedelta")
    if p.detection_method == "start_end_chunks":
        assert (p.freq_seconds, p.confidence) == (10, 0.70)


def test_to_diive_format_flatten_and_export_roundtrip(spark, tmp_path):
    """to_diive_format (files.py:18): two-level NAME::UNITS columns flatten
    to the top level with units captured; save_diive_csv -> read_filetype
    round-trips values and units."""
    ts = pd.date_range("2024-01-01 00:15", periods=10, freq="30min")
    pdf = pd.DataFrame({
        "ts::-": ts, "TA::degC": np.arange(10.0), "SW_IN::W m-2": np.arange(10.0) * 2,
    })
    df = spark.createDataFrame(pdf)
    out, units = sanitizer.to_diive_format(df, "ts::-",
                                           timestamp_name="TIMESTAMP_MIDDLE")
    assert set(out.columns) == {"TIMESTAMP_MIDDLE", "TA", "SW_IN"}
    assert units == {"ts": "-", "TA": "degC", "SW_IN": "W m-2"}
    with pytest.raises(sanitizer.TimestampError):
        sanitizer.to_diive_format(df, "ts::-", timestamp_name="NOT_A_NAME")

    p = str(tmp_path / "export.diive.csv")
    csvsrc.save_diive_csv(out, p, "TIMESTAMP_MIDDLE",
                          units={"TA": "degC", "SW_IN": "W m-2"})
    back, meta = csvsrc.read_filetype(spark, p, "DIIVE-CSV-30MIN")
    assert meta["units"]["TA"] == "degC"
    got = back.orderBy("TIMESTAMP_MIDDLE").toPandas()
    assert len(got) == 10
    np.testing.assert_allclose(got["TA"], np.arange(10.0))
    assert pd.DatetimeIndex(got["TIMESTAMP_MIDDLE"]).equals(pd.DatetimeIndex(ts))


def test_classify_variable_matches_reference_rules(spark):
    from diive_spark.functions import classification as cl

    cases = {
        "NEE_CUT_REF_f": ("NEE", "carbon"),
        "LE_f": ("LE", "water"),
        "FC": ("FC", "carbon"),
        "FC_1": ("FC", "carbon"),
        "FCH4_x": ("FCH4", "carbon"),
        "TA": ("TA", "meteo"),
        "Tair_f": ("TA", "meteo"),
        "VPD_hPa": ("VPD", "meteo"),
        "SWC_0.05": ("SWC", "soil"),
        "PPFD": ("PPFD", "radiation"),
    }
    for name, (kind, cat) in cases.items():
        got = cl.classify_variable(name)
        assert got == (kind, cat), name
    # non-matches: TA prefix must not catch TARGET/TAU
    assert cl.classify_variable("TARGET") is None
    assert cl.classify_variable("TAU") is None
    assert cl.classify_variable("unknown") is None
    # column-expression form agrees
    import pandas as pd
    df = spark.createDataFrame(pd.DataFrame({"name": list(cases) + ["TARGET", "TAU"]}))
    out = df.select("name", cl.classify_variable_expr(F.col("name")).alias("c")).toPandas()
    for _, r in out.iterrows():
        exp = cl.classify_variable(r["name"])
        if exp is None:
            assert r["c"] is None
        else:
            assert (r["c"]["kind"], r["c"]["category"]) == tuple(exp)


def test_timestampless_dialect_keeps_all_na_records(spark, tmp_path):
    """Review regression: an all-NA-sentinel data record in a timestamp-less
    20Hz file must SURVIVE the header drop — removing it would shift every
    subsequent reconstructed timestamp by one slot."""
    p = str(tmp_path / "mercury_20240101-0000.csv")
    with open(p, "w") as f:
        f.write("U,V,W\n")                 # header (garbage under cast)
        f.write("1.0,2.0,3.0\n")
        f.write("-9999,-9999,-9999\n")     # sensor dropout: all NA sentinels
        f.write("4.0,5.0,6.0\n")
    df, _ = csvsrc.read_filetype(spark, p, "ETH-MERCURY-CSV-20HZ")
    assert df.count() == 3  # dropout record kept as an all-null row
    ts = csvsrc.create_timestamp_from_file_start(
        df, r"_(\d{8}-\d{4})\.csv", "yyyyMMdd-HHmm", nominal_freq_ms=50
    ).orderBy("TIMESTAMP_END").toPandas()
    # third record sits at +100ms, NOT +50ms (the dropout held its slot)
    assert ts["TIMESTAMP_END"].iloc[2] == pd.Timestamp("2024-01-01 00:00:00.100")
    assert ts["U"].isna().iloc[1] and ts["U"].iloc[2] == 4.0
    # nominal_freq_ms is now a declared field on every dialect
    assert csvsrc.FILETYPES["ETH-MERCURY-CSV-20HZ"].nominal_freq_ms == 50
    assert csvsrc.FILETYPES["DIIVE-CSV-30MIN"].nominal_freq_ms is None


def test_timestampless_plain_csv_is_unsplittable(spark, tmp_path):
    """Positional timestamp reconstruction requires in-file row ORDER; plain
    CSV is splittable, and Spark does not scan splits in byte-offset order.
    The timestamp-less reader must therefore force ONE task per file
    (multiLine read) — verified by shrinking maxPartitionBytes far below the
    file size and checking the scan still produces a single partition with
    correct per-slot timestamps."""
    p = str(tmp_path / "mercury_20240101-0000.csv")
    n = 5000
    with open(p, "w") as f:
        f.write("U,V,W\n")
        for i in range(n):
            f.write(f"{i}.0,1.0,2.0\n")
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "4096")
    try:
        df, _ = csvsrc.read_filetype(spark, p, "ETH-MERCURY-CSV-20HZ")
        assert df.rdd.getNumPartitions() == 1  # unsplittable read
        ts = csvsrc.create_timestamp_from_file_start(
            df, r"_(\d{8}-\d{4})\.csv", "yyyyMMdd-HHmm", nominal_freq_ms=50
        ).orderBy("TIMESTAMP_END").toPandas()
        assert len(ts) == n
        # row k carries value k.0 at slot k*50ms — order survived the read
        assert ts["U"].iloc[0] == 0.0 and ts["U"].iloc[n - 1] == float(n - 1)
        assert ts["TIMESTAMP_END"].iloc[1000] == pd.Timestamp(
            "2024-01-01 00:00:00"
        ) + pd.Timedelta(milliseconds=50 * 1000)
        # a timestamped dialect keeps the default splittable scan
        p2 = str(tmp_path / "generic.csv")
        with open(p2, "w") as f:
            f.write("TIMESTAMP_END,V\n")
            for i in range(2000):
                f.write(f"2024-01-01 00:{i // 60 % 60:02d}:{i % 60:02d},1.0\n")
        df2, _ = csvsrc.read_filetype(spark, p2, "GENERIC-CSV-HEADER-1ROW-TS-END-1MIN")
        assert df2.rdd.getNumPartitions() > 1
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)


def test_table_adapter_dispatch_and_retention(spark, tmp_path):
    """Iceberg seam (sources/table.py): identifier vs path dispatch, tier
    write to the canonical parquet layout, and the retention tick. The
    Iceberg branch itself needs runtime jars absent here — its failure mode
    is the documented config message (asserted)."""
    import pandas as pd
    from diive_spark.sources import table as tbl

    assert tbl.is_table_identifier("tiers.rollup_1m")
    assert tbl.is_table_identifier("rollup_1m")
    assert not tbl.is_table_identifier("/data/rollup_1m")
    assert not tbl.is_table_identifier("out.parquet")
    # explicit schemes and existing local dirs are paths, not identifiers
    assert not tbl.is_table_identifier("s3a:bucket")
    existing = tmp_path / "tier_1m_out"
    existing.mkdir()
    import os as _os0
    cwd0 = _os0.getcwd()
    _os0.chdir(tmp_path)
    try:
        import warnings as _w
        with _w.catch_warnings(record=True) as caught:
            _w.simplefilter("always")
            assert not tbl.is_table_identifier("tier_1m_out")
        # the CWD-dependent flip is announced, and explicit prefixes pin it
        assert any("table:" in str(c.message) for c in caught)
        assert tbl.resolve_source("table:tier_1m_out") == (True, "tier_1m_out")
        assert tbl.resolve_source("path:some_table") == (False, "some_table")
    finally:
        _os0.chdir(cwd0)

    n = 96
    pdf = pd.DataFrame({
        "window_start": pd.date_range("2024-01-01", periods=n, freq="1h"),
        "v": range(n),
    })
    df = spark.createDataFrame(pdf)
    path = str(tmp_path / "tier")
    tbl.write_tier_table(df, path, "window_start")
    back = tbl.read_table(spark, path)
    assert back.count() == n
    assert "event_date" in back.columns  # date-pruned layout

    # catalog path: register via the session catalog and read as identifier
    df.write.mode("overwrite").saveAsTable("t_adapter_check")
    assert tbl.read_table(spark, "t_adapter_check").count() == n
    spark.sql("DROP TABLE t_adapter_check")

    # time travel demands a catalog table
    import pytest as _pt
    with _pt.raises(ValueError, match="catalog"):
        tbl.read_table(spark, path, snapshot_id=1)

    # retention tick on the parquet layout: drop the first 2 days
    tbl.expire_tier_before(spark, path, "window_start", "2024-01-03 00:00:00")
    kept = spark.read.parquet(path)
    assert kept.count() == n - 48
    assert kept.agg({"window_start": "min"}).collect()[0][0] >= pd.Timestamp(
        "2024-01-03")
    # swap-based rewrite: canonical layout restored, no temp dirs left
    import os as _os
    assert "event_date=2024-01-03" in set(_os.listdir(path))
    assert not _os.path.exists(path + "._retention_tmp")
    assert not _os.path.exists(path + "._retention_old")

    # Iceberg identifier write without the runtime: documented config error
    with _pt.raises(RuntimeError, match="Iceberg catalog"):
        tbl.write_tier_table(df, "tiers.rollup_1m", "window_start")

    # retention DELETE validates its interpolated pieces up front
    with _pt.raises(ValueError, match="not a timestamp"):
        tbl.expire_tier_before(spark, "tiers.rollup_1m", "window_start",
                               "1'; DROP TABLE x--")
    with _pt.raises(ValueError, match="identifier"):
        tbl.expire_tier_before(spark, "tiers.rollup_1m", "ts; DROP",
                               "2024-01-01")
    with _pt.raises(ValueError, match="identifier"):
        tbl.expire_tier_before(spark, "tiers.`x`; DROP", "window_start",
                               "2024-01-01")
