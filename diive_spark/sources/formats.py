"""FLUXNET / meteo format exporters — the end-of-pipeline column contracts.

References:
- /root/reference/diive/io/formats/fluxnet.py
  (``FormatEddyProFluxnetFileForUpload``): subset the FLUXNET-shareable
  variables, set missing values to the ``-9999`` sentinel, add the
  ``_1_1_1`` suffix to variables that lack a FLUXNET position suffix,
  insert TIMESTAMP_START/TIMESTAMP_END columns in the compressed
  ``YYYYMMDDhhmm`` format, and write one CSV per year named
  ``{site}_{year}_fluxes_meteo.csv``.
- /root/reference/diive/io/formats/meteo.py
  (``FormatMeteoForFluxnetUpload`` / ``FormatMeteoForEddyProFluxProcessing``):
  the same upload layout for meteo data, and the EddyPro input layout with
  TIMESTAMP_1 (yyyy-mm-dd) / TIMESTAMP_2 (HH:MM) date/time split columns
  and a two-row name/units header.

Engine shapes: every step is a projection (rename, coalesce-sentinel,
date_format) — pure JVM, no shuffle. The yearly writer repartitions by
year so each year is exactly one task/file, then renames the part files to
the reference's naming contract with Hadoop FS metadata ops.

Timestamp sanitation (regular grid, convention normalization) is the
sanitizer's job (sources/sanitizer.py) — run it first, as the reference
runs TimestampSanitizer before formatting.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from diive_spark.functions.timeparts import (format_timestamp_fluxnet,
                                             insert_timestamp_columns)

MISSING_SENTINEL = -9999

#: FLUXNET-shareable variable groups (fluxnet.py:25-33)
VARS_CO2 = ["FC", "FC_SSITC_TEST", "SC_SINGLE", "CO2"]
VARS_H2O = ["LE", "LE_SSITC_TEST", "SLE_SINGLE", "H2O"]
VARS_H = ["H", "H_SSITC_TEST", "SH_SINGLE"]
VARS_N2O = ["FN2O", "FN2O_SSITC_TEST", "SN2O_SINGLE", "N2O"]
VARS_CH4 = ["FCH4", "FCH4_SSITC_TEST", "SCH4_SINGLE", "CH4"]
VARS_WIND = ["USTAR", "WD", "WS", "FETCH_70", "FETCH_90", "FETCH_MAX"]
VARS_METEO = ["SW_IN_1_1_1", "TA_1_1_1", "RH_1_1_1", "PA_1_1_1",
              "LW_IN_1_1_1", "PPFD_IN_1_1_1", "G_1_1_1", "NETRAD_1_1_1",
              "TS_1_1_1", "P_1_1_1", "SWC_1_1_1"]
VARIABLES = (VARS_CO2 + VARS_H2O + VARS_H + VARS_N2O + VARS_CH4
             + VARS_WIND + VARS_METEO)

_SUFFIX_RE = re.compile(r".*_[0-9]_[0-9]_[0-9]$")


def required_vars(use_co2=True, use_h2o=True, use_h=True, use_n2o=False,
                  use_ch4=False, use_wind=True, use_meteo=True) -> list[str]:
    """The reference's ``_create_list_req_vars`` (fluxnet.py:162-188)."""
    req = []
    if use_co2:
        req += VARS_CO2
    if use_h2o:
        req += VARS_H2O
    if use_h:
        req += VARS_H
    if use_n2o:
        req += VARS_N2O
    if use_ch4:
        req += VARS_CH4
    if use_wind:
        req += VARS_WIND
    if use_meteo:
        req += VARS_METEO
    if not req:
        raise ValueError("No required variables selected.")
    return req


def _fluxnet_suffix(name: str) -> str:
    """Add ``_1_1_1`` unless the name already carries a position suffix
    (fluxnet.py:290-308 ``_rename_add_suffix``)."""
    return name if _SUFFIX_RE.match(name) else f"{name}_1_1_1"


def _sentinel_fill(df: DataFrame, cols: list[str]) -> DataFrame:
    """``fillna(-9999)`` on numeric columns (fluxnet.py:275-279)."""
    numeric = {f.name for f in df.schema.fields
               if f.dataType.typeName() in
               ("double", "float", "integer", "long", "short", "decimal")}
    return df.select(*[
        F.coalesce(F.col(c), F.lit(MISSING_SENTINEL)).alias(c)
        if c in cols and c in numeric else F.col(c)
        for c in df.columns
    ])


def fluxnet_upload_format(
    df: DataFrame, ts_col: str, freq_seconds: int,
    convention: str = "middle", drop_empty: bool = True,
    use_co2=True, use_h2o=True, use_h=True, use_n2o=False,
    use_ch4=False, use_wind=True, use_meteo=True,
) -> DataFrame:
    """FLUXNET data-sharing layout (``apply_fluxnet_format``,
    fluxnet.py:241-252): subset → −9999 sentinel → ``_1_1_1`` suffix →
    TIMESTAMP_START/TIMESTAMP_END (YYYYMMDDhhmm strings) first.

    ``convention`` says what the input ``ts_col`` denotes (start/middle/
    end of the averaging interval). ``drop_empty`` removes all-null
    variables first (the reference's ``dropna(how='all', axis=1)``) —
    one cheap count aggregate."""
    req = required_vars(use_co2, use_h2o, use_h, use_n2o, use_ch4,
                        use_wind, use_meteo)
    present = [c for c in req if c in df.columns]
    if drop_empty and present:
        counts = df.agg(*[F.count(c).alias(c) for c in present]).first()
        present = [c for c in present if counts[c] > 0]
    out = df.select(ts_col, *present)
    out = insert_timestamp_columns(out, ts_col, freq_seconds,
                                   convention=convention)
    out = out.select(
        format_timestamp_fluxnet(F.col("TIMESTAMP_START"))
        .alias("TIMESTAMP_START"),
        format_timestamp_fluxnet(F.col("TIMESTAMP_END"))
        .alias("TIMESTAMP_END"),
        *[F.col(c).alias(_fluxnet_suffix(c)) for c in present])
    return _sentinel_fill(out, [_fluxnet_suffix(c) for c in present])


def meteo_fluxnet_upload_format(
    df: DataFrame, ts_col: str, freq_seconds: int, cols: dict[str, str],
    convention: str = "middle",
) -> DataFrame:
    """Meteo FLUXNET upload layout (meteo.py:91-168
    ``FormatMeteoForFluxnetUpload``): TIMESTAMP_START/END (YYYYMMDDhhmm)
    first, −9999 sentinel, then the ``{old: new}`` renaming."""
    keep = [c for c in df.columns if c != ts_col]
    out = insert_timestamp_columns(df, ts_col, freq_seconds,
                                   convention=convention)
    out = out.select(
        format_timestamp_fluxnet(F.col("TIMESTAMP_START"))
        .alias("TIMESTAMP_START"),
        format_timestamp_fluxnet(F.col("TIMESTAMP_END"))
        .alias("TIMESTAMP_END"),
        *[F.col(c).alias(cols.get(c, c)) for c in keep])
    return _sentinel_fill(out, [cols.get(c, c) for c in keep])


def meteo_eddypro_format(
    df: DataFrame, ts_col: str, cols: dict[str, tuple[str, str]],
) -> tuple[DataFrame, list[str]]:
    """EddyPro flux-processing input layout (meteo.py:21-89
    ``FormatMeteoForEddyProFluxProcessing``): TIMESTAMP_1 (yyyy-MM-dd) and
    TIMESTAMP_2 (HH:mm) split columns first, −9999 sentinel, renamed
    variables. ``cols`` maps ``{old: (new, unit)}``; returns
    (DataFrame, units_row) — the reference stores units in a pandas
    MultiIndex header, which the CSV writer emits as the second header
    line (``save_two_row_header_csv``)."""
    keep = [c for c in df.columns if c != ts_col]
    out = df.select(
        F.date_format(ts_col, "yyyy-MM-dd").alias("TIMESTAMP_1"),
        F.date_format(ts_col, "HH:mm").alias("TIMESTAMP_2"),
        *[F.col(c).alias(cols.get(c, (c, "-"))[0]) for c in keep])
    out = _sentinel_fill(out, [cols.get(c, (c, "-"))[0] for c in keep])
    units = ["yyyy-mm-dd", "HH:MM"] + [cols.get(c, (c, "-"))[1]
                                       for c in keep]
    return out, units


def _fs(spark, path: str):
    sc = spark.sparkContext
    hpath = sc._jvm.org.apache.hadoop.fs.Path(path)
    return sc._jvm.org.apache.hadoop.fs.Path, \
        hpath.getFileSystem(sc._jsc.hadoopConfiguration())


def save_yearly_csv(df: DataFrame, outdir: str, site: str,
                    year_from_col: str = "TIMESTAMP_START") -> list[str]:
    """One CSV per year named ``{site}_{year}_fluxes_meteo.csv``
    (fluxnet.py:261-273 / meteo.py:129-141). Each year is one shuffle
    partition → one part file, renamed to the contract name with Hadoop
    FS metadata ops. Returns the written paths."""
    spark = df.sparkSession
    year = F.substring(F.col(year_from_col).cast("string"), 1, 4)
    staged = outdir.rstrip("/") + "._yearly_tmp"
    (df.withColumn("_year", year)
       .repartition("_year")
       .sortWithinPartitions(year_from_col)
       .write.mode("overwrite").partitionBy("_year")
       .option("header", True).csv(staged))
    Path, fs = _fs(spark, staged)
    outs = []
    if not fs.exists(Path(outdir)):
        fs.mkdirs(Path(outdir))
    for status in fs.listStatus(Path(staged)):
        name = status.getPath().getName()
        if not name.startswith("_year="):
            continue
        yr = name.split("=", 1)[1]
        parts = [s.getPath() for s in fs.listStatus(status.getPath())
                 if s.getPath().getName().startswith("part-")]
        target = f"{outdir.rstrip('/')}/{site}_{yr}_fluxes_meteo.csv"
        if fs.exists(Path(target)):
            fs.delete(Path(target), False)
        # repartition("_year") gives one part per year; keep a loud check
        if len(parts) != 1:
            raise RuntimeError(f"expected one part file for {yr}, "
                               f"got {len(parts)}")
        fs.rename(parts[0], Path(target))
        outs.append(target)
    fs.delete(Path(staged), True)
    return sorted(outs)


def save_two_row_header_csv(df: DataFrame, units: list[str],
                            path: str) -> None:
    """Write a CSV with the EddyPro two-row name/units header. The body
    streams through a single-partition text write (EddyPro input files
    are per-site bounded); the units row is spliced in with FS ops."""
    spark = df.sparkSession
    staged = path.rstrip("/") + "._hdr_tmp"
    # headerless body; the two header lines (names, units) are prepended
    # below and the body is appended with a JVM-side stream copy
    df.coalesce(1).write.mode("overwrite").option("header", False).csv(staged)
    Path, fs = _fs(spark, staged)
    part = [s.getPath() for s in fs.listStatus(Path(staged))
            if s.getPath().getName().startswith("part-")][0]
    in_stream = fs.open(part)
    out_stream = fs.create(Path(path), True)
    try:
        out_stream.write((",".join(df.columns) + "\n").encode())
        out_stream.write((",".join(units) + "\n").encode())
        io_utils = spark.sparkContext._jvm.org.apache.hadoop.io.IOUtils
        io_utils.copyBytes(in_stream, out_stream, 1 << 16, False)
    finally:
        in_stream.close()
        out_stream.close()
    fs.delete(Path(staged), True)
