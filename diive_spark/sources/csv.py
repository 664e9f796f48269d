"""CSV ingest: filetype-config registry + multi-file merge.

Reference: 16 YAML file dialects (/root/reference/diive/configs/filetypes/*.yml,
validated in diive/core/io/filereader.py:92-137) drive ``DataFileReader``
(filereader.py:394-620): multi-row headers, a units row, NA value lists,
gzip/zip compression, generated names for headerless columns.
``MultiDataFileReader`` (filereader.py:233) reads + merges many files with
keep-last duplicate resolution.

Spark mapping: each dialect is a ``spark.read.csv`` options dict plus
header-geometry metadata (how many header rows, which is names/units). Data
rows are read distributed with skipRows; header rows are parsed from the
file head only (driver-side, tiny).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from diive_spark.sources.sanitizer import dedup_keep_last


@dataclass
class FileType:
    """One CSV dialect (mirrors the reference YAML FILE/DATA/TIMESTAMP keys)."""
    name: str
    separator: str = ","
    skip_rows: int = 0            # rows before the header block
    header_rows: int = 1          # stacked header rows (names [+ units])
    units_row: int | None = None  # index within header block holding units
    na_values: tuple = ("-9999", "-6999", "-999", "nan", "NaN", "NAN", "NA",
                        "inf", "-inf", "-", "-9999.0")
    compression: str | None = None
    timestamp_col: str | None = "TIMESTAMP_END"
    timestamp_format: str | None = None
    nominal_freq_seconds: int | None = None
    timestamp_index: int | None = None  # position-based ts column (generic
    # NS dialects declare INDEX_COLUMN: [0] instead of a fixed name)
    nominal_freq_ms: int | None = None  # high-frequency dialects (20Hz = 50)


# Registry mirroring the reference dialect catalogue (SURVEY.md §2.1); the
# geometry/NA/compression fields are what each YAML declares.
FILETYPES = {
    ft.name: ft
    for ft in [
        FileType("DIIVE-CSV-30MIN", header_rows=2, units_row=1,
                 timestamp_col="TIMESTAMP_MIDDLE", nominal_freq_seconds=1800),
        FileType("EDDYPRO-FLUXNET-CSV-30MIN", nominal_freq_seconds=1800,
                 timestamp_format="yyyyMMddHHmm"),
        FileType("EDDYPRO-FLUXNET-CSV-60MIN", nominal_freq_seconds=3600,
                 timestamp_format="yyyyMMddHHmm"),
        FileType("EDDYPRO-FULL-OUTPUT-CSV-30MIN", skip_rows=1, header_rows=2,
                 units_row=1, nominal_freq_seconds=1800),
        FileType("FLUXNET-FULLSET-HH-CSV-30MIN", nominal_freq_seconds=1800,
                 timestamp_format="yyyyMMddHHmm"),
        FileType("FLUXNET-FULLSET-HR-CSV-60MIN", nominal_freq_seconds=3600),
        FileType("ICOS-H2R-CSVZIP-10S", compression="zip", nominal_freq_seconds=10),
        FileType("TOA5-DAT-1MIN", skip_rows=1, header_rows=3, units_row=1,
                 nominal_freq_seconds=60, timestamp_col="TIMESTAMP"),
        FileType("GENERIC-CSV-HEADER-1ROW-TS-END-1MIN", nominal_freq_seconds=60),
        FileType("GENERIC-CSV-HEADER-1ROW-TS-MIDDLE-30MIN",
                 timestamp_col="TIMESTAMP_MIDDLE", nominal_freq_seconds=1800),
        FileType("GENERIC-CSV-HEADER-1ROW-TS-MIDDLE-FULL-1MIN",
                 timestamp_col="TIMESTAMP_MIDDLE", nominal_freq_seconds=60),
        # timestamp-less 20Hz dialects (ETH-MERCURY-CSV-20HZ.yml,
        # ETH-SONICREAD-BICO-MOD-CSV-20HZ.yml): 1-row header, timestamps are
        # reconstructed from the file-start pattern + 50ms nominal rate
        FileType("ETH-MERCURY-CSV-20HZ", timestamp_col=None, nominal_freq_ms=50),
        FileType("ETH-SONICREAD-BICO-MOD-CSV-20HZ", timestamp_col=None,
                 nominal_freq_ms=50),
        # 3-row header (names, units, 1 ignored row), gzip, no timestamp
        # (ETH-SONICREAD-BICO-CSVGZ-20HZ.yml)
        FileType("ETH-SONICREAD-BICO-CSVGZ-20HZ", header_rows=3, units_row=1,
                 compression="gzip", timestamp_col=None, nominal_freq_ms=50),
        # nanosecond-resolution full timestamps in positional column 0
        # (GENERIC-CSV-HEADER-1ROW-TS-{END,MIDDLE}-FULL-NS-20HZ.yml)
        FileType("GENERIC-CSV-HEADER-1ROW-TS-END-FULL-NS-20HZ",
                 timestamp_col=None, timestamp_index=0, nominal_freq_ms=50),
        FileType("GENERIC-CSV-HEADER-1ROW-TS-MIDDLE-FULL-NS-20HZ",
                 timestamp_col=None, timestamp_index=0, nominal_freq_ms=50),
    ]
}


def _parse_header(spark: SparkSession, path: str, ft: FileType) -> tuple[list[str], dict]:
    """Read the header block (names + optional units row) from the file head.
    Driver-side but bounded: only skip_rows + header_rows lines."""
    head = spark.read.text(path).limit(ft.skip_rows + ft.header_rows).collect()
    lines = [r["value"] for r in head][ft.skip_rows:]
    names = [c.strip().strip('"') for c in lines[0].split(ft.separator)]
    units = {}
    if ft.units_row is not None and ft.units_row < len(lines):
        unit_vals = [c.strip().strip('"') for c in lines[ft.units_row].split(ft.separator)]
        units = dict(zip(names, unit_vals))
    # generated names for headerless columns (filereader.py contract)
    names = [n if n else f"col_{i}" for i, n in enumerate(names)]
    return names, units


def read_filetype(
    spark: SparkSession, path: str, filetype: str,
) -> tuple[DataFrame, dict]:
    """ReadFileType equivalent (filereader.py:336): returns (data_df,
    metadata) where metadata carries per-column units (the reference's
    second DataFrame, filereader.py:366-368)."""
    ft = FILETYPES[filetype]
    names, units = _parse_header(spark, path, ft)
    # Spark CSV has no skip-N-lines option; read everything untyped, then
    # drop header/units/malformed rows via try_to_timestamp (this doubles as
    # the sanitizer's drop-NaT step, times.py:263-345 step 3).
    reader = spark.read.option("sep", ft.separator).option("header", False)
    timestamp_less = ft.timestamp_col is None and ft.timestamp_index is None
    if timestamp_less:
        # rows in these dialects are identified purely by in-file POSITION
        # (the 20Hz timestamp reconstruction depends on it). A splittable
        # read lets Spark plan a file's splits in size-sorted — not byte
        # offset — order, which would silently shift every reconstructed
        # timestamp. multiLine makes CSV non-splittable: exactly one
        # sequential task per file, so the positional window sees file
        # order. (gzip inputs were already unsplittable; this extends the
        # guarantee to plain-CSV 20Hz dialects.)
        reader = reader.option("multiLine", True)
    df = reader.csv(path)
    # reconcile header/data column counts (frames.py:166 contract)
    data_cols = df.columns
    if len(names) < len(data_cols):
        names += [f"col_{i}" for i in range(len(names), len(data_cols))]
    df = df.toDF(*names[: len(data_cols)])
    ft_ts_col = ft.timestamp_col
    if ft_ts_col is None and ft.timestamp_index is not None:
        ft_ts_col = df.columns[ft.timestamp_index]
    has_ts = ft_ts_col is not None and ft_ts_col in df.columns
    if has_ts:
        fmt = ft.timestamp_format
        ts = (
            F.try_to_timestamp(F.col(f"`{ft_ts_col}`"), F.lit(fmt))
            if fmt else F.try_to_timestamp(F.col(f"`{ft_ts_col}`"))
        )
        df = df.withColumn(ft_ts_col, ts).filter(ts.isNotNull())
    if not has_ts:
        # no timestamp to key the header-skip on. Drop EXACTLY the known
        # leading header-block rows per file (skip_rows + header_rows, by
        # in-file position — same order guarantee create_timestamp_from_
        # file_start relies on), NOT rows that look empty: a genuine all-NA
        # sensor-dropout record must keep its slot or every subsequent
        # reconstructed 20Hz timestamp shifts. A content rule stays as a
        # second guard against stray mid-file text lines.
        from pyspark.sql import Window

        # _file/_pos are RETAINED: input_file_name() is only valid before a
        # shuffle, and the positional window IS a shuffle — downstream
        # timestamp reconstruction (create_timestamp_from_file_start) reuses
        # these columns instead of re-tagging, and drops them.
        n_head = ft.skip_rows + ft.header_rows
        wpos = Window.partitionBy("_file").orderBy("_mid")
        df = (
            df.withColumn("_file", F.input_file_name())
            .withColumn("_mid", F.monotonically_increasing_id())
            .withColumn("_pos", F.row_number().over(wpos))
            .filter(F.col("_pos") > n_head)
            .drop("_mid")
        )
        garbage = None
        for c in df.columns:
            if c in ("_file", "_pos"):
                continue
            qc = F.col(f"`{c}`")
            g = qc.isNotNull() & ~qc.isin(*ft.na_values) & qc.try_cast("double").isNull()
            garbage = g if garbage is None else (garbage | g)
        df = df.filter(~garbage)
    # NA sentinels -> null, then coerce value columns numeric — the reference
    # 'all-float64' data model (convert_data_to_numeric, frames.py:361)
    for c in df.columns:
        if c == ft_ts_col or c in ("_file", "_pos"):
            continue
        qc = F.col(f"`{c}`")  # backticks: raw names may contain dots
        cleaned = F.when(qc.isin(*ft.na_values), None).otherwise(qc)
        df = df.withColumn(c, cleaned.try_cast("double"))
    return df, {"units": units, "filetype": ft.name}


def read_many(
    spark: SparkSession, paths: list[str], filetype: str, ts_col: str | None = None,
) -> DataFrame:
    """MultiDataFileReader equivalent (filereader.py:233): union + keep-last
    duplicate-timestamp resolution (later files win, times.py:1409)."""
    ft = FILETYPES[filetype]
    ts_col = ts_col or ft.timestamp_col
    merged = None
    for i, p in enumerate(paths):
        df, _ = read_filetype(spark, p, filetype)
        df = df.withColumn("_src_order", F.lit(i))
        merged = df if merged is None else merged.unionByName(df, allowMissingColumns=True)
    return dedup_keep_last(merged, ts_col, "_src_order").drop("_src_order")


def split_write(
    df: DataFrame, out_path: str, ts_col: str,
    n_ranges: int = 32, max_records_per_file: int = 500_000,
) -> None:
    """FileSplitter equivalent (diive/core/io/filesplitter.py:19): split a
    high-frequency stream into regular time-ranged files —
    repartitionByRange + maxRecordsPerFile (the Spark-native splitter)."""
    (
        df.repartitionByRange(n_ranges, ts_col)
        .write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .parquet(out_path)
    )


def save_diive_csv(
    df: DataFrame, path: str, ts_col: str = "TIMESTAMP_MIDDLE",
    units: dict | None = None,
) -> None:
    """Export to the reference's .diive.csv format (DIIVE-CSV-30MIN dialect:
    names row, units row, data rows; see configs/exampledata/*.diive.csv).

    The reference writes ONE file via pandas — a driver-side operation by
    definition; here rows stream through toLocalIterator (bounded driver
    memory, one partition in flight). For bulk data use split_write/parquet;
    this is the interchange-format exporter."""
    import csv as _csv

    units = units or {}
    cols = [ts_col] + [c for c in df.columns if c != ts_col]
    ordered = df.select(*cols).orderBy(ts_col)
    with open(path, "w", newline="") as f:
        wr = _csv.writer(f)  # proper quoting: commas/newlines in string
        # values must not corrupt the dialect
        wr.writerow(cols)
        wr.writerow(["-" if c == ts_col else units.get(c, "-") for c in cols])
        for row in ordered.toLocalIterator():
            wr.writerow(["" if row[c] is None else row[c] for c in cols])


# ---------------------------------------------------------------------------
# high-frequency (20Hz) + zipped dialects
# ---------------------------------------------------------------------------

FILETYPES["ETH-RECORD-TOA5-CSVGZ-20HZ"] = FileType(
    "ETH-RECORD-TOA5-CSVGZ-20HZ", skip_rows=1, header_rows=3, units_row=1,
    compression="gzip", timestamp_col=None, nominal_freq_seconds=None,
    nominal_freq_ms=50,
)
FILETYPES["ICOS-H2R-CSVZIP-10S"] = FileType(
    "ICOS-H2R-CSVZIP-10S", header_rows=2, units_row=1, compression="zip",
    timestamp_col="TIMESTAMP", timestamp_format="yyyyMMddHHmmss",
    nominal_freq_seconds=10,
)


def create_timestamp_from_file_start(
    df: DataFrame,
    file_start_pattern: str = r"(\d{8}-\d{4})",
    file_start_format: str = "yyyyMMdd-HHmm",
    nominal_freq_ms: int = 50,
    ts_col: str = "TIMESTAMP_END",
) -> DataFrame:
    """Reconstruct per-record timestamps for high-frequency files that carry
    no timestamp column (create_timestamp / calc_true_resolution,
    /root/reference/diive/core/times/times.py:2027/1997): record i of a file
    gets file_start + i * nominal interval.

    Row order within a file is the gzip read order (gzip is unsplittable, so
    one task reads each file sequentially and monotonically_increasing_id is
    order-preserving within it). Frames from read_filetype's timestamp-less
    path already carry ``_file``/``_pos`` captured BEFORE any shuffle
    (input_file_name() is empty after one); those are reused and consumed.
    """
    from pyspark.sql import Window

    if "_file" in df.columns and "_pos" in df.columns:
        tagged = df
        order_col = "_pos"
    else:
        tagged = (
            df.withColumn("_file", F.input_file_name())
            .withColumn("_pos", F.monotonically_increasing_id())
        )
        order_col = "_pos"
    w = Window.partitionBy("_file").orderBy(order_col)
    start = F.to_timestamp(
        F.regexp_extract(F.col("_file"), file_start_pattern, 1), file_start_format
    )
    return (
        tagged.withColumn("_rn", F.row_number().over(w) - 1)
        .withColumn(
            ts_col,
            F.timestamp_millis(
                F.unix_millis(start) + F.col("_rn") * F.lit(nominal_freq_ms)
            ),
        )
        .drop("_file", "_pos", "_rn")
    )


def read_highfreq_gz(
    spark: SparkSession, paths: list[str] | str, filetype: str,
    file_start_pattern: str = r"(\d{8}-\d{4})",
    file_start_format: str = "yyyyMMdd-HHmm",
) -> DataFrame:
    """Read 20Hz gzip CSVs (Spark reads gzip natively) and reconstruct
    per-record timestamps from each file's start time + nominal rate."""
    ft = FILETYPES[filetype]
    if isinstance(paths, str):
        paths = [paths]
    df, _ = read_filetype(spark, ",".join(paths) if len(paths) == 1 else paths[0], filetype)
    # multi-path: union the rest (each file keeps its own row numbering)
    for p in paths[1:]:
        nxt, _ = read_filetype(spark, p, filetype)
        df = df.unionByName(nxt, allowMissingColumns=True)
    return create_timestamp_from_file_start(
        df, file_start_pattern, file_start_format, ft.nominal_freq_ms
    )


def read_zipped_filetype(
    spark: SparkSession, path: str, filetype: str,
) -> DataFrame:
    """Read zip-compressed CSVs distributed: binaryFile source + an Arrow
    mapInPandas kernel that unzips and parses each archive in its executor
    (Spark has no native zip codec). Schema comes from the first archive's
    header block, parsed once on the driver."""
    import io
    import zipfile

    import pandas as pd

    ft = FILETYPES[filetype]
    first = spark.read.format("binaryFile").load(path).limit(1).collect()[0]
    with zipfile.ZipFile(io.BytesIO(first["content"])) as z:
        inner = z.namelist()[0]
        head_lines = io.TextIOWrapper(z.open(inner)).readlines()[
            ft.skip_rows: ft.skip_rows + ft.header_rows
        ]
    names = [c.strip().strip('"') for c in head_lines[0].strip().split(ft.separator)]
    names = [n if n else f"col_{i}" for i, n in enumerate(names)]

    schema = ", ".join(
        f"`{n}` timestamp" if n == ft.timestamp_col else f"`{n}` double" for n in names
    )
    na_values = [*ft.na_values]
    ts_col, ts_fmt = ft.timestamp_col, ft.timestamp_format
    skip = ft.skip_rows + ft.header_rows
    sep = ft.separator

    def parse(batches):
        for pdf in batches:
            frames = []
            for blob in pdf["content"]:
                with zipfile.ZipFile(io.BytesIO(bytes(blob))) as zf:
                    for name in zf.namelist():
                        raw = pd.read_csv(
                            zf.open(name), sep=sep, skiprows=skip, header=None,
                            names=names, na_values=list(na_values),
                        )
                        if ts_col in raw.columns:
                            fmt = (ts_fmt.replace("yyyy", "%Y").replace("MM", "%m")
                                   .replace("dd", "%d").replace("HH", "%H")
                                   .replace("mm", "%M").replace("ss", "%S"))
                            raw[ts_col] = pd.to_datetime(
                                raw[ts_col].astype("Int64").astype(str), format=fmt,
                                errors="coerce",
                            )
                        for c in raw.columns:
                            if c != ts_col:
                                raw[c] = pd.to_numeric(raw[c], errors="coerce")
                        frames.append(raw)
            yield pd.concat(frames) if frames else pd.DataFrame(columns=names)

    return (
        spark.read.format("binaryFile").load(path)
        .select("content")
        .mapInPandas(parse, schema=schema)
    )
