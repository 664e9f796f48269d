"""File/folder discovery — the ingest entry point.

Reference: ``search_files`` / ``search_folders``
(/root/reference/diive/core/io/filereader.py:25-60): recursive os.walk with
an fnmatch filename pattern, sorted results.

Spark mapping: the Hadoop FileSystem API instead of os.walk, so discovery
works unchanged against file://, hdfs://, s3a://, ... — at 100 TB the file
listing itself is a cluster-filesystem operation (S3 LIST pagination, HDFS
NameNode calls), which the Hadoop client already batches; results stay
driver-side (bounded: one string per file), exactly like the reference.
"""

from __future__ import annotations

import fnmatch

from pyspark.sql import SparkSession


def _fs_and_path(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath


def search_files(
    spark: SparkSession, searchdirs: str | list[str], pattern: str = "*",
) -> list[str]:
    """Recursively find files whose NAME matches ``pattern`` (fnmatch, like
    the reference) under each search dir. Returns sorted URI strings."""
    if isinstance(searchdirs, str):
        searchdirs = [searchdirs]
    found = []
    for d in searchdirs:
        fs, hpath = _fs_and_path(spark, d)
        if not fs.exists(hpath):
            continue
        it = fs.listFiles(hpath, True)  # recursive RemoteIterator
        while it.hasNext():
            status = it.next()
            p = status.getPath()
            if fnmatch.fnmatch(p.getName(), pattern):
                found.append(p.toString())
    return sorted(found)


def search_folders(spark: SparkSession, searchdirs: str | list[str]) -> list[str]:
    """Recursively list every directory under each search dir (the search dir
    itself included, matching the reference's os.walk roots)."""
    if isinstance(searchdirs, str):
        searchdirs = [searchdirs]
    found = []
    for d in searchdirs:
        fs, hpath = _fs_and_path(spark, d)
        if not fs.exists(hpath):
            continue
        stack = [hpath]
        while stack:
            cur = stack.pop()
            found.append(cur.toString())
            for status in fs.listStatus(cur):
                if status.isDirectory():
                    stack.append(status.getPath())
    return sorted(found)


def files_overview(
    spark: SparkSession, filelist: list[str], file_date_format: str,
    file_generation_res: str, data_res: float,
    files_how_many: int | None = None,
):
    """Expected-vs-available file inventory (reference
    core/io/filedetector.py:18-151 ``FileDetector``): parse each file's
    start time from its NAME with ``file_date_format`` (C strptime), build
    the regular expected-file grid at ``file_generation_res``, mark
    available/expected/unexpected files, and derive each file's expected
    end / duration / record count (``data_res`` seconds per record) from
    the next file's start. ``files_how_many`` trims to the first N
    available files (running-count cut, like the reference).

    File inventories are bounded metadata (one row per file) — the
    reference itself is driver-side; sizes come from the Hadoop
    FileSystem so the same call works on file://, hdfs://, s3a://.
    Returns a small Spark DataFrame sorted by expected start."""
    import datetime as dt

    import pandas as pd

    if not filelist:
        raise ValueError("filelist must not be empty")

    def name_of(p):
        return p.rstrip("/").rsplit("/", 1)[-1]

    def size_of(p):
        fs, hpath = _fs_and_path(spark, p)
        try:
            return float(fs.getFileStatus(hpath).getLen())
        except Exception:
            return float("nan")

    starts = [dt.datetime.strptime(name_of(p), file_date_format)
              for p in filelist]
    # grid bounds from min/max, not first/last: an unsorted filelist must
    # not truncate (or empty) the expected-file inventory (the reference
    # silently assumes sorted input; we harden)
    first, last = min(starts), max(starts)
    expected_end = last + pd.Timedelta(file_generation_res)
    grid = pd.date_range(first, expected_end, freq=file_generation_res)
    df = pd.DataFrame(index=grid)
    df["expected_file"] = df.index
    for p, s in zip(filelist, starts):
        df.loc[s, "file_available"] = 1.0
        df.loc[s, "filename"] = name_of(p)
        df.loc[s, "start"] = s
        df.loc[s, "filepath"] = p
        df.loc[s, "filesize"] = size_of(p)
    df = df.sort_index()
    df["expected_end"] = pd.Series(df.index, index=df.index).shift(-1)
    df["expected_duration"] = (df["expected_end"]
                               - df["start"]).dt.total_seconds()
    df["expected_records"] = df["expected_duration"] / data_res
    df["file_available"] = df["file_available"].fillna(0.0)
    if files_how_many:
        cum = df["file_available"].cumsum()
        hit = cum[cum >= files_how_many]
        if len(hit):
            df = df.loc[:hit.index[0]]
    out = df.reset_index(names="expected_start")
    out["filename"] = out["filename"].astype(object).where(
        out["filename"].notna(), None)
    out["filepath"] = out["filepath"].astype(object).where(
        out["filepath"].notna(), None)
    return spark.createDataFrame(out)
