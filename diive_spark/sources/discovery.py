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
