"""Filesystem probes that work on any Hadoop-supported scheme.

The ingest bootstraps (operators/pipeline.py) and the warehouse catalog
both need cheap driver-side "does this table/store exist yet" checks.
A bare ``os.path`` probe is only correct for driver-local paths: against
an ``s3a://`` or ``hdfs://`` corpus it always answers False, which makes
day-0/lost-store recovery silently take the wrong branch (treating an
existing corpus as day-0 re-seeds the dedup stores and un-deduplicates
the next batch). These helpers route through the JVM Hadoop
``FileSystem`` API — the same resolver ``spark.read`` uses — so the
probe answers match what the subsequent read/write will see, for local
paths and remote URIs alike.

Cost: one driver-side RPC per probe (a LIST/HEAD on object stores),
which is noise next to the Spark jobs these branches gate.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_URI_SCHEMES_LOCAL = ("file:",)


def _looks_remote(path: str) -> bool:
    """True for scheme-qualified non-file URIs (s3a://, hdfs://, ...)."""
    if "://" not in path:
        return False
    return not path.startswith(_URI_SCHEMES_LOCAL)


def _strip_file_scheme(path: str) -> str:
    """Remove a LEADING ``file:`` scheme only — an unanchored replace
    would corrupt any path whose name merely contains the substring
    (e.g. ``/data/profile:v2`` → ``/data/prov2``), and a corrupted
    probe path makes the bootstraps treat an existing corpus as day-0."""
    return path[5:] if path.startswith("file:") else path


def _hadoop_fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jpath


def fs_exists(spark: SparkSession, path: str) -> bool:
    """Existence probe valid for any Hadoop scheme.

    Local paths short-circuit to ``os.path.exists`` (no JVM hop);
    scheme-qualified URIs go through the Hadoop FileSystem.
    """
    if not _looks_remote(path):
        return os.path.exists(_strip_file_scheme(path))
    fs, jpath = _hadoop_fs(spark, path)
    return bool(fs.exists(jpath))


def parquet_dir_exists(spark: SparkSession, path: str) -> bool:
    """True iff ``path`` is a directory that holds at least one
    ``*.parquet`` part file or a ``_SUCCESS`` marker — the predicate
    that distinguishes a real table/store from an empty or
    partially-written directory left by a crashed earlier run (same
    rule as ``Catalog._exists_on_disk``)."""
    if not _looks_remote(path):
        local = _strip_file_scheme(path)
        if not os.path.isdir(local):
            return False
        return any(
            f.endswith(".parquet") or f == "_SUCCESS"
            for f in os.listdir(local)
        )
    fs, jpath = _hadoop_fs(spark, path)
    if not fs.exists(jpath) or not fs.getFileStatus(jpath).isDirectory():
        return False
    for st in fs.listStatus(jpath):
        name = st.getPath().getName()
        if name.endswith(".parquet") or name == "_SUCCESS":
            return True
    return False
