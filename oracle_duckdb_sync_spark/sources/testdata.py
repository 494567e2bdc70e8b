"""Readers for the driver-provided ``/root/testdata/sf*`` parquet tables.

Handles one physical-format quirk: ``events.parquet`` stores its ``ts``
column as Parquet ``TIMESTAMP(NANOS)``, which Spark's reader rejects
([PARQUET_TYPE_ILLEGAL]). We flip the runtime conf
``spark.sql.legacy.parquet.nanosAsLong`` and rebuild a proper
``TimestampType`` column from the nanosecond epoch value
(microsecond truncation — exactly what DuckDB's µs timestamps do, so the
differential oracle sees identical instants).
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

def ensure_package_on_workers(spark: SparkSession) -> None:
    """Ship this package to Spark's Python workers via ``addPyFile``.

    Worker processes do not inherit the driver's ``sys.path``, so any
    plan that serializes a closure referencing package modules
    (``applyInPandas``/``mapInPandas`` in lttb/packing/multimodal) fails
    with ModuleNotFoundError when the driving process runs from a cwd
    other than the repo root. Zipping the package once per repo state
    and registering it with the SparkContext makes every session
    self-sufficient regardless of the harness's cwd or PYTHONPATH.
    """
    sc = spark.sparkContext
    if getattr(sc, "_odss_pkg_shipped", False):
        return
    pkg_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    repo_root = os.path.dirname(pkg_dir)
    zip_path = os.path.join(repo_root, ".pkg", "oracle_duckdb_sync_spark.zip")
    src_mtime = max(
        os.path.getmtime(os.path.join(dirpath, f))
        for dirpath, _dirs, files in os.walk(pkg_dir)
        for f in files
        if f.endswith(".py")
    )
    if not os.path.exists(zip_path) or os.path.getmtime(zip_path) < src_mtime:
        import zipfile

        os.makedirs(os.path.dirname(zip_path), exist_ok=True)
        # per-process tmp name: concurrent drivers (parallel pytest
        # sessions) must not interleave writes into one tmp file and
        # os.replace a corrupted zip into place
        tmp = f"{zip_path}.tmp-{os.getpid()}-{time.monotonic_ns()}"
        with zipfile.ZipFile(tmp, "w") as zf:
            for dirpath, _dirs, files in os.walk(pkg_dir):
                for f in sorted(files):
                    if f.endswith(".py"):
                        full = os.path.join(dirpath, f)
                        rel = os.path.relpath(full, repo_root)
                        zf.write(full, rel)
        os.replace(tmp, zip_path)
    sc.addPyFile(zip_path)
    sc._odss_pkg_shipped = True


TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# columns that may arrive as raw nanosecond longs (TIMESTAMP(NANOS) parquet)
_NANOS_TS_COLS = {"events": ("ts",)}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one test table with timestamp normalization."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    ensure_package_on_workers(spark)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # read `isAdjustedToUTC=false` parquet timestamps as TimestampType
    # (instants, DuckDB `epoch()` parity) — NOT TIMESTAMP_NTZ, whose
    # comparisons/epoch math would shift with the session timezone
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    # runtime-settable AQE tweak for driver-owned sessions: coalesce
    # post-shuffle partitions by advisory size, not parallelism — small
    # shuffles collapse to few tasks, large ones still split by size
    spark.conf.set("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
    df = spark.read.parquet(path)
    for col in _NANOS_TS_COLS.get(name, ()):
        if col in df.columns and isinstance(df.schema[col].dataType, LongType):
            # integer division: epoch-nanos exceed double's 53-bit mantissa,
            # so `/ 1000` through double would be off by ±1 µs
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {
        n: load_table(spark, sf_dir, n)
        for n in TABLES
        if os.path.exists(os.path.join(sf_dir, f"{n}.parquet"))
    }
