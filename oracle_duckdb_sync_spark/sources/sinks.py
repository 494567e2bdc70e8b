"""Parquet table sinks: append, overwrite, upsert (reference A12-A15, C1).

The reference's sink is DuckDB ``INSERT INTO t SELECT * FROM df``
(+ ``ON CONFLICT`` upsert, database/duckdb_source.py:74-142). On a
Parquet warehouse:

- **append** — ``df.write.mode("append")`` — Arrow-native columnar write,
  one file per task; the reference's claimed "100× faster than
  executemany" bulk path is simply how Spark always writes.
- **upsert** — left-anti join + union rewrite (SURVEY C1). Plain Parquet
  has no transactional MERGE, so the rewrite goes to a temp directory and
  is swapped in atomically (SURVEY §7.4-1). At 100 TB you'd use a table
  format with MERGE (Delta/Iceberg) or partition-scoped rewrites — the
  operator composition is identical; this sink keeps the swap explicit.
- writes can be **bucketed** by the upsert key via ``partition_cols`` so
  later upserts rewrite only affected partitions.
"""

from __future__ import annotations

import os
import shutil
import uuid
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

from ..operators.merge import upsert as upsert_op


def append(df: DataFrame, path: str, partition_cols: Sequence[str] | None = None) -> None:
    """A12 batch append sink."""
    w = df.write.mode("append")
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.parquet(path)


def overwrite(df: DataFrame, path: str, partition_cols: Sequence[str] | None = None) -> None:
    w = df.write.mode("overwrite")
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.parquet(path)


def upsert(
    spark: SparkSession,
    new: DataFrame,
    path: str,
    keys: Sequence[str],
    broadcast_new: bool = True,
) -> None:
    """A13/C1 UPSERT sink with atomic temp-dir swap.

    Reads the current table, merges (old anti-join new ∪ new), writes to
    ``<path>.__tmp-<uuid>``, then swaps directories. The swap window is
    the only non-atomic instant and is process-local — the reference
    relies on DuckDB transactions for the same guarantee.
    """
    if not os.path.isdir(path):
        new.write.mode("overwrite").parquet(path)
        return
    old = spark.read.parquet(path)
    merged = upsert_op(old, new, keys, broadcast_new=broadcast_new)
    tmp = f"{path}.__tmp-{uuid.uuid4().hex[:8]}"
    merged.write.mode("overwrite").parquet(tmp)
    backup = f"{path}.__old-{uuid.uuid4().hex[:8]}"
    os.rename(path, backup)
    os.rename(tmp, path)
    shutil.rmtree(backup, ignore_errors=True)
