"""Continuous aggregates: an incrementally-maintained time-bucket
rollup table (TimescaleDB continuous-aggregate / materialized-view
semantics) on top of the repo's sync loop.

The reference recomputes its dashboard's time-bucket aggregate from the
synced table on every query (``data/query_core.py:198-263`` — fine at
DuckDB-on-one-box scale). At 100 TB the aggregate itself must be a
maintained table: a full recompute per refresh is a full corpus scan,
and late data silently corrupts any naive "aggregate only the new rows"
scheme whenever a bucket's rows arrive across two refreshes (the second
partial aggregate *overwrites* or double-counts the first — means and
distincts can't be merged from partials without sketch state).

This module keeps one invariant instead: **the rollup equals the full
group-by of the source at all times**, maintained at incremental cost —

1. the just-appended micro-batch names the *invalidation set*: its
   distinct ``(key, bucket)`` pairs (late rows invalidate old buckets
   exactly like fresh rows invalidate the newest one — lateness is not
   a special case);
2. only those buckets are recomputed, *from the source*, under a
   pushed-down time-range predicate (min..max touched bucket) so a
   day-partitioned source prunes to the touched days — plus a semi-join
   on the exact pairs;
3. the recomputed buckets UPSERT into the rollup on ``(key, bucket)``
   (`sources/sinks.py` — partition-scoped swap or Delta MERGE).

Cost per refresh ≈ (touched buckets' source rows) + (batch scan), not
corpus size; a bucket is recomputed O(arrival spread) times total. The
aggregate expressions are arbitrary (no merge-ability requirement),
because recompute-from-source sidesteps partial-merge algebra entirely.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import sinks


def bucket_col(ts_col: str, bucket_seconds: int) -> Column:
    """Tumbling-bucket start (epoch seconds, BIGINT) — pmod form, no
    division, exact for pre-1970 instants."""
    s = F.unix_seconds(F.col(ts_col))
    return s - F.pmod(s, F.lit(bucket_seconds))


def rollup_aggregate(
    source: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    bucket_seconds: int,
    agg_exprs: Mapping[str, Column],
) -> DataFrame:
    """The rollup's defining query: full group-by of ``source`` on
    (keys…, bucket). ``refresh`` maintains a table equal to this."""
    b = bucket_col(ts_col, bucket_seconds).alias("bucket_s")
    return source.groupBy(*key_cols, b).agg(
        *[e.alias(name) for name, e in agg_exprs.items()]
    )


def refresh(
    spark: SparkSession,
    source: DataFrame,
    batch: DataFrame,
    rollup_path: str,
    key_cols: Sequence[str],
    ts_col: str,
    bucket_seconds: int,
    agg_exprs: Mapping[str, Column],
    partition_cols: Sequence[str] | None = None,
) -> int:
    """Incrementally refresh the rollup at ``rollup_path`` after
    ``batch`` was appended to ``source``. Returns the number of
    (key, bucket) groups recomputed (0 ⇒ empty batch, no I/O).

    ``source`` must already contain ``batch``'s rows (refresh runs
    after the sync engine's append commits — same ordering the
    watermark contract uses). Idempotent: re-running with the same
    batch recomputes the same buckets to the same values.
    """
    b = bucket_col(ts_col, bucket_seconds)
    touched = (
        batch.select(*key_cols, b.alias("bucket_s")).distinct()
    )
    # tiny bounded collect: just the min/max touched bucket, to build a
    # scan-time-prunable time-range predicate on the source
    bounds = touched.agg(
        F.min("bucket_s").alias("lo"), F.max("bucket_s").alias("hi")
    ).collect()[0]
    if bounds.lo is None:
        return 0
    lo_ts = F.timestamp_seconds(F.lit(bounds.lo))
    hi_ts = F.timestamp_seconds(F.lit(bounds.hi + bucket_seconds))
    windowed = source.filter((F.col(ts_col) >= lo_ts) & (F.col(ts_col) < hi_ts))
    # exact invalidation set: semi-join on the touched (keys…, bucket)
    # pairs — unhinted; AQE broadcasts the batch-sized side when small
    scoped = (
        windowed.withColumn("bucket_s", b)
        .join(touched, on=[*key_cols, "bucket_s"], how="left_semi")
    )
    recomputed = scoped.groupBy(*key_cols, "bucket_s").agg(
        *[e.alias(name) for name, e in agg_exprs.items()]
    )
    n_groups = recomputed.count()
    if n_groups:
        sinks.upsert(
            spark,
            recomputed,
            rollup_path,
            keys=[*key_cols, "bucket_s"],
            partition_cols=partition_cols,
        )
    return n_groups


def full_build(
    spark: SparkSession,
    source: DataFrame,
    rollup_path: str,
    key_cols: Sequence[str],
    ts_col: str,
    bucket_seconds: int,
    agg_exprs: Mapping[str, Column],
    partition_cols: Sequence[str] | None = None,
) -> None:
    """One-time initial materialization (or disaster rebuild) of the
    rollup table — the same defining query ``refresh`` maintains."""
    sinks.overwrite(
        rollup_aggregate(source, key_cols, ts_col, bucket_seconds, agg_exprs),
        rollup_path,
        partition_cols=partition_cols,
    )
