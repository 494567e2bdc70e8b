"""Continuous-aggregate maintenance (`sync/rollup.py`): the invariant
"rollup table == full group-by of source" must survive fresh batches,
LATE batches (old buckets invalidated and recomputed), idempotent
re-refresh, and the streaming foreachBatch form."""

from __future__ import annotations

from datetime import datetime, timezone

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from oracle_duckdb_sync_spark.streaming import incremental as ST
from oracle_duckdb_sync_spark.sync import rollup as R


def _ts(s: int):
    return datetime.fromtimestamp(s, tz=timezone.utc)


def AGG():
    # built lazily: Column construction needs an active SparkContext
    return {
        "n": F.count(F.lit(1)),
        # exact integer cents so equality comparison is trustworthy
        "sum_q": F.sum(F.round(F.col("v") * 100, 0).cast("long")),
    }


def _rows(spec):
    return [Row(k=k, ts=_ts(t), v=float(v), i=i) for i, (k, t, v) in enumerate(spec)]


def _snapshot(df):
    return {
        (r.k, r.bucket_s): (r.n, r.sum_q)
        for r in df.select("k", "bucket_s", "n", "sum_q").collect()
    }


@pytest.fixture()
def dirs(tmp_path):
    return str(tmp_path / "source"), str(tmp_path / "rollup")


class TestRefresh:
    def test_invariant_holds_through_fresh_and_late_batches(self, spark, dirs):
        src_path, roll_path = dirs
        base = spark.createDataFrame(
            _rows([("a", 10, 1.0), ("a", 70, 2.0), ("b", 10, 5.0)])
        )
        base.write.mode("append").parquet(src_path)
        R.full_build(spark, spark.read.parquet(src_path), roll_path, ["k"], "ts", 60, AGG())
        assert _snapshot(spark.read.parquet(roll_path)) == {
            ("a", 0): (1, 100),
            ("a", 60): (1, 200),
            ("b", 0): (1, 500),
        }

        # batch 1: fresh rows for a new bucket AND a LATE row into a's
        # oldest bucket — both are just "touched buckets"
        batch = spark.createDataFrame(_rows([("a", 130, 3.0), ("a", 15, 9.0)]))
        batch.write.mode("append").parquet(src_path)
        source = spark.read.parquet(src_path)
        n = R.refresh(spark, source, batch, roll_path, ["k"], "ts", 60, AGG())
        assert n == 2  # (a,0) recomputed, (a,120) created

        expected = _snapshot(
            R.rollup_aggregate(spark.read.parquet(src_path), ["k"], "ts", 60, AGG())
        )
        assert _snapshot(spark.read.parquet(roll_path)) == expected
        assert expected[("a", 0)] == (2, 1000)  # late row merged, not double-counted
        assert expected[("b", 0)] == (1, 500)  # untouched key untouched

    def test_refresh_is_idempotent(self, spark, dirs):
        src_path, roll_path = dirs
        base = spark.createDataFrame(_rows([("a", 10, 1.0)]))
        base.write.mode("append").parquet(src_path)
        R.full_build(spark, spark.read.parquet(src_path), roll_path, ["k"], "ts", 60, AGG())
        batch = spark.createDataFrame(_rows([("a", 20, 2.0)]))
        batch.write.mode("append").parquet(src_path)
        source = spark.read.parquet(src_path)
        R.refresh(spark, source, batch, roll_path, ["k"], "ts", 60, AGG())
        first = _snapshot(spark.read.parquet(roll_path))
        # replaying the same batch (crash-before-state-commit) converges
        R.refresh(spark, source, batch, roll_path, ["k"], "ts", 60, AGG())
        assert _snapshot(spark.read.parquet(roll_path)) == first == {("a", 0): (2, 300)}

    def test_empty_batch_touches_nothing(self, spark, dirs):
        src_path, roll_path = dirs
        base = spark.createDataFrame(_rows([("a", 10, 1.0)]))
        base.write.mode("append").parquet(src_path)
        R.full_build(spark, spark.read.parquet(src_path), roll_path, ["k"], "ts", 60, AGG())
        empty = spark.createDataFrame([], base.schema)
        n = R.refresh(
            spark, spark.read.parquet(src_path), empty, roll_path, ["k"], "ts", 60, AGG()
        )
        assert n == 0
        assert _snapshot(spark.read.parquet(roll_path)) == {("a", 0): (1, 100)}


class TestStreamingContinuousAggregate:
    def test_foreachbatch_maintains_rollup(self, spark, tmp_path):
        inbox = str(tmp_path / "inbox")
        src_path = str(tmp_path / "source")
        roll_path = str(tmp_path / "rollup")
        ckpt = str(tmp_path / "ckpt")

        wave1 = spark.createDataFrame(_rows([("a", 10, 1.0), ("b", 70, 2.0)]))
        wave1.write.mode("append").parquet(inbox)
        sdf = ST.stream_source(spark, inbox, wave1.schema)
        writer = ST.stream_continuous_aggregate(
            sdf, spark, src_path, roll_path, ["k"], "ts", 60, AGG(), checkpoint_dir=ckpt
        )
        ST.run_stream_once(writer)
        assert _snapshot(spark.read.parquet(roll_path)) == {
            ("a", 0): (1, 100),
            ("b", 60): (1, 200),
        }

        # wave 2 includes a late row for (a, 0); restart from checkpoint
        wave2 = spark.createDataFrame(_rows([("a", 30, 4.0), ("b", 130, 8.0)]))
        wave2.write.mode("append").parquet(inbox)
        sdf2 = ST.stream_source(spark, inbox, wave1.schema)
        writer2 = ST.stream_continuous_aggregate(
            sdf2, spark, src_path, roll_path, ["k"], "ts", 60, AGG(), checkpoint_dir=ckpt
        )
        ST.run_stream_once(writer2)
        expected = _snapshot(
            R.rollup_aggregate(spark.read.parquet(src_path), ["k"], "ts", 60, AGG())
        )
        got = _snapshot(spark.read.parquet(roll_path))
        assert got == expected
        assert got[("a", 0)] == (2, 500)


class TestPartitionedRollup:
    def test_refresh_leaves_untouched_day_partitions_on_disk(self, spark, tmp_path):
        """With the rollup day-partitioned, a refresh touching only day 2
        must not rewrite day 1's files (mtime + content identical) —
        the 100 TB economics: a late batch rewrites its own days, not
        the table."""
        import os

        src_path = str(tmp_path / "source")
        roll_path = str(tmp_path / "rollup")
        day = 86400
        base = spark.createDataFrame(
            _rows([("a", 10, 1.0), ("a", day + 10, 2.0), ("b", 30, 3.0)])
        )
        base.write.mode("append").parquet(src_path)

        # build day-partitioned: derive day from bucket_s
        from oracle_duckdb_sync_spark.sources import sinks
        from pyspark.sql import functions as F2

        rolled = R.rollup_aggregate(
            spark.read.parquet(src_path), ["k"], "ts", 60, AGG()
        ).withColumn("day", (F2.col("bucket_s") - F2.pmod(F2.col("bucket_s"), F2.lit(day))) / day)
        rolled = rolled.withColumn("day", F2.col("day").cast("long"))
        sinks.overwrite(rolled, roll_path, partition_cols=["day"])

        day1_dir = os.path.join(roll_path, "day=0")
        before = {
            f: os.path.getmtime(os.path.join(day1_dir, f))
            for f in os.listdir(day1_dir)
            if f.endswith(".parquet")
        }
        assert before

        # batch lands in day 2 only
        batch = spark.createDataFrame(_rows([("a", day + 70, 9.0)]))
        batch.write.mode("append").parquet(src_path)
        source = spark.read.parquet(src_path)
        b = R.bucket_col("ts", 60)
        touched = batch.select("k", b.alias("bucket_s")).distinct()
        recomputed = (
            source.withColumn("bucket_s", b)
            .join(touched, on=["k", "bucket_s"], how="left_semi")
            .groupBy("k", "bucket_s")
            .agg(*[e.alias(n) for n, e in AGG().items()])
            .withColumn(
                "day",
                ((F2.col("bucket_s") - F2.pmod(F2.col("bucket_s"), F2.lit(day))) / day).cast("long"),
            )
        )
        sinks.upsert(
            spark, recomputed, roll_path, keys=["k", "bucket_s"], partition_cols=["day"]
        )

        after = {
            f: os.path.getmtime(os.path.join(day1_dir, f))
            for f in os.listdir(day1_dir)
            if f.endswith(".parquet")
        }
        assert after == before  # day 1 untouched, file-for-file
        # and day 2 now carries both its buckets
        snap = _snapshot(spark.read.parquet(roll_path))
        assert snap[("a", day)] == (1, 200)  # pre-existing day-2 bucket intact
        assert snap[("a", day + 60)] == (1, 900)  # the batch's new bucket
