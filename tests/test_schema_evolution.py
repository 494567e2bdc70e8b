"""Schema evolution through the upsert path (`merge.upsert` /
`sinks.upsert(merge_schema=True)`): a source system adding or dropping
a column mid-stream must not wedge the sync loop — and silent drift
must stay an error when evolution isn't opted into."""

from __future__ import annotations

import os

import pytest

from oracle_duckdb_sync_spark.operators.merge import upsert as upsert_op
from oracle_duckdb_sync_spark.sources import sinks


def _df(spark, schema, rows):
    return spark.createDataFrame(rows, schema)


class TestOperatorEvolution:
    def test_added_column_nulls_old_rows(self, spark):
        old = _df(spark, "k long, v string", [(1, "a"), (2, "b")])
        new = _df(spark, "k long, v string, extra long", [(2, "B", 9)])
        out = upsert_op(old, new, ["k"], allow_missing_columns=True)
        got = {r.k: (r.v, r.extra) for r in out.collect()}
        assert got == {1: ("a", None), 2: ("B", 9)}

    def test_omitted_column_nulls_new_rows(self, spark):
        old = _df(spark, "k long, v string, extra long", [(1, "a", 7)])
        new = _df(spark, "k long, v string", [(2, "b")])
        out = upsert_op(old, new, ["k"], allow_missing_columns=True)
        got = {r.k: (r.v, r.extra) for r in out.collect()}
        assert got == {1: ("a", 7), 2: ("b", None)}

    def test_drift_without_flag_fails_loudly(self, spark):
        from pyspark.errors import AnalysisException

        old = _df(spark, "k long, v string", [(1, "a")])
        new = _df(spark, "k long, v string, extra long", [(2, "b", 9)])
        with pytest.raises(AnalysisException):
            upsert_op(old, new, ["k"]).collect()


class TestSinkEvolution:
    def test_unpartitioned_table_gains_column(self, spark, tmp_path):
        path = str(tmp_path / "t")
        _df(spark, "k long, v string", [(1, "a"), (2, "b")]).write.parquet(path)
        batch = _df(spark, "k long, v string, extra long", [(2, "B", 9), (3, "c", 1)])
        sinks.upsert(spark, batch, path, ["k"], merge_schema=True)
        back = spark.read.option("mergeSchema", "true").parquet(path)
        got = {r.k: (r.v, r.extra) for r in back.collect()}
        assert got == {1: ("a", None), 2: ("B", 9), 3: ("c", 1)}
        # a later batch in the ORIGINAL schema still applies
        sinks.upsert(
            spark, _df(spark, "k long, v string", [(1, "A")]), path, ["k"], merge_schema=True
        )
        back2 = spark.read.option("mergeSchema", "true").parquet(path)
        assert {r.k: r.v for r in back2.collect()} == {1: "A", 2: "B", 3: "c"}

    def test_partitioned_untouched_partition_keeps_files_and_schema(self, spark, tmp_path):
        path = str(tmp_path / "t")
        _df(
            spark, "k long, v string, day string", [(1, "a", "d1"), (2, "b", "d2")]
        ).write.partitionBy("day").parquet(path)
        d1 = os.path.join(path, "day=d1")
        before = {f: os.path.getmtime(os.path.join(d1, f)) for f in os.listdir(d1)}

        batch = _df(spark, "k long, v string, extra long, day string", [(2, "B", 9, "d2")])
        sinks.upsert(
            spark, batch, path, ["k"], partition_cols=["day"], merge_schema=True
        )
        after = {f: os.path.getmtime(os.path.join(d1, f)) for f in os.listdir(d1)}
        assert after == before  # untouched partition untouched on disk
        back = spark.read.option("mergeSchema", "true").parquet(path)
        got = {r.k: (r.v, r.extra, r.day) for r in back.collect()}
        assert got == {1: ("a", None, "d1"), 2: ("B", 9, "d2")}

    def test_sink_drift_without_flag_fails(self, spark, tmp_path):
        from pyspark.errors import AnalysisException

        path = str(tmp_path / "t")
        _df(spark, "k long, v string", [(1, "a")]).write.parquet(path)
        batch = _df(spark, "k long, v string, extra long", [(2, "b", 9)])
        with pytest.raises(AnalysisException):
            sinks.upsert(spark, batch, path, ["k"])
