"""Sharded corpus export (`operators/export.py`): deterministic shard
membership, manifest-vs-disk consistency, checksum sensitivity to
dropped rows, and the receiving-side verify pass."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from oracle_duckdb_sync_spark.operators.export import (
    shard_expr,
    verify_shards,
    write_shards,
)


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        [(i, f"text-{i}") for i in range(200)], "doc_id long, text string"
    )


class TestWriteShards:
    def test_manifest_matches_disk(self, spark, docs, tmp_path):
        path = str(tmp_path / "shards")
        manifest = write_shards(docs, path, "doc_id", 8)
        assert manifest["n_shards"] == 8
        assert manifest["total_rows"] == 200
        on_disk = json.load(open(os.path.join(path, "_manifest.json")))
        assert on_disk == json.loads(json.dumps(manifest))  # written == returned
        back = spark.read.parquet(path)
        got = {
            int(r["shard"]): int(r["n"])
            for r in back.groupBy("shard").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        for k, spec in manifest["shards"].items():
            assert got.get(int(k), 0) == spec["rows"], k

    def test_deterministic_membership(self, spark, docs, tmp_path):
        m1 = write_shards(docs, str(tmp_path / "a"), "doc_id", 8)
        m2 = write_shards(docs.repartition(7), str(tmp_path / "b"), "doc_id", 8)
        assert m1["shards"] == m2["shards"]  # partitioning never moves a row
        # and membership equals the pure shard_expr projection
        expected = {
            r.doc_id: r.s
            for r in docs.select("doc_id", shard_expr("doc_id", 8).alias("s")).collect()
        }
        back = spark.read.parquet(str(tmp_path / "a"))
        for r in back.select("doc_id", "shard").collect():
            assert int(r.shard) == expected[r.doc_id]

    def test_verify_detects_tamper(self, spark, docs, tmp_path):
        path = str(tmp_path / "shards")
        write_shards(docs, path, "doc_id", 4)
        assert verify_shards(spark, path)["ok"]
        # drop one shard's files → rows mismatch reported for that shard
        victim = next(
            d for d in os.listdir(path) if d.startswith("shard=")
        )
        for f in os.listdir(os.path.join(path, victim)):
            os.remove(os.path.join(path, victim, f))
        os.rmdir(os.path.join(path, victim))
        result = verify_shards(spark, path)
        assert not result["ok"]
        assert victim.split("=")[1] in result["mismatches"]

    def test_bad_shard_count_rejected(self, spark, docs, tmp_path):
        with pytest.raises(ValueError):
            write_shards(docs, str(tmp_path / "x"), "doc_id", 0)
