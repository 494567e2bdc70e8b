"""Invariants for the non-SQL-expressible operators: sequence packing
and approximate distinct counts (their entries are rows-only checks)."""

from __future__ import annotations

from pyspark.sql import functions as F

from oracle_duckdb_sync_spark.functions.text import tokens_expr
from oracle_duckdb_sync_spark.operators.packing import pack_sequences, pack_stats
from oracle_duckdb_sync_spark.sources.testdata import load_table

BUDGET = 512


def _packed(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    wt = d.select("doc_id", F.size(tokens_expr(F.col("text"))).alias("n_tok"))
    return wt, pack_sequences(wt, "doc_id", "n_tok", budget=BUDGET, n_shards=8)


def test_every_doc_packed_exactly_once(spark, sf_dir):
    wt, packed = _packed(spark, sf_dir)
    assert packed.count() == wt.count()
    assert packed.select("doc_id").distinct().count() == wt.count()


def test_no_bin_over_budget_unless_single_oversize(spark, sf_dir):
    _, packed = _packed(spark, sf_dir)
    bad = (
        pack_stats(packed, BUDGET)
        .filter((F.col("fill_tokens") > BUDGET) & (F.col("n_docs") > 1))
        .count()
    )
    assert bad == 0


def test_packing_deterministic_under_repartition(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    wt = d.select("doc_id", F.size(tokens_expr(F.col("text"))).alias("n_tok"))
    a = {tuple(r) for r in pack_sequences(wt, "doc_id", "n_tok", BUDGET, 8).collect()}
    b = {
        tuple(r)
        for r in pack_sequences(
            wt.repartition(17), "doc_id", "n_tok", BUDGET, 8
        ).collect()
    }
    assert a == b


def test_pack_ids_dense_per_shard(spark, sf_dir):
    _, packed = _packed(spark, sf_dir)
    per_shard = packed.groupBy("shard").agg(
        F.max("pack_id").alias("mx"), F.countDistinct("pack_id").alias("nd")
    )
    assert per_shard.filter(F.col("mx") + 1 != F.col("nd")).count() == 0


def test_approx_distinct_within_5pct(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    approx = {
        r[0]: r[1]
        for r in e.groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", rsd=0.02))
        .collect()
    }
    exact = {
        r[0]: r[1]
        for r in e.groupBy("event_type").agg(F.countDistinct("user_id")).collect()
    }
    for k, ex in exact.items():
        assert abs(approx[k] - ex) <= max(1, 0.05 * ex), (k, approx[k], ex)
