"""Catalog.analyze → CBO join reorder.

The registry's hand-written plans pin their own join order
(tests/test_plans.py's q5/q7/q8 ordering pins); these tests cover the
OTHER population — ad-hoc queries users write against warehouse tables —
where ``Catalog.analyze`` + ``spark.sql.cbo.*`` (session.py) let the
cost-based optimizer reorder join trees by estimated cardinality.
"""

from __future__ import annotations

import os
import re

import pytest
from pyspark.sql import functions as F

from oracle_duckdb_sync_spark.config import EngineConfig
from oracle_duckdb_sync_spark.sources.catalog import Catalog


@pytest.fixture()
def cbo(spark):
    """Enable CBO for the test, restore the session's settings after."""
    keys = ("spark.sql.cbo.enabled", "spark.sql.cbo.joinReorder.enabled")
    old = {k: spark.conf.get(k, None) for k in keys}
    for k in keys:
        spark.conf.set(k, "true")
    yield spark
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


@pytest.fixture()
def star_catalog(spark, tmp_path):
    """fact(100k) ⋈ mid(10k on k1) ⋈ tiny(10 on k2): joining tiny first
    cuts fact to ~1/100 before the wide mid join — the reorder CBO
    should find, and the written order deliberately doesn't."""
    wh = str(tmp_path / "wh")
    cat = Catalog(spark, EngineConfig(warehouse_dir=wh))
    spark.range(0, 100_000).select(
        F.col("id").alias("f_id"),
        (F.col("id") % 10_000).alias("k1"),
        (F.col("id") % 1000).alias("k2"),
    ).write.mode("overwrite").parquet(os.path.join(wh, "fact"))
    spark.range(0, 10_000).select(
        F.col("id").alias("k1"), F.lit("m").alias("m_val")
    ).write.mode("overwrite").parquet(os.path.join(wh, "mid"))
    spark.range(0, 10).select(
        F.col("id").alias("k2"), F.lit("t").alias("t_val")
    ).write.mode("overwrite").parquet(os.path.join(wh, "tiny"))
    yield cat
    for t in ("fact", "mid", "tiny"):
        cat.drop_table(t)


def _root_join_key(fact, mid, tiny) -> str:
    """Key of the ROOT (last-executed) join in the optimized plan of
    fact ⋈ mid (k1) ⋈ tiny (k2), written with tiny last."""
    df = (
        fact.join(mid, "k1")
        .join(tiny, "k2")
        .groupBy("m_val")
        .agg(F.count("*").alias("n"))
    )
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    m = re.search(r"Join Inner, \((k\d)#", opt)
    assert m is not None, opt
    return m.group(1)


def test_cbo_reorders_with_stats_stable_without(cbo, star_catalog):
    cat = star_catalog
    # without statistics the optimizer keeps the written order: the
    # root-most join is the tiny join (k2), executed LAST
    assert _root_join_key(cat.table("fact"), cat.table("mid"), cat.table("tiny")) == "k2"
    f, m, t = cat.analyze("fact"), cat.analyze("mid"), cat.analyze("tiny")
    # with statistics the DP reorder pushes the selective tiny join
    # below the mid join: the root-most join becomes k1
    assert _root_join_key(f, m, t) == "k1"
    # and table() now serves the stats-bearing relations too
    assert _root_join_key(cat.table("fact"), cat.table("mid"), cat.table("tiny")) == "k1"


def test_analyze_relation_correct_and_refreshes_after_mutation(cbo, star_catalog, spark):
    cat = star_catalog
    t = cat.analyze("tiny")
    assert t.count() == 10
    # mutate the directory under the analyzed table (append one file)
    spark.range(100, 101).select(
        F.col("id").alias("k2"), F.lit("t").alias("t_val")
    ).write.mode("append").parquet(cat.table_path("tiny"))
    # table() must serve the NEW listing (REFRESH on memo miss), not the
    # stale snapshot from analyze time
    assert cat.table("tiny").count() == 11


def test_analyze_histograms_collected_and_conf_restored(cbo, star_catalog, spark):
    cat = star_catalog
    key = "spark.sql.statistics.histogram.enabled"
    before = spark.conf.get(key, None)
    cat.analyze("fact", columns=["k1", "k2"], histograms=True)
    assert spark.conf.get(key, None) == before  # restored
    stats = cat.column_stats("fact", "k1")
    assert stats.get("distinct_count") is not None
    assert "histogram" in " ".join(stats).lower() or any(
        "height" in str(v).lower() for v in stats.values()
    ), stats
    # unanalyzed table -> empty stats, no error
    assert cat.column_stats("mid", "k1") == {}


def test_analyze_guards_stale_location_and_temp_view_shadow(cbo, spark, tmp_path):
    wh1, wh2 = str(tmp_path / "wh1"), str(tmp_path / "wh2")
    cat1 = Catalog(spark, EngineConfig(warehouse_dir=wh1))
    cat2 = Catalog(spark, EngineConfig(warehouse_dir=wh2))
    spark.range(0, 5).selectExpr("id AS k").write.parquet(
        os.path.join(wh1, "guard_t")
    )
    spark.range(100, 110).selectExpr("id AS k").write.parquet(
        os.path.join(wh2, "guard_t")
    )
    try:
        assert cat1.analyze("guard_t").count() == 5
        # same name, DIFFERENT warehouse: the stale catalog entry must be
        # replaced, not silently reused (IF NOT EXISTS would serve wh1!)
        assert cat2.analyze("guard_t").count() == 10
        assert cat2.table("guard_t").count() == 10
        # a temp view shadowing the name is refused loudly
        spark.range(0, 1).createOrReplaceTempView("guard_v")
        spark.range(0, 3).selectExpr("id AS k").write.parquet(
            os.path.join(wh1, "guard_v")
        )
        with pytest.raises(ValueError, match="temp view"):
            cat1.analyze("guard_v")
    finally:
        spark.catalog.dropTempView("guard_v")
        cat1.drop_table("guard_t")
        cat2.drop_table("guard_t")
        spark.sql("DROP TABLE IF EXISTS guard_t")


def test_stats_survive_across_catalog_instances(cbo, star_catalog, spark):
    """The analyzed-table registry is the SESSION catalog, not instance
    memory: a second Catalog over the same warehouse serves the
    stats-bearing relation (CBO stays live) and can read column stats."""
    cat = star_catalog
    cat.analyze("fact"), cat.analyze("mid"), cat.analyze("tiny")
    cat2 = Catalog(spark, cat.config)
    assert _root_join_key(
        cat2.table("fact"), cat2.table("mid"), cat2.table("tiny")
    ) == "k1"  # reordered → stats were served
    assert cat2.column_stats("fact", "k1").get("distinct_count") is not None
    # and dropping through the second instance removes the session entry
    cat2.drop_table("tiny")
    assert not spark.catalog.tableExists("tiny")


def test_no_stale_memo_across_warehouses_same_name(cbo, spark, tmp_path):
    """Regression (r10 ADVICE): after cat1.analyze(name), analyze() on a
    second Catalog with a DIFFERENT warehouse_dir re-registers the name
    at ITS location. cat1 must notice on the next call — serving
    spark.table(name) from a stale instance memo would silently return
    the OTHER warehouse's data, and cat1.drop_table would drop the
    other warehouse's registration."""
    wh1, wh2 = str(tmp_path / "wh1"), str(tmp_path / "wh2")
    cat1 = Catalog(spark, EngineConfig(warehouse_dir=wh1))
    cat2 = Catalog(spark, EngineConfig(warehouse_dir=wh2))
    spark.range(0, 5).selectExpr("id AS k").write.parquet(
        os.path.join(wh1, "memo_t")
    )
    spark.range(100, 110).selectExpr("id AS k").write.parquet(
        os.path.join(wh2, "memo_t")
    )
    try:
        assert cat1.analyze("memo_t").count() == 5  # primes any memo
        assert cat2.analyze("memo_t").count() == 10  # steals the name
        # mutate wh1's directory so cat1's relation memo misses and the
        # session-catalog location is re-consulted
        spark.range(5, 6).selectExpr("id AS k").write.mode("append").parquet(
            os.path.join(wh1, "memo_t")
        )
        # cat1 must serve ITS OWN parquet (6 rows), not wh2's table (10)
        assert cat1.table("memo_t").count() == 6
        # cat1.drop_table must not drop wh2's registration
        cat1.drop_table("memo_t")
        assert spark.catalog.tableExists("memo_t")
        assert cat2.table("memo_t").count() == 10
    finally:
        cat2.drop_table("memo_t")
        spark.sql("DROP TABLE IF EXISTS memo_t")


def test_analyze_handles_non_bare_identifier_names(cbo, spark, tmp_path):
    """Names valid for the warehouse (leading digit) must survive the
    SQL round trips via identifier quoting."""
    cat = Catalog(spark, EngineConfig(warehouse_dir=str(tmp_path / "wh")))
    spark.range(0, 7).selectExpr("id AS k").write.parquet(
        cat.table_path("2024_events")
    )
    try:
        assert cat.analyze("2024_events").count() == 7
        assert cat.column_stats("2024_events", "k").get("distinct_count") == "7"
    finally:
        cat.drop_table("2024_events")
