"""Skew/shuffle-management operators: salting + bucketing."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from oracle_duckdb_sync_spark.operators import skew


def _plan(df) -> str:
    sc = df.sparkSession.sparkContext
    return sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "simple")


@pytest.fixture(scope="module")
def skewed(spark):
    # one hot key (90%) + a tail
    rows = [Row(k="hot", v=i) for i in range(900)] + [
        Row(k=f"k{i}", v=i) for i in range(100)
    ]
    return spark.createDataFrame(rows)


def test_salted_join_matches_plain_join(spark, skewed):
    dim = spark.createDataFrame(
        [Row(k="hot", label="H")] + [Row(k=f"k{i}", label=f"L{i}") for i in range(100)]
    )
    plain = skewed.join(dim, "k").groupBy("label").count()
    salted = skew.salted_join(skewed, dim, ["k"], salt_factor=4).groupBy("label").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_left(spark, skewed):
    dim = spark.createDataFrame([Row(k="hot", label="H")])
    out = skew.salted_join(skewed, dim, ["k"], salt_factor=4, how="left")
    assert out.count() == 1000
    assert out.filter(F.col("label").isNull()).count() == 100


def test_salted_aggregate_matches_plain(spark, skewed):
    plain = skewed.groupBy("k").agg(
        F.count("v").alias("n"), F.sum("v").alias("s"),
        F.min("v").alias("lo"), F.max("v").alias("hi"),
    )
    salted = skew.salted_aggregate(
        skewed, ["k"],
        {"n": ("count", "v"), "s": ("sum", "v"), "lo": ("min", "v"), "hi": ("max", "v")},
        salt_factor=4,
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))
    with pytest.raises(ValueError):
        skew.salted_aggregate(skewed, ["k"], {"bad": ("avg", "v")})


def test_bucketed_join_has_no_exchange(spark, tmp_path_factory):
    wh = tmp_path_factory.mktemp("buckwh")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS buck LOCATION '{wh}'")
    try:
        left = spark.range(0, 10000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("a")
        )
        right = spark.range(0, 10000).select(
            F.col("id").alias("k"), (F.col("id") * 3).alias("b")
        )
        skew.save_bucketed(left, "buck.l", ["k"], buckets=8)
        skew.save_bucketed(right, "buck.r", ["k"], buckets=8)
        # at test scale the 10k-row side would broadcast, hiding the
        # bucketing; disable broadcast to expose the co-located plan a
        # TB-sized pair of tables would get
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = skew.bucketed_join_ready(spark, "buck.l", "buck.r", ["k"])
            p = _plan(joined)
            assert "SortMergeJoin" in p
            assert "Exchange" not in p  # co-located: no shuffle on either side
            assert joined.count() == 10000
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        spark.sql("DROP DATABASE IF EXISTS buck CASCADE")
