"""Differential oracle over every __spark_entry__ query pair.

This mirrors the driver's CORRECTNESS gate: each queries() entry runs on
Spark (non-UTC session tz, see conftest) and its oracle_sql() twin runs on
DuckDB; results must match order-insensitively after 6-decimal rounding.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from .oracle_check import run_pair

_PAIRS = sorted(entrymod.oracle_sql().keys())


@pytest.mark.parametrize("name", _PAIRS)
def test_query_matches_oracle(spark, duck, sf_dir, name):
    fn = entrymod.queries()[name]
    sql = entrymod.oracle_sql()[name]
    run_pair(spark, duck, fn, sql, sf_dir, name=name)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "bucket_epoch" in df.columns


def test_all_queries_have_callables(spark):
    qs = entrymod.queries()
    assert len(qs) >= 20
    for name, fn in qs.items():
        assert callable(fn), name


def test_fertility_byte_path_diverges_on_unicode(spark):
    """The synthetic corpus is pure ASCII, so the registry differential
    cannot distinguish chars from bytes — pin the byte path on unicode:
    Spark's octet_length counts UTF-8 bytes exactly like the DuckDB
    twin's strlen, and multi-byte scripts raise bytes_per_token above
    chars_per_token."""
    import duckdb
    from pyspark.sql import Row
    from pyspark.sql import functions as F

    import __spark_entry__ as entry
    from oracle_duckdb_sync_spark.functions import text as TX

    rows = [
        Row(doc_id=1, text="der die und das ist nicht über müde grüße straße"),
        Row(doc_id=2, text="the and is of to in über straße"),
    ]
    df = spark.createDataFrame(rows)
    toks = TX.tokens_expr(F.col("text"))
    sums = df.groupBy(TX.lang_id_expr(toks, F.col("text")).alias("lang")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.size(toks)).cast("long").alias("n_tokens"),
        F.sum(F.length("text")).cast("long").alias("n_chars"),
        F.sum(F.octet_length("text")).cast("long").alias("n_bytes"),
    )
    got = (
        sums.select(
            "lang",
            "n_chars",
            "n_bytes",
            entry._micro_ratio(F.col("n_chars"), F.col("n_tokens")).alias(
                "chars_per_token"
            ),
            entry._micro_ratio(F.col("n_bytes"), F.col("n_tokens")).alias(
                "bytes_per_token"
            ),
        )
        .orderBy("lang")
        .toPandas()
    )
    assert (got["n_bytes"] > got["n_chars"]).all()
    assert (got["bytes_per_token"] > got["chars_per_token"]).all()
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ", ".join("(%d, '%s')" % (r.doc_id, r.text) for r in rows)
        + ") t(doc_id, text)"
    )
    duck = (
        con.execute(entry.oracle_sql()["text_fertility_by_lang"])
        .fetchdf()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    for col in ("n_chars", "n_bytes", "chars_per_token", "bytes_per_token"):
        assert list(duck[col]) == list(got[col]), col
