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
