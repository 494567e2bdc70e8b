"""Skew- and shuffle-management operators — the 100 TB toolbox.

The reference never needs these (DuckDB is single-node), but a Spark
engine at scale does; they complement AQE's runtime skew-join splitting
(enabled in session.py) with explicit techniques for the cases AQE
can't fix:

- :func:`salted_join` — equi-join where a handful of hot keys would
  pin one reducer: the big side gets a salt from a round-robin split,
  the small side is replicated ``salt_factor`` ways, and the join key
  becomes (key, salt). Trades ``salt_factor``× replication of the
  SMALL side for even distribution of the BIG side.
- :func:`salted_aggregate` — two-phase aggregation for skewed group
  keys with re-aggregatable functions (count/sum/min/max): partial
  aggregate on (key, salt), final on key. The first shuffle spreads a
  hot key over ``salt_factor`` reducers; the second moves one row per
  (key, salt).
- :func:`save_bucketed` / :func:`bucketed_join_ready` — persist a table
  bucketed+sorted by its join key so repeated joins on that key are
  co-located: no Exchange at all on either side at read time. This is
  the batch-warehouse answer to "this join runs every hour".
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    keys: Sequence[str],
    salt_factor: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-proof equi-join: salt the big side, replicate the small side.

    Result equals ``big.join(small, keys, how)`` for inner/left joins;
    the salt column never escapes. Use when one/few key values dominate
    the big side (AQE's skew split only helps sort-merge joins after
    the skewed shuffle already materialized).
    """
    big_salted = big.withColumn(
        SALT_COL, F.pmod(F.monotonically_increasing_id(), F.lit(salt_factor)).cast("int")
    )
    small_replicated = small.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(salt_factor - 1)).cast("array<int>"))
    )
    out = big_salted.join(small_replicated, [*keys, SALT_COL], how)
    return out.drop(SALT_COL)


# re-aggregatable functions: (partial agg, final agg over partials)
_REAGG = {
    "count": (lambda c: F.count(c), F.sum),
    "sum": (lambda c: F.sum(c), F.sum),
    "min": (lambda c: F.min(c), F.min),
    "max": (lambda c: F.max(c), F.max),
}


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    salt_factor: int = 8,
) -> DataFrame:
    """Two-phase aggregation for skewed keys.

    ``aggs`` maps output alias → (function, column) with function in
    count/sum/min/max (re-aggregatable). AVG callers compose sum+count.
    Spark's hash aggregate already does map-side partials; the explicit
    salt phase additionally spreads one hot key's FINAL aggregation
    over ``salt_factor`` reducers — relevant when a single key's
    partial rows still overwhelm one task at 100 TB.
    """
    for alias, (fn, _col) in aggs.items():
        if fn not in _REAGG:
            raise ValueError(f"{alias}: {fn} is not re-aggregatable")
    salt = F.pmod(F.monotonically_increasing_id(), F.lit(salt_factor)).cast("int")
    partial_exprs = [
        _REAGG[fn][0](F.col(col)).alias(f"__p_{alias}")
        for alias, (fn, col) in aggs.items()
    ]
    partial = df.withColumn(SALT_COL, salt).groupBy(*keys, SALT_COL).agg(*partial_exprs)
    final_exprs = [
        _REAGG[fn][1](F.col(f"__p_{alias}")).alias(alias)
        for alias, (fn, _col) in aggs.items()
    ]
    return partial.groupBy(*keys).agg(*final_exprs)


def save_bucketed(
    df: DataFrame,
    table: str,
    keys: Sequence[str],
    buckets: int = 32,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed+sorted managed table (co-located joins).

    Two tables bucketed by the same keys into the same bucket count
    join with ZERO exchanges — the classic pre-shuffle trade: pay one
    write-time partitioning, amortize it over every later join/agg on
    that key. (Parquet ``bucketBy`` requires ``saveAsTable``.)
    """
    (
        df.write.mode(mode)
        .bucketBy(buckets, *keys)
        .sortBy(*keys)
        .format("parquet")
        .saveAsTable(table)
    )


def bucketed_join_ready(spark: SparkSession, left: str, right: str, keys: Sequence[str]) -> DataFrame:
    """Join two same-bucketed tables on their bucket keys; with matching
    bucket specs Catalyst plans a SortMergeJoin with no Exchange on
    either side."""
    return spark.table(left).join(spark.table(right), list(keys))
