"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry is a Spark-first implementation of an operator
from SURVEY.md §2 (reference file:line cited inline); ``oracle_sql()``
holds the equivalent ANSI SQL the driver runs on DuckDB over the same
parquet tables.

Determinism conventions (so the driver's order-insensitive value-hash
matches bit-for-bit):
- timestamps are emitted as epoch seconds/micros BIGINTs — immune to the
  session timezone of whichever SparkSession runs this;
- double aggregates that sum many values go through exact DECIMAL(38,6)
  sums on BOTH engines, then one double division/round — removes
  float-summation-order nondeterminism entirely;
- every LIMIT sits behind a total order (unique tiebreaker column).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from datetime import datetime, timezone
from functools import reduce

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from oracle_duckdb_sync_spark.functions.timefn import (
    format_compact_timestamp,
    parse_compact_timestamp,
)
from oracle_duckdb_sync_spark.functions import jsonfn as JX
from oracle_duckdb_sync_spark.operators import aggregate as A
from oracle_duckdb_sync_spark.operators import merge as M
from oracle_duckdb_sync_spark.operators import query as Q
from oracle_duckdb_sync_spark.sources.testdata import (
    ensure_ivf_base_index,
    ensure_ivf_index,
    ensure_minhash_store,
    ensure_pq_codes_seeded,
    ensure_silver_events,
    load_table,
)

SF0001 = "/root/testdata/sf0.001"

# fixed query parameters (epoch seconds, UTC instants of the stored values)
TS_JAN10 = 1704844800  # 2024-01-10
TS_JAN15 = 1705276800  # 2024-01-15
TS_JAN20 = 1705708800  # 2024-01-20
SHIP_CUTOFF = 946684800  # 2000-01-01 (lineitem shipdate mid-range)
ORDER_CUTOFF = 883612800  # 1998-01-01 (orders mid-range)


def _ts(epoch_s: int):
    """Timestamp literal from an epoch — timezone-proof on any session."""
    return F.timestamp_seconds(F.lit(epoch_s))


def _dt(epoch_s: int) -> datetime:
    """Python tz-aware datetime for the same instant (for library APIs)."""
    return datetime.fromtimestamp(epoch_s, tz=timezone.utc)


def _epoch_s(c) -> F.Column:
    return F.unix_seconds(c) if not isinstance(c, str) else F.unix_seconds(F.col(c))


def _epoch_us(c) -> F.Column:
    return F.unix_micros(F.col(c) if isinstance(c, str) else c)


def _limb_sum(q) -> F.Column:
    """Exact order-proof sum of a LONG column entirely in whole-stage
    codegen: split each value into three 21/21/22-bit limbs, sum each
    limb as a primitive long, recombine to DECIMAL(38,0) ONCE per
    group (the `moments='long'` kernel from operators/aggregate.py:358,
    applied to plain sums — VERDICT r13 #1). Replaces the per-row
    double→DECIMAL cast + object-path decimal aggregation, which was a
    12.9× constant-factor tax on the scan-agg family (tpch_q1,
    revenue_by_nation) that a 100-TB run would pay in full.

    Exactness: the limb identity q = (q>>42)·2^42 + ((q>>21)&m)·2^21 +
    (q&m) holds for every two's-complement long (arithmetic shift +
    unsigned mask), negatives included, and each limb partial stays
    below n·2^22 — no wrap below ~2^41 rows PER GROUP, far past any
    realistic partition. The recombined decimal equals the exact
    integer sum, so results are bit-identical to the DECIMAL(38,0)
    accumulation they replace."""
    return A.limb_sum(q)


def _dec_sum(c, alias: str, nd: int = 6) -> F.Column:
    """Exact double sum, order-proof: quantize to 10^nd integer units
    (exact for the ≤2-dp corpus columns this is applied to — the same
    precondition `_dec_avg` has always leaned on), limb-sum as
    primitive longs, one decimal→double conversion per group. Value-
    identical to the former per-row DECIMAL(38,6) accumulation on
    these inputs, without its object-path per-row cast. Quantizes with
    the primitive floor(x·s + 0.5) form — see `_cents` for why that
    equals round() on ≤2-dp data."""
    q = F.floor(c * F.lit(10**nd) + F.lit(0.5)).cast("long")
    return (_limb_sum(q).cast("double") / F.lit(float(10**nd))).alias(alias)


def _cents(c) -> F.Column:
    """Exact integer cents of a 2-dp double column, as a PRIMITIVE
    codegen expression: ``floor(x*100 + 0.5)``. For an exact ≤2-dp
    decimal stored as double (every money/rate column here — the same
    precondition `_dec_avg` documents), x*100 lands within a few ulp
    of an integer k, so floor(k±ε + 0.5) = k = round(x*100) on BOTH
    engines — value-identical to the former ``F.round`` form (proven
    by the full sf0.01/sf1 differentials) without its per-row
    BigDecimal shortest-repr path (~30% of the q1 scan-agg time).
    floor (toward −∞), not a long cast (toward 0), so the identity
    holds for negative amounts too. NOT for data that can land on
    true .5 midpoints of the scaled value (>2-dp inputs) — use
    ``F.round`` there, as operators/aggregate.py does for arbitrary
    user data."""
    return F.floor(c * 100 + F.lit(0.5)).cast("long")


def _dec_sum_cents(prod, scale: int, alias: str) -> F.Column:
    """Order- AND engine-proof sum of an exact integer-cents product:
    limb-split long accumulation (see `_limb_sum`), one double
    conversion at the end.

    Summing per-row double→DECIMAL(38,6) casts of a *product* is not
    engine-proof: Spark quantizes a double via its shortest decimal
    string while DuckDB rounds the binary value, and the two disagree
    when the product lands within 1 ulp of a 6-dp rounding boundary
    (~10 rows per 6M — found by the self-run sf1 differential, where
    tpch_q1.sum_charge drifted 1e-5 at 3.8e10 magnitude). Quantizing
    each 2-dp factor to integer cents first keeps every row in exact
    integer arithmetic on both engines; the limb recombination yields
    the same exact integer total the former DECIMAL(38,0) accumulate
    produced, bit-identically, per-row cost now primitive-long."""
    return (
        _limb_sum(prod).cast("double") / F.lit(float(scale))
    ).alias(alias)


def _dec_avg(c, alias: str, decimals: int = 2) -> F.Column:
    """Engine-proof mean at 6 dp for ≤`decimals`-digit inputs: quantize,
    exact integer sum, half-up integer division — no double ROUND at the
    end (ROUND(avg, 6) diverges between Spark and DuckDB when the true
    mean lands exactly on a .5 micro boundary; observed at sf0.1).

    The quantized sum rides the limb kernel: same cost class as the
    plain long SUM it replaces (three primitive long aggregates), but
    wrap-proof past 2^63 total — the long SUM would overflow silently
    around 1.5e11 rows/group of 1e7-cent values, i.e. inside a 100-TB
    group. Quantizes with the primitive floor(x·s + 0.5) form — see
    `_cents` for why that equals round() on ≤`decimals`-dp data."""
    q = F.floor(c * (10 ** decimals) + F.lit(0.5)).cast("long")
    return _dec_avg_q(q, alias, decimals)


def _dec_avg_q(q, alias: str, decimals: int = 2) -> F.Column:
    """`_dec_avg` over an ALREADY-quantized integer column (10^decimals
    units) — lets a staged select share one quantization between sums
    and avgs of the same column (q is null exactly when the raw value
    is, so the COUNT semantics are unchanged)."""
    s = _limb_sum(q)
    n = F.count(q)
    x = s * F.lit(2 * 10 ** (6 - decimals)) + n
    y = (n * 2).cast("decimal(38,0)")
    micro = (x - F.pmod(x, y)) / y  # exact floor division (pmod ⇒ valid for x<0 too)
    return (
        micro.cast("decimal(38,0)").cast("double") / F.lit(1_000_000.0)
    ).alias(alias)


def _micro_ratio(num, den) -> F.Column:
    """Half-up 6-dp ratio of two exact integer sums (the `_dec_avg`
    division kernel generalized to an arbitrary numerator): both sums
    ride as DECIMAL(38,0), the quotient is a floor division of
    2e6·num + den by 2·den — engine-proof against the .5 micro
    boundary, NULL when the denominator group is empty of tokens."""
    x = num.cast("decimal(38,0)") * F.lit(2_000_000) + den.cast("decimal(38,0)")
    y = (den * 2).cast("decimal(38,0)")
    micro = (x - F.pmod(x, y)) / y
    return F.when(
        den > 0, micro.cast("decimal(38,0)").cast("double") / F.lit(1_000_000.0)
    )


def _sql_micro_ratio(num: str, den: str) -> str:
    return (
        f"CASE WHEN {den} > 0 THEN CAST("
        f"(2000000::HUGEINT * {num} + {den}) // (2::HUGEINT * {den})"
        f" AS DOUBLE) / 1000000 END"
    )


# SQL fragments for the DuckDB side of the same conventions
def _sql_dec_sum(c: str, alias: str) -> str:
    return f"CAST(SUM(CAST({c} AS DECIMAL(38,6))) AS DOUBLE) AS {alias}"


def _sql_cents(c: str) -> str:
    return f"CAST(round(({c}) * 100) AS BIGINT)"


def _sql_dec_sum_cents(prod: str, scale: int, alias: str) -> str:
    """DuckDB twin of :func:`_dec_sum_cents` (exact integer product →
    DECIMAL(38,0) accumulate → one double conversion)."""
    return f"CAST(SUM(CAST({prod} AS DECIMAL(38,0))) AS DOUBLE) / {scale}.0 AS {alias}"


def _sql_floor_div(x: str, y: str) -> str:
    """SQL floor division via the pmod identity, mirroring Spark's
    ``x - pmod(x, y)``. DuckDB's ``//`` truncates toward zero
    (-7 // 2 = -3) while Spark's pmod formula floors (-4); after
    subtracting the pmod the quotient is exact, so ``//`` is safe."""
    return f"(({x} - ((({x}) % ({y}) + ({y})) % ({y}))) // ({y}))"


def _sql_dec_avg(c: str, alias: str, decimals: int = 2) -> str:
    """DuckDB twin of :func:`_dec_avg` (identical integer arithmetic,
    floor-division semantics matched for negative sums too)."""
    scale = 10 ** (6 - decimals)
    x = f"(2 * SUM(ROUND(({c}) * {10 ** decimals})::BIGINT) * {scale} + COUNT({c}))"
    y = f"(2 * COUNT({c}))"
    return f"{_sql_floor_div(x, y)} / 1000000.0 AS {alias}"


# ---------------------------------------------------------------------------
# query implementations — (spark_fn, duckdb_sql | None)
# ---------------------------------------------------------------------------

_REGISTRY: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {}


def _register(name: str, sql: str | None = None):
    def deco(fn):
        _REGISTRY[name] = (fn, sql)
        return fn

    return deco


def _timebucket_events(spark: SparkSession, sf_dir: str, interval: str) -> DataFrame:
    """D1/D2 flagship: tumbling time-bucket COUNT/AVG/MIN/MAX over events.

    Reference: data/query_core.py:198-263, data/query.py:984-1017.
    Plan shape: parquet scan → codegen bucket arithmetic → partial+final
    hash agg (one small shuffle keyed on bucket).
    """
    e = load_table(spark, sf_dir, "events")
    out = A.time_bucket_agg(e, "ts", interval, value_cols=["value"], exact_decimals=2)
    return out.select(
        _epoch_s(F.col("time_bucket")).alias("bucket_epoch"),
        F.col("point_count"),
        F.col("value_avg"),
        F.col("value_max"),
        F.col("value_min"),
    )


# exact integer average (values are 2-decimal): quantize to cents, exact
# sum, one half-up integer division to 6 dp — engine- and order-proof.
# ROUND(AVG(...), 6) is NOT safe here: when the true mean lands exactly on
# a .5 micro boundary Spark and DuckDB round the double differently
# (observed at sf0.1, bucket 25).
_EXACT_AVG_SQL = (
    _sql_floor_div(
        "(2 * SUM(ROUND({v} * 100)::BIGINT) * 10000 + COUNT({v}))",
        "(2 * COUNT({v}))",
    )
    + " / 1000000.0"
)


def _timebucket_sql(secs: int) -> str:
    avg = _EXACT_AVG_SQL.format(v="value")
    return f"""
    SELECT (FLOOR(epoch(ts) / {secs}) * {secs})::BIGINT AS bucket_epoch,
           COUNT(*) AS point_count,
           {avg} AS value_avg,
           MAX(value) AS value_max,
           MIN(value) AS value_min
    FROM events GROUP BY 1 ORDER BY 1
    """
for _iv, _secs in (("1m", 60), ("10m", 600), ("1h", 3600)):
    _interval = {"1m": "1 minute", "10m": "10 minutes", "1h": "1 hour"}[_iv]

    def _mk(interval):
        def fn(spark, sf_dir):
            return _timebucket_events(spark, sf_dir, interval)

        return fn

    _REGISTRY[f"timebucket_events_{_iv}"] = (_mk(_interval), _timebucket_sql(_secs))


@_register(
    "timebucket_strptime_10m",
    f"""
    WITH varchar_shaped AS (
        SELECT strftime(ts, '%Y%m%d%H%M%S') AS tran_time,
               CAST(value AS VARCHAR) AS value_s
        FROM events
    )
    SELECT (FLOOR(epoch(strptime(tran_time, '%Y%m%d%H%M%S')) / 600) * 600)::BIGINT
               AS bucket_epoch,
           COUNT(*) AS point_count,
           {_EXACT_AVG_SQL.format(v="TRY_CAST(value_s AS DOUBLE)")} AS value_avg,
           MAX(TRY_CAST(value_s AS DOUBLE)) AS value_max,
           MIN(TRY_CAST(value_s AS DOUBLE)) AS value_min
    FROM varchar_shaped GROUP BY 1 ORDER BY 1
    """,
)
def _q_strptime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1 Oracle-VARCHAR2 shape: 14-digit string time column + TRY_CAST
    value strings (data/query.py:984-1017, strptime at :1007)."""
    e = load_table(spark, sf_dir, "events")
    varchar_shaped = e.select(
        format_compact_timestamp(F.col("ts")).alias("tran_time"),
        F.col("value").cast("string").alias("value_s"),
    )
    out = A.time_bucket_agg(
        varchar_shaped, "tran_time", "10 minutes", value_cols=["value_s"],
        compact_strings=True, exact_decimals=2,
    )
    return out.select(
        _epoch_s(F.col("time_bucket")).alias("bucket_epoch"),
        F.col("point_count"),
        F.col("value_s_avg").alias("value_avg"),
        F.col("value_s_max").alias("value_max"),
        F.col("value_s_min").alias("value_min"),
    )


@_register(
    "watermark_read",
    f"""
    SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type, value
    FROM events WHERE ts > to_timestamp({TS_JAN15})
    ORDER BY ts, event_id LIMIT 500
    """,
)
def _q_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B3/H1: exclusive watermark read, ordered, limited
    (data/query_builder.py:57-102). Predicate pushes to parquet row-group
    stats; ORDER BY+LIMIT compiles to TakeOrderedAndProject (top-k)."""
    e = load_table(spark, sf_dir, "events")
    out = Q.watermark_read(e, "ts", _dt(TS_JAN15), limit=500, tiebreaker="event_id")
    return out.select(
        "event_id", _epoch_us("ts").alias("ts_us"), "user_id", "event_type", "value"
    )


@_register(
    "watermark_read_silver",
    f"""
    SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type, value
    FROM events WHERE ts > to_timestamp({TS_JAN15})
    ORDER BY ts, event_id LIMIT 500
    """,
)
def _q_watermark_silver(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B3/H1 on the production layout: same watermark contract as
    `watermark_read`, but against the silver events copy (native µs
    TimestampType, UTC-day partition dirs) where the predicate reaches
    BOTH PushedFilters and PartitionFilters (plan-asserted in
    tests/test_plans.py). The oracle is identical — the silver table is
    the same rows — so this entry also proves the relayout is lossless."""
    path = ensure_silver_events(spark, sf_dir)
    e = spark.read.parquet(path)
    out = Q.watermark_read_partitioned(
        e, "ts", "event_date", TS_JAN15 * 1_000_000, limit=500, tiebreaker="event_id"
    )
    return out.select(
        "event_id", _epoch_us("ts").alias("ts_us"), "user_id", "event_type", "value"
    )


@_register(
    "max_watermark",
    "SELECT epoch_us(MAX(ts)) AS max_ts_us, COUNT(*) AS row_count FROM events",
)
def _q_max_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D3: SELECT MAX(time_col) next-watermark extraction
    (database/sync_engine.py:213-218)."""
    e = load_table(spark, sf_dir, "events")
    return e.agg(
        F.max(_epoch_us("ts")).alias("max_ts_us"),
        F.count(F.lit(1)).alias("row_count"),
    )


@_register(
    "topk_recent",
    """
    SELECT event_id, epoch_us(ts) AS ts_us, event_type, value
    FROM events ORDER BY ts DESC, event_id DESC LIMIT 10
    """,
)
def _q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3 top-k recency (repository/sync_log_repo.py:204-234) —
    TakeOrderedAndProject, never a global sort."""
    e = load_table(spark, sf_dir, "events")
    out = Q.top_k_recent(e, "ts", 10, tiebreaker="event_id")
    return out.select("event_id", _epoch_us("ts").alias("ts_us"), "event_type", "value")


@_register(
    "range_filter",
    """
    SELECT event_id, value FROM events
    WHERE value >= 50.0 AND value <= 150.0 AND NOT isnan(value)
    """,
)
def _q_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B4 inclusive numeric range filter (ui/visualization.py:116-152)."""
    e = load_table(spark, sf_dir, "events")
    return Q.range_filter(e, "value", 50.0, 150.0).select("event_id", "value")


@_register(
    "time_range_filter",
    f"""
    SELECT event_id, epoch_us(ts) AS ts_us FROM events
    WHERE ts >= to_timestamp({TS_JAN10}) AND ts <= to_timestamp({TS_JAN20})
    """,
)
def _q_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B5 inclusive time-range filter (ui/visualization.py:249-266)."""
    e = load_table(spark, sf_dir, "events")
    out = Q.time_range_filter(e, "ts", _dt(TS_JAN10), _dt(TS_JAN20))
    return out.select("event_id", _epoch_us("ts").alias("ts_us"))


@_register(
    "point_read",
    "SELECT event_id, user_id, event_type, value FROM events WHERE user_id = 7",
)
def _q_point(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B6 equality point read (repository/sync_log_repo.py:152-234)."""
    e = load_table(spark, sf_dir, "events")
    return Q.point_read(e, user_id=7).select("event_id", "user_id", "event_type", "value")


@_register(
    "retention_filter",
    f"SELECT event_id, epoch_us(ts) AS ts_us FROM events WHERE ts >= to_timestamp({TS_JAN20})",
)
def _q_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B7 retention delete as filtered rewrite
    (repository/sync_log_repo.py:280-303), fixed cutoff for determinism."""
    e = load_table(spark, sf_dir, "events")
    out = Q.retention_filter(e, "ts", _dt(TS_JAN20))
    return out.select("event_id", _epoch_us("ts").alias("ts_us"))


@_register(
    "select_limited",
    "SELECT event_id, event_type, value FROM events ORDER BY event_id LIMIT 100",
)
def _q_select_limited(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B1 limited projection (data/query_builder.py:21-54) with a total
    order so the page is deterministic."""
    e = load_table(spark, sf_dir, "events")
    return Q.select_limited(
        e, columns=["event_id", "event_type", "value"], limit=100, order_by=["event_id"]
    )


@_register("count_rows", "SELECT COUNT(*) AS row_count FROM lineitem")
def _q_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B2 COUNT(*) (data/query_builder.py:153-167) — parquet footer counts."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(F.count(F.lit(1)).alias("row_count"))


@_register(
    "dedup_keep_last",
    """
    SELECT user_id, event_id, epoch_us(ts) AS ts_us, value FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    ) WHERE rn = 1
    """,
)
def _q_dedup_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C2/F2 order-aware dedup keep='last'
    (data/incremental_loader.py:196-244): latest event per user via one
    window — single hash shuffle on the key."""
    e = load_table(spark, sf_dir, "events")
    out = M.dedup_keep(e, ["user_id"], order_col=["ts", "event_id"], keep="last")
    return out.select("user_id", "event_id", _epoch_us("ts").alias("ts_us"), "value")


@_register(
    "upsert_merge",
    """
    WITH new_batch AS (
        SELECT o_orderkey, 'RESYNCED' AS o_orderstatus,
               ROUND(o_totalprice * 1.1, 6) AS o_totalprice
        FROM orders WHERE o_totalprice > 200000.0
    )
    SELECT o.o_orderkey, o.o_orderstatus, o.o_totalprice
    FROM orders o LEFT JOIN new_batch n ON o.o_orderkey = n.o_orderkey
    WHERE n.o_orderkey IS NULL
    UNION ALL
    SELECT o_orderkey, o_orderstatus, o_totalprice FROM new_batch
    """,
)
def _q_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1 UPSERT merge-on-key (database/duckdb_source.py:114-131):
    left-anti join + union; the small new batch is broadcast so the base
    table never shuffles."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    new_batch = o.filter(F.col("o_totalprice") > 200000.0).select(
        "o_orderkey",
        F.lit("RESYNCED").alias("o_orderstatus"),
        F.round(F.col("o_totalprice") * 1.1, 6).alias("o_totalprice"),
    )
    return M.upsert(o, new_batch, keys=["o_orderkey"], broadcast_new=True)


@_register(
    "merge_union_sort",
    f"""
    SELECT event_id, epoch_us(ts) AS ts_us FROM (
        SELECT event_id, ts FROM events WHERE ts <= to_timestamp({TS_JAN10})
        UNION ALL
        SELECT event_id, ts FROM events WHERE ts > to_timestamp({TS_JAN10})
                                          AND ts <= to_timestamp({TS_JAN20})
    ) ORDER BY ts_us, event_id
    """,
)
def _q_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 incremental merge: cached + delta union, sorted by time
    (data/incremental_loader.py:139-194)."""
    e = load_table(spark, sf_dir, "events").select("event_id", "ts")
    cached = e.filter(F.col("ts") <= _ts(TS_JAN10))
    delta = e.filter((F.col("ts") > _ts(TS_JAN10)) & (F.col("ts") <= _ts(TS_JAN20)))
    merged = M.merge_incremental(cached, delta, time_col="ts", sort=True)
    return merged.select("event_id", _epoch_us("ts").alias("ts_us"))


@_register(
    "conditional_rollup",
    f"""
    SELECT COUNT(*) AS total_count,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS F_count,
           CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS O_count,
           CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS P_count,
           {_sql_dec_avg("CASE WHEN o_orderstatus = 'F' THEN o_totalprice END",
                         "avg_totalprice")},
           CAST(SUM(CAST(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END
                     AS DECIMAL(38,6))) AS DOUBLE) AS sum_totalprice
    FROM orders
    """,
)
def _q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D5 conditional aggregates (repository/sync_log_repo.py:236-278) —
    one pass, SUM/AVG(CASE WHEN) with exact decimal accumulation."""
    o = load_table(spark, sf_dir, "orders")
    f_price = F.when(F.col("o_orderstatus") == "F", F.col("o_totalprice"))
    return o.agg(
        F.count(F.lit(1)).alias("total_count"),
        F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias("F_count"),
        F.sum(F.when(F.col("o_orderstatus") == "O", 1).otherwise(0)).alias("O_count"),
        F.sum(F.when(F.col("o_orderstatus") == "P", 1).otherwise(0)).alias("P_count"),
        _dec_avg(f_price, "avg_totalprice", decimals=2),
        _dec_sum(f_price, "sum_totalprice"),
    )


@_register(
    "summary_stats",
    f"""
    SELECT MIN(value) AS min_value, MAX(value) AS max_value,
           {_sql_dec_avg("value", "mean_value")},
           ROUND(STDDEV_SAMP(value), 6) AS std_value
    FROM events
    """,
)
def _q_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D6 column summary stats (ui/visualization.py:365-368)."""
    e = load_table(spark, sf_dir, "events")
    v = F.col("value")
    return e.agg(
        F.min(v).alias("min_value"),
        F.max(v).alias("max_value"),
        _dec_avg(v, "mean_value", decimals=2),
        F.round(F.stddev_samp(v), 6).alias("std_value"),
    )


@_register(
    "group_count",
    "SELECT event_type, COUNT(*) AS cnt FROM events GROUP BY event_type",
)
def _q_group_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-by count (catalog/UI stats shape, agent L2 surface)."""
    e = load_table(spark, sf_dir, "events")
    return A.group_count(e, "event_type")


@_register(
    "type_vote_numeric",
    """
    SELECT 'value_s' AS col_name,
           ROUND(AVG(CASE WHEN TRY_CAST(CAST(value AS VARCHAR) AS DOUBLE)
                     IS NOT NULL THEN 1 ELSE 0 END), 6) AS numeric_fraction
    FROM events
    UNION ALL
    SELECT 'event_type',
           ROUND(AVG(CASE WHEN TRY_CAST(event_type AS DOUBLE)
                     IS NOT NULL THEN 1 ELSE 0 END), 6)
    FROM events
    UNION ALL
    SELECT 'props',
           ROUND(AVG(CASE WHEN TRY_CAST(props AS DOUBLE)
                     IS NOT NULL THEN 1 ELSE 0 END), 6)
    FROM events
    """,
)
def _q_type_vote(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D7/J1 numeric-string type vote (data/converter.py:19-50): fraction
    of values that TRY_CAST to DOUBLE, whole-table for determinism (the
    production path samples 1000 rows)."""
    e = load_table(spark, sf_dir, "events")

    def vote(expr, name):
        return e.agg(
            F.round(
                F.avg(expr.try_cast("double").isNotNull().cast("int")), 6
            ).alias("numeric_fraction")
        ).select(F.lit(name).alias("col_name"), "numeric_fraction")

    return (
        vote(F.col("value").cast("string"), "value_s")
        .unionByName(vote(F.col("event_type"), "event_type"))
        .unionByName(vote(F.col("props"), "props"))
    )


@_register(
    "convert_14digit",
    """
    SELECT event_id,
           epoch(strptime(strftime(ts, '%Y%m%d%H%M%S'), '%Y%m%d%H%M%S'))::BIGINT
               AS parsed_epoch
    FROM events
    """,
)
def _q_convert14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3/G1 compact 14-digit timestamp parse (data/converter.py:114-165):
    VARCHAR yyyyMMddHHmmss → TimestampType, null-safe."""
    e = load_table(spark, sf_dir, "events")
    compact = format_compact_timestamp(F.col("ts"))
    return e.select(
        "event_id", F.unix_seconds(parse_compact_timestamp(compact)).alias("parsed_epoch")
    )


@_register(
    "tpch_q1_pricing_summary",
    f"""
    SELECT l_returnflag, l_linestatus,
           {_sql_dec_sum('l_quantity', 'sum_qty')},
           {_sql_dec_sum('l_extendedprice', 'sum_base_price')},
           {_sql_dec_sum_cents(
               f"{_sql_cents('l_extendedprice')} * (100 - {_sql_cents('l_discount')})",
               10**4, 'sum_disc_price')},
           {_sql_dec_sum_cents(
               f"{_sql_cents('l_extendedprice')} * (100 - {_sql_cents('l_discount')})"
               f" * (100 + {_sql_cents('l_tax')})",
               10**6, 'sum_charge')},
           {_sql_dec_avg('l_quantity', 'avg_qty')},
           {_sql_dec_avg('l_extendedprice', 'avg_price')},
           {_sql_dec_avg('l_discount', 'avg_disc')},
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= to_timestamp({SHIP_CUTOFF})
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def _q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 pricing summary — the engine-completeness / bench headline
    (beyond the reference's operator set, which has no joins or multi-agg
    scans). Single scan → partial+final hash agg on 6 tiny keys.

    Staged selects (the [[spark-plan-compile-cost]] pattern): each
    quantization and product is computed ONCE as a named attribute, so
    the limb-split aggregates reference plain longs — without the
    staging, every `_limb_sum` repeats its input tree 3× and codegen
    does not CSE across aggregate update expressions (measured 2× on
    this query at sf0.1)."""
    li = load_table(spark, sf_dir, "lineitem")
    pre = li.filter(F.col("l_shipdate") <= _ts(SHIP_CUTOFF)).select(
        "l_returnflag",
        "l_linestatus",
        _cents(F.col("l_quantity")).alias("__cq"),
        _cents(F.col("l_extendedprice")).alias("__cp"),
        _cents(F.col("l_discount")).alias("__cd"),
        _cents(F.col("l_tax")).alias("__ct"),
    )
    pre = pre.select(
        "l_returnflag", "l_linestatus", "__cq", "__cp", "__cd", "__ct",
        (F.col("__cp") * (100 - F.col("__cd"))).alias("__dp"),
    )
    pre = pre.select(
        "l_returnflag", "l_linestatus", "__cq", "__cp", "__cd", "__dp",
        (F.col("__dp") * (100 + F.col("__ct"))).alias("__ch"),
    )
    # sums/avgs reuse the shared cents attributes: value-identical to
    # quantizing each column independently (exact 2-dp inputs), one
    # quantization per column per row
    return (
        pre.groupBy("l_returnflag", "l_linestatus")
        .agg(
            (_limb_sum(F.col("__cq")).cast("double") / 100).alias("sum_qty"),
            (_limb_sum(F.col("__cp")).cast("double") / 100).alias(
                "sum_base_price"
            ),
            (_limb_sum(F.col("__dp")).cast("double") / 10**4).alias(
                "sum_disc_price"
            ),
            (_limb_sum(F.col("__ch")).cast("double") / 10**6).alias(
                "sum_charge"
            ),
            _dec_avg_q(F.col("__cq"), "avg_qty", decimals=2),
            _dec_avg_q(F.col("__cp"), "avg_price", decimals=2),
            _dec_avg_q(F.col("__cd"), "avg_disc", decimals=2),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@_register(
    "tpch_q3_shipping_priority",
    f"""
    SELECT l.l_orderkey,
           {_sql_dec_sum_cents(f"{_sql_cents('l.l_extendedprice')} * (100 - {_sql_cents('l.l_discount')})", 10**4, 'revenue')},
           epoch(o.o_orderdate)::BIGINT AS o_orderdate_epoch,
           o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < to_timestamp({ORDER_CUTOFF})
      AND l.l_shipdate > to_timestamp({ORDER_CUTOFF})
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l_orderkey LIMIT 10
    """,
)
def _q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style shipping priority: filters reach every scan, top-k
    via TakeOrderedAndProject — no global sort.

    No broadcast hints: orders and customer both scale with SF (at
    100 TB neither fits an executor), so the orderkey/custkey joins are
    declared unhinted — AQE converts them to broadcast at bench scale
    and keeps shuffled joins at cluster scale."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    joined = (
        li.filter(F.col("l_shipdate") > _ts(ORDER_CUTOFF))
        .join(
            o.filter(F.col("o_orderdate") < _ts(ORDER_CUTOFF)),
            li.l_orderkey == o.o_orderkey,
        )
        .join(
            c.filter(F.col("c_mktsegment") == "BUILDING"),
            o.o_custkey == c.c_custkey,
        )
    )
    return (
        joined.groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_dec_sum_cents(
            _cents(F.col("l_extendedprice")) * (100 - _cents(F.col("l_discount"))),
            10**4,
            "revenue",
        ))
        .select(
            "l_orderkey",
            "revenue",
            _epoch_s(F.col("o_orderdate")).alias("o_orderdate_epoch"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@_register(
    "revenue_by_nation",
    f"""
    SELECT n.n_name,
           {_sql_dec_sum_cents(f"{_sql_cents('l.l_extendedprice')} * (100 - {_sql_cents('l.l_discount')})", 10**4, 'revenue')},
           COUNT(*) AS line_count
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name ORDER BY n.n_name
    """,
)
def _q_revenue_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-join rollup (engine completeness). Only nation carries a
    broadcast hint (25 rows at every SF); orders/customer scale with the
    data, so their joins are unhinted — AQE broadcasts them at bench
    scale, shuffles at cluster scale. Column pruning keeps the shuffled
    payload to the join keys + 2 measures."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        # quantized product staged IN the scan projection: the joins
        # carry (key, one long) instead of two doubles, and the limb
        # aggregate reads a plain attribute (see tpch_q1's staging note)
        (
            _cents(F.col("l_extendedprice"))
            * (100 - _cents(F.col("l_discount")))
        ).alias("__dp"),
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    )
    return (
        joined.groupBy("n_name")
        .agg(
            (_limb_sum(F.col("__dp")).cast("double") / 10**4).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("line_count"),
        )
        .orderBy("n_name")
    )


TS_Q10_START = 875664000  # 1997-10-01 (one quarter before ORDER_CUTOFF)


@_register(
    "tpch_q10_returned_items",
    f"""
    SELECT c.c_custkey, c.c_name,
           {_sql_dec_sum_cents(f"{_sql_cents('l.l_extendedprice')} * (100 - {_sql_cents('l.l_discount')})", 10**4, 'revenue')},
           c.c_acctbal, n.n_name
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= to_timestamp({TS_Q10_START})
      AND o.o_orderdate < to_timestamp({ORDER_CUTOFF})
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
)
def _q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-style returned-item reporting: which customers returned
    the most revenue last quarter. Filters reach every scan (returnflag
    on lineitem, the quarter window on orders); only the 25-row nation
    join is hinted; the top-20 is TakeOrderedAndProject under a unique
    (revenue desc, c_custkey) order."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_nationkey"
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    li = load_table(spark, sf_dir, "lineitem")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    joined = (
        li.filter(F.col("l_returnflag") == "R")
        .join(
            o.filter(
                (F.col("o_orderdate") >= _ts(TS_Q10_START))
                & (F.col("o_orderdate") < _ts(ORDER_CUTOFF))
            ),
            li.l_orderkey == o.o_orderkey,
        )
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    )
    return (
        joined.groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            _dec_sum_cents(
                _cents(F.col("l_extendedprice")) * (100 - _cents(F.col("l_discount"))),
                10**4,
                "revenue",
            )
        )
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@_register(
    "tpch_q6_forecast_revenue",
    f"""
    SELECT {_sql_dec_sum_cents(f"{_sql_cents('l_extendedprice')} * {_sql_cents('l_discount')}", 10**4, 'revenue')},
           COUNT(*) AS line_count
    FROM lineitem
    WHERE l_shipdate <= to_timestamp({SHIP_CUTOFF})
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def _q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-style forecasting revenue: pure filter+aggregate — all
    three predicates reach the parquet scan (row-group pruning), the
    aggregation is a single partial+final pass, no shuffle of data rows."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") <= _ts(SHIP_CUTOFF))
            & F.col("l_discount").between(0.03, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            _dec_sum_cents(
                _cents(F.col("l_extendedprice")) * _cents(F.col("l_discount")),
                10**4,
                "revenue",
            ),
            F.count(F.lit(1)).alias("line_count"),
        )
    )


@_register(
    "tpch_q5_local_supplier_volume",
    f"""
    SELECT n.n_name,
           {_sql_dec_sum_cents(f"{_sql_cents('l.l_extendedprice')} * (100 - {_sql_cents('l.l_discount')})", 10**4, 'revenue')}
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA' AND o.o_orderdate < to_timestamp({ORDER_CUTOFF})
    GROUP BY n.n_name ORDER BY revenue DESC, n_name
    """,
)
def _q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style local-supplier volume: six-way star join.

    Broadcast hints only on the fixed-cardinality dims (nation = 25,
    region = 5 rows at every SF). orders/customer/supplier scale with
    the data, so their joins stay unhinted: AQE converts them to
    broadcast at bench scale and falls back to shuffled joins on a
    cluster, where forcing a broadcast of ~SF·150k filtered orders
    would OOM the executors.

    Join ORDER is load-bearing (Catalyst won't reorder without CBO
    stats): the ASIA region cut flows through the broadcast nation dim
    into BOTH scaling branches before any fact-sized shuffle —
    supplier shrinks to ~1/5 and cuts lineitem on suppkey, customer
    shrinks to ~1/5 (semi-join against the 5 ASIA nation keys) and
    cuts the date-filtered orders on custkey — so the widest join
    (lineitem ⋈ orders on orderkey) moves two pre-reduced sides. The
    local-supplier condition (c_nationkey = s_nationkey) evaluates
    where the branches meet; inner-join/filter commutativity keeps the
    result identical."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < _ts(ORDER_CUTOFF)
    ).select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA").select(
        "r_regionkey"
    )
    n_asia = n.join(F.broadcast(r), n.n_regionkey == F.col("r_regionkey"))
    s_asia = s.join(F.broadcast(n_asia), s.s_nationkey == n.n_nationkey)
    c_asia = c.join(
        F.broadcast(n_asia.select(F.col("n_nationkey").alias("__nk"))),
        c.c_nationkey == F.col("__nk"),
        "left_semi",
    )
    joined = (
        li.join(s_asia, li.l_suppkey == s.s_suppkey)
        .join(
            o.join(c_asia, o.o_custkey == c.c_custkey),
            li.l_orderkey == o.o_orderkey,
        )
        .filter(c.c_nationkey == s.s_nationkey)
    )
    return (
        joined.groupBy("n_name")
        .agg(_dec_sum_cents(
            _cents(F.col("l_extendedprice")) * (100 - _cents(F.col("l_discount"))),
            10**4,
            "revenue",
        ))
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


@_register(
    "set_ops_user_segments",
    """
    WITH clickers AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
         buyers   AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
         both_seg AS (SELECT user_id FROM clickers INTERSECT SELECT user_id FROM buyers),
         click_only AS (SELECT user_id FROM clickers EXCEPT SELECT user_id FROM buyers)
    SELECT 'click_and_buy' AS segment, user_id FROM both_seg
    UNION ALL
    SELECT 'click_only' AS segment, user_id FROM click_only
    ORDER BY segment, user_id
    """,
)
def _q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT set operations (user segmentation): both
    compile to semi/anti joins over distinct keys — no full-row
    comparison shuffle, only the key column moves."""
    e = load_table(spark, sf_dir, "events")
    clickers = e.filter(F.col("event_type") == "click").select("user_id").distinct()
    buyers = e.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    both_seg = clickers.intersect(buyers).select(
        F.lit("click_and_buy").alias("segment"), "user_id"
    )
    click_only = clickers.exceptAll(buyers).select(
        F.lit("click_only").alias("segment"), "user_id"
    )
    return both_seg.unionByName(click_only).orderBy("segment", "user_id")


@_register(
    "tpch_q4_order_priority",
    f"""
    SELECT o.o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate < to_timestamp({ORDER_CUTOFF})
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R'
      )
    GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority
    """,
)
def _q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-style priority check (EXISTS on returned lineitems —
    the synthetic lineitem has no commit/receipt dates): EXISTS compiles
    to a LEFT SEMI join — the probe side never duplicates rows, the
    build side carries only l_orderkey after its filter. Unhinted (both
    sides scale); AQE picks the physical join."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    late = li.filter(F.col("l_returnflag") == "R").select("l_orderkey")
    return (
        o.filter(F.col("o_orderdate") < _ts(ORDER_CUTOFF))
        .join(late, o.o_orderkey == late.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@_register(
    "customers_without_orders",
    """
    SELECT c.c_mktsegment, COUNT(*) AS n_customers
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment
    """,
)
def _q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS as a LEFT ANTI join (the set-difference workhorse —
    same physical shape the upsert path uses): customers that never
    ordered, rolled up by segment."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").select("o_custkey")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("c_mktsegment")
    )


# ---------------------------------------------------------------------------
# training-data pipeline operators (documents / embeddings tables)
# ---------------------------------------------------------------------------

from oracle_duckdb_sync_spark.functions import text as TX
from oracle_duckdb_sync_spark.operators import dedup as DD
from oracle_duckdb_sync_spark.operators import lm as LM
from oracle_duckdb_sync_spark.operators import multimodal as MM
from oracle_duckdb_sync_spark.operators import similarity as SIM

_TOKS_SQL = TX.tokens_sql("text")

# deterministic synthetic query vector (LCG literals — identical on both
# engines, no data dependency)
_ANN_DIM = 64
_ANN_QUERY = SIM._lcg_floats(_ANN_DIM, seed=99)
_ANN_QUERY_LIT = "[" + ", ".join(repr(v) for v in _ANN_QUERY) + "]"


@_register(
    "dedup_exact_groups",
    DD.exact_dedup_groups_sql("doc_id", "text", "documents"),
)
def _q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on text, survivor = min doc_id. One
    shuffle of (hash, id) pairs — document bodies never move."""
    d = load_table(spark, sf_dir, "documents")
    return DD.exact_dedup_groups(d, "doc_id", "text")


@_register(
    "dedup_boilerplate_spans",
    DD.boilerplate_dedup_sql("documents", "doc_id", "text", min_df=3, n_words=10),
)
def _q_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level boilerplate removal (C4/RefinedWeb cleaning): every
    10-word span occurring in ≥3 distinct documents (shared templates —
    here, the planted near-duplicate families) is stripped from every
    document, which reassembles from its surviving spans in order.
    Viral-unit semi-join + map-side span filter — no all-pairs step,
    no UDF, no global sort (the driver hash is order-insensitive and a
    100-TB cleaning pass would never globally sort its output; the
    former ORDER BY was ~1 s of the 3 s sf1 cost on both engines)."""
    d = load_table(spark, sf_dir, "documents")
    return DD.boilerplate_dedup(d, "doc_id", "text", min_df=3, unit=10)


@_register(
    "dedup_exact_substring",
    DD.exact_substring_dedup_sql("documents", "doc_id", "text", k=6)
    + " ORDER BY doc_id",
)
def _q_exact_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring dedup (the Lee et al. 2022 suffix-array pass,
    relational form): every run of ≥6 consecutive words occurring at
    ≥2 positions corpus-wide is cut from all but its globally-first
    occurrence, and documents reassemble from their surviving words.
    Complements MinHash (whole-document near-dups) and boilerplate
    removal (corpus-viral spans): this catches long verbatim passages
    shared between otherwise-distinct documents. All shuffles carry
    60-bit window fingerprints or (doc, position) longs — document
    bodies move only in the map stage and the final per-doc
    reassembly."""
    d = load_table(spark, sf_dir, "documents")
    return DD.exact_substring_dedup(d, "doc_id", "text", k=6).orderBy("doc_id")


@_register(
    "dedup_substring_rate_by_source",
    f"""
    WITH __cut AS (
        {DD.exact_substring_dedup_sql("documents", "doc_id", "text", k=6)}
    )
    SELECT d.source,
           COUNT(*)::BIGINT AS n_docs,
           SUM(c.n_words)::BIGINT AS n_words,
           SUM(c.n_removed)::BIGINT AS n_removed,
           {_sql_micro_ratio('SUM(c.n_removed)', 'SUM(c.n_words)')}
             AS removed_rate
    FROM __cut c JOIN documents d ON c.doc_id = d.doc_id
    GROUP BY d.source ORDER BY d.source
    """,
)
def _q_substring_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Verbatim-duplication rate per SOURCE — the crawl-feedback twin
    of ``dedup_rate_by_source`` for the exact-substring family: the
    fraction of each source's words cut as duplicated ≥6-word runs
    (a mirror/aggregator domain shows a high removed_rate long before
    whole documents near-dup). One substring pass + a map-side join to
    the source column + one bounded per-source aggregate; the ratio is
    the exact half-up integer-micro kernel shared with the other
    telemetry entries."""
    d = load_table(spark, sf_dir, "documents")
    cut = DD.exact_substring_dedup(d, "doc_id", "text", k=6)
    return (
        cut.join(d.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_words").cast("long").alias("n_words"),
            F.sum("n_removed").cast("long").alias("n_removed"),
        )
        .select(
            "source",
            "n_docs",
            "n_words",
            "n_removed",
            _micro_ratio(F.col("n_removed"), F.col("n_words")).alias(
                "removed_rate"
            ),
        )
        .orderBy("source")
    )


@_register(
    "dedup_exact_substring_incr",
    DD.exact_substring_dedup_incremental_sql(
        "documents", "doc_id % 2 = 0", "doc_id % 2 = 1", "doc_id", "text", k=6
    )
    + " ORDER BY doc_id",
)
def _q_exact_substring_incr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental exact-substring cut against a persisted fingerprint
    store (the daily-crawl position of the Lee et al. pass): the
    even-id half is the materialized corpus (ensure_substring_store),
    the odd-id half the new batch. Store reads prune to the batch's
    fingerprint buckets (PartitionFilters); ranks are store-first, so
    a run the corpus already holds is cut from every batch occurrence
    while batch-only repeats keep their first copy. The oracle replays
    store ∪ batch relationally with the same store-first ranking."""
    from oracle_duckdb_sync_spark.sources.testdata import (
        ensure_substring_store,
    )

    store = ensure_substring_store(spark, sf_dir, k=6)
    d = load_table(spark, sf_dir, "documents")
    new = d.filter(F.col("doc_id") % 2 == 1)
    # single consumer (the driver collects the report once):
    # materialize=False skips the eager localCheckpoint so the probe
    # runs as one job instead of checkpoint + re-read
    return DD.exact_substring_dedup_incremental(
        new, store, "doc_id", "text", k=6, update_store=False,
        materialize=False,
    ).orderBy("doc_id")


@_register(
    "fuzzy_match_customer_names",
    DD.fuzzy_pairs_sql(
        "SELECT c_custkey AS id, c_name AS k FROM customer WHERE c_custkey < 1500",
        max_distance=1,
        max_bucket=64,
    ),
)
def _q_fuzzy_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy key matching (entity resolution): customer-name pairs
    within Levenshtein distance 1, via the SymSpell deletion-variant
    equi-join — the drifting-key matcher an exact-key sync engine
    lacks. The key subset is bounded (c_custkey < 1500) so the
    contract's output is SF-stable; the operator itself scales by the
    variant-join + bucket cap, not the subset."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 1500)
    return DD.fuzzy_pairs(c, "c_custkey", "c_name", max_distance=1, max_bucket=64)


@_register(
    "dedup_ngram_jaccard",
    DD.ngram_jaccard_pairs_sql("doc_id", "text", "documents", 2, 0.35),
)
def _q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by word-bigram Jaccard ≥ 0.35 (the planted
    near-duplicate threshold): inverted-index candidates + exact
    verification."""
    d = load_table(spark, sf_dir, "documents")
    return DD.ngram_jaccard_pairs(d, "doc_id", "text", 2, 0.35)


@_register(
    "dedup_minhash_lsh",
    DD.minhash_dedup_pairs_sql("doc_id", "text", "documents", 32, 2, 8, 0.35),
)
def _q_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(32 perms)+LSH(8 bands) near-dup pairs, Jaccard-verified
    ≥ 0.35. The scale path: candidates come from an equi-join on band
    keys, so work is ~linear in corpus size."""
    d = load_table(spark, sf_dir, "documents")
    return DD.minhash_dedup_pairs(d, "doc_id", "text", 32, 2, 8, 0.35)


@_register(
    "dedup_rate_by_source",
    f"""
    WITH __pairs AS ({DD.minhash_dedup_pairs_sql("doc_id", "text", "documents", 32, 2, 8, 0.35)}),
    __dup AS (
        SELECT DISTINCT doc_id FROM (
            SELECT id_a AS doc_id FROM __pairs
            UNION ALL SELECT id_b AS doc_id FROM __pairs
        )
    ),
    __g AS (
        SELECT d.source, COUNT(*)::BIGINT AS n_docs,
               COUNT(__dup.doc_id)::BIGINT AS n_dup
        FROM documents d LEFT JOIN __dup ON d.doc_id = __dup.doc_id
        GROUP BY 1
    )
    SELECT source, n_docs, n_dup,
           {_sql_micro_ratio('n_dup', 'n_docs')} AS dup_rate
    FROM __g ORDER BY source
    """,
)
def _q_dedup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup rate per SOURCE — the crawl-prioritization telemetry a
    dedup pipeline feeds back upstream (a domain whose pages are mostly
    near-dups of each other isn't worth recrawling at full rate; the
    FineWeb/CCNet reports track exactly this curve). Pair generation is
    the standard banded MinHash engine (collision-bounded); members of
    any verified pair become a tiny distinct id set that left-joins the
    corpus, and the per-source aggregate is a map-side partial keyed on
    the domain (cardinality = sources, not docs). The rate is the exact
    half-up integer-micro ratio, so both engines hash identically."""
    d = load_table(spark, sf_dir, "documents")
    pairs = DD.minhash_dedup_pairs(d, "doc_id", "text", 32, 2, 8, 0.35)
    dup_ids = (
        pairs.select(F.col("id_a").alias("doc_id"))
        .unionByName(pairs.select(F.col("id_b").alias("doc_id")))
        .distinct()
        .withColumn("__dup", F.lit(1))
    )
    g = (
        d.select("doc_id", "source")
        .join(dup_ids, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.count("__dup").cast("long").alias("n_dup"),
        )
    )
    return g.select(
        "source",
        "n_docs",
        "n_dup",
        _micro_ratio(F.col("n_dup"), F.col("n_docs")).alias("dup_rate"),
    ).orderBy("source")


@_register(
    "dedup_minhash_incremental",
    "SELECT id_a, id_b, jaccard FROM ("
    + DD.minhash_dedup_pairs_sql("doc_id", "text", "documents", 32, 2, 8, 0.35)
    + ") WHERE id_a % 2 = 1 OR id_b % 2 = 1",
)
def _q_minhash_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental MinHash near-dup check against a persisted store
    (operators/dedup.py:minhash_dedup_incremental) — the daily-crawl
    loop: the even-id half of documents is the materialized corpus
    (ensure_minhash_store), the odd-id half the new batch. The store's
    band table is scanned once, never shuffled; the batch's band rows
    broadcast into the probe join. The verified pair set equals the
    full-corpus LSH pairs restricted to pairs touching the batch —
    which is the oracle: the batch SQL filtered to an odd id on either
    side."""
    store = ensure_minhash_store(spark, sf_dir)
    d = load_table(spark, sf_dir, "documents")
    new = d.filter(F.col("doc_id") % 2 == 1)
    _survivors, pairs = DD.minhash_dedup_incremental(
        new, store, "doc_id", "text", 32, 2, 8, 0.35, update_store=False
    )
    return pairs.select(
        F.least("id_a", "id_b").alias("id_a"),
        F.greatest("id_a", "id_b").alias("id_b"),
        "jaccard",
    )


@_register(
    "dedup_simhash_fp",
    f"SELECT doc_id, {DD.simhash_sql(_TOKS_SQL)} AS simhash FROM documents",
)
def _q_simhash_fp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """60-bit SimHash fingerprints — pure codegen bit-vote pipeline."""
    d = load_table(spark, sf_dir, "documents")
    return DD.simhash_fingerprints(d, "doc_id", "text")


@_register(
    "dedup_simhash_pairs",
    DD.simhash_pairs_sql("doc_id", "text", "documents", 4, 8),
)
def _q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: banded candidates, Hamming ≤ 4."""
    d = load_table(spark, sf_dir, "documents")
    return DD.simhash_pairs(d, "doc_id", "text", 4, 8)


@_register(
    "embed_cosine_topk",
    f"""
    SELECT vec_id, {SIM.cosine_sql('embedding', _ANN_QUERY_LIT)} AS cosine
    FROM embeddings ORDER BY cosine DESC, vec_id LIMIT 10
    """,
)
def _q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k (ANN baseline): map-only scoring →
    TakeOrderedAndProject; vectors never shuffle."""
    e = load_table(spark, sf_dir, "embeddings")
    return SIM.cosine_topk(e, _ANN_QUERY, 10)


@_register(
    "embed_srp_lsh_topk",
    SIM.srp_lsh_topk_sql("embeddings", _ANN_QUERY, 5, 8),
)
def _q_srp_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SRP-LSH ANN top-k: rerank only the query's hyperplane-sign
    bucket (1/256 of the corpus in expectation)."""
    e = load_table(spark, sf_dir, "embeddings")
    return SIM.srp_lsh_topk(e, _ANN_QUERY, 5, 8)


@_register(
    "embed_knn_join",
    SIM.knn_join_sql(
        "SELECT vec_id AS q_id, embedding AS __qvec FROM embeddings WHERE vec_id < 3",
        "embeddings",
        5,
    ),
)
def _q_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact k-NN join (3 broadcast queries × corpus, per-query top-5
    via window rank)."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    return SIM.knn_join(q, e, 5)


@_register(
    "embed_ivf_topk",
    SIM.ivf_topk_sql("embeddings", _ANN_QUERY, 5, n_centroids=8, n_probe=2),
)
def _q_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN top-k (the partition-pruned scale path): assign vectors
    to nearest-centroid cells, probe the 2 cells nearest the query,
    rerank exactly inside them. Centroids seeded deterministically with
    the first 8 corpus vectors (training is pluggable k-means —
    operators/similarity.py:train_ivf_centroids — seeded here so the
    SQL oracle can rebuild identical cells)."""
    e = load_table(spark, sf_dir, "embeddings")
    return SIM.ivf_topk(e, _ANN_QUERY, 5, _seed_centroids(sf_dir), n_probe=2)


def _seed_centroids(sf_dir: str, n: int = 8) -> list[tuple[int, list[float]]]:
    """First ``n`` corpus vectors as deterministic IVF centroids.

    A bounded driver-side read (at scale the centroids arrive from a
    k-means artifact, never a cluster job): pull the seed vectors
    straight from parquet with pyarrow rather than paying a Spark job
    per plan construction."""
    import pyarrow.parquet as pq

    tbl = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "<", n)],
    ).sort_by("vec_id")
    return [
        (int(i), [float(x) for x in v])
        for i, v in zip(tbl["vec_id"].to_pylist(), tbl["embedding"].to_pylist())
    ]


@_register(
    "embed_ivf_probe",
    SIM.ivf_topk_sql("embeddings", _ANN_QUERY, 5, n_centroids=8, n_probe=2),
)
def _q_ivf_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN top-k against the PERSISTED inverted file — the
    production probe path (VERDICT r4 #1: bench the engine, not just
    the on-the-fly oracle form). The cell-partitioned index is
    materialized once per testdata generation; the probe's
    ``cell IN (...)`` lands in PartitionFilters so the scan reads only
    the probed cell directories (plan-asserted in tests/test_plans.py).
    Same seeded centroids as ``embed_ivf_topk``, so the same SQL oracle
    verifies the persisted round-trip bit-exactly."""
    cents = _seed_centroids(sf_dir)
    path = ensure_ivf_index(spark, sf_dir, cents)
    return SIM.ivf_topk_from_index(spark, path, _ANN_QUERY, 5, cents, n_probe=2)


@_register(
    "embed_semantic_dedup",
    SIM.semantic_dedup_sql("embeddings", threshold=0.35, n_centroids=8)
    + " ORDER BY vec_id",
)
def _q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic dedup (SemDeDup, arXiv:2303.09540): drop documents
    whose embedding has a lower-id neighbor above threshold INSIDE its
    k-means cell — catches paraphrase/translation duplicates that
    n-gram dedup (MinHash/SimHash) cannot. Assignment is one map-only
    codegen pass over the corpus; the quadratic verify never crosses
    cell boundaries (Σ|cell|², not n²). Same seeded centroids as the
    IVF entries, so the SQL oracle rebuilds identical cells."""
    e = load_table(spark, sf_dir, "embeddings")
    # 0.35 drops 76 of 500 at sf0.01 (this synthetic corpus tops out
    # at pair-cosine 0.51; production embeddings use ~0.9+)
    return SIM.semantic_dedup(
        e, _seed_centroids(sf_dir), threshold=0.35
    ).orderBy("vec_id")


@_register(
    "embed_semantic_dedup_indexed",
    SIM.semantic_dedup_sql("embeddings", threshold=0.35, n_centroids=8)
    + " ORDER BY vec_id",
)
def _q_semantic_dedup_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup against the PERSISTED cell-partitioned IVF store — the
    recurring-pass shape: assignment is the directory layout, so the
    pass pays zero centroid arithmetic and scans cell-clustered files
    straight into the per-cell kernel. Same seeded centroids as
    ``embed_semantic_dedup``, so the same SQL oracle verifies the
    persisted round-trip bit-exactly."""
    path = ensure_ivf_index(spark, sf_dir, _seed_centroids(sf_dir))
    return SIM.semantic_dedup_from_index(spark, path, threshold=0.35).orderBy(
        "vec_id"
    )


@_register(
    "embed_semantic_dedup_incr",
    SIM.semantic_dedup_incremental_sql(
        "embeddings", "vec_id % 2 = 0", "vec_id % 2 = 1", threshold=0.35
    )
    + " ORDER BY id_a, id_b",
)
def _q_semantic_dedup_incr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental SemDeDup against a PERSISTED IVF store — the
    embedding twin of ``dedup_minhash_incremental`` and the
    daily-crawl shape for paraphrase dedup: the even-id half of
    embeddings is the materialized corpus (cell-partitioned index),
    the odd-id half the new batch. One assignment pass over the batch,
    a directory-pruned read of only the touched cells, and an
    asymmetric per-cell BLAS kernel — (|store|+|batch|)×|batch| flops,
    the store side never goes quadratic and is never rescanned beyond
    the probed cells. Pairs (id_a, id_b, cosine) with id_b the losing
    batch doc; the oracle replays the canonical-store rule (store
    always wins, lower id wins within the batch) over the same seeded
    cells."""
    cents = _seed_centroids(sf_dir)
    path = ensure_ivf_base_index(spark, sf_dir, cents)
    e = load_table(spark, sf_dir, "embeddings")
    new = e.filter(F.col("vec_id") % 2 == 1)
    _survivors, pairs = SIM.semantic_dedup_incremental(
        new, path, cents, threshold=0.35, update_index=False
    )
    return pairs.orderBy("id_a", "id_b")


@_register(
    "embed_semantic_decontaminate",
    SIM.semantic_decontaminate_sql(
        "SELECT vec_id, embedding FROM embeddings WHERE vec_id % 37 <> 0",
        "SELECT vec_id AS bench_id, embedding FROM embeddings WHERE vec_id % 37 = 0",
        threshold=0.3,
    )
    + " ORDER BY vec_id",
)
def _q_semantic_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space eval decontamination — the semantic half of the
    leakage pair (``decontaminate_overlap`` is the n-gram half): flag
    corpus docs within cosine threshold of ANY benchmark embedding
    (every 37th vector plays the eval set), reporting the worst hit.
    Bank broadcasts like a model; the corpus is scanned map-only with
    one BLAS matmul per Arrow batch and the best hit decided in-batch —
    ZERO shuffles, so at 100 TB it is a single read-only pass. Matmul
    prefilter + exact-fold re-verify keeps it hash-identical to the
    DuckDB twin (0.3 on this synthetic corpus ~ the 0.9+ production
    band; pair cosines top out at 0.51 here)."""
    e = load_table(spark, sf_dir, "embeddings")
    corpus = e.filter(F.col("vec_id") % 37 != 0)
    bank = e.filter(F.col("vec_id") % 37 == 0).select(
        F.col("vec_id").alias("bench_id"), "embedding"
    )
    return SIM.semantic_decontaminate(corpus, bank, threshold=0.3).orderBy("vec_id")


@_register(
    "embed_pq_probe",
    SIM.pq_topk_rerank_sql("embeddings", _ANN_QUERY, 10, shortlist_mult=8),
)
def _q_pq_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ read path against PERSISTED codes: the ADC scan reads the
    compressed code table (never the vectors — codegen m-lookup sum),
    shortlists 8×k candidates, and reranks exactly over only those ids.
    Codebooks are SEEDED from the first 16 corpus vectors (the same
    pluggable-training contract as the IVF entries — the k-means path
    ``train_pq_codebooks`` is pinned in pytest for score exactness and
    recall monotonicity), so the DuckDB oracle rebuilds the identical
    codebooks in SQL and replays the FULL encode→ADC→rerank pipeline
    value-exactly against the persisted code table."""
    path, books = ensure_pq_codes_seeded(spark, sf_dir)
    codes = spark.read.parquet(path)
    e = load_table(spark, sf_dir, "embeddings")
    return SIM.pq_topk_rerank(e, codes, _ANN_QUERY, books, 10, shortlist_mult=8)


_OPQ_PERM = SIM.stride_perm(_ANN_DIM, 8)


@_register(
    "embed_opq_probe",
    SIM.pq_topk_rerank_sql(
        "embeddings", _ANN_QUERY, 10, shortlist_mult=8, perm=_OPQ_PERM
    ),
)
def _q_opq_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPQ-PQ read path against PERSISTED rotated codes: identical ADC
    scan + exact-rerank shape as ``embed_pq_probe``, with an orthonormal
    rotation applied at train/encode/query time. The rotation here is
    the deterministic transpose-interleave permutation (the dimension-
    reallocation effect OPQ's learned rotation approximates) so the
    oracle can replay it as a SQL list re-index; the PARAMETRIC rotation
    (PCA basis, eigenvalue-balanced allocation, ``opq_rotation``) runs
    through the same ``rotation=`` code path and its recall-at-fixed-
    budget win is pinned in pytest on anisotropic vectors. Orthonormal
    rotations preserve cosines, so the exact rerank is untouched."""
    from oracle_duckdb_sync_spark.sources.testdata import ensure_pq_codes_seeded

    path, books = ensure_pq_codes_seeded(spark, sf_dir, perm=_OPQ_PERM)
    codes = spark.read.parquet(path)
    e = load_table(spark, sf_dir, "embeddings")
    return SIM.pq_topk_rerank(
        e,
        codes,
        _ANN_QUERY,
        books,
        10,
        shortlist_mult=8,
        rotation=SIM.perm_rotation(_OPQ_PERM),
    )


@_register(
    "embed_knn_join_blocked",
    SIM.knn_join_sql(
        "SELECT vec_id AS q_id, embedding AS __qvec FROM embeddings WHERE vec_id < 3",
        "embeddings",
        5,
    ),
)
def _q_knn_join_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-vectorized exact k-NN join (the scale engine for the
    ``embed_knn_join`` contract): broadcast query matrix, one BLAS
    matmul per corpus batch, batch-local top-k under the global
    (cosine desc, id asc) order, window-rank reduce. Matmul cosines
    equal the oracle's sequential fold at 6 dp on this data, so the
    engine carries the same full value-hash oracle as the expression
    form."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    return SIM.knn_join_blocked(q, e, 5).withColumn("cosine", F.round("cosine", 6))


@_register(
    "embed_knn_join_grid",
    SIM.knn_join_sql(
        "SELECT vec_id AS q_id, embedding AS __qvec FROM embeddings WHERE vec_id < 200",
        "embeddings",
        5,
    ),
)
def _q_knn_join_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Big-to-big exact k-NN join (the grid engine): both sides packed
    into hash blocks, one BLAS matmul per grid cell, per-query top-k
    under the global (cosine desc, id asc) order. The shape the
    broadcast engines cannot take — a query side that scales with the
    data — driven here with a 200-query slice so the DuckDB twin stays
    oracle-able."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 200).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    return SIM.knn_join_grid(q, e, 5).withColumn("cosine", F.round("cosine", 6))


@_register(
    "embed_neardup_blocked",
    SIM.embedding_neardup_pairs_sql("embeddings", 0.3),
)
def _q_embed_neardup_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked-matmul exact all-pairs near-duplicates (the scale engine
    for the ``embed_neardup_pairs`` contract, ~120×/core the
    interpreted form): block-grid self-join, one numpy matmul per block
    pair. The closest pair-cosine to the 0.3 threshold sits 7e-5 away
    on this data — far beyond matmul-vs-fold ulp noise — so membership
    and 6-dp values hash-match the same SQL oracle."""
    e = load_table(spark, sf_dir, "embeddings")
    return SIM.embedding_neardup_pairs_blocked(e, 0.3, n_blocks=8).withColumn(
        "cosine", F.round("cosine", 6)
    )


@_register(
    "embed_dim_stats",
    SIM.dim_stats_sql("embeddings"),
)
def _q_embed_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension embedding profile (n/mean/std/min/max) — the
    normalize-or-whiten precheck of a vector corpus. posexplode +
    same-stage partial agg keyed on the dim ordinal: the shuffle
    carries dim × n_partitions partial rows, never the vectors.
    Exact integer-micro moments (engine- and order-proof, SCALE.md)."""
    e = load_table(spark, sf_dir, "embeddings")
    return SIM.dim_stats(e)


@_register(
    "embed_dim_drift",
    SIM.dim_drift_sql(
        "(SELECT embedding FROM embeddings WHERE vec_id % 2 = 0) __ea",
        "(SELECT embedding FROM embeddings WHERE vec_id % 2 = 1) __eb",
    ),
)
def _q_embed_dim_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension drift between two embedding snapshots (even-id
    half as the baseline, odd-id half as the new crawl): exact
    integer-micro means per side, their delta, and the standardized
    mean difference — the retraining trigger for thresholds, IVF
    centroids, and PQ codebooks when the distribution moves. Two
    same-stage posexplode aggregates + one vector-width join; the
    vectors never shuffle."""
    e = load_table(spark, sf_dir, "embeddings")
    return SIM.dim_drift(
        e.filter(F.col("vec_id") % 2 == 0),
        e.filter(F.col("vec_id") % 2 == 1),
    )


@_register(
    "decontaminate_overlap",
    DD.contamination_pairs_sql(
        "SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1",
        "SELECT doc_id AS bench_id, text FROM documents WHERE doc_id % 2 = 0",
        shingle_k=3,
        threshold=0.4,
    ),
)
def _q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (eval-leakage scan): flag corpus docs
    (odd ids) whose shingle overlap covers ≥ 40% of some benchmark doc
    (even ids), reporting the worst match. Cross-table inverted-index
    join, df-capped on both posting lists — work scales with posting
    sizes, never |docs| × |bench|."""
    d = load_table(spark, sf_dir, "documents")
    docs = d.filter(F.col("doc_id") % 2 == 1)
    bench = d.filter(F.col("doc_id") % 2 == 0).select(
        F.col("doc_id").alias("bench_id"), "text"
    )
    return DD.contamination_pairs(docs, bench, shingle_k=3, threshold=0.4)


@_register(
    "text_repetition",
    (
        "SELECT doc_id, "
        + f"len({_TOKS_SQL}) AS n_tokens, "
        + TX.repetition_ratio_sql(_TOKS_SQL, 3)
        + " AS rep3 FROM documents"
    ),
)
def _q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition ratio (duplicated 3-gram fraction) —
    the Gopher-style boilerplate/keyword-stuffing signal the quality
    gate composes with. Pure codegen projection; every component value
    hash-checked against the DuckDB twin."""
    d = DD._parallel(load_table(spark, sf_dir, "documents"))
    toks = TX.tokens_expr(F.col("text"))
    return d.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        TX.repetition_ratio_expr(toks, 3).alias("rep3"),
    )


@_register(
    "text_top_tokens",
    TX.top_tokens_sql("documents"),
)
def _q_text_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary head (tokenizer-build counting pass): explode →
    same-stage partial count keyed on token (Zipf keeps the shuffle
    tiny) → TakeOrderedAndProject top-20 under (count desc, token)."""
    d = load_table(spark, sf_dir, "documents")
    return TX.top_tokens(d, "text", 20)


@_register(
    "embed_ann_recall",
    f"""
    WITH exact AS (
      SELECT vec_id FROM (
        SELECT vec_id, {SIM.cosine_sql('embedding', _ANN_QUERY_LIT)} AS cosine
        FROM embeddings ORDER BY cosine DESC, vec_id LIMIT 5
      )
    ),
    approx AS ({SIM.ivf_topk_sql('embeddings', _ANN_QUERY, 5, n_centroids=8, n_probe=2)})
    SELECT 0::BIGINT AS q_id,
           (SELECT COUNT(*) FROM exact)::BIGINT AS n_exact,
           (SELECT COUNT(*) FROM exact e JOIN approx a ON e.vec_id = a.vec_id)::BIGINT AS hits,
           (SELECT COUNT(*) FROM exact e JOIN approx a ON e.vec_id = a.vec_id)::DOUBLE
             / (SELECT COUNT(*) FROM exact) AS recall
    """,
)
def _q_embed_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of the IVF probe (n_probe=2 of 8 cells) against the
    exact top-5 — the measured quality side of the approximate index,
    through the same knn_recall evaluator the tuning loop uses. Both
    neighbor lists are k rows, so the check costs O(k) regardless of
    corpus size."""
    e = load_table(spark, sf_dir, "embeddings")
    q0 = F.lit(0).cast("long").alias("q_id")
    exact = SIM.cosine_topk(e, _ANN_QUERY, 5).select(q0, "vec_id")
    approx = SIM.ivf_topk(e, _ANN_QUERY, 5, _seed_centroids(sf_dir), n_probe=2).select(
        q0, "vec_id"
    )
    return SIM.knn_recall(exact, approx)


@_register(
    "embed_normalize",
    f"""
    SELECT vec_id, generate_subscripts(nv, 1)::BIGINT AS dim, unnest(nv) AS val
    FROM (
      SELECT vec_id, {SIM.l2_normalize_sql('embedding', 6)} AS nv
      FROM embeddings WHERE vec_id < 5
    )
    """,
)
def _q_embed_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 normalization (unit vectors) — after it a dot product IS the
    cosine, so retrieval kernels skip per-pair norms. Pure codegen array
    transform; the contract posexplodes five normalized vectors so the
    differential hashes every component."""
    e = load_table(spark, sf_dir, "embeddings")
    nv = SIM.l2_normalize_expr(F.col("embedding"), nd=6)
    return (
        e.filter(F.col("vec_id") < 5)
        .select("vec_id", F.posexplode(nv).alias("pos", "val"))
        .select("vec_id", (F.col("pos") + 1).cast("long").alias("dim"), "val")
    )


@_register(
    "value_quantiles",
    """
    SELECT event_type,
           ROUND(quantile_cont(value, 0.25), 6) AS q25,
           ROUND(quantile_cont(value, 0.5), 6) AS q50,
           ROUND(quantile_cont(value, 0.75), 6) AS q75,
           ROUND(quantile_cont(value, 0.95), 6) AS q95
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def _q_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact grouped quantiles (engine completeness: Spark `percentile`
    uses the same linear interpolation as DuckDB `quantile_cont`)."""
    e = load_table(spark, sf_dir, "events")
    pct = F.percentile(
        F.col("value"), F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75), F.lit(0.95))
    )
    return (
        e.groupBy("event_type")
        .agg(pct.alias("p"))
        .select(
            "event_type",
            *[F.round(F.col("p")[i], 6).alias(a)
              for i, a in enumerate(("q25", "q50", "q75", "q95"))],
        )
        .orderBy("event_type")
    )


@_register(
    "value_histogram",
    """
    SELECT FLOOR(value / 25)::BIGINT AS bin, COUNT(*) AS cnt
    FROM events GROUP BY 1 ORDER BY 1
    """,
)
def _q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram binning (dashboard building block): codegen
    bucket arithmetic + partial/final count, one tiny shuffle."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.floor(F.col("value") / 25).cast("long").alias("bin"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("bin")
    )


@_register(
    "embed_neardup_pairs",
    SIM.embedding_neardup_pairs_sql("embeddings", 0.3),
)
def _q_embed_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (exact all-pairs form —
    the SRP-bucketed variant is the scale path, `embed_srp_lsh_topk`).
    Threshold 0.3 keeps the gate differential at ~1k matched pairs
    (0.5 matched a single pair at sf0.01 — a near-vacuous check)."""
    e = load_table(spark, sf_dir, "embeddings")
    return SIM.embedding_neardup_pairs(e, 0.3, exact=True)


@_register(
    "text_lang_quality",
    (
        "SELECT doc_id, "
        + TX.lang_id_sql(_TOKS_SQL, "text")
        + " AS lang_pred, "
        + ", ".join(
            f"{v} AS {k}" for k, v in TX.quality_metrics_sql("text").items()
        )
        + " FROM documents"
    ),
)
def _q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID (stopword vote) + quality scoring (length/punct/
    stopword ratios) — the pre-training filter suite, one projection."""
    d = DD._parallel(load_table(spark, sf_dir, "documents"))
    toks = TX.tokens_expr(F.col("text"))
    metrics = TX.quality_metrics_exprs(F.col("text"))
    return d.select(
        "doc_id",
        TX.lang_id_expr(toks, F.col("text")).alias("lang_pred"),
        *[v.alias(k) for k, v in metrics.items()],
    )


@_register(
    "text_token_stats",
    f"""
    SELECT doc_id,
           len({_TOKS_SQL}) AS n_tokens,
           len(regexp_extract_all(lower(text), '\\w+|[^\\w\\s]')) AS n_bpe,
           {TX.rolling_fingerprint_sql(_TOKS_SQL)} AS fingerprint
    FROM documents
    """,
)
def _q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (whitespace + BPE-ish regex) and rolling-hash
    document fingerprinting."""
    # regex token splits + the rolling-hash fold are the heaviest pure-map
    # expressions in the text family; a single-file corpus scans as one
    # partition and would serialize them — spread first (no-op on
    # production multi-split scans)
    d = DD._parallel(load_table(spark, sf_dir, "documents"))
    toks = TX.tokens_expr(F.col("text"))
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(TX.bpe_tokens_expr(F.col("text"))).alias("n_bpe"),
        TX.rolling_fingerprint_expr(toks).alias("fingerprint"),
    )


@_register(
    "text_fertility_by_lang",
    f"""
    WITH sums AS (
      SELECT {TX.lang_id_sql(_TOKS_SQL, 'text')} AS lang,
             COUNT(*)::BIGINT AS n_docs,
             SUM(len({_TOKS_SQL}))::BIGINT AS n_tokens,
             SUM(length(text))::BIGINT AS n_chars,
             SUM(strlen(text))::BIGINT AS n_bytes
      FROM documents GROUP BY 1
    )
    SELECT lang, n_docs, n_tokens, n_chars, n_bytes,
           {_sql_micro_ratio('n_chars', 'n_tokens')} AS chars_per_token,
           {_sql_micro_ratio('n_bytes', 'n_tokens')} AS bytes_per_token
    FROM sums ORDER BY lang
    """,
)
def _q_text_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility by language — chars/token and bytes/token
    per detected language, the multilingual budgeting metric (how many
    model tokens a byte of each language costs decides mixture weights
    and effective context length; fertility skew is why byte-budgeted
    corpora under-represent high-fertility scripts). One map-side
    projection (lang vote + token/char/byte counts are all codegen)
    into a partial-agg groupBy on the language — shuffle carries one
    row per (language × partition). Ratios use the exact half-up
    integer-micro division, so both engines hash identically."""
    d = load_table(spark, sf_dir, "documents")
    toks = TX.tokens_expr(F.col("text"))
    sums = d.groupBy(
        TX.lang_id_expr(toks, F.col("text")).alias("lang")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.size(toks)).cast("long").alias("n_tokens"),
        F.sum(F.length("text")).cast("long").alias("n_chars"),
        F.sum(F.octet_length("text")).cast("long").alias("n_bytes"),
    )
    return sums.select(
        "lang",
        "n_docs",
        "n_tokens",
        "n_chars",
        "n_bytes",
        _micro_ratio(F.col("n_chars"), F.col("n_tokens")).alias("chars_per_token"),
        _micro_ratio(F.col("n_bytes"), F.col("n_tokens")).alias("bytes_per_token"),
    ).orderBy("lang")


@_register(
    "multimodal_features",
    MM.extract_features_sql("documents", "doc_id", "text"),
)
def _q_multimodal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing: binary content column → Arrow-batched
    mapInPandas feature extraction (decode stubbed deterministically;
    the Spark pipeline — schema, batching, UDF signature — is real)."""
    d = load_table(spark, sf_dir, "documents")
    media = MM.attach_media_columns(d, "text", "doc_id")
    return MM.rounded_features(MM.extract_features(media))


@_register(
    "multimodal_resize_plan",
    """
    SELECT doc_id AS media_id,
           ROUND(least(224.0 / ((doc_id % 640) + 32), 224.0 / ((doc_id % 480) + 32)), 6) AS scale,
           ROUND(((doc_id % 640) + 32) * least(224.0 / ((doc_id % 640) + 32), 224.0 / ((doc_id % 480) + 32)))::INT AS out_w,
           ROUND(((doc_id % 480) + 32) * least(224.0 / ((doc_id % 640) + 32), 224.0 / ((doc_id % 480) + 32)))::INT AS out_h,
           least(224.0 / ((doc_id % 640) + 32), 224.0 / ((doc_id % 480) + 32)) < 1.0 AS needs_downscale
    FROM documents
    """,
)
def _q_resize_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect-preserving resize planning — Catalyst arithmetic only;
    pixel work stays in the stubbed mapInPandas step."""
    d = load_table(spark, sf_dir, "documents")
    media = MM.attach_media_columns(d, "text", "doc_id")
    return MM.resize_plan(media, 224, 224)


@_register("lttb_downsample")  # no SQL oracle: order-sensitive algorithm
def _q_lttb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I1-I3 LTTB downsampling to 500 points over the events series
    (data/lttb.py:90-160). Genuinely non-SQL-expressible (each bucket's
    pick depends on the previous pick), so the driver records the
    rows-only check; invariants are pinned in tests/test_lttb.py."""
    from oracle_duckdb_sync_spark.operators.lttb import downsample_single_series

    e = load_table(spark, sf_dir, "events")
    series = e.select(_epoch_us("ts").alias("x"), F.col("value").alias("y")).orderBy("x")
    return downsample_single_series(series, "x", ["y"], threshold=500)


@_register(
    "lttb_invariants",
    """
    SELECT event_type,
           LEAST(500, COUNT(*)) AS n_points,
           MIN(epoch_us(ts)) AS first_x,
           MAX(epoch_us(ts)) AS last_x,
           CAST(0 AS BIGINT) AS foreign_points
    FROM events GROUP BY event_type
    """,
)
def _q_lttb_invariants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-verifiable LTTB contract (the pick sequence itself is
    order-sensitive and non-SQL-expressible, so `lttb_downsample` can
    only get a rows-only check): per series, exact LTTB output must
    (a) have exactly min(threshold, n) points, (b) preserve the first
    and last x of the series, and (c) contain only (x, y) pairs that
    exist in the source (foreign_points counts LTTB outputs that are
    not source rows — must be 0). Runs the distributed per-series
    `applyInPandas` path (one series per event_type); the oracle
    computes the same facts directly from the raw table."""
    from oracle_duckdb_sync_spark.operators.lttb import downsample

    e = load_table(spark, sf_dir, "events")
    series = e.select(
        _epoch_us("ts").alias("x"),
        F.col("value").alias("y"),
        F.col("event_type"),
    )
    ds = downsample(series, "x", ["y"], threshold=500, series_col="event_type")
    inv = ds.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_points"),
        F.min("x").alias("first_x"),
        F.max("x").alias("last_x"),
    )
    foreign = ds.join(series, on=["event_type", "x", "y"], how="left_anti").agg(
        F.count(F.lit(1)).alias("foreign_points")
    )
    return inv.crossJoin(foreign)


from oracle_duckdb_sync_spark.operators import pipeline as PL
from oracle_duckdb_sync_spark.operators import sampling as SP

_STRAT_RATES = {"en": 0.2, "de": 1.0, "fr": 1.0}


@_register(
    "sample_hash_10pct",
    SP.hash_sample_sql("documents", "doc_id", 0.10) + " ORDER BY doc_id",
)
def _q_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 10% Bernoulli sample keyed on hash(salt, doc_id) —
    reproducible across sessions/partitionings/appends, unlike
    df.sample(); map-side filter, zero shuffle at any scale."""
    d = load_table(spark, sf_dir, "documents")
    return SP.hash_sample(d, "doc_id", 0.10).orderBy("doc_id")


@_register(
    "sample_stratified_lang",
    """SELECT lang, COUNT(*) AS kept FROM ("""
    + SP.stratified_sample_sql("documents", "doc_id", "lang", _STRAT_RATES, 0.05)
    + ") GROUP BY lang ORDER BY lang",
)
def _q_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified rates per language (corpus rebalancing: downsample the
    dominant language, keep all low-resource) — one CASE over the hash
    bucket, still shuffle-free."""
    d = load_table(spark, sf_dir, "documents")
    kept = SP.stratified_sample(d, "doc_id", "lang", _STRAT_RATES, 0.05)
    return kept.groupBy("lang").agg(F.count(F.lit(1)).alias("kept")).orderBy("lang")


@_register(
    "sample_train_val_test",
    SP.split_assign_sql("(SELECT doc_id FROM documents)", "doc_id")
    + " ORDER BY doc_id",
)
def _q_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/val/test assignment by cumulative hash-bucket ranges —
    disjoint, exhaustive, append-stable; at scale the same pass feeds
    write.partitionBy('split')."""
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    return SP.split_assign(d, "doc_id").orderBy("doc_id")


@_register(
    "dedup_clusters",
    DD.duplicate_clusters_sql(
        DD.minhash_dedup_pairs_sql("doc_id", "text", "documents", 32, 2, 8, 0.35)
    ),
)
def _q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster closure: connected components (min-label
    propagation) over the MinHash-LSH pair graph. Pairwise dedup alone
    under-deletes chains (A~B, B~C, A≁C); clustering first is the
    corpus-dedup standard. Iterations = component diameter (shallow for
    near-dup clusters); each round is one shuffle join + min-agg with
    checkpointed lineage."""
    d = load_table(spark, sf_dir, "documents")
    pairs = DD.minhash_dedup_pairs(d, "doc_id", "text", 32, 2, 8, 0.35)
    return DD.duplicate_clusters(pairs)


# Shared closure SQL for the two cluster-consuming entries below — the
# same pair generator as dedup_clusters so the three entries triangulate
# (pairs → closure → consumer) on identical inputs.
_DOC_CLUSTERS_SQL = DD.duplicate_clusters_sql(
    DD.minhash_dedup_pairs_sql("doc_id", "text", "documents", 32, 2, 8, 0.35)
)


@_register(
    "dedup_cluster_reps",
    "SELECT doc_id, cluster_key, quality_score FROM ("
    + DD.cluster_representatives_sql(
        "SELECT doc_id, "
        + TX.quality_metrics_sql("text")["quality_score"]
        + " AS quality_score FROM documents",
        _DOC_CLUSTERS_SQL,
    )
    + ") __reps ORDER BY doc_id",
)
def _q_cluster_reps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-argmax survivor per duplicate cluster (Gopher/FineWeb
    keep-best rule) instead of min-id keep-first: corpus joins the
    small cluster map once; only clustered rows enter the row_number
    window, unclustered rows pass through shuffle-free."""
    d = load_table(spark, sf_dir, "documents")
    annotated = d.select(
        "doc_id",
        TX.quality_metrics_exprs(F.col("text"))["quality_score"].alias(
            "quality_score"
        ),
    )
    pairs = DD.minhash_dedup_pairs(d, "doc_id", "text", 32, 2, 8, 0.35)
    reps = DD.cluster_representatives(
        annotated, DD.duplicate_clusters(pairs), "doc_id", "quality_score"
    )
    return reps.select("doc_id", "cluster_key", "quality_score").orderBy("doc_id")


@_register(
    "sample_leakage_split",
    SP.leakage_safe_split_sql(
        "(SELECT doc_id FROM documents)", _DOC_CLUSTERS_SQL, "doc_id"
    )
    + " ORDER BY doc_id",
)
def _q_leakage_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val/test split: the split bucket hashes the
    duplicate-CLUSTER id (own id when unclustered), so near-duplicates
    can never straddle a split boundary — per-doc splitting leaks
    whenever dedup is soft. Same map-side bucket projection as
    sample_train_val_test after one AQE-sized join."""
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    docs = load_table(spark, sf_dir, "documents")
    pairs = DD.minhash_dedup_pairs(docs, "doc_id", "text", 32, 2, 8, 0.35)
    clusters = DD.duplicate_clusters(pairs)
    return SP.leakage_safe_split(d, clusters, "doc_id").orderBy("doc_id")


# DuckDB twin of the composed corpus-prep funnel (VERDICT r4 #6): the
# same gate → exact-dedup → LSH-closure chain as CTE-composed SQL, so
# the PIPELINE's survivorship stats — not just its constituent
# operators — are differentially verified.
_FUNNEL_GATED = (
    "(SELECT doc_id, text FROM documents "
    f"WHERE {TX.quality_metrics_sql('text')['quality_score']} >= 0.25)"
)
_FUNNEL_EXACT = f"""(
    SELECT doc_id, text FROM (
        SELECT doc_id, text,
               MIN(doc_id) OVER (PARTITION BY {DD.hash60_sql('text')}) AS __sid
        FROM {_FUNNEL_GATED} __g
    ) WHERE doc_id = __sid
) __ex"""
_FUNNEL_CLUSTERS = DD.duplicate_clusters_sql(
    DD.minhash_dedup_pairs_sql("doc_id", "text", _FUNNEL_EXACT, 32, 2, 8, 0.35)
)


@_register(
    "corpus_prep_funnel",
    f"""
    SELECT stage, "rows" FROM (
        SELECT 'input' AS stage, (SELECT COUNT(*) FROM documents) AS "rows"
        UNION ALL
        SELECT 'quality_gated', (SELECT COUNT(*) FROM {_FUNNEL_GATED} __a)
        UNION ALL
        SELECT 'exact_deduped', (SELECT COUNT(*) FROM {_FUNNEL_EXACT})
        UNION ALL
        SELECT 'neardup_deduped',
               (SELECT COUNT(*) FROM {_FUNNEL_EXACT})
               - (SELECT COUNT(*) FROM ({_FUNNEL_CLUSTERS}) __c
                  WHERE id <> cluster_id)
    ) ORDER BY stage
    """,
)
def _q_corpus_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed corpus-prep funnel's survivorship stats: annotate →
    quality gate → exact dedup → near-dup cluster closure, one row per
    stage. Verifies the PIPELINE composition (operators/pipeline.py),
    not just its parts — stage counts must match the oracle's CTE chain
    exactly."""
    d = load_table(spark, sf_dir, "documents")
    _corpus, stats = PL.prepare_corpus(
        d,
        min_quality=0.25,
        jaccard_threshold=0.35,
        num_perm=32,
        shingle_k=2,
        bands=8,
    )
    return stats.orderBy("stage")


# funnel WITH the semantic stage on (SemDeDup's pipeline position:
# after lexical dedup, over the survivors' embeddings — the lexical
# stages are cheaper per pair, so the quadratic-bounded semantic pass
# sees the smallest corpus). doc_id and vec_id share the id domain in
# the testdata, so the oracle joins embeddings to the lexical-survivor
# CTE and closes cosine pairs with the same recursive min-label rule.
_FUNNEL_NEARDUP = f"""(
    SELECT doc_id FROM {_FUNNEL_EXACT}
    WHERE doc_id NOT IN (
        SELECT id FROM ({_FUNNEL_CLUSTERS}) __fc WHERE id <> cluster_id
    )
) __nd"""
_FUNNEL_SEM_VECS = f"""(
    SELECT e.vec_id, e.embedding FROM embeddings e
    JOIN {_FUNNEL_NEARDUP} ON e.vec_id = __nd.doc_id
)"""
_FUNNEL_SEM_CLUSTERS = DD.duplicate_clusters_sql(
    SIM.embedding_neardup_pairs_sql(_FUNNEL_SEM_VECS, 0.3), tag="_sem"
)


@_register(
    "corpus_prep_funnel_semantic",
    f"""
    SELECT stage, "rows" FROM (
        SELECT 'input' AS stage, (SELECT COUNT(*) FROM documents) AS "rows"
        UNION ALL
        SELECT 'quality_gated', (SELECT COUNT(*) FROM {_FUNNEL_GATED} __a)
        UNION ALL
        SELECT 'exact_deduped', (SELECT COUNT(*) FROM {_FUNNEL_EXACT})
        UNION ALL
        SELECT 'neardup_deduped', (SELECT COUNT(*) FROM {_FUNNEL_NEARDUP})
        UNION ALL
        SELECT 'semantic_deduped',
               (SELECT COUNT(*) FROM {_FUNNEL_NEARDUP})
               - (SELECT COUNT(*) FROM ({_FUNNEL_SEM_CLUSTERS}) __sc
                  WHERE id <> cluster_id)
    ) ORDER BY stage
    """,
)
def _q_corpus_funnel_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus funnel with the optional SEMANTIC stage on — the full
    SemDeDup-paper pipeline shape (lexical gate → exact → MinHash-LSH
    closure → embedding-cosine closure over survivors). Verifies the
    composed pipeline including the blocked-matmul semantic engine and
    its min-id cluster survivorship, stage counts against the oracle's
    CTE chain."""
    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")
    _corpus, stats = PL.prepare_corpus(
        d,
        min_quality=0.25,
        jaccard_threshold=0.35,
        num_perm=32,
        shingle_k=2,
        bands=8,
        embeddings=e,
        embed_threshold=0.3,
        n_embed_blocks=8,
    )
    return stats.orderBy("stage")


# funnel with the semantic stage AND the eval-leakage gate on: the
# decontamination scan runs LAST (no contaminated doc may reach any
# split), over the semantic-dedup survivors' vectors, against the
# every-37th-vector "benchmark" bank.
_FUNNEL_SEMD_CLUSTERS = DD.duplicate_clusters_sql(
    SIM.embedding_neardup_pairs_sql(_FUNNEL_SEM_VECS, 0.45), tag="_semd"
)
_FUNNEL_SEM_SURV = f"""(
    SELECT doc_id FROM {_FUNNEL_NEARDUP}
    WHERE doc_id NOT IN (
        SELECT id FROM ({_FUNNEL_SEMD_CLUSTERS}) __scd WHERE id <> cluster_id
    )
) __ss"""
_FUNNEL_DECON_HITS = SIM.semantic_decontaminate_sql(
    f"""SELECT e.vec_id, e.embedding FROM embeddings e
        JOIN {_FUNNEL_SEM_SURV} ON e.vec_id = __ss.doc_id""",
    "SELECT vec_id AS bench_id, embedding FROM embeddings WHERE vec_id % 37 = 0",
    threshold=0.3,
)


@_register(
    "corpus_prep_funnel_decontam",
    f"""
    SELECT stage, "rows" FROM (
        SELECT 'input' AS stage, (SELECT COUNT(*) FROM documents) AS "rows"
        UNION ALL
        SELECT 'quality_gated', (SELECT COUNT(*) FROM {_FUNNEL_GATED} __a)
        UNION ALL
        SELECT 'exact_deduped', (SELECT COUNT(*) FROM {_FUNNEL_EXACT})
        UNION ALL
        SELECT 'neardup_deduped', (SELECT COUNT(*) FROM {_FUNNEL_NEARDUP})
        UNION ALL
        SELECT 'semantic_deduped', (SELECT COUNT(*) FROM {_FUNNEL_SEM_SURV})
        UNION ALL
        SELECT 'decontaminated',
               (SELECT COUNT(*) FROM {_FUNNEL_SEM_SURV})
               - (SELECT COUNT(*) FROM ({_FUNNEL_DECON_HITS}) __dc)
    ) ORDER BY stage
    """,
)
def _q_corpus_funnel_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus funnel with BOTH embedding stages on: semantic dedup
    after lexical dedup, then the eval-leakage decontamination gate
    LAST (every-37th vector plays the benchmark bank) — the full
    pre-training shape: no near-dup survives, and nothing cosine-close
    to the eval set reaches any split. Stage counts verified against
    the oracle's CTE replay of the whole chain, including the
    zero-shuffle broadcast-bank decontamination scan."""
    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")
    bank = e.filter(F.col("vec_id") % 37 == 0).select(
        F.col("vec_id").alias("bench_id"), "embedding"
    )
    _corpus, stats = PL.prepare_corpus(
        d,
        min_quality=0.25,
        jaccard_threshold=0.35,
        num_perm=32,
        shingle_k=2,
        bands=8,
        embeddings=e,
        embed_threshold=0.45,
        n_embed_blocks=8,
        decontaminate_bank=bank,
        decontaminate_threshold=0.3,
    )
    return stats.orderBy("stage")


# funnel with the CCNet-style LM fluency gate after lexical dedup: the
# bigram model trains on the near-dup survivors, docs over the NLL bar
# drop, and the oracle replays model-training + scoring as CTE SQL.
_FUNNEL_ND_DOCS = (
    "(SELECT d.doc_id, d.text FROM documents d "
    f"JOIN {_FUNNEL_NEARDUP} ON d.doc_id = __nd.doc_id)"
)
_FUNNEL_LM_SCORES = LM.lm_score_sql(
    _FUNNEL_ND_DOCS, LM.train_bigram_lm_sql(_FUNNEL_ND_DOCS, min_count=2)
)
_FUNNEL_LM_NLL = 3.41


@_register(
    "corpus_prep_funnel_lm",
    f"""
    SELECT stage, "rows" FROM (
        SELECT 'input' AS stage, (SELECT COUNT(*) FROM documents) AS "rows"
        UNION ALL
        SELECT 'quality_gated', (SELECT COUNT(*) FROM {_FUNNEL_GATED} __a)
        UNION ALL
        SELECT 'exact_deduped', (SELECT COUNT(*) FROM {_FUNNEL_EXACT})
        UNION ALL
        SELECT 'neardup_deduped', (SELECT COUNT(*) FROM {_FUNNEL_NEARDUP})
        UNION ALL
        SELECT 'lm_gated',
               (SELECT COUNT(*) FROM {_FUNNEL_NEARDUP})
               - (SELECT COUNT(*) FROM ({_FUNNEL_LM_SCORES}) __lms
                  WHERE nll > {_FUNNEL_LM_NLL})
    ) ORDER BY stage
    """,
)
def _q_corpus_funnel_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus funnel with the CCNet-position LM fluency gate on:
    bigram model trained on the near-dup survivors (training after
    dedup keeps boilerplate mass out of the counts), documents above
    the NLL bar dropped, short documents passed through unjudged.
    Count-verified per stage against the CTE replay of training +
    scoring."""
    d = load_table(spark, sf_dir, "documents")
    _corpus, stats = PL.prepare_corpus(
        d,
        min_quality=0.25,
        jaccard_threshold=0.35,
        num_perm=32,
        shingle_k=2,
        bands=8,
        lm_max_nll=_FUNNEL_LM_NLL,
    )
    return stats.orderBy("stage")


# funnel WITH the exact-substring stage on (the Lee et al. 2022
# suffix-array pass in its pipeline position: after exact dedup,
# before MinHash — near-dup banding then sees the TRIMMED text, so two
# documents that only shared a long verbatim passage no longer band
# together). The oracle replays the cut + empty-drop + trimmed-text
# LSH closure as CTE SQL.
_FUNNEL_SUBSTR = f"""(
    SELECT doc_id, text_clean AS text FROM (
        {DD.exact_substring_dedup_sql(_FUNNEL_EXACT, "doc_id", "text", k=6)}
    ) __s0 WHERE text_clean <> ''
) __sub"""
_FUNNEL_SUB_CLUSTERS = DD.duplicate_clusters_sql(
    DD.minhash_dedup_pairs_sql("doc_id", "text", _FUNNEL_SUBSTR, 32, 2, 8, 0.35),
    tag="_sub",
)


@_register(
    "corpus_prep_funnel_substring",
    f"""
    SELECT stage, "rows" FROM (
        SELECT 'input' AS stage, (SELECT COUNT(*) FROM documents) AS "rows"
        UNION ALL
        SELECT 'quality_gated', (SELECT COUNT(*) FROM {_FUNNEL_GATED} __a)
        UNION ALL
        SELECT 'exact_deduped', (SELECT COUNT(*) FROM {_FUNNEL_EXACT})
        UNION ALL
        SELECT 'substring_deduped', (SELECT COUNT(*) FROM {_FUNNEL_SUBSTR})
        UNION ALL
        SELECT 'neardup_deduped',
               (SELECT COUNT(*) FROM {_FUNNEL_SUBSTR})
               - (SELECT COUNT(*) FROM ({_FUNNEL_SUB_CLUSTERS}) __c
                  WHERE id <> cluster_id)
    ) ORDER BY stage
    """,
)
def _q_corpus_funnel_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus funnel with the exact-substring stage on: ≥6-word
    runs duplicated anywhere corpus-wide are cut from all but their
    first occurrence between exact dedup and the MinHash closure
    (the Lee et al. recipe order), documents left empty drop, and the
    near-dup banding runs over the trimmed text. Count-verified per
    stage against the CTE replay of the cut + closure chain."""
    d = load_table(spark, sf_dir, "documents")
    _corpus, stats = PL.prepare_corpus(
        d,
        min_quality=0.25,
        jaccard_threshold=0.35,
        num_perm=32,
        shingle_k=2,
        bands=8,
        substring_k=6,
    )
    return stats.orderBy("stage")


# keep-best funnel: value-verified (doc_id, quality, split) of every
# survivor — stage counts can't distinguish keep-best from keep-first
# (one survivor per cluster either way), so this oracle checks WHICH
# row survived and WHERE it landed.
_FUNNEL_EXACT_Q = (
    "(SELECT doc_id, "
    + TX.quality_metrics_sql("text")["quality_score"]
    + f" AS quality_score FROM {_FUNNEL_EXACT})"
)
_FUNNEL_KEEPBEST = (
    "(SELECT doc_id, quality_score FROM ("
    + DD.cluster_representatives_sql(_FUNNEL_EXACT_Q, _FUNNEL_CLUSTERS)
    + ") __kb)"
)


@_register(
    "corpus_prep_funnel_keepbest",
    SP.leakage_safe_split_sql(_FUNNEL_KEEPBEST, _FUNNEL_CLUSTERS, "doc_id")
    + " ORDER BY doc_id",
)
def _q_corpus_funnel_keepbest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus funnel with survivor_rule='best_quality' (quality-
    argmax member per dup cluster, the Gopher/FineWeb keep-best rule)
    and leakage_safe=True (split bucket keyed on the cluster id, so a
    later better member inherits the old survivor's split instead of
    re-rolling it). Value-verified: the oracle replays the gate →
    exact → closure → argmax → cluster-keyed split chain as CTE SQL
    and must match per-row, not per-count."""
    d = load_table(spark, sf_dir, "documents")
    corpus, _stats = PL.prepare_corpus(
        d,
        min_quality=0.25,
        jaccard_threshold=0.35,
        num_perm=32,
        shingle_k=2,
        bands=8,
        survivor_rule="best_quality",
        leakage_safe=True,
    )
    return corpus.select("doc_id", "quality_score", "split").orderBy("doc_id")


# ---------------------------------------------------------------------------
# event-analytics operators (sessionization, as-of, top-k/group, pivot,
# rollup, JSON extraction) — engine completeness beyond the reference
# ---------------------------------------------------------------------------

from oracle_duckdb_sync_spark.operators import timeseries as TSOP

_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@_register(
    "sessionize_events",
    TSOP.session_stats_sql("events", "user_id", "ts", 1800, "event_id"),
)
def _q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity): one shuffle by
    user, gap detection + numbering as windows inside the partition."""
    e = load_table(spark, sf_dir, "events")
    return TSOP.session_stats(e, "user_id", "ts", 1800, "event_id")


TS_JAN02 = 1704153600  # 2024-01-02 — first-day funnel window


@_register(
    "funnel_conversion",
    TSOP.funnel_counts_sql(
        f"(SELECT * FROM events WHERE ts < to_timestamp({TS_JAN02})) w",
        "user_id",
        "ts",
        "event_type",
        ["signup", "click", "purchase"],
    ),
)
def _q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel signup → click → purchase within the
    first day of events: per-step user counts where each step happens
    strictly after the user's earliest previous step (the window keeps
    the funnel discriminating — unbounded, every active user converts).
    One user-keyed aggregate per step + an equi-join per transition —
    the same hash partitioning reused down the funnel, each stage one
    row per qualifying user."""
    e = load_table(spark, sf_dir, "events").filter(F.col("ts") < _ts(TS_JAN02))
    return TSOP.funnel_counts(
        e, "user_id", "ts", "event_type", ["signup", "click", "purchase"]
    )


@_register(
    "time_weighted_avg_by_type",
    TSOP.time_weighted_avg_sql("events", "event_type", "ts", "value", "event_id"),
)
def _q_twa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average per event type (TimescaleDB time_weight
    semantics, left-closed step): irregular sampling doesn't bias the
    mean toward chatty periods. One lead-window + one aggregate on the
    key partitioning; integer-quantized value×duration products
    accumulate in DECIMAL(38,0) with one final double division."""
    e = load_table(spark, sf_dir, "events")
    return TSOP.time_weighted_avg(e, "event_type", "ts", "value", "event_id")


@_register(
    "cohort_retention_weekly",
    TSOP.cohort_retention_sql(
        "(SELECT * FROM events WHERE event_type = 'purchase') p",
        "user_id",
        "ts",
        86400,
    ),
)
def _q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle over purchase events, daily buckets:
    users bucketed by first-purchase day, counted in each later day
    they purchased again (purchases are sparse enough to make the
    triangle discriminate; every-event retention saturates on this
    synthetic data). Pure epoch-bucket arithmetic (timezone-proof);
    first-activity agg, distinct activity set, and their join all
    share the user-keyed partitioning."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    return TSOP.cohort_retention(e, "user_id", "ts", 86400)


@_register(
    "asof_join_events",
    """
    SELECT c.event_id, c.user_id, epoch_us(c.ts) AS ts_us, c.value,
           e.value AS value_asof
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    ASOF LEFT JOIN (
        SELECT user_id, ts, MAX(value) AS value
        FROM events WHERE event_type = 'error' GROUP BY user_id, ts
    ) e ON c.user_id = e.user_id AND c.ts >= e.ts
    """,
)
def _q_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of LEFT join: each click picks the user's most recent prior
    error value. Union-merge formulation — one shuffle by user_id, a
    running last(ignorenulls) window, no range-explosion theta-join;
    the oracle is DuckDB's native ASOF JOIN."""
    e = load_table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )
    errors = (
        e.filter(F.col("event_type") == "error")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("value"))
    )
    joined = TSOP.asof_join(clicks, errors, "user_id", "ts", ["value"])
    return joined.select(
        "event_id", "user_id", _epoch_us("ts").alias("ts_us"), "value", "value_asof"
    )


@_register(
    "topk_per_group",
    """
    SELECT event_type, rank_in_group, event_id, value
    FROM (
        SELECT event_type, event_id, value,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY value DESC, event_id) AS rank_in_group
        FROM events
    ) WHERE rank_in_group <= 3
    """,
)
def _q_topk_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 events by value per type: row_number window, one shuffle,
    per-partition heaps, tiny output."""
    e = load_table(spark, sf_dir, "events")
    return TSOP.top_k_per_group(
        e, ["event_type"], "value", 3, tiebreaker="event_id"
    ).select("event_type", "rank_in_group", "event_id", "value")


@_register(
    "pivot_value_by_type",
    "SELECT user_id, "
    + ", ".join(
        _sql_dec_avg(f"CASE WHEN event_type = '{t}' THEN value END", t)
        for t in _EVENT_TYPES
    )
    + " FROM events GROUP BY user_id",
)
def _q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long→wide): avg value per user × event type. Explicit
    pivot values skip Spark's extra distinct-discovery pass — one
    shuffle total; integer-exact means match the oracle's CASE
    aggregates order- and engine-independently."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("user_id").pivot("event_type", _EVENT_TYPES).agg(
        _dec_avg(F.col("value"), "v")
    )


@_register(
    "rollup_type_day",
    """
    SELECT coalesce(event_type, 'ALL') AS event_type,
           coalesce(day_idx, -1) AS day_idx,
           COUNT(*) AS cnt
    FROM (SELECT event_type, epoch_us(ts) // 86400000000 AS day_idx FROM events)
    GROUP BY ROLLUP(event_type, day_idx)
    """,
)
def _q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (type × day → type → grand total) in one
    pass — partial aggregation applies per grouping set; day index is
    tz-free integer division of epoch-µs."""
    e = load_table(spark, sf_dir, "events")
    base = e.select(
        "event_type", F.expr("unix_micros(ts) div 86400000000").alias("day_idx")
    )
    return (
        base.rollup("event_type", "day_idx")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.coalesce(F.col("event_type"), F.lit("ALL")).alias("event_type"),
            F.coalesce(F.col("day_idx"), F.lit(-1)).alias("day_idx"),
            "cnt",
        )
    )


@_register(
    "cube_type_day",
    """
    SELECT coalesce(event_type, 'ALL') AS event_type,
           coalesce(day_idx, -1) AS day_idx,
           COUNT(*) AS cnt
    FROM (SELECT event_type, epoch_us(ts) // 86400000000 AS day_idx FROM events)
    GROUP BY CUBE(event_type, day_idx)
    """,
)
def _q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE totals — every grouping-set combination (type × day, type,
    day, grand total) in one pass; the per-day-across-types slice is
    what ROLLUP's hierarchy can't produce. Same partial-agg-per-set
    machinery and tz-free integer day index as the rollup entry."""
    e = load_table(spark, sf_dir, "events")
    base = e.select(
        "event_type", F.expr("unix_micros(ts) div 86400000000").alias("day_idx")
    )
    return (
        base.cube("event_type", "day_idx")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.coalesce(F.col("event_type"), F.lit("ALL")).alias("event_type"),
            F.coalesce(F.col("day_idx"), F.lit(-1)).alias("day_idx"),
            "cnt",
        )
    )


from oracle_duckdb_sync_spark.operators import gapfill as GF
from oracle_duckdb_sync_spark.operators import sampling as SA


@_register(
    "gapfill_locf_10m",
    GF.time_bucket_gapfill_sql("events", "event_type", "ts", "value", 600, "locf"),
)
def _q_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled 10-minute buckets per event type, last observation
    carried forward (TimescaleDB time_bucket_gapfill + locf): the
    dashboard-continuity query the reference's plain time-bucket
    aggregate (data/query_core.py:198-263) can't answer. Gap rows are
    generated FROM the gaps (lead window + sequence explode) — no dense
    calendar grid, no grid join; cost is the output's own size. Exact
    half-up integer micro-unit means on both engines."""
    e = load_table(spark, sf_dir, "events")
    return GF.time_bucket_gapfill(e, "event_type", "ts", "value", 600, "locf")


@_register(
    "gapfill_linear_10m",
    GF.time_bucket_gapfill_sql("events", "event_type", "ts", "value", 600, "linear"),
)
def _q_gapfill_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same gap-filled buckets with exact-integer linear interpolation
    between the surrounding observed buckets (floor-division pmod
    identity — bit-identical in both engines, negative slopes
    included)."""
    e = load_table(spark, sf_dir, "events")
    return GF.time_bucket_gapfill(e, "event_type", "ts", "value", 600, "linear")


@_register(
    "counter_total_by_type",
    GF.counter_agg_sql("events", "event_type", "ts", "value", "event_id"),
)
def _q_counter_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monotonic-counter rollup with reset detection (TimescaleDB
    counter_agg): a value drop = counter restart, so the observed value
    is the post-reset increase. Uses the CHUNKED form — event_type is a
    few-valued key, so the plain per-key lag window is k mega-partitions
    no matter the corpus size; chunking the lag by (key, 6h) makes
    parallelism keys × chunks with a one-row carry per boundary
    (bit-identical totals; 2.1 -> 1.4 s at sf1, and the only shape that
    survives 100 TB of history on a handful of counter names)."""
    e = load_table(spark, sf_dir, "events")
    return GF.counter_agg_chunked(
        e, "event_type", "ts", "value", "event_id", chunk_seconds=21600
    )


@_register(
    "state_durations_user",
    GF.state_agg_sql(
        "(SELECT * FROM events WHERE user_id < 40) u", "user_id", "event_type", "ts", "event_id"
    ),
)
def _q_state_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-in-state per user (TimescaleDB state_agg, left-closed
    step): how long each user's last-seen event type held before the
    next event — uptime/incident-duration semantics without
    materializing per-second rows. Single shuffle (lead window + agg on
    the user partitioning)."""
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 40)
    return GF.state_agg(e, "user_id", "event_type", "ts", "event_id")


@_register(
    "incident_click_window",
    """
    SELECT e.event_id AS incident_id, COUNT(c.event_id) AS n_clicks
    FROM (SELECT * FROM events WHERE event_type = 'error') e
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON c.user_id = e.user_id
     AND epoch_us(c.ts) >= epoch_us(e.ts)
     AND epoch_us(c.ts) < epoch_us(e.ts) + 600000000
    GROUP BY 1 ORDER BY 1
    """,
)
def _q_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: clicks landing inside each error's 10-minute
    incident window, per user. Declared as a theta-join Spark would
    plan a quadratic BNLJ; interval_join buckets time instead — each
    incident explodes into ≤2 tumbling buckets, each click computes its
    bucket map-side, candidates come from a hash equi-join on
    (user, bucket), and the exact containment predicate prunes them.
    The DuckDB twin runs its native IEJoin over the same theta
    predicate — two engines, two genuinely different range-join
    algorithms, one answer."""
    e = load_table(spark, sf_dir, "events")
    errors = e.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("incident_id"),
        "user_id",
        F.col("ts").alias("start_ts"),
        F.timestamp_micros(F.unix_micros(F.col("ts")) + 600_000_000).alias("end_ts"),
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", "ts"
    )
    pairs = TSOP.interval_join(
        clicks, errors, ["user_id"], "ts", "start_ts", "end_ts", 600
    )
    counts = pairs.groupBy("incident_id").agg(F.count(F.lit(1)).alias("n_clicks"))
    return (
        errors.select("incident_id")
        .join(counts, "incident_id", "left")
        .na.fill({"n_clicks": 0})
        .orderBy("incident_id")
    )


@_register(
    "ohlc_by_type_10m",
    """
    SELECT event_type, bucket_s,
           (min(struct_pack(u := us, i := event_id, q := q))).q AS open_q,
           max(q) AS high_q,
           min(q) AS low_q,
           (max(struct_pack(u := us, i := event_id, q := q))).q AS close_q,
           COUNT(*) AS n
    FROM (
      SELECT event_type, event_id,
             epoch_us(ts) AS us,
             (epoch_us(ts) // 1000000) - (((epoch_us(ts) // 1000000) % 600 + 600) % 600) AS bucket_s,
             ROUND(value * 100)::BIGINT AS q
      FROM events
    )
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def _q_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC candlestick buckets (open/high/low/close per type × 10-min
    bucket) — the financial/sensor dashboard aggregate. Open/close are
    min/max over a (time, id, value) struct, so ties are impossible by
    construction (the id is unique) and both engines pick the same row
    without a window pass: ONE partial+final aggregate, no shuffle
    beyond it. Values in exact integer cents."""
    e = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    sec = F.unix_seconds(F.col("ts"))
    q = F.round(F.col("value") * 100, 0).cast("long")
    st = F.struct(us.alias("u"), F.col("event_id").alias("i"), q.alias("q"))
    return (
        e.select(
            "event_type",
            (sec - F.pmod(sec, F.lit(600))).alias("bucket_s"),
            st.alias("__st"),
            q.alias("__q"),
        )
        .groupBy("event_type", "bucket_s")
        .agg(
            F.min("__st").getField("q").alias("open_q"),
            F.max("__q").alias("high_q"),
            F.min("__q").alias("low_q"),
            F.max("__st").getField("q").alias("close_q"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("event_type", "bucket_s")
    )


@_register(
    "top_users_with_other",
    """
    WITH c AS (SELECT user_id, COUNT(*) AS cnt FROM events GROUP BY 1),
    r AS (SELECT user_id, cnt,
                 row_number() OVER (ORDER BY cnt DESC, user_id) AS rn
          FROM c)
    SELECT CASE WHEN rn <= 10 THEN user_id::VARCHAR ELSE 'OTHER' END AS label,
           SUM(cnt)::BIGINT AS cnt
    FROM r GROUP BY 1 ORDER BY 1
    """,
)
def _q_top_with_other(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-N + 'OTHER' rollup — the dashboard legend query (ten named
    series, everything else folded into one). The global rank runs over
    the already-aggregated one-row-per-key frame (input-size
    independent), so the single-partition window costs nothing at any
    corpus scale; the raw table sees only the partial+final count."""
    e = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    counts = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.orderBy(F.col("cnt").desc(), F.col("user_id"))
    ranked = counts.withColumn("rn", F.row_number().over(w))
    return (
        ranked.select(
            F.when(F.col("rn") <= 10, F.col("user_id").cast("string"))
            .otherwise(F.lit("OTHER"))
            .alias("label"),
            "cnt",
        )
        .groupBy("label")
        .agg(F.sum("cnt").alias("cnt"))
        .orderBy("label")
    )


@_register(
    "trailing_window_1h",
    """
    WITH q AS (
      SELECT event_id, event_type, epoch_us(ts) AS us,
             ROUND(value * 100)::BIGINT AS q
      FROM events WHERE user_id < 20
    ),
    w AS (
      SELECT event_id, event_type, us,
             SUM(q) OVER tw AS s,
             COUNT(q) OVER tw AS n
      FROM q
      WINDOW tw AS (
        PARTITION BY event_type ORDER BY us
        RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW
      )
    )
    SELECT event_id, event_type, us,
           (((2 * s * 10000 + n) - (((2 * s * 10000 + n) % (2 * n) + (2 * n)) % (2 * n))) // (2 * n))::BIGINT
             AS trail_avg_micro,
           n::BIGINT AS trail_n
    FROM w ORDER BY event_id
    """,
)
def _q_trailing_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 1-hour average per row (RANGE window frame over event
    time, per type): the moving-average a dashboard draws against
    irregular event arrivals — a time-range frame, not a row-count
    frame, so sparse and dense periods both average exactly one hour of
    history. One window stage on the (type) partitioning; the running
    sum stays in exact integer cents and the per-row mean is the
    repo-standard half-up integer division (both engines bit-identical).
    User-filtered to keep the contract row count bounded. This
    declarative form partitions by event_type — right for
    high-cardinality keys; for few-valued keys at scale the engine is
    `timeseries.trailing_agg_chunked` (chunked evaluation with
    boundary carry-in, parity-pinned in tests/test_gapfill.py)."""
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    from pyspark.sql import Window

    us = F.unix_micros(F.col("ts"))
    q = F.round(F.col("value") * 100, 0).cast("long")
    base = e.select(
        "event_id", "event_type", us.alias("us"), q.alias("__q")
    )
    tw = (
        Window.partitionBy("event_type")
        .orderBy("us")
        .rangeBetween(-3_600_000_000, 0)
    )
    s = F.sum("__q").over(tw).cast("decimal(38,0)")
    n = F.count("__q").over(tw).cast("decimal(38,0)")
    x = s * F.lit(2 * 10_000) + n
    y = n * 2
    avg_micro = ((x - F.pmod(x, y)) / y).cast("long")
    return (
        base.select(
            "event_id",
            "event_type",
            "us",
            avg_micro.alias("trail_avg_micro"),
            n.cast("long").alias("trail_n"),
        )
        .orderBy("event_id")
    )


from oracle_duckdb_sync_spark.sync import scd2 as SCD

_DIFF_OLD = (
    "(SELECT o_orderkey, o_totalprice::DECIMAL(12,2) AS price, o_orderstatus "
    "FROM orders WHERE o_orderkey % 7 <> 0) o_old"
)
_DIFF_NEW = (
    "(SELECT o_orderkey, (CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 1 "
    "ELSE o_totalprice END)::DECIMAL(12,2) AS price, o_orderstatus "
    "FROM orders WHERE o_orderkey % 3 <> 0) o_new"
)


@_register(
    "snapshot_diff_orders",
    SCD.snapshot_diff_sql(
        _DIFF_OLD, _DIFF_NEW, ["o_orderkey"], ["price", "o_orderstatus"]
    )
    + " ORDER BY o_orderkey",
)
def _q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff — classify every key across two table snapshots as
    inserted/updated/deleted/unchanged (the 'what would a sync do'
    dry-run the reference's overwrite loop can't answer). Two derived
    order snapshots (simulated deletions via modulo filters, price
    drift on every 5th key); ONE full-outer equi-join on the key, with
    non-key columns collapsed to an md5 digest per side so wide rows
    join on a fixed-size column. Prices compared as DECIMAL(12,2)
    strings — engine-stable rendering."""
    o = load_table(spark, sf_dir, "orders")
    price = F.col("o_totalprice").cast("decimal(12,2)")
    old = o.filter(F.col("o_orderkey") % 7 != 0).select(
        "o_orderkey", price.alias("price"), "o_orderstatus"
    )
    new = o.filter(F.col("o_orderkey") % 3 != 0).select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 5 == 0, F.col("o_totalprice") + 1)
        .otherwise(F.col("o_totalprice"))
        .cast("decimal(12,2)")
        .alias("price"),
        "o_orderstatus",
    )
    return SCD.snapshot_diff(
        old, new, ["o_orderkey"], ["price", "o_orderstatus"]
    ).orderBy("o_orderkey")


@_register(
    "text_chunks",
    TX.chunk_text_sql("documents", "doc_id", "text", 500, 100)
    + " ORDER BY doc_id, chunk_idx",
)
def _q_text_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking: split every document into 500-char
    windows with 100-char overlap — the pre-tokenization cut for a
    fixed training context. Pure codegen (sequence → posexplode →
    substring): a map-side row multiplier, no UDF, no shuffle; short
    docs yield themselves as one chunk."""
    d = load_table(spark, sf_dir, "documents")
    return TX.chunk_text(d, "doc_id", "text", 500, 100).orderBy(
        "doc_id", "chunk_idx"
    )


@_register(
    "cap_per_source",
    SA.cap_per_group_sql("documents", "doc_id", "source", 30) + " ORDER BY doc_id",
)
def _q_cap_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document quota (30/source): no boilerplate-heavy
    domain may dominate the corpus. Survivors are chosen by the
    content-stable hash bucket, not crawl order — reproducible and
    append-unbiased. One shuffle on the source key; emitted rows are
    bounded by sources × cap."""
    d = load_table(spark, sf_dir, "documents")
    return SA.cap_per_group(d, "doc_id", "source", 30).orderBy("doc_id")


@_register(
    "cap_per_source_skewsafe",
    "SELECT doc_id, source FROM ("
    + SA.cap_per_group_sql(
        "documents", "doc_id", "source", 30, skew_safe=True
    )
    + ") __c ORDER BY doc_id",
)
def _q_cap_per_source_skewsafe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB form of the per-source quota: exact group counts
    broadcast back as integer bucket thresholds PREFILTER each over-cap
    group to its smallest hash-bucket stripe (~4×cap rows expected)
    before the ranking window — a mega-domain no longer sorts in one
    window task (AQE skew splitting does not apply to window
    exchanges). Survivors are a prefix of the same (bucket, id) order
    the plain form ranks, so the output matches cap_per_group exactly
    (pinned in pytest); the oracle replays the identical integer
    threshold arithmetic."""
    d = load_table(spark, sf_dir, "documents")
    return (
        SA.cap_per_group(d, "doc_id", "source", 30, skew_safe=True)
        .select("doc_id", "source")
        .orderBy("doc_id")
    )


@_register(
    "anomaly_zscore_by_type",
    """
    WITH q AS (
      SELECT event_id, event_type, ROUND(value * 100)::BIGINT AS q FROM events
    ),
    w AS (
      SELECT event_id, event_type, q,
             COUNT(*) OVER (PARTITION BY event_type) AS n,
             SUM(q) OVER (PARTITION BY event_type) AS s,
             SUM(q * q) OVER (PARTITION BY event_type) AS ss
      FROM q
    )
    SELECT event_id, event_type, q
    FROM w
    WHERE (n * q - s) * (n * q - s) * (n - 1) > 9 * (n * ss - s * s) * n
    ORDER BY event_id
    """,
)
def _q_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3σ outlier detection per event type — the data-quality tripwire.
    The flag never touches floating point: z² > 9 rearranges to
    (n·q − s)²·(n−1) > 9·(n·ss − s²)·n over exact integer-cent sums
    (DECIMAL(38,0) / HUGEINT — valid to ~10⁹ rows per group at 5-digit
    cents; larger groups would chunk the comparison), so both engines
    flag the identical row set with no epsilon anywhere. One window
    partition per type over one shuffle, then a map-side filter."""
    e = load_table(spark, sf_dir, "events")
    q = F.round(F.col("value") * 100, 0).cast("long")
    base = e.select("event_id", "event_type", q.alias("q"))
    d = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    # per-type moments as a partial+final aggregate joined back — NOT a
    # window partitioned by type: with a handful of type values, a
    # window puts each type's ENTIRE 100 TB slice into one task, while
    # the aggregate shuffles one row per (type × partition) and the
    # join back is a few-row broadcast under AQE
    stats = base.groupBy("event_type").agg(
        d(F.count(F.lit(1))).alias("__n"),
        d(F.sum("q")).alias("__s"),
        d(F.sum(F.col("q") * F.col("q"))).alias("__ss"),
    )
    j = base.join(stats, "event_type")
    n, s, ss = F.col("__n"), F.col("__s"), F.col("__ss")
    dev = n * d(F.col("q")) - s
    return (
        j.filter(dev * dev * (n - 1) > F.lit(9) * (n * ss - s * s) * n)
        .select("event_id", "event_type", "q")
        .orderBy("event_id")
    )


_GK_PCTS = (0.25, 0.5, 0.75, 0.95)
_GK_EPS = 1.0 / 10_000  # approx_percentile's published rank error = 1/accuracy


@_register(
    "value_quantiles_approx",
    f"""
    SELECT event_type, p, COUNT(value) AS n_events,
           TRUE AS within_rank_bound
    FROM events CROSS JOIN (
      VALUES {", ".join(f"(CAST({p} AS DOUBLE))" for p in _GK_PCTS)}
    ) AS pp(p)
    WHERE value IS NOT NULL
    GROUP BY event_type, p ORDER BY event_type, p
    """,
)
def _q_quantiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The documented scale path for the quantile family: grouped
    `approx_percentile` (Greenwald-Khanna, accuracy 1/ε = 10 000). The
    exact form shuffles every raw value per group — inherent to
    exactness and fine at dashboard cardinalities, but at 100 TB the
    sketch's fixed-size partial state is the only shuffle-safe plan.
    Sketch VALUES are engine-specific (DuckDB uses t-digest), so the
    value oracle checks GK's published invariant instead: per
    (event_type, percentile), the returned value's rank interval
    [count(<v)+1, count(≤v)] must intersect
    [⌈p·n⌉−⌈ε·n⌉, ⌈p·n⌉+⌈ε·n⌉] — the exact guarantee the GK query
    makes (target rank ⌈p·n⌉, rank error ≤ targetError = ⌈ε·n⌉,
    ε = 1/accuracy) at any scale. The rank
    verification joins the 4·|types| sketch outputs back as a
    broadcast and re-counts in one pass; the oracle pins the bound to
    TRUE and hash-checks the group sizes. NULL values are excluded
    from n (and hence from target/terr) on BOTH sides — the sketch
    itself and the __le/__lt rank sums never see NULLs, so counting
    them would inflate the target rank against a smaller population
    and could spuriously flip the bound on a nullable column. The
    oracle's WHERE value IS NOT NULL also drops a hypothetical
    all-NULL type entirely, matching Spark (whose NULL sketch array
    never survives the explode) row-for-row."""
    e = load_table(spark, sf_dir, "events")
    pct = F.expr(
        "approx_percentile(value, array("
        + ", ".join(f"{p}D" for p in _GK_PCTS)
        + f"), {round(1 / _GK_EPS)})"
    )
    apx = (
        e.groupBy("event_type")
        .agg(pct.alias("__p"))
        .select(
            "event_type",
            F.explode(
                F.arrays_zip(
                    F.array(*[F.lit(p) for p in _GK_PCTS]).alias("p"),
                    F.col("__p").alias("v"),
                )
            ).alias("z"),
        )
        .select("event_type", F.col("z.p").alias("p"), F.col("z.v").alias("v"))
    )
    joined = (
        e.select("event_type", "value")
        .filter(F.col("value").isNotNull())
        .join(F.broadcast(apx), "event_type")
    )
    g = joined.groupBy("event_type", "p").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum((F.col("value") <= F.col("v")).cast("long")).alias("__le"),
        F.sum((F.col("value") < F.col("v")).cast("long")).alias("__lt"),
    )
    n = F.col("n_events").cast("double")
    target = F.ceil(F.col("p") * n).cast("double")  # GK's query pivot
    terr = F.ceil(F.lit(_GK_EPS) * n).cast("double")  # GK's targetError
    within = (F.col("__le") >= target - terr) & (
        F.col("__lt") + 1 <= target + terr
    )
    return g.select(
        "event_type", "p", "n_events", within.alias("within_rank_bound")
    ).orderBy("event_type", "p")


@_register(
    "tpch_q18_large_orders",
    """
    WITH big AS (
      SELECT l_orderkey, SUM(ROUND(l_quantity)::BIGINT)::BIGINT AS total_qty
      FROM lineitem GROUP BY 1
      HAVING SUM(ROUND(l_quantity)::BIGINT) > 250
    )
    SELECT c.c_custkey, o.o_orderkey,
           epoch_us(o.o_orderdate) AS orderdate_us,
           CAST(round(o.o_totalprice * 100) AS BIGINT) AS totalprice_cents,
           big.total_qty
    FROM big
    JOIN orders o ON o.o_orderkey = big.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY totalprice_cents DESC, o.o_orderkey LIMIT 100
    """,
)
def _q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-style large-volume orders: aggregate lineitem to one
    row per order, HAVING-filter to the big ones, then join orders and
    customer. The agg shrinks the fact table ~4× before any join
    touches it, the surviving set is tiny (HAVING prunes ~95%), and the
    top-100 compiles to TakeOrderedAndProject. All joins unhinted —
    AQE broadcasts the shrunken sides at bench scale, shuffles at
    cluster scale. Quantities and prices in exact integers."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    qty = F.round(F.col("l_quantity"), 0).cast("long")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(qty).alias("total_qty"))
        .filter(F.col("total_qty") > 250)
    )
    return (
        big.join(o, o.o_orderkey == big.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .select(
            "c_custkey",
            "o_orderkey",
            F.unix_micros(F.col("o_orderdate")).alias("orderdate_us"),
            _cents(F.col("o_totalprice")).alias("totalprice_cents"),
            "total_qty",
        )
        .orderBy(F.col("totalprice_cents").desc(), "o_orderkey")
        .limit(100)
    )


_Q19_SQL_COND = (
    "(p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)"
    " OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 20 AND l_quantity BETWEEN 10 AND 30)"
    " OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 20 AND 40)"
)


@_register(
    "tpch_q19_discounted_revenue",
    f"""
    SELECT {_sql_dec_sum_cents(f"{_sql_cents('l_extendedprice')} * (100 - {_sql_cents('l_discount')})", 10**4, 'revenue')},
           COUNT(*) AS line_count
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE {_Q19_SQL_COND}
    """,
)
def _q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19-style disjunctive-predicate revenue: three
    brand × size × quantity arms OR-ed together across the join. The
    part-side arms (brand, size) don't mix with lineitem columns until
    after the equi-join on partkey, so Catalyst keeps the join an
    equi-join and evaluates the disjunction as a post-join filter —
    no fallback to a nested-loop theta join. Revenue in exact integer
    cents × discount-complement hundredths."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    arm = lambda b, smax, qlo, qhi: (  # noqa: E731
        (F.col("p_brand") == b)
        & F.col("p_size").between(1, smax)
        & F.col("l_quantity").between(qlo, qhi)
    )
    cond = arm("Brand#12", 15, 1, 20) | arm("Brand#23", 20, 10, 30) | arm(
        "Brand#34", 25, 20, 40
    )
    return (
        li.join(p, p.p_partkey == li.l_partkey)
        .filter(cond)
        .agg(
            _dec_sum_cents(
                _cents(F.col("l_extendedprice"))
                * (F.lit(100) - _cents(F.col("l_discount"))),
                10**4,
                "revenue",
            ),
            F.count(F.lit(1)).alias("line_count"),
        )
    )


@_register(
    "tpch_q13_customer_distribution",
    """
    WITH per_cust AS (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c LEFT JOIN orders o
        ON o.o_custkey = c.c_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    )
    SELECT c_count, COUNT(*) AS custdist
    FROM per_cust GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def _q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13-style order-count distribution: LEFT OUTER join with a
    predicate on the preserved-side match (urgent orders don't count,
    but customers with only urgent orders still appear with count 0),
    then a two-level aggregation — per-customer counts, then the
    histogram of those counts. The ON-clause filter is pushed to the
    orders side *before* the join (legal for the non-preserved side of
    a left outer join), so urgent rows never enter the shuffle; the
    second aggregation runs over one row per customer, and the
    histogram is a few dozen rows."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


_Q16_SIZES = (1, 9, 17, 25, 33, 41, 49)


@_register(
    "tpch_q16_supplier_variety",
    f"""
    SELECT p.p_brand, p.p_size, COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#45'
      AND p.p_size IN {_Q16_SIZES}
      AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_size
    """,
)
def _q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16-style supplier variety (adapted: supplier-part pairs
    come from lineitem — the synthetic schema has no partsupp): distinct
    suppliers per (brand, size) for selected sizes, excluding
    blacklisted suppliers. NOT IN compiles to a LEFT ANTI join against
    the tiny blacklist (null-free key, so anti-join semantics are
    exact); COUNT(DISTINCT) becomes a two-phase aggregate — partial
    distinct per partition on (brand, size, suppkey), then the count —
    no row ever carries more than three narrow columns through the
    shuffle."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    bad = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    p = (
        load_table(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#45") & F.col("p_size").isin(*_Q16_SIZES)
        )
        .select("p_partkey", "p_brand", "p_size")
    )
    return (
        li.join(bad, li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_size")
    )


@_register(
    "tpch_q17_small_quantity_revenue",
    f"""
    WITH pq AS (
      SELECT l_partkey,
             SUM(CAST(round(l_quantity * 100) AS BIGINT))::BIGINT AS qty_sum_100,
             COUNT(*) AS n
      FROM lineitem GROUP BY l_partkey
    )
    SELECT {_sql_dec_sum_cents(_sql_cents('l.l_extendedprice'), 700, 'avg_yearly')},
           COUNT(*) AS line_count
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey AND p.p_brand = 'Brand#23'
    JOIN pq ON pq.l_partkey = l.l_partkey
    WHERE 5 * CAST(round(l.l_quantity * 100) AS BIGINT) * pq.n < pq.qty_sum_100
    """,
)
def _q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17-style small-quantity revenue: the correlated
    ``l_quantity < 0.2 * AVG(l_quantity) per part`` subquery
    decorrelated into an aggregate-then-join — lineitem aggregates to
    one (sum, count) row per part, joins back on partkey, and the
    threshold compares in exact integer arithmetic
    (``5·q·n < Σq``, both sides BIGINT — no float average whose last
    ulp could disagree between engines). The agg side shrinks to
    |parts| rows before the join; revenue accumulates in integer cents
    with one final division by 7 (the "yearly average" divisor)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#23")
        .select("p_partkey")
    )
    q100 = F.round(F.col("l_quantity") * 100, 0).cast("long")
    pq = li.groupBy(F.col("l_partkey").alias("pq_partkey")).agg(
        F.sum(q100).alias("qty_sum_100"), F.count(F.lit(1)).alias("n")
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(pq, li.l_partkey == pq.pq_partkey)
        .filter(F.lit(5) * q100 * F.col("n") < F.col("qty_sum_100"))
        .agg(
            _dec_sum_cents(_cents(F.col("l_extendedprice")), 700, "avg_yearly"),
            F.count(F.lit(1)).alias("line_count"),
        )
    )


_Q22_SEGMENTS = ("AUTOMOBILE", "BUILDING", "MACHINERY")


@_register(
    "tpch_q22_global_sales_opportunity",
    f"""
    WITH pos AS (
      SELECT c_custkey, c_mktsegment,
             CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
      FROM customer
      WHERE c_acctbal > 0.0 AND c_mktsegment IN {_Q22_SEGMENTS}
    ),
    stats AS (SELECT SUM(bal_cents)::BIGINT AS s, COUNT(*) AS n FROM pos)
    SELECT pos.c_mktsegment, COUNT(*) AS numcust,
           SUM(pos.bal_cents)::BIGINT AS totacctbal_cents
    FROM pos, stats
    WHERE pos.bal_cents * stats.n > stats.s
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = pos.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    GROUP BY pos.c_mktsegment ORDER BY pos.c_mktsegment
    """,
)
def _q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22-style sales opportunity: customers in target segments
    whose balance beats the segment-pool average and who never placed
    an *urgent* order (every synthetic customer has some order, so the
    anti-join keys on the urgent subset to keep the contract non-empty
    at every SF). The scalar AVG subquery is a one-row aggregate joined
    in by a broadcast nested loop of exactly one row (benign at any
    scale), and the comparison is cross-multiplied into integers
    (``bal·n > Σbal``) so no float average is ever materialized; NOT
    EXISTS is the LEFT ANTI join, probing with only the filtered
    orders' o_custkey."""
    c = load_table(spark, sf_dir, "customer")
    pos = c.filter(
        (F.col("c_acctbal") > 0.0) & F.col("c_mktsegment").isin(*_Q22_SEGMENTS)
    ).select(
        "c_custkey", "c_mktsegment", _cents(F.col("c_acctbal")).alias("bal_cents")
    )
    stats = pos.agg(
        F.sum("bal_cents").alias("s"), F.count(F.lit(1)).alias("n")
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    return (
        pos.crossJoin(stats)  # one-row aggregate side — broadcast, benign
        .filter(F.col("bal_cents") * F.col("n") > F.col("s"))
        .join(o, F.col("c_custkey") == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum("bal_cents").alias("totacctbal_cents"),
        )
        .orderBy("c_mktsegment")
    )


_Q8_NATION = "NATION_3"


@_register(
    "tpch_q8_market_share",
    f"""
    WITH rev AS (
      SELECT EXTRACT(year FROM DATE '1970-01-01'
               + ((epoch_us(o.o_orderdate) // 86400000000))::INT * INTERVAL 1 DAY
             )::BIGINT AS o_year,
             n2.n_name AS supp_nation,
             CAST(round(l.l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l.l_discount * 100) AS BIGINT)) AS vol
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN part p ON p.p_partkey = l.l_partkey AND p.p_type = 'ECONOMY'
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1 ON n1.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = n1.n_regionkey AND r.r_name = 'AMERICA'
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n2 ON n2.n_nationkey = s.s_nationkey
    )
    SELECT o_year,
           CAST(SUM(CAST(CASE WHEN supp_nation = '{_Q8_NATION}' THEN vol ELSE 0 END
                         AS DECIMAL(38,0))) AS DOUBLE)
           / CAST(SUM(CAST(vol AS DECIMAL(38,0))) AS DOUBLE) AS mkt_share
    FROM rev GROUP BY o_year ORDER BY o_year
    """,
)
def _q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8-style national market share: one nation's slice of
    ECONOMY-part revenue sold into AMERICA, per order year — the widest
    join in the registry (lineitem ⋈ orders ⋈ part ⋈ customer ⋈ nation
    ⋈ region ⋈ supplier ⋈ nation again). nation/region are broadcast
    (bounded dimensions); part/customer/supplier/orders stay unhinted
    so AQE broadcasts at bench scale and shuffles at cluster scale.

    Join ORDER is load-bearing: Catalyst does not reorder joins
    without CBO stats, so the written order is the executed order at
    every scale. The selective reductions run BEFORE the fact⋈fact
    shuffle — lineitem ⋈ ECONOMY-filtered part first (~1/|p_type| of
    lineitem survives), and orders is cut to AMERICA customers
    (region ≈ 1/5) before it ever meets lineitem — so the widest
    shuffle (lineitem ⋈ orders on orderkey) moves only pre-reduced
    rows. The supplier joins add the supp_nation label without
    reducing, so they come last.

    The share is a ratio of two exact integer sums (conditional
    numerator via CASE inside SUM — one pass, no self-join), divided
    once at the end; the order year is derived tz-free from epoch days
    (session timezone never touches it — the suite runs under
    America/New_York to prove that)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    p = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_type") == "ECONOMY")
        .select("p_partkey")
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n1 = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_nationkey"), F.col("n_name").alias("supp_nation")
    )
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    day_idx = F.expr("unix_micros(o_orderdate) div 86400000000").cast("int")
    o_year = F.year(F.date_add(F.to_date(F.lit("1970-01-01")), day_idx)).cast("long")
    vol = _cents(F.col("l_extendedprice")) * (
        F.lit(100) - _cents(F.col("l_discount"))
    )
    c_america = (
        c.join(F.broadcast(n1), c.c_nationkey == n1.n_nationkey)
        .join(F.broadcast(r), n1.n_regionkey == r.r_regionkey)
        .select("c_custkey")
    )
    o_america = o.join(c_america, o.o_custkey == F.col("c_custkey"))
    joined = (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(o_america, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("n2_nationkey"))
        .select(o_year.alias("o_year"), F.col("supp_nation"), vol.alias("vol"))
    )
    num = _limb_sum(
        F.when(F.col("supp_nation") == _Q8_NATION, F.col("vol")).otherwise(
            F.lit(0)
        )
    ).cast("double")
    den = _limb_sum(F.col("vol")).cast("double")
    return (
        joined.groupBy("o_year")
        .agg((num / den).alias("mkt_share"))
        .orderBy("o_year")
    )


@_register(
    "sample_weighted_quality",
    SP.weighted_sample_sql(
        "(SELECT doc_id, lang, length(text) AS text_len FROM documents) d",
        "doc_id",
        "text_len / 180.0",
    )
    + " ORDER BY doc_id",
)
def _q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Importance sampling: keep each document with probability equal
    to a quality proxy (length-based here), deterministically per
    (salt, doc_id) — the quality-weighted corpus subsetting step of a
    data mix. Map-side filter, zero shuffle, append-stable."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.length("text").alias("text_len")
    )
    return SP.weighted_sample(
        d, "doc_id", F.col("text_len") / F.lit(180.0)
    ).orderBy("doc_id")


@_register(
    "tpch_q14_promo_revenue",
    f"""
    SELECT
      100.0 * CAST(SUM(CAST(CASE WHEN p.p_type = 'PROMO' THEN
                 {_sql_cents('l.l_extendedprice')} * (100 - {_sql_cents('l.l_discount')})
               ELSE 0 END AS DECIMAL(38,0))) AS DOUBLE)
            / CAST(SUM(CAST({_sql_cents('l.l_extendedprice')} * (100 - {_sql_cents('l.l_discount')})
               AS DECIMAL(38,0))) AS DOUBLE) AS promo_pct,
      COUNT(*) AS line_count
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= to_timestamp({ORDER_CUTOFF})
      AND l.l_shipdate < to_timestamp({ORDER_CUTOFF + 30 * 86400})
    """,
)
def _q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-style promotion share: PROMO parts' percentage of one
    month's revenue — conditional numerator and total in the same
    single aggregate pass over the join (no self-join, no second
    scan), both as exact integer sums with one double division at the
    end. The shipdate window is pushed to the lineitem scan."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts(ORDER_CUTOFF))
        & (F.col("l_shipdate") < _ts(ORDER_CUTOFF + 30 * 86400))
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    vol = _cents(F.col("l_extendedprice")) * (
        F.lit(100) - _cents(F.col("l_discount"))
    )
    num = _limb_sum(
        F.when(F.col("p_type") == "PROMO", vol).otherwise(F.lit(0))
    ).cast("double")
    den = _limb_sum(vol).cast("double")
    return li.join(p, li.l_partkey == p.p_partkey).agg(
        (F.lit(100.0) * num / den).alias("promo_pct"),
        F.count(F.lit(1)).alias("line_count"),
    )


_Q7_PAIRS = (("NATION_1", "NATION_2"), ("NATION_2", "NATION_1"))


@_register(
    "tpch_q7_volume_shipping",
    f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           EXTRACT(year FROM DATE '1970-01-01'
             + ((epoch_us(l.l_shipdate) // 86400000000))::INT * INTERVAL 1 DAY
           )::BIGINT AS l_year,
           {_sql_dec_sum_cents(f"{_sql_cents('l.l_extendedprice')} * (100 - {_sql_cents('l.l_discount')})", 10**4, 'revenue')}
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
    JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
    WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
       OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
    """,
)
def _q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-style volume shipping: bilateral trade between two
    nations per shipping year. The nation-PAIR disjunction constrains
    two different join branches (supplier's nation × customer's
    nation) — Catalyst keeps every join an equi-join; the pair
    predicate evaluates where the two branches meet.

    Join ORDER is load-bearing (Catalyst won't reorder without CBO
    stats): each 2-nation broadcast filter reduces its OWN branch
    before any fact-sized shuffle — supplier shrinks to ~2/25 and cuts
    lineitem on suppkey, customer shrinks to ~2/25 and cuts orders on
    custkey — so the widest join (lineitem ⋈ orders on orderkey) moves
    two pre-reduced sides instead of running full-fact⋈full-fact first
    and filtering after. Year is tz-free epoch arithmetic; revenue in
    exact integer cents."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    wanted = {n for pair in _Q7_PAIRS for n in pair}
    n1 = (
        load_table(spark, sf_dir, "nation")
        .filter(F.col("n_name").isin(*wanted))
        .select(
            F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
        )
    )
    n2 = (
        load_table(spark, sf_dir, "nation")
        .filter(F.col("n_name").isin(*wanted))
        .select(
            F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
        )
    )
    day_idx = F.expr("unix_micros(l_shipdate) div 86400000000").cast("int")
    l_year = F.year(F.date_add(F.to_date(F.lit("1970-01-01")), day_idx)).cast("long")
    pair_ok = reduce(
        lambda a, b: a | b,
        (
            (F.col("supp_nation") == sn) & (F.col("cust_nation") == cn)
            for sn, cn in _Q7_PAIRS
        ),
    )
    s_pair = s.join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
    c_pair = c.join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
    return (
        li.join(s_pair, li.l_suppkey == s.s_suppkey)
        .join(
            o.join(c_pair, o.o_custkey == c.c_custkey),
            li.l_orderkey == o.o_orderkey,
        )
        .filter(pair_ok)
        .groupBy("supp_nation", "cust_nation", l_year.alias("l_year"))
        .agg(
            _dec_sum_cents(
                _cents(F.col("l_extendedprice"))
                * (F.lit(100) - _cents(F.col("l_discount"))),
                10**4,
                "revenue",
            )
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@_register(
    "window_rank_suite",
    """
    SELECT event_id, event_type,
           ntile(4) OVER w AS quartile,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cume,
           rank() OVER w AS rnk,
           dense_rank() OVER w AS drnk
    FROM (SELECT * FROM events WHERE user_id < 20)
    WINDOW w AS (PARTITION BY event_type
                 ORDER BY CAST(round(value * 100) AS BIGINT), event_id)
    ORDER BY event_type, rnk, event_id
    """,
)
def _q_window_rank_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-function suite (ntile / percent_rank / cume_dist / rank
    / dense_rank) over a deterministic total order (integer-cents value
    + unique event_id tiebreak — float ORDER BY keys would make ntile
    boundaries engine-dependent at ties). One window partitioning, one
    exchange; all five functions share the frame."""
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    w = Window.partitionBy("event_type").orderBy(
        _cents(F.col("value")), F.col("event_id")
    )
    return (
        e.select(
            "event_id",
            "event_type",
            F.ntile(4).over(w).alias("quartile"),
            F.percent_rank().over(w).alias("pct_rank"),
            F.cume_dist().over(w).alias("cume"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
        )
        .orderBy("event_type", "rnk", "event_id")
    )


# ---------------------------------------------------------------------------
# portable-SQL contracts: ONE SQL string, executed verbatim by BOTH
# spark.sql() and DuckDB — the engine's SQL-API parity surface (the
# reference is SQL-first; a user's ANSI-subset query text ports as-is).
# Restricted to the shared dialect: standard joins/aggregates/CASE,
# CAST, single-arg ROUND; no engine-specific functions or timestamps.
# ---------------------------------------------------------------------------

_PORTABLE_PRICING_SQL = """
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty_units,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             AS sum_price_cents
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
"""

_PORTABLE_SEGMENT_SQL = """
    SELECT c.c_mktsegment,
           COUNT(*) AS n_orders,
           CAST(SUM(CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_finished
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    ORDER BY c.c_mktsegment
"""


def _portable(sql: str, tables: tuple[str, ...]):
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        for t in tables:
            load_table(spark, sf_dir, t).createOrReplaceTempView(t)
        return spark.sql(sql)

    return fn


@_register("portable_sql_pricing", _PORTABLE_PRICING_SQL)
def _q_portable_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-API parity: this contract's Spark side is ``spark.sql()``
    over the IDENTICAL string the DuckDB oracle executes — zero
    translation. Catalyst still plans the partial+final aggregate; the
    DataFrame contracts elsewhere prove the API, this one proves the
    dialect subset ports verbatim."""
    return _portable(_PORTABLE_PRICING_SQL, ("lineitem",))(spark, sf_dir)


@_register("portable_sql_segments", _PORTABLE_SEGMENT_SQL)
def _q_portable_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same verbatim-SQL contract with a join + conditional aggregate."""
    return _portable(_PORTABLE_SEGMENT_SQL, ("orders", "customer"))(spark, sf_dir)


_PORTABLE_WINDOWS_SQL = """
    SELECT o_custkey, o_orderkey,
           ROW_NUMBER() OVER (
             PARTITION BY o_custkey ORDER BY o_orderkey) AS rn,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) OVER (
             PARTITION BY o_custkey ORDER BY o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS running_cents,
           LAG(o_orderkey) OVER (
             PARTITION BY o_custkey ORDER BY o_orderkey) AS prev_orderkey
    FROM orders
    WHERE o_custkey < 100
    ORDER BY o_custkey, o_orderkey
"""


@_register("portable_sql_windows", _PORTABLE_WINDOWS_SQL)
def _q_portable_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Verbatim-SQL contract for the WINDOW-function family:
    ROW_NUMBER, running SUM over a ROWS frame, and LAG share one
    partitioning (one exchange + one sort in the plan) over a
    deterministic total order (o_orderkey is unique per customer).
    The running sum quantizes to integer cents first — a float
    running sum's accumulation order differs per engine. Extends the
    shared-ANSI-subset claim beyond joins/aggregates to windows."""
    return _portable(_PORTABLE_WINDOWS_SQL, ("orders",))(spark, sf_dir)


_MIX_TARGETS = {"en": 4, "zh": 2, "de": 2, "es": 1, "fr": 1}


@_register(
    "sample_mixture_lang",
    SA.mixture_sample_sql("documents", "doc_id", "lang", _MIX_TARGETS)
    + " ORDER BY doc_id",
)
def _q_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data mixing: the largest deterministic subsample whose expected
    language blend is 40/20/20/10/10 — the pre-training mixture
    primitive. Feasible total pinned by the scarcest stratum in exact
    integer arithmetic; membership is the content-stable md5 bucket, so
    the corpus scans once, never shuffles, and appended data never
    re-rolls old rows."""
    d = load_table(spark, sf_dir, "documents")
    return SA.mixture_sample(d, "doc_id", "lang", _MIX_TARGETS).orderBy("doc_id")


@_register(
    "sample_token_mixture",
    "SELECT lang, COUNT(*) AS kept_docs, SUM(len("
    + TX.tokens_sql("text")
    + ")::BIGINT)::BIGINT AS kept_tokens FROM ("
    + SA.token_mixture_sample_sql(
        "documents", "doc_id", "lang", _MIX_TARGETS, "len(" + TX.tokens_sql("text") + ")"
    )
    + ") __tm GROUP BY lang ORDER BY lang",
)
def _q_token_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-weighted data mixing: the 40/20/20/10/10 blend measured in
    TOKEN MASS, the quantity a pre-training run actually budgets (a
    row-count mixture over-weights long-document strata). Same
    exact-integer membership rule on per-stratum token totals; the
    corpus scans once map-side, no joins, no shuffle."""
    d = load_table(spark, sf_dir, "documents")
    tok = F.size(TX.tokens_expr(F.col("text")))
    kept = SA.token_mixture_sample(d, "doc_id", "lang", _MIX_TARGETS, tok)
    return (
        kept.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("kept_docs"),
            F.sum(tok.cast("long")).alias("kept_tokens"),
        )
        .orderBy("lang")
    )


from oracle_duckdb_sync_spark.operators import lm as LM


@_register(
    "text_lm_fluency",
    LM.lm_score_sql(
        "documents",
        LM.train_bigram_lm_sql("documents", min_count=2),
    )
    + " ORDER BY doc_id",
)
def _q_lm_fluency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram LM fluency scoring (the CCNet/Gopher quality gate): a
    bigram model trained relationally on the corpus (one groupBy,
    min_count=2 prunes the singleton tail), then every document scored
    by mean negative log-probability in exact integer micronats — the
    per-doc sum is BIGINT, order-independent, hash-stable. Pruned/
    unseen bigrams hit the add-one floor through the left join, the
    path a persisted model uses to score NEW crawls without a corpus
    rescan."""
    d = load_table(spark, sf_dir, "documents")
    model = LM.train_bigram_lm(d, min_count=2)
    return LM.lm_score(d, model).orderBy("doc_id")


@_register(
    "text_lm_ppl_buckets",
    LM.lm_perplexity_buckets_sql(
        "documents",
        LM.train_bigram_lm_sql("documents", min_count=2),
    )
    + " ORDER BY doc_id",
)
def _q_lm_ppl_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet's per-language perplexity tiers: every document's bigram
    NLL ranks WITHIN ITS LANGUAGE into head/middle/tail thirds
    (absolute perplexity is not comparable across languages, so the
    per-language split is the point — CCNet trains on head+middle and
    drops tail). Rank-exact NTILE over (nll, id) — no float percentile
    interpolation to diverge on — computed by the DISTRIBUTED exact
    NTILE (languages are an inherently few-valued key, so the plain
    per-language window is k mega-partitions at corpus scale; the
    range-partitioned form sorts contiguous slices instead). Swapped
    r15 after the ``_dist`` twin's identical machinery landed a green
    driver hash in CORRECTNESS_r14 — the oracle SQL is unchanged."""
    d = load_table(spark, sf_dir, "documents")
    model = LM.train_bigram_lm(d, min_count=2)
    return LM.lm_perplexity_buckets(d, model, distributed=True).orderBy(
        "doc_id"
    )


@_register(
    "text_lm_ppl_buckets_dist",
    LM.lm_perplexity_buckets_sql(
        "documents",
        LM.train_bigram_lm_sql("documents", min_count=2),
    )
    + " ORDER BY doc_id",
)
def _q_lm_ppl_buckets_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same rank-exact per-language perplexity tiers computed by
    the DISTRIBUTED exact NTILE (lm.ntile_by_group_distributed):
    languages are an inherently few-valued key, so the plain window is
    k mega-partitions at corpus scale — this form range-partitions the
    (lang, nll, id) order so every task sorts one contiguous slice and
    global ranks come from tiny per-slice offset tables. The oracle is
    the SAME NTILE SQL as text_lm_ppl_buckets: value-identity of the
    distributed rank machinery is exactly what the hash check proves."""
    d = load_table(spark, sf_dir, "documents")
    model = LM.train_bigram_lm(d, min_count=2)
    return LM.lm_perplexity_buckets(d, model, distributed=True).orderBy(
        "doc_id"
    )


@_register(
    "json_props_stats",
    f"""
    SELECT event_type,
           COUNT(*) AS n,
           {_sql_dec_avg("json_extract_string(props, '$.k')::BIGINT", "k_avg", 0)},
           MIN(json_extract_string(props, '$.k')::BIGINT) AS k_min,
           MAX(json_extract_string(props, '$.k')::BIGINT) AS k_max
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def _q_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction: JSON path into the props column,
    typed aggregation per event type — the regex fast path with
    Jackson fallback (functions/jsonfn.py) stays JVM-side (no UDF),
    so extraction fuses into the scan's codegen stage at ~8× the
    per-row speed of a bare `get_json_object`."""
    e = load_table(spark, sf_dir, "events")
    k = JX.get_json_long(F.col("props"), "k")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            _dec_avg(F.col("k"), "k_avg", decimals=0),
            F.min("k").alias("k_min"),
            F.max("k").alias("k_max"),
        )
        .orderBy("event_type")
    )


@_register(
    "window_running_metrics",
    """
    SELECT event_id, user_id,
           ROUND(SUM(value::DECIMAL(38,6)) OVER cum::DOUBLE, 6) AS running_sum,
           ROUND((SUM(value::DECIMAL(38,6)) OVER m3 / COUNT(*) OVER m3)::DOUBLE, 6)
               AS mov_avg3,
           ROUND(value - coalesce(lag(value) OVER ord, value), 6) AS delta,
           row_number() OVER ord AS seq
    FROM events
    WINDOW ord AS (PARTITION BY user_id ORDER BY ts, event_id),
           cum AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
           m3 AS (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
)
def _q_window_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-window suite: running sum, 3-row moving average, lag
    delta, sequence number — one shuffle by user_id, every frame
    evaluated in a single window stage; decimal accumulation keeps the
    running sums bit-identical across engines."""
    e = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window as W

    ord_w = W.partitionBy("user_id").orderBy("ts", "event_id")
    cum = ord_w.rowsBetween(W.unboundedPreceding, W.currentRow)
    m3 = ord_w.rowsBetween(-2, W.currentRow)
    dec = F.col("value").cast("decimal(38,6)")
    return e.select(
        "event_id",
        "user_id",
        F.round(F.sum(dec).over(cum).cast("double"), 6).alias("running_sum"),
        F.round(
            (F.sum(dec).over(m3) / F.count(F.lit(1)).over(m3)).cast("double"), 6
        ).alias("mov_avg3"),
        F.round(
            F.col("value") - F.coalesce(F.lag("value").over(ord_w), F.col("value")), 6
        ).alias("delta"),
        F.row_number().over(ord_w).alias("seq"),
    )


@_register("pack_sequences")  # rows-only: cumsum-with-reset is not SQL-expressible
def _q_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget sequence packing (training batch construction):
    deterministic hash shards pack independently in parallel via
    applyInPandas; next-fit in doc-id order within each shard. Driver
    records the rows-only check; invariants (each doc packed once, no
    bin over budget, dense ids) are pinned in tests/test_packing.py."""
    from oracle_duckdb_sync_spark.operators.packing import pack_sequences

    d = load_table(spark, sf_dir, "documents")
    with_tokens = d.select(
        "doc_id", F.size(TX.tokens_expr(F.col("text"))).alias("n_tok")
    )
    return pack_sequences(with_tokens, "doc_id", "n_tok", budget=512, n_shards=8)


@_register(
    "pack_sequences_invariants",
    f"""
    SELECT COUNT(*)::BIGINT AS n_docs,
           COUNT(DISTINCT doc_id)::BIGINT AS n_distinct_docs,
           SUM(len({_TOKS_SQL}))::BIGINT AS sum_tokens,
           0::BIGINT AS over_budget_multidoc_bins,
           0::BIGINT AS sparse_pack_id_shards
    FROM documents
    """,
)
def _q_pack_invariants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checkable contract for :func:`pack_sequences` (VERDICT r3
    #6): the packed output itself is not SQL-reproducible (cumsum with
    reset), but its invariants are. The Spark side measures them on the
    actual packed rows; the DuckDB side states what they must equal from
    the raw table alone — every doc packed exactly once (token totals
    preserved), no multi-doc bin over budget, pack ids dense per shard.
    Any packing bug turns a measured 0 nonzero → hash mismatch."""
    from oracle_duckdb_sync_spark.operators.packing import pack_sequences

    budget = 512
    d = load_table(spark, sf_dir, "documents")
    with_tokens = d.select(
        "doc_id", F.size(TX.tokens_expr(F.col("text"))).alias("n_tok")
    )
    packed = pack_sequences(with_tokens, "doc_id", "n_tok", budget=budget, n_shards=8)
    bins = packed.groupBy("shard", "pack_id").agg(
        F.count(F.lit(1)).alias("n_docs_bin"),
        F.sum("n_tokens").alias("fill"),
    )
    bin_stats = bins.agg(
        F.sum(
            ((F.col("fill") > budget) & (F.col("n_docs_bin") > 1)).cast("long")
        ).alias("over_budget_multidoc_bins")
    )
    shard_stats = (
        bins.groupBy("shard")
        .agg(
            (F.max("pack_id") + 1 != F.count_distinct("pack_id"))
            .cast("long")
            .alias("sparse")
        )
        .agg(F.sum("sparse").alias("sparse_pack_id_shards"))
    )
    doc_stats = packed.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_distinct("doc_id").alias("n_distinct_docs"),
        F.sum("n_tokens").alias("sum_tokens"),
    )
    return doc_stats.crossJoin(bin_stats).crossJoin(shard_stats)


@_register(
    "approx_distinct_users",
    """
    SELECT event_type,
           COUNT(DISTINCT user_id) AS exact_users,
           COUNT(*) AS n_events,
           TRUE AS within_rsd_bound
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def _q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct-user counts per event type — the 100 TB
    COUNT(DISTINCT) replacement (one pass, mergeable sketches, no key
    shuffle of raw values). Sketch ESTIMATES are engine-specific, so the
    value oracle checks the published invariant instead of the estimate:
    the output carries the exact count (hash-compared against DuckDB)
    plus ``within_rsd_bound`` — Spark's estimate within 3×rsd (6%, the
    3-sigma band of rsd=0.02) of exact — which the oracle pins to TRUE.
    The exact twin rides along at test scale as the verification
    harness only; production callers run the sketch alone (pytest
    pins the ≤5% band too, tests/test_packing.py)."""
    e = load_table(spark, sf_dir, "events")
    agg = e.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("__approx"),
        F.countDistinct("user_id").alias("exact_users"),
        F.count(F.lit(1)).alias("n_events"),
    )
    within = (
        F.abs(F.col("__approx").cast("double") - F.col("exact_users"))
        <= F.col("exact_users") * F.lit(0.06)
    )
    return agg.select(
        "event_type", "exact_users", "n_events", within.alias("within_rsd_bound")
    ).orderBy("event_type")


_ZORDER_BOUNDS = [(0.0, 64.0), (0.0, 256.0)]


@_register(
    "zorder_keys_events",
    "SELECT event_id, "
    + __import__(
        "oracle_duckdb_sync_spark.operators.layout", fromlist=["zorder_key_sql"]
    ).zorder_key_sql(["user_id", "value"], _ZORDER_BOUNDS, bits=8)
    + " AS zkey FROM events ORDER BY event_id",
)
def _q_zorder_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton (Z-order) clustering key over (user_id, value) with fixed
    literal bounds — the data-layout primitive behind
    ``layout.zorder_layout`` (multi-dim file pruning), exposed as an
    oracle contract so the bit-interleave arithmetic is pinned
    cross-engine. Pure integer codegen projection."""
    from oracle_duckdb_sync_spark.operators import layout as LA

    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        LA.zorder_key_expr(["user_id", "value"], _ZORDER_BOUNDS, bits=8).alias(
            "zkey"
        ),
    ).orderBy("event_id")


from oracle_duckdb_sync_spark.operators import quality as DQ

_DQ_RULES_SQL = {
    "ts_not_null": "ts IS NOT NULL",
    "value_non_negative": "value >= 0",
    "event_type_in_domain":
        "event_type IN ('click', 'error', 'purchase', 'signup', 'view')",
    "user_id_in_range": "user_id BETWEEN 0 AND 100000",
    "props_has_k": "json_extract_string(props, '$.k') IS NOT NULL",
    "value_two_decimals": "round(value * 100) = value * 100",
    # get_json_long's flatness precondition as a first-class DQ rule
    # (VERDICT r13 #6): the regex fast path must agree with a full
    # JSON parse on every row — a generator/schema drift that nests
    # props.k (the column corr_value_props_by_type and
    # json_props_stats extract from) now fails THIS gate loudly
    # instead of silently skewing those entries
    "props_k_flat_for_fastpath": JX.json_long_flat_rule_sql("props", "k"),
}


@_register(
    "dq_expectations_events",
    DQ.check_expectations_sql("events", _DQ_RULES_SQL) + " ORDER BY rule",
)
def _q_dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality gate (Delta-constraints / expectations shape):
    seven row-level rules over events checked in ONE aggregate pass —
    per-rule violation counts and an exact integer pass-rate in ppm.
    NULL rule evaluations count as violations (the three-valued-logic
    trap). The scan reads only the union of rule input columns. The
    JSON-dialect rules are overridden with their Spark Column forms
    (the dict literals are the DuckDB twin's dialect)."""
    e = load_table(spark, sf_dir, "events")
    rules = dict(_DQ_RULES_SQL)
    rules["props_has_k"] = F.get_json_object(F.col("props"), "$.k").isNotNull()
    rules["props_k_flat_for_fastpath"] = JX.json_long_flat_rule(
        F.col("props"), "k"
    )
    return DQ.check_expectations(e, rules).orderBy("rule")


@_register(
    "corr_value_props_by_type",
    A.pearson_by_group_sql(
        "events",
        "event_type",
        "value",
        "json_extract_string(props, '$.k')::BIGINT",
        x_decimals=2,
        y_decimals=0,
    )
    + " ORDER BY event_type",
)
def _q_corr_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type Pearson correlation between the event value and its
    JSON payload counter, in exact integer moments — reproducible
    where native ``corr()`` is summation-order-dependent. One
    partial+final aggregate; the JSON extraction is JVM codegen."""
    e = load_table(spark, sf_dir, "events")
    return A.pearson_by_group(
        e,
        "event_type",
        F.col("value"),
        # flat {"k": int} payload -> regex fast path (8× over Jackson)
        JX.get_json_long(F.col("props"), "k"),
        x_decimals=2,
        y_decimals=0,
        # events.value is cents-bounded (≤1e9 quantized) and the JSON
        # counter ≤1e6, so every per-row moment product fits int64 —
        # the limb-split long path gives the same exact bits as the
        # DECIMAL form at primitive-sum cost (the DECIMAL form was 30×
        # slower than DuckDB at sf1)
        moments="long",
    ).orderBy("event_type")


@_register(
    "profile_documents",
    A.profile_columns_sql("documents", ["doc_id", "text", "lang", "source", "n_chars"])
    + " ORDER BY column_name",
)
def _q_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling (data-quality sweep): row/null/distinct counts
    per column in one scan; `approx=True` swaps exact distincts for
    HLL++ sketches at cluster scale."""
    d = load_table(spark, sf_dir, "documents")
    return A.profile_columns(
        d, ["doc_id", "text", "lang", "source", "n_chars"]
    ).orderBy("column_name")


@_register(
    "text_redact_pii",
    f"SELECT doc_id, {TX.redact_pii_sql('lower(text)')} AS redacted FROM documents",
)
def _q_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub (training-data safety pass): URL → EMAIL → long-number
    redaction with typed placeholders; patterns stay in the
    RE2 ∩ java.util.regex common subset so both engines rewrite
    identically. Pure codegen projection — no UDF, no shuffle."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id", TX.redact_pii_expr(F.lower(F.col("text"))).alias("redacted")
    )


# ---------------------------------------------------------------------------
# TPC-H completion set (r7): the seven queries the registry was missing —
# q2/q9/q11/q12/q15/q20/q21 — adapted to the synthetic schema (no partsupp,
# no shipmode/commitdate/receiptdate) while keeping each query's SIGNATURE
# pattern: correlated scalar MIN (q2), multi-dim profit rollup (q9),
# scalar-subquery HAVING threshold (q11), CASE-count over a lateness join
# (q12), scalar MAX over a derived view (q15), nested grouped semi-join
# (q20), EXISTS + NOT EXISTS self-joins (q21). With these the registry
# covers all 22 TPC-H query shapes.
# ---------------------------------------------------------------------------

_Q21_LATE_US = 1000 * 86400 * 10**6  # 1000 days in microseconds


@_register(
    "tpch_q2_min_cost_supplier",
    f"""
    WITH offer AS (
      SELECT l_partkey, l_suppkey,
             MIN({_sql_cents('l_extendedprice')}) AS min_price_cents
      FROM lineitem GROUP BY 1, 2
    ),
    eu AS (
      SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
      FROM supplier s
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey AND r.r_name = 'EUROPE'
    )
    SELECT eu.s_acctbal, eu.s_name, eu.n_name AS nation,
           p.p_partkey, p.p_brand, o.min_price_cents
    FROM part p
    JOIN offer o ON o.l_partkey = p.p_partkey
    JOIN eu ON eu.s_suppkey = o.l_suppkey
    WHERE p.p_type = 'STANDARD' AND p.p_size <= 10
      AND o.min_price_cents = (
        SELECT MIN(o2.min_price_cents)
        FROM offer o2 JOIN eu eu2 ON eu2.s_suppkey = o2.l_suppkey
        WHERE o2.l_partkey = p.p_partkey)
    ORDER BY eu.s_acctbal DESC, eu.s_name, p.p_partkey
    LIMIT 100
    """,
)
def _q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2-style minimum-cost supplier (adapted: the offer book is
    derived from lineitem — min observed price in integer cents per
    (part, supplier) — since the synthetic schema has no partsupp).
    The correlated ``= (SELECT MIN(..) WHERE partkey = outer)`` scalar
    subquery decorrelates into a per-part MIN aggregate joined back
    (an aggregate-then-join, not a window: the offer aggregate's
    composite-key shuffle cannot serve a partitionBy(partkey) window,
    so the window form would pay a second full shuffle + sort). BOTH
    filters are pushed below the offer aggregation: the EU supplier
    semi-restriction AND the part attribute filter prune the lineitem
    stream before any shuffle — legal because the correlated scope is
    per-partkey (dropping other partkeys entirely cannot change a
    surviving part's EU offer set), and the supplier/part keys
    functionally determine the carried attributes, so they ride in the
    group key for free. Supplier/part dimensions broadcast; the final
    ORDER BY + LIMIT 100 compiles to TakeOrderedAndProject
    (per-partition top-k, no global sort), with a unique
    (s_name, p_partkey) suffix so the cut is deterministic."""
    li = load_table(spark, sf_dir, "lineitem")
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_regionkey", "n_name"
    )
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_type") == "STANDARD") & (F.col("p_size") <= 10)
    )
    cand = (
        li.join(eu, li.l_suppkey == eu.s_suppkey)
        .join(p, li.l_partkey == p.p_partkey)
        .groupBy(
            "p_partkey",
            "p_brand",
            "s_name",
            "s_acctbal",
            "n_name",
        )
        .agg(F.min(_cents(F.col("l_extendedprice"))).alias("min_price_cents"))
    )
    # per-part minimum as a tiny aggregate joined back (≤ |filtered
    # parts| rows — broadcast), instead of a window: the offer
    # aggregate's composite-key shuffle cannot serve a
    # partitionBy(p_partkey) window, so the window form pays a second
    # full shuffle + sort of the candidate set; the join form reduces
    # map-side to one row per part per partition first
    floor_ = cand.groupBy(F.col("p_partkey").alias("f_partkey")).agg(
        F.min("min_price_cents").alias("best_cents")
    )
    best = cand.join(  # floor_ unhinted: AQE broadcasts it while small
        floor_,
        (F.col("p_partkey") == F.col("f_partkey"))
        & (F.col("min_price_cents") == F.col("best_cents")),
    )
    return (
        best.select(
            "s_acctbal",
            "s_name",
            F.col("n_name").alias("nation"),
            "p_partkey",
            "p_brand",
            "min_price_cents",
        )
        .orderBy(F.col("s_acctbal").desc(), "s_name", "p_partkey")
        .limit(100)
    )


@_register(
    "tpch_q9_product_type_profit",
    f"""
    SELECT n.n_name AS nation,
           EXTRACT(year FROM DATE '1970-01-01'
             + ((epoch_us(o.o_orderdate) // 86400000000))::INT * INTERVAL 1 DAY
           )::BIGINT AS o_year,
           {_sql_dec_sum_cents(
               f"{_sql_cents('l.l_extendedprice')} * (100 - {_sql_cents('l.l_discount')})"
               f" - {_sql_cents('p.p_retailprice')} * {_sql_cents('l.l_quantity')}",
               10**4, 'sum_profit')}
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN part p ON p.p_partkey = l.l_partkey AND p.p_name LIKE '%widget%'
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    GROUP BY 1, 2 ORDER BY 1, 2 DESC
    """,
)
def _q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9-style product-type profit (adapted: supply cost is
    p_retailprice × quantity, the schema's stand-in for
    ps_supplycost): profit per supplier nation per order year over
    name-matched parts. Both profit terms are exact integer products
    at the same 10⁻⁴ scale (cents × cents-of-discount-complement and
    cents × cents-of-quantity), so the whole rollup is one
    DECIMAL(38,0) accumulate with a single double division at the end
    — engine-proof under any summation order. JOIN ORDER is the scale
    lever here (plan-pinned, test_tpch_q9_part_cut_below_fact_join):
    the name-matched part join is the ONLY reducing cut (~12% name
    selectivity), so it applies to lineitem FIRST — the l⋈o fact
    shuffle then moves ~12% of lineitem instead of all of it. The
    supplier and nation joins are non-reducing labels and sit above;
    the year is tz-free epoch-day arithmetic."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    p = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").contains("widget"))
        .select("p_partkey", "p_retailprice")
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    day_idx = F.expr("unix_micros(o_orderdate) div 86400000000").cast("int")
    o_year = F.year(F.date_add(F.to_date(F.lit("1970-01-01")), day_idx)).cast("long")
    amount = _cents(F.col("l_extendedprice")) * (
        F.lit(100) - _cents(F.col("l_discount"))
    ) - _cents(F.col("p_retailprice")) * _cents(F.col("l_quantity"))
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), o_year.alias("o_year"))
        .agg(_dec_sum_cents(amount, 10**4, "sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


@_register(
    "tpch_q11_important_part_value",
    f"""
    WITH val AS (
      SELECT l.l_partkey,
             SUM({_sql_cents('l.l_extendedprice')})::BIGINT AS value_cents
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey AND r.r_name = 'ASIA'
      GROUP BY 1
    ),
    tot AS (SELECT SUM(value_cents)::BIGINT AS total_cents,
                   COUNT(*)::BIGINT AS n_parts FROM val)
    SELECT val.l_partkey AS p_partkey, val.value_cents
    FROM val, tot
    WHERE val.value_cents * tot.n_parts > 2 * tot.total_cents
    ORDER BY val.value_cents DESC, p_partkey
    """,
)
def _q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11-style important-part value (adapted: value per part is
    the summed lineitem revenue from one region's suppliers — the
    schema has no ps_availqty/ps_supplycost): parts whose value
    exceeds 2× the mean part value — a scale-free threshold (the
    classic fixed fraction empties as |parts| grows). The
    scalar-subquery threshold is the one-row (total, count) aggregate
    cross-joined back in (broadcast of exactly one row), and the
    comparison is cross-multiplied into exact integers
    (``value·n > 2·total``) so no float fraction is ever
    materialized. The per-part aggregate is partial+final over narrow
    columns; deterministic (value DESC, partkey) order."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    val = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("l_partkey").alias("p_partkey"))
        .agg(F.sum(_cents(F.col("l_extendedprice"))).alias("value_cents"))
    )
    tot = val.agg(
        F.sum("value_cents").alias("total_cents"),
        F.count(F.lit(1)).alias("n_parts"),
    )
    return (
        val.crossJoin(tot)  # one-row aggregate side — broadcast, benign
        .filter(F.col("value_cents") * F.col("n_parts") > 2 * F.col("total_cents"))
        .select("p_partkey", "value_cents")
        .orderBy(F.col("value_cents").desc(), "p_partkey")
    )


@_register(
    "tpch_q12_late_shipment_priority",
    f"""
    SELECT l.l_returnflag AS ship_class,
           COUNT(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                      THEN 1 END) AS high_line_count,
           COUNT(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                      THEN 1 END) AS low_line_count
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE epoch_us(l.l_shipdate) - epoch_us(o.o_orderdate)
            >= {21 * 86400 * 10**6}::BIGINT
      AND o.o_orderdate >= to_timestamp({ORDER_CUTOFF})
      AND o.o_orderdate < to_timestamp({ORDER_CUTOFF + 365 * 86400})
    GROUP BY 1 ORDER BY 1
    """,
)
def _q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12-style priority split of late shipments (adapted:
    lateness is shipdate ≥ 21 days after orderdate — the schema has no
    commitdate/receiptdate/shipmode, so the return flag stands in for
    the mode class): per class, how many late lines belonged to
    high- vs low-priority orders, in one aggregate pass with
    conditional COUNTs. The order-date window is pushed to the orders
    scan; the lateness predicate is exact integer microsecond
    arithmetic (session timezone never touches it); the join carries
    only three narrow columns."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts(ORDER_CUTOFF))
        & (F.col("o_orderdate") < _ts(ORDER_CUTOFF + 365 * 86400))
    )
    li = load_table(spark, sf_dir, "lineitem")
    late = F.unix_micros(F.col("l_shipdate")) - F.unix_micros(
        F.col("o_orderdate")
    ) >= F.lit(21 * 86400 * 10**6)
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, li.l_orderkey == o.o_orderkey)
        .filter(late)
        .groupBy(F.col("l_returnflag").alias("ship_class"))
        .agg(
            F.count(F.when(high, 1)).alias("high_line_count"),
            F.count(F.when(~high, 1)).alias("low_line_count"),
        )
        .orderBy("ship_class")
    )


@_register(
    "tpch_q15_top_supplier",
    f"""
    WITH revenue AS (
      SELECT l_suppkey,
             SUM({_sql_cents('l_extendedprice')}
                 * (100 - {_sql_cents('l_discount')}))::BIGINT AS total_revenue_e4
      FROM lineitem
      WHERE l_shipdate >= to_timestamp({ORDER_CUTOFF})
        AND l_shipdate < to_timestamp({ORDER_CUTOFF + 90 * 86400})
      GROUP BY 1
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue_e4
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.l_suppkey
    WHERE r.total_revenue_e4 = (SELECT MAX(total_revenue_e4) FROM revenue)
    ORDER BY s.s_suppkey
    """,
)
def _q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15-style top supplier: the revenue view (one quarter's
    discounted revenue per supplier) joined against its own scalar
    MAX — suppliers tying for the top are all returned, which is why
    revenue accumulates in exact integer 10⁻⁴ units (a float revenue
    would make the equality engine-dependent). The MAX is a one-row
    aggregate broadcast back over the view; the shipdate window is
    pushed to the lineitem scan."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts(ORDER_CUTOFF))
        & (F.col("l_shipdate") < _ts(ORDER_CUTOFF + 90 * 86400))
    )
    rev = li.groupBy(F.col("l_suppkey")).agg(
        F.sum(
            _cents(F.col("l_extendedprice"))
            * (F.lit(100) - _cents(F.col("l_discount")))
        ).alias("total_revenue_e4")
    )
    mx = rev.agg(F.max("total_revenue_e4").alias("max_revenue_e4"))
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.crossJoin(mx)  # one-row aggregate side — broadcast, benign
        .filter(F.col("total_revenue_e4") == F.col("max_revenue_e4"))
        .join(s, F.col("l_suppkey") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue_e4")
        .orderBy("s_suppkey")
    )


@_register(
    "tpch_q20_promotion_suppliers",
    f"""
    SELECT s.s_name, {_sql_cents('s.s_acctbal')} AS acctbal_cents
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey AND r.r_name = 'EUROPE'
    WHERE s.s_suppkey IN (
      SELECT l.l_suppkey
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey AND p.p_name LIKE 'cold%'
      WHERE l.l_shipdate >= to_timestamp({ORDER_CUTOFF})
        AND l.l_shipdate < to_timestamp({ORDER_CUTOFF + 365 * 86400})
      GROUP BY l.l_suppkey, l.l_partkey
      HAVING SUM({_sql_cents('l.l_quantity')}) > 2500
    )
    ORDER BY s.s_name
    """,
)
def _q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20-style promotion candidates (adapted: the availqty
    threshold becomes shipped-quantity-per-(supplier, part) > 25
    units in the target year — no partsupp): European suppliers who
    moved real volume of 'cold'-prefixed parts. The nested IN compiles
    to a LEFT SEMI join against the grouped inner aggregate (itself a
    part-name semi-join before grouping), so the supplier table is
    probed, never expanded; quantity accumulates in integer cents so
    the HAVING threshold is exact."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts(ORDER_CUTOFF))
        & (F.col("l_shipdate") < _ts(ORDER_CUTOFF + 365 * 86400))
    )
    p = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").startswith("cold"))
        .select("p_partkey")
    )
    movers = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(_cents(F.col("l_quantity"))).alias("qty_cents"))
        .filter(F.col("qty_cents") > 2500)
        .select("l_suppkey")
    )
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    s = load_table(spark, sf_dir, "supplier")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .join(movers, s.s_suppkey == movers.l_suppkey, "left_semi")
        .select("s_name", _cents(F.col("s_acctbal")).alias("acctbal_cents"))
        .orderBy("s_name")
    )


@_register(
    "tpch_q21_waiting_suppliers",
    f"""
    WITH late AS (
      SELECT l.l_orderkey, l.l_suppkey
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE o.o_orderstatus = 'F'
        AND epoch_us(l.l_shipdate) - epoch_us(o.o_orderdate)
              >= {_Q21_LATE_US}::BIGINT
    )
    SELECT s.s_name, COUNT(*) AS numwait
    FROM late l1
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    WHERE EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM late l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey)
    GROUP BY s.s_name ORDER BY numwait DESC, s.s_name
    """,
)
def _q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21-style suppliers who kept orders waiting (adapted:
    "late" is shipdate ≥ 1000 days after orderdate on a finished
    order — no receipt/commit dates exist): lines late on a
    multi-supplier order where theirs was the ONLY late supplier.

    EXISTS / NOT EXISTS collapse into ONE windowed pass: after the
    lineitem⋈orders join the stream is already hash-partitioned on
    l_orderkey, so a partition window computes (distinct suppliers,
    distinct LATE suppliers) per order with NO additional exchange —
    `late AND n_supp > 1 AND n_late = 1` is exactly the semi+anti
    pair, with one lineitem scan instead of three and per-order
    supplier sets bounded by the order's line count. Verified
    result-identical to the self-join formulation at sf0.1."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    j = li.join(o, li.l_orderkey == o.o_orderkey).withColumn(
        "late",
        F.unix_micros(F.col("l_shipdate")) - F.unix_micros(F.col("o_orderdate"))
        >= F.lit(_Q21_LATE_US),
    )
    w = Window.partitionBy("l_orderkey")
    ann = j.select(
        "l_orderkey",
        "l_suppkey",
        "late",
        F.size(F.collect_set("l_suppkey").over(w)).alias("n_supp"),
        F.size(
            F.collect_set(F.when(F.col("late"), F.col("l_suppkey"))).over(w)
        ).alias("n_late"),
    )
    hit = ann.filter(F.col("late") & (F.col("n_supp") > 1) & (F.col("n_late") == 1))
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        hit.join(s, hit.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
    )


from oracle_duckdb_sync_spark.operators import retrieval as RT

# mixed document frequencies: 'join'/'window' are corpus-head tokens,
# 'hash'/'vector' are rarer — so idf actually differentiates
_RT_TERMS = ("join", "window", "hash", "vector")


@_register("text_tfidf_topk", RT.tfidf_topk_sql("documents", _RT_TERMS, k=20))
def _q_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical retrieval (decontamination / targeted-selection shape):
    exact-integer TF-IDF top-20 for a 4-term query over the documents
    corpus. The explode is filtered to the query terms in the scan
    stage, so only matching postings shuffle; the idf table is |terms|
    rows broadcast; top-k is TakeOrderedAndProject under the unique
    (score DESC, doc_id) order."""
    d = load_table(spark, sf_dir, "documents")
    return RT.tfidf_topk(d, _RT_TERMS, k=20)


@_register("text_bm25_topk", RT.bm25_topk_sql("documents", _RT_TERMS, k=20))
def _q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rational BM25 top-20 over the same query — term saturation and
    length normalization in exact scaled-integer arithmetic (DECIMAL
    div mirrors DuckDB HUGEINT //), so the engine-vs-oracle hash match
    covers the full Okapi pipeline, not a float approximation of it."""
    d = load_table(spark, sf_dir, "documents")
    return RT.bm25_topk(d, _RT_TERMS, k=20)


@_register("text_tfidf_index", RT.tfidf_topk_sql("documents", _RT_TERMS, k=20))
def _q_tfidf_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same TF-IDF query answered from the PERSISTED bucket-
    partitioned postings index instead of a corpus scan (the
    repeated-query workload: decontamination against every new
    benchmark release). The oracle is the inline corpus-scan SQL, so a
    green verdict proves index-path ≡ corpus-path ≡ DuckDB; the read
    touches only the term buckets' directories (plan-asserted
    PartitionFilters)."""
    from oracle_duckdb_sync_spark.sources.testdata import ensure_postings_index

    path = ensure_postings_index(spark, sf_dir)
    return RT.tfidf_topk_from_index(spark, path, _RT_TERMS, k=20)


from oracle_duckdb_sync_spark.operators import classifier as NBC
from oracle_duckdb_sync_spark.operators import linalg as LAL


@_register(
    "embed_gram_matrix",
    LAL.gram_matrix_sql("embeddings"),
)
def _q_embed_gram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed exact Gram/second-moment matrix of the embedding
    corpus — the d x d reduction every whitening/PCA/OPQ index build
    starts from. One mapInPandas pass (integer numpy matmul per tile),
    a shuffle of only d(d+1)/2 x n_partitions tiny partial rows (the
    vectors never move), and exact DECIMAL(38,0) sums with the repo's
    half-up mean convention — hash-identical to the DuckDB unnest-join
    twin under any partitioning. LLM-pipeline extension (no reference
    twin; SURVEY.md §2 has no linear-algebra surface)."""
    e = load_table(spark, sf_dir, "embeddings")
    return LAL.gram_matrix(e)


@_register(
    "embed_pca_variance",
    LAL.pca_variance_sql("embeddings"),
)
def _q_embed_pca_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA fit with inline invariant gates: the exact integer moment
    table is collected (d(d+3)/2 rows — bounded by vector width, never
    the corpus), eigendecomposed on the driver, and the call RAISES
    unless the basis is orthonormal and the eigenvalue sum conserves
    the exact covariance trace (the rotation invariant). The emitted
    per-dimension variance table comes from the same exact integers
    with one float64 division sequence, so the oracle pins the moment
    plumbing while the inline asserts pin the eigensolve against it.
    LLM-pipeline extension (SemDeDup-paper preprocessing step)."""
    e = load_table(spark, sf_dir, "embeddings")
    return LAL.pca_variance_check(e)


_NBC_TRAIN_SQL = NBC.train_nb_classifier_sql(
    "(SELECT *, lang = 'en' AS label FROM documents) __lbl"
)


@_register(
    "text_classifier_nb",
    NBC.nb_classifier_score_sql("documents", _NBC_TRAIN_SQL)
    + " ORDER BY doc_id",
)
def _q_text_classifier_nb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fastText-shape hashed-ngram quality classifier (the CCNet /
    LLaMA model-based gate): train multinomial-NB log-odds over
    hashed unigram+bigram buckets (ONE bounded groupBy — the hashing
    trick caps the model at n_buckets rows), calibrate the decision
    threshold from the training scores (second relational pass, no
    iteration), then score every document via a broadcast join + exact
    BIGINT micronat sum. Labels here are lang='en' — a stand-in for
    any quality/domain label a real pipeline trains on. Unseen buckets
    fall back to the smoothed floor, so a persisted model scores new
    crawls with no training-corpus access."""
    d = load_table(spark, sf_dir, "documents")
    model = NBC.train_nb_classifier(d.withColumn("label", F.col("lang") == "en"))
    return NBC.nb_classifier_score(d, model).orderBy("doc_id")


# funnel with the model-based quality gate on (the LLaMA/GPT-3 pipeline
# position: an externally-trained fastText-shape classifier scores the
# lexical-dedup survivors and low scorers drop). The oracle replays the
# external training (full documents table, lang='en' labels) and the
# survivor scoring as CTE SQL, so the gate's survivorship — not just the
# classifier in isolation — is count-verified per stage.
_FUNNEL_CLS_SCORES = NBC.nb_classifier_score_sql(_FUNNEL_ND_DOCS, _NBC_TRAIN_SQL)


@_register(
    "corpus_prep_funnel_classifier",
    f"""
    SELECT stage, "rows" FROM (
        SELECT 'input' AS stage, (SELECT COUNT(*) FROM documents) AS "rows"
        UNION ALL
        SELECT 'quality_gated', (SELECT COUNT(*) FROM {_FUNNEL_GATED} __a)
        UNION ALL
        SELECT 'exact_deduped', (SELECT COUNT(*) FROM {_FUNNEL_EXACT})
        UNION ALL
        SELECT 'neardup_deduped', (SELECT COUNT(*) FROM {_FUNNEL_NEARDUP})
        UNION ALL
        SELECT 'classifier_gated',
               (SELECT COUNT(*) FROM {_FUNNEL_NEARDUP})
               - (SELECT COUNT(*) FROM ({_FUNNEL_CLS_SCORES}) __cs
                  WHERE NOT pred)
    ) ORDER BY stage
    """,
)
def _q_corpus_funnel_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus funnel with the model-based quality gate on — the
    LLaMA-position classifier stage (heuristics → dedup → classifier):
    an externally-trained hashed-NB model (stand-in labels: lang='en')
    is broadcast against the near-dup survivors; documents predicted
    negative drop, zero-token documents pass through unjudged. Stage
    counts verified against the oracle's CTE replay of training +
    scoring + gating."""
    d = load_table(spark, sf_dir, "documents")
    model = NBC.train_nb_classifier(d.withColumn("label", F.col("lang") == "en"))
    _corpus, stats = PL.prepare_corpus(
        d,
        min_quality=0.25,
        jaccard_threshold=0.35,
        num_perm=32,
        shingle_k=2,
        bands=8,
        classifier_model=model,
    )
    return stats.orderBy("stage")


@_register(
    "embed_mean_pool_lang",
    LAL.mean_pool_sql(
        "(SELECT d.lang, e.embedding FROM embeddings e "
        "JOIN documents d ON e.vec_id = d.doc_id) __mp",
        ["lang"],
    ),
)
def _q_embed_mean_pool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language embedding centroids (grouped mean pooling) — the
    class-centroid reduction behind domain profiles, drift monitors,
    and the Lloyd M-step. One equi-join (AQE-sized, unhinted) then a
    posexplode whose partial aggregate is keyed on (lang, dim) in the
    SAME stage, so the shuffle carries only groups x dims x partitions
    partial rows — the vectors never shuffle. Exact micro-integer
    sums + half-up means, hash-stable against the unnest twin."""
    d = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("vec_id"), "lang"
    )
    e = load_table(spark, sf_dir, "embeddings")
    return LAL.mean_pool(e.join(d, "vec_id").select("lang", "embedding"), ["lang"])


@_register(
    "embed_kmeans_step",
    LAL.kmeans_step_sql("embeddings", n_centroids=8),
)
def _q_embed_kmeans_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One exact relational Lloyd iteration (E-step cosine argmax as a
    single map-only codegen expression, M-step grouped mean-pool whose
    partial aggregate rides the explode stage) — re-estimated centroid
    table from the same seeded cells as the IVF entries. MLlib KMeans
    is the production trainer; this pins the clustering arithmetic
    (tie rules, exact integer means) bit-for-bit against the SQL
    twin, which the black-box trainer cannot."""
    e = load_table(spark, sf_dir, "embeddings")
    return LAL.kmeans_step(e, _seed_centroids(sf_dir))


@_register(
    "source_quality_gate",
    DQ.source_quality_filter_sql("documents", 0.70) + " ORDER BY doc_id",
)
def _q_source_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain/source-level quality gate (FineWeb/RefinedWeb): average
    the heuristic quality score per SOURCE and keep only documents
    from sources whose mean clears the bar — group-level filtering
    that removes whole spam domains even when individual pages pass a
    per-document gate. One map-side-partial aggregate keyed on the
    source (cardinality = sources, not docs) + one AQE-sized join;
    exact micro-integer means compared in integer units."""
    d = load_table(spark, sf_dir, "documents")
    return DQ.source_quality_filter(d, 0.70).orderBy("doc_id")


# deterministic synthetic URLs for the URL-dedup contract: the corpus
# has no URL column, so both engines derive the SAME urls from
# (source, doc_id) — path collisions via doc_id % 40, tracking params /
# trailing-slash / fragment variants via doc_id % 3 and % 7, so the
# canonicalizer has real work to do and real duplicates to collapse
_URL_SYNTH_SQL = (
    "'https://www.' || source || '.example.com/docs/' "
    "|| CAST(doc_id % 40 AS VARCHAR) "
    "|| (CASE doc_id % 3 WHEN 0 THEN '?utm_source=feed&page=' "
    "|| CAST(doc_id % 5 AS VARCHAR) WHEN 1 THEN '/' ELSE '' END) "
    "|| (CASE WHEN doc_id % 7 = 0 THEN '#frag' ELSE '' END)"
)


def _url_synth_expr() -> F.Column:
    did = F.col("doc_id")
    return F.concat(
        F.lit("https://www."),
        F.col("source"),
        F.lit(".example.com/docs/"),
        (did % 40).cast("string"),
        F.when(
            did % 3 == 0,
            F.concat(F.lit("?utm_source=feed&page="), (did % 5).cast("string")),
        )
        .when(did % 3 == 1, F.lit("/"))
        .otherwise(F.lit("")),
        F.when(did % 7 == 0, F.lit("#frag")).otherwise(F.lit("")),
    )


@_register(
    "dedup_url_canonical",
    "SELECT doc_id, canonical_url FROM ("
    + DD.url_dedup_sql(
        f"(SELECT doc_id, source, {_URL_SYNTH_SQL} AS url FROM documents) __u",
        "url",
    )
    + ") __d ORDER BY doc_id",
)
def _q_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-level dedup (the CCNet-style crawl-frontier pass, run before
    any content dedup): canonicalize — lowercase, scheme/www/fragment
    dropped, tracking params removed, trailing slash normalized — and
    keep the min-id row per canonical URL. Pure-codegen
    canonicalization; one id+URL groupBy with map-side combine and an
    id-keyed semi-join back, so full documents never shuffle on the URL
    key. The corpus has no URL column, so both engines derive identical
    synthetic URLs from (source, doc_id) — variants of the same page
    (tracking params, trailing slash, fragments) collapse to one
    survivor, value-verified per row."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source"
    ).withColumn("url", _url_synth_expr())
    return DD.url_dedup(d, "url").select("doc_id", "canonical_url").orderBy(
        "doc_id"
    )


_HTML_TEMPLATE = (
    # synthesized around documents.text so the extraction is
    # value-checkable on the given tables: markup with every stripped
    # construct (comment, style, script carrying a tag-lookalike
    # string, entities, multi-line anchor)
    '<html><head><title>Doc {id}</title><style>p {{color: red}}</style>'
    '</head><body><!-- crawl --><p>&quot;{text}&quot;&nbsp;&amp; more</p>'
    '<a href="https://x.com/a">x</a>\n<A\nHREF="https://x.com/b">y</A>'
    '<script>var q = "<p>!";</script></body></html>'
)
_HTML_PARTS = _HTML_TEMPLATE.split("{text}")
_HTML_PRE = _HTML_PARTS[0].replace("{{", "{").replace("}}", "}").split("{id}")
_HTML_POST = _HTML_PARTS[1]


def _html_synth_expr() -> F.Column:
    return F.concat(
        F.lit(_HTML_PRE[0]),
        F.col("doc_id").cast("string"),
        F.lit(_HTML_PRE[1]),
        F.col("text"),
        F.lit(_HTML_POST),
    )


_HTML_SYNTH_SQL = (
    "'" + _HTML_PRE[0].replace("'", "''") + "' || doc_id || '"
    + _HTML_PRE[1].replace("'", "''") + "' || text || '"
    + _HTML_POST.replace("'", "''") + "'"
)


@_register(
    "text_html_extract",
    f"""
    SELECT doc_id,
           {TX.html_title_sql("__html")} AS title,
           {TX.html_text_sql("__html")} AS body,
           {TX.html_link_count_sql("__html")} AS n_links
    FROM (SELECT doc_id, ({_HTML_SYNTH_SQL}) AS __html FROM documents)
    """,
)
def _q_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML → text extraction (the crawl-prep step BEFORE language-ID/
    quality/dedup — raw crawl payloads are markup): strip comments,
    script/style blocks, and tags; decode the common entities; collapse
    whitespace; pull the <title> and the anchor count (the
    link-density signal nav/boilerplate filters cut on). Pure-codegen
    regexp chain in the Java∩RE2 dialect (functions/text.py:
    html_text_expr), so the whole extraction runs inside the scan's
    codegen span and the DuckDB twin is value-exact per row. The
    corpus has no HTML column, so both engines wrap documents.text in
    an identical synthetic template exercising every stripped
    construct.

    The payload is STAGED as a named attribute so the three
    extractions share one concat build instead of three (the
    [[spark-plan-compile-cost]] staging pattern — CollapseProject does
    not merge a multiply-referenced non-cheap producer), the tag strip
    is one alternation pass (functions/text.py:_HTML_STRIP, formerly
    four sequential passes), and there is no global sort (driver hash
    is order-insensitive). Together: 3.1 s -> ~1.5 s at sf1."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    staged = d.select("doc_id", _html_synth_expr().alias("__html"))
    h = F.col("__html")
    return staged.select(
        "doc_id",
        TX.html_title_expr(h).alias("title"),
        TX.html_text_expr(h).alias("body"),
        TX.html_link_count_expr(h).alias("n_links"),
    )


# ---------------------------------------------------------------------------
# registry ordering for the driver's correctness window
# ---------------------------------------------------------------------------
# The driver harness checks only the first ~50 registry entries. Ordering is
# STALENESS-DRIVEN (r6, replacing the hand-maintained pin/rotate lists):
# every driver round commits a CORRECTNESS_r*.json beside this file, so the
# round each entry last received a verdict is known locally. Entries order
# by (last-verdict round ascending, registry order) — never-checked entries
# (round 0) float to the front automatically, the least-recently-verified
# fill the rest of the window, and freshly-verified entries sink to the
# tail. A failed/errored verdict resets an entry to round 0 so it re-enters
# the window immediately. With ~154 entries and a 50-slot window every
# entry re-verifies on a ~3-4 round cycle, and new registry entries need no
# list maintenance at all. Trivial single-operator scans that share a code
# path with an in-window entry (_CHECK_TIEBREAK_LAST) lose ties, so a
# window slot prefers distinct coverage. Every parked entry ALSO re-runs on
# every pytest invocation via tests/test_entry_queries.py.

# Entries whose code changed after their last committed green driver row:
# forced to the very front of the check order (ahead of the round-tier
# sort) so the next CORRECTNESS_r*.json records fresh full-oracle evidence
# for the current code. Clear a name once a green row lands for it.
_CHECK_PRIORITY_FIRST = [
    # r14's names all landed green rows (CORRECTNESS_r14 + the judge's
    # audit) and are cleared. Add names here when an entry's code
    # changes after its last committed green driver row; clear once a
    # green row lands.
    #
    # r15 changed the connected-components closure (duplicate_clusters:
    # fused first propagation + lazy per-round checkpoints), the
    # exact-substring family (_occ_table staging, pinned incremental
    # explode, _reassemble_without staging), the boilerplate span-split
    # (U+0001 guard branch in _unit_array_expr), and the ppl-buckets
    # entry (distributed exact NTILE) — every registry entry whose
    # Spark lineage goes through one of those is listed so the r15
    # driver window records fresh full-oracle rows for the new code
    # (all re-verified green on the self-run sf0.01 drive before
    # commit).
    "dedup_boilerplate_spans",
    "dedup_exact_substring",
    "dedup_substring_rate_by_source",
    "dedup_exact_substring_incr",
    "dedup_clusters",
    "dedup_cluster_reps",
    "dedup_minhash_incremental",  # closure runs inside the probe
    "sample_leakage_split",
    "corpus_prep_funnel",
    "corpus_prep_funnel_semantic",
    "corpus_prep_funnel_decontam",
    "corpus_prep_funnel_lm",
    "corpus_prep_funnel_substring",
    "corpus_prep_funnel_keepbest",
    "corpus_prep_funnel_classifier",
    "text_lm_ppl_buckets",
    "text_lm_ppl_buckets_dist",
]

_CHECK_TIEBREAK_LAST = [
    "timebucket_events_1m",  # same code path as timebucket_events_10m
    "timebucket_events_1h",  # same code path as timebucket_events_10m
    "retention_filter",  # same filter shape as time_range_filter
    "select_limited",
    "count_rows",
    "group_count",
    "max_watermark",
    "point_read",
    "range_filter",
    "time_range_filter",
    "watermark_read",
    "lttb_downsample",  # rows-only; lttb_invariants carries the oracle
]


def _verdict_rounds() -> dict[str, int]:
    """name -> round of the most recent GREEN driver verdict, from the
    driver-committed CORRECTNESS_r*.json files beside this file. An
    entry whose HIGHEST-round row failed (or errored) maps to 0 —
    re-check first. Files are ordered by the parsed round number, not
    lexically (r100 must not sort between r10 and r11), and only the
    highest round's verdict counts for each entry, so an old success
    can never overwrite a newer failure regardless of scan order.
    Unreadable files are skipped (never break the contract)."""
    import glob
    import json as _json
    import re as _re

    here = os.path.dirname(os.path.abspath(__file__))
    latest: dict[str, tuple[int, bool]] = {}
    for f in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        m = _re.search(r"r(\d+)", os.path.basename(f))
        if not m:
            continue
        r = int(m.group(1))
        try:
            with open(f) as fh:
                data = _json.load(fh)
        except Exception:
            continue
        if not isinstance(data, dict):
            continue
        for name, row in data.items():
            if not isinstance(row, dict):
                ok = False
            else:
                # rows-only entries (no oracle_sql by design: LTTB,
                # packing, HLL) record err='no_oracle' with the spark
                # row count — a successful weaker check, not a failure
                rows_only_ok = (
                    row.get("err") == "no_oracle"
                    and row.get("spark_rows") is not None
                )
                ok = rows_only_ok or (
                    row.get("err") is None
                    and row.get("rows_match") is True
                    and row.get("schema_match") in (True, None)
                    and row.get("hash_match") in (True, None)
                )
            cur = latest.get(name)
            if cur is None or r >= cur[0]:
                latest[name] = (r, ok)
    return {n: (r if ok else 0) for n, (r, ok) in latest.items()}


def _reordered_registry():
    rounds = _verdict_rounds()
    names = list(_REGISTRY)
    order = {n: i for i, n in enumerate(names)}
    tiebreak = {n: 1 for n in _CHECK_TIEBREAK_LAST}
    first = {n: i for i, n in enumerate(_CHECK_PRIORITY_FIRST)}

    def key(n: str):
        return (
            first.get(n, len(first)),
            rounds.get(n, 0),
            tiebreak.get(n, 0),
            order[n],
        )

    return {n: _REGISTRY[n] for n in sorted(names, key=key)}


# ---------------------------------------------------------------------------
# driver contract
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: tumbling 10-minute
    time-bucket aggregation over the events stream (reference D2,
    data/query_core.py:198-263)."""
    return _timebucket_events(spark, SF0001, "10 minutes")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in _reordered_registry().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: sql
        for name, (_fn, sql) in _reordered_registry().items()
        if sql is not None
    }
