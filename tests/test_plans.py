"""Physical-plan shape assertions — the 100 TB design contract.

Correctness tests prove the numbers match; these prove the PLAN is the
one we'd want on a 1000-executor cluster: filters reach the parquet
scan, small dimensions broadcast, top-k never global-sorts, aggregates
have map-side partial phases, and hot expression pipelines stay inside
WholeStageCodegen.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from oracle_duckdb_sync_spark.operators import dedup as DD
from oracle_duckdb_sync_spark.operators import similarity as SIM
from oracle_duckdb_sync_spark.sources.testdata import load_table


def plan(df, mode: str = "formatted") -> str:
    sc = df.sparkSession.sparkContext
    return sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)


def simple_plan(df) -> str:
    return plan(df, "simple")


def test_watermark_filter_pushed_to_parquet(spark, sf_dir):
    """Watermark predicates must reach the parquet scan (row-group
    pruning). Asserted on orders.o_orderdate — a native TimestampType
    column; events.ts is rebuilt from a TIMESTAMP(NANOS) long (Spark
    can't read nanos natively), so its predicate legitimately evaluates
    post-scan — the documented trade-off of that workaround."""
    from datetime import datetime, timezone

    from oracle_duckdb_sync_spark.operators.query import watermark_read

    o = load_table(spark, sf_dir, "orders")
    df = watermark_read(
        o, "o_orderdate", datetime(1997, 1, 1, tzinfo=timezone.utc),
        limit=100, tiebreaker="o_orderkey",
    )
    p = plan(df)
    assert "PushedFilters: [IsNotNull(o_orderdate), GreaterThan(o_orderdate" in p


def test_topk_uses_take_ordered_not_sort(spark, sf_dir):
    df = entrymod.queries()["topk_recent"](spark, sf_dir)
    p = simple_plan(df)
    assert "TakeOrderedAndProject" in p
    assert "Sort [" not in p  # no global sort stage


def final_plan(df) -> str:
    """Execute, then explain: with AQE the pre-execution plan shows the
    conservative shuffled joins (the 100 TB shape); the post-execution
    plan shows what AQE actually ran at this scale."""
    df.count()
    return simple_plan(df)


def test_tpch_q3_scaling_tables_unhinted_aqe_broadcasts(spark, sf_dir):
    """orders/customer scale with SF, so the declared plan must NOT force
    a broadcast (OOM at cluster scale) — but AQE must still convert both
    joins to broadcast when the filtered sides are small."""
    df = entrymod.queries()["tpch_q3_shipping_priority"](spark, sf_dir)
    p0 = simple_plan(df)
    assert "AdaptiveSparkPlan" in p0
    assert "TakeOrderedAndProject" in p0
    p = final_plan(df)
    assert p.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in p


def test_revenue_by_nation_aqe_broadcasts_no_fact_sort(spark, sf_dir):
    df = entrymod.queries()["revenue_by_nation"](spark, sf_dir)
    p = final_plan(df)
    assert p.count("BroadcastHashJoin") == 3
    assert "SortMergeJoin" not in p


def test_timebucket_has_partial_aggregation(spark, sf_dir):
    df = entrymod.queries()["timebucket_events_10m"](spark, sf_dir)
    p = plan(df)
    # partial + final hash aggregate (map-side combine before the shuffle:
    # the exchange carries one row per bucket per partition, not raw rows)
    assert p.count("HashAggregate") >= 2
    # exact-avg mode: partial integer sum + count feed the half-up division
    assert "partial_sum" in p and "partial_count" in p


def test_column_pruning_reaches_scan(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    two = li.select("l_orderkey", "l_quantity")
    p = plan(two)
    assert "ReadSchema: struct<l_orderkey" in p
    # the scan must not read all 16 columns for a 2-column projection
    assert "l_comment" not in p.split("ReadSchema:")[1][:400]


def test_exact_dedup_partial_aggregate(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    df = DD.exact_dedup_groups(d, "doc_id", "text")
    p = simple_plan(df)
    assert p.count("HashAggregate") >= 2  # partial min/count before shuffle


def test_minhash_signature_codegen_aggregate(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    sigs = DD.minhash_signatures(d, "doc_id", "text", 8, 2)
    p = simple_plan(sigs)
    # permutation bank is a hash aggregate (codegen), not array lambdas
    assert "HashAggregate" in p
    assert "Generate explode" in p


def test_knn_join_broadcasts_queries(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 3).select(F.col("vec_id").alias("q_id"), "embedding")
    df = SIM.knn_join(q, e, 5)
    p = simple_plan(df)
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_upsert_broadcasts_new_batch(spark, sf_dir):
    df = entrymod.queries()["upsert_merge"](spark, sf_dir)
    p = simple_plan(df)
    assert "BroadcastHashJoin" in p and "LeftAnti" in p
    assert "SortMergeJoin" not in p


def test_point_read_pushes_equality_filter(spark, sf_dir):
    df = entrymod.queries()["point_read"](spark, sf_dir)
    p = plan(df)
    assert "PushedFilters: [IsNotNull(user_id), EqualTo(user_id,7)]" in p


def test_partition_pruning_on_partitioned_sink(spark, sf_dir, tmp_path):
    """Date-partitioned writes must prune at read time: a day-filter
    touches one partition directory, not the whole table."""
    e = load_table(spark, sf_dir, "events").withColumn(
        "event_date", F.to_date("ts")
    )
    path = str(tmp_path / "events_parted")
    e.write.partitionBy("event_date").parquet(path)
    back = spark.read.parquet(path)
    one_day = back.filter(F.col("event_date") == "2024-01-02")
    p = plan(one_day)
    assert "PartitionFilters: [isnotnull(event_date" in p
    # pruned scan reads a strict subset of partitions
    assert one_day.count() < back.count()


def test_silver_watermark_pushes_partition_and_rowgroup_filters(spark, sf_dir, tmp_path):
    """VERDICT r3 #5: on the production-layout events table (native µs
    TimestampType, UTC-day partition dirs) the watermark predicate must
    reach BOTH PartitionFilters (directory pruning — an incremental read
    lists one day, not the table) and PushedFilters (row-group pruning
    within the watermark day)."""
    from oracle_duckdb_sync_spark.operators.query import watermark_read_partitioned
    from oracle_duckdb_sync_spark.sources.testdata import ensure_silver_events

    path = ensure_silver_events(spark, sf_dir, base_dir=str(tmp_path / "silver"))
    e = spark.read.parquet(path)
    wm_us = 1705276800 * 1_000_000  # 2024-01-15T00:00:00Z
    df = watermark_read_partitioned(
        e, "ts", "event_date", wm_us, limit=500, tiebreaker="event_id"
    )
    p = plan(df)
    part = p.split("PartitionFilters:")[1].split("]")[0]
    assert "event_date" in part and "2024-01-15" in part
    pushed = p.split("PushedFilters:")[1].split("]")[0]
    assert "GreaterThan(ts," in pushed
    # silver relayout is lossless: same rows as the post-scan predicate
    # on the driver's NANOS-rebuilt table
    base = load_table(spark, sf_dir, "events")
    expect = base.filter(F.col("ts") > F.timestamp_micros(F.lit(wm_us))).count()
    assert df.drop("event_date").count() == min(expect, 500)


def test_ivf_index_probe_prunes_partitions(spark, sf_dir, tmp_path):
    """The persisted IVF layout must deliver the promised economics: a
    probe against a cell-partitioned index reads only the probed cell
    directories (PartitionFilters), and returns the same top-k as the
    on-the-fly IVF path over the raw corpus."""
    from oracle_duckdb_sync_spark.operators import similarity as SIM

    e = load_table(spark, sf_dir, "embeddings")
    seeds = e.orderBy("vec_id").limit(4).collect()
    cents = [(i, [float(x) for x in r["embedding"]]) for i, r in enumerate(seeds)]
    q = [float(x) for x in seeds[0]["embedding"]]
    path = SIM.save_ivf_index(e, cents, str(tmp_path / "ivf"))
    df = SIM.ivf_topk_from_index(spark, path, q, 5, cents, n_probe=2)
    p = plan(df)
    part = p.split("PartitionFilters:")[1].split("]")[0]
    assert "cell" in part  # probe lands in directory pruning
    got = [(r["vec_id"], r["cosine"]) for r in df.collect()]
    want_df = SIM.ivf_topk(e, q, 5, cents, n_probe=2)
    want = [(r["vec_id"], r["cosine"]) for r in want_df.collect()]
    assert got == want
    # the probe scan reads a strict subset of the index
    assert spark.read.parquet(path).count() > spark.read.parquet(path).filter(
        F.col("cell").isin([c for c, _ in cents[:2]])
    ).count()


def test_tpch_q6_predicates_pushed(spark, sf_dir):
    df = entrymod.queries()["tpch_q6_forecast_revenue"](spark, sf_dir)
    p = plan(df)
    pushed = p.split("PushedFilters:")[1].split("\n")[0]
    assert "LessThanOrEqual(l_shipdate" in pushed
    assert "GreaterThanOrEqual(l_discount,0.03)" in pushed
    assert "LessThan(l_quantity,24" in pushed


def test_tpch_q5_fixed_dims_hinted_rest_aqe(spark, sf_dir):
    """nation/region are fixed-size → hinted broadcasts visible before
    execution; orders/customer/supplier joins convert only at runtime.

    6 broadcasts since the round-9 reorder: 2× (nation ⋈ region) —
    supplier branch + the customer semi-join's key bank — plus
    supplier ⋈ nation, lineitem ⋈ supplier, orders ⋈ customer, and the
    ASIA LeftSemi on customer. The one SortMergeJoin is the fact⋈fact
    (lineitem ⋈ orders) join, which AQE converts at runtime when the
    reduced sides fit (see test_tpch_q5_dim_cuts_below_fact_join for
    the ordering pin that makes those sides small)."""
    df = entrymod.queries()["tpch_q5_local_supplier_volume"](spark, sf_dir)
    p = final_plan(df)
    assert p.count("BroadcastHashJoin") == 6
    assert "LeftSemi" in p  # the ASIA nation-key semi-join on customer
    assert p.count("SortMergeJoin") <= 1  # only the fact⋈fact join may shuffle


def optimized(df) -> str:
    """Optimized logical plan tree — root printed first, so an earlier
    string position means closer to the root (executed later)."""
    return df._jdf.queryExecution().optimizedPlan().toString()


def _join_pos(opt: str, pattern: str) -> int:
    import re

    m = re.search(pattern, opt)
    assert m is not None, f"join {pattern!r} missing from optimized plan:\n{opt}"
    return m.start()


def test_tpch_q5_dim_cuts_below_fact_join(spark, sf_dir):
    """The round-9 reorder pin: the ASIA cuts (supplier ⋈ nation and the
    customer LeftSemi) must sit BELOW the lineitem ⋈ orders join in the
    optimized plan, so the widest shuffle moves two pre-reduced sides.
    Catalyst won't reorder joins without CBO stats, so the written order
    is the executed order — this test is the contract."""
    df = entrymod.queries()["tpch_q5_local_supplier_volume"](spark, sf_dir)
    opt = optimized(df)
    fact = _join_pos(opt, r"Join Inner, \(\(l_orderkey#\d+L? = o_orderkey#\d+L?\)")
    supp = _join_pos(opt, r"Join Inner, \(l_suppkey#\d+L? = s_suppkey#\d+L?\)")
    cust = _join_pos(opt, r"Join Inner, \(o_custkey#\d+L? = c_custkey#\d+L?\)")
    semi = _join_pos(opt, r"Join LeftSemi, \(c_nationkey#\d+ = __nk#\d+\)")
    # root-first printing: fact⋈fact earliest == root-most == executed last
    assert fact < supp and fact < cust and fact < semi


def test_tpch_q7_dim_cuts_below_fact_join(spark, sf_dir):
    """q7 reorder pin: each 2-nation broadcast cut reduces its own branch
    (supplier side and customer side) BEFORE the lineitem ⋈ orders join."""
    df = entrymod.queries()["tpch_q7_volume_shipping"](spark, sf_dir)
    opt = optimized(df)
    fact = _join_pos(opt, r"Join Inner, \(\(l_orderkey#\d+L? = o_orderkey#\d+L?\)")
    supp = _join_pos(opt, r"Join Inner, \(l_suppkey#\d+L? = s_suppkey#\d+L?\)")
    cust = _join_pos(opt, r"Join Inner, \(o_custkey#\d+L? = c_custkey#\d+L?\)")
    s_cut = _join_pos(opt, r"Join Inner, \(s_nationkey#\d+ = n1_key#\d+\)")
    c_cut = _join_pos(opt, r"Join Inner, \(c_nationkey#\d+ = n2_key#\d+\)")
    assert fact < supp and fact < cust
    assert supp < s_cut and cust < c_cut  # each nation cut inside its branch


def test_tpch_q8_dim_cuts_below_fact_join(spark, sf_dir):
    """q8 reorder pin: the ECONOMY part cut on lineitem and the AMERICA
    customer cut on orders must both sit BELOW the lineitem ⋈ orders
    join; the supplier-nation labeling joins (which don't reduce) sit
    ABOVE it."""
    df = entrymod.queries()["tpch_q8_market_share"](spark, sf_dir)
    opt = optimized(df)
    fact = _join_pos(opt, r"Join Inner, \(l_orderkey#\d+L? = o_orderkey#\d+L?\)")
    part = _join_pos(opt, r"Join Inner, \(l_partkey#\d+L? = p_partkey#\d+L?\)")
    cust = _join_pos(opt, r"Join Inner, \(o_custkey#\d+L? = c_custkey#\d+L?\)")
    supp = _join_pos(opt, r"Join Inner, \(l_suppkey#\d+L? = s_suppkey#\d+L?\)")
    n2 = _join_pos(opt, r"Join Inner, \(s_nationkey#\d+ = n2_nationkey#\d+\)")
    assert fact < part and fact < cust  # reducing cuts feed the fact join
    assert supp < fact and n2 < supp  # non-reducing labels join after it


def test_tpch_q9_part_cut_below_fact_join(spark, sf_dir):
    """q9 reorder pin: the name-matched part join is the only reducing
    cut (~12% selectivity), so it must sit BELOW the lineitem ⋈ orders
    fact join — the fact shuffle then moves the pre-cut lineitem. The
    non-reducing supplier/nation labels sit ABOVE the fact join."""
    df = entrymod.queries()["tpch_q9_product_type_profit"](spark, sf_dir)
    opt = optimized(df)
    fact = _join_pos(opt, r"Join Inner, \(l_orderkey#\d+L? = o_orderkey#\d+L?\)")
    part = _join_pos(opt, r"Join Inner, \(l_partkey#\d+L? = p_partkey#\d+L?\)")
    supp = _join_pos(opt, r"Join Inner, \(l_suppkey#\d+L? = s_suppkey#\d+L?\)")
    nat = _join_pos(opt, r"Join Inner, \(s_nationkey#\d+ = n_nationkey#\d+\)")
    # root-first printing: earlier position == root-most == executed later
    assert fact < part  # part cut executes before the fact join
    assert supp < fact and nat < supp  # labels join after it


def test_tpch_q20_semi_probe_over_precut_aggregate(spark, sf_dir):
    """q20 pin: the nested IN must stay a LEFT SEMI probe of supplier
    (never an expanding inner join), fed by the movers aggregate whose
    input lineitem is already cut by the part-name join — the
    supplier table is probed once against a grouped, filtered set."""
    df = entrymod.queries()["tpch_q20_promotion_suppliers"](spark, sf_dir)
    opt = optimized(df)
    semi = _join_pos(opt, r"Join LeftSemi, \(s_suppkey#\d+L? = l_suppkey#\d+L?\)")
    agg = _join_pos(opt, r"Aggregate \[l_suppkey#\d+L?, l_partkey#\d+L?\]")
    part = _join_pos(opt, r"Join Inner, \(l_partkey#\d+L? = p_partkey#\d+L?\)")
    # semi probe at the root side, aggregate inside it, part cut deepest
    assert semi < agg < part


def test_aggregated_service_plan_single_shuffle(spark, sf_dir):
    """The flagship D1/D2 plan must have exactly one exchange (the
    bucket aggregation) plus the ordering exchange — nothing else."""
    df = entrymod.queries()["timebucket_events_10m"](spark, sf_dir)
    p = simple_plan(df)
    assert p.count("Exchange") <= 2  # agg hash partitioning + rangepartition for sort


def test_sessionize_single_shuffle(spark, sf_dir):
    """Gap detection + session numbering must reuse ONE hash exchange on
    the entity key — both window frames share the partitioning."""
    df = entrymod.queries()["sessionize_events"](spark, sf_dir)
    p = simple_plan(df)
    assert p.count("Exchange") == 1


def test_window_suite_single_stage(spark, sf_dir):
    """Running sum, moving average, lag, and row_number share one window
    stage over one exchange — frames merge, data shuffles once."""
    df = entrymod.queries()["window_running_metrics"](spark, sf_dir)
    p = simple_plan(df)
    assert p.count("Exchange") == 1
    assert p.count("Window") == 1


def test_asof_join_no_range_explosion(spark, sf_dir):
    """The as-of join must be the union-merge plan: windows + exchanges,
    never a theta-join (BroadcastNestedLoop/Cartesian on ts ranges)."""
    df = entrymod.queries()["asof_join_events"](spark, sf_dir)
    p = simple_plan(df)
    assert "BroadcastNestedLoopJoin" not in p and "CartesianProduct" not in p
    assert p.count("Exchange") <= 2  # error-side pre-agg + the merge window


def test_dim_stats_partial_agg_same_stage_as_explode(spark, sf_dir):
    """dim_stats: the partial hash aggregate must sit before the
    exchange (same stage as the posexplode), so the shuffle carries only
    dim x n_partitions partial rows — never the exploded values."""
    from oracle_duckdb_sync_spark.operators import similarity as SIM

    e = load_table(spark, sf_dir, "embeddings")
    p = plan(SIM.dim_stats(e))
    assert p.count("HashAggregate") >= 2
    assert "partial_sum" in p and "partial_count" in p
    assert "Generate" in p  # the explode feeds the partial agg directly


def test_funnel_and_cohort_no_cartesian(spark, sf_dir):
    """Funnel transitions and the cohort join are user-keyed equi-joins:
    no Cartesian/BroadcastNestedLoop anywhere, aggregation is
    partial+final."""
    from oracle_duckdb_sync_spark.operators import timeseries as TSOP

    e = load_table(spark, sf_dir, "events")
    for df in (
        TSOP.funnel_counts(e, "user_id", "ts", "event_type",
                           ["signup", "click", "purchase"]),
        TSOP.cohort_retention(e, "user_id", "ts", 86400),
    ):
        p = plan(df)
        assert "CartesianProduct" not in p
        assert "BroadcastNestedLoopJoin" not in p
        assert "partial_" in p  # map-side combine before every exchange


def test_pca_moment_partials_shape(spark, sf_dir):
    """Dedicated pin for embed_pca_variance's Spark-side plan (VERDICT
    r12 #6 — recurring offender-list member covered only by the
    registry-wide lint before): the d(d+3)/2-row moment-partials
    aggregate must stay ONE MapInPandas over a pruned embedding-only
    scan feeding ONE map-side-combined exchange — the corpus itself
    never shuffles, and nothing a future edit adds may sneak a second
    pass or a full-width scan in."""
    from oracle_duckdb_sync_spark.operators import linalg as LAL

    e = load_table(spark, sf_dir, "embeddings")
    m = (
        LAL._moment_partials(e, "embedding")
        .groupBy("i", "j")
        .agg(F.sum("n").alias("n"), F.sum("s").alias("s"))
    )
    p = plan(m, "simple")
    assert p.count("MapInPandas") == 1  # one pass over the corpus
    assert p.count("Exchange") == 1  # only the tiny partials shuffle
    assert "partial_sum" in p  # map-side combine before that exchange
    # column pruning reaches the scan THROUGH the mapInPandas: the
    # scan reads the embedding column alone, not the full table
    assert "ReadSchema: struct<embedding:array<float>>" in p


def test_funnel_conversion_per_step_scan_shape(spark, sf_dir):
    """Dedicated pin for funnel_conversion (VERDICT r12 #6): each
    funnel stage must scan ONLY its step's slice (step equality and
    the time window BOTH in PushedFilters on every events scan), every
    hash exchange must key on the user id (the same partitioning
    reused down the funnel — no re-shuffle on another key), and every
    aggregate keeps its map-side partial phase."""
    df = entrymod.queries()["funnel_conversion"](spark, sf_dir)
    p = plan(df, "simple")
    import re

    scans = [ln for ln in p.splitlines() if "FileScan parquet" in ln]
    assert scans, p
    for ln in scans:
        assert "EqualTo(event_type," in ln, ln  # step slice pushed
        assert "LessThan(ts," in ln, ln  # window pushed
        # pruned to the three funnel columns, never the full row
        assert "ReadSchema: struct<ts:timestamp,user_id:bigint,event_type:string>" in ln, ln
    hash_ex = re.findall(r"Exchange hashpartitioning\((\w+)#", p)
    assert hash_ex and all(c == "user_id" for c in hash_ex), hash_ex
    assert "partial_" in p
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_interval_join_is_equi_join_not_theta(spark, sf_dir):
    """The range join must come from the bucketed equi-join formulation:
    a hash/sort-merge join on (keys…, bucket) with the containment
    predicate as a post-join filter — never the quadratic
    BroadcastNestedLoop/Cartesian a naive ts-range theta-join plans."""
    df = entrymod.queries()["incident_click_window"](spark, sf_dir)
    p = simple_plan(df)
    assert "BroadcastNestedLoopJoin" not in p and "CartesianProduct" not in p
    assert ("HashJoin" in p) or ("SortMergeJoin" in p)


def test_gapfill_partial_aggregation_no_grid_join(spark, sf_dir):
    """Gap-filled buckets: the observed-bucket mean must be a
    partial+final hash aggregate, and gap rows must come from the
    lead-window + explode branch — exactly one join-free union, no
    second join against a generated calendar grid."""
    df = entrymod.queries()["gapfill_locf_10m"](spark, sf_dir)
    p = simple_plan(df)
    assert "partial" in p.lower()
    assert "Join" not in p
    assert "Generate" in p  # the sequence-explode gap branch


def test_counter_and_state_agg_single_shuffle(spark, sf_dir):
    """state_agg (scaling key cardinality): one window stage + one
    aggregate on the key partitioning — a single exchange before the
    final ordering. counter_agg keys on event_type — FEW values at any
    corpus size — so the entry uses the CHUNKED form: the heavy lag
    window must partition by (key, time-chunk), never by the bare key
    (a bare-key window is k mega-partitions at 100 TB)."""
    df = entrymod.queries()["state_durations_user"](spark, sf_dir)
    p = simple_plan(df)
    # exchanges: the key hash partition + the output sort's range
    # exchange; the window and the aggregate must share the first
    assert p.count("Exchange") <= 2

    df = entrymod.queries()["counter_total_by_type"](spark, sf_dir)
    p = simple_plan(df)
    assert "__chunk" in p  # the lag runs on (key, chunk) partitions
    # chunk window + carry-routing window + union re-window + final
    # agg + output sort — bounded stage count, none key-only over the
    # full history
    assert p.count("Exchange") <= 5


def test_mixture_sample_corpus_never_shuffles(spark, sf_dir):
    """The 100 TB side of mixture_sample must be ONE map-side scan:
    thresholds compile to literals (the bounded per-stratum counts are
    collected driver-side), so the final plan has no join and no
    exchange at all — just scan + filter (+ the entry's output sort)."""
    df = entrymod.queries()["sample_mixture_lang"](spark, sf_dir)
    p = simple_plan(df)
    assert "Join" not in p
    # the only exchange allowed is the contract entry's ORDER BY
    assert p.count("Exchange") <= 1


def test_new_tpch_shapes_no_quadratic_joins(spark, sf_dir):
    """Q13/Q16/Q17/Q8: every join is an equi-join (hash or sort-merge)
    — no CartesianProduct / BroadcastNestedLoop anywhere — and the
    shrinking aggregates have map-side partial phases."""
    for name in (
        "tpch_q13_customer_distribution",
        "tpch_q16_supplier_variety",
        "tpch_q17_small_quantity_revenue",
        "tpch_q8_market_share",
    ):
        df = entrymod.queries()[name](spark, sf_dir)
        p = plan(df)
        assert "CartesianProduct" not in p, name
        assert "BroadcastNestedLoopJoin" not in p, name
        assert "partial_" in p, name


def test_q16_and_q22_anti_joins(spark, sf_dir):
    """NOT IN / NOT EXISTS must compile to LEFT ANTI hash joins — the
    blacklist (Q16) and urgent-orders (Q22) sides carry one key column.
    Q22's only nested-loop join is the one-row scalar-stats broadcast
    (a single aggregate row against every customer — constant work)."""
    p16 = plan(entrymod.queries()["tpch_q16_supplier_variety"](spark, sf_dir))
    assert "LeftAnti" in p16
    df22 = entrymod.queries()["tpch_q22_global_sales_opportunity"](spark, sf_dir)
    assert "LeftAnti" in plan(df22)
    # the scalar-threshold join is the lone BNLJ and it is build-side=1-row
    # (simple mode prints each physical node exactly once)
    p22 = simple_plan(df22)
    assert p22.count("BroadcastNestedLoopJoin") <= 1
    assert "CartesianProduct" not in p22


def test_fuzzy_pairs_variant_equi_join(spark, sf_dir):
    """Fuzzy matching must stay bucket-local — never an all-pairs
    nested loop with a levenshtein theta predicate. The grouped shape:
    variant rows collect per bucket (ONE exchange), pairs generate
    inside the bucket array, so no join operator appears at all; the
    bucket cap is the size() filter on the collected array."""
    df = entrymod.queries()["fuzzy_match_customer_names"](spark, sf_dir)
    p = plan(df)
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "collect_list" in p  # bucket-local pair generation
    assert "Join" not in p  # no self-join: pairs come from the array
    # exactly two exchanges: groupBy(variant) + distinct(pairs) — the
    # formatted tree prints each as "+- Exchange (n)"
    assert p.count("Exchange (") == 2


def test_boilerplate_dedup_map_side_reassembly(spark, sf_dir):
    """Boilerplate removal (r14 shape): unit DF is a partial+final
    aggregate, each doc's own viral units come back via a LEFT SEMI
    join + per-doc collect_set (shuffle bounded by boilerplate
    occurrences), and the reassembly is a map-side higher-order filter
    — the exploded corpus is never re-shuffled for reassembly and no
    quadratic join appears anywhere."""
    df = entrymod.queries()["dedup_boilerplate_spans"](spark, sf_dir)
    p = plan(df)
    assert "LeftSemi" in p
    assert "partial_count" in p
    assert "collect_set" in p
    assert "filter(__spans" in p or "filter(lambdafunction" in p or "array_join" in p
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_retrieval_topk_scale_shape(spark, sf_dir):
    """TF-IDF/BM25: the query-term filter must sit in the same stage as
    the explode (only matching postings shuffle), scoring is pure
    codegen (no Python), and the top-k is TakeOrderedAndProject. The
    only joins are the one-row stats broadcast."""
    for name in ("text_tfidf_topk", "text_bm25_topk"):
        df = entrymod.queries()[name](spark, sf_dir)
        p = simple_plan(df)
        assert "TakeOrderedAndProject" in p, name
        assert "Python" not in p, name
        assert "CartesianProduct" not in p, name
    # the corpus scan sits behind _with_df_t's lazy checkpoint in the
    # entry plan (one scan feeding both df_t and the probe), so the
    # explode-stage shape is pinned on the inner tf pipeline directly
    from oracle_duckdb_sync_spark.operators import retrieval as RT

    docs = entrymod.load_table(spark, sf_dir, "documents")
    inner = RT._term_tf(docs, ["the", "model", "data"], "doc_id", "text")
    ip = simple_plan(inner)
    assert "Generate" in ip  # the explode, pruned in-stage
    assert "Python" not in ip


def test_postings_index_probe_prunes_buckets(spark, sf_dir):
    """The persisted-index TF-IDF probe must push the bucket filter to
    PartitionFilters (directory pruning — only the query terms' crc32
    buckets are listed) and keep the token equality in PushedFilters."""
    df = entrymod.queries()["text_tfidf_index"](spark, sf_dir)
    p = simple_plan(df)
    part = p.split("PartitionFilters:")[1].split("]")[0]
    assert "tb" in part  # bucket IN (...) reached the directory listing
    assert "TakeOrderedAndProject" in p
    assert "Python" not in p


def test_q21_exists_joins_stay_equi(spark, sf_dir):
    """Q21's EXISTS / NOT EXISTS collapse into ONE window over the
    lineitem⋈orders join: the window's partition key (l_orderkey) is
    the join key, so NO exchange may appear between the join and the
    window (the distinct-supplier counts reuse the join's hash
    partitioning), and nothing may go nested-loop over the supplier
    inequality."""
    df = entrymod.queries()["tpch_q21_waiting_suppliers"](spark, sf_dir)
    p = simple_plan(df)
    assert "BroadcastNestedLoopJoin" not in p and "CartesianProduct" not in p
    assert "Window" in p
    # lineitem rows cross the wire at most once on the whole path:
    # exactly two hash exchanges total — l_orderkey for the window
    # (reused by the join when it shuffles instead of broadcasting)
    # and s_name for the final aggregate. The old semi/anti self-join
    # formulation needed three lineitem passes.
    assert p.count("Exchange hashpartitioning") == 2


def test_q2_topk_is_take_ordered(spark, sf_dir):
    """Q2's ORDER BY + LIMIT 100 must compile to TakeOrderedAndProject
    (per-partition top-k, no global sort of the candidate set); the
    correlated min is an aggregate-then-join, so the plan carries at
    least two hash aggregates (offer book + per-part floor) and no
    window (the window form would re-shuffle and sort the candidates)."""
    df = entrymod.queries()["tpch_q2_min_cost_supplier"](spark, sf_dir)
    p = simple_plan(df)
    assert "TakeOrderedAndProject" in p
    assert "Window" not in p
    assert p.count("HashAggregate") >= 2
    assert "CartesianProduct" not in p


# Every contract's declared plan, linted in one pass. BNLJ is permitted
# ONLY where it is a bounded broadcast by construction:
#  - the k-NN/near-dup family broadcasts the bounded query/grid side
#    (the documented engine shape; asserted individually above), and
#  - *_invariants / q22 cross-join a ONE-ROW aggregate result.
# Nothing in the registry may ever plan a CartesianProduct.
_BNLJ_WHITELIST = {
    "embed_knn_join",
    "embed_knn_join_grid",
    "embed_neardup_blocked",
    "embed_neardup_pairs",
    "embed_ann_recall",
    "tpch_q22_global_sales_opportunity",
    "tpch_q11_important_part_value",  # one-row (total, count) aggregate
    "tpch_q15_top_supplier",  # one-row MAX aggregate
    "text_tfidf_topk",  # one-row n_docs aggregate
    "text_bm25_topk",  # one-row (n_docs, total_tokens) aggregate
    "text_tfidf_index",  # one-row summed-stats aggregate
    "text_lm_fluency",  # one-row vocabulary-size aggregate
    "text_lm_ppl_buckets",  # same one-row vocabulary-size aggregate
    "text_classifier_nb",  # one-row totals/threshold aggregates
    "pack_sequences_invariants",
    "lttb_invariants",
}


def test_registry_wide_plan_lint(spark, sf_dir):
    """The whole-registry guarantee: no contract's declared plan may
    contain a CartesianProduct, and BroadcastNestedLoopJoin appears
    only on the whitelisted bounded-broadcast entries. A new contract
    that accidentally plans a quadratic join fails here before it ever
    reaches the driver."""
    sc = spark.sparkContext
    offenders: dict[str, list[str]] = {}
    for name, fn in entrymod.queries().items():
        df = fn(spark, sf_dir)
        p = sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "simple"
        )
        if "CartesianProduct" in p:
            offenders.setdefault(name, []).append("CartesianProduct")
        if "BroadcastNestedLoopJoin" in p and name not in _BNLJ_WHITELIST:
            offenders.setdefault(name, []).append("BroadcastNestedLoopJoin")
    assert not offenders, offenders


def test_pq_adc_scan_is_codegen_not_python(spark, sf_dir):
    """The PQ ADC scoring scan must be pure JVM codegen: the literal
    LUT + aggregate-over-codes expression, top-k via
    TakeOrderedAndProject — no Python evaluation node anywhere in the
    scoring plan (Python appears only in the one-time encoder)."""
    from oracle_duckdb_sync_spark.sources.testdata import ensure_pq_codes

    path, books = ensure_pq_codes(spark, sf_dir)
    codes = spark.read.parquet(path)
    q = [0.1] * 64
    df = SIM.pq_topk(codes, q, books, 10)
    p = simple_plan(df)
    assert "Python" not in p  # no BatchEvalPython / ArrowEvalPython / mapInPandas
    assert "TakeOrderedAndProject" in p


def test_quantiles_approx_bound_check_broadcasts_sketch_rows(spark, sf_dir):
    """The GK rank-interval verification joins 4·|types| sketch rows
    back to the raw events: that side must BROADCAST (map-only
    re-count), never shuffle the fact table, and the sketch aggregate
    plus the re-count both keep partial phases."""
    df = entrymod.queries()["value_quantiles_approx"](spark, sf_dir)
    p = simple_plan(df)
    assert "BroadcastHashJoin" in p or "BroadcastExchange" in p
    assert "SortMergeJoin" not in p
    assert p.count("HashAggregate") >= 4  # partial+final × (sketch, re-count)


def test_approx_distinct_partial_aggregation(spark, sf_dir):
    """HLL++ sketches and the exact twin merge map-side: one partial
    and one final aggregate, no raw-value shuffle beyond the group
    key exchange."""
    df = entrymod.queries()["approx_distinct_users"](spark, sf_dir)
    p = simple_plan(df)
    assert "partial_approx_count_distinct" in p
    assert p.count("Exchange") <= 3  # agg + expand-distinct + order


def test_substring_incremental_store_scan_dpp_pruned(spark, sf_dir):
    """The incremental substring probe must prune the fingerprint
    store's bucket partitions via DYNAMIC partition pruning from the
    broadcast bucket semi-join — no separate driver-side collect job
    builds an isin list, and the scan still reads only the batch's
    bucket directories on a small crawl."""
    from oracle_duckdb_sync_spark.operators import dedup as DD
    from oracle_duckdb_sync_spark.sources.testdata import (
        ensure_substring_store,
    )

    store = ensure_substring_store(spark, sf_dir, k=6)
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    new = d.filter(F.col("doc_id") % 2 == 1)
    df = DD.exact_substring_dedup_incremental(
        new, store, "doc_id", "text", k=6, update_store=False,
        materialize=False,
    )
    p = simple_plan(df)
    assert "dynamicpruningexpression" in p
    # the broadcast side is the bounded bucket list, not the store
    assert "BroadcastExchange" in p
