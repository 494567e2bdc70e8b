#!/usr/bin/env python
"""Benchmark the headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE compact JSON line (last line of stdout):
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {<slowest few>: sec, ...}, "sf": <float>,
   "n_queries": N, "duckdb_total": sec, "ratio": spark/duckdb}

The driver records only the last ~2000 chars of output, and the full
per-query dict (70+ lines) outgrew that in round 5 (BENCH_r05.json
"parsed": null) — so the final line carries the totals plus the
slowest handful of queries, and the COMPLETE per-query detail is
written to BENCHDETAIL.json beside this script (committed per round)
and echoed line-by-line on stderr.

DuckDB oracle-SQL timings ride along by default (self-calibration
against the reference's engine-class at the same scale factor, so
ratio tracking doesn't depend on external re-timing); set
SPARK_GRAFT_BENCH_DUCKDB=0 to skip them.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
# best-of-N per query (both engines): single-shot timings on a shared VM
# swing ±30%+ with GC pauses / host contention; the min of three runs
# measures the plan, not the noise
REPS = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))

# Headline set: the reference's hot paths (time-bucket family, watermark,
# merge/dedup, conditional rollup), engine-completeness joins (TPC-H), and
# the training-data pipeline (dedup/similarity/text/multimodal).
HEADLINE = [
    "timebucket_events_10m",
    "timebucket_strptime_10m",
    "watermark_read",
    "watermark_read_silver",
    "dedup_keep_last",
    "upsert_merge",
    "merge_union_sort",
    "conditional_rollup",
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q10_returned_items",
    "revenue_by_nation",
    "dedup_exact_groups",
    "dedup_minhash_lsh",
    "dedup_simhash_fp",
    "embed_cosine_topk",
    "embed_knn_join",
    "embed_knn_join_blocked",
    "embed_knn_join_grid",
    "embed_neardup_blocked",
    "embed_semantic_dedup",
    "embed_semantic_dedup_indexed",
    "embed_ivf_probe",
    "embed_pq_probe",
    "embed_dim_stats",
    "dedup_minhash_incremental",
    "text_lang_quality",
    "text_token_stats",
    "text_top_tokens",
    "multimodal_features",
    "embed_ivf_topk",
    "value_quantiles",
    "sample_stratified_lang",
    "sessionize_events",
    "asof_join_events",
    "window_running_metrics",
    "text_redact_pii",
    "text_repetition",
    "funnel_conversion",
    "cohort_retention_weekly",
    "time_weighted_avg_by_type",
    "embed_normalize",
    "embed_ann_recall",
    "gapfill_locf_10m",
    "gapfill_linear_10m",
    "counter_total_by_type",
    "state_durations_user",
    "incident_click_window",
    "sample_mixture_lang",
    "ohlc_by_type_10m",
    "top_users_with_other",
    "trailing_window_1h",
    "snapshot_diff_orders",
    "text_chunks",
    "cap_per_source",
    "anomaly_zscore_by_type",
    "tpch_q18_large_orders",
    "tpch_q19_discounted_revenue",
    "tpch_q13_customer_distribution",
    "tpch_q16_supplier_variety",
    "tpch_q17_small_quantity_revenue",
    "tpch_q22_global_sales_opportunity",
    "tpch_q8_market_share",
    "tpch_q7_volume_shipping",
    "tpch_q14_promo_revenue",
    "tpch_q2_min_cost_supplier",
    "tpch_q9_product_type_profit",
    "tpch_q11_important_part_value",
    "tpch_q12_late_shipment_priority",
    "tpch_q15_top_supplier",
    "tpch_q20_promotion_suppliers",
    "tpch_q21_waiting_suppliers",
    "window_rank_suite",
    "portable_sql_pricing",
    "portable_sql_segments",
    "portable_sql_windows",
    "fuzzy_match_customer_names",
    "text_tfidf_topk",
    "text_bm25_topk",
    "text_tfidf_index",
    "dedup_boilerplate_spans",
    "sample_weighted_quality",
    "dq_expectations_events",
    "corr_value_props_by_type",
    "zorder_keys_events",
    "dedup_cluster_reps",
    "sample_leakage_split",
    "sample_token_mixture",
    "text_lm_fluency",
    "text_classifier_nb",
    "embed_gram_matrix",
    "embed_pca_variance",
    "embed_mean_pool_lang",
    "embed_kmeans_step",
    "corpus_prep_funnel_classifier",
    "source_quality_gate",
    "embed_semantic_decontaminate",
    "embed_semantic_dedup_incr",
    "embed_dim_drift",
    "text_fertility_by_lang",
    "dedup_rate_by_source",
    "dedup_exact_substring",
    "dedup_exact_substring_incr",
    "dedup_substring_rate_by_source",
    "corpus_prep_funnel_substring",
    "text_lm_ppl_buckets",
    "embed_opq_probe",
    "dedup_url_canonical",
    "text_html_extract",
    "cap_per_source_skewsafe",
]


def parse_sf(path: str) -> float:
    base = os.path.basename(path.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def main() -> None:
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    # machine-load stamps (VERDICT r11 #4): the r11 driver run was taken
    # at loadavg 4-5.7 and its offender list had 7 lines where the
    # low-load run had 3 — recording load before/after makes offender
    # churn attributable without forensic notes
    load_before = os.getloadavg()

    # load PRE-FLIGHT (VERDICT r12 #5): a run that STARTS hot measures
    # co-tenant contention, not plans. If the 1-min load is above the
    # threshold, wait for it to settle (a just-finished correctness
    # drive's residue decays in a minute or two); if it never does,
    # stamp the run `contaminated` in BENCHDETAIL.json/summary and exit
    # nonzero at the end so the record can never be read as a clean
    # regression — the numbers still land for forensics.
    # SPARK_GRAFT_BENCH_FORCE=1 skips the wait and the nonzero exit.
    max_load = float(os.environ.get("SPARK_GRAFT_BENCH_MAX_LOAD", "1.0"))
    forced = os.environ.get("SPARK_GRAFT_BENCH_FORCE", "0") == "1"
    contaminated = False
    if load_before[0] > max_load and not forced:
        deadline = time.monotonic() + float(
            os.environ.get("SPARK_GRAFT_BENCH_PREFLIGHT_WAIT", "180")
        )
        while os.getloadavg()[0] > max_load and time.monotonic() < deadline:
            print(
                f"# preflight: loadavg {os.getloadavg()[0]:.2f} > "
                f"{max_load} — waiting for the machine to settle",
                file=sys.stderr,
            )
            time.sleep(10)
        load_before = os.getloadavg()
        if load_before[0] > max_load:
            contaminated = True
            print(
                f"# preflight: STILL hot (loadavg {load_before[0]:.2f}) — "
                "running anyway, marking the record contaminated and "
                "exiting nonzero (set SPARK_GRAFT_BENCH_FORCE=1 to accept)",
                file=sys.stderr,
            )

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("ods-spark-bench")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    qs = entry.queries()
    names = [n for n in HEADLINE if n in qs]

    # JVM/codegen warmup: run every headline plan once at the smallest SF
    # so per-query numbers measure the plan's execution at SF_DIR, not
    # Janino whole-stage-codegen compilation or Python-worker startup
    # (one-time costs that amortize to zero on a long-lived cluster).
    warm_dir = "/root/testdata/sf0.001"
    # materialize the silver events copy for SF_DIR up front so the
    # watermark_read_silver timings measure the partition-pruned read,
    # not the one-time relayout write
    try:
        from oracle_duckdb_sync_spark.sources.testdata import ensure_silver_events

        ensure_silver_events(spark, SF_DIR)
    except Exception as e:
        print(f"# silver warmup failed: {e}", file=sys.stderr)
    # same for the persisted IVF index: embed_ivf_probe times the
    # partition-pruned probe, not the one-time index materialization
    try:
        from oracle_duckdb_sync_spark.sources.testdata import ensure_ivf_index

        ensure_ivf_index(spark, SF_DIR, entry._seed_centroids(SF_DIR))
    except Exception as e:
        print(f"# ivf warmup failed: {e}", file=sys.stderr)
    # the timed action is a noop-sink write (below), so warm that plan
    def _run(df):
        df.write.format("noop").mode("overwrite").save()

    for name in names:
        try:
            _run(qs[name](spark, warm_dir))
        except Exception as e:  # never let warmup kill the bench
            print(f"# warmup {name} failed: {e}", file=sys.stderr)

    import statistics

    timings: dict[str, float] = {}
    medians: dict[str, float] = {}
    for name in names:
        # Spark action: noop-sink write, NOT count() (changed r13).
        # count() let Catalyst prune unconsumed window/derived columns
        # on large-output entries (window_running_metrics measured
        # 0.22 s count vs 0.58 s full compute at sf0.1) while the
        # DuckDB side fetchall()s full results — an asymmetry in
        # Spark's favor. The noop sink forces full computation with no
        # driver transfer; r12-and-earlier per-line numbers are ~2%
        # lower in aggregate and not line-comparable on the affected
        # entries (SCALE.md "Round-13").
        reps = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            _run(qs[name](spark, SF_DIR))
            reps.append(time.perf_counter() - t0)
        timings[name] = round(min(reps), 3)
        # median rides along for the offender adjudication: sub-1.5 s
        # lines swing 2-3× run-to-run with long-JVM state even on an
        # exclusive machine, and a single lucky/unlucky rep shouldn't
        # decide offender-list membership
        medians[name] = round(statistics.median(reps), 3)
        # queries that persist() intermediates (minhash, simhash, jaccard)
        # re-persist fresh DataFrames every rep; drop the dead entries so
        # storage memory doesn't creep across the 26×REPS run
        spark.catalog.clearCache()
        print(
            f"# {name}: {timings[name]:.3f}s median {medians[name]:.3f}s",
            file=sys.stderr,
        )

    result = {
        "metric": "headline-query wall time, Spark local[{}] @ {}".format(CPUS, SF_DIR),
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "medians": medians,
        "median_total": round(sum(medians.values()), 3),
        "sf": parse_sf(SF_DIR),
        "n_queries": len(timings),
    }

    if os.environ.get("SPARK_GRAFT_BENCH_DUCKDB", "1") != "0":
        import duckdb

        con = duckdb.connect()
        con.execute(f"SET threads={CPUS}")
        for t in (
            "region nation customer supplier part orders lineitem "
            "events documents embeddings".split()
        ):
            p = os.path.join(SF_DIR, f"{t}.parquet")
            if os.path.exists(p):
                # dir-of-part-files tables (gen_sf.py's realistic
                # layout) need the glob on the DuckDB side
                src = f"{p}/*.parquet" if os.path.isdir(p) else p
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')"
                )
        oracles = entry.oracle_sql()
        duck_timings: dict[str, float] = {}
        duck_medians: dict[str, float] = {}
        for name in names:
            if name not in oracles:
                continue
            reps = []
            for _ in range(REPS):
                t0 = time.perf_counter()
                con.execute(oracles[name]).fetchall()
                reps.append(time.perf_counter() - t0)
            duck_timings[name] = round(min(reps), 3)
            duck_medians[name] = round(statistics.median(reps), 3)
            print(f"# duckdb {name}: {duck_timings[name]:.3f}s", file=sys.stderr)
        result["duckdb_queries"] = duck_timings
        result["duckdb_medians"] = duck_medians
        result["duckdb_total"] = round(sum(duck_timings.values()), 3)
        result["duckdb_median_total"] = round(sum(duck_medians.values()), 3)
        if result["duckdb_total"] > 0:
            result["ratio"] = round(result["value"] / result["duckdb_total"], 3)
        if result["duckdb_median_total"] > 0:
            result["median_ratio"] = round(
                result["median_total"] / result["duckdb_median_total"], 3
            )
        # mechanical offender list (VERDICT r7 #1): every line that is
        # BOTH >2× its oracle AND ≥0.8 s absolute — the set a round
        # summary must quote verbatim instead of hand-summarizing.
        # The cut uses MEDIANS (VERDICT r10 #6): sub-second lines swing
        # 2-3× with single-run noise, so min-of-reps membership churns
        # round to round; the per-line record still carries both stats.
        result["offenders"] = {
            name: {
                "spark": timings[name],
                "spark_median": medians[name],
                "duckdb": duck_timings[name],
                "duckdb_median": duck_medians[name],
                "ratio": round(medians[name] / duck_medians[name], 1)
                if duck_medians[name] > 0
                else None,
            }
            for name in sorted(
                duck_medians,
                key=lambda n: medians[n],
                reverse=True,
            )
            if medians[name] >= 0.8
            and medians[name] > 2 * duck_medians[name]
        }

    spark.stop()

    result["loadavg_before"] = [round(v, 2) for v in load_before]
    result["loadavg_after"] = [round(v, 2) for v in os.getloadavg()]
    result["contaminated"] = contaminated

    # full detail: committed file + stderr (the driver's tail capture is
    # ~2000 chars; r5's 71-query single line overflowed it)
    detail_path = os.path.join(REPO, "BENCHDETAIL.json")
    with open(detail_path, "w") as fh:
        json.dump(result, fh, indent=1, sort_keys=True)
    print(f"# full per-query detail -> {detail_path}", file=sys.stderr)

    # final stdout line: compact summary — totals plus only the slowest
    # queries, sized to stay well inside the driver's tail capture
    slowest = dict(
        sorted(timings.items(), key=lambda kv: kv[1], reverse=True)[:8]
    )
    summary = {
        "metric": result["metric"],
        "value": result["value"],
        "unit": "sec",
        "queries": slowest,
        "sf": result["sf"],
        "n_queries": result["n_queries"],
        "detail": "BENCHDETAIL.json",
        # 1-minute loadavg at start/end: offender-list churn correlates
        # with co-tenant load (r11: 7 offenders at load ~5 vs 3 idle)
        "load": [result["loadavg_before"][0], result["loadavg_after"][0]],
    }
    if contaminated:
        summary["contaminated"] = True
    for k in ("duckdb_total", "ratio"):
        if k in result:
            summary[k] = result[k]
    if "offenders" in result:
        summary["offenders"] = {
            n: d["ratio"] for n, d in result["offenders"].items()
        }
        summary["n_offenders"] = len(result["offenders"])
    line = json.dumps(summary)
    # shrink queries first, then (a pathological regression round) the
    # offender map itself — n_offenders keeps the true count on the
    # line; the full list is always in BENCHDETAIL.json
    while len(line) > 1500 and (
        summary["queries"] or summary.get("offenders")
    ):
        if summary["queries"]:
            summary["queries"].popitem()
        else:
            summary["offenders"].popitem()
        line = json.dumps(summary)
    print(line)
    if contaminated:
        sys.exit(3)


if __name__ == "__main__":
    main()
