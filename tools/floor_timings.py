#!/usr/bin/env python
"""Per-query sf1 Spark-vs-DuckDB medians for the floor-class offenders
(VERDICT r12 #3): the sub-1.5 s sf0.1 lines adjudicated as Spark's
stage-scheduling floor on multi-join trees. At sf1 real data amortizes
the floor, so these numbers are the direct evidence the adjudication
leans on — committed as a table in SCALE.md each time they're re-run.

Usage: python tools/floor_timings.py [sf_dir] [reps]
Defaults: .localdata/sf1, 3 reps (median reported; first rep of the
process is warmup-dominated, so every query is warmed at sf0.001
before timing — same convention as bench.py).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FLOOR_QUERIES = [
    "tpch_q2_min_cost_supplier",
    "tpch_q3_shipping_priority",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q9_product_type_profit",
    "tpch_q17_small_quantity_revenue",
    "tpch_q21_waiting_suppliers",
    "text_tfidf_index",
    "text_bm25_topk",
    # r13 offender lines needing committed sf1 growth evidence under
    # the same methodology (VERDICT r13 #2): constant-factor suspects,
    # not floor-class — the table shows which bucket each lands in.
    "tpch_q1_pricing_summary",
    "revenue_by_nation",
    "counter_total_by_type",
    "gapfill_locf_10m",
]


def main() -> None:
    sf_dir = (
        sys.argv[1]
        if len(sys.argv) > 1
        else os.path.join(REPO, ".localdata", "sf1")
    )
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    print(f"# loadavg at start: {os.getloadavg()}", file=sys.stderr)
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("floor-timings")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config(
            "spark.sql.adaptive.coalescePartitions.parallelismFirst", "false"
        )
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    con.execute("SET threads=32")
    for t in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings".split()
    ):
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            src = f"{p}/*.parquet" if os.path.isdir(p) else p
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')"
            )

    qs, oracles = entry.queries(), entry.oracle_sql()
    warm_dir = "/root/testdata/sf0.001"

    # noop-sink action, NOT count() (ADVICE r13): count() lets Catalyst
    # prune unconsumed output columns while the DuckDB side fetchall()s
    # full results — the exact asymmetry bench.py removed in r13. One
    # methodology across bench, sweep, and this adjudication table.
    def _run(df):
        df.write.format("noop").mode("overwrite").save()

    for name in FLOOR_QUERIES:
        try:
            _run(qs[name](spark, warm_dir))
        except Exception as e:
            print(f"# warmup {name} failed: {e}", file=sys.stderr)

    rows = []
    for name in FLOOR_QUERIES:
        s_reps, d_reps = [], []
        for _ in range(reps):
            t0 = time.perf_counter()
            _run(qs[name](spark, sf_dir))
            s_reps.append(time.perf_counter() - t0)
            spark.catalog.clearCache()
        for _ in range(reps):
            t0 = time.perf_counter()
            con.execute(oracles[name]).fetchall()
            d_reps.append(time.perf_counter() - t0)
        sm = round(statistics.median(s_reps), 2)
        dm = round(statistics.median(d_reps), 2)
        ratio = round(sm / dm, 2) if dm > 0 else None
        rows.append({"query": name, "spark": sm, "duckdb": dm, "ratio": ratio})
        print(f"# {name}: spark {sm}s duckdb {dm}s ratio {ratio}",
              file=sys.stderr)

    spark.stop()
    print(json.dumps({
        "sf_dir": sf_dir,
        "reps": reps,
        "loadavg": [round(v, 2) for v in os.getloadavg()],
        "rows": rows,
    }))


if __name__ == "__main__":
    main()
