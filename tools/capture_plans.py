#!/usr/bin/env python
"""Capture `.explain("formatted")` for registry queries into text files.

Usage:
    python tools/capture_plans.py <entry_file> <sf_dir> <out_dir> <suffix> [names...]

Writes <out_dir>/<name>_<suffix>.txt for each query name (default: a
curated list passed on the command line). The judge reads these files to
check plan-shape claims (Exchange counts, join strategies, PushedFilters)
against the code, so the capture is the raw formatted plan, unedited.

A plain local session mirrors the bench session's confs so the captured
plan is the shape the bench actually executes (AQE on, 32 shuffle
partitions); `explain` shows the initial plan (isFinalPlan=false) — the
AQE-final shape is asserted separately by tests/test_plans.py.
"""

from __future__ import annotations

import importlib.util
import io
import os
import sys
from contextlib import redirect_stdout


def main() -> None:
    entry_path, sf_dir, out_dir, suffix = sys.argv[1:5]
    names = sys.argv[5:]

    spec = importlib.util.spec_from_file_location("__spark_entry__", entry_path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["__spark_entry__"] = mod
    spec.loader.exec_module(mod)

    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("capture-plans")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    qs = mod.queries()
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        if name not in qs:
            print(f"SKIP {name}: not in queries()", file=sys.stderr)
            continue
        try:
            df = qs[name](spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            out = os.path.join(out_dir, f"{name}_{suffix}.txt")
            with open(out, "w") as fh:
                fh.write(buf.getvalue())
            print(f"wrote {out}")
        except Exception as e:
            print(f"FAIL {name}: {e}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
