"""Sharded training-corpus export: write a table as N deterministic
shards plus a manifest — the hand-off format a training loader wants
(fixed shard count, per-shard stats, a checksum to validate transfer).

Scale design: shard assignment is the content-stable md5 bucket of the
id (`operators/sampling.py` convention) — a map-side projection, so the
export is ONE `partitionBy("shard")` write with no global sort and no
skew pivot (hash spreads ids uniformly; a range-sorted export would
need a full-table range shuffle for no training benefit, since loaders
shuffle shards anyway). The manifest's per-shard stats come from one
partial+final aggregate over the same pass's columns; the checksum is
an order-insensitive SUM of per-row id hashes (mod 2^61), so any
dropped/duplicated/corrupted row changes it regardless of row order
(accumulated in DECIMAL(38,0) so it cannot overflow at any corpus size) —
verifiable shard-by-shard on the receiving side at any parallelism.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import hash60_expr

_CHECKSUM_MOD = (1 << 61) - 1


def shard_expr(id_col: str, n_shards: int) -> F.Column:
    """Deterministic shard in [0, n_shards) from the id's content hash."""
    return F.pmod(hash60_expr(F.col(id_col).cast("string")), F.lit(n_shards))


def write_shards(
    df: DataFrame,
    path: str,
    id_col: str,
    n_shards: int,
) -> dict:
    """Write ``df`` as ``n_shards`` hash-assigned parquet shard
    directories (``shard=K/``) under ``path``, plus ``_manifest.json`` (underscore prefix: invisible to Spark's parquet file index, like _SUCCESS).

    Returns the manifest:
    ``{"n_shards", "total_rows", "id_col",
    "shards": {k: {"rows", "id_min", "id_max", "checksum"}}}``.
    Empty shards (possible for tiny inputs) appear with zero rows.
    Deterministic: same input → same shard membership, same manifest.
    """
    if n_shards <= 0:
        raise ValueError("n_shards must be positive")
    sharded = df.withColumn("shard", shard_expr(id_col, n_shards))
    sharded.write.mode("overwrite").partitionBy("shard").parquet(path)
    # stats from the WRITTEN files, not the input lineage: the manifest
    # describes what is actually on disk, and the input plan isn't
    # recomputed for the aggregate
    written = df.sparkSession.read.parquet(path)
    stats = (
        written.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.min(id_col).alias("id_min"),
            F.max(id_col).alias("id_max"),
            F.pmod(
                F.sum(
                    F.pmod(
                        hash60_expr(F.col(id_col).cast("string")), F.lit(_CHECKSUM_MOD)
                    ).cast("decimal(38,0)")
                ),
                F.lit(_CHECKSUM_MOD).cast("decimal(38,0)"),
            ).cast("long").alias("checksum"),
        )
        .collect()  # bounded: one row per shard
    )
    shards = {
        int(r["shard"]): {
            "rows": int(r["rows"]),
            "id_min": r["id_min"],
            "id_max": r["id_max"],
            "checksum": int(r["checksum"]),
        }
        for r in stats
    }
    for k in range(n_shards):
        shards.setdefault(k, {"rows": 0, "id_min": None, "id_max": None, "checksum": 0})
    manifest = {
        "n_shards": n_shards,
        "total_rows": sum(s["rows"] for s in shards.values()),
        "id_col": id_col,
        "shards": {str(k): shards[k] for k in sorted(shards)},
    }
    tmp = os.path.join(path, "_manifest.json.tmp")
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(manifest, f, indent=2, sort_keys=True)
    os.replace(tmp, os.path.join(path, "_manifest.json"))
    return manifest


def verify_shards(spark, path: str) -> dict:
    """Receiving-side validation: recompute per-shard row counts and
    checksums from the written files and diff against the manifest.
    Returns ``{"ok": bool, "mismatches": {shard: reason}}``."""
    with open(os.path.join(path, "_manifest.json"), encoding="utf-8") as f:
        manifest = json.load(f)
    id_col = manifest["id_col"]
    got = {
        int(r["shard"]): (int(r["rows"]), int(r["checksum"]))
        for r in (
            spark.read.parquet(path)
            .groupBy("shard")
            .agg(
                F.count(F.lit(1)).alias("rows"),
                F.pmod(
                    F.sum(
                    F.pmod(
                        hash60_expr(F.col(id_col).cast("string")), F.lit(_CHECKSUM_MOD)
                    ).cast("decimal(38,0)")
                ),
                    F.lit(_CHECKSUM_MOD).cast("decimal(38,0)"),
                ).cast("long").alias("checksum"),
            )
            .collect()
        )
    }
    mismatches = {}
    for k, spec in manifest["shards"].items():
        rows, checksum = got.get(int(k), (0, 0))
        if rows != spec["rows"]:
            mismatches[k] = f"rows {rows} != {spec['rows']}"
        elif checksum != spec["checksum"]:
            mismatches[k] = f"checksum {checksum} != {spec['checksum']}"
    return {"ok": not mismatches, "mismatches": mismatches}
