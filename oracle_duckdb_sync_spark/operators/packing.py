"""Sequence packing: group documents into token-budget bins (training
batch construction — packing short documents into fixed-length context
windows wastes no pad tokens).

Scale shape: packing is inherently sequential (each assignment depends
on the running fill), so the corpus is sharded by a deterministic hash
bucket first — shards pack independently in parallel (`applyInPandas`,
one shuffle), and each shard's result is reproducible: next-fit in
doc_id order. At 100 TB choose n_shards ≈ corpus_tokens / (executor
memory budget); packing quality is unaffected by sharding since bins
never span shards by design (a bin is a unit of training data, not of
storage).

Not SQL-expressible (cumulative sum with reset is not a window
function), so the driver records the rows-only check; the invariants —
every doc packed exactly once, no bin over budget unless a single
oversize doc, bins dense in id order — are pinned in pytest.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from .sampling import sample_bucket_expr

PACK_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("shard", LongType()),
        StructField("pack_id", LongType()),
        StructField("n_tokens", LongType()),
    ]
)


def pack_sequences(
    df: DataFrame,
    id_col: str,
    n_tokens_col: str,
    budget: int,
    n_shards: int = 32,
    salt: str = "pack0",
) -> DataFrame:
    """→ (doc_id, shard, pack_id, n_tokens): next-fit packing within
    deterministic hash shards.

    Next-fit (close the bin when the next doc overflows it) is O(n) and
    streaming-friendly; docs larger than the budget get a bin of their
    own. ``pack_id`` is dense per shard, in ascending doc-id order.
    """
    sharded = df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(n_tokens_col).cast("long").alias("n_tokens"),
        F.pmod(sample_bucket_expr(id_col, salt), F.lit(n_shards)).alias("shard"),
    )

    def pack_one(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        pack_ids = []
        pack_id, fill = 0, 0
        for nt in pdf["n_tokens"]:
            nt = int(nt)
            if fill > 0 and fill + nt > budget:
                pack_id += 1
                fill = 0
            pack_ids.append(pack_id)
            fill += nt
        pdf = pdf.assign(pack_id=pack_ids)
        return pdf[["doc_id", "shard", "pack_id", "n_tokens"]]

    return sharded.groupBy("shard").applyInPandas(pack_one, schema=PACK_SCHEMA)


def pack_stats(packed: DataFrame, budget: int) -> DataFrame:
    """Per-bin fill statistics (packing-efficiency dashboard)."""
    return (
        packed.groupBy("shard", "pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("fill_tokens"),
        )
        .withColumn(
            "fill_ratio", F.round(F.col("fill_tokens") / float(budget), 6)
        )
    )
