"""Merge / dedup / upsert operators (reference C1-C2, F1-F2).

- C1 UPSERT merge-on-key (``ON CONFLICT (pk) DO UPDATE``,
  database/duckdb_source.py:114-131)      → :func:`upsert`
- C2/F2 order-aware dedup (``drop_duplicates(subset, keep='last')``,
  data/incremental_loader.py:196-244)     → :func:`dedup_keep`
- F1 incremental merge = concat + sort by time
  (data/incremental_loader.py:139-194)    → :func:`merge_incremental`

Scale notes: ``upsert`` is a single **left-anti equi-join + union** — at
100 TB the join shuffles on the key unless the new batch is small, in
which case AQE (or an explicit ``broadcast(new)``) turns it into a
broadcast anti-join with zero shuffle of the big side. ``dedup_keep`` is
one hash shuffle on the keys + per-partition sort (window), no global
sort. ``merge_incremental`` is union (no shuffle) + optional sort that
callers at scale should skip in favor of sorting at the edge.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_incremental(
    cached: DataFrame | None,
    delta: DataFrame | None,
    time_col: str | None = None,
    sort: bool = True,
) -> DataFrame | None:
    """Union cached + delta rows, optionally sorted by the time column (F1).

    Empty-side short-circuits mirror data/incremental_loader.py:148-160.
    ``unionByName`` aligns columns by name, the schema contract of the
    reference's ``pd.concat``.
    """
    if cached is None:
        out = delta
    elif delta is None:
        out = cached
    else:
        out = cached.unionByName(delta)
    if out is not None and sort and time_col:
        out = out.orderBy(F.col(time_col).asc())
    return out


def dedup_keep(
    df: DataFrame,
    subset: Sequence[str],
    order_col: str | Sequence[str] | None = None,
    keep: str = "last",
) -> DataFrame:
    """Order-aware dedup, pandas ``drop_duplicates(subset, keep=...)`` parity.

    Spark DataFrames carry no row order between stages (SURVEY §4.3-5), so
    "first"/"last" must be defined by an explicit ``order_col``:
    keep='last' keeps the row with the greatest ``order_col`` per key group,
    keep='first' the least, keep=False drops every duplicated key outright.

    Implemented as one window over ``partitionBy(subset)`` — a single hash
    shuffle on the dedup keys; per-group sort happens within partitions.
    """
    if keep is False:
        counts = Window.partitionBy(*[F.col(c) for c in subset])
        return (
            df.withColumn("__n", F.count(F.lit(1)).over(counts))
            .filter(F.col("__n") == 1)
            .drop("__n")
        )
    if order_col is None:
        # order-irrelevant dedup: arbitrary representative per key
        return df.dropDuplicates(list(subset))
    order_cols = [order_col] if isinstance(order_col, str) else list(order_col)
    directions = [
        F.col(c).desc() if keep == "last" else F.col(c).asc() for c in order_cols
    ]
    w = Window.partitionBy(*[F.col(c) for c in subset]).orderBy(*directions)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def upsert(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    broadcast_new: bool = False,
    allow_missing_columns: bool = False,
) -> DataFrame:
    """Merge-on-key: rows of ``new`` replace same-key rows of ``old`` (C1).

    ``ON CONFLICT (pk) DO UPDATE SET col = EXCLUDED.col`` ≡ keep every
    old row whose key is absent from new (left-anti join), then append all
    new rows. ``broadcast_new=True`` hints the typical sync shape (small
    incremental batch vs huge base table) so the anti-join broadcasts the
    batch and the base table is never shuffled.

    ``allow_missing_columns=True`` is the schema-evolution contract the
    reference gets from ``ALTER TABLE`` + ``ON CONFLICT``: a batch may
    ADD columns (old rows read as NULL for them) or omit columns the
    table already has (new rows get NULL) — the source system adding a
    field mid-stream must not wedge the sync loop. Default off so an
    accidental schema drift is an error, not silent NULLs.
    """
    probe = new.select(*keys).dropDuplicates(list(keys))
    if broadcast_new:
        probe = F.broadcast(probe)
    survivors = old.join(probe, on=list(keys), how="left_anti")
    return survivors.unionByName(new, allowMissingColumns=allow_missing_columns)
