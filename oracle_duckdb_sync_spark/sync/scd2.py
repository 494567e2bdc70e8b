"""History-preserving sync: snapshot diff + SCD type-2 apply.

The reference's sync loop overwrites rows in place (``ON CONFLICT``
upsert, database/duckdb_source.py:114-131) — the destination always
holds only the latest state, and the history of a row is lost. The two
operators here close that gap, the standard warehouse answer:

- :func:`snapshot_diff` — compare two snapshots of a keyed table and
  classify every key as inserted / updated / deleted / unchanged. This
  is also the engine for "what would a sync do" dry-runs.
- :func:`scd2_apply` — maintain a slowly-changing-dimension type-2
  history table (``valid_from_us / valid_to_us / is_current``): new
  keys open a row, changed keys close the current row and open a new
  one, deleted keys just close. Point-in-time queries become a plain
  range predicate (``valid_from_us <= t < valid_to_us``).

Scale design: both are single equi-join plans on the key (full-outer
for the diff; history vs batch for the apply, with only ``is_current``
rows entering the join — closed history rows pass through untouched and
at 100 TB would live in separate partitions pruned by an
``is_current`` partition/file filter). Change detection compares an
md5 over the canonicalized tracked columns, so wide rows join on one
64-bit-ish digest instead of N columns. No windows, no global sorts.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _row_digest(cols: Sequence[str]) -> Column:
    """Order-canonical md5 digest of the tracked columns (NULL-safe:
    NULL and the string 'NULL' hash differently via a length prefix)."""
    parts = []
    for c in sorted(cols):
        s = F.col(c).cast("string")
        parts.append(F.when(s.isNull(), F.lit("\x00")).otherwise(F.concat(F.length(s).cast("string"), F.lit(":"), s)))
    return F.md5(F.concat_ws("|", *parts))


def _row_digest_sql(cols: Sequence[str]) -> str:
    parts = []
    for c in sorted(cols):
        s = f"({c})::VARCHAR"
        parts.append(
            f"CASE WHEN {s} IS NULL THEN chr(0) "
            f"ELSE length({s})::VARCHAR || ':' || {s} END"
        )
    return "md5(concat_ws('|', " + ", ".join(parts) + "))"


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    tracked_cols: Sequence[str],
) -> DataFrame:
    """Classify every key across two snapshots.

    Returns one row per key present in either snapshot:
    ``keys…, change`` where ``change`` ∈
    ``{'inserted', 'updated', 'deleted', 'unchanged'}``.
    One full-outer equi-join on the key; non-key columns ride as a
    single md5 digest each side.
    """
    o = old.select(*keys, _row_digest(tracked_cols).alias("__old_d"))
    n = new.select(*keys, _row_digest(tracked_cols).alias("__new_d"))
    joined = o.join(n, on=list(keys), how="full_outer")
    change = (
        F.when(F.col("__old_d").isNull(), "inserted")
        .when(F.col("__new_d").isNull(), "deleted")
        .when(F.col("__old_d") == F.col("__new_d"), "unchanged")
        .otherwise("updated")
    )
    return joined.select(*keys, change.alias("change"))


def snapshot_diff_sql(
    old_table: str,
    new_table: str,
    keys: Sequence[str],
    tracked_cols: Sequence[str],
) -> str:
    """DuckDB twin of :func:`snapshot_diff`."""
    k = ", ".join(keys)
    d = _row_digest_sql(tracked_cols)
    on = " AND ".join(f"o.{c} = n.{c}" for c in keys)
    key_out = ", ".join(f"COALESCE(o.{c}, n.{c}) AS {c}" for c in keys)
    return f"""
    WITH o AS (SELECT {k}, {d} AS old_d FROM {old_table}),
         n AS (SELECT {k}, {d} AS new_d FROM {new_table})
    SELECT {key_out},
           CASE WHEN o.old_d IS NULL THEN 'inserted'
                WHEN n.new_d IS NULL THEN 'deleted'
                WHEN o.old_d = n.new_d THEN 'unchanged'
                ELSE 'updated' END AS change
    FROM o FULL OUTER JOIN n ON {on}
    """


OPEN_END_US = (1 << 62)  # far-future sentinel for open history rows


def scd2_init(
    snapshot: DataFrame,
    keys: Sequence[str],
    tracked_cols: Sequence[str],
    as_of_us: int,
) -> DataFrame:
    """Bootstrap a history table from the first snapshot: every row
    current, valid from ``as_of_us`` to the open-end sentinel."""
    return snapshot.select(
        *keys,
        *tracked_cols,
        F.lit(as_of_us).cast("long").alias("valid_from_us"),
        F.lit(OPEN_END_US).cast("long").alias("valid_to_us"),
        F.lit(True).alias("is_current"),
    )


def scd2_apply(
    history: DataFrame,
    batch: DataFrame,
    keys: Sequence[str],
    tracked_cols: Sequence[str],
    batch_ts_us: int,
    batch_is_full_snapshot: bool = True,
) -> DataFrame:
    """Apply a new snapshot (or partial batch) to an SCD2 history table
    and return the new history.

    - key only in batch → new current row opens at ``batch_ts_us``;
    - key in both, tracked columns changed → current row closes at
      ``batch_ts_us``, new current row opens;
    - key in both, unchanged → history untouched (idempotence: applying
      the same snapshot twice is a no-op);
    - key only in history: with ``batch_is_full_snapshot`` the current
      row closes (the key disappeared from source); with a partial
      batch it stays open (absence means "no news", the incremental
      sync contract).

    Plan: closed rows pass through without joining; current rows
    full-outer-join the batch on the key once (digest-based change
    detection); no windows. Output schema:
    ``keys…, tracked…, valid_from_us, valid_to_us, is_current``.
    """
    closed = history.filter(~F.col("is_current"))
    current = history.filter(F.col("is_current"))

    cur = current.select(
        *keys,
        *[F.col(c).alias(f"__h_{c}") for c in tracked_cols],
        "valid_from_us",
        _row_digest(tracked_cols).alias("__h_d"),
    )
    bat = batch.select(
        *keys,
        *[F.col(c).alias(f"__b_{c}") for c in tracked_cols],
        _row_digest(tracked_cols).alias("__b_d"),
    )
    j = cur.join(bat, on=list(keys), how="full_outer")

    in_hist = F.col("__h_d").isNotNull()
    in_batch = F.col("__b_d").isNotNull()
    changed = in_hist & in_batch & (F.col("__h_d") != F.col("__b_d"))
    ts = F.lit(batch_ts_us).cast("long")

    # surviving version of the OLD current row (possibly closed)
    close_old = changed | (
        (~in_batch) if batch_is_full_snapshot else F.lit(False)
    )
    old_rows = j.filter(in_hist).select(
        *keys,
        *[F.col(f"__h_{c}").alias(c) for c in tracked_cols],
        F.col("valid_from_us"),
        F.when(close_old, ts).otherwise(F.lit(OPEN_END_US).cast("long")).alias("valid_to_us"),
        (~close_old).alias("is_current"),
    )
    # newly-opened rows for inserted or changed keys
    new_rows = j.filter(in_batch & (changed | ~in_hist)).select(
        *keys,
        *[F.col(f"__b_{c}").alias(c) for c in tracked_cols],
        ts.alias("valid_from_us"),
        F.lit(OPEN_END_US).cast("long").alias("valid_to_us"),
        F.lit(True).alias("is_current"),
    )
    return closed.select(*new_rows.columns).unionByName(old_rows).unionByName(new_rows)


def as_of(history: DataFrame, t_us: int) -> DataFrame:
    """Point-in-time read: the table as it was at ``t_us`` — a plain
    range predicate, pushdown-eligible."""
    return history.filter(
        (F.col("valid_from_us") <= F.lit(t_us))
        & (F.col("valid_to_us") > F.lit(t_us))
    ).drop("valid_from_us", "valid_to_us", "is_current")
