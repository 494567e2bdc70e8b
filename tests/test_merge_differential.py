"""MERGE-semantics differential against DuckDB's native upsert.

The reference gets transactional upsert free from DuckDB
(``INSERT ... ON CONFLICT DO UPDATE`` — reference
database/duckdb_source.py:114-131). The sandbox has no Delta/Iceberg
runtime, so the Parquet-swap path is our production MERGE; these tests
pin its semantics against DuckDB's engine over the two hard axes —
moved keys and schema evolution — so the swap path provably preserves
(or explicitly documents diverging from) the reference's contract.

Matrix:
- plain update/insert mix         → must match ON CONFLICT exactly
- key whose PARTITION VALUE moves → unpartitioned path matches
  (table-wide key match); partitioned path DOCUMENTS the divergence
  (old copy stays in the never-read partition — the Hive
  replaceWhere-class constraint, same as Delta partition-scoped merges)
- batch adds a column             → merge_schema=True == DuckDB
  ALTER TABLE ADD COLUMN + upsert (old rows read NULL)
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import Row

from oracle_duckdb_sync_spark.sources import sinks


def _spark_table(spark, path):
    rows = spark.read.option("mergeSchema", "true").parquet(path).collect()
    return sorted(tuple(r[c] for c in sorted(r.asDict())) for r in rows)


def _duck_table(con, cols=("id", "day", "v")):
    q = ", ".join(sorted(cols))
    return sorted(tuple(r) for r in con.execute(f"SELECT {q} FROM t").fetchall())


@pytest.fixture()
def duck():
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t (id BIGINT PRIMARY KEY, day VARCHAR, v BIGINT)"
    )
    con.execute(
        "INSERT INTO t VALUES (1,'d1',10), (2,'d1',20), (3,'d2',30)"
    )
    yield con
    con.close()


BASE = [Row(id=1, day="d1", v=10), Row(id=2, day="d1", v=20),
        Row(id=3, day="d2", v=30)]


def _duck_upsert(con, rows, cols="id, day, v"):
    con.executemany(
        f"INSERT INTO t ({cols}) VALUES (?, ?, ?) "
        "ON CONFLICT (id) DO UPDATE SET "
        "day = excluded.day, v = excluded.v",
        rows,
    )


def test_upsert_matches_on_conflict_update_insert(spark, tmp_path, duck):
    """Update + insert mix: swap-path result == DuckDB ON CONFLICT."""
    path = str(tmp_path / "t")
    spark.createDataFrame(BASE).write.parquet(path)
    batch = [Row(id=2, day="d1", v=99), Row(id=4, day="d2", v=40)]
    sinks.upsert(spark, spark.createDataFrame(batch), path, ["id"])
    _duck_upsert(duck, [(2, "d1", 99), (4, "d2", 40)])
    assert _spark_table(spark, path) == _duck_table(duck)


def test_upsert_moved_key_unpartitioned_matches(spark, tmp_path, duck):
    """A key whose partition-ish value changes: the UNPARTITIONED swap
    path key-matches table-wide, so it relocates the row exactly like
    DuckDB's ON CONFLICT — no stale copy."""
    path = str(tmp_path / "t")
    spark.createDataFrame(BASE).write.parquet(path)
    batch = [Row(id=3, day="d9", v=33)]  # id 3 moves d2 -> d9
    sinks.upsert(spark, spark.createDataFrame(batch), path, ["id"])
    _duck_upsert(duck, [(3, "d9", 33)])
    got = _spark_table(spark, path)
    assert got == _duck_table(duck)
    assert ("d9", 3, 33) in got and ("d2", 3, 30) not in got


def test_upsert_moved_key_partitioned_documents_divergence(
    spark, tmp_path, duck
):
    """The PARTITIONED swap path only reads partitions present in the
    batch (that's what makes it scan-bounded at 100 TB), so a moved key
    leaves its old copy behind — the documented replaceWhere-class
    constraint. Pin the divergence explicitly: this is the one case
    where the parquet path and DuckDB's table-wide ON CONFLICT differ,
    and both the new row and the stale old row must be visible."""
    path = str(tmp_path / "t")
    spark.createDataFrame(BASE).write.partitionBy("day").parquet(path)
    batch = [Row(id=3, day="d9", v=33)]
    sinks.upsert(
        spark, spark.createDataFrame(batch), path, ["id"],
        partition_cols=["day"],
    )
    _duck_upsert(duck, [(3, "d9", 33)])
    got = _spark_table(spark, path)
    assert got != _duck_table(duck)  # divergence is real...
    assert ("d9", 3, 33) in got      # ...new copy written
    assert ("d2", 3, 30) in got      # ...old copy (documented) remains
    # every other row identical to DuckDB
    assert [r for r in got if r[1] != 3] == [
        r for r in _duck_table(duck) if r[1] != 3
    ]


def test_upsert_schema_evolution_matches_alter_table(spark, tmp_path, duck):
    """Batch adds a column: merge_schema=True == the reference's
    ALTER TABLE ADD COLUMN + ON CONFLICT shape (old rows read NULL for
    the new column)."""
    path = str(tmp_path / "t")
    spark.createDataFrame(BASE).write.parquet(path)
    batch = [Row(id=2, day="d1", v=99, src="sync2"),
             Row(id=5, day="d3", v=50, src="sync2")]
    sinks.upsert(
        spark, spark.createDataFrame(batch), path, ["id"], merge_schema=True
    )
    duck.execute("ALTER TABLE t ADD COLUMN src VARCHAR")
    duck.executemany(
        "INSERT INTO t (id, day, v, src) VALUES (?, ?, ?, ?) "
        "ON CONFLICT (id) DO UPDATE SET day = excluded.day, "
        "v = excluded.v, src = excluded.src",
        [(2, "d1", 99, "sync2"), (5, "d3", 50, "sync2")],
    )
    assert _spark_table(spark, path) == _duck_table(
        duck, cols=("id", "day", "v", "src")
    )


def test_upsert_batch_omits_evolved_column(spark, tmp_path, duck):
    """The mirror evolution: the TABLE has a column the batch omits.
    merge_schema=True keeps the column; the batch's updated rows read
    NULL for it — byte-matching DuckDB when the INSERT omits the column
    and the DO UPDATE sets it to NULL (the sync-engine convention: an
    omitted column in the source snapshot means 'no value')."""
    path = str(tmp_path / "t")
    spark.createDataFrame(
        [Row(id=1, day="d1", v=10, note="n1"), Row(id=2, day="d1", v=20, note="n2")]
    ).write.parquet(path)
    duck.execute("DELETE FROM t")
    duck.execute("ALTER TABLE t ADD COLUMN note VARCHAR")
    duck.execute("INSERT INTO t VALUES (1,'d1',10,'n1'), (2,'d1',20,'n2')")
    batch = [Row(id=2, day="d1", v=99), Row(id=6, day="d4", v=60)]
    sinks.upsert(
        spark, spark.createDataFrame(batch), path, ["id"], merge_schema=True
    )
    duck.executemany(
        "INSERT INTO t (id, day, v, note) VALUES (?, ?, ?, NULL) "
        "ON CONFLICT (id) DO UPDATE SET day = excluded.day, "
        "v = excluded.v, note = NULL",
        [(2, "d1", 99), (6, "d4", 60)],
    )
    assert _spark_table(spark, path) == _duck_table(
        duck, cols=("id", "day", "v", "note")
    )
