"""Z-order layout: key correctness + the pruning it exists to buy."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from oracle_duckdb_sync_spark.operators import layout as L
from oracle_duckdb_sync_spark.sources.testdata import load_table


def test_zorder_key_interleaves_bits(spark):
    """Hand-checked Morton codes on a 2-bit grid: (x, y) quantized to
    [0,3], key = y1 x1 y0 x0 (x = column 0 → even bit positions)."""
    df = spark.createDataFrame(
        [Row(x=float(x), y=float(y)) for x in range(4) for y in range(4)]
    )
    got = {
        (int(r.x), int(r.y)): r.z
        for r in df.select(
            "x", "y",
            L.zorder_key_expr(["x", "y"], [(0.0, 3.0), (0.0, 3.0)], bits=2).alias("z"),
        ).collect()
    }

    def morton(x: int, y: int) -> int:
        return (
            (x & 1) | ((y & 1) << 1) | (((x >> 1) & 1) << 2) | (((y >> 1) & 1) << 3)
        )

    assert got == {(x, y): morton(x, y) for x in range(4) for y in range(4)}


def test_zorder_key_clamps_out_of_bounds(spark):
    df = spark.createDataFrame([Row(x=-5.0), Row(x=99.0)])
    vals = [
        r.z
        for r in df.select(
            L.zorder_key_expr(["x"], [(0.0, 7.0)], bits=3).alias("z")
        ).collect()
    ]
    assert vals == [0, 7]


def test_zorder_layout_prunes_both_dimensions(spark, sf_dir, tmp_path):
    """The point of the layout: after clustering, a selective predicate
    on EITHER interleaved dimension must let footer-stats pruning skip
    a majority of files — while a naive round-robin layout skips none.
    Row content is untouched."""
    e = load_table(spark, sf_dir, "events")
    zpath, npath = str(tmp_path / "z"), str(tmp_path / "n")
    L.zorder_layout(e, zpath, ["user_id", "value"], target_files=16)
    e.repartition(16).write.parquet(npath)

    assert spark.read.parquet(zpath).count() == e.count()
    assert set(spark.read.parquet(zpath).columns) == set(e.columns)

    for col in ("user_id", "value"):
        # SF-independent selective predicate: the middle decile
        lo, hi = e.approxQuantile(col, [0.45, 0.55], 0.001)
        fz = L.file_prune_fraction(spark, zpath, col, lo, hi)
        fn = L.file_prune_fraction(spark, npath, col, lo, hi)
        assert fn > 0.9, (col, fn)  # naive layout can't skip
        assert fz < 0.7, (col, fz)  # z-order skips a majority-ish
        assert fz < fn


def test_quantile_bounds_beat_minmax_on_heavy_tail(spark, sf_dir, tmp_path):
    """Heavy-tailed column: min/max bounds collapse the dimension (all
    mass in a few grid cells); the default quantile bounds keep it
    prunable. This is the documented reason column_bounds defaults to
    the (1%, 99%) window."""
    e = load_table(spark, sf_dir, "events")
    qb = L.column_bounds(e, ["user_id", "value"])  # quantile default
    mm = L.column_bounds(e, ["user_id", "value"], quantiles=None)
    assert qb[1][1] < mm[1][1]  # 99th pct well under the max outlier

    qpath, mpath = str(tmp_path / "q"), str(tmp_path / "m")
    L.zorder_layout(e, qpath, ["user_id", "value"], bounds=qb, target_files=16)
    L.zorder_layout(e, mpath, ["user_id", "value"], bounds=mm, target_files=16)
    fq = L.file_prune_fraction(spark, qpath, "value", 40.0, 50.0)
    fm = L.file_prune_fraction(spark, mpath, "value", 40.0, 50.0)
    assert fq < fm


def test_zorder_key_rejects_bad_shapes(spark):
    with pytest.raises(ValueError):
        L.zorder_key_expr(["a"] * 5, [(0, 1)] * 5)


def test_zorder_key_bits_auto_reduce(spark):
    """n_cols*bits > 63 auto-reduces the per-column width instead of
    failing (4 columns at the default 16 bits was the documented-but-
    crashing shape); Spark and the SQL twin reduce identically."""
    cols = ["a", "b", "c", "d"]
    bounds = [(0.0, 100.0)] * 4
    df = spark.createDataFrame(
        [(1.0, 2.0, 3.0, 4.0), (99.0, 1.0, 50.0, 7.0)],
        "a double, b double, c double, d double",
    )
    with pytest.warns(UserWarning, match="reduced to 15"):
        key16 = L.zorder_key_expr(cols, bounds, bits=16)
    got = [r.z for r in df.select(key16.alias("z")).collect()]
    # the silent default reduces without warning (it's our number)
    import warnings as _w

    with _w.catch_warnings():
        _w.simplefilter("error")
        L.zorder_key_expr(cols, bounds)
    # 4 cols * 15 bits = 60 < 63: key fits a signed long, no error
    assert all(0 <= z < (1 << 60) for z in got)
    # the explicit 15-bit request produces the same keys
    same = [
        r.z
        for r in df.select(
            L.zorder_key_expr(cols, bounds, bits=15).alias("z")
        ).collect()
    ]
    assert got == same
    import duckdb

    with pytest.warns(UserWarning, match="reduced to 15"):
        sql = L.zorder_key_sql(cols, bounds, bits=16)
    oracle = [
        r[0]
        for r in duckdb.sql(
            f"SELECT {sql} FROM (VALUES (1.0, 2.0, 3.0, 4.0), "
            "(99.0, 1.0, 50.0, 7.0)) AS t(a, b, c, d)"
        ).fetchall()
    ]
    assert got == oracle


def test_compact_zorder_clusters_partitions(spark, sf_dir, tmp_path):
    """compact(zorder_cols=...) = OPTIMIZE ZORDER: after compacting a
    fragmented day-partitioned table, files inside a partition cover
    tight user_id ranges (prunable) and rows are byte-identical as a
    set."""
    from oracle_duckdb_sync_spark.sources import sinks

    e = load_table(spark, sf_dir, "events").withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    path = str(tmp_path / "tbl")
    # fragment: many small files per partition
    e.repartition(12).write.partitionBy("day").parquet(path)
    # materialize the pre-compaction rows: a lazily re-executed plan
    # would list the swapped-out files after compaction
    before_rows = sorted(
        (r.event_id, r.user_id, r.value)
        for r in spark.read.parquet(path).collect()
    )

    stats = sinks.compact(
        spark, path, ["day"],
        target_file_bytes=1 << 30, min_files=2,
        zorder_cols=["user_id", "value"],
    )
    assert stats["partitions_compacted"] > 0
    assert stats["files_after"] < stats["files_before"]
    after_rows = sorted(
        (r.event_id, r.user_id, r.value)
        for r in spark.read.parquet(path).collect()
    )
    assert after_rows == before_rows


def test_compact_zorder_converges_per_partition(spark, sf_dir, tmp_path):
    """Z-order compaction honors the per-partition file budget exactly
    (quantile chunks never straddle hive boundaries), so a second
    maintenance run finds nothing to do — scheduled compaction
    converges instead of rewriting the same partitions forever."""
    import glob
    import os

    from oracle_duckdb_sync_spark.sources import sinks

    e = load_table(spark, sf_dir, "events").withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    path = str(tmp_path / "conv")
    e.repartition(10).write.partitionBy("day").parquet(path)
    before_rows = spark.read.parquet(path).count()

    stats = sinks.compact(
        spark, path, ["day"],
        target_file_bytes=1 << 30, min_files=2,
        zorder_cols=["user_id", "value"],
    )
    assert stats["partitions_compacted"] > 0
    # budget was ceil(bytes / 1GiB) = 1 file per partition — honored
    for d in glob.glob(os.path.join(path, "day=*")):
        files = [f for f in os.listdir(d) if f.endswith(".parquet")]
        assert len(files) == 1, d
    assert spark.read.parquet(path).count() == before_rows
    again = sinks.compact(
        spark, path, ["day"],
        target_file_bytes=1 << 30, min_files=2,
        zorder_cols=["user_id", "value"],
    )
    assert again["partitions_compacted"] == 0


def test_stats_manifest_and_pruned_read(spark, sf_dir, tmp_path):
    """The manifest has one row per data file with row-group-aggregated
    stats, and a manifest-driven read returns exactly the rows the full
    scan's predicate returns while opening only intersecting files."""
    e = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "z")
    L.zorder_layout(e, path, ["user_id", "value"], target_files=12)

    m = L.stats_manifest(spark, path, ["user_id", "value"])
    rows = m.collect()
    import glob

    files = glob.glob(path + "/**/*.parquet", recursive=True)
    assert len(rows) == len(files)
    assert sum(r.n_rows for r in rows) == e.count()
    assert all(r.user_id_min is not None and r.user_id_max >= r.user_id_min for r in rows)

    lo, hi = e.approxQuantile("user_id", [0.45, 0.55], 0.001)
    pruned = L.read_pruned(spark, path, {"user_id": (lo, hi)}, manifest=m)
    # the pruned frame reads fewer files but must reproduce the filtered scan
    want = e.filter((F.col("user_id") >= lo) & (F.col("user_id") <= hi))
    got = pruned.filter((F.col("user_id") >= lo) & (F.col("user_id") <= hi))
    assert got.count() == want.count()
    kept = {r.file for r in m.collect() if r.user_id_max >= lo and r.user_id_min <= hi}
    assert 0 < len(kept) < len(files)

    # disjoint range -> empty frame with the table schema
    empty = L.read_pruned(spark, path, {"user_id": (1e12, 2e12)}, manifest=m)
    assert empty.count() == 0
    assert set(empty.columns) == set(e.columns)
