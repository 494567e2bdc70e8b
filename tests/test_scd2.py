"""SCD2 history maintenance + snapshot diff (`sync/scd2.py`): every
transition class (insert/update/delete/unchanged), idempotent re-apply,
partial-batch semantics, and point-in-time reads."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from oracle_duckdb_sync_spark.sync.scd2 import (
    OPEN_END_US,
    as_of,
    scd2_apply,
    scd2_init,
    snapshot_diff,
)

SCHEMA = "k long, v string, price double"


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


class TestSnapshotDiff:
    def test_all_four_classes(self, spark):
        old = _df(spark, [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)])
        new = _df(spark, [(2, "b", 2.0), (3, "CHANGED", 3.0), (4, "d", 4.0)])
        got = {
            r.k: r.change
            for r in snapshot_diff(old, new, ["k"], ["v", "price"]).collect()
        }
        assert got == {1: "deleted", 2: "unchanged", 3: "updated", 4: "inserted"}

    def test_null_vs_literal_not_confused(self, spark):
        old = _df(spark, [(1, None, 1.0)])
        new = _df(spark, [(1, "None", 1.0)])
        got = snapshot_diff(old, new, ["k"], ["v", "price"]).collect()[0]
        assert got.change == "updated"


class TestScd2:
    def _hist(self, df):
        return {
            (r.k, r.valid_from_us): (r.v, r.valid_to_us, r.is_current)
            for r in df.collect()
        }

    def test_full_lifecycle(self, spark):
        snap0 = _df(spark, [(1, "a", 1.0), (2, "b", 2.0)])
        h = scd2_init(snap0, ["k"], ["v", "price"], 100)
        # t=200: key 1 changes, key 2 vanishes, key 3 appears
        snap1 = _df(spark, [(1, "a2", 1.0), (3, "c", 3.0)])
        h1 = scd2_apply(h, snap1, ["k"], ["v", "price"], 200)
        got = self._hist(h1)
        assert got == {
            (1, 100): ("a", 200, False),
            (1, 200): ("a2", OPEN_END_US, True),
            (2, 100): ("b", 200, False),
            (3, 200): ("c", OPEN_END_US, True),
        }
        # point-in-time: at t=150 the original table; at t=250 the new one
        assert {(r.k, r.v) for r in as_of(h1, 150).collect()} == {(1, "a"), (2, "b")}
        assert {(r.k, r.v) for r in as_of(h1, 250).collect()} == {(1, "a2"), (3, "c")}

    def test_idempotent_reapply(self, spark):
        snap = _df(spark, [(1, "a", 1.0)])
        h = scd2_init(snap, ["k"], ["v", "price"], 100)
        h1 = scd2_apply(h, snap, ["k"], ["v", "price"], 200)
        assert self._hist(h1) == {(1, 100): ("a", OPEN_END_US, True)}

    def test_partial_batch_keeps_missing_keys_open(self, spark):
        h = scd2_init(_df(spark, [(1, "a", 1.0), (2, "b", 2.0)]), ["k"], ["v", "price"], 100)
        batch = _df(spark, [(1, "a2", 1.0)])  # no news about key 2
        h1 = scd2_apply(h, batch, ["k"], ["v", "price"], 200, batch_is_full_snapshot=False)
        got = self._hist(h1)
        assert got[(2, 100)] == ("b", OPEN_END_US, True)
        assert got[(1, 200)] == ("a2", OPEN_END_US, True)

    def test_chained_applies_preserve_closed_history(self, spark):
        h = scd2_init(_df(spark, [(1, "v1", 1.0)]), ["k"], ["v", "price"], 100)
        h = scd2_apply(h, _df(spark, [(1, "v2", 1.0)]), ["k"], ["v", "price"], 200)
        h = scd2_apply(h, _df(spark, [(1, "v3", 1.0)]), ["k"], ["v", "price"], 300)
        got = self._hist(h)
        assert got == {
            (1, 100): ("v1", 200, False),
            (1, 200): ("v2", 300, False),
            (1, 300): ("v3", OPEN_END_US, True),
        }
        # every instant resolves to exactly one version
        for t, v in ((150, "v1"), (250, "v2"), (350, "v3")):
            assert [r.v for r in as_of(h, t).collect()] == [v]
