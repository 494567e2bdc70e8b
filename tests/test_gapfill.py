"""Semantics pins for the gap-fill / counter / state-agg suite and the
bucketed interval join — hand-built frames where every output value is
known, plus the boundary cases the sf-scale oracle rows can't isolate
(empty gaps, single-observation keys, reset-at-first-point, interval
edges, infeasible mixtures)."""

from __future__ import annotations

from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from oracle_duckdb_sync_spark.operators.gapfill import (
    counter_agg,
    state_agg,
    time_bucket_gapfill,
)
from oracle_duckdb_sync_spark.operators.sampling import (
    SAMPLE_BUCKETS,
    mixture_sample,
    sample_bucket_expr,
)
from oracle_duckdb_sync_spark.operators.timeseries import interval_join


def _ts(s: int):
    return datetime.fromtimestamp(s, tz=timezone.utc)


def _series(spark, rows):
    return spark.createDataFrame(
        [(k, _ts(t), float(v), i) for i, (k, t, v) in enumerate(rows)],
        "k string, ts timestamp, value double, id long",
    )


class TestGapfill:
    def test_locf_fills_holes_with_previous_bucket_mean(self, spark):
        # buckets (60s): 0 → mean(10,20)=15, 180 → 40; holes at 60,120
        df = _series(spark, [("a", 5, 10.0), ("a", 50, 20.0), ("a", 185, 40.0)])
        out = time_bucket_gapfill(df, "k", "ts", "value", 60, "locf").collect()
        got = [(r.bucket_s, r.value_micro, r.gap) for r in out]
        assert got == [
            (0, 15_000_000, 0),
            (60, 15_000_000, 1),
            (120, 15_000_000, 1),
            (180, 40_000_000, 0),
        ]

    def test_linear_interpolates_exactly(self, spark):
        # endpoints 10.0 @ bucket 0 and 40.0 @ bucket 180 → +10 per step
        df = _series(spark, [("a", 5, 10.0), ("a", 185, 40.0)])
        out = time_bucket_gapfill(df, "k", "ts", "value", 60, "linear").collect()
        assert [(r.bucket_s, r.value_micro) for r in out] == [
            (0, 10_000_000),
            (60, 20_000_000),
            (120, 30_000_000),
            (180, 40_000_000),
        ]

    def test_linear_negative_slope_floor_division(self, spark):
        # 40 → 10 over 3 steps: exact floor of -10/step increments
        df = _series(spark, [("a", 5, 40.0), ("a", 185, 10.0)])
        out = time_bucket_gapfill(df, "k", "ts", "value", 60, "linear").collect()
        assert [r.value_micro for r in out] == [
            40_000_000,
            30_000_000,
            20_000_000,
            10_000_000,
        ]

    def test_null_fill_and_adjacent_buckets_emit_no_gap(self, spark):
        df = _series(spark, [("a", 5, 1.0), ("a", 65, 2.0), ("a", 245, 3.0)])
        out = time_bucket_gapfill(df, "k", "ts", "value", 60, "null").collect()
        got = [(r.bucket_s, r.value_micro, r.gap) for r in out]
        assert got == [
            (0, 1_000_000, 0),
            (60, 2_000_000, 0),
            (120, None, 1),
            (180, None, 1),
            (240, 3_000_000, 0),
        ]

    def test_single_observation_key_no_extrapolation(self, spark):
        df = _series(spark, [("a", 5, 1.0), ("b", 500, 2.0)])
        out = time_bucket_gapfill(df, "k", "ts", "value", 60, "locf").collect()
        assert [(r.k, r.bucket_s, r.gap) for r in out] == [
            ("a", 0, 0),
            ("b", 480, 0),
        ]

    def test_half_up_bucket_mean(self, spark):
        # mean(0.01, 0.02) = 0.015 → half-up 15000 micro
        df = _series(spark, [("a", 1, 0.01), ("a", 2, 0.02)])
        out = time_bucket_gapfill(df, "k", "ts", "value", 60, "locf").collect()
        assert out[0].value_micro == 15_000

    def test_bad_fill_rejected(self, spark):
        df = _series(spark, [("a", 1, 1.0)])
        with pytest.raises(ValueError):
            time_bucket_gapfill(df, "k", "ts", "value", 60, "bogus")


class TestCounterAgg:
    def test_resets_counted_and_increase_restarts_from_value(self, spark):
        # 10 → 25 (+15) → 5 (reset: +5) → 8 (+3); total 23, 1 reset
        df = _series(spark, [("c", 1, 10.0), ("c", 2, 25.0), ("c", 3, 5.0), ("c", 4, 8.0)])
        row = counter_agg(df, "k", "ts", "value", "id").collect()[0]
        assert (row.increase_q, row.n_resets, row.n_points) == (2300, 1, 4)

    def test_first_point_contributes_nothing(self, spark):
        df = _series(spark, [("c", 1, 99.0)])
        row = counter_agg(df, "k", "ts", "value", "id").collect()[0]
        assert (row.increase_q, row.n_resets, row.n_points) == (0, 0, 1)

    def test_equal_timestamps_ordered_by_tiebreaker(self, spark):
        # same ts: id order 10 → 30 (+20), no spurious reset
        df = _series(spark, [("c", 1, 10.0), ("c", 1, 30.0)])
        row = counter_agg(df, "k", "ts", "value", "id").collect()[0]
        assert (row.increase_q, row.n_resets) == (2000, 0)


class TestStateAgg:
    def test_durations_left_closed(self, spark):
        # up[0..10) down[10..25) up[25..30), last point carries nothing
        rows = [("d", 0, "up"), ("d", 10, "down"), ("d", 25, "up"), ("d", 30, "down")]
        df = spark.createDataFrame(
            [(k, _ts(t), s, i) for i, (k, t, s) in enumerate(rows)],
            "k string, ts timestamp, state string, id long",
        )
        out = state_agg(df, "k", "state", "ts", "id").collect()
        got = {(r.k, r.state): (r.duration_us, r.n_intervals) for r in out}
        assert got == {
            ("d", "up"): (15_000_000, 2),
            ("d", "down"): (15_000_000, 1),
        }


class TestIntervalJoin:
    def _frames(self, spark, bucket_seconds, iv):
        left = spark.createDataFrame(
            [(1, _ts(t), f"e{t}") for t in (99, 100, 150, 199, 200, 300)],
            "uid long, ts timestamp, eid string",
        )
        ivs = spark.createDataFrame(
            [(1, _ts(s), _ts(e), n) for s, e, n in iv],
            "uid long, start_ts timestamp, end_ts timestamp, iname string",
        )
        return left, ivs

    def test_containment_start_inclusive_end_exclusive(self, spark):
        left, ivs = self._frames(spark, 60, [(100, 200, "w1")])
        out = interval_join(left, ivs, ["uid"], "ts", "start_ts", "end_ts", 60)
        assert sorted(r.eid for r in out.collect()) == ["e100", "e150", "e199"]

    def test_interval_spanning_many_buckets(self, spark):
        # tiny bucket (10s) → the interval explodes into 10 buckets but
        # each event still pairs exactly once
        left, ivs = self._frames(spark, 10, [(100, 200, "w1")])
        out = interval_join(left, ivs, ["uid"], "ts", "start_ts", "end_ts", 10)
        rows = out.collect()
        assert sorted(r.eid for r in rows) == ["e100", "e150", "e199"]

    def test_overlapping_intervals_multi_match(self, spark):
        left, ivs = self._frames(spark, 60, [(100, 200, "w1"), (140, 160, "w2")])
        out = interval_join(left, ivs, ["uid"], "ts", "start_ts", "end_ts", 60)
        got = sorted((r.eid, r.iname) for r in out.collect())
        assert got == [
            ("e100", "w1"),
            ("e150", "w1"),
            ("e150", "w2"),
            ("e199", "w1"),
        ]

    def test_empty_and_key_mismatch_excluded(self, spark):
        left, _ = self._frames(spark, 60, [])
        ivs = spark.createDataFrame(
            [(2, _ts(100), _ts(200), "other-user"), (1, _ts(100), _ts(100), "empty")],
            "uid long, start_ts timestamp, end_ts timestamp, iname string",
        )
        out = interval_join(left, ivs, ["uid"], "ts", "start_ts", "end_ts", 60)
        assert out.count() == 0


class TestMixtureSample:
    def _docs(self, spark, counts):
        rows = []
        i = 0
        for lang, n in counts.items():
            for _ in range(n):
                rows.append((i, lang))
                i += 1
        return spark.createDataFrame(rows, "doc_id long, lang string")

    def test_mixture_proportions_within_hash_tolerance(self, spark):
        df = self._docs(spark, {"en": 4000, "zh": 1000, "de": 600})
        out = mixture_sample(df, "doc_id", "lang", {"en": 2, "zh": 1, "de": 1})
        got = {r.lang: r.cnt for r in out.groupBy("lang").agg(F.count(F.lit(1)).alias("cnt")).collect()}
        # scarcest stratum: de → T = 600*4/1 = 2400; expected en 1200, zh 600, de 600
        assert got["de"] == 600  # rate 1.0 stratum keeps everything
        assert abs(got["en"] - 1200) / 1200 < 0.15
        assert abs(got["zh"] - 600) / 600 < 0.15

    def test_deterministic_and_append_stable(self, spark):
        df = self._docs(spark, {"en": 2000, "zh": 1000})
        kept1 = {r.doc_id for r in mixture_sample(df, "doc_id", "lang", {"en": 1, "zh": 1}).collect()}
        kept2 = {r.doc_id for r in mixture_sample(df, "doc_id", "lang", {"en": 1, "zh": 1}).collect()}
        assert kept1 == kept2
        # appending zh docs only raises zh's rate and T; en decisions
        # with the same (count, T) inputs stay a pure bucket threshold —
        # re-running on the grown frame keeps determinism
        grown = df.union(
            spark.createDataFrame([(9000 + i, "zh") for i in range(500)], "doc_id long, lang string")
        )
        kept3 = {r.doc_id for r in mixture_sample(grown, "doc_id", "lang", {"en": 1, "zh": 1}).collect()}
        assert kept3 == {r.doc_id for r in mixture_sample(grown, "doc_id", "lang", {"en": 1, "zh": 1}).collect()}

    def test_untargeted_stratum_dropped_and_empty_stratum_infeasible(self, spark):
        df = self._docs(spark, {"en": 100, "zh": 100})
        out = mixture_sample(df, "doc_id", "lang", {"en": 1})
        assert {r.lang for r in out.collect()} == {"en"}
        infeasible = mixture_sample(df, "doc_id", "lang", {"en": 1, "fr": 1})
        assert infeasible.count() == 0

    def test_bad_targets_rejected(self, spark):
        df = self._docs(spark, {"en": 10})
        with pytest.raises(ValueError):
            mixture_sample(df, "doc_id", "lang", {})
        with pytest.raises(ValueError):
            mixture_sample(df, "doc_id", "lang", {"en": 0})


class TestTrailingAggChunked:
    def _plain(self, spark, df, w_us):
        from pyspark.sql import Window

        us = F.unix_micros(F.col("ts"))
        q = F.round(F.col("value") * 100, 0).cast("long")
        base = df.select(F.col("k"), us.alias("us"), q.alias("q"))
        w = Window.partitionBy("k").orderBy("us").rangeBetween(-w_us, 0)
        return {
            (r.k, r.us): (r.s, r.n)
            for r in base.select(
                "k", "us",
                F.sum("q").over(w).cast("long").alias("s"),
                F.count("q").over(w).alias("n"),
            ).collect()
        }

    def test_parity_with_declarative_window(self, spark):
        from oracle_duckdb_sync_spark.operators.timeseries import trailing_agg_chunked

        import random

        rnd = random.Random(7)
        rows = [
            ("a" if i % 3 else "b", rnd.randrange(0, 5000), rnd.randrange(100) / 4.0)
            for i in range(400)
        ]
        df = _series(spark, rows)
        expected = self._plain(spark, df, 600 * 1_000_000)
        for chunk in (600, 900, 2400):  # window 600s under several chunkings
            got = {
                (r.k, r.us): (r.trail_sum_q, r.trail_n)
                for r in trailing_agg_chunked(df, "k", "ts", "value", 600, chunk).collect()
            }
            assert got == expected, f"chunk={chunk}"

    def test_carry_crosses_exactly_one_boundary(self, spark):
        from oracle_duckdb_sync_spark.operators.timeseries import trailing_agg_chunked

        # two rows 30s apart straddling a chunk edge at t=600
        df = _series(spark, [("a", 590, 1.0), ("a", 620, 2.0)])
        got = {
            r.us: (r.trail_sum_q, r.trail_n)
            for r in trailing_agg_chunked(df, "k", "ts", "value", 60, 600).collect()
        }
        assert got[590_000_000] == (100, 1)
        assert got[620_000_000] == (300, 2)  # sees the carried 590s row
        assert len(got) == 2  # the carried copy itself is not emitted

    def test_chunk_smaller_than_window_rejected(self, spark):
        from oracle_duckdb_sync_spark.operators.timeseries import trailing_agg_chunked

        df = _series(spark, [("a", 1, 1.0)])
        with pytest.raises(ValueError):
            trailing_agg_chunked(df, "k", "ts", "value", 600, 300)


class TestCounterAggChunked:
    def test_parity_including_sparse_empty_chunks(self, spark):
        from oracle_duckdb_sync_spark.operators.gapfill import (
            counter_agg,
            counter_agg_chunked,
        )
        import random

        rnd = random.Random(11)
        rows = [
            ("a" if i % 4 else "b", rnd.randrange(0, 20000), rnd.randrange(200) / 4.0)
            for i in range(300)
        ]
        # force a key with multi-chunk silences: observations only in
        # chunk 0 and chunk 7 of a 600s chunking
        rows += [("sparse", 10, 50.0), ("sparse", 4500, 10.0), ("sparse", 4600, 60.0)]
        df = _series(spark, rows)
        expected = {
            r.k: (r.increase_q, r.n_resets, r.n_points)
            for r in counter_agg(df, "k", "ts", "value", "id").collect()
        }
        for chunk in (600, 1800):
            got = {
                r.k: (r.increase_q, r.n_resets, r.n_points)
                for r in counter_agg_chunked(df, "k", "ts", "value", "id", chunk).collect()
            }
            assert got == expected, f"chunk={chunk}"
        # the sparse key's cross-silence adjacency is real: 50 → 10 is a
        # reset (+10), 10 → 60 is +50 → increase 60.0 == 6000 cents
        assert expected["sparse"] == (6000, 1, 3)


class TestStateAggChunked:
    def test_parity_including_sparse_empty_chunks(self, spark):
        from oracle_duckdb_sync_spark.operators.gapfill import (
            state_agg,
            state_agg_chunked,
        )
        import random

        rnd = random.Random(13)
        rows = [
            ("a" if i % 3 else "b", rnd.randrange(0, 20000), rnd.choice("xyz"))
            for i in range(300)
        ] + [("sparse", 10, "x"), ("sparse", 4500, "y"), ("sparse", 9900, "x")]
        df = spark.createDataFrame(
            [(k, _ts(t), s, i) for i, (k, t, s) in enumerate(rows)],
            "k string, ts timestamp, state string, id long",
        )
        expected = {
            (r.k, r.state): (r.duration_us, r.n_intervals)
            for r in state_agg(df, "k", "state", "ts", "id").collect()
        }
        for chunk in (600, 1800):
            got = {
                (r.k, r.state): (r.duration_us, r.n_intervals)
                for r in state_agg_chunked(df, "k", "state", "ts", "id", chunk).collect()
            }
            assert got == expected, f"chunk={chunk}"
        # sparse key's durations span the empty chunks exactly
        assert expected[("sparse", "x")] == ((4500 - 10) * 1_000_000, 1)
        assert expected[("sparse", "y")] == ((9900 - 4500) * 1_000_000, 1)
