"""Property-based pinning of the cross-engine decimal conventions.

Both scale-found value bugs lived here (the .5-boundary average at
sf0.1, the product-cast divergence at sf1 — SCALE.md "Determinism
across engines"), so the helpers are pinned three ways per random
input batch: Spark result == DuckDB result == an exact driver-side
reference computed with Python Fractions. Negative values are
included deliberately — the pmod floor-division mirror and the
half-up rounding at negative .5 boundaries are exactly where the
engines' built-ins disagree.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal
from fractions import Fraction

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import __spark_entry__ as entrymod

# 2-dp fixed-point values as integer hundredths (exact by construction);
# spans negatives and the .5-average boundary cases
cents_lists = st.lists(
    st.integers(min_value=-10_000_000, max_value=10_000_000), min_size=1, max_size=40
)

_PROP_SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _spark_and_duck(spark, rows, spark_agg, sql_agg):
    df = spark.createDataFrame(rows, "v double")
    got_spark = df.agg(spark_agg).collect()[0][0]
    con = duckdb.connect()
    con.execute("CREATE TABLE t (v DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", [(r[0],) for r in rows])
    got_duck = con.execute(f"SELECT {sql_agg} FROM t").fetchone()[0]
    con.close()
    return got_spark, got_duck


@given(cents=cents_lists)
@_PROP_SETTINGS
def test_dec_avg_exact_half_up(spark, cents):
    """_dec_avg == true mean quantized half-up to 6 dp, on both engines."""
    from pyspark.sql import functions as F

    rows = [(c / 100.0,) for c in cents]
    mean = Fraction(sum(cents), 100 * len(cents))
    want = float(
        (Decimal(mean.numerator) / Decimal(mean.denominator)).quantize(
            Decimal("0.000001"), rounding=ROUND_HALF_UP
        )
    )
    got_spark, got_duck = _spark_and_duck(
        spark,
        rows,
        entrymod._dec_avg(F.col("v"), "a"),
        entrymod._sql_dec_avg("v", "a"),
    )
    assert got_spark == pytest.approx(want, abs=0), (cents, got_spark, want)
    assert got_duck == pytest.approx(want, abs=0), (cents, got_duck, want)


@given(
    triples=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10_500_000),  # price cents
            st.integers(min_value=0, max_value=10),  # discount cents
            st.integers(min_value=0, max_value=8),  # tax cents
        ),
        min_size=1,
        max_size=30,
    )
)
@_PROP_SETTINGS
def test_dec_sum_cents_product_exact(spark, triples):
    """sum(price*(1-disc)*(1+tax)) via integer cents == exact Fraction
    reference on both engines (the sf1-found divergence class)."""
    from pyspark.sql import functions as F

    rows = [(p / 100.0, d / 100.0, t / 100.0) for p, d, t in triples]
    df = spark.createDataFrame(rows, "p double, d double, t double")
    prod = (
        entrymod._cents(F.col("p"))
        * (100 - entrymod._cents(F.col("d")))
        * (100 + entrymod._cents(F.col("t")))
    )
    got_spark = df.agg(entrymod._dec_sum_cents(prod, 10**6, "s")).collect()[0][0]

    con = duckdb.connect()
    con.execute("CREATE TABLE t3 (p DOUBLE, d DOUBLE, t DOUBLE)")
    con.executemany("INSERT INTO t3 VALUES (?, ?, ?)", rows)
    sql_prod = (
        f"{entrymod._sql_cents('p')} * (100 - {entrymod._sql_cents('d')})"
        f" * (100 + {entrymod._sql_cents('t')})"
    )
    got_duck = con.execute(
        f"SELECT {entrymod._sql_dec_sum_cents(sql_prod, 10**6, 's')} FROM t3"
    ).fetchone()[0]
    con.close()

    micro = sum(p * (100 - d) * (100 + t) for p, d, t in triples)
    want = float(Fraction(micro, 10**6))
    assert got_spark == want, (triples, got_spark, want)
    assert got_duck == want, (triples, got_duck, want)


@given(cents=cents_lists)
@_PROP_SETTINGS
def test_sql_floor_div_mirrors_pmod(spark, cents):
    """_sql_floor_div floors like Spark's pmod identity for negative
    sums too (DuckDB's bare // truncates toward zero)."""
    total = sum(cents)
    con = duckdb.connect()
    got = con.execute(
        f"SELECT {entrymod._sql_floor_div(str(total), '7')}"
    ).fetchone()[0]
    con.close()
    assert got == total // 7  # Python // floors, the reference semantics


micro_vecs = st.lists(
    st.lists(
        st.integers(min_value=-2_000_000, max_value=2_000_000),
        min_size=3,
        max_size=3,
    ),
    min_size=2,
    max_size=16,
)


@given(vecs=micro_vecs)
@_PROP_SETTINGS
def test_dim_stats_moments_exact(spark, vecs):
    """dim_stats mean == true per-dimension mean rounded at 6 dp with
    ties toward +inf (the floor((2s+n)/2n) convention), and
    Spark == DuckDB exactly on every column (mean, std, min, max) —
    negative components included (pmod floor-division mirror)."""
    from pyspark.sql import functions as F  # noqa: F401
    from oracle_duckdb_sync_spark.operators import similarity as SIM

    rows = [([m / 1e6 for m in v],) for v in vecs]
    df = spark.createDataFrame(rows, "embedding array<double>")
    got = {r["dim"]: r for r in SIM.dim_stats(df).collect()}

    con = duckdb.connect()
    con.execute("CREATE TABLE embeddings (embedding DOUBLE[])")
    con.executemany("INSERT INTO embeddings VALUES (?)", rows)
    duck = {
        r[0]: r
        for r in con.execute(SIM.dim_stats_sql("embeddings")).fetchall()
    }
    con.close()

    n = len(vecs)
    for d in (1, 2, 3):
        micros = [v[d - 1] for v in vecs]
        # the repo convention floor((2s+n)/(2n)) rounds ties toward +inf
        # (a -0.5-micro mean lands at 0, not -1); both engines share it
        want_mean = ((2 * sum(micros) + n) // (2 * n)) / 1e6
        g, k = got[d], duck[d]
        assert g["n"] == n and k[1] == n
        assert g["dim_mean"] == want_mean, (d, micros)
        # engine parity must be bit-exact on every output column
        assert (g["dim_mean"], g["dim_std"], g["dim_min"], g["dim_max"]) == (
            k[2],
            k[3],
            k[4],
            k[5],
        ), d
        # std against the exact integer-moment reference (same final
        # float ops as the engines, so equality is expected)
        s, ss = sum(micros), sum(m * m for m in micros)
        want_std = (float(n * ss - s * s) / (n * (n - 1))) ** 0.5 / 1e6
        assert abs(g["dim_std"] - want_std) <= 1e-15 + 1e-9 * abs(want_std)


@given(vecs_a=micro_vecs, vecs_b=micro_vecs)
@_PROP_SETTINGS
def test_dim_drift_fused_matches_duckdb(spark, vecs_a, vecs_b):
    """dim_drift (fused single-scan form) == the DuckDB twin's
    two-dim_stats-join formulation bit-exactly on every column — the
    plan rewrite must not move a single ulp. Also pins drift-vs-self
    = zero delta and the ragged-width inner-join drop (a dim present
    on one side only vanishes)."""
    from oracle_duckdb_sync_spark.operators import similarity as SIM

    rows_a = [([m / 1e6 for m in v],) for v in vecs_a]
    rows_b = [([m / 1e6 for m in v],) for v in vecs_b]
    a = spark.createDataFrame(rows_a, "embedding array<double>")
    b = spark.createDataFrame(rows_b, "embedding array<double>")
    got = [tuple(r) for r in SIM.dim_drift(a, b).collect()]

    con = duckdb.connect()
    for t, rows in (("ea", rows_a), ("eb", rows_b)):
        con.execute(f"CREATE TABLE {t} (embedding DOUBLE[])")
        con.executemany(f"INSERT INTO {t} VALUES (?)", rows)
    want = con.execute(SIM.dim_drift_sql("ea", "eb")).fetchall()
    con.close()
    assert got == [tuple(r) for r in want]

    self_drift = SIM.dim_drift(a, a).collect()
    assert all(r["delta_mean"] == 0.0 for r in self_drift)


def test_dim_drift_one_sided_dim_drops(spark):
    """A dimension present in only one snapshot (ragged widths) drops,
    matching the SQL twin's inner join on the dim ordinal."""
    from oracle_duckdb_sync_spark.operators import similarity as SIM

    a = spark.createDataFrame(
        [([1.0, 2.0, 3.0],), ([2.0, 3.0, 4.0],)], "embedding array<double>"
    )
    b = spark.createDataFrame(
        [([1.5, 2.5],), ([2.5, 3.5],)], "embedding array<double>"
    )
    got = SIM.dim_drift(a, b).collect()
    assert [r["dim"] for r in got] == [1, 2]  # dim 3 has no b side
