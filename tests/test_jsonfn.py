"""get_json_long: regex fast path must agree with get_json_object on
every payload class it claims, and fall back to Jackson where the
regex can't prove an integer."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from oracle_duckdb_sync_spark.functions.jsonfn import get_json_long


def _extract(spark, payloads, key="k"):
    df = spark.createDataFrame(
        [Row(i=i, props=p) for i, p in enumerate(payloads)]
    )
    rows = (
        df.select(
            "i",
            get_json_long(F.col("props"), key).alias("fast"),
            F.get_json_object(F.col("props"), f"$.{key}")
            .try_cast("long")
            .alias("slow"),
        )
        .orderBy("i")
        .collect()
    )
    return [(r.fast, r.slow) for r in rows]


def test_get_json_long_matches_jackson_on_flat_payloads(spark):
    payloads = [
        '{"k": 46}',
        '{"k":0}',
        '{"k": -17}',
        '{"k"  :   999999}',
        '{"a": 1, "k": 7, "b": 2}',
        '{"k": 4.5}',          # float -> both NULL (cast long of "4.5")
        '{"k": "42"}',         # quoted -> fallback decides
        '{"k": true}',         # bool -> both NULL
        '{"k": null}',         # JSON null -> both NULL
        '{"x": 1}',            # key absent -> both NULL
        '{"kk": 5}',           # prefix key must not match
        '{"k": 1e3}',          # exponent -> fast path rejected
        '{"k": 12345678901234567890123}',  # > long -> both NULL
        "not json at all",
        None,
    ]
    for i, (fast, slow) in enumerate(_extract(spark, payloads)):
        assert fast == slow, (i, payloads[i], fast, slow)


def test_get_json_long_documented_nested_divergence(spark):
    # the documented caveat: a nested key fast-paths where $.k is NULL
    [(fast, slow)] = _extract(spark, ['{"a": {"k": 5}}'])
    assert slow is None and fast == 5


def test_props_corpus_stays_flat_for_fast_path(spark, sf_dir):
    """ADVICE r12 enforcement hook: the two oracle-checked queries
    (json_props_stats, corr_value_props_by_type) rest on events.props
    staying flat and machine-written. Assert regex/Jackson agreement
    over the ACTUAL generated corpus so a testdata-recipe drift that
    violates the flatness precondition fails loudly here instead of
    silently skewing oracle-checked results."""
    from oracle_duckdb_sync_spark.functions.jsonfn import (
        count_json_long_divergence,
    )

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    assert count_json_long_divergence(events, "props", "k") == 0


def test_count_json_long_divergence_detects_drift(spark):
    """The enforcement hook itself must actually catch each documented
    divergence class (nested key, key inside a string value, malformed
    payload with a '"k": <int>' substring) — and report 0 on the flat
    classes, including fallback-served rows where fast is NULL."""
    from pyspark.sql import Row

    from oracle_duckdb_sync_spark.functions.jsonfn import (
        count_json_long_divergence,
    )

    flat = [
        '{"k": 4}',
        '{"k": 4.5}',
        '{"k": "42"}',
        '{"x": 1}',
        None,
        # a quote inside a VALID JSON string value is always escaped
        # (\"), and the backslash breaks the regex's `"k":` match —
        # so an embedded '"k": 7' in a well-formed string value is NOT
        # a divergence class; pin that here
        '{"s": "text \\"k\\": 7 here"}',
    ]
    df = spark.createDataFrame([Row(props=p) for p in flat])
    assert count_json_long_divergence(df, "props", "k") == 0

    bad = [
        '{"a": {"k": 5}}',       # nested key
        '{"k": 9',               # malformed/truncated write
        'log line noise "k": 3 not json',  # malformed with a bare match
    ]
    df2 = spark.createDataFrame([Row(props=p) for p in flat + bad])
    assert count_json_long_divergence(df2, "props", "k") == len(bad)


def test_json_flat_rule_gates_pipeline_loudly(spark):
    """VERDICT r13 #6: the flatness precondition is a first-class DQ
    rule — a deliberately-nested payload must trip check_expectations
    (violation counted) and make enforce_expectations raise, so a
    drifted corpus fails the PIPELINE, not just the nightly test."""
    import pytest
    from pyspark.sql import Row

    from oracle_duckdb_sync_spark.functions.jsonfn import json_long_flat_rule
    from oracle_duckdb_sync_spark.operators import quality as DQ

    rows = [Row(props='{"k": 4}'), Row(props='{"a": {"k": 5}}')]
    df = spark.createDataFrame(rows)
    rules = {"props_k_flat": json_long_flat_rule("props", "k")}
    report = {r.rule: r for r in DQ.check_expectations(df, rules).collect()}
    assert report["props_k_flat"].n_violations == 1
    with pytest.raises(ValueError, match="props_k_flat"):
        DQ.enforce_expectations(df, rules)
    # a flat corpus passes the gate untouched
    flat = spark.createDataFrame([Row(props='{"k": 4}'), Row(props=None)])
    assert DQ.enforce_expectations(flat, rules) is flat


def test_json_flat_rule_sql_twin_agrees(spark):
    """The DuckDB form of the rule (RE2 consuming-tail probe, no
    lookahead) must classify every documented divergence class exactly
    like the Spark Column form."""
    import duckdb
    from pyspark.sql import Row

    from oracle_duckdb_sync_spark.functions.jsonfn import (
        json_long_flat_rule,
        json_long_flat_rule_sql,
    )

    payloads = [
        '{"k": 4}', '{"k": 4.5}', '{"k": "42"}', '{"x": 1}', None,
        '{"k": -17}', '{"k": 1e3}', '{"kk": 5}',
        '{"a": {"k": 5}}', '{"k": 9', 'noise "k": 3 not json',
    ]
    df = spark.createDataFrame([Row(props=p) for p in payloads])
    got_spark = [
        r.ok
        for r in df.select(
            json_long_flat_rule("props", "k").alias("ok")
        ).collect()
    ]
    con = duckdb.connect()
    sql = json_long_flat_rule_sql("props", "k")
    got_duck = [
        con.execute(f"SELECT {sql} FROM (SELECT ? AS props)", [p]).fetchone()[0]
        for p in payloads
    ]
    assert got_spark == got_duck, list(zip(payloads, got_spark, got_duck))
