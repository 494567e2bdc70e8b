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
