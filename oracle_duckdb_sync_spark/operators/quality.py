"""Data-quality expectations: declarative rule checks in ONE scan.

The sync engine's ingestion edge needs the same gate every warehouse
does (Delta constraints / Great Expectations shape): assert that a
batch satisfies a set of row-level predicates and report violations
per rule — without one job per rule. Here every rule compiles to a
``SUM(CASE WHEN violated THEN 1 END)`` branch of a single aggregate,
so a 50-rule suite over 100 TB costs exactly one partial+final
aggregation pass and the scan reads only the columns the rules touch
(column pruning applies to the union of rule inputs).

Rules are plain boolean Columns/SQL expressing the EXPECTATION (true =
row passes); the report counts failures. ``check_expectations`` keeps
engine parity — the DuckDB twin runs the same predicates — so the gate
itself is differentially testable like every other operator here.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .aggregate import limb_sum


def check_expectations(
    df: DataFrame, rules: Mapping[str, Column | str]
) -> DataFrame:
    """One row per rule: (rule, n_rows, n_violations, pass_rate_ppm).

    ``rules`` maps rule name → boolean expectation (Column or SQL
    string); a NULL evaluation counts as a violation (unknown is not
    acceptable — the SQL three-valued-logic trap where ``value > 0``
    silently passes NULLs). ``pass_rate_ppm`` is exact integer
    parts-per-million (half-up), engine-stable.
    """
    if not rules:
        raise ValueError("no rules given")
    # the partial aggregate evaluates every rule expression per row; a
    # single-file table scans as one partition and would serialize that
    # on one core — spread first (no-op on production multi-split scans)
    from .dedup import _parallel

    df = _parallel(df)
    aggs = [F.count(F.lit(1)).alias("__n")]
    names = list(rules)
    for i, name in enumerate(names):
        r = rules[name]
        cond = F.expr(r) if isinstance(r, str) else r
        ok = F.coalesce(cond.cast("boolean"), F.lit(False))
        aggs.append(F.sum((~ok).cast("long")).alias(f"__v{i}"))
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{name}', `__v{i}`" for i, name in enumerate(names)
    )
    out = one.select(
        F.expr(f"stack({len(names)}, {stack_args}) AS (rule, n_violations)"),
        F.col("__n").alias("n_rows"),
    )
    # exact ppm: (passed * 2e6 + n) floor-div (2n) — half-up integer.
    # The numerator and pmod run in DECIMAL end-to-end: in LONG,
    # passed * 2e6 wraps silently past ~4.6e12 rows (non-ANSI Spark)
    dec = "decimal(38,0)"
    passed = (F.col("n_rows") - F.col("n_violations")).cast(dec)
    x = passed * F.lit(2_000_000).cast(dec) + F.col("n_rows").cast(dec)
    y = F.col("n_rows").cast(dec) * F.lit(2).cast(dec)
    q = (x - F.pmod(x, y)) / y
    ppm = F.when(F.col("n_rows") > 0, q.cast("long"))
    return out.select(
        "rule", "n_rows", "n_violations", ppm.alias("pass_rate_ppm")
    )


def check_expectations_sql(table: str, rules: Mapping[str, str]) -> str:
    """DuckDB twin of :func:`check_expectations` (same one-aggregate +
    unpivot shape, same NULL-is-violation semantics, same exact ppm)."""
    if not rules:
        raise ValueError("no rules given")
    branches = []
    for name, cond in rules.items():
        v = f"SUM(CASE WHEN COALESCE(({cond}), FALSE) THEN 0 ELSE 1 END)::BIGINT"
        branches.append(
            f"SELECT '{name}' AS rule, COUNT(*)::BIGINT AS n_rows, "
            f"{v} AS n_violations FROM {table}"
        )
    union = " UNION ALL ".join(branches)
    return f"""
    SELECT rule, n_rows, n_violations,
           CASE WHEN n_rows > 0 THEN
             ((((n_rows - n_violations)::HUGEINT * 2000000 + n_rows)
              - ((n_rows - n_violations)::HUGEINT * 2000000 + n_rows)
                % (n_rows::HUGEINT * 2))
             // (n_rows::HUGEINT * 2))::BIGINT
           END AS pass_rate_ppm
    FROM ({union})
    """


def enforce_expectations(
    df: DataFrame, rules: Mapping[str, Column | str], max_violations: int = 0
) -> DataFrame:
    """Gate form: raise ``ValueError`` listing the failing rules when
    any rule's violation count exceeds ``max_violations``; otherwise
    return ``df`` unchanged for the next pipeline stage. One extra
    aggregation job, same single-scan shape."""
    report = check_expectations(df, rules).collect()
    bad = [
        f"{r.rule}: {r.n_violations}/{r.n_rows}"
        for r in report
        if r.n_violations > max_violations
    ]
    if bad:
        raise ValueError("expectations failed — " + "; ".join(bad))
    return df


def source_quality_filter(
    docs: DataFrame,
    min_source_quality: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    micro: int = 6,
) -> DataFrame:
    """Domain/source-level quality gate (the FineWeb/RefinedWeb move):
    score every document with the heuristic quality metrics, average
    per SOURCE, and keep only documents from sources whose mean clears
    the bar — a GROUP-level filter that removes whole low-quality
    domains (spam farms, boilerplate mills) even when individual pages
    scrape past a per-document gate.

    Scale shape: one codegen scoring pass with the aggregate partial
    map-side (shuffle keyed on the source id — cardinality = number of
    sources, not documents), then one equi-join of the corpus against
    the surviving-source table (unhinted: AQE broadcasts it whenever
    the source list is small, which it always is relative to the
    corpus). No Python anywhere.

    Engine-proof numerics: scores quantize half-up to ``10^micro``
    integer units, sum in DECIMAL(38,0), and the per-source mean is
    one half-up integer division (the repo convention), compared to
    the threshold in integer micro-units — so the kept set is
    identical on any engine and partitioning. Returns the surviving
    documents' ``(id, source, source_quality)`` with ``source_quality``
    the exact micro-rounded source mean.
    """
    from ..functions.text import quality_metrics_exprs

    s = 10**micro
    thr6 = int(round(float(min_source_quality) * s))
    q = quality_metrics_exprs(F.col(text_col))["quality_score"]
    scored = docs.select(
        F.col(id_col),
        F.col(source_col),
        F.round(q * s, 0).cast("long").alias("__q6"),
    )
    g = scored.groupBy(source_col).agg(
        F.count(F.lit(1)).alias("__n"),
        # limb-split exact sum (aggregate.limb_sum): primitive-long
        # partials instead of a per-row decimal cast, same exact total
        limb_sum(F.col("__q6")).alias("__s"),
    )
    nn = F.col("__n").cast("decimal(38,0)")
    x = F.col("__s") * 2 + nn  # half-up division: floor((2s + n) / 2n)
    y = nn * 2
    mean6 = ((x - F.pmod(x, y)) / y).cast("decimal(38,0)").cast("long")
    keep = g.select(source_col, mean6.alias("__m6")).filter(
        F.col("__m6") >= F.lit(thr6)
    )
    return scored.join(keep, source_col).select(
        id_col,
        source_col,
        (F.col("__m6").cast("double") / F.lit(float(s))).alias(
            "source_quality"
        ),
    )


def source_quality_filter_sql(
    table: str,
    min_source_quality: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    micro: int = 6,
) -> str:
    """DuckDB twin of :func:`source_quality_filter` — identical
    quantization, DECIMAL(38,0) sums, half-up mean, and integer
    threshold compare."""
    from ..functions.text import quality_metrics_sql

    s = 10**micro
    thr6 = int(round(float(min_source_quality) * s))
    qsql = quality_metrics_sql(text_col)["quality_score"]
    fdiv = (
        "((x - (((x) % (y) + (y)) % (y))) // (y))"
        .replace("x", "(2 * __s + __n)")
        .replace("y", "(2 * __n)")
    )
    return f"""
    WITH __sc AS (
      SELECT {id_col}, {source_col},
             CAST(ROUND(({qsql}) * {s}) AS BIGINT) AS __q6
      FROM {table}
    ), __g AS (
      SELECT {source_col}, COUNT(*)::BIGINT AS __n,
             SUM(__q6)::DECIMAL(38,0) AS __s
      FROM __sc GROUP BY 1
    ), __keep AS (
      SELECT {source_col}, CAST({fdiv} AS BIGINT) AS __m6
      FROM __g
      WHERE CAST({fdiv} AS BIGINT) >= {thr6}
    )
    SELECT s.{id_col}, s.{source_col},
           k.__m6::DOUBLE / {float(s)} AS source_quality
    FROM __sc s JOIN __keep k USING ({source_col})
    """
