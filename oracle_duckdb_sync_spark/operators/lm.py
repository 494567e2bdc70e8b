"""N-gram language-model fluency scoring (training-data extension).

The CCNet / Gopher pipelines gate documents on an n-gram LM signal: a
document whose token transitions are improbable under a model trained
on a trusted (or simply large) corpus is boilerplate, lorem-ipsum,
menu spam, or another language. The reference has no LM operator
(SURVEY.md §2 — it is a sync/analytics engine); at corpus scale the
signal is valuable exactly because it is RELATIONAL: a bigram model is
a count table, and scoring is one join of exploded bigrams against it.

Scale shape (the 100 TB story):

- Training is one groupBy over the exploded corpus — the same
  inverted-index class as MinHash banding; ``min_count`` prunes the
  singleton tail, which carries most of the cardinality and no signal.
- Scoring explodes each document's bigrams once and LEFT-joins the
  count table on (w1, w2) — an equi-join on short strings, skew-bounded
  by the ``min_count`` pruning on the build side; unseen bigrams fall
  back to the smoothed floor via COALESCE, so scoring NEW documents
  against a persisted model needs no corpus rescan.
- Per-bigram log-probabilities are rounded to integer MICRONATS
  (·10⁶) before summation, so the per-document aggregate is exact
  BIGINT arithmetic — summation order cannot change the hash, the
  property every oracle-paired float in this repo relies on.

Add-one (Laplace) smoothing keeps every quantity an integer:
``P(w2|w1) = (c(w1,w2) + 1) / (c1(w1) + V)`` with ``c1`` the prefix
total and ``V`` the distinct-successor vocabulary size. The score is
the mean negative log-probability in nats (higher = less fluent), the
standard quality-filter orientation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens_expr, tokens_sql

NAT_SCALE = 1_000_000  # micronats: ln(p) rounded to 6 dp, stored BIGINT


def _bigram_stream(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, w1, w2) — one row per bigram OCCURRENCE (order preserved,
    repeats kept — an LM is trained on occurrences, unlike the
    shingle SETS the dedup family uses). One explode over the token
    index range; tokens[i] lookups stay in codegen."""
    return (
        df.select(
            F.col(id_col).alias("__id"), tokens_expr(F.col(text_col)).alias("__t")
        )
        .filter(F.size("__t") >= 2)
        .select(
            "__id",
            F.explode(F.expr("sequence(0, size(__t) - 2)")).alias("__i"),
            "__t",
        )
        .select(
            "__id",
            F.expr("__t[__i]").alias("w1"),
            F.expr("__t[__i + 1]").alias("w2"),
        )
    )


def _bigram_stream_sql(table: str, id_col: str, text_col: str) -> str:
    toks = tokens_sql(text_col)
    return f"""(
      SELECT {id_col} AS __id, t[i + 1] AS w1, t[i + 2] AS w2
      FROM (
        SELECT {id_col}, {toks} AS t,
               unnest(range(0, len({toks}) - 1)) AS i
        FROM {table} WHERE len({toks}) >= 2
      ) __bs0
    )"""


def train_bigram_lm(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 1,
) -> DataFrame:
    """Bigram count table ``(w1, w2, n)`` from a corpus — the model.

    ``min_count`` prunes rare transitions (the singleton tail is most
    of the table's cardinality; scoring treats a pruned bigram exactly
    like an unseen one, falling through to the smoothed floor).
    Persist the result with ``df.write.parquet`` to reuse across
    scoring runs — the model is just a table.
    """
    counts = (
        _bigram_stream(docs, id_col, text_col)
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    if min_count > 1:
        counts = counts.filter(F.col("n") >= min_count)
    return counts


def train_bigram_lm_sql(
    table: str, id_col: str = "doc_id", text_col: str = "text", min_count: int = 1
) -> str:
    """DuckDB twin of :func:`train_bigram_lm`."""
    having = f"HAVING COUNT(*) >= {min_count}" if min_count > 1 else ""
    return f"""(
      SELECT w1, w2, COUNT(*)::BIGINT AS n
      FROM {_bigram_stream_sql(table, id_col, text_col)} __bs
      GROUP BY w1, w2 {having}
    )"""


def lm_score(
    docs: DataFrame,
    model: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Mean negative log-probability per bigram, in nats — ``(id_col,
    n_bigrams, nll)``, higher nll = less fluent under ``model``.

    Every per-bigram ``-ln((n+1)/(c1+V))`` is rounded to integer
    micronats BEFORE the per-document sum, so the aggregate is exact
    BIGINT arithmetic (order-independent, hash-stable across engines);
    the final mean is one double division rounded to 6 dp. Documents
    with fewer than 2 tokens produce no bigrams and are absent from
    the result (they have no transitions to judge — gate them on the
    length metrics instead).

    Unseen/pruned bigrams: ``n`` falls back to 0 and ``c1`` to 0 via
    the left joins, giving the add-one floor ``-ln(1/(0+V))`` — new
    documents score against a persisted model without any corpus
    access.
    """
    c1 = model.groupBy("w1").agg(F.sum("n").alias("c1"))
    v = model.agg(F.countDistinct("w2").cast("long").alias("v"))
    lp6: Column = F.round(
        -F.log(
            (F.coalesce(F.col("n"), F.lit(0)) + F.lit(1)).cast("double")
            / (F.coalesce(F.col("c1"), F.lit(0)) + F.col("v")).cast("double")
        )
        * F.lit(NAT_SCALE)
    ).cast("long")
    return (
        _bigram_stream(docs, id_col, text_col)
        .join(model, ["w1", "w2"], "left")
        .join(c1, ["w1"], "left")
        .crossJoin(v)  # one-row aggregate side — broadcast, benign
        .select(F.col("__id").alias(id_col), lp6.alias("lp6"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("lp6").alias("__s"),
        )
        .select(
            id_col,
            "n_bigrams",
            F.round(
                F.col("__s").cast("double")
                / (F.col("n_bigrams") * F.lit(NAT_SCALE)).cast("double"),
                6,
            ).alias("nll"),
        )
    )


def lm_score_sql(
    table: str,
    model_sql: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin of :func:`lm_score` (identical micronat rounding;
    ROUND yields an integral double on both engines, so the BIGINT
    cast is exact despite the engines' different cast-rounding
    rules)."""
    return f"""
    WITH model AS (SELECT * FROM {model_sql} __m),
    c1 AS (SELECT w1, SUM(n)::BIGINT AS c1 FROM model GROUP BY w1),
    vv AS (SELECT COUNT(DISTINCT w2)::BIGINT AS v FROM model),
    bs AS (SELECT * FROM {_bigram_stream_sql(table, id_col, text_col)} __b),
    lp AS (
      SELECT bs.__id,
             CAST(ROUND(-ln((COALESCE(model.n, 0) + 1)::DOUBLE
                            / (COALESCE(c1.c1, 0) + vv.v)::DOUBLE)
                        * {NAT_SCALE}) AS BIGINT) AS lp6
      FROM bs
      LEFT JOIN model ON bs.w1 = model.w1 AND bs.w2 = model.w2
      LEFT JOIN c1 ON bs.w1 = c1.w1
      CROSS JOIN vv
    )
    SELECT __id AS {id_col},
           COUNT(*)::BIGINT AS n_bigrams,
           ROUND(SUM(lp6)::DOUBLE / (COUNT(*) * {NAT_SCALE})::DOUBLE, 6) AS nll
    FROM lp GROUP BY 1
    """
