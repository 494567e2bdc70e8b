"""Lexical retrieval over a document corpus: TF-IDF and BM25 top-k in
EXACT integer arithmetic.

The training-data-pipeline use cases are benchmark-query
decontamination sweeps, targeted data selection ("find the documents
most relevant to this task description"), and retrieval-augmented
curation — all of which run a small query-term set against a corpus
that can be 100 TB.

Scale shape (both scorers):

- the corpus scan EXPLODES tokens and immediately filters to the query
  term set (a literal ``isin`` over a handful of strings), so only
  matching postings ever enter a shuffle — the full token stream is
  never materialized off the scan stage;
- term frequencies aggregate partial+final on (doc, token); document
  frequencies on (token) over the already-filtered postings;
- corpus-level scalars (document count, total token count) are one-row
  aggregates cross-joined back in (the same bounded-broadcast pattern
  as tpch_q11/q15/q22 — a BroadcastNestedLoopJoin of exactly one row);
- the final top-k is ``TakeOrderedAndProject`` under the unique
  (score DESC, doc id) order — per-partition top-k, no global sort.

Determinism: classic IDF/BM25 use ``log`` and floats, whose last-ulp
behaviour differs between engines. Both scorers here instead use a
LINEAR scaled idf — ``idf_e6 = (n_docs · 10⁶) div df`` — and (for
BM25) a scaled integer Okapi saturation factor, so every intermediate
is a truncating integer division of positive BIGINT/DECIMAL values and
the scores are bit-identical in Spark and DuckDB. The ranking keeps
BM25's qualitative behaviour (rare terms weigh more, repeated terms
saturate, long documents are discounted); the absolute scores are NOT
comparable to a log-idf implementation, which is fine for the ranking
/ thresholding uses above.

Reference parity note: the reference system has no retrieval surface;
this module is part of the beyond-reference training-pipeline family
(SURVEY.md "LLM-data-pipeline operators").
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Column
from pyspark.sql import functions as F

from ..functions.text import tokens_expr, tokens_sql

IDF_SCALE = 1_000_000
SAT_SCALE = 1_000_000


def _norm_terms(query_terms: Sequence[str]) -> list[str]:
    """Lower-cased, deduplicated, order-stable query terms."""
    seen: dict[str, None] = {}
    for t in query_terms:
        seen.setdefault(t.lower(), None)
    terms = list(seen)
    if not terms:
        raise ValueError("query_terms must be non-empty")
    return terms


def _postings(
    df: DataFrame, terms: list[str], text_col: str, id_col: str
) -> DataFrame:
    """(doc, token) postings restricted to the query terms — the filter
    sits in the SAME stage as the explode, so non-query tokens never
    leave the scan."""
    toks = tokens_expr(F.col(text_col))
    return df.select(F.col(id_col), F.explode(toks).alias("token")).filter(
        F.col("token").isin(*terms)
    )


def _idf_e6(postings: DataFrame, n_docs: DataFrame, id_col: str) -> DataFrame:
    """Per-term linear scaled idf: ``(n_docs · 10⁶) div df``.

    ``df`` counts distinct documents containing the term, over the
    already-filtered postings (a |terms|-row result)."""
    dfreq = (
        postings.select(id_col, "token")
        .distinct()
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("df_t"))
    )
    return dfreq.crossJoin(n_docs).select(
        "token",
        F.expr(f"(n_docs * {IDF_SCALE}L) div df_t").alias("idf_e6"),
    )


def tfidf_topk(
    df: DataFrame,
    query_terms: Sequence[str],
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k documents by exact-integer TF-IDF against a query-term set.

    ``score_e6 = Σ_t tf(d, t) · idf_e6(t)`` — a BIGINT on both engines.
    Returns (id_col, score_e6) under the deterministic
    (score DESC, id) order, LIMIT k.
    """
    terms = _norm_terms(query_terms)
    post = _postings(df, terms, text_col, id_col)
    tf = post.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("tf"))
    n_docs = df.agg(F.count(F.lit(1)).alias("n_docs"))
    idf = _idf_e6(post, n_docs, id_col)
    return (
        tf.join(F.broadcast(idf), "token")  # |terms| rows — bounded
        .groupBy(id_col)
        .agg(F.sum(F.col("tf") * F.col("idf_e6")).alias("score_e6"))
        .orderBy(F.col("score_e6").desc(), id_col)
        .limit(k)
    )


def tfidf_topk_sql(
    table: str,
    query_terms: Sequence[str],
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of :func:`tfidf_topk` (identical integer arithmetic;
    ``div``/``//`` both truncate and every operand is positive)."""
    terms = _norm_terms(query_terms)
    in_list = ", ".join(f"'{t}'" for t in terms)
    return f"""
    WITH post AS (
      SELECT {id_col}, token FROM (
        SELECT {id_col}, unnest({tokens_sql(text_col)}) AS token FROM {table}
      ) WHERE token IN ({in_list})
    ),
    tf AS (SELECT {id_col}, token, COUNT(*) AS tf FROM post GROUP BY 1, 2),
    nd AS (SELECT COUNT(*)::BIGINT AS n_docs FROM {table}),
    idf AS (
      SELECT token, (nd.n_docs * {IDF_SCALE}) // COUNT(DISTINCT {id_col}) AS idf_e6
      FROM post, nd GROUP BY token, nd.n_docs
    )
    SELECT tf.{id_col}, SUM(tf.tf * idf.idf_e6)::BIGINT AS score_e6
    FROM tf JOIN idf USING (token)
    GROUP BY 1 ORDER BY score_e6 DESC, {id_col} LIMIT {k}
    """


def bm25_topk(
    df: DataFrame,
    query_terms: Sequence[str],
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1_pct: int = 120,
    b_pct: int = 75,
) -> DataFrame:
    """Top-k documents by rational BM25 (k1 = k1_pct/100, b = b_pct/100)
    in exact integer arithmetic.

    The Okapi term saturation
    ``tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))`` is cleared of
    denominators by multiplying through with ``10⁴·total_tokens``
    (avgdl = total_tokens/n_docs):

        num  = 100·(k1_pct + 100) · AL · tf
        den  = 10⁴·AL·tf + k1_pct·(100 − b_pct)·AL + k1_pct·b_pct·dl·ND
        sat_e6 = (10⁶ · num) div den          -- ≤ (k1+1)·10⁶, exact

    with the one potentially-i64-overflowing product (``10⁶·num``)
    carried in DECIMAL(38,0) — ``div`` truncates identically to
    DuckDB's HUGEINT ``//`` for positive operands. Per-term
    contribution is ``(idf_e6 · sat_e6) div 10⁶`` so the final score
    stays on the idf scale. Returns (id_col, score_e6) under
    (score DESC, id), LIMIT k.
    """
    terms = _norm_terms(query_terms)
    toks = tokens_expr(F.col(text_col))
    base = df.select(F.col(id_col), toks.alias("_toks")).select(
        id_col,
        F.explode("_toks").alias("token"),
        F.size("_toks").cast("long").alias("dl"),
    )
    post = base.filter(F.col("token").isin(*terms))
    tf = post.groupBy(id_col, "token", "dl").agg(
        F.count(F.lit(1)).alias("tf")
    )
    stats = df.select(tokens_expr(F.col(text_col)).alias("_toks")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size("_toks").cast("long")).alias("total_tokens"),
    )
    idf = _idf_e6(
        post.select(id_col, "token"), stats.select("n_docs"), id_col
    )
    num = (
        F.lit(100 * (k1_pct + 100)).cast("decimal(38,0)")
        * F.col("total_tokens")
        * F.col("tf")
    )
    den = (
        F.lit(10_000).cast("decimal(38,0)") * F.col("total_tokens") * F.col("tf")
        + F.lit(k1_pct * (100 - b_pct)).cast("decimal(38,0)")
        * F.col("total_tokens")
        + F.lit(k1_pct * b_pct).cast("decimal(38,0)")
        * F.col("dl")
        * F.col("n_docs")
    )
    sat_e6 = F.expr(
        f"(CAST({SAT_SCALE} AS DECIMAL(38,0)) * _num) div _den"
    ).cast("long")
    return (
        tf.crossJoin(stats)  # one-row aggregate side — broadcast, benign
        .withColumn("_num", num)
        .withColumn("_den", den)
        .withColumn("sat_e6", sat_e6)
        .join(F.broadcast(idf), "token")  # |terms| rows — bounded
        .withColumn(
            "contrib_e6",
            F.expr(f"(idf_e6 * sat_e6) div {SAT_SCALE}L"),
        )
        .groupBy(id_col)
        .agg(F.sum("contrib_e6").alias("score_e6"))
        .orderBy(F.col("score_e6").desc(), id_col)
        .limit(k)
    )


def bm25_topk_sql(
    table: str,
    query_terms: Sequence[str],
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1_pct: int = 120,
    b_pct: int = 75,
) -> str:
    """DuckDB twin of :func:`bm25_topk` (HUGEINT ``//`` mirrors the
    DECIMAL(38,0) ``div``; all operands positive)."""
    terms = _norm_terms(query_terms)
    in_list = ", ".join(f"'{t}'" for t in terms)
    return f"""
    WITH base AS (
      SELECT {id_col}, unnest(toks) AS token, len(toks)::BIGINT AS dl
      FROM (SELECT {id_col}, {tokens_sql(text_col)} AS toks FROM {table})
    ),
    post AS (SELECT * FROM base WHERE token IN ({in_list})),
    tf AS (SELECT {id_col}, token, dl, COUNT(*) AS tf FROM post GROUP BY 1, 2, 3),
    stats AS (
      SELECT COUNT(*)::BIGINT AS n_docs, SUM(len(toks))::BIGINT AS total_tokens
      FROM (SELECT {tokens_sql(text_col)} AS toks FROM {table})
    ),
    idf AS (
      SELECT token,
             (stats.n_docs * {IDF_SCALE}) // COUNT(DISTINCT {id_col}) AS idf_e6
      FROM post, stats GROUP BY token, stats.n_docs
    ),
    scored AS (
      SELECT tf.{id_col}, idf.idf_e6,
             ({SAT_SCALE}::HUGEINT * (100 * ({k1_pct} + 100))::HUGEINT
               * stats.total_tokens * tf.tf)
             // (10000::HUGEINT * stats.total_tokens * tf.tf
                 + ({k1_pct} * (100 - {b_pct}))::HUGEINT * stats.total_tokens
                 + ({k1_pct} * {b_pct})::HUGEINT * tf.dl * stats.n_docs
                ) AS sat_e6
      FROM tf, stats, idf WHERE idf.token = tf.token
    )
    SELECT {id_col},
           SUM((idf_e6 * sat_e6) // {SAT_SCALE})::BIGINT AS score_e6
    FROM scored GROUP BY 1 ORDER BY score_e6 DESC, {id_col} LIMIT {k}
    """
