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

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
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


PPL_BUCKET_LABELS = ("head", "middle", "tail")


def ntile_by_group_distributed(
    df: DataFrame,
    group_col: str,
    order_cols: Sequence[str],
    n_buckets: int,
    out_col: str = "tile",
) -> DataFrame:
    """Rank-EXACT ``NTILE(n) OVER (PARTITION BY group ORDER BY ...)``
    without ever holding one group on one task.

    A plain per-group window serializes each group's full sort onto a
    single task — for inherently few-valued groups (languages, event
    types) that is k mega-partitions at corpus scale, and windows are
    not AQE-skew-split. This form is value-identical (the ordering
    must be unique, e.g. end with a row id) but distributes the sort:

    1. ``repartitionByRange(group, *order)``: every task holds a
       CONTIGUOUS slice of some group's order (a range boundary can
       split a group across tasks but never interleave it). Lazily
       localCheckpoint-pinned — the slice counts and the ranked rows
       are two consumers of the same lineage.
    2. per-(task, group) row counts — at most tasks × groups rows —
       cumulated into slice OFFSETS by a window over that TINY table
       (partitioned by group, ordered by partition id) plus per-group
       totals.
    3. global rank = slice offset + ``row_number`` within the
       (task, group) slice — a window bounded by one task's rows —
       and the SQL NTILE rule maps (rank, total) to the tile: with
       ``big = n mod k`` and ``size = n div k``, the first ``big``
       tiles carry ``size + 1`` rows.

    The offsets join back by (partition id, group) — AQE broadcasts
    the tiny side — so no data-sized structure ever reaches one task
    or the driver.
    """
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    order = [F.col(c) for c in order_cols]
    ranged = df.repartitionByRange(
        F.col(group_col), *order
    ).localCheckpoint(eager=False)
    with_pid = ranged.withColumn("__pid", F.spark_partition_id())
    counts = with_pid.groupBy("__pid", group_col).agg(
        F.count(F.lit(1)).alias("__n")
    )
    w_off = (
        Window.partitionBy(group_col)
        .orderBy("__pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_tot = Window.partitionBy(group_col)
    offsets = counts.select(
        "__pid",
        group_col,
        F.coalesce(F.sum("__n").over(w_off), F.lit(0)).alias("__off"),
        F.sum("__n").over(w_tot).alias("__tot"),
    )
    w_local = Window.partitionBy("__pid", group_col).orderBy(*order)
    ranked = (
        with_pid.withColumn("__lr", F.row_number().over(w_local))
        .join(offsets, ["__pid", group_col])
        .withColumn("__rank", F.col("__off") + F.col("__lr"))
    )
    k = F.lit(n_buckets)
    big = F.col("__tot") % k  # tiles 1..big carry size+1 rows
    size = F.expr(f"__tot DIV {n_buckets}")
    in_big = F.col("__rank") <= big * (size + 1)
    tile = F.when(
        in_big, F.expr(f"(__rank - 1) DIV (__tot DIV {n_buckets} + 1) + 1")
    ).otherwise(
        big
        + F.expr(
            f"(__rank - (__tot % {n_buckets}) * (__tot DIV {n_buckets} + 1)"
            f" - 1) DIV (__tot DIV {n_buckets}) + 1"
        )
    )
    return ranked.withColumn(out_col, tile.cast("int")).drop(
        "__pid", "__lr", "__off", "__tot", "__rank"
    )


def lm_perplexity_buckets(
    docs: DataFrame,
    model: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    n_buckets: int = 3,
    approx: bool = False,
    distributed: bool = False,
) -> DataFrame:
    """CCNet's per-language perplexity bucketing: score every document
    under ``model`` (:func:`lm_score`) and split each language's
    documents into ``n_buckets`` equal NLL tiers — for the canonical 3,
    ``head`` (most fluent third), ``middle``, ``tail`` — the labels
    CCNet trains on head+middle and discards tail by. Per-LANGUAGE
    tiers are the point: absolute perplexity is not comparable across
    languages (morphology changes bigram entropy), so one global
    threshold would keep all of one language's spam and drop another's
    prose.

    Buckets come from ``NTILE(n)`` over (nll asc, id asc) within each
    language — rank-exact, engine-identical (both engines hand the
    remainder rows to the leading tiles, and the unique id tiebreaker
    pins every boundary), with no float percentile interpolation to
    diverge on. Documents too short to score (< 2 tokens) are absent,
    like :func:`lm_score`.

    Scale: scoring is the usual exploded-bigram join; the bucket
    window sorts only the per-document SCORE table (a few dozen bytes
    per document, ~10⁻⁴ of corpus bytes) partitioned by language.
    Like the exact grouped quantiles (`value_quantiles`), rank-exact
    tiers are the oracle-checkable contract. ``distributed=True``
    keeps that exactness at scale: languages are an inherently
    FEW-valued key, so the per-language window is k mega-partitions
    at corpus size — :func:`ntile_by_group_distributed` range-
    partitions the order so every task sorts one contiguous slice,
    value-identically. ``approx=True`` is the cheaper sketch path
    when even rank-exactness can be traded.

    Returns ``(id_col, lang_col, n_bigrams, nll, tile, bucket)`` with
    ``tile`` 1-based and ``bucket`` the CCNet label for ``n_buckets=3``
    (``'b<tile>'`` otherwise).

    ``approx=True`` is that scale path, implemented: per-language tier
    thresholds from ``approx_percentile`` (one partial-merging
    aggregate, no per-language sort), broadcast back as a tiny
    threshold table, tile assignment a map-side comparison. Tiles can
    differ from the rank-exact form only for documents whose nll ties
    a sketch boundary, tier sizes are approximately — not exactly —
    equal, and the output is NOT oracle-hashable (the sketch is
    engine-specific); use it when a language's documents no longer fit
    a sort partition.
    """
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    scored = lm_score(docs, model, id_col, text_col)
    joined = scored.join(
        docs.select(F.col(id_col), F.col(lang_col)), id_col
    )
    if approx and n_buckets == 1:
        # percentile_approx rejects an empty percentage list; one
        # bucket needs no thresholds — everything is tile 1, matching
        # the exact NTILE(1) path.
        tiled = joined.withColumn("tile", F.lit(1))
    elif approx:
        pcts = [i / n_buckets for i in range(1, n_buckets)]
        thr = joined.groupBy(lang_col).agg(
            F.percentile_approx(
                "nll", pcts, 100_000
            ).alias("__thr")
        )
        tile = F.lit(1)
        for i in range(n_buckets - 1):
            tile = tile + F.when(
                F.col("nll") > F.element_at("__thr", i + 1), 1
            ).otherwise(0)
        tiled = joined.join(thr, lang_col).withColumn(
            "tile", tile.cast("int")
        )
    elif distributed:
        # rank-exact without a per-language sort partition — the scale
        # form for the inherently few-valued language key (value-
        # identical to the window NTILE; oracle-checkable)
        tiled = ntile_by_group_distributed(
            joined, lang_col, ["nll", id_col], n_buckets
        )
    else:
        w = Window.partitionBy(lang_col).orderBy(
            F.col("nll").asc(), F.col(id_col).asc()
        )
        tiled = joined.withColumn("tile", F.ntile(n_buckets).over(w))
    if n_buckets == 3:
        label = F.element_at(
            F.array(*[F.lit(x) for x in PPL_BUCKET_LABELS]), F.col("tile")
        )
    else:
        label = F.concat(F.lit("b"), F.col("tile").cast("string"))
    return tiled.select(
        id_col,
        lang_col,
        "n_bigrams",
        "nll",
        "tile",
        label.alias("bucket"),
    )


def lm_perplexity_buckets_sql(
    table: str,
    model_sql: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    n_buckets: int = 3,
) -> str:
    """DuckDB twin of :func:`lm_perplexity_buckets` (NTILE distributes
    remainders to the leading tiles in both engines; the (nll, id)
    ordering is total, so tile assignment is value-exact)."""
    if n_buckets == 3:
        label = (
            "CASE tile WHEN 1 THEN 'head' WHEN 2 THEN 'middle' "
            "ELSE 'tail' END"
        )
    else:
        label = "'b' || tile::VARCHAR"
    return f"""
    WITH __scores AS (
        {lm_score_sql(table, model_sql, id_col, text_col)}
    ),
    __tiled AS (
        SELECT s.{id_col}, d.{lang_col}, s.n_bigrams, s.nll,
               NTILE({int(n_buckets)}) OVER (
                 PARTITION BY d.{lang_col}
                 ORDER BY s.nll ASC, s.{id_col} ASC
               ) AS tile
        FROM __scores s
        JOIN (SELECT {id_col}, {lang_col} FROM {table}) d USING ({id_col})
    )
    SELECT {id_col}, {lang_col}, n_bigrams, nll,
           tile::INTEGER AS tile, {label} AS bucket
    FROM __tiled
    """
