"""Similarity search over embedding columns (``array<float>``).

- :func:`cosine_topk` — brute-force exact top-k against one query
  vector: map-only scored scan → ``TakeOrderedAndProject`` (no global
  sort, no shuffle of vectors).
- :func:`knn_join` — exact k-NN for a small query set: broadcast the
  queries across the corpus scan, per-query top-k via window rank.
  Corpus never shuffles; cost is |corpus| × |queries| dot products,
  embarrassingly parallel.
- :func:`srp_lsh_topk` — the scale path: Signed-Random-Projection LSH.
  Deterministic hyperplanes (LCG, literal-embeddable) map each vector
  to a bucket id; only the query's bucket (plus optional neighbor
  probes) is reranked exactly. At 100 TB the bucket id becomes a
  partition/cluster key so a probe touches a handful of files.

Dot products are sequential left-folds over DOUBLE (``zip_with`` +
``aggregate``) — bit-identical to the DuckDB oracle's ``list_reduce``
over the same values, so scores hash-match at 6 decimals.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _lcg_floats(n: int, seed: int) -> list[float]:
    """Deterministic pseudo-random floats in [-1, 1) — reproducible in
    any process and embeddable as literals in oracle SQL."""
    out = []
    x = seed & 0xFFFFFFFFFFFFFFFF
    for _ in range(n):
        x = (x * 6364136223846793005 + 1442695040888963407) & 0xFFFFFFFFFFFFFFFF
        # 21 high bits → exact double, range [-1, 1)
        out.append((x >> 43) / float(1 << 20) - 1.0)
    return out


def hyperplanes(dim: int, n_planes: int, seed: int = 7) -> list[list[float]]:
    vals = _lcg_floats(dim * n_planes, seed)
    return [vals[j * dim : (j + 1) * dim] for j in range(n_planes)]


def _dvec(c: Column) -> Column:
    """float[] → double[] so both engines accumulate identically."""
    return F.transform(c, lambda x: x.cast("double"))


def lit_vec(vals) -> Column:
    """Literal double[] built as ONE parsed expression instead of
    len(vals) py4j `lit` calls — for 128-dim vectors the py4j round
    trips dominate driver-side plan construction (~0.1 s per vector);
    string-cast round-trips repr() exactly, so values are bit-identical
    to F.lit(float(v))."""
    body = ", ".join(f"CAST('{float(v)!r}' AS DOUBLE)" for v in vals)
    return F.expr(f"array({body})")


def dot_expr(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product (order-deterministic)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def lit_vec_sql(vals) -> str:
    """Spark-SQL text of :func:`lit_vec` for string-built expressions."""
    body = ", ".join(f"CAST('{float(v)!r}' AS DOUBLE)" for v in vals)
    return f"array({body})"


def spark_dot_sql(a: str, b: str) -> str:
    """Spark-SQL text of :func:`dot_expr` — identical fold order, for
    expressions assembled as strings (one parse instead of dozens of
    py4j round trips per vector)."""
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), "
        f"CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(dot_expr(a, a))


def cosine_expr(a: Column, b: Column, nd: int = 6) -> Column:
    da, db = _dvec(a), _dvec(b)
    return F.round(dot_expr(da, db) / (norm_expr(da) * norm_expr(db)), nd)


def dot_sql(a: str, b: str) -> str:
    """DuckDB left-fold matching :func:`dot_expr` exactly (same
    accumulation order; seed element avoids the empty-list error)."""
    return (
        f"list_reduce(list_prepend(0.0, "
        f"[({a})[i]::DOUBLE * ({b})[i]::DOUBLE FOR i IN range(1, len({a}) + 1)]), "
        f"(acc, x) -> acc + x)"
    )


def cosine_sql(a: str, b: str, nd: int = 6) -> str:
    return (
        f"ROUND({dot_sql(a, b)} / "
        f"(sqrt({dot_sql(a, a)}) * sqrt({dot_sql(b, b)})), {nd})"
    )


def cosine_topk(
    corpus: DataFrame,
    query_vec: list[float],
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine against a literal query vector.

    The query is a codegen constant — scoring is a map-only pass and
    ``orderBy().limit(k)`` compiles to TakeOrderedAndProject (per-
    partition heaps + driver merge of k rows, not a sort).
    """
    q = lit_vec(query_vec)
    scored = corpus.select(
        F.col(id_col),
        cosine_expr(F.col(vec_col), q).alias("cosine"),
    )
    return scored.orderBy(F.col("cosine").desc(), F.col(id_col)).limit(k)


def knn_join(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    query_id: str = "q_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact k-NN join: every query row → its k nearest corpus rows.

    Queries broadcast (small side); the corpus scan stays partition-
    local. The per-query top-k window shuffles only (q_id, vec_id,
    score) triples — never embeddings.
    """
    q = queries.select(
        F.col(query_id), F.col(vec_col).alias("__qvec")
    )
    scored = corpus.crossJoin(F.broadcast(q)).select(
        F.col(query_id),
        F.col(corpus_id),
        cosine_expr(F.col(vec_col), F.col("__qvec")).alias("cosine"),
    )
    w = Window.partitionBy(query_id).orderBy(F.col("cosine").desc(), F.col(corpus_id))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .drop("rank")
    )


def knn_join_sql(
    queries_sql: str,
    corpus_table: str,
    k: int,
    query_id: str = "q_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    cos = cosine_sql(f"c.{vec_col}", f"q.__qvec")
    return f"""
    WITH q AS ({queries_sql}),
    scored AS (
        SELECT q.{query_id}, c.{corpus_id}, {cos} AS cosine
        FROM {corpus_table} c CROSS JOIN q
    )
    SELECT {query_id}, {corpus_id}, cosine FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY {query_id} ORDER BY cosine DESC, {corpus_id}) AS rn
        FROM scored
    ) WHERE rn <= {k}
    """


def srp_bucket_expr(vec: Column, planes: list[list[float]]) -> Column:
    """SRP-LSH bucket id: bit j = sign(dot(vec, plane_j)) ≥ 0.

    Plane coordinates are literals, so the whole bucket id is one
    codegen expression — usable as a partition / clustering key.
    """
    dv = _dvec(vec)
    bucket = F.lit(0).cast("long")
    for j, plane in enumerate(planes):
        p = lit_vec(plane)
        bit = F.when(dot_expr(dv, p) >= 0, F.lit(1 << j).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        bucket = bucket + bit
    return bucket


def srp_bucket_sql(vec: str, planes: list[list[float]]) -> str:
    parts = []
    for j, plane in enumerate(planes):
        lit = "[" + ", ".join(repr(v) for v in plane) + "]"
        parts.append(
            f"(CASE WHEN {dot_sql(vec, lit)} >= 0 THEN {1 << j}::BIGINT ELSE 0::BIGINT END)"
        )
    return "(" + " + ".join(parts) + ")"


def srp_lsh_topk(
    corpus: DataFrame,
    query_vec: list[float],
    k: int,
    n_planes: int = 8,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k: exact rerank restricted to the query's SRP bucket.

    Recall is probabilistic (standard SRP trade-off); at scale the
    bucket id is precomputed once per corpus vector and used as the
    storage partition key, so a query reads 1/2^n_planes of the data.
    """
    planes = hyperplanes(len(query_vec), n_planes, seed)
    qbits = 0
    for j, plane in enumerate(planes):
        if sum(q * p for q, p in zip(query_vec, plane)) >= 0:
            qbits += 1 << j
    bucketed = corpus.withColumn("bucket", srp_bucket_expr(F.col(vec_col), planes))
    return cosine_topk(
        bucketed.filter(F.col("bucket") == qbits), query_vec, k, id_col, vec_col
    ).withColumn("bucket", F.lit(qbits).cast("long"))


def srp_lsh_topk_sql(
    corpus_table: str,
    query_vec: list[float],
    k: int,
    n_planes: int = 8,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    planes = hyperplanes(len(query_vec), n_planes, seed)
    qbits = 0
    for j, plane in enumerate(planes):
        if sum(q * p for q, p in zip(query_vec, plane)) >= 0:
            qbits += 1 << j
    qlit = "[" + ", ".join(repr(float(v)) for v in query_vec) + "]"
    return f"""
    SELECT {id_col}, {cosine_sql(vec_col, qlit)} AS cosine, {qbits}::BIGINT AS bucket
    FROM {corpus_table}
    WHERE {srp_bucket_sql(vec_col, planes)} = {qbits}
    ORDER BY cosine DESC, {id_col} LIMIT {k}
    """


def ivf_assignments(
    corpus: DataFrame,
    centroids: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF cell assignment: each vector → its nearest centroid by cosine
    (ties → smallest centroid id). Centroid coordinates are plan
    literals, so assignment is a map-only pass; at scale the cell id
    becomes the storage partition key (the inverted file).

    Centroid *training* is pluggable — any k-means produces the list;
    here callers typically seed with deterministic corpus vectors so the
    differential oracle can rebuild the same cells in SQL.
    """
    # the whole candidate bank is ONE parsed SQL expression: built with
    # Column operators the ~20 py4j round trips per centroid dominate
    # plan construction (~1 s for 8 centroids, 3× the execution time)
    dv = f"transform(`{vec_col}`, x -> CAST(x AS DOUBLE))"
    cands = []
    for cid, cvec in centroids:
        p = lit_vec_sql(cvec)
        cands.append(
            f"struct(-({spark_dot_sql(dv, p)}) / sqrt({spark_dot_sql(p, p)})"
            f" AS neg_score, {cid} AS cid)"
        )
    return corpus.withColumn(
        "cell", F.expr(f"sort_array(array({', '.join(cands)}))[0].cid")
    )


def ivf_topk(
    corpus: DataFrame,
    query_vec: list[float],
    k: int,
    centroids: list[tuple[int, list[float]]],
    n_probe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN top-k: probe the ``n_probe`` cells nearest the query,
    rerank exactly inside them. With cells as partition keys, a probe
    reads ~n_probe/n_centroids of the corpus."""

    def cos(q, c):
        d = sum(x * y for x, y in zip(q, c))
        nq = sum(x * x for x in q) ** 0.5
        nc = sum(x * x for x in c) ** 0.5
        return d / (nq * nc) if nq and nc else 0.0

    ranked = sorted(centroids, key=lambda t: (-cos(query_vec, t[1]), t[0]))
    probe_cells = [cid for cid, _ in ranked[:n_probe]]
    assigned = ivf_assignments(corpus, centroids, id_col, vec_col)
    probed = assigned.filter(F.col("cell").isin(probe_cells))
    return (
        cosine_topk(probed, query_vec, k, id_col, vec_col)
        .withColumn("probed_cells", F.lit(",".join(map(str, sorted(probe_cells)))))
    )


def ivf_topk_sql(
    corpus_table: str,
    query_vec: list[float],
    k: int,
    n_centroids: int = 8,
    n_probe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """Oracle for :func:`ivf_topk` seeded with the first ``n_centroids``
    corpus vectors (by id) as centroids — fully derivable in SQL."""
    qlit = "[" + ", ".join(repr(float(v)) for v in query_vec) + "]"
    # centroid score uses dot(v,c)/norm(c) (norm(v) constant per row's
    # argmax) — must match ivf_assignments' neg_score exactly
    return f"""
    WITH cent AS (
        SELECT {id_col} AS cid, {vec_col} AS cvec FROM {corpus_table}
        WHERE {id_col} < {n_centroids}
    ),
    probe AS (
        SELECT cid FROM cent
        ORDER BY {cosine_sql('cvec', qlit, 12)} DESC, cid LIMIT {n_probe}
    ),
    assigned AS (
        SELECT e.{id_col}, e.{vec_col},
               (SELECT c.cid FROM cent c
                ORDER BY -({dot_sql(f'e.{vec_col}', 'c.cvec')} / sqrt({dot_sql('c.cvec', 'c.cvec')})) ASC, c.cid ASC
                LIMIT 1) AS cell
        FROM {corpus_table} e
    )
    SELECT a.{id_col}, {cosine_sql(f'a.{vec_col}', qlit)} AS cosine,
           (SELECT string_agg(cid::VARCHAR, ',' ORDER BY cid) FROM probe) AS probed_cells
    FROM assigned a
    WHERE a.cell IN (SELECT cid FROM probe)
    ORDER BY cosine DESC, a.{id_col} LIMIT {k}
    """


def embedding_neardup_pairs(
    corpus: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 6,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exact: bool = False,
    dim: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs.

    Default (scale) path: SRP-bucketed self-join — near-identical
    vectors land in the same bucket with high probability, and the
    quadratic verification runs per bucket, not globally. ``exact=True``
    switches to the all-pairs join (oracle/baseline path).

    Pass ``dim`` (vector dimensionality) so plan construction stays
    job-free; when omitted, a one-row probe infers it (a synchronous
    Spark job at build time — fallback only).
    """
    a = corpus.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = corpus.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    if exact:
        # The all-pairs theta-join compiles to a BroadcastNestedLoopJoin
        # streaming the left side; a small corpus often arrives as 1-2
        # file partitions, which would serialize the O(n²) cosine work
        # onto one core (observed: 20k vectors = 200M cosines on a
        # single task at sf1). Spread the streamed side explicitly —
        # an explicit repartition(N) is honored (AQE only coalesces
        # non-user-specified shuffles), so the quadratic stage scales
        # with the session's parallelism.
        n_parts = int(
            corpus.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
        )
        joined = a.repartition(n_parts).join(b, F.col("id_a") < F.col("id_b"))
    else:
        if dim is None:
            first = corpus.select(F.size(F.col(vec_col)).alias("d")).first()
            dim = first["d"]
        planes = hyperplanes(dim, n_planes, seed)
        ab = corpus.select(
            F.col(id_col),
            F.col(vec_col),
            srp_bucket_expr(F.col(vec_col), planes).alias("bucket"),
        )
        a = ab.select(
            F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"), "bucket"
        )
        b = ab.select(
            F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"), "bucket"
        )
        joined = a.join(b, ["bucket"]).filter(F.col("id_a") < F.col("id_b"))
    return (
        joined.select(
            "id_a", "id_b", cosine_expr(F.col("va"), F.col("vb")).alias("cosine")
        )
        .filter(F.col("cosine") >= threshold)
    )


def embedding_neardup_pairs_sql(
    corpus_table: str,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    cos = cosine_sql(f"a.{vec_col}", f"b.{vec_col}")
    return f"""
    SELECT a.{id_col} AS id_a, b.{id_col} AS id_b, {cos} AS cosine
    FROM {corpus_table} a JOIN {corpus_table} b ON a.{id_col} < b.{id_col}
    WHERE {cos} >= {threshold}
    """
