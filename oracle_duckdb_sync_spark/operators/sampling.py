"""Deterministic hash-based sampling (training-data pipeline extension).

The reference has no sampling operator (SURVEY.md §2 — its row caps are
LIMITs); large-scale corpus work needs reproducible subsetting, so this
module implements Bernoulli sampling, per-stratum rates, and
train/val/test splitting keyed on a *content-stable hash bucket* instead
of ``df.sample()``:

- a row's fate depends only on (salt, id) — stable across sessions,
  partitionings, engine versions, and incremental appends (new data
  never re-rolls old rows, the property that keeps eval sets honest);
- the md5 bucket matches DuckDB bit-for-bit (`hash60` parity in
  ``functions/text.py``), so every operator here has an exact SQL twin;
- at 100 TB the bucket is a pure map-side projection — no shuffle, no
  coordination, trivially parallel, and the filter prunes before any
  downstream join/agg.

Buckets are per-mille-of-ten-thousand (1/10000) so rates down to 0.01%
are expressible exactly.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import hash60_expr, hash60_sql

SAMPLE_BUCKETS = 10_000


def _key_expr(id_col: str, salt: str) -> Column:
    return F.concat(F.lit(salt), F.lit(":"), F.col(id_col).cast("string"))


def _key_sql(id_col: str, salt: str) -> str:
    return f"'{salt}:' || {id_col}::VARCHAR"


def sample_bucket_expr(id_col: str, salt: str = "s0") -> Column:
    """Deterministic bucket in [0, 10000) from (salt, id)."""
    return F.pmod(hash60_expr(_key_expr(id_col, salt)), F.lit(SAMPLE_BUCKETS))


def sample_bucket_sql(id_col: str, salt: str = "s0") -> str:
    return f"({hash60_sql(_key_sql(id_col, salt))} % {SAMPLE_BUCKETS})"


def _rate_to_threshold(rate: float) -> int:
    t = int(round(rate * SAMPLE_BUCKETS))
    if not 0 <= t <= SAMPLE_BUCKETS:
        raise ValueError(f"rate {rate} outside [0, 1]")
    return t


def hash_sample(df: DataFrame, id_col: str, rate: float, salt: str = "s0") -> DataFrame:
    """Keep ≈``rate`` of rows, chosen deterministically by id hash."""
    return df.filter(sample_bucket_expr(id_col, salt) < _rate_to_threshold(rate))


def hash_sample_sql(table: str, id_col: str, rate: float, salt: str = "s0") -> str:
    return (
        f"SELECT * FROM {table} "
        f"WHERE {sample_bucket_sql(id_col, salt)} < {_rate_to_threshold(rate)}"
    )


def stratified_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    rates: Mapping[str, float],
    default_rate: float = 0.0,
    salt: str = "s0",
) -> DataFrame:
    """Per-stratum Bernoulli rates (e.g. language rebalancing: keep 10%
    of English, 100% of low-resource languages). One map-side CASE over
    the bucket — no shuffle, no per-stratum pass."""
    thr: Column = F.lit(_rate_to_threshold(default_rate))
    for value in sorted(rates):
        thr = F.when(
            F.col(strata_col) == value, F.lit(_rate_to_threshold(rates[value]))
        ).otherwise(thr)
    return df.filter(sample_bucket_expr(id_col, salt) < thr)


def stratified_sample_sql(
    table: str,
    id_col: str,
    strata_col: str,
    rates: Mapping[str, float],
    default_rate: float = 0.0,
    salt: str = "s0",
) -> str:
    # mirror the Spark when-chain: later whens wrap earlier ones, so the
    # sorted-last stratum is the outermost (first-checked) CASE arm
    whens = " ".join(
        f"WHEN {strata_col} = '{v}' THEN {_rate_to_threshold(rates[v])}"
        for v in sorted(rates, reverse=True)
    )
    thr = f"(CASE {whens} ELSE {_rate_to_threshold(default_rate)} END)"
    return f"SELECT * FROM {table} WHERE {sample_bucket_sql(id_col, salt)} < {thr}"


def split_assign(
    df: DataFrame,
    id_col: str,
    splits: Sequence[tuple[str, float]] = (("train", 0.9), ("val", 0.05), ("test", 0.05)),
    salt: str = "split0",
) -> DataFrame:
    """Assign every row a split label by cumulative bucket ranges.

    Weights must sum to 1. Disjoint and exhaustive by construction; the
    assignment is a projection (`withColumn`), so a 100 TB corpus can be
    written out `partitionBy("split")` in the same single pass.
    """
    total = sum(w for _, w in splits)
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights sum to {total}, expected 1.0")
    bucket = sample_bucket_expr(id_col, salt)
    expr = None
    acc = 0
    for name, w in splits:
        acc_next = acc + _rate_to_threshold(w)
        cond = bucket < F.lit(acc_next)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
        acc = acc_next
    # rounding may leave buckets [acc, 10000) unlabeled: close the range
    # by folding them into the last split
    expr = expr.otherwise(splits[-1][0])
    return df.withColumn("split", expr)


def split_assign_sql(
    table: str,
    id_col: str,
    splits: Sequence[tuple[str, float]] = (("train", 0.9), ("val", 0.05), ("test", 0.05)),
    salt: str = "split0",
) -> str:
    bucket = sample_bucket_sql(id_col, salt)
    arms = []
    acc = 0
    for name, w in splits:
        acc += _rate_to_threshold(w)
        arms.append(f"WHEN {bucket} < {acc} THEN '{name}'")
    case = "CASE " + " ".join(arms) + f" ELSE '{splits[-1][0]}' END"
    return f"SELECT *, {case} AS split FROM {table}"


def leakage_safe_split(
    df: DataFrame,
    clusters: DataFrame,
    id_col: str = "doc_id",
    splits: Sequence[tuple[str, float]] = (("train", 0.9), ("val", 0.05), ("test", 0.05)),
    salt: str = "split0",
    cluster_node_col: str = "id",
    cluster_id_col: str = "cluster_id",
) -> DataFrame:
    """:func:`split_assign`, but near-duplicates can never straddle a
    split boundary: the split bucket hashes the row's duplicate-CLUSTER
    id (its own id when unclustered), so every member of a cluster
    lands in the same split.

    Why it matters: plain per-document splitting leaks — a train doc's
    near-duplicate in the test split inflates eval exactly like
    benchmark contamination, and it happens whenever dedup is soft
    (threshold below 1.0, or dups deliberately retained for
    upsampling). Keying the hash on the cluster id is the standard fix.

    Scale shape: one join against the (small) cluster map — no hint,
    AQE broadcasts it when it fits — then the same map-side bucket
    projection as :func:`split_assign`; the corpus is never shuffled.
    Append-stable like every operator in this module: a new crawl's
    docs joining an OLD cluster inherit the old cluster id and thus the
    old split, so eval sets stay honest across increments (as long as
    the closure keeps min-id labels, which :func:`dedup.
    duplicate_clusters` guarantees for append-only ids).
    """
    lab = df.join(
        clusters.select(
            F.col(cluster_node_col).alias(id_col),
            F.col(cluster_id_col).alias("__ck"),
        ),
        id_col,
        "left",
    )
    keyed = lab.withColumn(
        "__skey", F.coalesce(F.col("__ck"), F.col(id_col)).cast("string")
    )
    return split_assign(keyed, "__skey", splits, salt).drop("__ck", "__skey")


def leakage_safe_split_sql(
    table: str,
    clusters_sql: str,
    id_col: str = "doc_id",
    splits: Sequence[tuple[str, float]] = (("train", 0.9), ("val", 0.05), ("test", 0.05)),
    salt: str = "split0",
) -> str:
    """DuckDB twin of :func:`leakage_safe_split`; same cumulative
    bucket arithmetic as :func:`split_assign_sql` over the coalesced
    cluster key."""
    inner = f"""(
        SELECT d.*, COALESCE(c.cluster_id, d.{id_col})::VARCHAR AS __skey
        FROM {table} d
        LEFT JOIN ({clusters_sql}) c ON d.{id_col} = c.id
    ) __lk"""
    return (
        "SELECT * EXCLUDE (__skey) FROM ("
        + split_assign_sql(inner, "__skey", splits, salt)
        + ") __lks"
    )


def mixture_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    targets: Mapping[str, int],
    salt: str = "mix0",
) -> DataFrame:
    """Downsample to a *target mixture*: keep the largest deterministic
    subsample whose expected stratum proportions match ``targets``
    (integer weights, e.g. ``{"en": 5, "zh": 3, "de": 2}`` → 50/30/20).
    The pre-training data-mixing primitive: the corpus is whatever the
    crawl produced; the training set needs a chosen domain/language
    blend, reproducibly, without a second pass when data is appended.

    The feasible total is pinned by the scarcest stratum:
    ``T = min_s floor(count_s · D / w_s)`` (D = Σ weights); each
    stratum then keeps rate ``(w_s/D)·T / count_s ≤ 1``. Membership is
    decided in EXACT integer arithmetic — row kept iff
    ``bucket · D · count_s < w_s · T · 10000`` — so the SQL twin
    matches bit-for-bit (no double rounding at rate boundaries) and
    the selection is append-stable per stratum (a grown stratum keeps
    a superset decision boundary only through T; rows never re-roll).

    Plan: one tiny per-stratum count aggregate (output bounded by the
    stratum count, collected driver-side like the sink's partition
    listing), then ONE map-side scan of the corpus against literal
    integer thresholds — no joins, no shuffle on the 100 TB table.
    Strata not in ``targets`` are dropped; an empty stratum makes
    T = 0 (empty result) — the mixture is infeasible and silence would
    be a lie.
    """
    if not targets or any(w <= 0 for w in targets.values()):
        raise ValueError("targets must be non-empty positive integer weights")
    d_sum = sum(targets.values())
    # per-stratum counts: ONE aggregate whose result is bounded by the
    # number of target strata — a legitimate driver-side collect (same
    # contract as the sink's touched-partition listing). Thresholds then
    # compile to literals, so the corpus pass is a single scan + CASE
    # filter with no joins at all.
    counts = {s: 0 for s in targets}
    for r in (
        df.filter(F.col(strata_col).isin(*targets))
        .groupBy(strata_col)
        .agg(F.count(F.lit(1)).alias("__c"))
        .collect()
    ):
        counts[r[strata_col]] = int(r["__c"])
    # T = min_s floor(c_s * D / w_s); exact integer arithmetic end-to-end
    t = min(counts[s] * d_sum // w for s, w in targets.items())
    bucket = sample_bucket_expr(id_col, salt)
    keep = None
    for s in sorted(targets):
        # bucket · D · count_s < w_s · T · BUCKETS, all Python-exact ints
        cond = (F.col(strata_col) == s) & (
            bucket * F.lit(d_sum * counts[s])
            < F.lit(targets[s] * t * SAMPLE_BUCKETS)
        )
        keep = cond if keep is None else keep | cond
    return df.filter(keep)


def mixture_sample_sql(
    table: str,
    id_col: str,
    strata_col: str,
    targets: Mapping[str, int],
    salt: str = "mix0",
) -> str:
    """DuckDB twin of :func:`mixture_sample` (identical integer
    arithmetic, including the floor-division pmod identity)."""
    d_sum = sum(targets.values())
    values = ", ".join(f"('{s}', {int(w)})" for s, w in sorted(targets.items()))
    in_list = ", ".join(f"'{s}'" for s in sorted(targets))
    q = "(c * %d)" % d_sum
    floor_div = f"(({q} - (({q} % w + w) % w)) // w)"
    return f"""
    WITH tgt(s, w) AS (SELECT * FROM (VALUES {values}) v(s, w)),
    counts AS (
      SELECT tgt.s, tgt.w, COALESCE(n.c, 0)::BIGINT AS c
      FROM tgt LEFT JOIN (
        SELECT {strata_col} AS s, COUNT(*)::BIGINT AS c FROM {table}
        WHERE {strata_col} IN ({in_list}) GROUP BY 1
      ) n USING (s)
    ),
    t AS (SELECT MIN({floor_div})::BIGINT AS t FROM counts)
    SELECT d.* FROM {table} d
    JOIN counts ON d.{strata_col} = counts.s, t
    WHERE {sample_bucket_sql(id_col, salt)} * {d_sum} * counts.c
          < counts.w * t.t * {SAMPLE_BUCKETS}
    """


def token_mixture_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    targets: Mapping[str, int],
    token_count: Column,
    salt: str = "mix0",
) -> DataFrame:
    """:func:`mixture_sample` measured in TOKENS instead of rows — the
    blend an LLM pre-training run actually targets (a 50/30/20
    en/zh/de mix means token mass, and long-document strata would be
    badly over-weighted by a row-count mixture).

    Same exact-integer machinery with per-stratum token totals:
    ``T = min_s floor(tok_s · D / w_s)`` is the largest feasible token
    budget, each stratum keeps documents with
    ``bucket · D · tok_s < w_s · T · 10000`` — membership stays
    per-document (whole documents, decided by the content-stable hash
    bucket), so the achieved token mass matches the target in
    expectation while the decision remains deterministic, append-
    stable, and bit-identical to the SQL twin. ``token_count`` is any
    integer Column (the whitespace tokenizer's ``size(tokens)``, a
    stored BPE count column, …).

    Plan: one per-stratum SUM aggregate (bounded by |targets|,
    collected driver-side), then ONE map-side scan against literal
    integer thresholds — no joins, no shuffle of the corpus.
    """
    if not targets or any(w <= 0 for w in targets.values()):
        raise ValueError("targets must be non-empty positive integer weights")
    d_sum = sum(targets.values())
    toks = {s: 0 for s in targets}
    for r in (
        df.filter(F.col(strata_col).isin(*targets))
        .groupBy(strata_col)
        .agg(F.sum(token_count.cast("long")).alias("__t"))
        .collect()
    ):
        toks[r[strata_col]] = int(r["__t"] or 0)
    t = min(toks[s] * d_sum // w for s, w in targets.items())
    bucket = sample_bucket_expr(id_col, salt)
    keep = None
    for s in sorted(targets):
        cond = (F.col(strata_col) == s) & (
            bucket * F.lit(d_sum * toks[s]) < F.lit(targets[s] * t * SAMPLE_BUCKETS)
        )
        keep = cond if keep is None else keep | cond
    return df.filter(keep)


def token_mixture_sample_sql(
    table: str,
    id_col: str,
    strata_col: str,
    targets: Mapping[str, int],
    token_count_sql: str,
    salt: str = "mix0",
) -> str:
    """DuckDB twin of :func:`token_mixture_sample`."""
    d_sum = sum(targets.values())
    values = ", ".join(f"('{s}', {int(w)})" for s, w in sorted(targets.items()))
    in_list = ", ".join(f"'{s}'" for s in sorted(targets))
    q = "(c * %d)" % d_sum
    floor_div = f"(({q} - (({q} % w + w) % w)) // w)"
    return f"""
    WITH tgt(s, w) AS (SELECT * FROM (VALUES {values}) v(s, w)),
    counts AS (
      SELECT tgt.s, tgt.w, COALESCE(n.c, 0)::BIGINT AS c
      FROM tgt LEFT JOIN (
        SELECT {strata_col} AS s, SUM(({token_count_sql})::BIGINT)::BIGINT AS c
        FROM {table}
        WHERE {strata_col} IN ({in_list}) GROUP BY 1
      ) n USING (s)
    ),
    t AS (SELECT MIN({floor_div})::BIGINT AS t FROM counts)
    SELECT d.* FROM {table} d
    JOIN counts ON d.{strata_col} = counts.s, t
    WHERE {sample_bucket_sql(id_col, salt)} * {d_sum} * counts.c
          < counts.w * t.t * {SAMPLE_BUCKETS}
    """


def cap_per_group(
    df: DataFrame,
    id_col: str,
    group_col: str,
    max_rows: int,
    salt: str = "cap0",
    skew_safe: bool = False,
    oversample: int = 4,
) -> DataFrame:
    """Cap each group at ``max_rows`` rows (the per-domain/per-source
    quota of a crawl pipeline: no single boilerplate-heavy site may
    dominate the corpus). Which rows survive is decided by the
    content-stable hash bucket (then id) — reproducible across runs and
    engines, and NOT biased toward early-crawled rows the way a
    first-N-seen cap is.

    Default form: one shuffle on the group key; the rank is a
    per-partition heap-free window over (bucket, id). Groups under the
    cap pass through whole — but a mega-group's window partition sorts
    in ONE task (AQE's skew splitting applies to joins, not window
    exchanges), so a 10^9-row domain serializes there.

    ``skew_safe=True`` is the 100 TB form: compute exact group counts
    (map-side-combining agg), broadcast them back, and PREFILTER each
    over-cap group to its smallest hash buckets before the window —
    integer threshold ``min(BUCKETS, ceil(oversample·max_rows·BUCKETS
    / n_g))``, so the window sees ~oversample·max_rows rows per group
    (never fewer than a full bucket stripe) instead of the whole
    group. The survivors are a prefix of the SAME (bucket, id) order
    the plain form ranks by, so as long as the stripe holds ≥max_rows
    rows — expectation oversample·max_rows; a whole bucket stripe at
    minimum — the output is IDENTICAL row-for-row (pinned in pytest;
    the SQL twin replicates the prefilter with the same integer
    arithmetic, so the oracle is exact even in a pathological
    under-fill). Cost: one extra aggregate pass over (group) — the
    right trade when any group can exceed executor memory.
    """
    if max_rows <= 0:
        raise ValueError("max_rows must be positive")
    from pyspark.sql import Window

    bucket = sample_bucket_expr(id_col, salt)
    if skew_safe:
        # integer ceil via DIV — identical arithmetic on both engines
        # (no float division anywhere near the threshold)
        want = int(oversample) * int(max_rows) * SAMPLE_BUCKETS
        # the counts pass doubles as the NULL-id nondeterminism detector
        # (see the CAVEAT below): a per-group NULL-id count rides along
        # for free in the same map-side-combining aggregate, and a group
        # whose NULL-id rows exceed max_rows raises LOUDLY instead of
        # silently returning an engine/partitioning-dependent subset of
        # fully-tied rows. One comparison per GROUP, not per row.
        thr = F.expr(
            f"least(CAST({SAMPLE_BUCKETS} AS BIGINT), "
            f"CAST(({want} + __ng - 1) DIV __ng AS BIGINT))"
        )
        counts = (
            df.groupBy(group_col)
            .agg(
                F.count(F.lit(1)).alias("__ng"),
                F.sum(F.col(id_col).isNull().cast("long")).alias("__nnull"),
            )
            .withColumn(
                "__thr",
                F.when(
                    F.col("__nnull") > max_rows,
                    F.raise_error(
                        F.concat(
                            F.lit(
                                "cap_per_group(skew_safe): a group holds "
                            ),
                            F.col("__nnull").cast("string"),
                            F.lit(
                                f" NULL-{id_col} rows > max_rows={max_rows}"
                                " — these tie completely on the (bucket, id)"
                                " sort key, so the kept subset would be"
                                " engine/partitioning-dependent; supply a"
                                " non-null id or a deterministic tiebreaker"
                            ),
                        )
                    ).cast("bigint"),
                ).otherwise(thr),
            )
            .select(F.col(group_col).alias("__capg"), "__thr")
        )
        # join NULL-SAFE (the plain window treats a NULL group as a
        # normal partition and caps it; a plain equi-join would drop
        # every NULL-group row and break the row-for-row identity) and
        # UNHINTED (repo convention: broadcast only provably bounded
        # sides) — |groups| is the domain count, which a crawl corpus
        # does NOT bound; AQE broadcasts the threshold table when it
        # is actually small and shuffles on the group key otherwise,
        # co-partitioned with the ranking window below
        # NULL-tolerant prefilter: a NULL id hashes to a NULL bucket,
        # and `bucket < __thr` alone would drop the row here while the
        # plain form's window ranks it (NULLS FIRST) — breaking the
        # documented row-for-row identity between the two forms on a
        # nullable id. NULL-id rows always survive the prefilter and
        # rank first in the window. CAVEAT: NULL-id rows tie completely
        # on the (bucket, id) sort key, so when ONE group holds more
        # NULL-id rows than max_rows the kept subset among them is
        # engine/partitioning-dependent — determinism (and the twin's
        # row-for-row identity) holds only while NULL ids per group
        # stay ≤ max_rows, which any id-bearing corpus satisfies. The
        # skew_safe counts pass DETECTS the violation at runtime and
        # raises (see the counts aggregate above); the plain form keeps
        # the documented caveat without a detection pass.
        df = (
            df.join(
                counts, F.col(group_col).eqNullSafe(F.col("__capg"))
            )
            .filter((bucket < F.col("__thr")) | F.col(id_col).isNull())
            .drop("__capg", "__thr")
        )
    # explicit NULLS FIRST (Spark's asc default, DuckDB's is NULLS
    # LAST) so both engines rank NULL-bucket rows identically
    w = Window.partitionBy(group_col).orderBy(
        bucket.asc_nulls_first(), F.col(id_col).asc_nulls_first()
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= max_rows)
        .drop("__rn")
    )


def cap_per_group_sql(
    table: str,
    id_col: str,
    group_col: str,
    max_rows: int,
    salt: str = "cap0",
    skew_safe: bool = False,
    oversample: int = 4,
) -> str:
    """DuckDB twin of :func:`cap_per_group` — with ``skew_safe`` it
    replicates the prefilter with the same integer arithmetic, so the
    two engines agree even if a stripe under-fills."""
    bucket = sample_bucket_sql(id_col, salt)
    src = table
    if skew_safe:
        want = int(oversample) * int(max_rows) * SAMPLE_BUCKETS
        src = f"""(
          SELECT t.* FROM {table} t
          JOIN (
            SELECT {group_col} AS __capg,
                   least({SAMPLE_BUCKETS}::BIGINT,
                         ({want} + COUNT(*) - 1) // COUNT(*)) AS __thr
            FROM {table} GROUP BY {group_col}
          ) c ON t.{group_col} IS NOT DISTINCT FROM c.__capg
          WHERE {bucket} < c.__thr OR t.{id_col} IS NULL
        ) __pref"""
    return f"""
    SELECT * EXCLUDE (__rn) FROM (
      SELECT *, row_number() OVER (
        PARTITION BY {group_col}
        ORDER BY {bucket} NULLS FIRST, {id_col} NULLS FIRST
      ) AS __rn
      FROM {src}
    ) WHERE __rn <= {max_rows}
    """


def weighted_sample(
    df: DataFrame, id_col: str, weight, salt: str = "w0"
) -> DataFrame:
    """Importance sampling: keep each row with probability equal to its
    own weight (clamped to [0, 1]) — quality-weighted corpus
    subsetting, domain up/down-weighting, curriculum mixes.

    Same machinery as every sampler here: the row's fate is a pure
    function of (salt, id) via the content-stable md5 bucket, so the
    decision is reproducible across sessions/partitionings/appends and
    is one map-side comparison (``bucket < w·10000``) — no shuffle, no
    RNG state. The weight may be any deterministic expression (a
    quality score, a per-domain factor); the comparison stays in
    doubles on both engines (no integer cast whose rounding mode
    differs between them).
    """
    w = weight if isinstance(weight, Column) else F.col(weight)
    wc = F.least(F.lit(1.0), F.greatest(F.lit(0.0), w.cast("double")))
    return df.filter(
        sample_bucket_expr(id_col, salt).cast("double")
        < wc * F.lit(float(SAMPLE_BUCKETS))
    )


def weighted_sample_sql(
    table: str, id_col: str, weight_sql: str, salt: str = "w0"
) -> str:
    """DuckDB twin of :func:`weighted_sample`."""
    w = f"LEAST(1.0, GREATEST(0.0, ({weight_sql})::DOUBLE))"
    return (
        f"SELECT * FROM {table} WHERE "
        f"({sample_bucket_sql(id_col, salt)})::DOUBLE < {w} * {SAMPLE_BUCKETS}.0"
    )
