"""Aggregation operators — the reference's analytics hot path.

Reference parity map:
- D1 time-bucket aggregation over VARCHAR columns (strptime + TRY_CAST +
  AVG/MAX/MIN, data/query.py:984-1017)            → :func:`time_bucket_agg`
  with ``compact_strings=True``
- D2 typed variant + COUNT(*) point_count
  (data/query_core.py:198-263)                    → :func:`time_bucket_agg`
- D3/D4 MAX(time_col) watermark extraction
  (database/sync_engine.py:213-218)               → :func:`max_timestamp`
- D5 conditional aggregates SUM/AVG(CASE WHEN)
  (repository/sync_log_repo.py:236-278)           → :func:`conditional_rollup`
- D6 column summary stats (ui/visualization.py:365-368) → :func:`summary_stats`

Scale notes: ``groupBy(bucket)`` compiles to partial (map-side) +
final hash aggregation — the shuffle moves one row per (bucket ×
partition), not raw data. Bucket arithmetic is a codegen expression, so
the scan → partial-agg pipeline is one WholeStageCodegen span. At 100 TB
the number of distinct buckets (time-range / interval) is what sizes the
shuffle, which is tiny for dashboard-style intervals.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType, StringType

from ..functions.timefn import parse_compact_timestamp, time_bucket


def limb_sum(q: Column) -> Column:
    """Exact order-proof sum of a LONG column entirely in whole-stage
    codegen: split each value into three 21/21/22-bit limbs, sum each
    limb as a primitive long, recombine to DECIMAL(38,0) ONCE per
    group. This is the ``moments='long'`` kernel of
    :func:`pearson_by_group` factored out for plain sums — it replaces
    a per-row double→DECIMAL cast + object-path decimal aggregation
    (a measured 12.9× constant factor on scan-agg shapes) with three
    primitive long aggregates.

    Exactness: ``q = (q>>42)·2^42 + ((q>>21)&m)·2^21 + (q&m)`` holds
    for every two's-complement long (arithmetic shift + unsigned
    mask), negatives included, and each limb partial stays below
    n·2^22 — no wrap below ~2^41 rows per group. The recombined
    decimal equals the exact integer sum, bit-identically to a
    DECIMAL(38,0) accumulation. NULL semantics match ``SUM`` (nulls
    skipped; all-null group → NULL, since every limb is null exactly
    when ``q`` is).

    Must be used INSIDE an ``agg(...)`` / aggregate select, like any
    composed aggregate expression."""
    mask = F.lit((1 << 21) - 1).cast("long")
    dec = "decimal(38,0)"
    l0 = F.sum(q.bitwiseAND(mask)).cast(dec)
    l1 = F.sum(F.shiftright(q, 21).bitwiseAND(mask)).cast(dec)
    l2 = F.sum(F.shiftright(q, 42)).cast(dec)
    return l2 * F.lit(1 << 42).cast(dec) + l1 * F.lit(1 << 21).cast(dec) + l0


def numeric_columns(df: DataFrame, exclude: Sequence[str] = ()) -> list[str]:
    """Columns with native numeric types (dtype-detection path,
    application/query_service.py:260-279)."""
    return [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, NumericType) and f.name not in exclude
    ]


def _value_expr(df: DataFrame, col: str) -> Column:
    """Value column as DOUBLE; string columns go through TRY_CAST (null on
    unparseable — G2 VARCHAR-payload parity), typed columns plain-cast."""
    if isinstance(df.schema[col].dataType, StringType):
        return F.col(col).try_cast("double")
    return F.col(col).cast("double")


def time_bucket_agg(
    df: DataFrame,
    time_col: str,
    interval: str,
    value_cols: Sequence[str] | None = None,
    compact_strings: bool | None = None,
    include_count: bool = True,
    exact_decimals: int | None = None,
) -> DataFrame:
    """The flagship query: tumbling time-bucket AVG/MIN/MAX(/COUNT).

    Output schema: ``time_bucket`` (TimestampType bucket start) plus, per
    value column ``c``: ``c_avg, c_max, c_min`` (aliasing parity with
    data/query.py:996-1001) and, when ``include_count``, ``point_count``
    (data/query_core.py:225).

    The Oracle-VARCHAR2 shape (D1) is handled per column: a string time
    column is parsed via :func:`parse_compact_timestamp` (14-digit
    ``strptime`` parity), string value columns go through TRY_CAST —
    ``compact_strings`` overrides the time-column auto-detection only.

    ``exact_decimals=d`` declares the values carry ≤ d decimal digits
    (sensor/currency data): averages are then computed entirely in
    integer arithmetic — quantize to 10^d, exact integer sum, one
    half-up integer division to 6 dp — making the result bit-identical
    on every engine and partition order. The float path's final
    ``ROUND(avg, 6)`` is engine-dependent when the true average lands
    exactly on a .5 boundary (Spark rounds the binary double via
    BigDecimal; DuckDB rounds the 1e6-scaled double), which is why the
    differential oracle uses this mode.
    """
    if compact_strings is None:
        compact_strings = isinstance(df.schema[time_col].dataType, StringType)
    ts = parse_compact_timestamp(F.col(time_col)) if compact_strings else F.col(time_col)
    bucket = time_bucket(ts, interval).alias("time_bucket")

    cols = list(value_cols) if value_cols is not None else numeric_columns(df, exclude=[time_col])
    aggs: list[Column] = []
    post: list[tuple[str, Column]] = []
    if include_count:
        aggs.append(F.count(F.lit(1)).alias("point_count"))
    for c in cols:
        v = _value_expr(df, c)
        if exact_decimals is None:
            aggs.append(F.avg(v).alias(f"{c}_avg"))
        else:
            q = F.round(v * (10 ** exact_decimals), 0).cast("long")
            aggs.append(F.sum(q).alias(f"__S_{c}"))
            aggs.append(F.count(v).alias(f"__n_{c}"))
            scale = 10 ** (6 - exact_decimals)
            # round_half_up(S·scale / n) = (2·S·scale + n) div (2·n) for
            # S ≥ 0; DECIMAL(38,0) so billion-row buckets can't overflow
            # a long (DuckDB's HUGEINT promotion, mirrored)
            micro = F.expr(
                f"CASE WHEN `__n_{c}` = 0 THEN NULL ELSE "
                f"(2 * CAST(`__S_{c}` AS DECIMAL(38,0)) * {scale} + `__n_{c}`)"
                f" DIV (2 * `__n_{c}`) END"
            )
            post.append((f"{c}_avg", (micro / F.lit(1_000_000.0)).alias(f"{c}_avg")))
        aggs += [
            F.max(v).alias(f"{c}_max"),
            F.min(v).alias(f"{c}_min"),
        ]
    if not aggs:
        aggs = [F.count(F.lit(1)).alias("point_count")]
    out = df.groupBy(bucket).agg(*aggs)
    if post:
        keep = ["time_bucket"] + (["point_count"] if include_count else [])
        final_cols = [F.col(k) for k in keep]
        for c in cols:
            pair = dict(post)
            if f"{c}_avg" in pair:
                final_cols.append(pair[f"{c}_avg"])
            final_cols += [F.col(f"{c}_max"), F.col(f"{c}_min")]
        out = out.select(*final_cols)
    return out.orderBy("time_bucket")


def max_timestamp(df: DataFrame, time_col: str):
    """``SELECT MAX(time_col)`` → python value (next watermark; D3).

    Single-row aggregate: partial max per partition, one tiny shuffle.
    """
    row = df.agg(F.max(F.col(time_col)).alias("m")).first()
    return None if row is None else row["m"]


def conditional_rollup(
    df: DataFrame,
    status_col: str = "status",
    value_col: str = "total_rows",
    statuses: Sequence[str] = ("completed", "failed", "running"),
    where: dict | None = None,
) -> DataFrame:
    """Sync-log statistics rollup (D5, repository/sync_log_repo.py:236-278).

    ``COUNT(*)``, per-status ``SUM(CASE WHEN status=s THEN 1 ELSE 0 END)``,
    plus AVG/SUM of ``value_col`` restricted to the first status
    ('completed' in the reference). Optional equality filter (the
    reference's ``WHERE table_name = ?``).
    """
    out = df
    if where:
        for k, v in where.items():
            out = out.filter(F.col(k) == F.lit(v))
    aggs = [F.count(F.lit(1)).alias("total_count")]
    for s in statuses:
        aggs.append(
            F.sum(F.when(F.col(status_col) == s, 1).otherwise(0)).alias(f"{s}_count")
        )
    ok = statuses[0]
    aggs += [
        F.avg(F.when(F.col(status_col) == ok, F.col(value_col))).alias(f"avg_{value_col}"),
        F.sum(F.when(F.col(status_col) == ok, F.col(value_col))).alias(f"sum_{value_col}"),
    ]
    return out.agg(*aggs)


def summary_stats(df: DataFrame, column: str) -> DataFrame:
    """min/max/mean/stddev of one numeric column (D6)."""
    c = F.col(column).cast("double")
    return df.agg(
        F.min(c).alias("min_value"),
        F.max(c).alias("max_value"),
        F.mean(c).alias("mean_value"),
        F.stddev(c).alias("std_value"),  # sample stddev, pandas .std() parity
    )


def group_count(df: DataFrame, *keys: str) -> DataFrame:
    """``GROUP BY keys → COUNT(*)`` helper (catalog stats, UI listings)."""
    return df.groupBy(*[F.col(k) for k in keys]).agg(F.count(F.lit(1)).alias("cnt"))


def profile_columns(
    df: DataFrame, columns: Sequence[str] | None = None, approx: bool = False
) -> DataFrame:
    """Column profile (data-quality sweep): one output row per column
    with row/null/distinct counts — long format, ready for dashboards.

    Single scan: all measures are one aggregate; the per-column results
    unpivot via ``stack``. With ``approx=True`` distinct counts use
    HyperLogLog++ — the 100 TB path (exact multi-column distincts expand
    the input once per column before the shuffle; the sketch variant
    keeps one pass, mergeable, no expand).
    """
    cols = list(columns) if columns else df.columns
    nd = (
        (lambda c: F.approx_count_distinct(c)) if approx else
        (lambda c: F.countDistinct(F.col(c)))
    )
    aggs: list[Column] = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.sum(F.isnull(F.col(c)).cast("long")).alias(f"__null_{c}"))
        aggs.append(nd(c).alias(f"__nd_{c}"))
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', `__null_{c}`, `__nd_{c}`" for c in cols
    )
    return one.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS (column_name, n_null, n_distinct)"
        ),
        F.col("__n").alias("n_rows"),
    ).select("column_name", "n_rows", "n_null", "n_distinct")


def profile_columns_sql(table: str, columns: Sequence[str]) -> str:
    """DuckDB twin: same single-aggregate + unpivot shape."""
    per = []
    for c in columns:
        per.append(
            f"SELECT '{c}' AS column_name, COUNT(*) AS n_rows, "
            f"CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)"
            f" AS n_null, "
            f"COUNT(DISTINCT {c}) AS n_distinct FROM {table}"
        )
    return " UNION ALL ".join(per)


def pearson_by_group(
    df: DataFrame,
    group_col: str,
    x_col,
    y_col,
    x_decimals: int = 2,
    y_decimals: int = 0,
    moments: str = "decimal",
) -> DataFrame:
    """Per-group Pearson correlation + population covariance computed
    from EXACT integer moments — the engine-proof form of ``corr()``.

    Native ``corr``/``covar_pop`` accumulate floating-point moments
    whose summation order differs per engine (and per partitioning!),
    so their last ulps are not reproducible. Here x and y quantize to
    integers (``x_decimals``/``y_decimals`` fixed-point digits), the
    five moments (Σx, Σy, Σx², Σy², Σxy) accumulate exactly
    (order-independent, partial+final aggregated) and the classic
    rearrangement

        r = (n·Σxy − Σx·Σy) / (√(n·Σx² − Σx²ᵗᵒᵗ) · √(n·Σy² − Σy²ᵗᵒᵗ))

    performs exactly three double conversions, two IEEE sqrts and one
    division on identical integers in every engine. Rows with a null
    in either column are excluded (SQL corr semantics). Zero variance
    on either side yields NULL. Covariance is rescaled back to input
    units by the fixed quantization factor.

    ``moments`` picks the accumulation representation:

    * ``"decimal"`` (default, unbounded-safe): per-row products and
      sums run in DECIMAL(38,0). Correct for any long-ranged input
      but each row pays a JVM BigDecimal add — at scale this is an
      order of magnitude slower than a primitive long sum.
    * ``"long"`` (fast path, bounded inputs): requires
      ``|quantized x| and |quantized y| ≤ ~3.03e9`` (so every per-row
      product fits int64). Each moment term is limb-split per row
      into three 21-bit longs (``p & m``, ``(p>>21) & m``, ``p>>42``
      — arithmetic shift keeps the sign limb exact for negative
      cross-products), summed as primitive longs inside whole-stage
      codegen, and recombined into the identical DECIMAL(38,0)
      moment only at the per-group final step. Limb sums stay inside
      int64 up to ~4e12 rows PER GROUP — past 100 TB-scale group
      cardinality. Same bits out as "decimal", ~10× cheaper per row.

    Output: group, n, corr, cov_pop.
    """
    if moments not in ("decimal", "long"):
        raise ValueError(f"moments must be 'decimal' or 'long': {moments!r}")
    x = x_col if not isinstance(x_col, str) else F.col(x_col)
    y = y_col if not isinstance(y_col, str) else F.col(y_col)
    dec = "decimal(38,0)"
    # staged selects keep each expensive expression (the caller's
    # x/y — often a JSON extraction — then the quantization, then
    # the products) a single named attribute: without the staging
    # the client-built Column trees repeat the extraction ~13× in
    # the plan, which balloons codegen (2.6 s Janino compile per
    # cold run at sf1) even though runtime CSE dedups it. Catalyst
    # does NOT collapse these projections back together because
    # each producer is non-cheap and multiply-referenced
    # (CollapseProject.canCollapseExpressions).
    raw = df.select(F.col(group_col), x.alias("__x"), y.alias("__y"))
    xa, ya = F.col("__x"), F.col("__y")
    both_a = xa.isNotNull() & ya.isNotNull()
    quant_cols = [
        F.col(group_col),
        both_a.cast("long").alias("__b"),
        F.when(both_a, F.round(xa * (10 ** x_decimals), 0).cast("long")).alias(
            "__qx"
        ),
        F.when(both_a, F.round(ya * (10 ** y_decimals), 0).cast("long")).alias(
            "__qy"
        ),
    ]
    if moments == "long":
        # non-finite inputs defeat the post-quantization __qmax guard
        # below: under non-ANSI Spark -Infinity casts to Long.MIN_VALUE,
        # whose abs() WRAPS and stays negative (so __qmax never trips),
        # and NaN casts to 0 on both sides — either way the limb sums
        # would produce a plausible-looking wrong correlation. Detect on
        # the PRE-quantization double (primitive isnan/compare per row,
        # stays in whole-stage codegen) and raise at the final select.
        xd, yd = xa.cast("double"), ya.cast("double")
        inf = F.lit(float("inf"))
        nonfinite = (
            F.isnan(xd) | F.isnan(yd) | (F.abs(xd) == inf) | (F.abs(yd) == inf)
        )
        quant_cols.append(
            (both_a & nonfinite).cast("long").alias("__nf")
        )
    quant = raw.select(*quant_cols)
    qxa, qya = F.col("__qx"), F.col("__qy")
    if moments == "decimal":
        # products in DECIMAL, not LONG: a long*long product wraps
        # silently past ~3e9·10^decimals under non-ANSI Spark;
        # decimal(19,0) holds any long exactly and the product
        # promotes to decimal(38,0). qxa/qya are attributes, so their
        # repetition below is free.
        qxd = qxa.cast("decimal(19,0)")
        qyd = qya.cast("decimal(19,0)")
        agg = quant.groupBy(F.col(group_col)).agg(
            F.sum("__b").cast(dec).alias("__n"),
            F.sum(qxa.cast(dec)).alias("__sx"),
            F.sum(qya.cast(dec)).alias("__sy"),
            F.sum((qxd * qxd).cast(dec)).alias("__sxx"),
            F.sum((qyd * qyd).cast(dec)).alias("__syy"),
            F.sum((qxd * qyd).cast(dec)).alias("__sxy"),
        )
    else:
        prods = quant.select(
            F.col(group_col),
            F.col("__b"),
            F.col("__nf"),
            qxa,
            qya,
            (qxa * qxa).alias("__pxx"),
            (qya * qya).alias("__pyy"),
            (qxa * qya).alias("__pxy"),
        )
        mask = F.lit((1 << 21) - 1).cast("long")
        terms = {
            "sx": "__qx",
            "sy": "__qy",
            "sxx": "__pxx",
            "syy": "__pyy",
            "sxy": "__pxy",
        }
        limb_aggs: list[Column] = [
            F.sum("__b").cast(dec).alias("__n"),
            # runtime guards for the documented precondition. Under ANSI
            # mode (the Spark 4 default) the per-row qx*qx / qx*qy
            # products above already throw ArithmeticException during
            # aggregation, BEFORE the final-select raise_error could
            # evaluate — ANSI fails loudly on its own, just with a less
            # specific message. These guards are the NON-ANSI backstop,
            # where the products would otherwise wrap silently and
            # return a plausible-looking wrong correlation: __qmax
            # catches finite overflow, __qnf catches NaN/Infinity (which
            # quantize to 0 / Long.MIN_VALUE and dodge __qmax — see the
            # __nf comment above). Both ride along as codegen-cheap
            # long aggregates.
            F.max(F.greatest(F.abs(qxa), F.abs(qya))).alias("__qmax"),
            # __qmin closes the abs() wrap hole (ADVICE r13): a FINITE
            # input whose quantized value saturates to exactly
            # Long.MIN_VALUE (round(x*10^d) <= -2^63, e.g. x = -1e30
            # under non-ANSI) passes the __nf NaN/Inf check, and
            # abs(Long.MIN_VALUE) wraps NEGATIVE so __qmax never trips.
            # min() involves no abs, so Long.MIN_VALUE — and every other
            # below-bound negative — is caught by the __qmin branch.
            F.min(F.least(qxa, qya)).alias("__qmin"),
            F.sum("__nf").alias("__qnf"),
        ]
        for name, cname in terms.items():
            p = F.col(cname)
            limb_aggs.append(F.sum(p.bitwiseAND(mask)).alias(f"__{name}0"))
            limb_aggs.append(
                F.sum(F.shiftright(p, 21).bitwiseAND(mask)).alias(f"__{name}1")
            )
            limb_aggs.append(F.sum(F.shiftright(p, 42)).alias(f"__{name}2"))
        limbed = prods.groupBy(F.col(group_col)).agg(*limb_aggs)
        # exact recombination — decimal arithmetic on ONE row per
        # group, never per input row
        two21 = F.lit(1 << 21).cast(dec)
        two42 = F.lit(1 << 42).cast(dec)
        # floor(sqrt(2^63 - 1)): the largest |q| whose square fits int64
        q_limit = 3_037_000_499
        n_guarded = (
            F.when(
                F.col("__qnf") > 0,
                F.raise_error(
                    F.concat(
                        F.lit(
                            "pearson_by_group(moments='long') saw non-finite "
                            "x/y input (NaN or Infinity) — these quantize to "
                            "0 / Long.MIN_VALUE and would corrupt the moments "
                            "silently; filter non-finite rows upstream — "
                            "rows seen: "
                        ),
                        F.col("__qnf").cast("string"),
                    )
                ).cast(dec),
            )
            .when(
                (F.col("__qmax") > q_limit) | (F.col("__qmin") < -q_limit),
                F.raise_error(
                    F.concat(
                        F.lit(
                            "pearson_by_group(moments='long') input exceeds "
                            f"the int64 product bound (|quantized| > {q_limit}"
                            "); use moments='decimal' — max/min seen: "
                        ),
                        F.col("__qmax").cast("string"),
                        F.lit("/"),
                        F.col("__qmin").cast("string"),
                    )
                ).cast(dec),
            )
            .otherwise(F.col("__n"))
        )
        agg = limbed.select(
            F.col(group_col),
            n_guarded.alias("__n"),
            *[
                (
                    F.col(f"__{name}2").cast(dec) * two42
                    + F.col(f"__{name}1").cast(dec) * two21
                    + F.col(f"__{name}0").cast(dec)
                ).alias(f"__{name}")
                for name in terms
            ],
        )
    num = (F.col("__n") * F.col("__sxy") - F.col("__sx") * F.col("__sy")).cast(
        "double"
    )
    vx = (F.col("__n") * F.col("__sxx") - F.col("__sx") * F.col("__sx")).cast(
        "double"
    )
    vy = (F.col("__n") * F.col("__syy") - F.col("__sy") * F.col("__sy")).cast(
        "double"
    )
    n_d = F.col("__n").cast("double")
    scale = float(10 ** (x_decimals + y_decimals))
    return agg.select(
        group_col,
        F.col("__n").cast("long").alias("n"),
        F.when(
            (vx > 0) & (vy > 0), num / (F.sqrt(vx) * F.sqrt(vy))
        ).alias("corr"),
        F.when(F.col("__n") > 0, num / (n_d * n_d * F.lit(scale))).alias(
            "cov_pop"
        ),
    )


def pearson_by_group_sql(
    table: str,
    group_col: str,
    x_sql: str,
    y_sql: str,
    x_decimals: int = 2,
    y_decimals: int = 0,
) -> str:
    """DuckDB twin of :func:`pearson_by_group` (identical integer
    moments — HUGEINT accumulation is exact at these magnitudes — and
    the same three double conversions)."""
    qx = (
        f"CASE WHEN ({x_sql}) IS NOT NULL AND ({y_sql}) IS NOT NULL "
        f"THEN CAST(round(({x_sql}) * {10 ** x_decimals}) AS BIGINT) END"
    )
    qy = (
        f"CASE WHEN ({x_sql}) IS NOT NULL AND ({y_sql}) IS NOT NULL "
        f"THEN CAST(round(({y_sql}) * {10 ** y_decimals}) AS BIGINT) END"
    )
    scale = float(10 ** (x_decimals + y_decimals))
    return f"""
    WITH q AS (SELECT {group_col} AS g, {qx} AS qx, {qy} AS qy FROM {table}),
    m AS (
      SELECT g,
             COUNT(qx)::HUGEINT AS n,
             COALESCE(SUM(qx), 0)::HUGEINT AS sx,
             COALESCE(SUM(qy), 0)::HUGEINT AS sy,
             COALESCE(SUM(qx::HUGEINT * qx), 0)::HUGEINT AS sxx,
             COALESCE(SUM(qy::HUGEINT * qy), 0)::HUGEINT AS syy,
             COALESCE(SUM(qx::HUGEINT * qy), 0)::HUGEINT AS sxy
      FROM q GROUP BY g
    )
    SELECT g AS {group_col},
           n::BIGINT AS n,
           CASE WHEN (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0 THEN
             (n * sxy - sx * sy)::DOUBLE
             / (sqrt((n * sxx - sx * sx)::DOUBLE) * sqrt((n * syy - sy * sy)::DOUBLE))
           END AS corr,
           CASE WHEN n > 0 THEN
             (n * sxy - sx * sy)::DOUBLE / (n::DOUBLE * n::DOUBLE * {scale})
           END AS cov_pop
    FROM m
    """
