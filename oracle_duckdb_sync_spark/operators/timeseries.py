"""Time-series operators beyond the reference's time-bucket aggregate:
gap-based sessionization, as-of (nearest-earlier) joins, and per-group
top-k — the standard event-analytics suite.

The reference's only temporal operator family is the tumbling
time-bucket aggregate (`data/query.py:984-1017`); these close the gap to
a full event-analytics engine while keeping every plan
shuffle-minimal:

- sessionize: ONE shuffle (hash by entity key); gap detection and
  session numbering are window functions inside the partition.
- asof_join: the union-merge formulation — ONE shuffle of the tagged
  union by entity key, then a running `last(ignorenulls)` window. No
  range-explosion (the naive `l.ts >= r.ts` theta-join is quadratic),
  no per-row binary search; at 100 TB this is the plan you'd hand-write
  with `mapPartitions`, but expressed declaratively.
- top_k_per_group: `row_number` over a per-group window, filter ≤ k.
  One shuffle; with k small the per-partition heap dominates and output
  is tiny.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_seconds: int,
    order_tiebreaker: str | None = None,
) -> DataFrame:
    """Assign gap-based session ids: a new session starts when the time
    since the entity's previous event exceeds ``gap_seconds``.

    Returns the input rows plus ``session_idx`` (0-based per entity).
    Deterministic given a unique ``order_tiebreaker`` for equal
    timestamps.
    """
    order = [F.col(ts_col)] + (
        [F.col(order_tiebreaker)] if order_tiebreaker else []
    )
    w = Window.partitionBy(key_col).orderBy(*order)
    us = F.unix_micros(F.col(ts_col))
    prev_us = F.lag(us).over(w)
    new_session = (
        F.when(prev_us.isNull(), 1)
        .when(us - prev_us > gap_seconds * 1_000_000, 1)
        .otherwise(0)
    )
    run = Window.partitionBy(key_col).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn("session_idx", F.sum(new_session).over(run) - 1)


def session_stats(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_seconds: int,
    order_tiebreaker: str | None = None,
) -> DataFrame:
    """One row per session: start/end epoch-µs, event count, duration."""
    s = sessionize(df, key_col, ts_col, gap_seconds, order_tiebreaker)
    us = F.unix_micros(F.col(ts_col))
    return (
        s.groupBy(key_col, "session_idx")
        .agg(
            F.min(us).alias("start_us"),
            F.max(us).alias("end_us"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .withColumn(
            "duration_s",
            F.round((F.col("end_us") - F.col("start_us")) / 1_000_000.0, 6),
        )
    )


def session_stats_sql(
    table: str,
    key_col: str,
    ts_col: str,
    gap_seconds: int,
    order_tiebreaker: str | None = None,
) -> str:
    """DuckDB twin (same window-function construction)."""
    tb = f", {order_tiebreaker} AS tb" if order_tiebreaker else ""
    order = f"{ts_col}" + (f", {order_tiebreaker}" if order_tiebreaker else "")
    norder = "us" + (", tb" if order_tiebreaker else "")
    return f"""
    WITH flagged AS (
        SELECT {key_col}, epoch_us({ts_col}) AS us{tb},
               CASE WHEN lag(epoch_us({ts_col})) OVER w IS NULL THEN 1
                    WHEN epoch_us({ts_col}) - lag(epoch_us({ts_col})) OVER w
                         > {gap_seconds} * 1000000 THEN 1
                    ELSE 0 END AS new_session
        FROM {table}
        WINDOW w AS (PARTITION BY {key_col} ORDER BY {order})
    ),
    numbered AS (
        SELECT {key_col}, us,
               CAST(SUM(new_session) OVER (PARTITION BY {key_col} ORDER BY {norder}
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1
                   AS BIGINT) AS session_idx
        FROM flagged
    )
    SELECT {key_col}, session_idx,
           MIN(us) AS start_us, MAX(us) AS end_us,
           COUNT(*) AS n_events,
           ROUND((MAX(us) - MIN(us)) / 1000000.0, 6) AS duration_s
    FROM numbered GROUP BY {key_col}, session_idx
    """


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    ts_col: str,
    value_cols: Sequence[str],
    suffix: str = "_asof",
) -> DataFrame:
    """As-of LEFT join: each left row picks the right row with the
    greatest ``ts`` ≤ its own (per key); no match → NULLs.

    Union-merge formulation: tag sides, union, one shuffle by key, then
    a running ``last(value, ignorenulls=True)`` ordered by
    (ts, side) — side 0 (right) sorts before side 1 (left) at equal
    timestamps, giving the inclusive ``>=`` bound. Right rows must be
    unique per (key, ts) (pre-aggregate if not) — the same contract
    DuckDB's native ASOF JOIN assumes.
    """
    lcols = left.columns
    r = right.select(
        F.col(key_col),
        F.col(ts_col),
        *[F.col(c).alias(c + suffix) for c in value_cols],
    ).withColumn("__side", F.lit(0))
    l = left.withColumn("__side", F.lit(1))
    u = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for c in value_cols:
        u = u.withColumn(c + suffix, F.last(c + suffix, ignorenulls=True).over(w))
    return u.filter(F.col("__side") == 1).select(
        *lcols, *[c + suffix for c in value_cols]
    )


def top_k_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_col: str,
    k: int,
    descending: bool = True,
    tiebreaker: str | None = None,
) -> DataFrame:
    """Top-k rows per group by ``order_col`` (deterministic with a
    unique tiebreaker), with the rank attached."""
    direction = F.col(order_col).desc() if descending else F.col(order_col).asc()
    order: list[Column] = [direction]
    if tiebreaker:
        order.append(F.col(tiebreaker))
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return (
        df.withColumn("rank_in_group", F.row_number().over(w))
        .filter(F.col("rank_in_group") <= k)
    )


def funnel_counts(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: Sequence[str],
) -> DataFrame:
    """Ordered funnel analysis: how many users reached each step IN
    ORDER (step k strictly after their earliest completion of step
    k-1). The standard conversion query (signup → click → purchase).

    Returns (step_idx, step, users), one row per step. Scale shape:
    one filtered aggregate per step plus an equi-join per transition,
    ALL keyed on the user id — the same hash partitioning is reused
    across every stage (no re-shuffle between steps; AQE coalesces),
    and each stage's output is one row per qualifying user, shrinking
    monotonically down the funnel. Timestamps compare as epoch-micros
    BIGINTs so the strict 'after' is engine- and timezone-proof (the
    DuckDB twin's ``epoch_us`` truncates ns→µs identically).
    """
    us = F.unix_micros(F.col(ts_col))
    reached = [
        df.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(us).alias("__t"))
    ]
    for s in steps[1:]:
        prev = reached[-1].select(user_col, F.col("__t").alias("__tp"))
        reached.append(
            df.filter(F.col(type_col) == s)
            .join(prev, user_col)
            .filter(us > F.col("__tp"))
            .groupBy(user_col)
            .agg(F.min(us).alias("__t"))
        )
    out = None
    for i, (s, r) in enumerate(zip(steps, reached), start=1):
        row = r.agg(F.count(F.lit(1)).alias("users")).select(
            F.lit(i).cast("long").alias("step_idx"),
            F.lit(s).alias("step"),
            "users",
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("step_idx")


def funnel_counts_sql(
    table: str,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: Sequence[str],
) -> str:
    """DuckDB twin of :func:`funnel_counts` (same µs-truncated strict
    ordering)."""
    ctes = [
        # base CTE so `table` may be a bare name or an aliased subquery
        f"base AS (SELECT * FROM {table})",
        f"s1 AS (SELECT {user_col} AS u, MIN(epoch_us({ts_col})) AS t "
        f"FROM base WHERE {type_col} = '{steps[0]}' GROUP BY {user_col})",
    ]
    for i, s in enumerate(steps[1:], start=2):
        ctes.append(
            f"s{i} AS (SELECT e.{user_col} AS u, MIN(epoch_us(e.{ts_col})) AS t "
            f"FROM base e JOIN s{i - 1} p ON e.{user_col} = p.u "
            f"WHERE e.{type_col} = '{s}' AND epoch_us(e.{ts_col}) > p.t "
            f"GROUP BY e.{user_col})"
        )
    selects = " UNION ALL ".join(
        f"SELECT {i}::BIGINT AS step_idx, '{s}' AS step, "
        f"(SELECT COUNT(*) FROM s{i}) AS users"
        for i, s in enumerate(steps, start=1)
    )
    return f"WITH {', '.join(ctes)} {selects} ORDER BY step_idx"


def cohort_retention(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    bucket_seconds: int = 604800,
) -> DataFrame:
    """Cohort retention triangle: users grouped by first-activity bucket
    (default weekly), counted in each later bucket they were active —
    the standard product-analytics retention query.

    Returns (cohort_epoch, bucket_offset, users): epoch seconds of the
    cohort bucket start, buckets since the cohort bucket (0 = the
    cohort bucket itself), distinct active users. Buckets are pure
    epoch arithmetic (``floor(epoch_s / bucket_seconds)``) — timezone-
    proof on both engines. Scale shape: the per-user first-activity
    aggregate and the distinct (user, bucket) activity set share the
    user-keyed hash partitioning, the join between them is on that same
    key, and the final (cohort, offset) aggregate is tiny (buckets²/2
    rows). Events never shuffle more than once.
    """
    b = F.floor(F.unix_seconds(F.col(ts_col)) / F.lit(bucket_seconds)).cast("long")
    first = (
        df.select(F.col(user_col), b.alias("__b"))
        .groupBy(user_col)
        .agg(F.min("__b").alias("__cohort"))
    )
    active = df.select(F.col(user_col), b.alias("__b")).distinct()
    return (
        active.join(first, user_col)
        .groupBy(
            (F.col("__cohort") * bucket_seconds).alias("cohort_epoch"),
            (F.col("__b") - F.col("__cohort")).alias("bucket_offset"),
        )
        .agg(F.count(F.lit(1)).alias("users"))
        .orderBy("cohort_epoch", "bucket_offset")
    )


def cohort_retention_sql(
    table: str,
    user_col: str,
    ts_col: str,
    bucket_seconds: int = 604800,
) -> str:
    """DuckDB twin of :func:`cohort_retention` (identical epoch-bucket
    arithmetic)."""
    b = f"FLOOR(epoch({ts_col}) / {bucket_seconds})::BIGINT"
    return f"""
    WITH base AS (SELECT * FROM {table}),
    first AS (
      SELECT {user_col} AS u, MIN({b}) AS cohort
      FROM base GROUP BY {user_col}
    ),
    active AS (
      SELECT DISTINCT {user_col} AS u, {b} AS bk FROM base
    )
    SELECT (f.cohort * {bucket_seconds})::BIGINT AS cohort_epoch,
           (a.bk - f.cohort)::BIGINT AS bucket_offset,
           COUNT(*) AS users
    FROM active a JOIN first f ON a.u = f.u
    GROUP BY 1, 2 ORDER BY 1, 2
    """


def time_weighted_avg(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    tiebreaker: str,
    value_decimals: int = 2,
) -> DataFrame:
    """Per-key time-weighted average (TimescaleDB ``time_weight``-style,
    left-closed step interpolation): each observation holds until the
    next one, so irregular sampling doesn't bias toward chatty periods —
    the metric a sensor/price dashboard actually wants.

    TWA = Σ vᵢ·(tᵢ₊₁−tᵢ) / (t_last − t_first); the last point carries no
    weight (step function ends at the final observation). Keys with one
    observation → NULL. One window stage (lead over (ts, tiebreaker))
    and one aggregate, both on the key partitioning — a single shuffle.
    Engine-proof numerics: values quantize to ``10^value_decimals``
    integer units, durations are epoch-micros BIGINTs, and the
    value×duration products accumulate in DECIMAL(38,0) with ONE double
    division at the end.
    """
    us = F.unix_micros(F.col(ts_col))
    scale = 10**value_decimals
    q = F.round(F.col(value_col) * scale, 0).cast("long")
    # order by the truncated epoch-micros (+ unique tiebreaker), matching
    # the SQL twin exactly even when source timestamps carry sub-us bits
    w = Window.partitionBy(key_col).orderBy(F.col("__us"), F.col(tiebreaker))
    stepped = df.select(
        F.col(key_col), us.alias("__us"), q.alias("__q"), F.col(tiebreaker)
    ).withColumn("__next_us", F.lead("__us").over(w))
    weighted = stepped.filter(F.col("__next_us").isNotNull()).select(
        key_col,
        (F.col("__q") * (F.col("__next_us") - F.col("__us"))).cast(
            "decimal(38,0)"
        ).alias("__vw"),
        (F.col("__next_us") - F.col("__us")).cast("decimal(38,0)").alias("__w"),
    )
    return (
        weighted.groupBy(key_col)
        .agg(F.sum("__vw").alias("__svw"), F.sum("__w").alias("__sw"))
        .select(
            key_col,
            F.round(
                F.col("__svw").cast("double")
                / (F.col("__sw").cast("double") * scale),
                6,
            ).alias("twa"),
            F.col("__sw").cast("long").alias("span_us"),
        )
        .orderBy(key_col)
    )


def time_weighted_avg_sql(
    table: str,
    key_col: str,
    ts_col: str,
    value_col: str,
    tiebreaker: str,
    value_decimals: int = 2,
) -> str:
    """DuckDB twin of :func:`time_weighted_avg` (same quantization,
    lead window, and single final division)."""
    scale = 10**value_decimals
    return f"""
    WITH stepped AS (
      SELECT {key_col} AS k,
             epoch_us({ts_col}) AS us,
             ROUND({value_col} * {scale})::BIGINT AS q,
             lead(epoch_us({ts_col})) OVER (
               PARTITION BY {key_col} ORDER BY epoch_us({ts_col}), {tiebreaker}
             ) AS next_us
      FROM {table}
    )
    SELECT k AS {key_col},
           ROUND(SUM((q * (next_us - us))::DECIMAL(38,0))::DOUBLE
                 / (SUM((next_us - us)::DECIMAL(38,0))::DOUBLE * {scale}), 6)
             AS twa,
           SUM((next_us - us)::DECIMAL(38,0))::BIGINT AS span_us
    FROM stepped WHERE next_us IS NOT NULL
    GROUP BY k ORDER BY k
    """


def interval_join(
    left: DataFrame,
    intervals: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int,
) -> DataFrame:
    """Range (interval-containment) join: pair each ``left`` row with
    every interval whose ``[start, end)`` window contains its
    timestamp, matching on ``key_cols``. The missing Spark primitive
    behind "events during an incident window" / "readings during a
    maintenance period" queries — declared naively as
    ``l.ts >= r.start AND l.ts < r.end`` Spark plans a
    broadcast-nested-loop or Cartesian product, quadratic at scale.

    Bucketed formulation instead: time is chunked into
    ``bucket_seconds`` tumbling buckets; each interval explodes into
    the buckets it covers (≤ ``len/bucket + 1`` rows — pick the bucket
    near the typical interval length so this is 1–2), each left row
    computes its single bucket map-side, and the pair candidates come
    from a plain *equi*-join on (keys…, bucket) — hash-partitioned,
    AQE/skew-eligible, no theta-join anywhere. The exact containment
    predicate then filters candidates. Each (row, interval) pair
    arises from exactly one bucket (the row's own), so no dedup step
    is needed.

    At 100 TB: shuffle carries left once and intervals × coverage
    once; cost is candidates, not |left| × |intervals|.

    Columns from both sides are kept (pre-alias to avoid collisions);
    ``__bucket_us`` is dropped.
    """
    bs_us = bucket_seconds * 1_000_000
    lus = F.unix_micros(F.col(ts_col))
    l = left.withColumn("__bucket_us", lus - F.pmod(lus, F.lit(bs_us)))
    sus = F.unix_micros(F.col(start_col))
    eus = F.unix_micros(F.col(end_col))
    # buckets covered by [start, end): bucket(start) .. bucket(end - 1µs)
    r = (
        intervals.filter(eus > sus)
        .withColumn(
            "__bucket_us",
            F.explode(
                F.sequence(
                    sus - F.pmod(sus, F.lit(bs_us)),
                    (eus - 1) - F.pmod(eus - 1, F.lit(bs_us)),
                    F.lit(bs_us),
                )
            ),
        )
    )
    on = [*key_cols, "__bucket_us"]
    pairs = l.join(r, on=on, how="inner").filter(
        (F.unix_micros(F.col(ts_col)) >= F.unix_micros(F.col(start_col)))
        & (F.unix_micros(F.col(ts_col)) < F.unix_micros(F.col(end_col)))
    )
    return pairs.drop("__bucket_us")


def trailing_agg_chunked(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    window_seconds: int,
    chunk_seconds: int | None = None,
    value_decimals: int = 2,
) -> DataFrame:
    """Per-row trailing-window sum/count over event time — the scale
    engine behind a RANGE frame (``RANGE BETWEEN W PRECEDING AND
    CURRENT ROW``) when the partition key has FEW distinct values.

    The declarative window (`trailing_window_1h` entry) is correct but
    puts each key's entire history into one task — fine when the key is
    a device id (millions of partitions), catastrophic when it's a
    5-value category at 100 TB. This engine re-partitions time itself:

    - rows are assigned to tumbling *chunks* of ``chunk_seconds``
      (``>= window_seconds``, default = window);
    - each row within ``window_seconds`` of its chunk's end is ALSO
      copied into the next chunk (the carry-in — at most one copy,
      because the chunk is at least as long as the window);
    - the RANGE window then runs per (key, chunk): every row's trailing
      frame is fully contained in its own chunk plus the carried prefix,
      so results are exact, and parallelism is keys × chunks instead of
      keys;
    - carried copies compute but don't emit (their own chunk emits them).

    Output: ``key, ts`` (epoch micros as ``us``), ``value_col`` (exact
    integer units, ``q``), ``trail_sum_q``, ``trail_n``. Shuffle cost:
    input + carry fraction (``window/chunk`` of rows duplicated once).
    """
    if chunk_seconds is None:
        chunk_seconds = window_seconds
    if chunk_seconds < window_seconds:
        raise ValueError("chunk_seconds must be >= window_seconds")
    w_us = window_seconds * 1_000_000
    c_us = chunk_seconds * 1_000_000
    scale = 10**value_decimals
    us = F.unix_micros(F.col(ts_col))
    q = F.round(F.col(value_col) * scale, 0).cast("long")
    base = df.select(F.col(key_col), us.alias("us"), q.alias("q"))
    chunk = (F.col("us") - F.pmod(F.col("us"), F.lit(c_us))) / F.lit(c_us)
    native = base.select(
        key_col, "us", "q", chunk.cast("long").alias("__chunk"), F.lit(False).alias("__carry")
    )
    carried = (
        base.filter(F.pmod(F.col("us"), F.lit(c_us)) >= F.lit(c_us - w_us))
        .select(
            key_col,
            "us",
            "q",
            (chunk.cast("long") + 1).alias("__chunk"),
            F.lit(True).alias("__carry"),
        )
    )
    both = native.unionByName(carried)
    w = (
        Window.partitionBy(key_col, "__chunk")
        .orderBy("us")
        .rangeBetween(-w_us, 0)
    )
    out = both.select(
        key_col,
        "us",
        "q",
        "__carry",
        F.sum("q").over(w).cast("long").alias("trail_sum_q"),
        F.count("q").over(w).alias("trail_n"),
    )
    return out.filter(~F.col("__carry")).drop("__carry")
