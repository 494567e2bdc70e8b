"""Gap-filled time buckets and monotonic-counter/state aggregates —
the TimescaleDB continuous-analytics trio (``time_bucket_gapfill`` +
``locf``/``interpolate``, ``counter_agg``, ``state_agg``) the reference's
dashboard queries would reach for next after its tumbling time-bucket
aggregate (reference ``data/query_core.py:198-263`` is the plain-bucket
form; it has no gap-fill story, so sparse series render with holes).

Scale design (the 100 TB question):

- ``time_bucket_gapfill`` never materializes a dense calendar grid and
  never joins against one. The observed buckets are one partial+final
  hash aggregate (shuffle carries one row per key × bucket); the gap
  rows are *generated from the gaps themselves* — a ``lead`` window on
  the key partitioning finds each (bucket, next_bucket) hole and
  ``explode(sequence(...))`` emits exactly the missing buckets, carrying
  the fill endpoints along. Cost is O(observed + emitted), the output's
  own size; a grid-join formulation would shuffle span/bucket rows per
  key even for fully-dense series.
- ``counter_agg`` / ``state_agg`` are ONE window stage + ONE aggregate,
  both on the same key partitioning — a single shuffle each.

Engine-proof numerics (the repo-wide convention, SCALE.md): values
quantize to integer cents at the scan, per-bucket means are *half-up
integer division* into integer micro-units (no double ROUND at the
end), and linear interpolation is exact integer floor division via the
pmod identity — bit-identical in Spark and DuckDB, at any magnitude.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .aggregate import limb_sum


def _floor_div(x: Column, y: Column | int) -> Column:
    """Exact floor division (valid for negative ``x`` too): the
    ``(x - pmod(x, y)) / y`` identity, carried out in DECIMAL(38,0) so
    the quotient is exact at any accumulator magnitude."""
    y = F.lit(y) if isinstance(y, int) else y
    xd = x.cast("decimal(38,0)")
    yd = y.cast("decimal(38,0)")
    return ((xd - F.pmod(xd, yd)) / yd).cast("decimal(38,0)")


def _sql_floor_div(x: str, y: str) -> str:
    """DuckDB twin of :func:`_floor_div` (``//`` is safe after the pmod
    subtraction makes the division exact)."""
    return f"(({x} - ((({x}) % ({y}) + ({y})) % ({y}))) // ({y}))"


def _bucket_s(ts_col: str, bucket_seconds: int) -> Column:
    """Tumbling-bucket start in epoch seconds, via pmod (no division —
    exact for pre-1970 instants too)."""
    s = F.unix_seconds(F.col(ts_col))
    return (s - F.pmod(s, F.lit(bucket_seconds))).alias("bucket_s")


def _sql_bucket_s(ts_col: str, bucket_seconds: int) -> str:
    s = f"(epoch_us({ts_col}) // 1000000)"
    return f"({s} - ((({s}) % {bucket_seconds} + {bucket_seconds}) % {bucket_seconds}))"


def time_bucket_gapfill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    bucket_seconds: int,
    fill: str = "locf",
    value_decimals: int = 2,
) -> DataFrame:
    """Per-key tumbling-bucket mean with the holes filled in
    (TimescaleDB ``time_bucket_gapfill`` semantics, bounded to each
    key's own [first, last] observed range — no leading/trailing
    extrapolation, so the operator needs no external range parameter
    and emits nothing for keys outside their own activity span).

    ``fill``:

    - ``"locf"`` — last observation carried forward (step-hold, the
      dashboard default);
    - ``"linear"`` — exact-integer linear interpolation between the
      surrounding observed buckets;
    - ``"null"`` — emit the missing buckets with NULL value (the shape
      a charting layer needs to *break* the line at gaps).

    Output: ``key, bucket_s`` (epoch seconds, BIGINT), ``value_micro``
    (bucket mean in 1e-6 units, BIGINT — exact half-up division), and
    ``gap`` (0 observed / 1 filled).
    """
    if fill not in ("locf", "linear", "null"):
        raise ValueError(f"fill must be locf|linear|null, got {fill!r}")
    scale = 10**value_decimals
    q = F.round(F.col(value_col) * scale, 0).cast("long")
    obs = (
        df.select(F.col(key_col), _bucket_s(ts_col, bucket_seconds), q.alias("__q"))
        .groupBy(key_col, "bucket_s")
        # limb-split exact sum: wrap-proof past 2^63 total per bucket
        # (a plain long SUM overflows silently inside a 100-TB group)
        .agg(limb_sum(F.col("__q")).alias("__s"), F.count("__q").alias("__n"))
    )
    # half-up integer mean in micro units: floor((2*s*10^(6-d) + n) / (2n))
    x = F.col("__s").cast("decimal(38,0)") * F.lit(2 * 10 ** (6 - value_decimals)) + F.col("__n")
    v = _floor_div(x, (F.col("__n") * 2)).cast("long")
    obs = obs.select(key_col, "bucket_s", v.alias("value_micro"))

    w = Window.partitionBy(key_col).orderBy("bucket_s")
    stepped = obs.select(
        key_col,
        "bucket_s",
        "value_micro",
        F.lead("bucket_s").over(w).alias("__nb"),
        F.lead("value_micro").over(w).alias("__nv"),
    )
    step = F.lit(bucket_seconds)
    holes = stepped.filter(F.col("__nb") >= F.col("bucket_s") + 2 * step)
    g = F.explode(
        F.sequence(F.col("bucket_s") + step, F.col("__nb") - step, step)
    ).alias("__g")
    if fill == "locf":
        fill_v: Column = F.col("value_micro")
    elif fill == "linear":
        fill_v = (
            F.col("value_micro")
            + _floor_div(
                (F.col("__nv") - F.col("value_micro")).cast("decimal(38,0)")
                * (F.col("__g") - F.col("bucket_s")),
                F.col("__nb") - F.col("bucket_s"),
            )
        ).cast("long")
    else:
        fill_v = F.lit(None).cast("long")
    gaps = holes.select(key_col, "bucket_s", "value_micro", "__nb", "__nv", g).select(
        F.col(key_col),
        F.col("__g").alias("bucket_s"),
        fill_v.alias("value_micro"),
        F.lit(1).alias("gap"),
    )
    out = obs.withColumn("gap", F.lit(0)).unionByName(gaps)
    return out.orderBy(key_col, "bucket_s")


def time_bucket_gapfill_sql(
    table: str,
    key_col: str,
    ts_col: str,
    value_col: str,
    bucket_seconds: int,
    fill: str = "locf",
    value_decimals: int = 2,
) -> str:
    """DuckDB twin of :func:`time_bucket_gapfill` (identical integer
    arithmetic; ``generate_series`` is inclusive on both ends like
    Spark's ``sequence``)."""
    if fill not in ("locf", "linear", "null"):
        raise ValueError(f"fill must be locf|linear|null, got {fill!r}")
    scale = 10**value_decimals
    bs = bucket_seconds
    x = f"(2 * SUM(ROUND(({value_col}) * {scale})::BIGINT) * {10 ** (6 - value_decimals)} + COUNT({value_col}))"
    y = f"(2 * COUNT({value_col}))"
    if fill == "locf":
        fill_v = "v_micro"
    elif fill == "linear":
        fill_v = (
            "(v_micro + "
            + _sql_floor_div("(nv - v_micro) * (g - b0)", "(nb - b0)")
            + ")::BIGINT"
        )
    else:
        fill_v = "NULL::BIGINT"
    return f"""
    WITH obs AS (
      SELECT {key_col} AS k, {_sql_bucket_s(ts_col, bs)} AS bucket_s,
             ({_sql_floor_div(x, y)})::BIGINT AS v_micro
      FROM {table} GROUP BY 1, 2
    ),
    stepped AS (
      SELECT k, bucket_s, v_micro,
             lead(bucket_s) OVER (PARTITION BY k ORDER BY bucket_s) AS nb,
             lead(v_micro) OVER (PARTITION BY k ORDER BY bucket_s) AS nv
      FROM obs
    ),
    holes AS (
      SELECT k, bucket_s AS b0, v_micro, nb, nv,
             unnest(generate_series(bucket_s + {bs}, nb - {bs}, {bs})) AS g
      FROM stepped WHERE nb >= bucket_s + 2 * {bs}
    )
    SELECT k AS {key_col}, bucket_s, v_micro AS value_micro, 0 AS gap FROM obs
    UNION ALL
    SELECT k AS {key_col}, g AS bucket_s, {fill_v} AS value_micro, 1 AS gap
    FROM holes
    ORDER BY {key_col}, bucket_s
    """


def counter_agg(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    tiebreaker: str,
    value_decimals: int = 2,
) -> DataFrame:
    """Monotonic-counter rollup with reset detection (TimescaleDB
    ``counter_agg`` semantics): a drop in the raw counter value means
    the counter restarted from zero, so the observed value *is* the
    increase since the reset. Total increase = Σ max-style deltas —
    the metric a bytes-sent / requests-served gauge needs, immune to
    process restarts.

    One ``lag`` window + one aggregate on the same key partitioning (a
    single shuffle). Values quantize to ``10^value_decimals`` integer
    units; output ``increase_q`` is exact integer units.

    Output: ``key, increase_q, n_resets, n_points`` ordered by key.
    """
    scale = 10**value_decimals
    q = F.round(F.col(value_col) * scale, 0).cast("long")
    us = F.unix_micros(F.col(ts_col))
    w = Window.partitionBy(key_col).orderBy(us, F.col(tiebreaker))
    prev = F.lag(q).over(w)
    delta = q - prev
    inc = (
        F.when(prev.isNull(), F.lit(0))
        .when(delta < 0, q)
        .otherwise(delta)
    )
    reset = F.when(delta < 0, 1).otherwise(0)
    stepped = df.select(
        F.col(key_col), inc.alias("__inc"), reset.alias("__reset")
    )
    return (
        stepped.groupBy(key_col)
        .agg(
            # limb-split exact sum (operators/aggregate.py:limb_sum):
            # the former per-row decimal(38,0) cast was the object-path
            # tax; the recombined total is bit-identical
            limb_sum(F.col("__inc")).cast("long").alias("increase_q"),
            F.sum("__reset").cast("long").alias("n_resets"),
            F.count(F.lit(1)).alias("n_points"),
        )
        .orderBy(key_col)
    )


def counter_agg_sql(
    table: str,
    key_col: str,
    ts_col: str,
    value_col: str,
    tiebreaker: str,
    value_decimals: int = 2,
) -> str:
    """DuckDB twin of :func:`counter_agg`."""
    scale = 10**value_decimals
    return f"""
    WITH stepped AS (
      SELECT {key_col} AS k,
             ROUND(({value_col}) * {scale})::BIGINT AS q,
             lag(ROUND(({value_col}) * {scale})::BIGINT) OVER (
               PARTITION BY {key_col}
               ORDER BY epoch_us({ts_col}), {tiebreaker}
             ) AS prev
      FROM {table}
    )
    SELECT k AS {key_col},
           SUM(CASE WHEN prev IS NULL THEN 0
                    WHEN q - prev < 0 THEN q
                    ELSE q - prev END)::BIGINT AS increase_q,
           SUM(CASE WHEN prev IS NOT NULL AND q - prev < 0 THEN 1 ELSE 0 END)::BIGINT
             AS n_resets,
           COUNT(*)::BIGINT AS n_points
    FROM stepped GROUP BY k ORDER BY k
    """


def state_agg(
    df: DataFrame,
    key_col: str,
    state_col: str,
    ts_col: str,
    tiebreaker: str,
) -> DataFrame:
    """Time-in-state rollup (TimescaleDB ``state_agg`` semantics,
    left-closed step: each observation's state holds until the next
    observation). Answers "how long was each device in each state" —
    the uptime/incident-duration query — without ever materializing
    per-second rows.

    One ``lead`` window + one aggregate, both on the key partitioning.
    The final interval carries no duration (the step function ends at
    the last observation), matching :func:`time_weighted_avg`.

    Output: ``key, state, duration_us, n_intervals`` ordered by both.
    """
    us = F.unix_micros(F.col(ts_col))
    w = Window.partitionBy(key_col).orderBy(us, F.col(tiebreaker))
    stepped = df.select(
        F.col(key_col),
        F.col(state_col),
        us.alias("__us"),
        F.lead(us).over(w).alias("__next_us"),
    ).filter(F.col("__next_us").isNotNull())
    return (
        stepped.groupBy(key_col, state_col)
        .agg(
            F.sum(F.col("__next_us") - F.col("__us")).cast("long").alias("duration_us"),
            F.count(F.lit(1)).alias("n_intervals"),
        )
        .orderBy(key_col, state_col)
    )


def state_agg_sql(
    table: str,
    key_col: str,
    state_col: str,
    ts_col: str,
    tiebreaker: str,
) -> str:
    """DuckDB twin of :func:`state_agg`."""
    return f"""
    WITH stepped AS (
      SELECT {key_col} AS k, {state_col} AS s, epoch_us({ts_col}) AS us,
             lead(epoch_us({ts_col})) OVER (
               PARTITION BY {key_col}
               ORDER BY epoch_us({ts_col}), {tiebreaker}
             ) AS next_us
      FROM {table}
    )
    SELECT k AS {key_col}, s AS {state_col},
           SUM(next_us - us)::BIGINT AS duration_us,
           COUNT(*)::BIGINT AS n_intervals
    FROM stepped WHERE next_us IS NOT NULL
    GROUP BY k, s ORDER BY k, s
    """


def counter_agg_chunked(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    tiebreaker: str,
    chunk_seconds: int,
    value_decimals: int = 2,
) -> DataFrame:
    """Scale form of :func:`counter_agg` for FEW-valued keys: the lag
    adjacency is computed per (key, time-chunk) with each chunk's LAST
    observation carried into the next chunk, so no task ever holds a
    key's full history — parallelism is keys × chunks and the carry is
    exactly one row per (key, chunk).

    Exact parity with :func:`counter_agg` by construction: every
    consecutive pair within a chunk is adjacent there, and the one
    cross-boundary pair is reconstructed from the carried row (the
    carried copy contributes no delta of its own). Deltas then reduce
    in the usual partial+final aggregate.
    """
    scale = 10**value_decimals
    c_us = chunk_seconds * 1_000_000
    us = F.unix_micros(F.col(ts_col))
    q = F.round(F.col(value_col) * scale, 0).cast("long")
    base = df.select(
        F.col(key_col), us.alias("__us"), q.alias("__q"), F.col(tiebreaker).alias("__tb")
    )
    chunk = ((F.col("__us") - F.pmod(F.col("__us"), F.lit(c_us))) / F.lit(c_us)).cast("long")
    native = base.select("*", chunk.alias("__chunk"), F.lit(False).alias("__carry"))
    # last row per (key, chunk), routed to the key's NEXT NON-EMPTY
    # chunk (a sparse key may skip chunks entirely; "chunk + 1" would
    # strand the carry in an empty chunk and break adjacency). The
    # routing window runs over one row per (key, chunk) — bounded by
    # the time span, independent of corpus size.
    w_last = Window.partitionBy(key_col, "__chunk").orderBy(
        F.col("__us").desc(), F.col("__tb").desc()
    )
    lasts = (
        native.withColumn("__rn", F.row_number().over(w_last))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    w_next = Window.partitionBy(key_col).orderBy("__chunk")
    carried = (
        lasts.withColumn("__next_chunk", F.lead("__chunk").over(w_next))
        .filter(F.col("__next_chunk").isNotNull())
        .select(
            key_col, "__us", "__q", "__tb",
            F.col("__next_chunk").alias("__chunk"),
            F.lit(True).alias("__carry"),
        )
    )
    both = native.unionByName(carried)
    w = Window.partitionBy(key_col, "__chunk").orderBy("__us", "__tb")
    prev = F.lag("__q").over(w)
    delta = F.col("__q") - prev
    # a native row whose in-chunk predecessor is missing AND no carried
    # row precedes it is the key's true first observation → contributes 0
    inc = (
        F.when(F.col("__carry"), F.lit(0))  # carried copies emit nothing
        .when(prev.isNull(), F.lit(0))
        .when(delta < 0, F.col("__q"))
        .otherwise(delta)
    )
    reset = F.when(
        (~F.col("__carry")) & prev.isNotNull() & (delta < 0), 1
    ).otherwise(0)
    stepped = both.select(
        key_col,
        inc.alias("__inc"),
        reset.alias("__reset"),
        F.when(F.col("__carry"), 0).otherwise(1).alias("__pt"),
    )
    return (
        stepped.groupBy(key_col)
        .agg(
            limb_sum(F.col("__inc")).cast("long").alias("increase_q"),
            F.sum("__reset").cast("long").alias("n_resets"),
            F.sum("__pt").cast("long").alias("n_points"),
        )
        .orderBy(key_col)
    )


def state_agg_chunked(
    df: DataFrame,
    key_col: str,
    state_col: str,
    ts_col: str,
    tiebreaker: str,
    chunk_seconds: int,
) -> DataFrame:
    """Scale form of :func:`state_agg` for FEW-valued keys — the lead
    mirror of :func:`counter_agg_chunked`: durations need each row's
    NEXT observation, so the FIRST row of every (key, chunk) is carried
    BACKWARD to the key's previous non-empty chunk. Within a chunk every
    native row then has its successor present (native or carried), the
    carried copies emit nothing, and the final interval (no successor
    anywhere) carries no duration — exactly the left-closed step
    semantics of the declarative form, at keys × chunks parallelism.
    """
    c_us = chunk_seconds * 1_000_000
    us = F.unix_micros(F.col(ts_col))
    base = df.select(
        F.col(key_col),
        F.col(state_col),
        us.alias("__us"),
        F.col(tiebreaker).alias("__tb"),
    )
    chunk = ((F.col("__us") - F.pmod(F.col("__us"), F.lit(c_us))) / F.lit(c_us)).cast("long")
    native = base.select("*", chunk.alias("__chunk"), F.lit(False).alias("__carry"))
    w_first = Window.partitionBy(key_col, "__chunk").orderBy("__us", "__tb")
    firsts = (
        native.withColumn("__rn", F.row_number().over(w_first))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    # route each chunk's first row to the key's PREVIOUS non-empty chunk
    w_prev = Window.partitionBy(key_col).orderBy("__chunk")
    carried = (
        firsts.withColumn("__prev_chunk", F.lag("__chunk").over(w_prev))
        .filter(F.col("__prev_chunk").isNotNull())
        .select(
            key_col, state_col, "__us", "__tb",
            F.col("__prev_chunk").alias("__chunk"),
            F.lit(True).alias("__carry"),
        )
    )
    both = native.unionByName(carried)
    w = Window.partitionBy(key_col, "__chunk").orderBy("__us", "__tb")
    stepped = both.select(
        key_col,
        state_col,
        "__us",
        "__carry",
        F.lead("__us").over(w).alias("__next_us"),
    ).filter((~F.col("__carry")) & F.col("__next_us").isNotNull())
    return (
        stepped.groupBy(key_col, state_col)
        .agg(
            F.sum(F.col("__next_us") - F.col("__us")).cast("long").alias("duration_us"),
            F.count(F.lit(1)).alias("n_intervals"),
        )
        .orderBy(key_col, state_col)
    )
