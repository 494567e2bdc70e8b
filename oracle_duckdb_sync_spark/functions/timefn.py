"""Time functions: tumbling time-bucket and compact-timestamp parsing.

Reference semantics reproduced here:
- ``time_bucket(INTERVAL '{i}', ts)`` per-interval tumbling bucket
  (data/query.py:984-1017, data/query_core.py:198-263) → :func:`time_bucket`.
- ``strptime(CAST(c AS VARCHAR), '%Y%m%d%H%M%S')`` 14-digit compact
  timestamps (data/query.py:1007) → :func:`parse_compact_timestamp`.

Implementation notes (Spark-first):
- Buckets are computed by epoch-floor arithmetic on the timestamp's
  internal epoch value: ``floor(epoch / W) * W``. This stays inside
  whole-stage codegen, is independent of the session timezone, and avoids
  the struct-typed output of ``F.window`` (whose bucket origin also
  matches epoch alignment). DuckDB's ``time_bucket`` origin (2000-01-03)
  coincides with epoch alignment for every interval that divides a day —
  the only intervals the reference uses (SURVEY §4.3-1).
- Calendar-width intervals (month/year) have no fixed width and are
  rejected; the reference never uses them.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..errors import InvalidIntervalError

_UNIT_SECONDS = {
    "second": 1,
    "seconds": 1,
    "sec": 1,
    "secs": 1,
    "minute": 60,
    "minutes": 60,
    "min": 60,
    "mins": 60,
    "hour": 3600,
    "hours": 3600,
    "day": 86400,
    "days": 86400,
    "week": 604800,
    "weeks": 604800,
}

_INTERVAL_RE = re.compile(r"^\s*(\d+)\s*([a-zA-Z]+)\s*$")


def interval_seconds(interval: str) -> int:
    """Parse ``'10 minutes'``-style interval strings to a width in seconds.

    Accepts the reference's UI intervals ('1 minute', '10 minutes',
    '1 hour' — ui/pages/user/data_view.py:110-113) and any other
    fixed-width ``'<n> <unit>'`` form.
    """
    m = _INTERVAL_RE.match(interval)
    if not m:
        raise InvalidIntervalError(f"unparseable interval: {interval!r}")
    n, unit = int(m.group(1)), m.group(2).lower()
    if unit not in _UNIT_SECONDS:
        raise InvalidIntervalError(
            f"non-fixed-width or unknown interval unit: {unit!r} "
            "(month/year buckets are not supported)"
        )
    if n <= 0:
        raise InvalidIntervalError(f"interval must be positive: {interval!r}")
    return n * _UNIT_SECONDS[unit]


def bucket_epoch(ts: Column, interval: str) -> Column:
    """Tumbling-bucket start as epoch seconds (BIGINT).

    Timezone-proof core of :func:`time_bucket`: works on the timestamp's
    internal epoch value, so results are identical under any session
    timezone. Pure arithmetic → whole-stage codegen.
    """
    width = interval_seconds(interval)
    epoch = ts.cast("double")  # epoch seconds incl. fractional part
    return (F.floor(epoch / F.lit(width)) * F.lit(width)).cast("long")


def time_bucket(ts: Column, interval: str) -> Column:
    """Tumbling-bucket start as a TimestampType column.

    Spark analog of DuckDB ``time_bucket(INTERVAL '{i}', ts)`` for
    fixed-width intervals (reference D1/D2, data/query.py:1007).
    """
    return F.timestamp_seconds(bucket_epoch(ts, interval))


# --- compact / mixed timestamp parsing (G1, G8, J3) ------------------------

COMPACT_14 = "yyyyMMddHHmmss"
COMPACT_8 = "yyyyMMdd"


def parse_compact_timestamp(c: Column) -> Column:
    """Parse string timestamps in the reference's accepted formats.

    Mirrors data/converter.py:114-165 (``convert_to_datetime``): 14-digit
    ``yyyyMMddHHmmss``, 8-digit ``yyyyMMdd``, ISO ``yyyy-MM-dd[ HH:mm:ss]``,
    and ``yyyy/MM/dd`` — first matching format wins, unparseable → NULL
    (``errors='coerce'`` parity). ``try_to_timestamp`` keeps failures
    null-safe under ANSI mode.
    """
    s = F.trim(c.cast("string"))
    return (
        F.when(s.rlike(r"^\d{14}$"), F.try_to_timestamp(s, F.lit(COMPACT_14)))
        .when(s.rlike(r"^\d{8}$"), F.try_to_timestamp(s, F.lit(COMPACT_8)))
        .when(
            s.rlike(r"^\d{4}/\d{2}/\d{2}"),
            F.coalesce(
                F.try_to_timestamp(s, F.lit("yyyy/MM/dd HH:mm:ss")),
                F.try_to_timestamp(s, F.lit("yyyy/MM/dd")),
            ),
        )
        .otherwise(
            F.coalesce(
                F.try_to_timestamp(s, F.lit("yyyy-MM-dd HH:mm:ss.SSSSSS")),
                F.try_to_timestamp(s, F.lit("yyyy-MM-dd HH:mm:ss")),
                F.try_to_timestamp(s, F.lit("yyyy-MM-dd'T'HH:mm:ss")),
                F.try_to_timestamp(s, F.lit("yyyy-MM-dd")),
            )
        )
    )


def format_compact_timestamp(ts: Column) -> Column:
    """Inverse of the 14-digit parse: timestamp → ``yyyyMMddHHmmss`` string.

    Used to reproduce the reference's canonical Oracle-VARCHAR2 data shape
    (FIXTURES F1) from typed test data. ``date_format`` honors the session
    timezone; round-trips with :func:`parse_compact_timestamp` in any
    single session.
    """
    return F.date_format(ts, COMPACT_14)
