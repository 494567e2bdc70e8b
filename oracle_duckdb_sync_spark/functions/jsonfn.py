"""JSON scalar extraction — codegen fast path for flat payloads.

Reference parity: the reference pulls typed scalars out of JSON event
payloads with DuckDB's ``json_extract_string(...)::BIGINT``
(vectorized SIMD parse). Spark's ``get_json_object`` is a per-call
Jackson parse — measured ~8× slower than a compiled Java regex on the
flat ``{"k": 42}``-shaped payloads the event pipeline carries. This
module provides the regex fast path with the Jackson general path as a
row-level fallback, so the common flat case runs at scan speed and
anything the regex can't prove falls through to full JSON semantics.

Scale note: both paths are JVM codegen expressions (no UDF); the
``coalesce`` short-circuits, so rows matched by the regex never touch
Jackson. At 100 TB the JSON parse is pure per-row CPU on the scan —
this fast path is a straight constant-factor win with no plan change.
"""

from __future__ import annotations

import re as _re

from pyspark.sql import Column
from pyspark.sql import functions as F


def get_json_long(col, key: str) -> Column:
    """Extract an INTEGER value for a top-level ``key`` from a JSON
    string column — regex fast path, ``get_json_object`` fallback.

    Semantics vs ``get_json_object(col, '$.key').cast('long')``:

    * flat object, integer value (``{"k": 42}``) — identical, ~8×
      faster (compiled regex vs Jackson).
    * non-integer value (``4.5``, quoted, bool, null) — the lookahead
      rejects the fast path and the row falls back to Jackson, so the
      result is identical by construction.
    * CAVEAT — the regex sees text, not a parse tree. It diverges from
      ``get_json_object`` (returning a value where Jackson returns
      NULL) when ``key`` appears nested (``{"a": {"k": 5}}``), inside
      a string value or an escaped-quote key, or in MALFORMED JSON
      that still contains ``"key": <int>`` (e.g. ``{"k": 5`` from a
      truncated write). Use this only on payloads known to be
      well-formed, flat, and machine-written (e.g. ``events.props``);
      use ``get_json_object`` directly for nested or untrusted JSON.
    """
    c = col if not isinstance(col, str) else F.col(col)
    return F.coalesce(_fast_long(c, key), _slow_long(c, key))


def _fast_long(c: Column, key: str) -> Column:
    # (?![0-9.eE]) guards partial numeric matches: "k": 4.5 must NOT
    # fast-path to 4 — it falls through to Jackson like any other
    # non-integer so both paths agree.
    pat = '"' + _re.escape(key) + '"\\s*:\\s*(-?\\d+)(?![0-9.eE])'
    # try_cast, not cast: regexp_extract yields '' on no-match and
    # get_json_object can yield non-integral text — under ANSI mode
    # (the Spark 4 default) a plain cast would THROW on those rows
    # instead of falling through / yielding NULL
    return F.regexp_extract(c, pat, 1).try_cast("long")


def _slow_long(c: Column, key: str) -> Column:
    return F.get_json_object(c, f"$.{key}").try_cast("long")


def json_long_flat_rule(col, key: str) -> Column:
    """Row-level DQ EXPECTATION (true = row passes) asserting
    :func:`get_json_long`'s flatness precondition: the regex fast path
    agrees with a full Jackson parse on this row. Feed it to
    ``quality.check_expectations`` / ``enforce_expectations`` so the
    gate rides an existing one-pass rule aggregate — a generator or
    schema drift that nests the key (or embeds it in a string value)
    then fails the PIPELINE loudly instead of only the nightly test
    (VERDICT r13 #6)."""
    c = col if not isinstance(col, str) else F.col(col)
    slow = _slow_long(c, key)
    served = F.coalesce(_fast_long(c, key), slow)
    return served.eqNullSafe(slow)


def json_long_flat_rule_sql(col: str, key: str) -> str:
    """DuckDB twin of :func:`json_long_flat_rule` for oracle-paired DQ
    suites. RE2 has no lookahead, so the fast-path probe uses a
    consuming ``([^0-9.eE]|$)`` tail — same match set and same group-1
    digits as the Java lookahead form; whitespace is the explicit
    Java∩RE2 class (machine-written payloads carry no \\x0B)."""
    # DuckDB single-quoted literals pass backslashes through verbatim
    # (no doubling — RE2 receives \d/\t as written; the repo's other
    # twins, e.g. _WS in functions/text.py, rely on the same rule)
    pat = (
        '"' + _re.escape(key) + '"[ \\t\\n\\r\\f]*:[ \\t\\n\\r\\f]*'
        "(-?\\d+)([^0-9.eE]|$)"
    )
    pat_sql = pat.replace("'", "''")
    fast = f"TRY_CAST(regexp_extract({col}, '{pat_sql}', 1) AS BIGINT)"
    # json_valid gate: DuckDB's json_extract_string THROWS on malformed
    # payloads where Spark's get_json_object returns NULL — the rule
    # must CLASSIFY malformed rows, not die on them
    slow = (
        f"TRY_CAST(CASE WHEN json_valid({col}) THEN "
        f"json_extract_string({col}, '$.{key}') END AS BIGINT)"
    )
    return (
        f"(COALESCE({fast}, {slow}) IS NOT DISTINCT FROM {slow})"
    )


def count_json_long_divergence(df, col, key: str) -> int:
    """Enforcement hook for :func:`get_json_long`'s flatness CAVEAT:
    count the rows of ``df`` where the fast path would return a value
    that differs from a full Jackson parse (``get_json_object``) —
    the nested-key / key-inside-a-string / malformed-payload classes
    the docstring warns about. Returns 0 iff ``get_json_long`` is
    EXACTLY ``get_json_object(...).try_cast('long')`` on this corpus.

    Run it as a data-quality gate before wiring ``get_json_long``
    into a pipeline over a new payload column, and in a pinned test
    over the actual corpus so a generator/schema drift that breaks
    the flatness precondition fails loudly instead of silently
    skewing results (ADVICE r12). One full scan — same cost class as
    any other validation pass; the divergence count aggregates
    map-side, nothing is collected but the single count."""
    return df.filter(~json_long_flat_rule(col, key)).count()
