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
    # (?![0-9.eE]) guards partial numeric matches: "k": 4.5 must NOT
    # fast-path to 4 — it falls through to Jackson like any other
    # non-integer so both paths agree.
    pat = '"' + _re.escape(key) + '"\\s*:\\s*(-?\\d+)(?![0-9.eE])'
    # try_cast, not cast: regexp_extract yields '' on no-match and
    # get_json_object can yield non-integral text — under ANSI mode
    # (the Spark 4 default) a plain cast would THROW on those rows
    # instead of falling through / yielding NULL
    fast = F.regexp_extract(c, pat, 1).try_cast("long")
    slow = F.get_json_object(c, f"$.{key}").try_cast("long")
    return F.coalesce(fast, slow)
