"""Sampled type-vote inference and column conversion (reference J1-J9).

The reference's Oracle-VARCHAR2 problem: every column may arrive as a
string, with numeric payloads and 14-digit compact timestamps. It detects
types by sampling ≤1000 rows and voting with a 0.9 parse-success
threshold (data/converter.py:19-111), then converts per column on a
thread pool (data/converter.py:254-355).

Spark-first redesign:
- **One job for all columns**: every candidate column's numeric vote AND
  datetime vote are aggregate expressions in a single ``agg(...)`` over
  one sampled DataFrame — Spark parallelizes columns inside the stage, so
  the reference's 4-worker ThreadPool disappears.
- **Conversion is one select**: per-column cast expressions in a single
  projection — no data moves twice, whole-stage codegen handles all
  columns at once.
- Votes use ``try_cast`` / ``try_to_timestamp`` (null on failure), the
  engine-side equivalent of ``pd.to_numeric(errors='coerce')``.

Precedence parity with ``detect_column_type`` (data/converter.py:202-230):
existing numeric/datetime dtype wins; then datetime probe; then numeric
probe; else string.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DateType, NumericType, StringType, TimestampType

from ..config import SAMPLE_SIZE_FOR_TYPE_DETECTION, TYPE_CONVERSION_THRESHOLD
from .timefn import parse_compact_timestamp

NUMERIC = "numeric"
DATETIME = "datetime"
STRING = "string"


def numeric_vote_expr(col: str) -> Column:
    """Fraction of non-null values parseable as DOUBLE (J1).

    ``avg`` skips nulls, so the fraction is over non-null values only —
    parity with the reference's ``series.dropna()`` sampling.
    """
    c = F.col(col).cast("string")
    return F.avg(
        F.when(c.isNotNull(), c.try_cast("double").isNotNull().cast("int"))
    )


def datetime_vote_expr(col: str) -> Column:
    """Fraction of non-null values parseable in an accepted datetime
    format (J2): 14-digit, 8-digit, ISO, slash-date — via the same
    expression the conversion uses, so detect ≡ convert."""
    c = F.col(col).cast("string")
    return F.avg(
        F.when(c.isNotNull(), parse_compact_timestamp(c).isNotNull().cast("int"))
    )


@dataclass
class InferenceReport:
    """Outcome of detect+convert (J6's summary dict shape)."""

    decisions: dict[str, str] = field(default_factory=dict)  # col -> kind
    numeric: list[str] = field(default_factory=list)
    datetime: list[str] = field(default_factory=list)
    unchanged: list[str] = field(default_factory=list)
    fractions: dict[str, dict[str, float]] = field(default_factory=dict)


def vote_string_columns(
    df: DataFrame,
    columns: list[str] | None = None,
    sample_size: int = SAMPLE_SIZE_FOR_TYPE_DETECTION,
) -> dict[str, dict[str, float]]:
    """Compute numeric+datetime vote fractions for all candidate string
    columns in ONE aggregation job over one ≤``sample_size``-row sample.
    """
    if columns is None:
        columns = [
            f.name for f in df.schema.fields if isinstance(f.dataType, StringType)
        ]
    if not columns:
        return {}
    sample = df.limit(sample_size)
    aggs: list[Column] = []
    for c in columns:
        aggs.append(numeric_vote_expr(c).alias(f"__num__{c}"))
        aggs.append(datetime_vote_expr(c).alias(f"__dt__{c}"))
    row = sample.agg(*aggs).first()
    out: dict[str, dict[str, float]] = {}
    for c in columns:
        out[c] = {
            "numeric_fraction": row[f"__num__{c}"] or 0.0,
            "datetime_fraction": row[f"__dt__{c}"] or 0.0,
        }
    return out


def detect_convertible_columns(
    df: DataFrame,
    threshold: float = TYPE_CONVERSION_THRESHOLD,
    sample_size: int = SAMPLE_SIZE_FOR_TYPE_DETECTION,
) -> dict[str, str]:
    """Suggest conversions without applying them (J7).

    Returns ``{column: 'numeric'|'datetime'}`` for string columns whose
    vote clears ``threshold``; datetime outranks numeric (J5 precedence).
    """
    votes = vote_string_columns(df, sample_size=sample_size)
    out: dict[str, str] = {}
    for c, v in votes.items():
        if v["datetime_fraction"] >= threshold:
            out[c] = DATETIME
        elif v["numeric_fraction"] >= threshold:
            out[c] = NUMERIC
    return out


def detect_column_type(
    df: DataFrame,
    column: str,
    threshold: float = TYPE_CONVERSION_THRESHOLD,
    sample_size: int = SAMPLE_SIZE_FOR_TYPE_DETECTION,
) -> str:
    """Single-column decision tree (J5, data/converter.py:202-230)."""
    dt = df.schema[column].dataType
    if isinstance(dt, NumericType):
        return NUMERIC
    if isinstance(dt, (TimestampType, DateType)):
        return DATETIME
    if not isinstance(dt, StringType):
        return STRING
    votes = vote_string_columns(df, [column], sample_size)[column]
    if votes["datetime_fraction"] >= threshold:
        return DATETIME
    if votes["numeric_fraction"] >= threshold:
        return NUMERIC
    return STRING


def conversion_expr(col: str, kind: str) -> Column:
    """Cast expression for one column (null-on-failure, 'coerce' parity)."""
    c = F.col(col)
    if kind == NUMERIC:
        return c.cast("string").try_cast("double").alias(col)
    if kind == DATETIME:
        return parse_compact_timestamp(c).alias(col)
    return c


def convert_selected_columns(df: DataFrame, selections: dict[str, str]) -> DataFrame:
    """Apply user-selected conversions (J8, data/converter.py:397-429).

    Missing columns are skipped silently (reference parity). One
    projection — all casts happen in a single codegen stage.
    """
    exprs = []
    for f_ in df.schema.fields:
        kind = selections.get(f_.name)
        if kind in (NUMERIC, DATETIME) and isinstance(f_.dataType, StringType):
            exprs.append(conversion_expr(f_.name, kind))
        else:
            exprs.append(F.col(f_.name))
    return df.select(*exprs)


def detect_and_convert_types(
    df: DataFrame,
    threshold: float = TYPE_CONVERSION_THRESHOLD,
    sample_size: int = SAMPLE_SIZE_FOR_TYPE_DETECTION,
) -> tuple[DataFrame, InferenceReport]:
    """Detect + convert every eligible column (J6/J9).

    Returns the converted DataFrame and a report mirroring the
    reference's ``{numeric: [], datetime: [], unchanged: []}`` summary
    plus raw vote fractions.
    """
    report = InferenceReport(fractions=vote_string_columns(df, sample_size=sample_size))
    for c, v in report.fractions.items():
        if v["datetime_fraction"] >= threshold:
            report.decisions[c] = DATETIME
            report.datetime.append(c)
        elif v["numeric_fraction"] >= threshold:
            report.decisions[c] = NUMERIC
            report.numeric.append(c)
    report.unchanged = [c for c in df.columns if c not in report.decisions]
    return convert_selected_columns(df, report.decisions), report
