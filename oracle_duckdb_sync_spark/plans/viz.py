"""Visualization-prep operators (reference §2.I5-I7).

Reference parity:
- I5 y-range padding: min/max ± 5%, degenerate-range handling, NaN strip
  (ui/visualization.py:56-87)               → :func:`padded_y_range`
- I6 aggregate-column renaming for charts: ``c_avg → c``,
  ``time_bucket → time`` (ui/visualization.py:22-53) → :func:`rename_for_viz`
- I7 dtype-based plot-column detection with common-name fallback
  (ui/visualization.py:90-113, data/query_core.py:266-300)
  → :func:`detect_plot_columns`
- I4 plot-prep pipeline: cast → sort → LTTB (ui/visualization.py:418-464)
  → :func:`prepare_plot_dataframe`

These run on aggregated results (thousands of rows), so driver-side
min/max collection is one tiny job; the LTTB step bounds what ever
reaches the chart at 5000 points regardless of input size.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DateType, NumericType, TimestampType

from ..config import LTTB_THRESHOLD
from ..operators.lttb import downsample_single_series

# common time-column names, checked when no datetime dtype exists
# (data/query_core.py:285-294)
COMMON_TIME_NAMES = ("timestamp", "time", "date", "datetime", "created_at", "updated_at", "ts")

Y_PADDING = 0.05  # ui/visualization.py:72


def padded_y_range(df: DataFrame, column: str) -> tuple[float, float] | None:
    """I5: (min, max) padded ±5%; degenerate range widens by ±0.5 (the
    reference's flat-line handling); all-NaN/empty → None."""
    row = (
        df.filter(~F.isnan(F.col(column).cast("double")) & F.col(column).isNotNull())
        .agg(F.min(F.col(column).cast("double")), F.max(F.col(column).cast("double")))
        .first()
    )
    lo, hi = (row[0], row[1]) if row else (None, None)
    if lo is None or hi is None or math.isnan(lo) or math.isnan(hi):
        return None
    if lo == hi:
        return lo - 0.5, hi + 0.5
    pad = (hi - lo) * Y_PADDING
    return lo - pad, hi + pad


def rename_for_viz(df: DataFrame) -> DataFrame:
    """I6: strip ``_avg`` suffixes and rename ``time_bucket → time`` so
    chart legends show base column names."""
    out = df
    for c in df.columns:
        if c == "time_bucket":
            out = out.withColumnRenamed(c, "time")
        elif c.endswith("_avg"):
            out = out.withColumnRenamed(c, c[: -len("_avg")])
    return out


def detect_plot_columns(df: DataFrame) -> tuple[str | None, list[str]]:
    """I7: (x_column, y_columns) — datetime dtype first, common-name
    fallback for x; numeric dtypes (minus x) for y."""
    x: str | None = None
    for f in df.schema.fields:
        if isinstance(f.dataType, (TimestampType, DateType)):
            x = f.name
            break
    if x is None:
        lower = {c.lower(): c for c in df.columns}
        for name in COMMON_TIME_NAMES:
            if name in lower:
                x = lower[name]
                break
    ys = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, NumericType) and f.name != x
    ]
    return x, ys


def prepare_plot_dataframe(
    df: DataFrame,
    x_col: str | None = None,
    y_cols: list[str] | None = None,
    threshold: int = LTTB_THRESHOLD,
) -> DataFrame:
    """I4: double-cast → sort by x → LTTB to ≤ threshold points."""
    if x_col is None or y_cols is None:
        det_x, det_ys = detect_plot_columns(df)
        x_col = x_col or det_x
        y_cols = y_cols or det_ys
    if x_col is None or not y_cols:
        return df
    casted = df.select(
        F.col(x_col),
        *[F.col(c).cast("double").alias(c) for c in y_cols],
    ).orderBy(x_col)
    return downsample_single_series(casted, x_col, y_cols, threshold)
