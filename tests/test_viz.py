"""Visualization-prep operators (reference I4-I7)."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from oracle_duckdb_sync_spark.plans import viz


def test_padded_y_range(spark):
    df = spark.createDataFrame([Row(v=0.0), Row(v=100.0), Row(v=float("nan"))])
    lo, hi = viz.padded_y_range(df, "v")
    assert lo == pytest.approx(-5.0) and hi == pytest.approx(105.0)

    flat = spark.createDataFrame([Row(v=7.0), Row(v=7.0)])
    assert viz.padded_y_range(flat, "v") == (6.5, 7.5)

    empty = spark.createDataFrame([], "v double")
    assert viz.padded_y_range(empty, "v") is None


def test_rename_for_viz(spark):
    df = spark.createDataFrame(
        [Row(time_bucket=datetime(2024, 1, 1), temp_avg=1.0, temp_max=2.0)]
    )
    out = viz.rename_for_viz(df)
    assert out.columns == ["time", "temp", "temp_max"]


def test_detect_plot_columns_dtype_and_fallback(spark):
    df = spark.createDataFrame(
        [Row(ts=datetime(2024, 1, 1), a=1.0, b=2, s="x")]
    )
    x, ys = viz.detect_plot_columns(df)
    assert x == "ts" and ys == ["a", "b"]

    # no datetime dtype → common-name fallback
    df2 = spark.createDataFrame([Row(timestamp="20240101", a=1.0)])
    x2, ys2 = viz.detect_plot_columns(df2)
    assert x2 == "timestamp" and ys2 == ["a"]

    df3 = spark.createDataFrame([Row(s="x", t="y")])
    assert viz.detect_plot_columns(df3) == (None, [])


def test_prepare_plot_dataframe_downsamples(spark):
    rows = [
        Row(ts=datetime(2024, 1, 1, i // 3600, (i // 60) % 60, i % 60), v=float(i))
        for i in range(3000)
    ]
    df = spark.createDataFrame(rows)
    out = viz.prepare_plot_dataframe(df, threshold=100)
    pdf = out.toPandas()
    assert len(pdf) == 100
    assert pdf["v"].dtype == float
