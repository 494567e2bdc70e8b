"""Differential-oracle comparison utilities (mirrors the driver's check:
row count + column names + order-insensitive value comparison)."""

from __future__ import annotations

import numpy as np
import pandas as pd


def canonicalize(pdf: pd.DataFrame, ndigits: int = 6) -> pd.DataFrame:
    """Column-name sort, float rounding (+ -0.0 → 0.0), total row sort."""
    out = pdf.reindex(sorted(pdf.columns), axis=1).copy()
    for c in out.columns:
        s = out[c]
        if pd.api.types.is_float_dtype(s):
            out[c] = s.round(ndigits) + 0.0
        elif pd.api.types.is_integer_dtype(s):
            out[c] = s.astype("int64")
        elif s.dtype == object:
            out[c] = s.astype(str)
    out = out.sort_values(by=list(out.columns), na_position="last").reset_index(
        drop=True
    )
    return out


def assert_frames_match(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, name: str = "") -> None:
    a, b = canonicalize(spark_pdf), canonicalize(duck_pdf)
    assert list(a.columns) == list(b.columns), (
        f"{name}: column mismatch spark={list(a.columns)} duck={list(b.columns)}"
    )
    assert len(a) == len(b), f"{name}: row count spark={len(a)} duck={len(b)}"
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if np.issubdtype(av.dtype, np.floating) or np.issubdtype(bv.dtype, np.floating):
            av = av.astype(float)
            bv = bv.astype(float)
            both_nan = np.isnan(av) & np.isnan(bv)
            ok = both_nan | (av == bv)
        else:
            ok = av == bv
        if not np.all(ok):
            bad = np.flatnonzero(~ok)[:5]
            raise AssertionError(
                f"{name}: column {c!r} differs at rows {bad.tolist()}: "
                f"spark={av[bad].tolist()} duck={bv[bad].tolist()}"
            )


def run_pair(spark, duck, query_fn, sql: str, sf_dir: str, name: str = "") -> None:
    spark_pdf = query_fn(spark, sf_dir).toPandas()
    duck_pdf = duck.execute(sql).fetchdf()
    assert_frames_match(spark_pdf, duck_pdf, name=name)
