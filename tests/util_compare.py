"""Spark ↔ DuckDB differential comparison, mirroring the driver's
row-count + column-set + order-insensitive value check (strict: exact
equality, including floats — the engine's decimal-sum discipline makes
float aggregates bit-identical across engines)."""

from __future__ import annotations

import math

import pandas as pd


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize dtypes: everything to python objects for comparison
    out = df.copy()
    for c in out.columns:
        col = out[c]
        if str(col.dtype).startswith("datetime"):
            out[c] = col.astype("datetime64[us]").dt.strftime("%Y-%m-%d %H:%M:%S.%f")
        elif col.dtype == object:
            import datetime

            def _norm(v):
                if isinstance(v, (list, tuple)):
                    return tuple(v)
                if isinstance(v, datetime.datetime):
                    return v.strftime("%Y-%m-%d %H:%M:%S.%f")
                if isinstance(v, datetime.date):
                    return v.strftime("%Y-%m-%d") + " 00:00:00.000000"
                return v

            out[c] = col.map(_norm)
    rows = [tuple(r) for r in out.itertuples(index=False, name=None)]
    rows.sort(key=lambda r: tuple((x is None or (isinstance(x, float) and math.isnan(x)), str(x)) for x in r))
    return pd.DataFrame(rows, columns=list(out.columns))


def assert_frames_match(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, name: str) -> None:
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"{name}: column mismatch spark={sorted(spark_pdf.columns)} duck={sorted(duck_pdf.columns)}"
    )
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: row count spark={len(spark_pdf)} duck={len(duck_pdf)}"
    )
    a, b = normalize(spark_pdf), normalize(duck_pdf)
    for c in a.columns:
        av, bv = list(a[c]), list(b[c])
        for i, (x, y) in enumerate(zip(av, bv)):
            xnan = isinstance(x, float) and math.isnan(x)
            ynan = isinstance(y, float) and math.isnan(y)
            if xnan and ynan:
                continue
            if x is None and y is None:
                continue
            # pandas may surface SQL NULL as None / NaN / NaT interchangeably
            if (x is None or xnan or x is pd.NaT) and (y is None or ynan or y is pd.NaT):
                continue
            # array columns arrive as list (Spark) / ndarray (DuckDB)
            if isinstance(x, (list, tuple)) or hasattr(x, "tolist"):
                x = tuple(x.tolist() if hasattr(x, "tolist") else x)
            if isinstance(y, (list, tuple)) or hasattr(y, "tolist"):
                y = tuple(y.tolist() if hasattr(y, "tolist") else y)
            assert x == y, f"{name}: col {c} row {i}: spark={x!r} duck={y!r}"
