"""Spark-vs-DuckDB comparison mirroring the driver's correctness gate:
row-count + column names + order-insensitive value comparison with
columns sorted by name."""

from __future__ import annotations

import datetime
import decimal
import math

import pandas as pd


def _norm_cell(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return None
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, float):
        # exact doubles must match bit-for-bit through repr
        return repr(v)
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    return v


def _normalize(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [tuple(_norm_cell(v) for v in row) for row in df[cols].itertuples(index=False, name=None)]
    return sorted(rows, key=lambda r: tuple((x is None, str(x)) for x in r))


def assert_matches_oracle(spark_df, ddb, sql: str, name: str = "?"):
    sp = spark_df.toPandas()
    du = ddb.execute(sql).df()
    assert sorted(sp.columns) == sorted(du.columns), (
        f"{name}: column mismatch spark={sorted(sp.columns)} duckdb={sorted(du.columns)}"
    )
    assert len(sp) == len(du), f"{name}: row count spark={len(sp)} duckdb={len(du)}"
    nsp, ndu = _normalize(sp), _normalize(du)
    if nsp != ndu:
        diffs = [(a, b) for a, b in zip(nsp, ndu) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")
