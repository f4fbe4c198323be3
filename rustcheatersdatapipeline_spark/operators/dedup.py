"""Dedup + data-quality assertion operators (SURVEY.md §2.3 D1-D3).

The reference fails the whole task on contract violations
(rust_twitter_steam_dims.py:49-50 "Data Contains Duplicate Rows",
rust_twitter_steam_facts.py:53-54 "...Missing Data NaN/Null"); here the
assertions are testable check functions that raise ``ValidationError``.
Both are single-aggregate jobs — cheap at any scale (count + distinct
count shuffle once with partial aggregation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


class ValidationError(Exception):
    """Batch-level data-quality contract violation (fails the batch)."""


def keyed_dedup(df: DataFrame, keys: list[str], order_by: list[str] | None = None) -> DataFrame:
    """D1 keyed dedup with a DETERMINISTIC survivor.

    pandas drop_duplicates keeps first-in-file-order (reference
    rust_twitter_steam_dims.py:533); Spark dropDuplicates keeps an
    arbitrary partition-dependent row. The engine pins the survivor with
    row_number over an explicit ordering (SURVEY.md §7.3.3, Q12 form) —
    default ordering: the remaining columns, so identical inputs give
    identical outputs on any cluster layout.
    """
    order_by = order_by or [c for c in df.columns if c not in keys] or keys
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def assert_no_duplicates(df: DataFrame, keys: list[str] | None = None) -> DataFrame:
    """D2 duplicate-row assertion (reference rust_twitter_steam_dims.py:49-50)."""
    total = df.count()
    distinct = (df.select(*keys) if keys else df).distinct().count()
    if total != distinct:
        raise ValidationError(
            f"Data Contains Duplicate Rows: {total - distinct} duplicates"
        )
    return df


def assert_no_nulls(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """D3 null assertion (reference rust_twitter_steam_facts.py:53-54).

    The reference checks the whole frame by default but exempts columns
    per transform (unlock_ts at facts.py:53; steam_id-only checks at
    :516,:631) — so the column list is explicit here too.
    """
    cols = cols or df.columns
    pred = None
    for c in cols:
        p = F.col(c).isNull()
        pred = p if pred is None else (pred | p)
    n = df.filter(pred).count()
    if n:
        raise ValidationError(f"Data Contains Missing Data NaN/Null: {n} rows")
    return df
