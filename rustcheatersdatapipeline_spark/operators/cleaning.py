"""Row-level cleaning operators (SURVEY.md §2.2 P9-P15).

All are single narrow projections: Catalyst collapses any chain of them
into one stage with no shuffle, so composing them freely is free at any
scale (unlike the reference's eager pandas, which materializes a full
frame per step — SURVEY.md §3.2).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def drop_null_rows(df: DataFrame, cols: list[str]) -> DataFrame:
    """P8 null-drop (reference rust_twitter_steam_dims.py:33).

    Semantically identical to ``df.na.drop(subset=cols)`` (how='any'),
    but expressed as an explicit isNotNull conjunction: na.drop compiles
    to ``AtLeastNNonNulls``, which Catalyst can NOT translate into a
    parquet pushed filter, while IsNotNull conjunctions reach the scan
    and skip row groups — the difference between reading and not reading
    data at 100 TB (verified in tests/test_plan_shape.py).
    """
    pred = None
    for c in cols:
        p = F.col(c).isNotNull()
        pred = p if pred is None else (pred & p)
    return df.filter(pred)


def ensure_columns(df: DataFrame, columns: dict[str, str]) -> DataFrame:
    """P11 ensure-columns-exist (reference rust_twitter_steam_dims.py:482-492):
    add any absent column as a typed null. With pinned bronze schemas this
    is rarely needed, but kept for schema-drift tolerance on foreign data."""
    existing = set(df.columns)
    to_add = {c: t for c, t in columns.items() if c not in existing}
    if not to_add:
        return df
    return df.withColumns({c: F.lit(None).cast(t) for c, t in to_add.items()})


def conditional_overwrite(
    df: DataFrame, target: str, source: str, when_value: str = ""
) -> DataFrame:
    """P9 conditional overwrite (reference rust_twitter_steam_dims.py:29):
    if ``target == when_value`` copy ``source`` into it. Triggers on the
    empty string only — null stays null (SURVEY.md §7.3.6)."""
    return df.withColumn(
        target,
        F.when(F.col(target) == when_value, F.col(source)).otherwise(F.col(target)),
    )


def epoch_to_ts(col: str | Column) -> Column:
    """P13 epoch→timestamp (reference rust_twitter_steam_facts.py:31-33):
    unix seconds → UTC TimestampType; 0/invalid handled upstream. The
    reference's errors='coerce' NaT becomes null via nullable input."""
    c = F.col(col) if isinstance(col, str) else col
    return F.timestamp_seconds(c.cast("long"))


def time_of_day(col: str | Column) -> Column:
    """J10 time-of-day projection (reference sql_queries.py:21): Postgres
    `time with time zone` has no Spark equivalent — engine contract is the
    'HH:mm:ss' string (SURVEY.md §7.3, Q30)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, "HH:mm:ss")
