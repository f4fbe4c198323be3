"""Warehouse write primitives (SURVEY.md §2.5 D11-D15).

The reference gets these from Postgres: sequences for surrogate keys
(data_warehouse.sql:25), ``ON CONFLICT DO NOTHING`` (LoadDimsOperator.py:25-28)
and ``ON CONFLICT DO UPDATE`` (sql_queries.py:95-101). Spark has no
transactional sequences, so the engine's contracts are:

- D14 surrogate keys: deterministic ``row_number() over (order by
  natural key)`` + current max offset — NOT monotonically_increasing_id,
  whose values depend on partition layout (SURVEY.md §7.3.1). The global
  window sort is acceptable because it runs over DIMENSION deltas (new
  keys per batch), never over fact volumes.
- D11 insert-if-absent: left-anti join + union (Q18 form).
- D12 upsert latest-wins: union + row_number over (key, priority desc)
  (Q19 form) — incoming rows outrank existing rows.

At 100 TB these run per-batch on batch-sized deltas against key-bucketed
gold tables; the anti-join broadcasts the delta, not the target.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def with_surrogate_key(
    df: DataFrame, order_cols: list[str], sk_col: str, offset: int = 0
) -> DataFrame:
    """D14: assign ``sk_col`` = row_number over the natural-key ordering,
    offset by the target's current max (pass offset=max_existing_sk)."""
    w = Window.orderBy(*order_cols)
    return df.withColumn(sk_col, (F.row_number().over(w) + F.lit(offset)).cast("int"))


def insert_if_absent(target: DataFrame, incoming: DataFrame, keys: list[str]) -> DataFrame:
    """D11 ``ON CONFLICT DO NOTHING``: append only rows whose key is not
    already present (left-anti + union)."""
    fresh = incoming.join(target.select(*keys).distinct(), on=keys, how="left_anti")
    return target.unionByName(fresh)


def upsert_latest_wins(
    target: DataFrame, incoming: DataFrame, keys: list[str]
) -> DataFrame:
    """D12 ``ON CONFLICT DO UPDATE``: incoming overwrites matching keys
    (SCD-1). Survivor pinned by explicit priority, so re-running the same
    batch is a no-op (idempotent sink, §2.7)."""
    tagged = target.withColumn("__prio", F.lit(0)).unionByName(
        incoming.withColumn("__prio", F.lit(1))
    )
    w = Window.partitionBy(*keys).orderBy(F.col("__prio").desc())
    return (
        tagged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__prio", "__rn")
    )


def date_dim(
    spark: SparkSession, start: _dt.date, end: _dt.date, offset: int = 0
) -> DataFrame:
    """D15 date-dimension derivation (reference data_warehouse.sql:65-74,
    populated out-of-band): one row per calendar day in [start, end]."""
    days = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit(start).cast("date"), F.lit(end).cast("date"), F.expr("interval 1 day")
            )
        ).alias("full_date")
    )
    return days.select(
        (
            F.row_number().over(Window.orderBy("full_date")) + F.lit(offset)
        ).cast("int").alias("date_sk"),
        "full_date",
        F.dayofmonth("full_date").alias("day"),
        F.month("full_date").alias("month"),
        F.year("full_date").alias("year"),
        F.date_format("full_date", "EEEE").alias("week_day"),
    )
