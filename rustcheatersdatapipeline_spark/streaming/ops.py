"""Streaming dedup and stream-stream interval join (SURVEY.md §2.7
extensions).

The reference ingests at-least-once (its Airflow retries replay a whole
hourly pull, rust_twitter_steam_pipeline.py:46) and serializes the
resulting duplicates away in Postgres ``ON CONFLICT`` sinks
(sql_queries.py:30-31). A training-data pipeline wants the duplicates
gone *in flight*, before they fan out into joins and aggregations —
that is ``dedup_within_watermark``. The stream-stream interval join is
the streaming twin of the batch equi+range attribution join
(plans/analytics.py ``events_session_attribution``): same user-equi +
time-range shape, expressed once and applied to bounded or unbounded
frames.

Scale notes (100 TB):

- ``dropDuplicatesWithinWatermark`` keeps one state row per distinct
  key seen within the watermark horizon, partitioned by key across the
  cluster (RocksDB state store in production). State is bounded by
  (arrival rate × horizon), NOT by total history — the only shape that
  survives an unbounded stream. A replay carrying its original event
  time behind the watermark is dropped as late data (pinned in
  tests/test_streaming_ops.py); only a re-delivery stamped with a
  FRESH in-window event time after state eviction can re-emit — that
  residual is the documented at-least-once trade, the same one the
  reference makes by scoping its interval filter.
- The interval join carries a time-range predicate on BOTH event-time
  columns, so Spark can evict click state once the watermark passes
  ``click_ts + horizon`` and purchase state once it passes
  ``purchase_ts`` — without the bound the join state grows forever.
  Both sides shuffle on ``user_id``, co-partitioning the equi key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_within_watermark(
    events: DataFrame, keys: list[str] | None = None, watermark: str = "2 hours"
) -> DataFrame:
    """Exact keyed dedup on a stream with watermark-bounded state.

    Streaming twin of the batch D1 keyed dedup (operators/dedup.py) /
    ``dedup_exact``: the first arrival of each key survives, replays
    within the watermark horizon are dropped in flight.
    """
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        keys or ["event_id"]
    )


def sessionize_native(events: DataFrame, gap_min: int = 30) -> DataFrame:
    """Gap-based sessionization via Spark's native ``session_window`` —
    ONE expression for batch and streaming frames.

    Cross-validates the engine's two other sessionizers (the batch
    lag+running-sum plan in plans/analytics.py and the
    ``applyInPandasWithState`` streaming operator): three independent
    implementations, one session set. Emits the same shape as
    ``events_sessionize``; ``session_window.end`` is last-event + gap by
    definition, so the gap is subtracted back to report the last event.

    Boundary note: ``session_window`` closes a session when the next
    event is >= gap after the last, the lag plan when it is > gap —
    they differ only for gaps of EXACTLY ``gap_min``, measure-zero on
    microsecond timestamps (and absent from the test data by assertion).
    """
    return (
        events.groupBy(
            "user_id", F.session_window("ts", f"{gap_min} minutes").alias("w")
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format(
                F.col("w.end") - F.expr(f"INTERVAL {gap_min} MINUTE"),
                "yyyy-MM-dd HH:mm:ss",
            ).alias("session_end"),
            "n_events",
        )
    )


def click_purchase_pairs(
    clicks: DataFrame, purchases: DataFrame, horizon: str = "1 hour"
) -> DataFrame:
    """Equi+range join: purchases within ``horizon`` after a click by
    the same user. ONE transformation for batch and streaming frames —
    the unbounded-table model guarantees identical semantics (same
    argument as ``hourly_event_counts``).

    The range predicate bounds join state when both inputs are streams;
    on batch frames Catalyst plans the same hash join on ``user_id``
    with the range evaluated inline (no interval explosion).
    """
    c = clicks.select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    return c.join(
        p,
        F.expr(
            "c_user = p_user AND purchase_ts >= click_ts "
            f"AND purchase_ts <= click_ts + INTERVAL {horizon}"
        ),
    ).select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "purchase_id",
        "click_ts",
        "purchase_ts",
    )


def stream_click_attribution(
    clicks: DataFrame,
    purchases: DataFrame,
    horizon: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream inner interval join with watermarks on both sides.

    ``watermark`` must cover ``horizon`` plus the out-of-orderness
    budget, or in-window pairs whose click arrives late are lost.
    """
    return click_purchase_pairs(
        clicks.withWatermark("ts", watermark),
        purchases.withWatermark("ts", watermark),
        horizon,
    )
