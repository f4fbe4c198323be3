"""Custom stateful streaming operator: gap-based sessionization with
``applyInPandasWithState`` (SURVEY.md §2.7 extension).

The reference has no arbitrary stateful ops (its state lives in the
warehouse upserts); a training-data pipeline needs them — this is the
canonical one. Per-user session state (start, last ts, count) lives in
the Spark state store, partitioned by user_id, so it scales with
#users across executors, not with event volume.

Semantics: events for a user are processed in event-time order within
a micro-batch; a gap > ``gap_min`` closes the open session and emits
it. Open sessions persist in state across batches and are emitted when
the processing-time timeout fires (idle user) — the streaming version
of the batch ``events_sessionize`` query (plans/analytics.py), which
emits every session including open ones.
"""

from __future__ import annotations

import datetime as _dt
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_OUT_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, n_events bigint"
)
STATE_SCHEMA = "start long, last long, n long"  # epoch micros + count


def _micros(ts) -> int:
    if isinstance(ts, pd.Timestamp):
        ts = ts.to_pydatetime()
    return int(ts.replace(tzinfo=_dt.timezone.utc).timestamp() * 1_000_000)


def _from_micros(us: int) -> _dt.datetime:
    return _dt.datetime.fromtimestamp(us / 1_000_000, tz=_dt.timezone.utc).replace(
        tzinfo=None
    )


def make_sessionizer(gap_min: int = 30, idle_timeout_ms: int = 60_000):
    """Build the (key, batches, state) handler for applyInPandasWithState."""
    gap_us = gap_min * 60 * 1_000_000

    def handle(
        key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield pd.DataFrame(
                [
                    {
                        "user_id": user_id,
                        "session_start": _from_micros(start),
                        "session_end": _from_micros(last),
                        "n_events": n,
                    }
                ]
            )
            return

        ts_list: list[int] = []
        for pdf in batches:
            ts_list.extend(_micros(t) for t in pdf["ts"])
        ts_list.sort()

        start, last, n = state.get if state.exists else (None, None, 0)
        closed = []
        for t in ts_list:
            if start is None:
                start, last, n = t, t, 1
            elif t - last > gap_us:
                closed.append((start, last, n))
                start, last, n = t, t, 1
            else:
                last, n = t, n + 1
        state.update((start, last, n))
        state.setTimeoutDuration(idle_timeout_ms)
        if closed:
            yield pd.DataFrame(
                [
                    {
                        "user_id": user_id,
                        "session_start": _from_micros(s),
                        "session_end": _from_micros(e),
                        "n_events": c,
                    }
                    for s, e, c in closed
                ]
            )

    return handle


def stream_sessionize(
    events: DataFrame, gap_min: int = 30, idle_timeout_ms: int = 60_000
) -> DataFrame:
    """Apply the stateful sessionizer to a streaming events frame.

    ``idle_timeout_ms`` controls when open sessions flush: production
    uses a real idle bound; tests pin it high so only gap-closed
    sessions emit (deterministic output).
    """
    return events.groupBy("user_id").applyInPandasWithState(
        make_sessionizer(gap_min, idle_timeout_ms),
        outputStructType=SESSION_OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
