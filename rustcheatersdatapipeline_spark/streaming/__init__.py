"""Structured Streaming surface (SURVEY.md §2.7)."""

from .hourly import (
    events_stream_schema,
    hourly_event_counts,
    open_events_stream,
    stream_hourly_counts,
)
from .sink import GoldStoreMergeSink, ParquetMergeSink

__all__ = [
    "GoldStoreMergeSink",
    "ParquetMergeSink",
    "events_stream_schema",
    "hourly_event_counts",
    "open_events_stream",
    "stream_hourly_counts",
]
