"""Structured Streaming surface (SURVEY.md §2.7)."""

from .hourly import hourly_event_counts, stream_hourly_counts

__all__ = ["hourly_event_counts", "stream_hourly_counts"]
