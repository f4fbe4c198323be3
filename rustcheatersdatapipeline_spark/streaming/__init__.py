"""Structured Streaming surface (SURVEY.md §2.7)."""

from .hourly import (
    events_stream_schema,
    hourly_event_counts,
    open_events_stream,
    stream_hourly_counts,
)
from .ingest import CorpusIngestSink, EmbeddingIngestSink, IncrementalIngestSink
from .ops import (
    click_purchase_pairs,
    dedup_within_watermark,
    sessionize_native,
    stream_click_attribution,
)
from .sink import GoldStoreMergeSink, ParquetMergeSink

__all__ = [
    "CorpusIngestSink",
    "EmbeddingIngestSink",
    "GoldStoreMergeSink",
    "IncrementalIngestSink",
    "ParquetMergeSink",
    "click_purchase_pairs",
    "dedup_within_watermark",
    "events_stream_schema",
    "hourly_event_counts",
    "open_events_stream",
    "sessionize_native",
    "stream_click_attribution",
    "stream_hourly_counts",
]
