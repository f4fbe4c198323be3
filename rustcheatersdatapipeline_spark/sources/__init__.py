"""Ingestion sources (SURVEY.md §2.1 S1-S15) plus the corpus-scale
extension formats: JSONL interchange (``jsonl``) and WARC/Common Crawl
(``warc`` — bounded-memory record parse, HTML→text distillation,
batch and streaming)."""

from .steam import RateLimiter, SteamFetcher

__all__ = ["RateLimiter", "SteamFetcher"]
