"""Ingestion sources (SURVEY.md §2.1 S1-S15)."""

from .steam import RateLimiter, SteamFetcher

__all__ = ["RateLimiter", "SteamFetcher"]
