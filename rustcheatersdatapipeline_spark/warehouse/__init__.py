"""Gold warehouse layer (SURVEY.md §2.4-§2.5): surrogate keys, date
dimension, merge writers, and the 8 fact-load joins."""

from .loads import FACT_LOADS, build_warehouse
from .writers import (
    date_dim,
    insert_if_absent,
    upsert_latest_wins,
    with_surrogate_key,
)

__all__ = [
    "FACT_LOADS",
    "build_warehouse",
    "date_dim",
    "insert_if_absent",
    "upsert_latest_wins",
    "with_surrogate_key",
]
