"""Operator library — SURVEY.md §2.2 (row-level), §2.3 (dedup/validate).

Pure ``DataFrame -> DataFrame`` functions; each maps to one reference
operator row (P*/D* ids from SURVEY.md §2) and is unit-tested in
tests/test_operators.py.
"""

from .cleaning import (
    conditional_overwrite,
    drop_null_rows,
    ensure_columns,
    epoch_to_ts,
    time_of_day,
)
from .dedup import (
    ValidationError,
    assert_no_duplicates,
    assert_no_nulls,
    keyed_dedup,
)
from .flatten import explode_wrapper

__all__ = [
    "ValidationError",
    "assert_no_duplicates",
    "assert_no_nulls",
    "conditional_overwrite",
    "drop_null_rows",
    "ensure_columns",
    "epoch_to_ts",
    "explode_wrapper",
    "keyed_dedup",
    "time_of_day",
]
