"""Skew-mitigation utilities (SURVEY.md §4 scale notes).

AQE's skew-join handling (on in session.py) covers sort-merge joins at
runtime; these utilities cover the cases AQE can't re-plan:

- ``salted_aggregate``: two-phase aggregation for heavy-hitter group
  keys — partial agg on (key, salt), final agg on key. The shuffled
  volume per reducer is bounded by #salts regardless of key skew.
- ``salted_join``: replicate the small side per salt so a skewed big
  side spreads one hot key over #salts reducers. Only for joins AQE
  can't fix (e.g. forced shuffle-hash with extreme single-key skew).

Both are semantics-preserving rewrites — results are identical to the
unsalted forms, which the tests assert.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: decomposable aggregates: (partial expr builder, final expr builder)
_MERGEABLE = {
    "sum": (F.sum, F.sum),
    "count": (lambda c: F.count(c), F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs`` maps output column → (agg_name, input_column) with
    agg_name in {sum, count, min, max} (the decomposable set; avg =
    sum/count composed by the caller).
    """
    salted = df.withColumn("__salt", F.pmod(F.spark_partition_id() + F.monotonically_increasing_id(), F.lit(n_salts)))
    partial = salted.groupBy(*keys, "__salt").agg(
        *[_MERGEABLE[a][0](F.col(c)).alias(out) for out, (a, c) in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[_MERGEABLE[a][1](F.col(out)).alias(out) for out, (a, c) in aggs.items()]
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the big side, explode the small side
    across all salts, join on (key, salt)."""
    big_s = big.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salts))
    )
    small_s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("__salt", F.col("__salt").cast("long"))
    out = big_s.join(small_s, on=[key, "__salt"], how=how)
    return out.drop("__salt")
