"""Deterministic dataset splitting and exact-size uniform sampling.

Training pipelines need train/val/test splits that are (a) reproducible
across runs and cluster sizes, (b) leakage-safe — every row of one
logical group (a domain, an author, a dedup cluster) must land in the
SAME split, or near-identical documents straddle train and eval — and
(c) computed without a driver-side shuffle of anything.

``randomSplit`` gives none of that (row-order dependent, no grouping);
the standard fix is hashing: split = where ``xxhash64(group_keys,
seed)`` falls in [0,1) partitioned by the cumulative weights. Pure
codegen, zero shuffles, stable under repartitioning — the same
construction as ``stratified_sample``'s per-stratum rates
(plans/training.py) and ``epoch_shuffle``'s permutation
(operators/export.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: 2**64 as float, for mapping xxhash64 into [0, 1)
_U64 = float(2**64)


def _unit_hash(key_cols: list[str], seed: int) -> Column:
    """xxhash64 of the keys mapped uniformly into [0, 1)."""
    h = F.xxhash64(*[F.col(c) for c in key_cols], F.lit(seed))
    return (h.cast("double") / F.lit(_U64)) + F.lit(0.5)


def hash_split(
    df: DataFrame,
    weights: dict[str, float],
    key_cols: list[str],
    seed: int = 0,
    split_col: str = "split",
) -> DataFrame:
    """Tag every row with its split name, deterministically by
    ``key_cols``.

    Rows sharing ``key_cols`` values share a split (leakage safety);
    expected proportions are ``weights`` (normalized). The tag is ONE
    codegen expression evaluated in the scan stage — a downstream
    ``split == 'train'`` filter costs no extra pass and no shuffle.
    """
    total = sum(weights.values())
    u = _unit_hash(key_cols, seed)
    expr: Column | None = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name] / total
        branch = F.when(u < F.lit(acc), F.lit(name))
        expr = branch if expr is None else expr.when(u < F.lit(acc), F.lit(name))
    expr = F.lit(names[0]) if expr is None else expr.otherwise(F.lit(names[-1]))
    return df.withColumn(split_col, expr)


def uniform_sample_k(
    df: DataFrame, k: int, key_cols: list[str], seed: int = 0
) -> DataFrame:
    """EXACTLY min(k, n) rows, uniformly without replacement.

    Construction: the k smallest ``xxhash64(keys, seed)`` values — every
    size-k subset is equally likely because the hash induces a uniform
    random total order. Plans as TakeOrderedAndProject (per-partition
    top-k, then a k-row merge on one reducer — bounded by k, not n),
    unlike ``df.sample`` (Bernoulli: approximate size) or
    ``orderBy().limit()`` on data columns (biased).
    """
    return (
        df.withColumn("_u", _unit_hash(key_cols, seed))
        .orderBy("_u")
        .limit(k)
        .drop("_u")
    )
