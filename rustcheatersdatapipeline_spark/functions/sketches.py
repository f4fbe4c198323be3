"""Mergeable distributed sketches — HyperLogLog distinct counts and
DDSketch relative-error quantiles — in a pure-integer "rows" form.

At 100 TB you cannot afford an exact ``COUNT(DISTINCT …)`` or exact
percentile per refresh, and Spark's built-in approximations
(``approx_count_distinct``, ``approx_percentile``) return only the
final scalar — the internal sketch cannot be PERSISTED and merged
with tomorrow's delta.  These operators materialize the sketch itself
as ordinary rows:

- **HLL rows** ``(keys…, reg, rank)``: register index = low
  HLL_P bits of a portable 60-bit hash, rank = leading-zero count of
  the remaining bits + 1, aggregated by ``MAX(rank)``.  Merging two
  sketches is ``MAX`` re-aggregation — commutative, idempotent, and
  exactly lossless: sketch(A ∪ B) ≡ merge(sketch(A), sketch(B)) as
  integer rows, which the tests assert as set equality (not "close").
- **DDSketch rows** ``(keys…, bucket, n_rows)``: bucket =
  ⌈ln(x)/ln(γ)⌉ with γ = (1+α)/(1−α), so every value in a bucket is
  within relative error α of the bucket's representative
  2γ^i/(γ+1).  Merging is ``SUM`` of bucket counts.  Quantile
  extraction walks the cumulative counts — a window over the bounded
  bucket set, never the raw data.

Both forms plug straight into
``warehouse.views.IncrementalAggregateView`` (``maxes=`` for HLL,
plain count for DDSketch, ``transform=`` to derive reg/rank/bucket
from the raw delta), giving incrementally-maintained approximate
distinct counts and latency/size percentiles per group with
O(delta) refresh cost.

Everything before the float *estimate* step is integer arithmetic on
a hash both engines can compute (the ``portable_hash64`` md5 trick),
so the DuckDB differential oracle matches row-for-row.  The only
cross-engine float is DDSketch's ``ln(x)`` at a ceil boundary
(probability ≈ 1e-16 per distinct value; ``ln(γ)`` itself is passed
as one shared literal, never recomputed).

Rank arithmetic avoids ``log2`` floats entirely: bit_length(w) =
``length(bin(w))`` — both engines print a bigint's binary form
without leading zeros.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: register-index bits / register count (error ≈ 1.04/√m ≈ 6.5 %)
HLL_P = 8
HLL_M = 1 << HLL_P
#: hash width of portable_hash64 (60-bit md5 prefix); rank domain is
#: the remaining HLL_HASH_BITS - HLL_P bits
HLL_HASH_BITS = 60
#: DDSketch relative-error target and derived bucket base
DD_ALPHA = 0.01
DD_GAMMA = (1.0 + DD_ALPHA) / (1.0 - DD_ALPHA)
#: ln(γ) precomputed ONCE and shared as a literal by engine and
#: oracle — neither engine recomputes it, removing one float source
DD_LN_GAMMA = math.log(DD_GAMMA)


def _hash60(col: Column) -> Column:
    """60-bit non-negative deterministic hash (md5 hex prefix) —
    replayable in DuckDB as ('0x'||substr(md5(x),1,15))::BIGINT and
    in Python as int(md5(s).hexdigest()[:15], 16)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def hll_project(df: DataFrame, col: str, keys: list[str]) -> DataFrame:
    """Per-row HLL projection: (keys…, reg, rank) for one value.
    Narrow (no shuffle); aggregate with MAX(rank) by (keys…, reg)."""
    h = _hash60(F.col(col))
    reg = h % F.lit(HLL_M)
    # integer shift, NOT `/` (Spark `/` is double division and a
    # 60-bit hash does not fit a double's 53-bit mantissa)
    w = F.shiftright(h, HLL_P)  # h >= 0, so arithmetic shift == floor div
    wbits = HLL_HASH_BITS - HLL_P
    rank = F.when(w == 0, F.lit(wbits + 1)).otherwise(
        F.lit(wbits) - F.length(F.bin(w)) + 1
    )
    return df.select(
        *[F.col(k) for k in keys],
        reg.cast("int").alias("reg"),
        rank.cast("int").alias("rank"),
    )


def hll_rows(df: DataFrame, col: str, keys: list[str]) -> DataFrame:
    """HLL sketch in rows form: (keys…, reg, rank=max). One shuffle
    with map-side combine — word-count shape, ≤ HLL_M rows per group
    forever.  Merge = union + same aggregation."""
    return (
        hll_project(df, col, keys)
        .groupBy(*keys, "reg")
        .agg(F.max("rank").alias("rank"))
    )


def hll_pack(rows: DataFrame, keys: list[str]) -> DataFrame:
    """Dense form: (keys…, hll array<int> of length HLL_M) — for
    storage as a single column or fast estimation."""
    mm = F.map_from_entries(F.collect_list(F.struct("reg", "rank")))
    return (
        rows.groupBy(*keys)
        .agg(mm.alias("_mm"))
        .select(
            *[F.col(k) for k in keys],
            F.transform(
                F.sequence(F.lit(0), F.lit(HLL_M - 1)),
                lambda i: F.coalesce(F.col("_mm")[i], F.lit(0)),
            ).alias("hll"),
        )
    )


def hll_merge_agg(col: str = "hll") -> Column:
    """Aggregate expression merging packed sketches inside a groupBy:
    element-wise max across the group's arrays (commutative +
    idempotent, so any merge tree yields identical registers)."""
    zero = F.array_repeat(F.lit(0), HLL_M)
    return F.aggregate(
        F.collect_list(col),
        zero,
        lambda acc, x: F.zip_with(acc, x, lambda a, b: F.greatest(a, b)),
    ).alias(col)


def hll_estimate(col: Column | str = "hll") -> Column:
    """Cardinality estimate from a packed sketch (classic HLL with
    linear counting for the small range; the 60-bit hash never needs
    the large-range correction).  Float — for reporting, not for the
    merge contract (registers are the contract)."""
    hll = F.col(col) if isinstance(col, str) else col
    alpha = 0.7213 / (1.0 + 1.079 / HLL_M)
    inv = F.aggregate(
        hll,
        F.lit(0.0),
        lambda acc, r: acc + F.pow(F.lit(2.0), -r.cast("double")),
    )
    raw = F.lit(alpha * HLL_M * HLL_M) / inv
    zeros = F.size(F.filter(hll, lambda r: r == 0))
    lc = F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / zeros)
    return F.when((raw <= F.lit(2.5 * HLL_M)) & (zeros > 0), lc).otherwise(raw)


def dd_project(df: DataFrame, col: str, keys: list[str]) -> DataFrame:
    """Per-row DDSketch projection: (keys…, bucket) with bucket =
    ceil(ln(x)/ln(γ)).  Requires a POSITIVE domain (sizes, latencies,
    counts ≥ 1); non-positive values fail fast at runtime rather than
    silently landing in a wrong bucket."""
    x = F.col(col)
    checked = F.when(x <= 0, F.raise_error(
        F.lit(f"dd_project: non-positive value in column '{col}'")
    )).otherwise(x)
    bucket = F.ceil(F.log(checked.cast("double")) / F.lit(DD_LN_GAMMA))
    return df.select(
        *[F.col(k) for k in keys], bucket.cast("int").alias("bucket")
    )


def dd_rows(df: DataFrame, col: str, keys: list[str]) -> DataFrame:
    """DDSketch in rows form: (keys…, bucket, n_rows).  One shuffle,
    map-side combined; merge = union + SUM."""
    return (
        dd_project(df, col, keys)
        .groupBy(*keys, "bucket")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


def dd_quantile(rows: DataFrame, keys: list[str], q: float) -> DataFrame:
    """q-quantile per group from a rows-form sketch: the smallest
    bucket whose cumulative count reaches ⌈q·n⌉, reported as the
    bucket representative 2γ^i/(γ+1) (within DD_ALPHA relative error
    of the true quantile).  Window over the bounded bucket set only."""
    if not 0.0 < q <= 1.0:
        raise ValueError("dd_quantile: q must be in (0, 1]")
    wcum = (
        Window.partitionBy(*keys)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wtot = Window.partitionBy(*keys)
    c = rows.select(
        *keys,
        "bucket",
        F.sum("n_rows").over(wcum).alias("cum"),
        F.sum("n_rows").over(wtot).alias("tot"),
    )
    picked = (
        c.filter(F.col("cum") >= F.ceil(F.lit(q) * F.col("tot")))
        .groupBy(*keys)
        .agg(F.min("bucket").alias("bucket"))
    )
    value = F.lit(2.0) * F.pow(F.lit(DD_GAMMA), F.col("bucket")) / F.lit(DD_GAMMA + 1.0)
    return picked.select(*keys, "bucket", value.alias("value"))
