"""Z-order (Morton-curve) data layout for multi-column data skipping.

The reference's only layout lever is its date-partitioned S3 key scheme
(dags/custom_operators/TwitterToS3Operator.py key format) — one
dimension. Parquet min/max row-group stats let a 100 TB scan skip files
on ANY column, but only if the writer clustered the data so each file
covers a small range of that column. Linear sort clusters ONE column
perfectly and leaves the others striped across every file; interleaving
the bits of several columns' bucket ranks (the Morton / Z-order curve,
public technique used by Delta Lake's OPTIMIZE ZORDER BY and
Databricks' liquid clustering) gives every indexed column locality, so
a conjunctive range predicate prunes on all of them.

Scale design:

- Bucket ranks come from ``width_bucket`` over the column's global
  min/max — ONE bounded aggregate (2 scalars per column) feeds the
  expression; no window, no global sort bottleneck, no driver data.
- The interleave itself is an unrolled shift/mask expression — pure
  codegen, zero Python in the hot path.
- ``repartitionByRange`` on the z-value range-shuffles once (AQE picks
  real bounds by sampling) and ``sortWithinPartitions`` makes each
  output file a compact z-range → tight per-file min/max on every
  indexed column.
"""

from __future__ import annotations

import functools

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: bits per indexed column; 2 cols x 8 bits = 65536 z-cells, plenty of
#: resolution for file/row-group skipping while keeping the unrolled
#: interleave expression small.
DEFAULT_BITS = 8


def _bucket_rank(col: Column, cmin: Column, cmax: Column, bits: int) -> Column:
    """Equal-width bucket rank in [0, 2**bits) with degenerate-range
    guards: all-equal column → rank 0 everywhere; NULL min/max (all-null
    column) or a NULL value → rank 0, never a NULL rank — a NULL
    ``_zvalue`` would collapse ``repartitionByRange`` into one partition
    and silently destroy the clustering."""
    n = 2**bits
    # width_bucket returns 1..n+1 (n+1 only for x == max with exclusive
    # upper); clamp into [0, n-1]
    raw = F.width_bucket(col.cast("double"), cmin, cmax, F.lit(n)) - F.lit(1)
    return (
        F.when(cmin.isNull() | cmax.isNull() | col.isNull() | (cmax <= cmin), F.lit(0))
        .otherwise(F.least(F.greatest(raw, F.lit(0)), F.lit(n - 1)))
        .cast("long")
    )


def _interleave(ranks: list[Column], bits: int) -> Column:
    """Morton interleave: bit i of column j lands at position
    i * n_cols + j. Unrolled into a flat BITOR of shift/mask terms —
    whole-stage-codegen friendly, no UDF."""
    n = len(ranks)
    terms = [
        F.shiftleft(F.shiftright(r, i).bitwiseAND(F.lit(1)), i * n + j)
        for i in range(bits)
        for j, r in enumerate(ranks)
    ]
    # terms occupy disjoint bit positions, so BITOR == sum; use bitwiseOR
    # (operator.or_ on Columns is the boolean OR)
    return functools.reduce(Column.bitwiseOR, terms).alias("_zvalue")


def zorder_value(df: DataFrame, cols: list[str], bits: int = DEFAULT_BITS) -> DataFrame:
    """Append ``_zvalue``: the Morton code of the columns' bucket ranks.

    The min/max aggregate is evaluated eagerly (2 scalars per column —
    bounded at any data size) so the returned frame is a plain
    single-scan plan.
    """
    stats = df.agg(
        *[F.min(c).cast("double").alias(f"_min_{c}") for c in cols],
        *[F.max(c).cast("double").alias(f"_max_{c}") for c in cols],
    ).collect()[0]
    ranks = [
        _bucket_rank(
            F.col(c),
            F.lit(stats[f"_min_{c}"]),
            F.lit(stats[f"_max_{c}"]),
            bits,
        )
        for c in cols
    ]
    return df.withColumn("_zvalue", _interleave(ranks, bits))


def write_zordered(
    df: DataFrame,
    cols: list[str],
    path: str,
    num_files: int = 16,
    bits: int = DEFAULT_BITS,
) -> None:
    """Rewrite ``df`` as ``num_files`` parquet files clustered along the
    Z-curve of ``cols`` (the OPTIMIZE ZORDER BY shape): range-partition
    on the z-value, sort within partitions, drop the helper column."""
    (
        zorder_value(df, cols, bits)
        .repartitionByRange(num_files, "_zvalue")
        .sortWithinPartitions("_zvalue")
        .drop("_zvalue")
        .write.mode("overwrite")
        .parquet(path)
    )
