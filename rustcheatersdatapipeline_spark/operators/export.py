"""Training-export layout: deterministic epoch shuffle + sized shards.

The last step of a curation pipeline (plans/training.py
``curate_corpus``) is handing the corpus to a trainer, which needs
(a) a different-but-reproducible global permutation per epoch and
(b) fixed-size shards so data-loader workers stripe evenly.

Scale design:

- ``epoch_shuffle`` orders by ``xxhash64(key, seed)`` — a uniform
  pseudo-random permutation that is a RANGE shuffle (repartitionByRange
  samples bounds, every partition sorts locally), not a single-reducer
  global sort. Uniform hash values mean no skew by construction, and
  the permutation is a pure function of (keys, seed): any worker, any
  retry, any cluster size reproduces byte-identical epoch order.
- ``write_training_shards`` caps rows per output file with Spark's
  ``maxRecordsPerFile`` — the writer splits files at the cap without an
  extra shuffle, so shard sizing is free on top of the epoch shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: hash column name used for epoch ordering (dropped before write)
_ORDER_COL = "_epoch_order"


def epoch_shuffle(
    df: DataFrame, seed: int, key_cols: list[str], num_partitions: int = 32
) -> DataFrame:
    """Deterministic global permutation keyed by ``(key_cols, seed)``.

    Returns the frame ordered by the hash, with partition i holding
    hash-range i (so reading files/partitions in order replays the
    permutation). A new ``seed`` is a statistically independent
    permutation — one per training epoch.
    """
    order = F.xxhash64(*[F.col(c) for c in key_cols], F.lit(seed))
    return (
        df.withColumn(_ORDER_COL, order)
        .repartitionByRange(num_partitions, _ORDER_COL)
        .sortWithinPartitions(_ORDER_COL)
    )


#: shard output formats: parquet for Spark/Arrow loaders, ORC for Hive
#: ecosystems, json(l) for line-oriented tokenizer feeds — all three
#: JVM-native writers, same maxRecordsPerFile sizing contract
SHARD_FORMATS = ("parquet", "orc", "json")


def write_training_shards(
    df: DataFrame,
    path: str,
    seed: int,
    key_cols: list[str],
    rows_per_shard: int = 10_000,
    num_partitions: int = 32,
    fmt: str = "parquet",
) -> None:
    """Epoch-shuffle then write shards of at most ``rows_per_shard``
    rows each, in any of ``SHARD_FORMATS`` (``json`` writes JSONL — one
    object per line, the tokenizer-feed interchange the jsonl SOURCE
    already reads back)."""
    if fmt not in SHARD_FORMATS:
        raise ValueError(f"write_training_shards: unknown format {fmt!r}")
    (
        epoch_shuffle(df, seed, key_cols, num_partitions)
        .drop(_ORDER_COL)
        .write.option("maxRecordsPerFile", rows_per_shard)
        .mode("overwrite")
        .format(fmt)
        .save(path)
    )


def _sniff_shard_format(path: str) -> str:
    """Which SHARD_FORMATS the directory holds, from file extensions —
    the manifest writer reads back files this module itself wrote, so
    the extension is authoritative (this is not external-input schema
    inference)."""
    import os

    for f in sorted(os.listdir(path)):
        for fmt in SHARD_FORMATS:
            if f.endswith(f".{fmt}") or (fmt == "parquet" and f.endswith(".zstd.parquet")):
                return fmt
    return "parquet"


def write_shard_manifest(spark, path: str) -> dict:
    """``_shard_manifest.json`` next to the shards: per-file row count,
    byte size, and an order-independent content digest (sum of per-row
    ``xxhash64`` over all columns, mod 2^63) — what a data-loader needs
    to stripe workers evenly, resume mid-epoch, and detect a torn or
    stale shard WITHOUT re-reading the corpus (digest check is one
    column scan of the suspect shard only).

    One pass over the shards computes all three; the manifest is
    written atomically (tmp + rename). Returns the manifest dict."""
    import json
    import os

    fmt = _sniff_shard_format(path)
    df = spark.read.format(fmt).load(path)
    per = (
        df.withColumn("_f", F.input_file_name())
        .withColumn("_h", F.xxhash64(*df.columns))
        .groupBy("_f")
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.sum(F.col("_h").cast("decimal(38,0)")).alias("hsum"),
        )
        .collect()
    )
    shards = []
    for r in sorted(per, key=lambda r: r["_f"]):
        fname = os.path.basename(r["_f"])
        shards.append(
            {
                "file": fname,
                "rows": r["rows"],
                "bytes": os.path.getsize(os.path.join(path, fname)),
                "digest": int(r["hsum"]) % (1 << 63),
            }
        )
    manifest = {
        "format": fmt,
        "n_shards": len(shards),
        "n_rows": sum(s["rows"] for s in shards),
        "shards": shards,
    }
    tmp = os.path.join(path, "_shard_manifest.json.tmp")
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmp, os.path.join(path, "_shard_manifest.json"))
    return manifest
