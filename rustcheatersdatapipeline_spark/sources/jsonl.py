"""JSONL document interchange — the lingua franca of LLM corpora.

Public corpora ship as gzipped JSON-lines with a text field and loose
metadata; trainers and data loaders consume the same shape back. The
reader follows the engine's bronze discipline (pipeline.py
``read_bronze``): schema PINNED (never inferred — inference costs an
extra full scan and drifts with the data), PERMISSIVE parse with the
corrupt rows split into a quarantine frame instead of killing the scan
or silently nulling (SURVEY.md §1.4).

Scale: JSON-lines is splittable (and .gz line files split per-file), so
the read parallelizes per file/block; the writer rides
``maxRecordsPerFile`` like the parquet shard path. Compression is
codec-option only — no code change between plain and gzip.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

#: the engine's documents-table interchange schema (TESTDATA.md shape)
DOCUMENTS_JSONL_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
    ]
)


def read_documents_jsonl(
    spark: SparkSession, path: str, schema: StructType | None = None
) -> tuple[DataFrame, DataFrame]:
    """(good, quarantine) from JSONL files at ``path``.

    ``good`` carries the pinned schema plus a derived ``n_chars``;
    ``quarantine`` holds the raw line of every record that failed to
    parse or had no ``text`` — routed to a dead-letter sink, never
    dropped silently.
    """
    schema = schema or DOCUMENTS_JSONL_SCHEMA
    probed = StructType(
        [*schema.fields, StructField("_corrupt_record", StringType(), True)]
    )
    df = (
        spark.read.schema(probed)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
        .cache()  # required to filter on the corrupt column alone
    )
    bad = F.col("_corrupt_record").isNotNull() | F.col("text").isNull()
    quarantine = df.filter(bad).select(
        F.coalesce(F.col("_corrupt_record"), F.to_json(F.struct(*schema.names))).alias(
            "raw"
        )
    )
    good = (
        df.filter(~bad)
        .drop("_corrupt_record")
        .withColumn("n_chars", F.length("text").cast("long"))
    )
    return good, quarantine


def write_documents_jsonl(
    df: DataFrame,
    path: str,
    rows_per_shard: int = 10_000,
    compression: str | None = None,
) -> None:
    """Sized JSONL shards (optionally gzip) — the trainer-facing twin of
    ``operators/export.py write_training_shards``."""
    w = df.write.option("maxRecordsPerFile", rows_per_shard).mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)
