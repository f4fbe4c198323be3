"""JSONL document interchange — the lingua franca of LLM corpora.

Public corpora ship as gzipped JSON-lines with a text field and loose
metadata; trainers and data loaders consume the same shape back. The
reader follows the engine's bronze discipline (pipeline.py
``read_bronze``): schema PINNED (never inferred — inference costs an
extra full scan and drifts with the data), PERMISSIVE parse with the
corrupt rows split into a quarantine frame instead of killing the scan
or silently nulling (SURVEY.md §1.4).

Implementation note: the reader scans raw text lines and parses with
``from_json`` rather than ``spark.read.json``. That buys two things:
the quarantine frame carries the TRUE original input line for every
rejected record (including schema-valid-but-textless rows, which the
json reader would have re-serialized lossily), and no ``.cache()`` is
needed to work around the corrupt-column-only-filter restriction — so
repeated calls leak nothing into the session's block-manager cache.

Scale: JSON-lines is splittable (and .gz line files split per-file), so
the read parallelizes per file/block; ``from_json`` is a codegen'd JVM
expression, not a UDF. The writer rides ``maxRecordsPerFile`` like the
parquet shard path. Compression is codec-option only — no code change
between plain and gzip.
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
    ``quarantine`` holds the ORIGINAL raw line of every record that
    failed to parse or had no ``text`` — routed to a dead-letter sink,
    never dropped silently.
    """
    schema = schema or DOCUMENTS_JSONL_SCHEMA
    probed = StructType(
        [*schema.fields, StructField("_corrupt_record", StringType(), True)]
    )
    parsed = spark.read.text(path).select(
        F.col("value"),
        F.from_json(
            "value",
            probed,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt_record"},
        ).alias("rec"),
    )
    bad = (
        F.col("rec").isNull()
        | F.col("rec._corrupt_record").isNotNull()
        | F.col("rec.text").isNull()
    )
    quarantine = parsed.filter(bad).select(F.col("value").alias("raw"))
    good = (
        parsed.filter(~bad)
        .select("rec.*")
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
