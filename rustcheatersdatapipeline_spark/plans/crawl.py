"""End-to-end crawl curation: the single entry point that composes the
round-6 web stack into the pipeline a pretraining-data team actually
runs over a crawl dump.

    WARC files
      → record parse + HTML→text distillation   (sources/warc.py)
      → URL frontier dedup                       (functions/weburl.py)
      → domain boilerplate removal               (operators/boilerplate.py)
      → quality cuts: compression ratio + length (functions/weburl.py)
      → exact + MinHash near dedup against the
        persisted index, atomic corpus publish   (streaming/ingest.py)

Each stage is the already-tested operator — this module only wires
them, so the composition inherits every stage's oracle. Batch form
(``curate_crawl``) for a one-shot dump; the streaming form is the same
sink behind ``open_warc_documents_stream`` (see
tests/test_warc_source.py) with these transforms applied per
micro-batch.

100 TB shape: stages 1-4 are a single lazy plan over the crawl bytes
(no intermediate materialization — Catalyst fuses the projections and
filters between the Arrow boundaries); stage 5 touches the compact
signature index, never historic text. The whole path is
corpus-linear.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.weburl import dedup_by_url, quality_compression_flags
from ..operators.boilerplate import remove_boilerplate
from ..sources.warc import read_warc, warc_to_documents, warc_to_pdf_documents
from ..streaming.ingest import CorpusIngestSink
from ..warehouse.persist import GoldStore

#: post-curation length floor (chars) — sub-threshold pages are menu
#: fragments once boilerplate is gone
MIN_CHARS = 80


def curate_documents(docs: DataFrame) -> DataFrame:
    """Document-level curation (URL frontier dedup → per-site
    boilerplate strip → length + compression cuts) over any frame in
    the documents shape with line-preserving text — shared by the batch
    pipeline and the streaming sink, so the two cannot drift."""
    docs = dedup_by_url(docs, url_col="source", id_col="doc_id")
    # boilerplate groups by SITE (url host), not per-page url
    docs = docs.withColumn("_domain", F.parse_url("source", F.lit("HOST")))
    clean = remove_boilerplate(docs, group_col="_domain").withColumnRenamed(
        "text", "_clean"
    )
    # re-derive the doc frame with curated text; keep provenance columns
    curated = (
        docs.drop("n_chars", "_domain")
        .join(clean.select("doc_id", "_clean"), "doc_id")
        .withColumn("text", F.col("_clean"))
        .drop("_clean")
        .withColumn("n_chars", F.length("text").cast("long"))
        .filter(F.col("n_chars") >= MIN_CHARS)
    )
    flagged = quality_compression_flags(curated)
    return flagged.filter(F.col("keep_compression")).drop("keep_compression")


def distill_and_curate(spark: SparkSession, warc_path: str) -> DataFrame:
    """Stages 1-4 as one lazy frame: curated candidate documents
    (doc_id, text, lang, source, n_chars, compression_ratio) — content
    dedup (stage 5) happens at publish so it can run against the
    persisted index."""
    warc = read_warc(spark, warc_path)
    curated = curate_documents(warc_to_documents(warc, lines=True))
    # PDFs join after the HTML-only stages (no site boilerplate to
    # strip; the distiller already applies its printable-fraction gate)
    pdfs = quality_compression_flags(
        warc_to_pdf_documents(warc).filter(F.col("n_chars") >= MIN_CHARS)
    )
    pdfs = pdfs.filter(F.col("keep_compression")).drop("keep_compression")
    return curated.unionByName(pdfs)


def curate_crawl(
    spark: SparkSession,
    warc_path: str,
    store: GoldStore,
    k: int | None = None,
) -> int:
    """Run the full pipeline over a crawl dump and publish the novel
    documents + their index rows atomically. Returns the number of
    documents admitted this run (0 for a pure re-crawl). Idempotent:
    re-running over the same dump admits nothing new.

    The admitted count comes FROM the sink (it computes the novel-row
    count anyway for its empty-batch guard) — an O(batch) fact; the
    corpus table is never scanned, so this entry point stays O(crawl
    bytes) at any corpus size."""
    curated = distill_and_curate(spark, warc_path)
    sink = CorpusIngestSink(store, k=k)
    return sink(curated, batch_id=-1)


class CuratedCorpusIngestSink(CorpusIngestSink):
    """Streaming form of the crawl pipeline: each micro-batch of
    distilled documents (``open_warc_documents_stream(..., lines=True)``)
    is CURATED (URL dedup, per-site boilerplate, quality cuts) before
    the inherited dedup-vs-index + atomic-publish loop.

    Boilerplate frequency is measured WITHIN the micro-batch — sound
    for crawl drop folders because crawls are site-bucketed (a file
    carries many pages per site); a site spread one-page-per-batch
    keeps its template until the periodic batch `curate_crawl` sweep,
    the documented batch/streaming split of every frequency-based
    operator here."""

    def _collapse_batch(self, batch_df: DataFrame) -> DataFrame:
        return super()._collapse_batch(curate_documents(batch_df))
