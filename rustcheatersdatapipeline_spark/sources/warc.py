"""WARC (Web ARChive, ISO 28500) ingestion — the Common Crawl shape.

Web-crawl corpora — the bulk of any 100 TB pretraining mix — ship as
``.warc`` / ``.warc.gz`` files: a stream of versioned records
(``WARC/1.0`` header block, ``Content-Length``-framed payload), where
``response`` records carry a full HTTP message whose body is the
fetched page. This module lands them as an analyzable DataFrame and
distills ``text/html`` responses into the engine's documents-table
shape so the whole dedup/quality/LSH stack applies unchanged.

No new parser framework: the same bronze discipline as the JSONL and
Steam sources (pinned schema, corrupt input QUARANTINED with a reason,
never a task failure — SURVEY.md §1.4; reference parallel:
``dags/custom_operators`` land-raw-then-flatten flow).

100 TB design notes:

- **Partitioning**: a ``.warc.gz`` is not block-splittable (gzip), so
  the unit of parallelism is the FILE — exactly how Common Crawl is
  laid out (~1 GB × ~80k files per dump), which saturates any executor
  fleet. ``binaryFile`` hands each task whole files; tasks stream
  records out of the buffer without materializing more than the
  per-file bytes Spark already read.
- **Payloads stay opaque binary** + typed metadata (the multimodal
  column discipline): HTML→text is a SEPARATE vectorized step
  (``warc_to_documents``), so non-HTML payloads (images, PDFs) remain
  available to other featurizers rather than being dropped at parse
  time.
- **Corruption is data, not failure**: a torn record quarantines that
  span and the parser resyncs on the next ``WARC/`` magic, so one bad
  byte never discards the remaining gigabyte of a crawl file.

Pure stdlib: ``gzip`` for multi-member decompression,
``html.parser.HTMLParser`` for text extraction.
"""

from __future__ import annotations

import gzip
import io
from collections.abc import Iterator
from html.parser import HTMLParser

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

WARC_SCHEMA = (
    "warc_file string, record_offset bigint, record_id string, warc_type string, "
    "target_uri string, warc_date string, http_status int, mime string, "
    "payload binary, n_bytes bigint, corrupt_reason string"
)

_CRLF2 = b"\r\n\r\n"


def _parse_header_block(block: bytes) -> tuple[str, dict[str, str]] | None:
    """(version, {lower-name: value}) from a WARC header block, or None
    if the version line is not a WARC magic."""
    lines = block.split(b"\r\n")
    version = lines[0].decode("ascii", "replace").strip()
    if not version.startswith("WARC/"):
        return None
    headers: dict[str, str] = {}
    for line in lines[1:]:
        name, sep, value = line.partition(b":")
        if sep:
            headers[name.decode("ascii", "replace").strip().lower()] = value.decode(
                "utf-8", "replace"
            ).strip()
    return version, headers


def _split_http(payload: bytes) -> tuple[int | None, str | None, bytes]:
    """(status, content-type, body) from an ``application/http`` payload."""
    head, sep, body = payload.partition(_CRLF2)
    if not sep:
        return None, None, payload
    lines = head.split(b"\r\n")
    status = None
    first = lines[0].split()
    if len(first) >= 2 and first[0].startswith(b"HTTP/"):
        try:
            status = int(first[1])
        except ValueError:
            status = None
    ctype = None
    for line in lines[1:]:
        name, s, value = line.partition(b":")
        if s and name.decode("ascii", "replace").strip().lower() == "content-type":
            ctype = value.decode("utf-8", "replace").strip()
    return status, ctype, body


#: WARC header blocks are hundreds of bytes; see _iter_stream_records
_MAX_HEADER_BYTES = 1 << 20


class _GzipError(Exception):
    pass


def _gzip_chunks(buf: bytes, chunk: int = 1 << 20) -> Iterator[bytes]:
    """Incrementally inflate ALL gzip members (Common Crawl gzips per
    record; GzipFile reads across member boundaries). Yielding bounded
    chunks keeps the decompressed stream out of memory — the parser
    holds at most one record plus one chunk, so a 1 GB ``.warc.gz``
    inflating to several GB never materializes per task."""
    import zlib

    gz = gzip.GzipFile(fileobj=io.BytesIO(buf))
    while True:
        try:
            c = gz.read(chunk)
        # OSError/BadGzipFile: bad magic/header/CRC; zlib.error: corrupt
        # deflate stream mid-member (fuzz-found — GzipFile does not wrap it)
        except (OSError, EOFError, zlib.error) as exc:
            raise _GzipError(str(exc)) from None
        if not c:
            return
        yield c


class _StreamBuf:
    """Rolling window over a chunked byte stream: absolute offsets in,
    bytes out, with explicit ``discard`` so memory stays bounded by the
    un-consumed span (≤ one WARC record in the parser below)."""

    def __init__(self, chunks: Iterator[bytes]) -> None:
        self._chunks = iter(chunks)
        self.buf = bytearray()
        self.base = 0  # stream offset of buf[0]

    def _pull(self) -> bool:
        try:
            c = next(self._chunks)
        except StopIteration:
            return False
        self.buf += c
        return True

    def end(self) -> int:
        return self.base + len(self.buf)

    def find(self, pat: bytes, start_off: int, limit: int | None = None) -> int:
        """Offset of ``pat`` at/after ``start_off``, or -1. ``limit``
        bounds the search (and therefore the buffering) to
        ``start_off + limit`` — without it a corrupt stream that never
        contains ``pat`` would accumulate whole in the buffer."""
        pos = max(start_off - self.base, 0)
        while True:
            i = self.buf.find(pat, pos)
            if i != -1:
                off = self.base + i
                return off if limit is None or off < start_off + limit else -1
            if limit is not None and self.end() >= start_off + limit:
                return -1
            pos = max(len(self.buf) - len(pat) + 1, 0)
            if not self._pull():
                return -1

    def next_magic(self, pat: bytes, start_off: int) -> tuple[int, bool]:
        """Bounded-memory scan for the next record magic: bytes scanned
        past are discarded as the scan advances (keeping a
        ``len(pat)-1`` overlap tail), so trailing garbage that never
        contains ``pat`` costs O(chunk) memory, not O(remaining
        stream). Returns ``(match offset or -1, garbage_seen)`` —
        whether any skipped byte was non-whitespace, the parser's
        quarantine evidence without retaining the garbage itself."""
        self.discard(start_off)
        garbage = False
        while True:
            i = self.buf.find(pat)
            if i != -1:
                garbage = garbage or bool(bytes(self.buf[:i]).strip())
                self.discard(self.base + i)
                return self.base, garbage
            keep = max(len(self.buf) - len(pat) + 1, 0)
            garbage = garbage or bool(bytes(self.buf[:keep]).strip())
            self.discard(self.base + keep)
            if not self._pull():
                return -1, garbage or bool(bytes(self.buf).strip())

    def ensure(self, end_off: int) -> bool:
        while self.end() < end_off:
            if not self._pull():
                return False
        return True

    def slice(self, a: int, b: int) -> bytes:
        return bytes(self.buf[a - self.base : b - self.base])

    def discard(self, upto_off: int) -> None:
        d = upto_off - self.base
        if d > 0:
            del self.buf[:d]
            self.base = upto_off


def _iter_stream_records(warc_file: str, chunks: Iterator[bytes]) -> Iterator[dict]:
    sb = _StreamBuf(chunks)
    pos = 0
    while True:
        start, garbage = sb.next_magic(b"WARC/", pos)
        if start == -1:
            if garbage:
                yield _quarantine(warc_file, pos, "trailing bytes with no WARC magic")
            return
        if garbage:
            yield _quarantine(warc_file, pos, "garbage between records")
        # header blocks are a few hundred bytes; the 1 MiB search bound
        # keeps a corrupt never-terminated header from buffering the file
        hdr_end = sb.find(_CRLF2, start, limit=_MAX_HEADER_BYTES)
        if hdr_end == -1:
            yield _quarantine(warc_file, start, "truncated header block")
            return
        parsed = _parse_header_block(sb.slice(start, hdr_end))
        if parsed is None:
            yield _quarantine(warc_file, start, "bad WARC version line")
            pos = start + 5
            continue
        _, headers = parsed
        try:
            length = int(headers["content-length"])
            if length < 0:
                raise ValueError(length)
        except (KeyError, ValueError):
            yield _quarantine(warc_file, start, "missing/invalid Content-Length")
            pos = start + 5
            continue
        body_start = hdr_end + len(_CRLF2)
        if not sb.ensure(body_start + length):
            yield _quarantine(warc_file, start, "payload truncated at EOF")
            return
        payload = sb.slice(body_start, body_start + length)
        pos = body_start + length
        sb.discard(pos)
        status, ctype, body = None, headers.get("content-type"), payload
        if ctype and ctype.split(";")[0].strip() == "application/http":
            status, ctype, body = _split_http(payload)
        yield {
            "warc_file": warc_file,
            "record_offset": start,
            "record_id": headers.get("warc-record-id"),
            "warc_type": headers.get("warc-type"),
            "target_uri": headers.get("warc-target-uri"),
            "warc_date": headers.get("warc-date"),
            "http_status": status,
            "mime": ctype,
            "payload": body,
            "n_bytes": len(body),
            "corrupt_reason": None,
        }


def parse_warc_bytes(warc_file: str, buf: bytes) -> Iterator[dict]:
    """Yield one dict per WARC record (or quarantined span) in ``buf``.

    Good rows have ``corrupt_reason`` None; quarantine rows carry the
    reason and the offending span's offset, with all parse fields NULL.
    After any malformed region the parser RESYNCS at the next ``WARC/``
    magic — a torn record costs its own bytes, nothing downstream.
    Gzip input inflates INCREMENTALLY (``_gzip_chunks``): memory is
    bounded by one record + one chunk, never the decompressed file; a
    corrupt member quarantines the remainder, keeping the records
    already yielded."""
    if buf[:2] == b"\x1f\x8b":
        chunks: Iterator[bytes] = _gzip_chunks(buf)
    else:
        chunks = iter((buf,))
    it = _iter_stream_records(warc_file, chunks)
    while True:
        try:
            yield next(it)
        except StopIteration:
            return
        except _GzipError as exc:
            yield _quarantine(warc_file, 0, f"gzip: {exc}")
            return


def _quarantine(warc_file: str, offset: int, reason: str) -> dict:
    return {
        "warc_file": warc_file,
        "record_offset": offset,
        "record_id": None,
        "warc_type": None,
        "target_uri": None,
        "warc_date": None,
        "http_status": None,
        "mime": None,
        "payload": None,
        "n_bytes": None,
        "corrupt_reason": reason,
    }


_COLUMNS = [
    "warc_file",
    "record_offset",
    "record_id",
    "warc_type",
    "target_uri",
    "warc_date",
    "http_status",
    "mime",
    "payload",
    "n_bytes",
    "corrupt_reason",
]


def warc_records(files: DataFrame) -> DataFrame:
    """Parse a ``binaryFile`` frame (columns ``path``, ``content`` —
    batch OR streaming) into ``WARC_SCHEMA`` rows. The streaming case
    makes a crawl drop-folder an unbounded documents source."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # flush every 512 records so a multi-GB crawl file streams out
        # as bounded Arrow batches instead of one giant frame per file
        rows: list[dict] = []
        for pdf in batches:
            for p, content in zip(pdf["path"], pdf["content"]):
                for rec in parse_warc_bytes(p, bytes(content)):
                    rows.append(rec)
                    if len(rows) >= 512:
                        yield pd.DataFrame(rows, columns=_COLUMNS)
                        rows = []
        yield pd.DataFrame(rows, columns=_COLUMNS)

    return files.select("path", "content").mapInPandas(run, schema=WARC_SCHEMA)


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """All WARC records under ``path`` (``.warc`` or ``.warc.gz``) as one
    DataFrame in ``WARC_SCHEMA``; quarantine rows are inline with
    ``corrupt_reason`` set (split with ``split_warc`` — kept as one
    frame so the expensive parse is not run once per branch)."""
    return warc_records(spark.read.format("binaryFile").load(path))


def open_warc_documents_stream(
    spark: SparkSession, path: str, lines: bool = False
) -> DataFrame:
    """Streaming documents from a WARC drop folder: each newly-arrived
    crawl file becomes a micro-batch of distilled documents — feed it to
    ``streaming.ingest.CorpusIngestSink`` via ``foreachBatch`` for the
    full crawl→dedup→publish loop (historic corpus never rescanned).
    File-granular exactly-once comes from the checkpointed file source;
    content-level idempotence from the sink's digest dedup."""
    files = (
        spark.readStream.format("binaryFile")
        # the binaryFile schema is fixed, but streaming sources demand it
        # be pinned explicitly — which suits the engine's never-infer rule
        .schema("path string, modificationTime timestamp, length long, content binary")
        .load(path)
    )
    return warc_to_documents(warc_records(files), lines=lines)


def open_warc_records_stream(spark: SparkSession, path: str) -> DataFrame:
    """Streaming RAW records from a WARC drop folder — the feed for
    multi-index crawl sinks (documents + robots + host graph consume
    the SAME record batch, each filtering its own record types), unlike
    ``open_warc_documents_stream`` which pre-narrows to distilled HTML
    documents."""
    files = (
        spark.readStream.format("binaryFile")
        .schema("path string, modificationTime timestamp, length long, content binary")
        .load(path)
    )
    return warc_records(files)


def warc_to_pdf_documents(warc: DataFrame, min_printable: float = 0.9) -> DataFrame:
    """Distill 200-OK ``application/pdf`` responses into the documents
    shape via the scoped stdlib extractor (functions/pdftext.py).
    Extractions below the printable-fraction gate (subset/CID-font
    garbage) or that fail outright yield NULL text and are FILTERED —
    the quality gate is part of the distiller because garbage bytes in
    a text column poison every downstream shingle/hash operator."""
    from ..functions.pdftext import pdf_to_text, printable_fraction

    @F.pandas_udf("string")
    def _extract(payload: pd.Series) -> pd.Series:
        def run(p):
            try:
                text = pdf_to_text(bytes(p) if p is not None else b"")
            except ValueError:
                return None
            return text if printable_fraction(text) >= min_printable else None

        return payload.map(run)

    resp = warc.filter(
        F.col("corrupt_reason").isNull()
        & (F.col("warc_type") == "response")
        & (F.col("http_status") == 200)
        & F.col("mime").startswith("application/pdf")
    )
    return (
        resp.select(
            F.xxhash64("record_id", "target_uri").alias("doc_id"),
            _extract("payload").alias("text"),
            F.lit(None).cast("string").alias("lang"),
            F.col("target_uri").alias("source"),
        )
        .filter(F.col("text").isNotNull() & (F.col("text") != ""))
        .withColumn("n_chars", F.length("text").cast("long"))
    )


#: office-document response mimes (generic octet-stream+PK sniffing is
#: deliberately NOT done here — mime lies are the quarantine path's
#: job, not the happy path's)
_OFFICE_MIME_PREFIXES = (
    "application/vnd.openxmlformats-officedocument",  # docx/xlsx/pptx
    "application/vnd.oasis.opendocument",  # odt family
    "application/rtf",
    "text/rtf",
    "application/epub",  # EPUB e-books (zip of XHTML)
    "application/msword",  # legacy .doc (CFB)
    "application/vnd.ms-excel",  # legacy .xls (CFB)
    "application/vnd.ms-powerpoint",  # legacy .ppt (CFB)
)


def warc_to_office_documents(warc: DataFrame) -> DataFrame:
    """Distill 200-OK office-document responses (DOCX/XLSX/PPTX/ODT/RTF
    plus the legacy CFB-container .doc/.xls/.ppt) into the documents
    shape via the stdlib extractors (functions/officetext.py,
    functions/cfbtext.py). Failed, empty, or named-boundary (encrypted,
    pre-BIFF8) extractions are filtered — same
    quality-gate-inside-the-distiller policy as the PDF path."""
    from ..functions.cfbtext import cfb_to_text
    from ..functions.officetext import office_to_text, rtf_to_text

    @F.pandas_udf("string")
    def _extract(payload: pd.Series) -> pd.Series:
        def run(p):
            buf = bytes(p) if p is not None else b""
            try:
                if buf.startswith(b"{\\rtf"):
                    return rtf_to_text(buf) or None
                if buf.startswith(b"\xd0\xcf\x11\xe0"):
                    return cfb_to_text(buf)[1] or None
                _kind, text = office_to_text(buf)
            except (ValueError, NotImplementedError):
                return None
            return text or None

        return payload.map(run)

    mime_ok = F.col("mime").startswith(_OFFICE_MIME_PREFIXES[0])
    for pref in _OFFICE_MIME_PREFIXES[1:]:
        mime_ok = mime_ok | F.col("mime").startswith(pref)
    resp = warc.filter(
        F.col("corrupt_reason").isNull()
        & (F.col("warc_type") == "response")
        & (F.col("http_status") == 200)
        & mime_ok
    )
    return (
        resp.select(
            F.xxhash64("record_id", "target_uri").alias("doc_id"),
            _extract("payload").alias("text"),
            F.lit(None).cast("string").alias("lang"),
            F.col("target_uri").alias("source"),
        )
        .filter(F.col("text").isNotNull() & (F.col("text") != ""))
        .withColumn("n_chars", F.length("text").cast("long"))
    )


def warc_to_media(warc: DataFrame, mime_prefix: str = "image/") -> DataFrame:
    """Distill 200-OK media responses into the media-table shape
    (item_id, payload, mime, source) feeding the multimodal stack —
    ``featurize_pixels``/``featurize_phash`` batch-side, or
    ``streaming.ingest.MediaIngestSink`` for the incremental
    perceptual-dedup loop. Same stable xxhash64 identity as
    ``warc_to_documents``."""
    resp = warc.filter(
        F.col("corrupt_reason").isNull()
        & (F.col("warc_type") == "response")
        & (F.col("http_status") == 200)
        & F.col("mime").startswith(mime_prefix)
    )
    return resp.select(
        F.xxhash64("record_id", "target_uri").alias("item_id"),
        F.col("payload"),
        F.col("mime"),
        F.col("target_uri").alias("source"),
    )


def open_warc_media_stream(
    spark: SparkSession, path: str, mime_prefix: str = "image/"
) -> DataFrame:
    """Streaming media rows from a WARC drop folder — the image twin of
    ``open_warc_documents_stream``; feed to ``MediaIngestSink`` for
    crawl → perceptual-dedup → publish."""
    files = (
        spark.readStream.format("binaryFile")
        .schema("path string, modificationTime timestamp, length long, content binary")
        .load(path)
    )
    return warc_to_media(warc_records(files), mime_prefix)


def split_warc(warc: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(good, quarantine) views over a ``read_warc`` frame."""
    return (
        warc.filter(F.col("corrupt_reason").isNull()).drop("corrupt_reason"),
        warc.filter(F.col("corrupt_reason").isNotNull()).select(
            "warc_file", "record_offset", "corrupt_reason"
        ),
    )


class _TextExtractor(HTMLParser):
    """Visible-text extraction: drops script/style/template subtrees,
    decodes entities (``convert_charrefs``), separates text at
    block-level tag boundaries (so ``<title>T</title><h1>H`` yields
    "T H", while inline ``wel<b>c</b>ome`` stays one word)."""

    _SKIP = frozenset({"script", "style", "noscript", "template"})
    _BLOCK = frozenset(
        "p div br hr h1 h2 h3 h4 h5 h6 li ul ol dl dt dd tr td th table thead "
        "tbody caption title head body html section article aside header footer "
        "nav main blockquote pre form fieldset figure figcaption address".split()
    )

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._skip_depth = 0
        self.chunks: list[str] = []

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in self._SKIP:
            self._skip_depth += 1
        elif tag in self._BLOCK:
            self.chunks.append("\n")

    def handle_endtag(self, tag: str) -> None:
        if tag in self._SKIP:
            if self._skip_depth:
                self._skip_depth -= 1
        elif tag in self._BLOCK:
            self.chunks.append("\n")

    def handle_data(self, data: str) -> None:
        if not self._skip_depth:
            self.chunks.append(data)


def _charset_of(mime: str | None) -> str:
    for part in (mime or "").split(";")[1:]:
        name, sep, value = part.partition("=")
        if sep and name.strip().lower() == "charset":
            return value.strip().strip('"').lower() or "utf-8"
    return "utf-8"


def html_payload_to_text(payload: bytes, mime: str | None, lines: bool = False) -> str:
    """Decode (charset from the Content-Type, utf-8 fallback, bad bytes
    replaced — never raised) and extract visible text. ``lines=False``
    (default) collapses everything to one whitespace-normalized line;
    ``lines=True`` keeps one line per block element (the shape
    ``remove_boilerplate``'s line-frequency pass needs). Total on
    arbitrary bytes: HTMLParser never raises on garbage."""
    try:
        html = payload.decode(_charset_of(mime), errors="replace")
    except LookupError:
        html = payload.decode("utf-8", errors="replace")
    parser = _TextExtractor()
    parser.feed(html)
    parser.close()
    rows = [" ".join(l.split()) for l in "".join(parser.chunks).split("\n")]
    rows = [r for r in rows if r]
    return "\n".join(rows) if lines else " ".join(rows)


def warc_to_documents(warc: DataFrame, lines: bool = False) -> DataFrame:
    """Distill 200-OK ``text/html`` responses into the documents-table
    shape (doc_id, text, lang, source, n_chars) feeding the corpus
    operators (dedup/quality/LSH) unchanged.

    The only Python step is the HTML parse itself (no JVM equivalent) —
    Arrow-batched ``pandas_udf``, one string in / one string out; the
    filter and every derived column are codegen. ``doc_id`` is a
    content-independent stable identity (xxhash64 of record id + uri) so
    re-landing the same crawl is idempotent under the warehouse's
    insert-if-absent discipline."""

    @F.pandas_udf("string")
    def _extract(payload: pd.Series, mime: pd.Series) -> pd.Series:
        return pd.Series(
            [
                html_payload_to_text(bytes(p) if p is not None else b"", m, lines)
                for p, m in zip(payload, mime)
            ]
        )

    resp = warc.filter(
        F.col("corrupt_reason").isNull()
        & (F.col("warc_type") == "response")
        & (F.col("http_status") == 200)
        & F.col("mime").startswith("text/html")
    )
    return resp.select(
        F.xxhash64("record_id", "target_uri").alias("doc_id"),
        _extract("payload", "mime").alias("text"),
        F.lit(None).cast("string").alias("lang"),
        F.col("target_uri").alias("source"),
    ).withColumn("n_chars", F.length("text").cast("long"))


def wet_to_documents(warc: DataFrame) -> DataFrame:
    """Distill WET ``conversion`` records (Common Crawl's pre-extracted
    text sidecar — the same WARC container, ``WARC-Type: conversion``
    with a UTF-8 ``text/plain`` payload and no HTTP envelope) into the
    documents-table shape. WET is the cheapest crawl entry point at
    100 TB: the text extraction already happened upstream, so this path
    is pure codegen — a filter, a binary→string cast, and the stable
    identity hash; no Python worker at all (vs the HTML parse in
    ``warc_to_documents``).

    Reads through the SAME ``read_warc``/``open_warc_*`` machinery
    (WET files are WARC files), so corrupt-span quarantine, gzip member
    handling, and the streaming drop-folder form all apply unchanged."""
    conv = warc.filter(
        F.col("corrupt_reason").isNull()
        & (F.col("warc_type") == "conversion")
        & F.col("mime").startswith("text/plain")
    )
    return (
        conv.select(
            F.xxhash64("record_id", "target_uri").alias("doc_id"),
            F.col("payload").cast("string").alias("text"),
            F.lit(None).cast("string").alias("lang"),
            F.col("target_uri").alias("source"),
        )
        .withColumn("n_chars", F.length("text").cast("long"))
    )
