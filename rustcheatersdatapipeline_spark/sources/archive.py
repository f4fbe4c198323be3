"""Tar-archive corpus source — the dataset-dump ingestion path.

Public text corpora routinely ship as directories of ``.tar`` /
``.tar.gz`` shards (one text/HTML/markdown file per document). The
shape mirrors ``sources/warc.py``: per-FILE parallelism via
``binaryFile`` (dump shards ≫ cores, so the cluster parallelizes across
archives), a stdlib ``tarfile`` member walk inside an Arrow
``mapInPandas`` boundary, bounded member payloads, and
quarantine-not-crash rows (``corrupt_reason``) for both corrupt
archives and over-budget members.

100 TB shape: each task holds one archive's bytes plus at most one
member payload above it; rows flush every 256 members so a huge shard
streams out as bounded Arrow batches. The distiller
(``tar_to_documents``) reuses the WARC path's total HTML extractor —
one string in, one string out, every derived column codegen.
"""

from __future__ import annotations

import io
import tarfile
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: per-member payload ceiling — a pathological member skips (quarantine
#: row), it does not OOM the task (the WARC/PDF inflate-cap discipline)
MAX_MEMBER_BYTES = 64 * 1024 * 1024

TAR_SCHEMA = (
    "archive string, member string, size long, payload binary, corrupt_reason string"
)
_COLUMNS = ["archive", "member", "size", "payload", "corrupt_reason"]

#: member suffixes the documents distiller treats as text-bearing
TEXT_SUFFIXES = (".txt", ".md", ".rst")
HTML_SUFFIXES = (".html", ".htm", ".xhtml")


def _walk_tar(path: str, content: bytes, max_member: int) -> Iterator[dict]:
    try:
        tf = tarfile.open(fileobj=io.BytesIO(content), mode="r:*")
    except (tarfile.TarError, EOFError, OSError) as exc:
        yield {
            "archive": path,
            "member": None,
            "size": None,
            "payload": None,
            "corrupt_reason": f"unreadable archive: {exc}",
        }
        return
    with tf:
        while True:
            try:
                info = tf.next()
            except (tarfile.TarError, EOFError, OSError) as exc:
                # torn tail: keep the members already yielded
                yield {
                    "archive": path,
                    "member": None,
                    "size": None,
                    "payload": None,
                    "corrupt_reason": f"torn archive tail: {exc}",
                }
                return
            if info is None:
                return
            if not info.isfile():
                continue
            if info.size > max_member:
                yield {
                    "archive": path,
                    "member": info.name,
                    "size": info.size,
                    "payload": None,
                    "corrupt_reason": f"member exceeds {max_member} bytes",
                }
                continue
            try:
                f = tf.extractfile(info)
                data = f.read(max_member + 1) if f is not None else None
            except (tarfile.TarError, EOFError, OSError) as exc:
                yield {
                    "archive": path,
                    "member": info.name,
                    "size": info.size,
                    "payload": None,
                    "corrupt_reason": f"unreadable member: {exc}",
                }
                continue
            if data is None:
                continue
            yield {
                "archive": path,
                "member": info.name,
                "size": info.size,
                "payload": data,
                "corrupt_reason": None,
            }


def tar_members(files: DataFrame, max_member: int = MAX_MEMBER_BYTES) -> DataFrame:
    """Parse a ``binaryFile`` frame (batch or streaming) into
    ``TAR_SCHEMA`` member rows."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows: list[dict] = []
        for pdf in batches:
            for p, content in zip(pdf["path"], pdf["content"]):
                for rec in _walk_tar(p, bytes(content), max_member):
                    rows.append(rec)
                    if len(rows) >= 256:
                        yield pd.DataFrame(rows, columns=_COLUMNS)
                        rows = []
        yield pd.DataFrame(rows, columns=_COLUMNS)

    return files.select("path", "content").mapInPandas(run, schema=TAR_SCHEMA)


def read_tar(spark: SparkSession, path: str, max_member: int = MAX_MEMBER_BYTES) -> DataFrame:
    """All members of the tar shards under ``path`` (``.tar``,
    ``.tar.gz``/``.tgz``, ``.tar.bz2``, ``.tar.xz`` — format sniffed by
    ``tarfile`` itself) as one DataFrame; quarantine rows inline."""
    return tar_members(spark.read.format("binaryFile").load(path), max_member)


def _member_texts(data: bytes, name: str, lines: bool) -> list[str]:
    """Documents carried by one member: gzip members inflate (bounded)
    then re-dispatch on the inner name; ``.jsonl``/``.ndjson`` members
    yield one document per line with a ``text`` field (the interchange
    convention of ``sources/jsonl.py``); everything else goes through
    the unified magic-sniff distiller as a single document."""
    import json
    import zlib

    from ..functions.distill import payload_to_text

    low = (name or "").lower()
    if low.endswith(".gz") and data[:2] == b"\x1f\x8b":
        try:
            data = zlib.decompressobj(31).decompress(data, MAX_MEMBER_BYTES)
        except zlib.error:
            return []
        low = low[:-3]
    if low.endswith((".jsonl", ".ndjson")):
        out = []
        for ln in data.splitlines():
            if not ln.strip():
                continue
            try:
                obj = json.loads(ln)
            except (ValueError, UnicodeDecodeError):
                continue
            t = obj.get("text") if isinstance(obj, dict) else None
            if isinstance(t, str) and t:
                out.append(t)
        return out
    text = payload_to_text(data, low, lines)
    return [text] if text else []


def tar_to_documents(members: DataFrame, lines: bool = False) -> DataFrame:
    """Distill text-bearing members into the documents-table shape
    (doc_id, text, lang, source, n_chars) via the unified magic-sniff
    dispatcher (``functions/distill.py``): plain text and HTML, plus
    PDF, OOXML/ODT/EPUB, RTF, legacy CFB Office, gzipped members, and
    JSONL members (one document per line, ``text`` field) — a dump of
    mixed document formats distills in one pass. Binary members and
    failed extractions drop (quarantine-not-crash). ``source`` is
    ``archive::member`` (line index appended as ``#N`` past the first
    for multi-document members, keeping identities unique); ``doc_id``
    is the content-independent xxhash64 of that identity, so re-landed
    dumps stay idempotent under insert-if-absent."""

    @F.pandas_udf("array<string>")
    def _extract(payload: pd.Series, member: pd.Series) -> pd.Series:
        return pd.Series(
            [
                _member_texts(bytes(p) if p is not None else b"", n, lines)
                for p, n in zip(payload, member)
            ]
        )

    docs = members.filter(F.col("corrupt_reason").isNull())
    ident = F.when(
        F.col("pos") == 0, F.concat_ws("::", "archive", "member")
    ).otherwise(
        F.concat(F.concat_ws("::", "archive", "member"), F.lit("#"), F.col("pos"))
    )
    return (
        docs.select(
            "archive",
            "member",
            F.posexplode(_extract("payload", "member")).alias("pos", "text"),
        )
        .filter(F.col("text").isNotNull() & (F.col("text") != ""))
        .select(
            F.xxhash64(ident).alias("doc_id"),
            "text",
            F.lit(None).cast("string").alias("lang"),
            ident.alias("source"),
        )
        .withColumn("n_chars", F.length("text").cast("long"))
    )


def open_tar_documents_stream(
    spark: SparkSession, path: str, lines: bool = False
) -> DataFrame:
    """Streaming documents from a tar drop folder — each newly-arrived
    shard becomes a micro-batch; feed it to the corpus ingest sink via
    ``foreachBatch`` exactly like the WARC stream."""
    files = (
        spark.readStream.format("binaryFile")
        .schema("path string, modificationTime timestamp, length long, content binary")
        .load(path)
    )
    return tar_to_documents(tar_members(files), lines=lines)


def _walk_zip(path: str, content: bytes, max_member: int) -> Iterator[dict]:
    import zipfile
    import zlib

    try:
        zf = zipfile.ZipFile(io.BytesIO(content))
    except (zipfile.BadZipFile, OSError) as exc:
        yield {
            "archive": path,
            "member": None,
            "size": None,
            "payload": None,
            "corrupt_reason": f"unreadable archive: {exc}",
        }
        return
    with zf:
        for info in zf.infolist():
            if info.is_dir():
                continue
            if info.file_size > max_member:
                yield {
                    "archive": path,
                    "member": info.filename,
                    "size": info.file_size,
                    "payload": None,
                    "corrupt_reason": f"member exceeds {max_member} bytes",
                }
                continue
            try:
                with zf.open(info) as f:
                    data = f.read(max_member + 1)
            except (zipfile.BadZipFile, zlib.error, EOFError, OSError) as exc:
                yield {
                    "archive": path,
                    "member": info.filename,
                    "size": info.file_size,
                    "payload": None,
                    "corrupt_reason": f"unreadable member: {exc}",
                }
                continue
            yield {
                "archive": path,
                "member": info.filename,
                "size": info.file_size,
                "payload": data,
                "corrupt_reason": None,
            }


def zip_members(files: DataFrame, max_member: int = MAX_MEMBER_BYTES) -> DataFrame:
    """ZIP twin of ``tar_members`` — same TAR_SCHEMA rows, same
    quarantine discipline (the central directory makes corrupt members
    individually skippable where tar must stop at a tear)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows: list[dict] = []
        for pdf in batches:
            for p, content in zip(pdf["path"], pdf["content"]):
                for rec in _walk_zip(p, bytes(content), max_member):
                    rows.append(rec)
                    if len(rows) >= 256:
                        yield pd.DataFrame(rows, columns=_COLUMNS)
                        rows = []
        yield pd.DataFrame(rows, columns=_COLUMNS)

    return files.select("path", "content").mapInPandas(run, schema=TAR_SCHEMA)


def read_zip(spark: SparkSession, path: str, max_member: int = MAX_MEMBER_BYTES) -> DataFrame:
    """All members of the zip shards under ``path``; feed the result to
    ``tar_to_documents`` (the distiller is archive-format-agnostic)."""
    return zip_members(spark.read.format("binaryFile").load(path), max_member)
