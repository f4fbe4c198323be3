"""WARC ingestion (sources/warc.py): record framing, gzip multi-member
files, HTTP payload split, corrupt-span quarantine + resync, HTML→text
distillation into the documents shape.

The oracle is a test-side WARC WRITER emitting spec-exact framing
(version line, CRLF headers, Content-Length payload, CRLF CRLF
separator) — decode(encode(records)) must round-trip every field."""

import gzip

import numpy as np
import pytest

from rustcheatersdatapipeline_spark.sources.warc import (
    html_payload_to_text,
    parse_warc_bytes,
    read_warc,
    split_warc,
    warc_to_documents,
)

HTML = (
    b"<html><head><title>T</title><style>body{x}</style>"
    b"<script>var j = 1;</script></head>"
    b"<body><h1>Hello &amp; welcome</h1>\n<p>two  words</p></body></html>"
)


def warc_record(
    rtype: str,
    uri: str | None,
    payload: bytes,
    rid: str = "<urn:uuid:1>",
    ctype: str = "application/http",
    date: str = "2024-01-01T00:00:00Z",
) -> bytes:
    headers = [f"WARC-Type: {rtype}", f"WARC-Record-ID: {rid}", f"WARC-Date: {date}"]
    if uri:
        headers.append(f"WARC-Target-URI: {uri}")
    headers.append(f"Content-Type: {ctype}")
    headers.append(f"Content-Length: {len(payload)}")
    head = "WARC/1.0\r\n" + "\r\n".join(headers) + "\r\n\r\n"
    return head.encode() + payload + b"\r\n\r\n"


def http_response(body: bytes, status: int = 200, ctype: str = "text/html; charset=utf-8") -> bytes:
    head = f"HTTP/1.1 {status} X\r\nContent-Type: {ctype}\r\nContent-Length: {len(body)}\r\n\r\n"
    return head.encode() + body


def sample_warc() -> bytes:
    return (
        warc_record("warcinfo", None, b"software: test\r\n", ctype="application/warc-fields")
        + warc_record("request", "http://a.test/", http_response(b"", 0))
        + warc_record("response", "http://a.test/", http_response(HTML), rid="<urn:uuid:2>")
        + warc_record(
            "response",
            "http://b.test/img",
            http_response(b"\x89PNGbytes", ctype="image/png"),
            rid="<urn:uuid:3>",
        )
    )


def test_parse_roundtrip_plain():
    recs = list(parse_warc_bytes("f.warc", sample_warc()))
    assert [r["corrupt_reason"] for r in recs] == [None] * 4
    assert [r["warc_type"] for r in recs] == ["warcinfo", "request", "response", "response"]
    html = recs[2]
    assert html["target_uri"] == "http://a.test/"
    assert html["http_status"] == 200
    assert html["mime"].startswith("text/html")
    assert html["payload"] == HTML  # HTTP head stripped, body exact
    assert html["n_bytes"] == len(HTML)
    img = recs[3]
    assert img["mime"] == "image/png" and img["payload"] == b"\x89PNGbytes"
    # warcinfo payload is not application/http → kept verbatim
    assert recs[0]["payload"] == b"software: test\r\n" and recs[0]["http_status"] is None


def test_parse_gzip_multimember():
    """Common Crawl gzips each record as its own member; the parser must
    read across member boundaries."""
    raw = sample_warc()
    members = b"".join(
        gzip.compress(chunk)
        for chunk in (
            warc_record("response", "http://a.test/", http_response(HTML)),
            warc_record("response", "http://b.test/", http_response(b"x" * 10)),
        )
    )
    assert len(list(parse_warc_bytes("f.warc.gz", members))) == 2
    # and single-member whole-file gzip too
    assert len(list(parse_warc_bytes("g.warc.gz", gzip.compress(raw)))) == 4


def test_corrupt_span_quarantined_and_resyncs():
    """A torn record costs exactly its own span: the parser quarantines
    it with a reason and picks up the NEXT record at the WARC magic."""
    good = warc_record("response", "http://ok.test/", http_response(HTML))
    torn = b"WARC/1.0\r\nWARC-Type: response\r\nNO-LENGTH: x\r\n\r\npayload..."
    recs = list(parse_warc_bytes("f", torn + good))
    reasons = [r["corrupt_reason"] for r in recs]
    assert any(r and "Content-Length" in r for r in reasons)
    survivors = [r for r in recs if r["corrupt_reason"] is None]
    assert len(survivors) == 1 and survivors[0]["target_uri"] == "http://ok.test/"

    # payload truncated at EOF
    cut = good[: len(good) - 20]
    recs = list(parse_warc_bytes("f", cut))
    assert [r["corrupt_reason"] for r in recs] == ["payload truncated at EOF"]

    # garbage between two valid records
    recs = list(parse_warc_bytes("f", good + b"\xde\xad\xbe\xef" + good))
    assert sum(r["corrupt_reason"] is None for r in recs) == 2
    assert any(r["corrupt_reason"] == "garbage between records" for r in recs)

    # bad gzip
    recs = list(parse_warc_bytes("f.gz", b"\x1f\x8b" + b"\x00" * 10))
    assert len(recs) == 1 and recs[0]["corrupt_reason"].startswith("gzip")


def test_html_to_text_strips_and_collapses():
    text = html_payload_to_text(HTML, "text/html; charset=utf-8")
    assert text == "T Hello & welcome two words"
    # charset honored; unknown charset falls back instead of raising
    latin = "café".encode("latin-1")
    assert html_payload_to_text(latin, "text/html; charset=latin-1") == "café"
    assert "caf" in html_payload_to_text(latin, 'text/html; charset="no-such-cs"')
    # total on arbitrary bytes
    assert isinstance(html_payload_to_text(bytes(range(256)), None), str)


def test_read_warc_spark_end_to_end(spark, tmp_path):
    plain = tmp_path / "a.warc"
    plain.write_bytes(sample_warc() + b"\xff\xff")  # trailing garbage
    gzed = tmp_path / "b.warc.gz"
    gzed.write_bytes(gzip.compress(sample_warc()))
    warc = read_warc(spark, str(tmp_path))
    good, quarantine = split_warc(warc)
    assert good.count() == 8  # 4 per file
    q = quarantine.collect()
    assert len(q) == 1 and "no WARC magic" in q[0]["corrupt_reason"]
    row = (
        good.filter(good.record_id == "<urn:uuid:2>")
        .orderBy("warc_file")
        .limit(1)
        .collect()[0]
    )
    assert bytes(row["payload"]) == HTML and row["http_status"] == 200


def test_warc_to_documents(spark, tmp_path):
    (tmp_path / "a.warc").write_bytes(sample_warc())
    docs = warc_to_documents(read_warc(spark, str(tmp_path)))
    rows = docs.collect()
    # only the 200-OK text/html response qualifies (not the PNG, not the
    # request, not warcinfo)
    assert len(rows) == 1
    r = rows[0]
    assert r["text"] == "T Hello & welcome two words"
    assert r["source"] == "http://a.test/"
    assert r["n_chars"] == len(r["text"]) and r["lang"] is None
    # stable identity: re-landing the same crawl yields the same doc_id
    again = warc_to_documents(read_warc(spark, str(tmp_path))).collect()[0]
    assert again["doc_id"] == r["doc_id"]


def test_documents_shape_feeds_corpus_operators(spark, tmp_path):
    """The distilled frame must slot into the existing corpus stack —
    prove it by running exact dedup over a two-copy crawl."""
    body = http_response(HTML)
    two = warc_record(
        "response", "http://a.test/", body, rid="<urn:uuid:2>"
    ) + warc_record("response", "http://mirror.test/", body, rid="<urn:uuid:9>")
    (tmp_path / "a.warc").write_bytes(two)
    docs = warc_to_documents(read_warc(spark, str(tmp_path)))
    from pyspark.sql import functions as F

    survivors = (
        docs.groupBy(F.sha2(F.col("text").cast("binary"), 256).alias("h"))
        .agg(F.min("doc_id").alias("doc_id"), F.count("*").alias("copies"))
        .collect()
    )
    assert len(survivors) == 1 and survivors[0]["copies"] == 2


def test_streaming_warc_to_corpus_ingest(spark, tmp_path):
    """The full crawl loop: a WARC drop-folder stream feeds
    CorpusIngestSink — re-crawled pages (same HTML under a new record
    id/uri) are deduplicated against the persisted index across
    micro-batches, and corpus+index publish atomically."""
    from rustcheatersdatapipeline_spark.sources.warc import (
        open_warc_documents_stream,
    )
    from rustcheatersdatapipeline_spark.streaming.ingest import CorpusIngestSink
    from rustcheatersdatapipeline_spark.warehouse.persist import GoldStore

    def page(i: int) -> bytes:
        # fully distinct token streams per page — near-dup dedup must
        # NOT collapse different pages, only true re-crawls
        words = " ".join(f"w{i}x{j}q{(i * 31 + j * 7) % 97}" for j in range(40))
        body = f"<html><body><p>page {i}: {words}</p></body></html>".encode()
        return http_response(body)

    drop = tmp_path / "drop"
    drop.mkdir()
    store = GoldStore(spark, str(tmp_path / "gold"))
    sink = CorpusIngestSink(store, k=9)

    def run():
        q = (
            open_warc_documents_stream(spark, str(drop))
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    (drop / "a.warc").write_bytes(
        warc_record("response", "http://a/1", page(1), rid="<urn:1>")
        + warc_record("response", "http://a/2", page(2), rid="<urn:2>")
    )
    run()
    assert store.read("corpus").count() == 2

    # second crawl file: one re-crawl of page 1 (new uri+rid, same
    # content → digest match, dropped) and one genuinely new page
    (drop / "b.warc").write_bytes(
        warc_record("response", "http://mirror/1", page(1), rid="<urn:9>")
        + warc_record("response", "http://a/3", page(3), rid="<urn:3>")
    )
    run()
    texts = {r["text"] for r in store.read("corpus").collect()}
    assert len(texts) == 3  # pages 1,2,3 exactly once each
    assert store.read("dedup_index").count() == 3


def test_warc_parser_totality_fuzz():
    """Mutating any bytes of a valid WARC (plain or gzip) never raises
    out of parse_warc_bytes and never loses the quarantine accounting:
    every input byte region is either parsed into a record or covered
    by a quarantine row — the parser is total on adversarial input."""
    import numpy as np

    base_plain = sample_warc()
    base_gz = gzip.compress(base_plain)
    rng = np.random.RandomState(99)
    for trial in range(300):
        base = base_plain if trial % 2 == 0 else base_gz
        buf = bytearray(base)
        for _ in range(rng.randint(1, 5)):
            buf[rng.randint(0, len(buf))] = rng.randint(0, 256)
        recs = list(parse_warc_bytes("fuzz", bytes(buf)))
        for r in recs:  # schema invariants hold for every row
            assert (r["corrupt_reason"] is None) == (r["warc_type"] is not None or r["record_id"] is not None or r["payload"] is not None)


def test_streaming_warc_media_to_perceptual_dedup(spark, tmp_path):
    """Image twin of the corpus loop: crawl files carrying PNG responses
    feed MediaIngestSink — a re-crawled image under a new URI (same
    bytes) is dropped against the persisted index; a genuinely new
    image is admitted."""
    import numpy as np

    from rustcheatersdatapipeline_spark.sources.warc import open_warc_media_stream
    from rustcheatersdatapipeline_spark.streaming.ingest import MediaIngestSink
    from rustcheatersdatapipeline_spark.warehouse.persist import GoldStore
    from tests.test_phash import _textured
    from tests.test_pixels_decode import encode_png

    def img_response(seed: int) -> bytes:
        png = encode_png(_textured(seed)[..., None])
        return http_response(png, ctype="image/png")

    drop = tmp_path / "drop"
    drop.mkdir()
    store = GoldStore(spark, str(tmp_path / "gold"))
    sink = MediaIngestSink(store)

    def run():
        q = (
            open_warc_media_stream(spark, str(drop))
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    (drop / "a.warc").write_bytes(
        warc_record("response", "http://a/i1.png", img_response(40), rid="<urn:i1>", )
        + warc_record("response", "http://a/i2.png", img_response(41), rid="<urn:i2>")
        + warc_record("response", "http://a/page", http_response(HTML), rid="<urn:h1>")
    )
    run()
    assert store.read("media").count() == 2  # the HTML response is not media

    (drop / "b.warc").write_bytes(
        warc_record("response", "http://cdn/i1.png", img_response(40), rid="<urn:i9>")
        + warc_record("response", "http://a/i3.png", img_response(42), rid="<urn:i3>")
    )
    run()
    srcs = {r["source"] for r in store.read("media").collect()}
    assert srcs == {"http://a/i1.png", "http://a/i2.png", "http://a/i3.png"}
    assert store.read("media_index").count() == 3


def test_streambuf_garbage_scan_bounded_memory():
    """When the magic never appears (torn record + trailing garbage),
    the scan must NOT accumulate the remaining stream: memory stays at
    one chunk + pattern overlap, and the garbage evidence survives."""
    from rustcheatersdatapipeline_spark.sources.warc import _StreamBuf

    chunk = 1 << 20
    n_chunks = 8
    chunks = (b"x" * chunk for _ in range(n_chunks))
    sb = _StreamBuf(chunks)
    off, garbage = sb.next_magic(b"WARC/", 0)
    assert off == -1 and garbage is True
    assert len(sb.buf) < 2 * chunk  # not the whole 8 MiB stream

    # and a match after a long garbage prefix is still found exactly
    payload = b"y" * (3 * chunk) + b"WARC/1.0\r\nrest"
    sb2 = _StreamBuf(payload[i : i + chunk] for i in range(0, len(payload), chunk))
    off2, garbage2 = sb2.next_magic(b"WARC/", 0)
    assert off2 == 3 * chunk and garbage2 is True
    assert sb2.slice(off2, off2 + 8) == b"WARC/1.0"


def sample_wet() -> bytes:
    """A WET file: the warcinfo header plus conversion records (UTF-8
    text/plain payloads, no HTTP envelope) — Common Crawl's layout."""
    return (
        warc_record("warcinfo", None, b"software: wet-test\r\n", ctype="application/warc-fields")
        + warc_record(
            "conversion",
            "http://a.test/page",
            "Extracted text of page one.\nSecond line — naïve UTF-8 ✓".encode(),
            rid="<urn:uuid:w1>",
            ctype="text/plain",
        )
        + warc_record(
            "conversion",
            "http://b.test/page",
            b"Another page's text.",
            rid="<urn:uuid:w2>",
            ctype="text/plain",
        )
        # a response record interleaved must NOT leak into the WET path
        + warc_record("response", "http://c.test/", http_response(HTML), rid="<urn:uuid:w3>")
    )


def test_wet_to_documents(spark, tmp_path):
    from rustcheatersdatapipeline_spark.sources.warc import read_warc, wet_to_documents

    p = tmp_path / "crawl.warc.wet"
    p.write_bytes(sample_wet())
    docs = wet_to_documents(read_warc(spark, str(p))).collect()
    by_src = {r["source"]: r for r in docs}
    assert set(by_src) == {"http://a.test/page", "http://b.test/page"}
    a = by_src["http://a.test/page"]
    assert a["text"].startswith("Extracted text of page one.")
    assert "naïve UTF-8 ✓" in a["text"]
    assert a["n_chars"] == len(a["text"])
    assert a["doc_id"] is not None and a["lang"] is None
    # idempotent identity: re-reading yields the same doc_ids
    again = {r["source"]: r["doc_id"] for r in
             wet_to_documents(read_warc(spark, str(p))).collect()}
    assert again == {s: r["doc_id"] for s, r in by_src.items()}


def test_wet_corrupt_span_does_not_kill_the_file(spark, tmp_path):
    from rustcheatersdatapipeline_spark.sources.warc import read_warc, wet_to_documents

    blob = sample_wet()
    # truncate a record header mid-stream: quarantine + resync machinery
    # is shared with the response path
    corrupted = blob[:10] + b"GARBAGE" + blob[10:]
    p = tmp_path / "bad.warc.wet"
    p.write_bytes(corrupted)
    docs = wet_to_documents(read_warc(spark, str(p))).collect()
    # at least one conversion record survives the resync
    assert len(docs) >= 1
