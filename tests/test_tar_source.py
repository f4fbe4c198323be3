"""Tar dataset-dump source (sources/archive.py): forward writers are
stdlib tarfile archives (plain + gz), so member round-trips are exact;
corrupt archives and over-budget members must quarantine, not crash."""

import io
import tarfile

import numpy as np

from rustcheatersdatapipeline_spark.sources.archive import (
    read_tar,
    tar_to_documents,
)


def _make_tar(members: dict[str, bytes], gz: bool = False) -> bytes:
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w:gz" if gz else "w") as tf:
        for name, data in members.items():
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
        d = tarfile.TarInfo("subdir")
        d.type = tarfile.DIRTYPE
        tf.addfile(d)
    return buf.getvalue()


_MEMBERS = {
    "docs/a.txt": b"Plain text document alpha.",
    "docs/b.html": b"<html><body><p>Hyper text beta.</p><script>junk()</script></body></html>",
    "data/skip.bin": b"\x00\x01\x02\x03",
    "docs/c.md": "Unicode — markdown gamma.".encode(),
}


def test_members_round_trip_plain_and_gz(spark, tmp_path):
    (tmp_path / "a.tar").write_bytes(_make_tar(_MEMBERS))
    (tmp_path / "b.tar.gz").write_bytes(_make_tar({"x.txt": b"gzipped shard"}, gz=True))
    rows = read_tar(spark, str(tmp_path)).collect()
    ok = {(r["archive"].rsplit("/", 1)[-1], r["member"]): r for r in rows}
    assert bytes(ok[("a.tar", "docs/a.txt")]["payload"]) == _MEMBERS["docs/a.txt"]
    assert bytes(ok[("b.tar.gz", "x.txt")]["payload"]) == b"gzipped shard"
    assert all(r["corrupt_reason"] is None for r in rows)
    assert len(rows) == 5  # directories skipped


def test_documents_distillation(spark, tmp_path):
    (tmp_path / "a.tar").write_bytes(_make_tar(_MEMBERS))
    docs = {r["source"].split("::")[1]: r for r in tar_to_documents(read_tar(spark, str(tmp_path))).collect()}
    assert set(docs) == {"docs/a.txt", "docs/b.html", "docs/c.md"}  # .bin filtered
    assert docs["docs/a.txt"]["text"] == "Plain text document alpha."
    assert docs["docs/b.html"]["text"] == "Hyper text beta."  # script stripped
    assert "markdown gamma" in docs["docs/c.md"]["text"]
    assert all(r["doc_id"] is not None and r["n_chars"] > 0 for r in docs.values())


def test_member_budget_and_corrupt_quarantine(spark, tmp_path):
    (tmp_path / "a.tar").write_bytes(_make_tar({"big.txt": b"x" * 2048, "ok.txt": b"fine"}))
    (tmp_path / "junk.tar").write_bytes(b"definitely not a tar archive")
    rows = read_tar(spark, str(tmp_path), max_member=1024).collect()
    by_reason = {}
    for r in rows:
        by_reason.setdefault(
            None if r["corrupt_reason"] is None else r["corrupt_reason"].split(":")[0], []
        ).append(r)
    assert [r["member"] for r in by_reason[None]] == ["ok.txt"]
    assert by_reason["member exceeds 1024 bytes"][0]["member"] == "big.txt"
    assert by_reason["unreadable archive"][0]["archive"].endswith("junk.tar")


def test_truncated_archive_keeps_prefix(spark, tmp_path):
    """A torn tail never crashes and never loses the intact prefix:
    stdlib tarfile reads a partial trailing header as end-of-archive,
    so the complete first member survives and the torn second simply
    does not appear (no payload row with garbage bytes)."""
    full = _make_tar({"first.txt": b"kept member", "second.txt": b"lost member"})
    (tmp_path / "torn.tar").write_bytes(full[: 512 + 512 + 100])  # header+data+partial
    rows = read_tar(spark, str(tmp_path)).collect()
    kept = {r["member"] for r in rows if r["corrupt_reason"] is None}
    assert kept == {"first.txt"}


def test_mutation_totality(spark, tmp_path):
    base = _make_tar(_MEMBERS, gz=True)
    rng = np.random.RandomState(9)
    cases = []
    for i in range(40):
        buf = bytearray(base)
        buf[rng.randint(0, len(buf))] ^= rng.randint(1, 256)
        cases.append(bytes(buf[: rng.randint(1, len(buf) + 1)]))
    for i, c in enumerate(cases):
        (tmp_path / f"m{i}.tar.gz").write_bytes(c)
    # every mutated shard parses to rows (possibly quarantine) — no task failure
    rows = read_tar(spark, str(tmp_path)).collect()
    assert len(rows) >= len(cases) * 0  # reaching here is the assertion
    tar_to_documents(read_tar(spark, str(tmp_path))).collect()


def test_zip_shards_share_the_distiller(spark, tmp_path):
    import zipfile

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        for name, data in _MEMBERS.items():
            zf.writestr(name, data)
    (tmp_path / "a.zip").write_bytes(buf.getvalue())
    (tmp_path / "junk.zip").write_bytes(b"PK\x03\x04 but not really a zip")

    from rustcheatersdatapipeline_spark.sources.archive import read_zip

    rows = read_zip(spark, str(tmp_path)).collect()
    ok = {r["member"]: r for r in rows if r["corrupt_reason"] is None}
    assert bytes(ok["docs/a.txt"]["payload"]) == _MEMBERS["docs/a.txt"]
    assert any(
        r["corrupt_reason"] and r["archive"].endswith("junk.zip") for r in rows
    )
    docs = {r["source"].split("::")[1] for r in tar_to_documents(read_zip(spark, str(tmp_path))).collect()}
    assert docs == {"docs/a.txt", "docs/b.html", "docs/c.md"}


def test_zip_member_budget(spark, tmp_path):
    import zipfile

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("big.txt", "x" * 2048)
        zf.writestr("ok.txt", "fine")
    (tmp_path / "a.zip").write_bytes(buf.getvalue())

    from rustcheatersdatapipeline_spark.sources.archive import read_zip

    rows = {r["member"]: r for r in read_zip(spark, str(tmp_path), max_member=1024).collect()}
    assert rows["ok.txt"]["corrupt_reason"] is None
    assert "exceeds" in rows["big.txt"]["corrupt_reason"]


def test_curate_dump_end_to_end(spark, tmp_path):
    """Dump shards → curated corpus: per-archive boilerplate stripped,
    quality cuts applied, re-landing the same dump admits nothing."""
    from rustcheatersdatapipeline_spark.plans.crawl import curate_dump
    from rustcheatersdatapipeline_spark.warehouse.persist import GoldStore

    header = "Generated by DumpTool v3 - do not edit"
    topics = [
        "The river delta floods every spring when snowmelt raises the gauge "
        "past four meters and the levee crews begin their rotating watches.",
        "Compiler backends allocate registers with graph coloring; spilled "
        "values migrate to stack slots whenever the interference graph saturates.",
        "Medieval trade fairs rotated between Champagne towns, each granting "
        "merchants safe conduct and standardized weights for cloth and spice.",
        "Coral polyps secrete aragonite skeletons at night, and the reef's "
        "accretion rate falls measurably when ocean acidity rises offshore.",
    ]
    bodies = {
        f"doc{i}.txt": f"{header}\n{t}".encode() for i, t in enumerate(topics)
    }
    (tmp_path / "dump").mkdir()
    (tmp_path / "dump" / "shard0.tar").write_bytes(_make_tar(bodies))
    store = GoldStore(spark, str(tmp_path / "gold"))
    admitted = curate_dump(spark, str(tmp_path / "dump"), store)
    assert admitted == 4
    rows = store.read("corpus").collect()
    assert len(rows) == 4
    assert all(header not in r["text"] for r in rows)  # template stripped
    joined = " ".join(r["text"] for r in rows)
    for marker in ("river delta", "graph coloring", "Champagne", "aragonite"):
        assert marker in joined  # every distinct body survived curation
    assert curate_dump(spark, str(tmp_path / "dump"), store) == 0  # idempotent


def test_mixed_format_dump_distillation(spark, tmp_path):
    """A dump mixing PDF, DOCX, legacy .doc, EPUB, RTF, HTML, and plain
    text distills every text-bearing member through the unified
    magic-sniff dispatcher; binary members drop."""
    from tests.test_cfbtext import make_cfb, make_doc_streams
    from tests.test_officetext import make_docx, make_epub
    from tests.test_pdftext import make_pdf

    members = {
        "a.txt": b"Plain prose member.",
        "b.html": b"<html><body><p>Markup member.</p></body></html>",
        "c.pdf": make_pdf(b"BT (Portable member text) Tj ET"),
        "d.docx": make_docx([["Open XML member."]]),
        "e.doc": make_cfb(make_doc_streams([("Legacy binary member.\r", True)])),
        "f.epub": make_epub(["Electronic book member."]),
        "g.rtf": rb"{\rtf1 Rich text member. \par}",
        "z.bin": b"\x00\x01\x02\xff pure binary",
    }
    (tmp_path / "mixed.tar").write_bytes(_make_tar(members))
    docs = {
        r["source"].split("::")[1]: r["text"]
        for r in tar_to_documents(read_tar(spark, str(tmp_path))).collect()
    }
    assert "z.bin" not in docs
    assert docs["a.txt"] == "Plain prose member."
    assert docs["b.html"] == "Markup member."
    assert "Portable member text" in docs["c.pdf"]
    assert "Open XML member." in docs["d.docx"]
    assert "Legacy binary member." in docs["e.doc"]
    assert "Electronic book member." in docs["f.epub"]
    assert "Rich text member." in docs["g.rtf"]


def test_jsonl_and_gzipped_members(spark, tmp_path):
    """.jsonl members explode one document per text line; .gz members
    inflate and re-dispatch on the inner name; identities stay unique
    and idempotent."""
    import gzip
    import json

    jsonl = b"\n".join(
        [
            json.dumps({"text": "Line document one.", "meta": 1}).encode(),
            b"not json at all {",
            json.dumps({"no_text": True}).encode(),
            json.dumps({"text": "Line document two."}).encode(),
        ]
    )
    members = {
        "corpus.jsonl": jsonl,
        "packed.jsonl.gz": gzip.compress(
            json.dumps({"text": "Compressed line document."}).encode()
        ),
        "page.html.gz": gzip.compress(b"<html><body><p>Zipped markup.</p></body></html>"),
    }
    (tmp_path / "a.tar").write_bytes(_make_tar(members))
    rows = tar_to_documents(read_tar(spark, str(tmp_path))).collect()
    by_src = {r["source"].split("::", 1)[1]: r["text"] for r in rows}
    assert by_src == {
        "corpus.jsonl": "Line document one.",
        "corpus.jsonl#1": "Line document two.",
        "packed.jsonl.gz": "Compressed line document.",
        "page.html.gz": "Zipped markup.",
    }
    assert len({r["doc_id"] for r in rows}) == 4  # unique identities


def test_payload_to_text_dispatch_totality():
    """Arbitrary byte mutations of every supported format through the
    ONE dispatch entry either distill or return None — never raise
    (the same single-dispatch fuzz contract as the image decoders)."""
    from tests.test_cfbtext import make_cfb, make_doc_streams
    from tests.test_officetext import make_docx, make_epub
    from tests.test_pdftext import make_pdf

    from rustcheatersdatapipeline_spark.functions.distill import payload_to_text

    bases = [
        (b"plain prose bytes", "a.txt"),
        (b"<html><body><p>markup</p></body></html>", "b.html"),
        (make_pdf(b"BT (pdf text) Tj ET"), "c.pdf"),
        (make_docx([["docx text"]]), "d.docx"),
        (make_cfb(make_doc_streams([("doc text.\r", True)])), "e.doc"),
        (make_epub(["epub text"]), "f.epub"),
        (rb"{\rtf1 rtf text \par}", "g.rtf"),
    ]
    rng = np.random.RandomState(17)
    for base, name in bases:
        for _ in range(80):
            buf = bytearray(base)
            buf[rng.randint(0, len(buf))] ^= rng.randint(1, 256)
            out = payload_to_text(bytes(buf[: rng.randint(1, len(buf) + 1)]), name)
            assert out is None or isinstance(out, str)
