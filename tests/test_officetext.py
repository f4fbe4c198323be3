"""Office Open XML text extraction (functions/officetext.py): oracles
are test-side WRITERS of minimal-but-valid DOCX/PPTX/XLSX containers
(zipfile + the real ECMA-376 namespaces); extraction must recover the
planted text in document order, gate on malformed parts, and respect
the zip-bomb inflate bound."""

import io
import zipfile

import numpy as np
import pytest

from rustcheatersdatapipeline_spark.functions.officetext import office_to_text

_W_NS = 'xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main"'
_A_NS = 'xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/main"'
_S_NS = 'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'


def _zip(parts: dict[str, bytes]) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        for name, data in parts.items():
            zf.writestr(name, data)
    return buf.getvalue()


def make_docx(paragraphs: list[list[str]]) -> bytes:
    body = "".join(
        "<w:p>" + "".join(f"<w:r><w:t>{t}</w:t></w:r>" for t in runs) + "</w:p>"
        for runs in paragraphs
    )
    xml = f'<?xml version="1.0"?><w:document {_W_NS}><w:body>{body}</w:body></w:document>'
    return _zip({"word/document.xml": xml.encode(), "[Content_Types].xml": b"<x/>"})


def make_pptx(slides: list[list[str]]) -> bytes:
    parts = {"[Content_Types].xml": b"<x/>"}
    for i, paras in enumerate(slides, start=1):
        body = "".join(
            f"<a:p><a:r><a:t>{t}</a:t></a:r></a:p>" for t in paras
        )
        parts[f"ppt/slides/slide{i}.xml"] = (
            f'<?xml version="1.0"?><p:sld xmlns:p="x" {_A_NS}><p:txBody>{body}</p:txBody></p:sld>'
        ).encode()
    return _zip(parts)


def make_xlsx(shared: list[str], inline: list[str] = ()) -> bytes:
    ss = "".join(f"<si><t>{t}</t></si>" for t in shared)
    cells = "".join(
        f'<c t="inlineStr"><is><t>{t}</t></is></c>' for t in inline
    )
    return _zip(
        {
            "[Content_Types].xml": b"<x/>",
            "xl/sharedStrings.xml": f'<sst {_S_NS}>{ss}</sst>'.encode(),
            "xl/worksheets/sheet1.xml": f'<worksheet {_S_NS}><sheetData><row>{cells}</row></sheetData></worksheet>'.encode(),
        }
    )


def test_docx_paragraph_order_and_runs():
    buf = make_docx([["Hello ", "world"], ["second paragraph"]])
    kind, text = office_to_text(buf)
    assert kind == "docx"
    assert text == "Hello world\nsecond paragraph"


def test_pptx_slide_order():
    buf = make_pptx([["slide one title"], ["slide two", "bullet"]])
    kind, text = office_to_text(buf)
    assert kind == "pptx"
    assert text == "slide one title\nslide two\nbullet"
    # slide10 must sort after slide2 (numeric, not lexicographic)
    big = make_pptx([[f"s{i}"] for i in range(1, 12)])
    assert office_to_text(big)[1].split("\n") == [f"s{i}" for i in range(1, 12)]


def test_xlsx_shared_and_inline_strings():
    buf = make_xlsx(["alpha", "beta"], inline=["gamma"])
    kind, text = office_to_text(buf)
    assert kind == "xlsx"
    assert text == "alpha\nbeta\ngamma"


def test_quarantine_paths():
    with pytest.raises(ValueError, match="ZIP"):
        office_to_text(b"not a zip at all")
    with pytest.raises(ValueError, match="bad zip|recognized"):
        office_to_text(b"PK\x03\x04garbage")
    with pytest.raises(ValueError, match="recognized"):
        office_to_text(_zip({"mimetype": b"whatever"}))
    bad_xml = _zip({"word/document.xml": b"<w:document>truncated"})
    with pytest.raises(ValueError, match="malformed XML"):
        office_to_text(bad_xml)


def test_zip_bomb_bound():
    bomb = _zip({"word/document.xml": b"\x00" * (70 * 1024 * 1024)})
    with pytest.raises(ValueError, match="inflate bound"):
        office_to_text(bomb)


def test_mutation_totality():
    base = make_docx([["some text here"]])
    rng = np.random.RandomState(0)
    for _ in range(200):
        buf = bytearray(base)
        buf[rng.randint(0, len(buf))] ^= rng.randint(1, 256)
        try:
            office_to_text(bytes(buf[: rng.randint(0, len(buf) + 1)]))
        except ValueError:
            pass


def test_crawl_distillation(spark, tmp_path):
    """DOCX responses in a WARC distill into the documents shape and
    join the curated corpus."""
    from rustcheatersdatapipeline_spark.plans.crawl import distill_and_curate
    from tests.test_warc_source import http_response, warc_record
    from tests.test_crawl_pipeline import _crawl_bytes

    words = " ".join(f"token{i}" for i in range(40))
    docx = make_docx([[f"An office document about data pipelines. {words}"]])
    recs = _crawl_bytes() + warc_record(
        "response",
        "http://a.test/report.docx",
        http_response(
            docx,
            ctype="application/vnd.openxmlformats-officedocument.wordprocessingml.document",
        ),
        rid="<urn:docx1>",
    )
    (tmp_path / "dump.warc").write_bytes(recs)
    out = {r["source"]: r for r in distill_and_curate(spark, str(tmp_path)).collect()}
    assert "http://a.test/report.docx" in out
    assert "office document about data pipelines" in out["http://a.test/report.docx"]["text"]


def make_odt(paragraphs: list[str]) -> bytes:
    ns = 'xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0"'
    body = "".join(f"<text:p>{p}</text:p>" for p in paragraphs)
    return _zip(
        {
            "mimetype": b"application/vnd.oasis.opendocument.text",
            "content.xml": f'<?xml version="1.0"?><doc {ns}>{body}</doc>'.encode(),
        }
    )


def test_odt_extraction():
    kind, text = office_to_text(make_odt(["first para", "second para"]))
    assert kind == "odt"
    assert text == "first para\nsecond para"


def test_rtf_extraction():
    from rustcheatersdatapipeline_spark.functions.officetext import rtf_to_text

    rtf = (
        rb"{\rtf1\ansi{\fonttbl{\f0 Times New Roman;}}"
        rb"{\colortbl;\red0\green0\blue0;}"
        rb"\f0\fs24 Hello \b bold\b0  world\par second\tab line"
        rb" hex:\'e9 uni:\u233?}"
    )
    text = rtf_to_text(rtf)
    assert "Hello bold world" in text
    assert "second line" in text
    assert "Times New Roman" not in text  # font table skipped
    assert "\xe9" in text  # hex escape
    assert text.count("\xe9") >= 2  # \u233 too
    assert "?" not in text  # \uN ANSI fallback consumed, not emitted
    with pytest.raises(ValueError):
        rtf_to_text(b"plain text")
    # totality under mutation
    rng = np.random.RandomState(1)
    for _ in range(200):
        buf = bytearray(rtf)
        buf[rng.randint(0, len(buf))] ^= rng.randint(1, 256)
        try:
            rtf_to_text(bytes(buf[: rng.randint(0, len(buf) + 1)]))
        except ValueError:
            pass


# ---------------------------------------------------------------- epub


def make_epub(chapters: list[str], with_spine: bool = True, reverse_spine: bool = False) -> bytes:
    """OCF container: mimetype + container.xml → OPF spine → XHTML
    chapters (named so name-order DIFFERS from spine order when
    ``reverse_spine`` exercises the spine path)."""
    files = {
        f"OEBPS/ch{i}.xhtml": f"<html><body><p>{c}</p></body></html>".encode()
        for i, c in enumerate(chapters)
    }
    order = list(range(len(chapters)))
    if reverse_spine:
        order = order[::-1]
    manifest = "".join(
        f'<item id="c{i}" href="ch{i}.xhtml" media-type="application/xhtml+xml"/>'
        for i in range(len(chapters))
    )
    spine = "".join(f'<itemref idref="c{i}"/>' for i in order)
    opf = (
        '<?xml version="1.0"?><package xmlns="http://www.idpf.org/2007/opf">'
        f"<manifest>{manifest}</manifest><spine>{spine}</spine></package>"
    ).encode()
    container = (
        '<?xml version="1.0"?><container xmlns="urn:oasis:names:tc:opendocument:xmlns:container">'
        '<rootfiles><rootfile full-path="OEBPS/content.opf" media-type="application/oebps-package+xml"/>'
        "</rootfiles></container>"
    ).encode()
    parts = {"mimetype": b"application/epub+zip", **files}
    if with_spine:
        parts["META-INF/container.xml"] = container
        parts["OEBPS/content.opf"] = opf
    return _zip(parts)


def test_epub_spine_order():
    chapters = ["First chapter text.", "Second chapter text.", "Third chapter text."]
    kind, text = office_to_text(make_epub(chapters, reverse_spine=True))
    assert kind == "epub"
    assert text.split("\n") == chapters[::-1]  # spine order wins over names


def test_epub_fallback_without_container():
    chapters = ["Alpha body.", "Beta body."]
    kind, text = office_to_text(make_epub(chapters, with_spine=False))
    assert kind == "epub" and text.split("\n") == chapters


def test_epub_mutation_totality():
    base = make_epub(["Some chapter."])
    rng = __import__("numpy").random.RandomState(7)
    for _ in range(150):
        buf = bytearray(base)
        buf[rng.randint(0, len(buf))] ^= rng.randint(1, 256)
        try:
            office_to_text(bytes(buf[: rng.randint(0, len(buf) + 1)]))
        except ValueError:
            pass
