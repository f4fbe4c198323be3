"""PDF text extraction (functions/pdftext.py): the oracle is a
test-side minimal PDF WRITER (valid header, object/stream framing,
both plain and FlateDecode content streams) — extraction must recover
the shown strings across every supported string form (literal,
escaped, octal, nested parens, hex, TJ arrays), and the
printable-fraction gate must separate clean extractions from
subset-font garbage."""

import zlib

import pytest

from rustcheatersdatapipeline_spark.functions.pdftext import (
    pdf_to_text,
    printable_fraction,
)


def make_pdf(content: bytes, flate: bool = False) -> bytes:
    data = zlib.compress(content) if flate else content
    filt = b"/Filter /FlateDecode " if flate else b""
    obj = (
        b"4 0 obj\n<< " + filt + b"/Length " + str(len(data)).encode()
        + b" >>\nstream\n" + data + b"\nendstream\nendobj\n"
    )
    return (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n"
        + obj
        + b"trailer\n<< /Root 1 0 R >>\n%%EOF\n"
    )


CONTENT = (
    b"BT /F1 12 Tf 72 700 Td (Hello) Tj ( world) Tj T* "
    b"[(spa)(ced)] TJ (line \\(two\\)) ' <48692121> Tj "
    b"(octal: \\101\\102\\103) Tj ET"
)
EXPECTED = "Hello world spaced line (two) Hi!! octal: ABC"


def test_plain_and_flate_streams():
    assert pdf_to_text(make_pdf(CONTENT)) == EXPECTED
    assert pdf_to_text(make_pdf(CONTENT, flate=True)) == EXPECTED


def test_multiple_streams_in_order():
    pdf = make_pdf(b"BT (first page) Tj ET")
    extra = (
        b"5 0 obj\n<< /Length 21 >>\nstream\nBT (second page) Tj ET\nendstream\nendobj\n"
    )
    combined = pdf.replace(b"trailer", extra + b"trailer")
    assert pdf_to_text(combined) == "first page second page"


def test_out_of_scope_filter_skipped_not_fatal():
    data = b"\x00\x01\x02"
    obj = (
        b"4 0 obj\n<< /Filter /DCTDecode /Length 3 >>\nstream\n"
        + data + b"\nendstream\nendobj\n"
    )
    pdf = b"%PDF-1.4\n" + obj + b"%%EOF\n"
    assert pdf_to_text(pdf) == ""


def test_corrupt_flate_skipped():
    obj = (
        b"4 0 obj\n<< /Filter /FlateDecode /Length 4 >>\nstream\n"
        b"\xde\xad\xbe\xef\nendstream\nendobj\n"
    )
    assert pdf_to_text(b"%PDF-1.4\n" + obj) == ""


def test_non_pdf_raises():
    with pytest.raises(ValueError):
        pdf_to_text(b"GIF89a not a pdf")


def test_printable_gate_separates_garbage():
    clean = pdf_to_text(make_pdf(CONTENT))
    assert printable_fraction(clean) > 0.95
    # subset-font style garbage: random high bytes shown as strings
    garbage = make_pdf(b"BT <0102030405060708090a0b0c> Tj ET")
    g = pdf_to_text(garbage)
    assert printable_fraction(g) < 0.5
    assert printable_fraction("") == 0.0


def test_totality_fuzz():
    import numpy as np

    rng = np.random.RandomState(3)
    base = make_pdf(CONTENT, flate=True)
    for _ in range(300):
        buf = bytearray(base)
        for _ in range(rng.randint(1, 5)):
            buf[rng.randint(5, len(buf))] = rng.randint(0, 256)
        out = pdf_to_text(bytes(buf))  # must never raise past signature
        assert isinstance(out, str)


def test_decompression_bomb_stream_skipped():
    """A tiny /FlateDecode stream inflating past the 256 MiB cap (a
    decompression-bomb PDF in crawl data) must be SKIPPED, not
    materialized — and must not take the rest of the document with it."""
    bomb = zlib.compress(b"(boom) Tj " + b"\x00" * (300 << 20), 9)
    assert len(bomb) < 1 << 20  # the attack premise: tiny on the wire
    pdf = make_pdf(b"BT (before bomb) Tj ET")
    bomb_obj = (
        b"5 0 obj\n<< /Filter /FlateDecode /Length "
        + str(len(bomb)).encode()
        + b" >>\nstream\n" + bomb + b"\nendstream\nendobj\n"
    )
    combined = pdf.replace(b"trailer", bomb_obj + b"trailer")
    assert pdf_to_text(combined) == "before bomb"
