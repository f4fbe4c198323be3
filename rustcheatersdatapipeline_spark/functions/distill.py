"""Unified payload→text distillation — one dispatch for every
text-bearing format the engine decodes.

The WARC path dispatches per-mime (its distillers filter on the HTTP
Content-Type); archive dumps have only filenames and bytes. This
module is the shared magic-sniff dispatcher both can use: given raw
bytes (and optionally a name/mime hint), route to the right extractor
and return plain text, or None when the payload is binary,
out-of-scope, or corrupt — quarantine-not-crash, like every decoder
here.

Dispatch order is magic-first (names lie in the wild): PDF (%PDF),
CFB legacy Office (D0 CF 11 E0), RTF ({\\rtf), ZIP containers
(PK — OOXML/ODT/EPUB via ``office_to_text``), HTML (sniffed tags or
.html name), else UTF-8 text when the name carries a text suffix or
the bytes look like prose. Everything runs inside the caller's Arrow
batch boundary; per-payload work is bounded by each extractor's own
caps.
"""

from __future__ import annotations

#: name suffixes treated as plain text when magic sniffing says nothing
PLAIN_SUFFIXES = (".txt", ".md", ".rst", ".text")
HTML_SUFFIXES = (".html", ".htm", ".xhtml")

#: printable-fraction gate for PDF extractions (same default as the
#: WARC PDF distiller)
PDF_MIN_PRINTABLE = 0.9


def _looks_like_html(data: bytes) -> bool:
    head = data[:1024].lstrip().lower()
    return head.startswith((b"<!doctype html", b"<html", b"<head", b"<body"))


def payload_to_text(
    data: bytes, name: str | None = None, lines: bool = False
) -> str | None:
    """Visible text of an arbitrary text-bearing payload, else None.
    Never raises on arbitrary bytes — extraction failures and named
    codec boundaries both quarantine to None."""
    from ..sources.warc import html_payload_to_text
    from .cfbtext import cfb_to_text
    from .officetext import office_to_text, rtf_to_text
    from .pdftext import pdf_to_text, printable_fraction

    low = (name or "").lower()
    try:
        if data.startswith(b"%PDF"):
            text = pdf_to_text(data)
            return text if printable_fraction(text) >= PDF_MIN_PRINTABLE else None
        if data.startswith(b"\xd0\xcf\x11\xe0"):
            return cfb_to_text(data)[1] or None
        if data.startswith(b"{\\rtf"):
            return rtf_to_text(data) or None
        if data.startswith(b"PK"):
            return office_to_text(data)[1] or None
        if low.endswith(HTML_SUFFIXES) or _looks_like_html(data):
            return html_payload_to_text(data, "text/html; charset=utf-8", lines) or None
        if low.endswith(PLAIN_SUFFIXES):
            return data.decode("utf-8", errors="replace") or None
    except (ValueError, NotImplementedError):
        return None
    return None
