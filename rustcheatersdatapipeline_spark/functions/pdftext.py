"""PDF text extraction — pure stdlib, scoped to the crawl-curation
common case.

Crawl dumps carry ``application/pdf`` responses alongside HTML; this
module distills the extractable subset into the documents shape so the
same dedup/quality stack applies. Scope (named, like the codec
boundaries in functions/jpeg.py): content streams stored plain or
``/FlateDecode``, text shown with the standard ``Tj``/``'``/``"``/
``TJ`` operators, strings in literal ``(...)`` (escapes, nesting,
octal) or hex ``<...>`` form, byte text decoded as Latin-1 (≈ WinAnsi
for the printable range). PDFs using other stream filters are skipped
stream-by-stream; PDFs whose fonts use subset/CID encodings extract as
garbage BYTES by design — callers gate on ``printable_fraction`` (and
the corpus compression/quality cuts) rather than trusting every PDF.

This is deliberately an extraction HEURISTIC with a quality signal,
not a full PDF renderer: the 80% of crawl PDFs with standard encodings
distill cleanly; the rest are detected and quarantined, never crash a
task (same totality discipline as every decoder here).
"""

from __future__ import annotations

import re
import zlib

#: Per-stream inflate cap. A decompression-bomb PDF (tiny /FlateDecode
#: stream inflating to GBs) must skip the stream, not OOM the executor —
#: same bound discipline as the PNG/GIF decode caps in pixels.py. Real
#: content streams are text operators; 256 MiB is orders beyond any
#: legitimate page description.
_PDF_MAX_INFLATE_BYTES = 256 * 1024 * 1024

_LITERAL = re.compile(rb"\((?:\\.|[^\\()])*\)", re.S)
_HEX = re.compile(rb"<[0-9A-Fa-f\s]*>")
_SHOW = re.compile(
    rb"(\((?:\\.|[^\\()])*\)|<[0-9A-Fa-f\s]*>)\s*(Tj|'|\")", re.S
)
_TJ_ARRAY = re.compile(rb"\[((?:\((?:\\.|[^\\()])*\)|<[0-9A-Fa-f\s]*>|[^\]])*)\]\s*TJ", re.S)
_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _decode_literal(tok: bytes) -> bytes:
    """Unescape a PDF literal string token ``( ... )``."""
    body = tok[1:-1]
    out = bytearray()
    i = 0
    while i < len(body):
        c = body[i : i + 1]
        if c != b"\\":
            out += c
            i += 1
            continue
        nxt = body[i + 1 : i + 2]
        if nxt.isdigit():  # octal escape, 1-3 digits
            j = i + 1
            while j < min(i + 4, len(body)) and body[j : j + 1].isdigit():
                j += 1
            out.append(int(body[i + 1 : j], 8) & 0xFF)
            i = j
        elif nxt in _ESCAPES:
            out += _ESCAPES[nxt]
            i += 2
        else:  # line continuation or unknown escape: drop the backslash
            i += 1
    return bytes(out)


def _decode_hex(tok: bytes) -> bytes:
    h = re.sub(rb"\s", b"", tok[1:-1])
    if len(h) % 2:
        h += b"0"
    try:
        return bytes.fromhex(h.decode("ascii"))
    except ValueError:
        return b""


def _string_bytes(tok: bytes) -> bytes:
    return _decode_literal(tok) if tok.startswith(b"(") else _decode_hex(tok)


def _content_text(stream: bytes) -> list[bytes]:
    """Shown-string bytes from one content stream, in stream order."""
    pieces: list[tuple[int, bytes]] = []
    for m in _SHOW.finditer(stream):
        pieces.append((m.start(), _string_bytes(m.group(1))))
    for m in _TJ_ARRAY.finditer(stream):
        arr = m.group(1)
        buf = b"".join(
            _string_bytes(t.group(0))
            for t in re.finditer(rb"\((?:\\.|[^\\()])*\)|<[0-9A-Fa-f\s]*>", arr)
        )
        pieces.append((m.start(), buf))
    return [b for _, b in sorted(pieces)]


def pdf_to_text(buf: bytes) -> str:
    """Visible text of a PDF payload (whitespace-collapsed). Raises
    ValueError for non-PDF bytes; skips streams it cannot inflate or
    whose filter is out of scope — never raises past the signature
    check (quarantine discipline)."""
    if not buf.startswith(b"%PDF-"):
        raise ValueError("not a PDF payload")
    texts: list[bytes] = []
    # lookbehind: "endstream\n" must not open a phantom stream
    for m in re.finditer(rb"(?<!end)stream\r?\n", buf):
        start = m.end()
        end = buf.find(b"endstream", start)
        if end == -1:
            continue
        data = buf[start:end].rstrip(b"\r\n")
        dict_start = buf.rfind(b"<<", 0, m.start())
        hdr = buf[dict_start : m.start()] if dict_start != -1 else b""
        if b"/FlateDecode" in hdr:
            try:
                d = zlib.decompressobj()
                data = d.decompress(data, _PDF_MAX_INFLATE_BYTES)
                if d.unconsumed_tail:  # bomb: cap hit with input left
                    continue
            except zlib.error:
                continue
        elif b"/Filter" in hdr:
            continue  # out-of-scope filter (DCT, LZW, CCITT, ...)
        if b"Tj" not in data and b"TJ" not in data and b"'" not in data:
            continue
        texts.extend(_content_text(data))
    raw = b" ".join(texts)
    return " ".join(raw.decode("latin-1").split())


def printable_fraction(text: str) -> float:
    """Share of characters that are printable-or-space — the gate that
    separates standard-encoding extractions (≈1.0) from subset/CID-font
    garbage (≪1). Empty text scores 0 (no signal → not admissible)."""
    if not text:
        return 0.0
    return sum(c.isprintable() or c.isspace() for c in text) / len(text)
