"""Office Open XML text extraction (DOCX / XLSX / PPTX) — pure stdlib.

Crawl dumps carry these as ``application/vnd.openxmlformats-…``
responses (and as generic zips); they are ZIP containers of XML parts
(public ECMA-376 standard), so the stdlib ``zipfile`` + an XML text
walk extracts the visible text with no dependency — the same
distill-into-the-documents-shape role as ``pdftext``:

- **DOCX**: ``word/document.xml`` — ``<w:t>`` runs joined per
  paragraph (``<w:p>``), tabs/breaks as whitespace;
- **PPTX**: ``ppt/slides/slideN.xml`` in slide order — ``<a:t>`` runs
  joined per paragraph (``<a:p>``);
- **XLSX**: the shared-strings table (``xl/sharedStrings.xml``,
  ``<t>`` entries) plus inline cell strings — the textual content a
  curation pass cares about (numbers are data, not prose).

Parsing uses ``xml.etree`` with entity expansion implicitly disabled
(stdlib default: no external entities), a bounded decompressed-size
cap per part (zip-bomb discipline, same contract as the PDF/PNG
inflate caps), and the never-crash quarantine: any malformed container
raises ValueError into the shared ``DECODE_QUARANTINE``.
"""

from __future__ import annotations

import io
import re
import zipfile
from xml.etree import ElementTree

#: per-part decompressed ceiling — a tiny zip entry inflating to GBs
#: must skip, not OOM (the PDF _PDF_MAX_INFLATE_BYTES discipline)
_MAX_PART_BYTES = 64 * 1024 * 1024

_W = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"
_A = "{http://schemas.openxmlformats.org/drawingml/2006/main}"
_S = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"


def _read_part(zf: zipfile.ZipFile, name: str) -> bytes | None:
    try:
        info = zf.getinfo(name)
    except KeyError:
        return None
    if info.file_size > _MAX_PART_BYTES:
        raise ValueError(f"OOXML: part {name} exceeds inflate bound")
    with zf.open(info) as f:
        return f.read(_MAX_PART_BYTES + 1)


def _parse(data: bytes) -> ElementTree.Element:
    try:
        return ElementTree.fromstring(data)
    except ElementTree.ParseError as exc:
        raise ValueError(f"OOXML: malformed XML part ({exc})") from None


def _docx_text(zf: zipfile.ZipFile) -> str:
    data = _read_part(zf, "word/document.xml")
    if data is None:
        raise ValueError("DOCX: no word/document.xml part")
    root = _parse(data)
    paras = []
    for p in root.iter(f"{_W}p"):
        runs = []
        for node in p.iter():
            if node.tag == f"{_W}t":
                runs.append(node.text or "")
            elif node.tag in (f"{_W}tab", f"{_W}br"):
                runs.append(" ")
        text = "".join(runs).strip()
        if text:
            paras.append(text)
    return "\n".join(paras)


def _pptx_text(zf: zipfile.ZipFile) -> str:
    slides = sorted(
        (n for n in zf.namelist() if re.fullmatch(r"ppt/slides/slide\d+\.xml", n)),
        key=lambda n: int(re.search(r"\d+", n.rsplit("/", 1)[1]).group()),
    )
    if not slides:
        raise ValueError("PPTX: no slide parts")
    paras = []
    for name in slides:
        root = _parse(_read_part(zf, name))
        for p in root.iter(f"{_A}p"):
            text = "".join(t.text or "" for t in p.iter(f"{_A}t")).strip()
            if text:
                paras.append(text)
    return "\n".join(paras)


def _xlsx_text(zf: zipfile.ZipFile) -> str:
    out = []
    shared = _read_part(zf, "xl/sharedStrings.xml")
    if shared is not None:
        root = _parse(shared)
        for si in root.iter(f"{_S}si"):
            text = "".join(t.text or "" for t in si.iter(f"{_S}t")).strip()
            if text:
                out.append(text)
    for name in sorted(n for n in zf.namelist() if re.fullmatch(r"xl/worksheets/sheet\d+\.xml", n)):
        root = _parse(_read_part(zf, name))
        for c in root.iter(f"{_S}c"):
            if c.get("t") == "inlineStr":
                text = "".join(t.text or "" for t in c.iter(f"{_S}t")).strip()
                if text:
                    out.append(text)
    if not out and shared is None:
        raise ValueError("XLSX: no shared strings or inline strings")
    return "\n".join(out)


_ODT_TEXT = "{urn:oasis:names:tc:opendocument:xmlns:text:1.0}"


def _odt_text(zf: zipfile.ZipFile) -> str:
    data = _read_part(zf, "content.xml")
    if data is None:
        raise ValueError("ODT: no content.xml part")
    root = _parse(data)
    paras = []
    for node in root.iter():
        if node.tag in (f"{_ODT_TEXT}p", f"{_ODT_TEXT}h"):
            text = "".join(node.itertext()).strip()
            if text:
                paras.append(text)
    return "\n".join(paras)


def _epub_text(zf: zipfile.ZipFile) -> str:
    """EPUB (public OCF/OPF spec: a zip of XHTML content documents):
    reading order from the OPF spine (located via
    ``META-INF/container.xml``) when parseable, else all HTML-ish
    members in name order; each content document goes through the same
    total HTML extractor the WARC distiller uses."""
    from ..sources.warc import html_payload_to_text

    spine: list[str] | None = None
    container = _read_part(zf, "META-INF/container.xml")
    if container is not None:
        try:
            root = _parse(container)
            opf_path = next(
                (
                    e.get("full-path")
                    for e in root.iter()
                    if e.tag.endswith("rootfile") and e.get("full-path")
                ),
                None,
            )
            if opf_path:
                opf_data = _read_part(zf, opf_path)
                if opf_data is not None:
                    opf = _parse(opf_data)
                    base = opf_path.rsplit("/", 1)[0] + "/" if "/" in opf_path else ""
                    manifest = {
                        e.get("id"): e.get("href")
                        for e in opf.iter()
                        if e.tag.endswith("item") and e.get("href")
                    }
                    order = [
                        manifest.get(e.get("idref"))
                        for e in opf.iter()
                        if e.tag.endswith("itemref")
                    ]
                    spine = [base + h for h in order if h]
        except ValueError:
            spine = None
    if not spine:
        spine = sorted(
            n for n in zf.namelist() if n.lower().endswith((".xhtml", ".html", ".htm"))
        )
    chunks = []
    for name in spine:
        data = _read_part(zf, name)
        if data is None:
            continue
        text = html_payload_to_text(data, "text/html; charset=utf-8")
        if text:
            chunks.append(text)
    if not chunks:
        raise ValueError("EPUB: no content documents")
    return "\n".join(chunks)


_RTF_CONTROL = re.compile(rb"\\([a-z]{1,32})(-?\d{1,10})? ?|\\'([0-9a-fA-F]{2})|\\([^a-z])")
_RTF_SKIP_DESTS = {
    b"fonttbl", b"colortbl", b"stylesheet", b"info", b"pict",
    b"header", b"footer", b"*",
}


def rtf_to_text(buf: bytes) -> str:
    """Visible text of an RTF payload (public word-processing format
    still common in older crawls): group-aware control-word strip —
    non-text destinations (font/color tables, embedded pictures)
    skipped wholesale, \\par/\\tab mapped to whitespace, hex escapes
    decoded. Raises ValueError for non-RTF bytes."""
    if not buf.startswith(b"{\\rtf"):
        raise ValueError("not an RTF payload")
    out: list[str] = []
    depth = 0
    skip_until: int | None = None
    i = 0
    n = len(buf)
    while i < n:
        c = buf[i : i + 1]
        if c == b"{":
            depth += 1
            # a group starting with a skip destination is dropped whole
            m = _RTF_CONTROL.match(buf, i + 1)
            probe = i + 1
            if buf[probe : probe + 2] == b"\\*":
                if skip_until is None:
                    skip_until = depth
            elif m and m.group(1) in _RTF_SKIP_DESTS and skip_until is None:
                skip_until = depth
            i += 1
            continue
        if c == b"}":
            if skip_until is not None and depth == skip_until:
                skip_until = None
            depth = max(depth - 1, 0)
            i += 1
            continue
        if c == b"\\":
            m = _RTF_CONTROL.match(buf, i)
            if not m:
                i += 1
                continue
            if skip_until is None:
                word, hexv, esc = m.group(1), m.group(3), m.group(4)
                if hexv is not None:
                    out.append(bytes([int(hexv, 16)]).decode("latin-1"))
                elif esc is not None and esc in b"\\{}":
                    out.append(esc.decode("latin-1"))
                elif word in (b"par", b"line"):
                    out.append("\n")
                elif word == b"tab":
                    out.append(" ")
                elif word == b"u" and m.group(2):
                    cp = int(m.group(2))
                    out.append(chr(cp + 65536 if cp < 0 else cp))
                    i = m.end() + 1  # consume the ANSI fallback char
                    continue
            i = m.end()
            continue
        if skip_until is None and c not in (b"\r", b"\n"):
            out.append(c.decode("latin-1"))
        i += 1
    return " ".join("".join(out).split())


def office_to_text(buf: bytes) -> tuple[str, str]:
    """(kind, visible text) of an OOXML payload — kind ∈ docx/pptx/xlsx,
    sniffed from the container's parts. Raises ValueError for non-zip
    or non-OOXML bytes (quarantine discipline; never crashes a task)."""
    if buf[:2] != b"PK":
        raise ValueError("not a ZIP container")
    import zlib

    try:
        with zipfile.ZipFile(io.BytesIO(buf)) as zf:
            names = set(zf.namelist())
            if "mimetype" in names:
                mt = (_read_part(zf, "mimetype") or b"").strip()
                if mt == b"application/epub+zip":
                    return "epub", _epub_text(zf)
            if "word/document.xml" in names:
                return "docx", _docx_text(zf)
            if any(n.startswith("ppt/slides/") for n in names):
                return "pptx", _pptx_text(zf)
            if any(n.startswith("xl/") for n in names):
                return "xlsx", _xlsx_text(zf)
            if "content.xml" in names:
                return "odt", _odt_text(zf)
    except (zipfile.BadZipFile, zlib.error, EOFError, OSError) as exc:
        # a corrupt member can surface from any read, not just open()
        raise ValueError(f"OOXML: bad zip ({exc})") from None
    raise ValueError("OOXML: no recognized document parts")
