"""Embedded text-metadata extraction from media payloads — pure stdlib.

Training-data pipelines mine captions, authorship and provenance from
the metadata containers media files already carry.  This module walks
the public formats' text-bearing structures and emits bounded
(key, value) string rows:

- **ID3v2.3/2.4** (MP3): ``T***`` text frames (TIT2/TPE1/TALB/...),
  all four spec text encodings (latin-1, UTF-16 w/ BOM, UTF-16BE,
  UTF-8), syncsafe v2.4 / plain v2.3 frame sizes;
- **FLAC**: VORBIS_COMMENT block — vendor string + ``KEY=value``
  UTF-8 pairs (the Ogg/Vorbis comment spec);
- **PNG**: ``tEXt`` (latin-1), ``zTXt`` (zlib-deflated latin-1) and
  uncompressed ``iTXt`` (UTF-8) chunks;
- **JPEG / WebP / TIFF**: EXIF ASCII tags (ImageDescription, Make,
  Model, Software, DateTime, Artist, Copyright) from the APP1 segment,
  the WebP ``EXIF`` chunk, or the TIFF IFD itself;
- **GIF**: comment extensions (0xFE);
- **RIFF** (WAV/AVI/WebP): ``LIST INFO`` text chunks (INAM/IART/...).

Spark surface: ``extract_media_metadata`` is the same Arrow
``mapInPandas`` shape as ``featurize_pixels`` — payload bytes in, a
bounded number of short string rows out (caps on rows per item and
value length make the output metadata-sized at any corpus scale).
Malformed structures contribute nothing and never fail a task — the
quarantine stance metadata shares with every decoder here.

(Reference parity: the reference pipeline stores media opaquely —
/root/reference/dags/custom_operators/SteamToS3Operator.py — this is
engine extension surface for training-data provenance mining, beside
featurize/phash.)
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame

#: bounded output: rows per item / characters per value
_MAX_ROWS_PER_ITEM = 64
_MAX_VALUE_CHARS = 512
_MAX_KEY_CHARS = 64

METADATA_SCHEMA = "item_id bigint, source string, key string, value string"

#: EXIF/TIFF ASCII tags worth surfacing (public TIFF 6.0 / EXIF tags)
_EXIF_ASCII_TAGS = {
    0x010E: "ImageDescription",
    0x010F: "Make",
    0x0110: "Model",
    0x0131: "Software",
    0x0132: "DateTime",
    0x013B: "Artist",
    0x8298: "Copyright",
}

#: RIFF LIST/INFO text chunk ids (public AVI/WAV metadata registry)
_RIFF_INFO_KEYS = {
    b"INAM": "Title",
    b"IART": "Artist",
    b"ICMT": "Comment",
    b"ICRD": "CreationDate",
    b"ISFT": "Software",
    b"ICOP": "Copyright",
    b"ISBJ": "Subject",
}


def _clean(value: str) -> str:
    v = value.replace("\x00", "").strip()
    return v[:_MAX_VALUE_CHARS]


# ------------------------------------------------------------------ ID3v2


def _id3v2_text(data: bytes, enc: int) -> str:
    if enc == 0:
        return data.decode("latin-1", "replace")
    if enc == 1:
        return data.decode("utf-16", "replace")
    if enc == 2:
        return data.decode("utf-16-be", "replace")
    return data.decode("utf-8", "replace")


def _iter_id3v2(buf: bytes) -> Iterator[tuple[str, str]]:
    if buf[:3] != b"ID3" or len(buf) < 10:
        return
    major = buf[3]
    size = 0
    for b in buf[6:10]:
        if b & 0x80:
            return
        size = (size << 7) | b
    if buf[5] & 0x80:  # v2.3 global unsynchronisation: FF 00 -> FF
        buf = buf[:10] + buf[10 : 10 + size].replace(b"\xff\x00", b"\xff")
        size = len(buf) - 10
    end = min(10 + size, len(buf))
    pos = 10
    if buf[5] & 0x40:  # extended header: skip by its own size field
        if pos + 4 > end:
            return
        ext = int.from_bytes(buf[pos : pos + 4], "big")
        if major >= 4:  # syncsafe
            ext = ((ext & 0x7F000000) >> 3 | (ext & 0x7F0000) >> 2
                   | (ext & 0x7F00) >> 1 | (ext & 0x7F))
        pos += ext if major >= 4 else ext + 4
    while pos + 10 <= end:
        fid = buf[pos : pos + 4]
        if fid == b"\x00\x00\x00\x00":
            return
        raw = int.from_bytes(buf[pos + 4 : pos + 8], "big")
        if major >= 4:  # v2.4 syncsafe frame sizes
            if raw & 0x80808080:
                return
            fsize = ((raw & 0x7F000000) >> 3 | (raw & 0x7F0000) >> 2
                     | (raw & 0x7F00) >> 1 | (raw & 0x7F))
        else:
            fsize = raw
        fflags = buf[pos + 9] if pos + 10 <= len(buf) else 0
        body = buf[pos + 10 : pos + 10 + fsize]
        pos += 10 + fsize
        if len(body) < 1 or fsize <= 0:
            continue
        if major >= 4 and fflags & 0x02:  # v2.4 per-frame unsync
            body = body.replace(b"\xff\x00", b"\xff")
        if fid[0:1] == b"T" and fid.isalnum():
            try:
                key = fid.decode("ascii")
                if fid == b"TXXX":
                    # description \x00 value, both in the frame encoding
                    txt = _id3v2_text(body[1:], body[0])
                    if "\x00" in txt:
                        desc, val = txt.split("\x00", 1)
                        yield (f"TXXX:{desc}"[:_MAX_KEY_CHARS], _clean(val))
                    continue
                yield (key, _clean(_id3v2_text(body[1:], body[0])))
            except Exception:
                continue


# ----------------------------------------------------------------- vorbis


def _iter_flac_comments(buf: bytes) -> Iterator[tuple[str, str]]:
    if buf[:4] != b"fLaC":
        return
    pos = 4
    while pos + 4 <= len(buf):
        hdr = buf[pos]
        btype = hdr & 0x7F
        size = int.from_bytes(buf[pos + 1 : pos + 4], "big")
        body = buf[pos + 4 : pos + 4 + size]
        pos += 4 + size
        if btype == 4 and len(body) >= 8:  # VORBIS_COMMENT
            try:
                vlen = int.from_bytes(body[0:4], "little")
                p = 4 + vlen
                vendor = body[4 : 4 + vlen].decode("utf-8", "replace")
                if vendor:
                    yield ("vendor", _clean(vendor))
                n = int.from_bytes(body[p : p + 4], "little")
                p += 4
                for _ in range(min(n, _MAX_ROWS_PER_ITEM)):
                    if p + 4 > len(body):
                        return
                    ln = int.from_bytes(body[p : p + 4], "little")
                    p += 4
                    ent = body[p : p + ln].decode("utf-8", "replace")
                    p += ln
                    if "=" in ent:
                        k, v = ent.split("=", 1)
                        yield (k.upper()[:_MAX_KEY_CHARS], _clean(v))
            except Exception:
                return
        if hdr & 0x80:  # last metadata block
            return


# -------------------------------------------------------------------- png


def _iter_png_text(buf: bytes) -> Iterator[tuple[str, str]]:
    pos = 8
    while pos + 8 <= len(buf):
        size = int.from_bytes(buf[pos : pos + 4], "big")
        tag = buf[pos + 4 : pos + 8]
        body = buf[pos + 8 : pos + 8 + size]
        pos += 12 + size
        try:
            if tag == b"tEXt" and b"\x00" in body:
                k, v = body.split(b"\x00", 1)
                yield (k.decode("latin-1", "replace")[:_MAX_KEY_CHARS],
                       _clean(v.decode("latin-1", "replace")))
            elif tag == b"zTXt" and b"\x00" in body:
                k, rest = body.split(b"\x00", 1)
                if rest[:1] == b"\x00":  # method 0 = deflate
                    v = zlib.decompress(rest[1:], 15, _MAX_VALUE_CHARS * 4)
                    yield (k.decode("latin-1", "replace")[:_MAX_KEY_CHARS],
                           _clean(v.decode("latin-1", "replace")))
            elif tag == b"iTXt":
                k, rest = body.split(b"\x00", 1)
                if rest[:2] == b"\x00\x00":  # uncompressed only
                    parts = rest[2:].split(b"\x00", 2)
                    if len(parts) == 3:
                        yield (k.decode("latin-1", "replace")[:_MAX_KEY_CHARS],
                               _clean(parts[2].decode("utf-8", "replace")))
            elif tag == b"IEND":
                return
        except Exception:
            continue


# ------------------------------------------------------------------- exif


def _iter_tiff_ascii(tiff: bytes) -> Iterator[tuple[str, str]]:
    try:
        if tiff[:2] == b"II":
            bo = "little"
        elif tiff[:2] == b"MM":
            bo = "big"
        else:
            return
        if int.from_bytes(tiff[2:4], bo) != 42:
            return
        ifd = int.from_bytes(tiff[4:8], bo)
        count = int.from_bytes(tiff[ifd : ifd + 2], bo)
        for i in range(min(count, 256)):
            e = ifd + 2 + 12 * i
            if e + 12 > len(tiff):
                return
            tag = int.from_bytes(tiff[e : e + 2], bo)
            typ = int.from_bytes(tiff[e + 2 : e + 4], bo)
            cnt = int.from_bytes(tiff[e + 4 : e + 8], bo)
            name = _EXIF_ASCII_TAGS.get(tag)
            if name is None or typ != 2 or cnt > 4096:
                continue
            if cnt <= 4:
                data = tiff[e + 8 : e + 8 + cnt]
            else:
                off = int.from_bytes(tiff[e + 8 : e + 12], bo)
                data = tiff[off : off + cnt]
            val = _clean(data.decode("latin-1", "replace"))
            if val:
                yield (name, val)
    except Exception:
        return


def _iter_jpeg_exif(buf: bytes) -> Iterator[tuple[str, str]]:
    pos = 2
    while pos + 4 <= len(buf):
        if buf[pos] != 0xFF:
            return
        marker = buf[pos + 1]
        if marker in (0xD8,) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker in (0xD9, 0xDA):
            return
        seg_len = int.from_bytes(buf[pos + 2 : pos + 4], "big")
        if seg_len < 2 or pos + 2 + seg_len > len(buf):
            return
        body = buf[pos + 4 : pos + 2 + seg_len]
        if marker == 0xE1 and body[:6] == b"Exif\x00\x00":
            yield from _iter_tiff_ascii(body[6:])
        elif marker == 0xFE:  # JPEG comment segment
            v = _clean(body.decode("latin-1", "replace"))
            if v:
                yield ("Comment", v)
        pos += 2 + seg_len


# -------------------------------------------------------------- gif/riff


def _iter_gif_comments(buf: bytes) -> Iterator[tuple[str, str]]:
    # comment extension: 0x21 0xFE, then data sub-blocks
    pos = 13 + (3 << ((buf[10] & 0x07) + 1) if buf[10] & 0x80 else 0)
    n = len(buf)
    while pos < n:
        b = buf[pos]
        if b == 0x21 and pos + 1 < n:
            label = buf[pos + 1]
            pos += 2
            parts = []
            while pos < n and buf[pos]:
                ln = buf[pos]
                parts.append(buf[pos + 1 : pos + 1 + ln])
                pos += 1 + ln
            pos += 1
            if label == 0xFE and parts:
                v = _clean(b"".join(parts).decode("latin-1", "replace"))
                if v:
                    yield ("Comment", v)
        elif b == 0x2C:  # image descriptor: skip header + LZW blocks
            if pos + 10 > n:
                return
            flags = buf[pos + 9]
            pos += 10 + ((3 << ((flags & 0x07) + 1)) if flags & 0x80 else 0)
            pos += 1  # LZW min code size
            while pos < n and buf[pos]:
                pos += 1 + buf[pos]
            pos += 1
        elif b == 0x3B:
            return
        else:
            return


def _iter_riff_info(buf: bytes) -> Iterator[tuple[str, str]]:
    pos = 12
    while pos + 8 <= len(buf):
        cid = buf[pos : pos + 4]
        size = int.from_bytes(buf[pos + 4 : pos + 8], "little")
        body = buf[pos + 8 : pos + 8 + size]
        if cid == b"LIST" and body[:4] == b"INFO":
            p = 4
            while p + 8 <= len(body):
                key = body[p : p + 4]
                ln = int.from_bytes(body[p + 4 : p + 8], "little")
                val = body[p + 8 : p + 8 + ln]
                p += 8 + ln + (ln & 1)
                name = _RIFF_INFO_KEYS.get(key)
                if name:
                    v = _clean(val.decode("latin-1", "replace"))
                    if v:
                        yield (name, v)
        elif cid == b"EXIF":
            body2 = body[6:] if body[:6] == b"Exif\x00\x00" else body
            yield from _iter_tiff_ascii(body2)
        pos += 8 + size + (size & 1)


# -------------------------------------------------------------- mp4 / ogg

#: iTunes-style ilst atoms carrying UTF-8 text (©-prefixed per spec)
_MP4_ILST_KEYS = {
    b"\xa9nam": "Title",
    b"\xa9ART": "Artist",
    b"\xa9alb": "Album",
    b"\xa9cmt": "Comment",
    b"\xa9day": "Date",
    b"\xa9too": "Software",
    b"\xa9wrt": "Writer",
    b"\xa9gen": "Genre",
}


def _iter_mp4_ilst(buf: bytes) -> Iterator[tuple[str, str]]:
    """moov/udta/meta/ilst text atoms (the public iTunes metadata
    layout: each item holds a ``data`` box — version/flags with flag 1
    = UTF-8 — then a 4-byte locale and the payload)."""
    from .mp4 import _boxes, _find

    udta = _find(buf, 0, len(buf), (b"moov", b"udta"))
    if udta is None:
        return
    meta = _find(buf, udta[0], udta[1], (b"meta",))
    if meta is None:
        return
    # meta is a FULL box: 4 bytes of version/flags precede its children
    ilst = _find(buf, meta[0] + 4, meta[1], (b"ilst",))
    if ilst is None:
        return
    for tag, body, end in _boxes(buf, ilst[0], ilst[1]):
        name = _MP4_ILST_KEYS.get(tag)
        if name is None:
            continue
        for dtag, dbody, dend in _boxes(buf, body, end):
            if dtag != b"data" or dend - dbody < 8:
                continue
            flags = int.from_bytes(buf[dbody : dbody + 4], "big") & 0xFFFFFF
            if flags != 1:  # 1 = UTF-8 text
                continue
            val = _clean(buf[dbody + 8 : dend].decode("utf-8", "replace"))
            if val:
                yield (name, val)


def _iter_ogg_comments(buf: bytes) -> Iterator[tuple[str, str]]:
    """Vorbis/Opus comment header from the head pages of an Ogg stream
    (packet prefixed ``\\x03vorbis`` / ``OpusTags``), then the shared
    little-endian vendor + KEY=value layout."""
    pos = 0
    packets: list[bytearray] = []
    current = bytearray()
    for _page in range(16):  # comments live in the head pages
        if buf[pos : pos + 4] != b"OggS" or pos + 27 > len(buf):
            break
        nseg = buf[pos + 26]
        seg_table = buf[pos + 27 : pos + 27 + nseg]
        p = pos + 27 + nseg
        for seg in seg_table:
            current += buf[p : p + seg]
            p += seg
            if seg < 255:
                packets.append(current)
                current = bytearray()
        pos = p
    for pkt in packets:
        if pkt[:7] == b"\x03vorbis":
            body = bytes(pkt[7:])
        elif pkt[:8] == b"OpusTags":
            body = bytes(pkt[8:])
        else:
            continue
        try:
            vlen = int.from_bytes(body[0:4], "little")
            vendor = body[4 : 4 + vlen].decode("utf-8", "replace")
            if vendor:
                yield ("vendor", _clean(vendor))
            p = 4 + vlen
            n = int.from_bytes(body[p : p + 4], "little")
            p += 4
            for _ in range(min(n, _MAX_ROWS_PER_ITEM)):
                if p + 4 > len(body):
                    return
                ln = int.from_bytes(body[p : p + 4], "little")
                p += 4
                ent = body[p : p + ln].decode("utf-8", "replace")
                p += ln
                if "=" in ent:
                    k, v = ent.split("=", 1)
                    yield (k.upper()[:_MAX_KEY_CHARS], _clean(v))
        except Exception:
            return
        return


# ---------------------------------------------------------------- dispatch


def extract_metadata(buf: bytes) -> list[tuple[str, str, str]]:
    """(source, key, value) rows for one payload — bounded, total (any
    malformed structure contributes nothing)."""
    out: list[tuple[str, str, str]] = []

    def take(source: str, it: Iterator[tuple[str, str]]) -> None:
        try:
            for k, v in it:
                if v == "":
                    continue
                out.append((source, k, v))
                if len(out) >= _MAX_ROWS_PER_ITEM:
                    return
        except Exception:
            return

    if buf[:3] == b"ID3":
        take("id3v2", _iter_id3v2(buf))
    elif buf[:4] == b"fLaC":
        take("vorbis", _iter_flac_comments(buf))
    elif buf[:8] == b"\x89PNG\r\n\x1a\n":
        take("png", _iter_png_text(buf))
    elif buf[:2] == b"\xff\xd8":
        take("exif", _iter_jpeg_exif(buf))
    elif buf[:6] in (b"GIF87a", b"GIF89a") and len(buf) > 13:
        take("gif", _iter_gif_comments(buf))
    elif buf[:4] == b"RIFF" and len(buf) >= 12:
        take("riff", _iter_riff_info(buf))
    elif buf[:4] in (b"II*\x00", b"MM\x00*"):
        take("tiff", _iter_tiff_ascii(buf))
    elif len(buf) >= 12 and buf[4:8] == b"ftyp":
        take("mp4", _iter_mp4_ilst(buf))
    elif buf[:4] == b"OggS":
        take("ogg", _iter_ogg_comments(buf))
    return out


def extract_media_metadata(media: DataFrame) -> DataFrame:
    """(item_id, source, key, value) rows for every payload carrying
    embedded text metadata — Arrow-batched, bounded output, never a
    task failure."""

    def run(batches):
        for pdf in batches:
            rows = []
            for item_id, payload in zip(pdf["item_id"], pdf["payload"]):
                for source, k, v in extract_metadata(bytes(payload)):
                    rows.append((int(item_id), source, k, v))
            yield pd.DataFrame(
                rows, columns=["item_id", "source", "key", "value"]
            )

    return media.mapInPandas(run, schema=METADATA_SCHEMA)
