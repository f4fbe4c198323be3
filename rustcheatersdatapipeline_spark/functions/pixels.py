"""Real pixel/sample decoding for the multimodal path — pure stdlib.

This module holds the PNG/APNG/GIF/WAV decoders plus the BMP/ICO DIB
family and the ``decode_media`` dispatch that routes every supported
payload to its decoder. The full pure-stdlib decode matrix across the
functions/ package (each with a spec-exact test-side encoder and
mutation-totality fuzz):

- images: PNG (every still-image variant) + APNG animation, GIF, JPEG
  baseline+progressive (jpeg.py), lossless WebP/VP8L (vp8l.py), BMP,
  ICO, TIFF (tiff.py);
- audio: PCM WAV, FLAC (flac.py);
- video/containers: AVI MJPEG/DIB frames (avi.py), MP4/ISO BMFF
  metadata + keyframe byte ranges incl. fragmented (mp4.py);
- documents: PDF (pdftext.py), DOCX/XLSX/PPTX/ODT/RTF (officetext.py).

Only H.264/H.265 macroblocks, arithmetic JPEG and AAC spectra remain
behind named ``NotImplementedError`` boundaries (see functions/h264.py
and functions/aac.py for the honest rationale: arithmetic coding vs
tabulated VLC codebooks pending a validating source), quarantined via
the shared ``DECODE_QUARANTINE`` contract
below (MP3 decodes via mp3.py; VP8 inter-frame video decodes via
vp8.py — IVF streams and inter-coded animated-WebP frames included). Details of the formats coded
directly in this module:

- **PNG** (RFC 2083): chunk walk → concatenated IDAT → ``zlib``
  inflate → scanline unfiltering (all five filter types: None, Sub,
  Up, Average, Paeth) → ``(h, w, channels)`` uint8 array. Supported:
  the FULL static-image matrix — color types 0/2/4/6 at depth 8 AND
  16 (network-order high byte kept: 8-bit downscale, what features/
  pHash consume), PALETTE (color type 3, PLTE/tRNS lookup, 1/2/4/8-bit
  MSB-packed indices — the icon/screenshot shape real crawls are full
  of), sub-byte GRAYSCALE (1/2/4-bit color type 0 with spec sample
  scaling — the fax/scan shape), and Adam7 interlacing for every one
  of those (per-pass unfilter + strided scatter). Nothing in the PNG
  spec's still-image space is quarantined anymore; malformed structure still raises
  ValueError into the shared quarantine.
- **WAV** (RIFF PCM): ``data`` chunk → ``numpy.frombuffer`` →
  ``(n_frames, channels)`` int array (8-bit unsigned / 16/32-bit
  signed LE / 24-bit signed LE sign-extended to int32).
- **GIF** (GIF87a/89a, public spec appendix F): block-stream walk →
  per-frame LZW sub-block concatenation → pure-Python variable-width
  LZW decode (clear/end codes, deferred width growth, 12-bit cap,
  KwKwK case) → palette lookup → progressive composite onto the
  logical screen (GCE transparency honored, interlaced frames
  de-interlaced) → ``(n_frames, h, w, 3)`` uint8 array.

JPEG (baseline + progressive, functions/jpeg.py) and AVI MJPEG/DIB
frames (functions/avi.py) decode for real too; only H.264/H.265
macroblocks, arithmetic JPEG and AAC spectra stay behind the named
NotImplementedError contract (functions/h264.py, functions/aac.py).

Spark integration: ``featurize_pixels`` is the same ``mapInPandas``
shape as ``featurize_media`` — Arrow batches in, one bounded stats row
per item out (never the pixels themselves: at 100 TB the decoded
tensors are transient per-batch state feeding the feature columns, not
something to re-materialize).
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

from .multimodal import _PNG_SIGNATURE, parse_wav_header

#: PNG color type → samples per pixel (public spec, RFC 2083 §4.1.1)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}

#: The COMPLETE exception contract of the pure-stdlib decoders
#: (PNG/GIF/JPEG/AVI/WAV): ``NotImplementedError`` names unsupported
#: codec variants, ``ValueError``/``IndexError`` cover malformed
#: structure, ``zlib.error`` covers corrupt deflate streams (PNG IDAT).
#: Every featurizer must catch exactly this tuple — a corrupt payload
#: that escapes becomes a permanent poison pill under ``foreachBatch``
#: replay (the sink re-reads the same payload every restart).
DECODE_QUARANTINE = (NotImplementedError, ValueError, zlib.error, IndexError)

PIXEL_FEATURES_SCHEMA = (
    "item_id bigint, mime string, kind string, width int, height int, "
    "channels int, n_samples bigint, mean double, rms double"
)


def _png_chunks(buf: bytes) -> Iterator[tuple[bytes, bytes]]:
    pos = 8
    while pos + 8 <= len(buf):
        size = int.from_bytes(buf[pos : pos + 4], "big")
        tag = buf[pos + 4 : pos + 8]
        yield tag, buf[pos + 8 : pos + 8 + size]
        pos += 12 + size  # length + tag + data + CRC
        if tag == b"IEND":
            break


def _unfilter_scanlines(raw: bytes, h: int, stride: int, bpp: int) -> bytearray:
    """Invert PNG scanline filtering (RFC 2083 §6). Each line leads with
    a filter-type byte; reconstruction is the exact inverse recurrence,
    so a decode→compare test against the pre-filter image is bit-exact."""
    if len(raw) < h * (stride + 1):
        raise ValueError("PNG: inflated stream shorter than h*(stride+1)")
    out = bytearray(h * stride)
    prior = bytes(stride)
    pos = 0
    for y in range(h):
        ftype = raw[pos]
        line = bytearray(raw[pos + 1 : pos + 1 + stride])
        pos += 1 + stride
        if ftype == 0:  # None
            pass
        elif ftype == 1:  # Sub
            for x in range(bpp, stride):
                line[x] = (line[x] + line[x - bpp]) & 0xFF
        elif ftype == 2:  # Up
            for x in range(stride):
                line[x] = (line[x] + prior[x]) & 0xFF
        elif ftype == 3:  # Average
            for x in range(stride):
                left = line[x - bpp] if x >= bpp else 0
                line[x] = (line[x] + ((left + prior[x]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                a = line[x - bpp] if x >= bpp else 0
                b = prior[x]
                c = prior[x - bpp] if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[x] = (line[x] + pred) & 0xFF
        else:
            raise ValueError(f"PNG: invalid filter type {ftype}")
        out[y * stride : (y + 1) * stride] = line
        prior = bytes(line)
    return out


#: Adam7 pass layout (RFC 2083 §2.6): (x offset, y offset, x step, y step)
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _adam7_passes(w: int, h: int) -> list[tuple[int, int, int, int, int, int]]:
    """(x0, y0, dx, dy, pass width, pass height) for non-empty passes."""
    out = []
    for x0, y0, dx, dy in _ADAM7:
        wp = (w - x0 + dx - 1) // dx
        hp = (h - y0 + dy - 1) // dy
        if wp > 0 and hp > 0:
            out.append((x0, y0, dx, dy, wp, hp))
    return out


def _deinterlace_bytes(raw: bytes, w: int, h: int, bpp: int) -> np.ndarray:
    """Adam7 → (h, w, bpp) for byte-aligned pixels: each pass is its own
    filtered scanline group (prior row = previous row of the SAME pass);
    unfilter per pass, then scatter with strided indexing."""
    out = np.zeros((h, w, bpp), np.uint8)
    pos = 0
    for x0, y0, dx, dy, wp, hp in _adam7_passes(w, h):
        stride = wp * bpp
        span = hp * (stride + 1)
        sub = _unfilter_scanlines(raw[pos : pos + span], hp, stride, bpp)
        pos += span
        out[y0::dy, x0::dx] = np.frombuffer(bytes(sub), np.uint8).reshape(hp, wp, bpp)
    return out


def _deinterlace_indices(raw: bytes, w: int, h: int, depth: int) -> np.ndarray:
    """Adam7 → (h, w) palette indices for sub-byte/8-bit depths: per
    pass, unfilter at the pass's byte stride (filters act on bytes,
    bpp=1), unpack MSB-first bit fields, scatter."""
    out = np.zeros((h, w), np.uint8)
    pos = 0
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
    for x0, y0, dx, dy, wp, hp in _adam7_passes(w, h):
        stride = (wp * depth + 7) // 8
        span = hp * (stride + 1)
        sub = _unfilter_scanlines(raw[pos : pos + span], hp, stride, 1)
        pos += span
        arr = np.frombuffer(bytes(sub), np.uint8).reshape(hp, stride)
        if depth == 8:
            idx = arr[:, :wp]
        else:
            bits = np.unpackbits(arr, axis=1).reshape(hp, -1, depth)
            idx = (bits * weights).sum(axis=2, dtype=np.uint16).astype(np.uint8)[:, :wp]
        out[y0::dy, x0::dx] = idx
    return out


def _inflate_bounded(idat: bytes, expected: int) -> bytes:
    """Inflate the concatenated IDAT stream, capped at the IHDR-derived
    size: h scanlines of (filter byte + stride). A decompression-bomb
    payload (tiny IDAT inflating to GBs behind a valid signature) raises
    ValueError → quarantine, instead of OOMing the executor
    (MemoryError is outside the quarantine contract)."""
    d = zlib.decompressobj()
    raw = d.decompress(bytes(idat), expected)
    if d.unconsumed_tail and d.decompress(d.unconsumed_tail, 1):
        raise ValueError("PNG: inflated stream exceeds h*(stride+1) bound")
    return raw


def _decode_palette_png(
    w: int,
    h: int,
    depth: int,
    plte: bytes | None,
    trns: bytes | None,
    idat: bytes,
    interlace: int = 0,
) -> np.ndarray:
    """Color-type-3 decode: indices (1/2/4/8-bit, MSB-first packing per
    RFC 2083 §2.3) → PLTE lookup → RGB, or RGBA when a tRNS chunk gives
    per-entry alpha — the same palette-composite semantics as the GIF
    path. Filtering for sub-byte depths operates on bytes with bpp=1
    (spec: filters apply to bytes, not pixels). Adam7 interlacing is
    de-interlaced per pass before the lookup."""
    if depth not in (1, 2, 4, 8):
        raise NotImplementedError(f"PNG palette bit depth {depth} unsupported")
    if plte is None or len(plte) < 3 or len(plte) % 3:
        raise ValueError("PNG: palette image without a valid PLTE chunk")
    if interlace:
        expected = sum(
            hp * ((wp * depth + 7) // 8 + 1) for *_xy, wp, hp in _adam7_passes(w, h)
        )
        idx = _deinterlace_indices(_inflate_bounded(idat, expected), w, h, depth)
    else:
        stride = (w * depth + 7) // 8
        raw = _inflate_bounded(idat, h * (stride + 1))
        rows = _unfilter_scanlines(raw, h, stride, 1)
        arr = np.frombuffer(bytes(rows), np.uint8).reshape(h, stride)
        if depth == 8:
            idx = arr[:, :w]
        else:
            bits = np.unpackbits(arr, axis=1).reshape(h, -1, depth)
            weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
            idx = (bits * weights).sum(axis=2, dtype=np.uint16).astype(np.uint8)[:, :w]
    pal = np.frombuffer(plte, np.uint8).reshape(-1, 3)
    if int(idx.max(initial=0)) >= len(pal):
        raise ValueError("PNG: palette index out of range")
    if trns is not None and len(trns):
        alpha = np.full(len(pal), 255, np.uint8)
        n = min(len(trns), len(pal))
        alpha[:n] = np.frombuffer(trns[:n], np.uint8)
        return np.concatenate([pal, alpha[:, None]], axis=1)[idx]
    return pal[idx]


def decode_png_pixels(buf: bytes) -> np.ndarray:
    """Full PNG decode → uint8 array of shape (height, width, channels)."""
    if buf[:8] != _PNG_SIGNATURE:
        raise ValueError("not a PNG payload")
    ihdr = None
    plte = None
    trns = None
    idat = bytearray()
    for tag, data in _png_chunks(buf):
        if tag == b"IHDR":
            ihdr = data
        elif tag == b"PLTE":
            plte = data
        elif tag == b"tRNS":
            trns = data
        elif tag == b"IDAT":
            idat.extend(data)
    if ihdr is None or len(ihdr) < 13 or not idat:
        raise ValueError("PNG: missing IHDR/IDAT")
    w = int.from_bytes(ihdr[0:4], "big")
    h = int.from_bytes(ihdr[4:8], "big")
    depth, color, interlace = ihdr[8], ihdr[9], ihdr[12]
    return _decode_png_image(bytes(idat), w, h, depth, color, interlace, plte, trns)


def _decode_png_image(
    idat: bytes,
    w: int,
    h: int,
    depth: int,
    color: int,
    interlace: int,
    plte: bytes | None,
    trns: bytes | None,
) -> np.ndarray:
    """One PNG-coded image (a whole file's IDAT, or one APNG frame's
    fdAT region — same coding, frame-local dimensions)."""
    if interlace not in (0, 1):
        raise ValueError(f"PNG: invalid interlace method {interlace}")
    if color == 3:
        return _decode_palette_png(w, h, depth, plte, trns, idat, interlace)
    if color == 0 and depth in (1, 2, 4):
        # sub-byte GRAYSCALE (the fax/scan shape): reuse the palette
        # path's MSB-packed index machinery, then scale the index to
        # the full 0..255 range per the spec's sample scaling
        if interlace:
            expected = sum(
                hp * ((wp * depth + 7) // 8 + 1)
                for *_xy, wp, hp in _adam7_passes(w, h)
            )
            idx = _deinterlace_indices(
                _inflate_bounded(idat, expected), w, h, depth
            )
        else:
            stride = (w * depth + 7) // 8
            raw = _inflate_bounded(idat, h * (stride + 1))
            rows = np.frombuffer(
                bytes(_unfilter_scanlines(raw, h, stride, 1)), np.uint8
            ).reshape(h, stride)
            bits = np.unpackbits(rows, axis=1).reshape(h, -1, depth)
            weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
            idx = (bits * weights).sum(axis=2, dtype=np.uint16)[:, :w]
        scale = 255 // ((1 << depth) - 1)
        return (idx * scale).astype(np.uint8)[..., None]
    if depth not in (8, 16):
        raise NotImplementedError(f"PNG bit depth {depth} (8/16 supported)")
    if color not in _PNG_CHANNELS:
        raise NotImplementedError(f"PNG color type {color} unsupported")
    channels = _PNG_CHANNELS[color]
    bpp = channels * (depth // 8)
    if interlace:
        expected = sum(hp * (wp * bpp + 1) for *_xy, wp, hp in _adam7_passes(w, h))
        px = _deinterlace_bytes(_inflate_bounded(idat, expected), w, h, bpp)
    else:
        stride = w * bpp
        raw = _inflate_bounded(idat, h * (stride + 1))
        px = np.frombuffer(
            bytes(_unfilter_scanlines(raw, h, stride, bpp)), np.uint8
        ).reshape(h, w, bpp)
    if depth == 16:
        # network byte order: high byte first — 8-bit downscale, the
        # standard crawl-pipeline treatment (features/pHash need 8-bit)
        px = np.ascontiguousarray(px[..., 0::2])
    return px


def _to_rgba(px: np.ndarray) -> np.ndarray:
    """Normalize any decoded PNG/palette output to (h, w, 4) RGBA."""
    ch = px.shape[2]
    if ch == 4:
        return px
    opaque = np.full((*px.shape[:2], 1), 255, np.uint8)
    if ch == 3:
        return np.concatenate([px, opaque], axis=2)
    if ch == 2:  # gray + alpha
        return np.concatenate([np.repeat(px[..., :1], 3, axis=2), px[..., 1:]], axis=2)
    return np.concatenate([np.repeat(px, 3, axis=2), opaque], axis=2)


def decode_apng_frames(buf: bytes) -> np.ndarray:
    """APNG (public PNG 'acTL/fcTL/fdAT' extension) → uint8
    (n_frames, h, w, 4) RGBA — the animation frames COMPOSITED onto the
    canvas per each frame's dispose/blend ops, the GIF-composite
    discipline applied to PNG. Non-animated PNGs yield their single
    frame. The default IDAT image joins the animation only when an fcTL
    precedes it (per spec)."""
    if buf[:8] != _PNG_SIGNATURE:
        raise ValueError("not a PNG payload")
    ihdr = None
    plte = None
    trns = None
    idat = bytearray()
    idat_fctl = None
    frames_meta: list[tuple[dict, bytearray]] = []  # (fcTL fields, data)
    actl_frames = 0
    pending_fctl: dict | None = None
    for tag, data in _png_chunks(buf):
        if tag == b"IHDR":
            ihdr = data
        elif tag == b"PLTE":
            plte = data
        elif tag == b"tRNS":
            trns = data
        elif tag == b"acTL" and len(data) >= 8:
            actl_frames = int.from_bytes(data[0:4], "big")
        elif tag == b"fcTL" and len(data) >= 26:
            pending_fctl = {
                "w": int.from_bytes(data[4:8], "big"),
                "h": int.from_bytes(data[8:12], "big"),
                "x": int.from_bytes(data[12:16], "big"),
                "y": int.from_bytes(data[16:20], "big"),
                "dispose": data[24],
                "blend": data[25],
            }
        elif tag == b"IDAT":
            if pending_fctl is not None and idat_fctl is None:
                idat_fctl = pending_fctl
                pending_fctl = None
            idat.extend(data)
        elif tag == b"fdAT" and len(data) >= 4:
            if pending_fctl is not None:
                frames_meta.append((pending_fctl, bytearray()))
                pending_fctl = None
            if not frames_meta:
                raise ValueError("APNG: fdAT without a preceding fcTL")
            frames_meta[-1][1].extend(data[4:])  # skip sequence number
    if ihdr is None or len(ihdr) < 13 or not idat:
        raise ValueError("PNG: missing IHDR/IDAT")
    w = int.from_bytes(ihdr[0:4], "big")
    h = int.from_bytes(ihdr[4:8], "big")
    depth, color, interlace = ihdr[8], ihdr[9], ihdr[12]

    if actl_frames == 0:
        first = _decode_png_image(bytes(idat), w, h, depth, color, interlace, plte, trns)
        return _to_rgba(first)[None, ...]

    anim: list[tuple[dict, bytes]] = []
    if idat_fctl is not None:
        anim.append((idat_fctl, bytes(idat)))
    anim.extend((m, bytes(d)) for m, d in frames_meta)
    if not anim:
        raise ValueError("APNG: acTL without animation frames")
    if len(anim) * h * w * 4 > _GIF_MAX_DECODE_BYTES:
        raise ValueError("APNG: decoded frames exceed decode bound")

    canvas = np.zeros((h, w, 4), np.uint8)
    out = []
    for meta, data in anim:
        fw, fh, fx, fy = meta["w"], meta["h"], meta["x"], meta["y"]
        if fw == 0 or fh == 0 or fx + fw > w or fy + fh > h:
            raise ValueError("APNG: frame region outside the canvas")
        region = _to_rgba(
            _decode_png_image(data, fw, fh, depth, color, interlace, plte, trns)
        )
        prev = canvas.copy() if meta["dispose"] == 2 else None
        target = canvas[fy : fy + fh, fx : fx + fw]
        if meta["blend"] == 1:  # OVER (non-premultiplied alpha composite)
            sa = region[..., 3:].astype(np.uint32)
            da = target[..., 3:].astype(np.uint32)
            oa = sa * 255 + da * (255 - sa)  # alpha scaled by 255*255
            num = (
                region[..., :3].astype(np.uint32) * sa * 255
                + target[..., :3].astype(np.uint32) * da * (255 - sa)
            )
            rgb = np.where(oa > 0, num // np.maximum(oa, 1), 0)
            target[..., :3] = rgb.astype(np.uint8)
            target[..., 3:] = (oa // 255).astype(np.uint8)
        else:  # SOURCE
            target[...] = region
        out.append(canvas.copy())
        if meta["dispose"] == 1:  # background: clear region to transparent
            canvas[fy : fy + fh, fx : fx + fw] = 0
        elif meta["dispose"] == 2:  # previous: revert
            canvas = prev
    return np.stack(out)


def decode_wav_samples(buf: bytes) -> tuple[np.ndarray, int]:
    """Full PCM WAV decode → (samples array of shape (n_frames,
    channels), sample_rate). 8-bit unsigned, 16/32-bit signed LE, and
    24-bit signed LE (the studio-audio packing: 3-byte little-endian
    samples, sign-extended to int32)."""
    hdr = parse_wav_header(buf)
    if hdr is None:
        raise ValueError("not a RIFF/WAVE payload")
    channels, rate, bits, n_frames = hdr
    if bits not in (8, 16, 24, 32):
        raise NotImplementedError(f"WAV {bits}-bit PCM unsupported")
    pos = 12
    data = None
    while pos + 8 <= len(buf):
        cid = buf[pos : pos + 4]
        sz = int.from_bytes(buf[pos + 4 : pos + 8], "little")
        if cid == b"data":
            data = buf[pos + 8 : pos + 8 + sz]
            break
        pos += 8 + sz + (sz & 1)
    if data is None:
        raise ValueError("WAV: no data chunk")
    if bits == 24:
        frame_bytes = channels * 3
        usable = len(data) // frame_bytes
        raw = np.frombuffer(data[: usable * frame_bytes], np.uint8)
        b = raw.reshape(-1, 3).astype(np.int32)
        vals = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
        vals = (vals << 8) >> 8  # sign-extend bit 23
        return vals.reshape(-1, channels), rate
    dtype = {8: np.uint8, 16: np.dtype("<i2"), 32: np.dtype("<i4")}[bits]
    usable = (len(data) // (channels * dtype.itemsize if bits != 8 else channels)) * channels
    arr = np.frombuffer(data, dtype)[:usable].reshape(-1, channels)
    return arr, rate


#: decoded-output ceiling for one GIF payload (all frames, RGB bytes).
#: Same contract as the PNG h*(stride+1) inflate cap: a crafted payload
#: declaring a huge logical screen or stacking frames must raise
#: ValueError → quarantine, never OOM the executor.
_GIF_MAX_DECODE_BYTES = 1 << 28  # 256 MiB


def _gif_lzw_decode(min_code_size: int, data: bytes, expected: int) -> bytearray:
    """GIF-variant LZW decode (GIF89a spec appendix F): LSB-first bit
    packing, variable code width from ``min_code_size + 1`` up to 12
    bits, clear/end control codes, and the KwKwK (code == table size)
    special case. Output is capped at ``expected`` pixels — the frame
    size declared by the image descriptor — so a crafted stream cannot
    inflate past its declaration."""
    if not 2 <= min_code_size <= 11:
        raise ValueError(f"GIF: invalid LZW minimum code size {min_code_size}")
    clear = 1 << min_code_size
    end = clear + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    codes = list(base)
    width = min_code_size + 1
    prev: bytes | None = None
    out = bytearray()
    bitbuf = 0
    nbits = 0
    pos = 0
    while True:
        while nbits < width:
            if pos >= len(data):
                # stream ended without an end code — caller validates
                # the output length against the declared frame size
                return out
            bitbuf |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = bitbuf & ((1 << width) - 1)
        bitbuf >>= width
        nbits -= width
        if code == clear:
            codes = list(base)
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            return out
        if prev is None:
            if code >= len(codes):
                raise ValueError("GIF: first LZW code out of range")
            entry = codes[code]
        elif code < len(codes):
            entry = codes[code]
            if len(codes) < 4096:
                codes.append(prev + entry[:1])
        elif code == len(codes) and len(codes) < 4096:
            entry = prev + prev[:1]
            codes.append(entry)
        else:
            raise ValueError("GIF: LZW code out of range")
        out += entry
        if len(out) > expected:
            raise ValueError("GIF: LZW output exceeds declared frame size")
        prev = entry
        # deferred width growth: the next code may reference the entry
        # just added, so widen when the table reaches the current ceiling
        if len(codes) >= (1 << width) and width < 12:
            width += 1


def _gif_deinterlace(rows: np.ndarray) -> np.ndarray:
    """Undo GIF 4-pass interlacing: the stream carries rows 0,8,16…,
    then 4,12…, then 2,6…, then 1,3,5… of the frame."""
    h = rows.shape[0]
    out = np.empty_like(rows)
    src = 0
    for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
        n = len(range(start, h, step))
        out[start::step] = rows[src : src + n]
        src += n
    return out


def _gif_color_table(buf: bytes, pos: int, packed: int) -> tuple[np.ndarray, int]:
    n = 2 << (packed & 0x07)
    raw = np.frombuffer(buf[pos : pos + 3 * n], np.uint8)
    if raw.size < 3 * n:
        raise ValueError("GIF: truncated color table")
    return raw.reshape(n, 3), pos + 3 * n


def decode_gif_pixels(buf: bytes) -> np.ndarray:
    """Full GIF87a/89a decode → uint8 array of shape (n_frames, height,
    width, 3). Pure stdlib+numpy: block walk, per-frame LZW inflate,
    global/local palette lookup, progressive draw-over composite onto
    the logical screen with GCE transparency, interlace undone.

    Disposal is draw-over (method 1) — frames accumulate on the canvas;
    restore-to-background/previous disposal is approximated by the same
    composite, which is what frame-level feature extraction needs.
    Corruption raises ValueError (→ quarantine upstream)."""
    if len(buf) < 13 or buf[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    w = int.from_bytes(buf[6:8], "little")
    h = int.from_bytes(buf[8:10], "little")
    if w == 0 or h == 0:
        raise ValueError("GIF: zero logical screen dimension")
    if h * w * 3 > _GIF_MAX_DECODE_BYTES:
        raise ValueError("GIF: logical screen exceeds decode bound")
    gct = None
    pos = 13
    if buf[10] & 0x80:
        gct, pos = _gif_color_table(buf, pos, buf[10])
    canvas = np.zeros((h, w, 3), np.uint8)
    frames: list[np.ndarray] = []
    transparent: int | None = None
    while pos < len(buf):
        block = buf[pos]
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            if pos + 2 > len(buf):
                raise ValueError("GIF: truncated extension")
            label = buf[pos + 1]
            p = pos + 2
            if label == 0xF9 and p + 5 <= len(buf) and buf[p] == 4:
                transparent = buf[p + 4] if buf[p + 1] & 0x01 else None
            while p < len(buf):  # skip sub-block chain
                size = buf[p]
                p += 1
                if size == 0:
                    break
                p += size
            pos = p
        elif block == 0x2C:  # image descriptor
            if pos + 10 > len(buf):
                raise ValueError("GIF: truncated image descriptor")
            left = int.from_bytes(buf[pos + 1 : pos + 3], "little")
            top = int.from_bytes(buf[pos + 3 : pos + 5], "little")
            iw = int.from_bytes(buf[pos + 5 : pos + 7], "little")
            ih = int.from_bytes(buf[pos + 7 : pos + 9], "little")
            ipacked = buf[pos + 9]
            pos += 10
            if iw == 0 or ih == 0 or left + iw > w or top + ih > h:
                raise ValueError("GIF: frame outside logical screen")
            table = gct
            if ipacked & 0x80:
                table, pos = _gif_color_table(buf, pos, ipacked)
            if table is None:
                raise ValueError("GIF: frame has no color table")
            if pos >= len(buf):
                raise ValueError("GIF: missing LZW data")
            min_code = buf[pos]
            pos += 1
            chunks: list[bytes] = []
            while True:
                if pos >= len(buf):
                    raise ValueError("GIF: truncated image sub-blocks")
                size = buf[pos]
                pos += 1
                if size == 0:
                    break
                chunk = buf[pos : pos + size]
                if len(chunk) < size:
                    raise ValueError("GIF: truncated image sub-blocks")
                chunks.append(chunk)
                pos += size
            idx = _gif_lzw_decode(min_code, b"".join(chunks), iw * ih)
            if len(idx) != iw * ih:
                raise ValueError("GIF: LZW output shorter than declared frame")
            arr = np.frombuffer(bytes(idx), np.uint8).reshape(ih, iw)
            if int(arr.max()) >= len(table):
                raise ValueError("GIF: pixel index outside color table")
            if ipacked & 0x40:
                arr = _gif_deinterlace(arr)
            rgb = table[arr]  # (ih, iw, 3)
            region = canvas[top : top + ih, left : left + iw]
            if transparent is not None:
                mask = arr != transparent
                region[mask] = rgb[mask]
            else:
                region[...] = rgb
            if (len(frames) + 1) * h * w * 3 > _GIF_MAX_DECODE_BYTES:
                raise ValueError("GIF: decoded frames exceed decode bound")
            frames.append(canvas.copy())
            transparent = None  # a GCE governs exactly one rendering block
        else:
            raise ValueError(f"GIF: unknown block 0x{block:02x}")
    if not frames:
        raise ValueError("GIF: no frames")
    return np.stack(frames)


#: decoded-DIB ceiling (same contract as the PNG/GIF bomb guards)
_DIB_MAX_DECODE_BYTES = 1 << 28


def _decode_dib_rle(data: bytes, w: int, h: int, bpp: int) -> np.ndarray:
    """BI_RLE8 / BI_RLE4 run-length decode (public BMP spec) → (h, w)
    palette indices in row-storage order.  Escapes: 00 00 end-of-line,
    00 01 end-of-bitmap, 00 02 dx dy delta, 00 n absolute run (word
    aligned); otherwise (count, value) encoded runs — RLE4 alternates
    the value's two nibbles."""
    idx = np.zeros((h, w), np.uint8)
    x = y = 0
    pos = 0
    n = len(data)
    while pos + 1 < n and y < h:
        count, val = data[pos], data[pos + 1]
        pos += 2
        if count:
            if bpp == 8:
                run = [val] * count
            else:
                run = [(val >> 4, val & 0xF)[i & 1] for i in range(count)]
            take = min(count, w - x)
            idx[y, x : x + take] = run[:take]
            x += take
            continue
        if val == 0:  # end of line
            x, y = 0, y + 1
        elif val == 1:  # end of bitmap
            break
        elif val == 2:  # delta
            if pos + 2 > n:
                raise ValueError("DIB: truncated RLE delta")
            x = min(x + data[pos], w)
            y += data[pos + 1]
            pos += 2
        else:  # absolute run of `val` pixels, word-aligned
            if bpp == 8:
                span = val
            else:
                span = (val + 1) // 2
            if pos + span > n:
                raise ValueError("DIB: truncated RLE absolute run")
            chunk = data[pos : pos + span]
            if bpp == 8:
                run = list(chunk)
            else:
                run = []
                for b in chunk:
                    run.append(b >> 4)
                    run.append(b & 0xF)
                run = run[:val]
            take = min(val, w - x)
            if y < h:
                idx[y, x : x + take] = run[:take]
            x += take
            pos += span + (span & 1)  # pad to word boundary
    return idx


def _decode_dib_rows(
    data: bytes, w: int, h: int, bpp: int, palette: np.ndarray | None,
    comp: int = 0,
) -> np.ndarray:
    """Packed DIB pixel rows → (h, w, channels) in ROW-STORAGE order
    (caller flips bottom-up): 32 (BGRA), 24 (BGR), 16 (RGB555),
    paletted 8/4/1-bit with the BGRX color table, and RLE8/RLE4
    compressed paletted rows."""
    if comp in (1, 2):  # BI_RLE8 / BI_RLE4
        if palette is None or not len(palette):
            raise ValueError("DIB: RLE image without a color table")
        if (comp == 1) != (bpp == 8) or (comp == 2) != (bpp == 4):
            raise ValueError("DIB: RLE compression disagrees with bpp")
        idx = _decode_dib_rle(data, w, h, bpp)
        if int(idx.max(initial=0)) >= len(palette):
            raise ValueError("DIB: palette index out of range")
        return palette[idx]
    stride = ((w * bpp + 31) // 32) * 4
    if len(data) < stride * h:
        raise ValueError("DIB: pixel data shorter than stride*height")
    rows = np.frombuffer(data[: stride * h], np.uint8).reshape(h, stride)
    if bpp == 32:
        px = rows[:, : w * 4].reshape(h, w, 4)
        return px[..., [2, 1, 0, 3]]  # BGRA → RGBA
    if bpp == 24:
        px = rows[:, : w * 3].reshape(h, w, 3)
        return px[..., ::-1]  # BGR → RGB
    if bpp == 16:  # BI_RGB 16-bpp is RGB555 (x r5 g5 b5), little-endian
        v = rows[:, : w * 2].copy().view("<u2").reshape(h, w).astype(np.uint32)
        r = ((v >> 10) & 31) * 255 // 31
        g = ((v >> 5) & 31) * 255 // 31
        b = (v & 31) * 255 // 31
        return np.stack([r, g, b], axis=2).astype(np.uint8)
    if bpp in (8, 4, 1):
        if palette is None or not len(palette):
            raise ValueError("DIB: paletted image without a color table")
        if bpp == 8:
            idx = rows[:, :w]
        else:
            bits = np.unpackbits(rows, axis=1).reshape(h, -1, bpp)
            weights = (1 << np.arange(bpp - 1, -1, -1)).astype(np.uint8)
            idx = (bits * weights).sum(axis=2, dtype=np.uint16).astype(np.uint8)[:, :w]
        if int(idx.max(initial=0)) >= len(palette):
            raise ValueError("DIB: palette index out of range")
        return palette[idx]
    raise NotImplementedError(f"DIB: {bpp}-bpp pixels unsupported")


def _parse_dib_header(
    dib: bytes,
) -> tuple[int, int, int, bool, int, np.ndarray | None, int, int]:
    """(w, h_total, bpp, top_down, header size, palette RGB, data
    offset, compression) of a DIB — BITMAPINFOHEADER family plus the
    12-byte OS/2 BITMAPCOREHEADER (u16 dims, 3-byte palette)."""
    if len(dib) < 12:
        raise ValueError("DIB: truncated header")
    hdr = int.from_bytes(dib[0:4], "little")
    if hdr == 12:  # BITMAPCOREHEADER
        w = int.from_bytes(dib[4:6], "little")
        h_raw = int.from_bytes(dib[6:8], "little")
        bpp = int.from_bytes(dib[10:12], "little")
        if w <= 0 or h_raw == 0:
            raise ValueError("DIB: bad dimensions")
        palette = None
        pal_bytes = 0
        if bpp <= 8:
            n = 1 << bpp
            pal_bytes = 3 * n  # core palettes are 3-byte BGR
            raw = np.frombuffer(dib[hdr : hdr + pal_bytes], np.uint8)
            if len(raw) < pal_bytes:
                raise ValueError("DIB: truncated color table")
            palette = raw.reshape(n, 3)[:, ::-1].copy()
        return w, h_raw, bpp, False, hdr, palette, hdr + pal_bytes, 0
    if len(dib) < 40 or hdr < 40:
        raise ValueError("DIB: bad header size")
    w = int.from_bytes(dib[4:8], "little", signed=True)
    h_raw = int.from_bytes(dib[8:12], "little", signed=True)
    bpp = int.from_bytes(dib[14:16], "little")
    comp = int.from_bytes(dib[16:20], "little")
    if comp not in (0, 1, 2):
        raise NotImplementedError(
            f"DIB: compression {comp} (BI_RGB and RLE8/RLE4 supported)"
        )
    if w <= 0 or h_raw == 0:
        raise ValueError("DIB: bad dimensions")
    clr_used = int.from_bytes(dib[32:36], "little")
    palette = None
    pal_bytes = 0
    if bpp <= 8:
        n = clr_used or (1 << bpp)
        pal_bytes = 4 * n
        raw = np.frombuffer(dib[hdr : hdr + pal_bytes], np.uint8)
        if len(raw) < pal_bytes:
            raise ValueError("DIB: truncated color table")
        palette = raw.reshape(n, 4)[:, [2, 1, 0]].copy()  # BGRX → RGB
    return w, abs(h_raw), bpp, h_raw < 0, hdr, palette, hdr + pal_bytes, comp


def decode_bmp_pixels(buf: bytes) -> np.ndarray:
    """Full BMP file decode → uint8 (h, w, 3|4): BI_RGB 32/24/16-bpp
    or paletted 8/4/1 (BITMAPINFOHEADER family or the 12-byte OS/2
    core header), plus RLE8/RLE4 compressed paletted rows, bottom-up
    or top-down."""
    if len(buf) < 54 or buf[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off_bits = int.from_bytes(buf[10:14], "little")
    w, h, bpp, top_down, _hdr, palette, _, comp = _parse_dib_header(buf[14:])
    if w * h * 4 > _DIB_MAX_DECODE_BYTES:
        raise ValueError("BMP: frame exceeds decode bound")
    if off_bits < 14 or off_bits > len(buf):
        raise ValueError("BMP: bad pixel data offset")
    px = _decode_dib_rows(buf[off_bits:], w, h, bpp, palette, comp)
    return px.copy() if top_down else px[::-1].copy()


def decode_ico_pixels(buf: bytes) -> np.ndarray:
    """ICO/CUR decode → uint8 (h, w, 4) RGBA of the LARGEST image entry
    (the web-crawl favicon container). PNG-compressed entries route to
    the PNG decoder; DIB entries decode 32/24/8/4/1-bpp with the
    trailing 1-bit AND mask supplying alpha for non-32bpp images."""
    if len(buf) < 6 or buf[0:2] != b"\x00\x00" or buf[2:4] not in (b"\x01\x00", b"\x02\x00"):
        raise ValueError("not an ICO payload")
    count = int.from_bytes(buf[4:6], "little")
    if count == 0 or 6 + 16 * count > len(buf):
        raise ValueError("ICO: bad directory")
    best = None
    for i in range(count):
        e = buf[6 + 16 * i : 6 + 16 * (i + 1)]
        w = e[0] or 256
        h = e[1] or 256
        size = int.from_bytes(e[8:12], "little")
        off = int.from_bytes(e[12:16], "little")
        if best is None or w * h > best[0]:
            best = (w * h, off, size)
    _, off, size = best
    if off + size > len(buf):
        raise ValueError("ICO: entry past end of payload")
    entry = buf[off : off + size]
    if entry[:8] == _PNG_SIGNATURE:
        px = decode_png_pixels(entry)
        if px.shape[2] == 3:
            px = np.concatenate(
                [px, np.full((*px.shape[:2], 1), 255, np.uint8)], axis=2
            )
        elif px.shape[2] == 1:
            px = np.concatenate(
                [np.repeat(px, 3, axis=2), np.full((*px.shape[:2], 1), 255, np.uint8)],
                axis=2,
            )
        elif px.shape[2] == 2:
            px = np.concatenate([np.repeat(px[..., :1], 3, axis=2), px[..., 1:]], axis=2)
        return px
    # DIB entry: biHeight is DOUBLED (XOR image + 1-bit AND mask)
    w, h2, bpp, top_down, _hdr, palette, data_off, comp = _parse_dib_header(entry)
    h = h2 // 2
    if h == 0 or w * h * 4 > _DIB_MAX_DECODE_BYTES:
        raise ValueError("ICO: bad DIB dimensions")
    px = _decode_dib_rows(entry[data_off:], w, h, bpp, palette, comp)
    px = px if top_down else px[::-1]
    if px.shape[2] == 3:
        xor_stride = ((w * bpp + 31) // 32) * 4
        mask_data = entry[data_off + xor_stride * h :]
        mask_stride = ((w + 31) // 32) * 4
        alpha = np.full((h, w, 1), 255, np.uint8)
        if len(mask_data) >= mask_stride * h:
            mrows = np.frombuffer(mask_data[: mask_stride * h], np.uint8).reshape(
                h, mask_stride
            )
            mbits = np.unpackbits(mrows, axis=1)[:, :w]
            if not top_down:
                mbits = mbits[::-1]
            alpha = np.where(mbits[..., None] == 1, 0, 255).astype(np.uint8)
        px = np.concatenate([px, alpha], axis=2)
    return px.copy()


def decode_image_payload(buf: bytes) -> np.ndarray | None:
    """First displayable frame of any supported image/video payload, or
    None for non-visual payloads. THE shared sniff+dispatch for every
    image featurizer (phash, resize, decode_media's image arm) — one
    table, so format coverage cannot drift between featurizers (the
    DECODE_QUARANTINE argument applied to dispatch)."""
    if buf[:8] == _PNG_SIGNATURE:
        return decode_png_pixels(buf)
    if buf[:6] in (b"GIF87a", b"GIF89a"):
        return decode_gif_pixels(buf)[0]
    if buf[:2] == b"\xff\xd8":
        from .jpeg import decode_jpeg_oriented

        return decode_jpeg_oriented(buf)  # EXIF display orientation
    if len(buf) >= 12 and buf[:4] == b"RIFF" and buf[8:12] == b"AVI ":
        from .avi import decode_avi_frames

        return decode_avi_frames(buf)[0]
    if len(buf) >= 16 and buf[:4] == b"RIFF" and buf[8:12] == b"WEBP":
        from .vp8l import decode_webp_pixels

        return decode_webp_pixels(buf)
    if buf[:4] == b"DKIF":
        from .vp8 import decode_ivf_frames

        return decode_ivf_frames(buf)[0]
    if buf[:4] == b"\x1aE\xdf\xa3":
        from .webm import decode_webm_frames

        return decode_webm_frames(buf)[0]
    if buf[:4] in (b"II*\x00", b"MM\x00*"):
        from .tiff import decode_tiff_pixels

        return decode_tiff_pixels(buf)
    if len(buf) >= 54 and buf[:2] == b"BM":
        return decode_bmp_pixels(buf)
    if len(buf) >= 6 and buf[0:2] == b"\x00\x00" and buf[2:4] in (b"\x01\x00", b"\x02\x00"):
        return decode_ico_pixels(buf)
    return None


def decode_image_frames(buf: bytes) -> np.ndarray | None:
    """ALL displayable frames, (n, h, w, c) — multi-frame for GIF, AVI
    and APNG, single-frame for everything else ``decode_image_payload``
    covers; None for non-visual payloads. The frame-sampling twin of
    the shared dispatch above."""
    if buf[:6] in (b"GIF87a", b"GIF89a"):
        return decode_gif_pixels(buf)
    if len(buf) >= 12 and buf[:4] == b"RIFF" and buf[8:12] == b"AVI ":
        from .avi import decode_avi_frames

        return decode_avi_frames(buf)
    if len(buf) >= 12 and buf[:4] == b"RIFF" and buf[8:12] == b"WEBP":
        from .vp8l import decode_webp_frames

        return decode_webp_frames(buf)
    if buf[:4] == b"DKIF":
        from .vp8 import decode_ivf_frames

        return decode_ivf_frames(buf)
    if buf[:4] == b"\x1aE\xdf\xa3":
        from .webm import decode_webm_frames

        return decode_webm_frames(buf)
    if buf[:8] == _PNG_SIGNATURE:
        return decode_apng_frames(buf)
    px = decode_image_payload(buf)
    return None if px is None else px[None, ...]


def decode_media(buf: bytes) -> dict:
    """Dispatch a payload to the right full decoder and reduce it to a
    bounded feature dict (the per-item output of ``featurize_pixels``)."""
    if buf[:8] == _PNG_SIGNATURE:
        px = decode_png_pixels(buf)
        flat = px.astype(np.float64)
        return {
            "mime": "image/png",
            "kind": "image",
            "width": int(px.shape[1]),
            "height": int(px.shape[0]),
            "channels": int(px.shape[2]),
            "n_samples": int(px.size),
            "mean": float(flat.mean()),
            "rms": float(np.sqrt((flat**2).mean())),
        }
    if len(buf) >= 6 and buf[:6] in (b"GIF87a", b"GIF89a"):
        px = decode_gif_pixels(buf)  # (n_frames, h, w, 3)
        flat = px.astype(np.float64)
        return {
            "mime": "image/gif",
            "kind": "image",
            "width": int(px.shape[2]),
            "height": int(px.shape[1]),
            "channels": int(px.shape[3]),
            "n_samples": int(px.size),
            "mean": float(flat.mean()),
            "rms": float(np.sqrt((flat**2).mean())),
        }
    if len(buf) >= 2 and buf[:2] == b"\xff\xd8":
        from .jpeg import decode_jpeg_oriented

        px = decode_jpeg_oriented(buf)  # (h, w, 1|3), EXIF-upright
        flat = px.astype(np.float64)
        return {
            "mime": "image/jpeg",
            "kind": "image",
            "width": int(px.shape[1]),
            "height": int(px.shape[0]),
            "channels": int(px.shape[2]),
            "n_samples": int(px.size),
            "mean": float(flat.mean()),
            "rms": float(np.sqrt((flat**2).mean())),
        }
    if len(buf) >= 12 and buf[:4] == b"RIFF" and buf[8:12] == b"WAVE":
        samples, rate = decode_wav_samples(buf)
        flat = samples.astype(np.float64)
        return {
            "mime": "audio/wav",
            "kind": "audio",
            "width": None,
            "height": None,
            "channels": int(samples.shape[1]) if samples.size else 0,
            "n_samples": int(samples.shape[0]),
            "mean": float(flat.mean()) if samples.size else 0.0,
            "rms": float(np.sqrt((flat**2).mean())) if samples.size else 0.0,
        }
    if len(buf) >= 12 and buf[:4] == b"RIFF" and buf[8:12] == b"AVI ":
        from .avi import decode_avi_frames

        px = decode_avi_frames(buf)  # (n_frames, h, w, 3)
        flat = px.astype(np.float64)
        return {
            "mime": "video/x-msvideo",
            "kind": "video",
            "width": int(px.shape[2]),
            "height": int(px.shape[1]),
            "channels": int(px.shape[3]),
            "n_samples": int(px.size),
            "mean": float(flat.mean()),
            "rms": float(np.sqrt((flat**2).mean())),
        }
    if buf[:4] == b"fLaC":
        from .flac import decode_flac_samples

        samples, _rate = decode_flac_samples(buf)
        flat = samples.astype(np.float64)
        return {
            "mime": "audio/flac",
            "kind": "audio",
            "width": None,
            "height": None,
            "channels": int(samples.shape[1]) if samples.size else 0,
            "n_samples": int(samples.shape[0]),
            "mean": float(flat.mean()) if samples.size else 0.0,
            "rms": float(np.sqrt((flat**2).mean())) if samples.size else 0.0,
        }
    if buf[:3] == b"ID3" or (
        len(buf) >= 4 and buf[0] == 0xFF and (buf[1] & 0xE0) == 0xE0
    ):
        from .multimodal import parse_mp3_header

        if parse_mp3_header(buf) is not None:
            from .mp3 import decode_mp3_samples

            samples, _rate = decode_mp3_samples(buf)
            flat = samples.astype(np.float64)
            return {
                "mime": "audio/mpeg",
                "kind": "audio",
                "width": None,
                "height": None,
                "channels": int(samples.shape[1]) if samples.size else 0,
                "n_samples": int(samples.shape[0]),
                "mean": float(flat.mean()) if samples.size else 0.0,
                "rms": float(np.sqrt((flat**2).mean())) if samples.size else 0.0,
            }
    if buf[:4] == b"OggS":
        from .vorbis import decode_vorbis_samples

        samples, _rate = decode_vorbis_samples(buf)
        flat = samples.astype(np.float64)
        return {
            "mime": "audio/ogg",
            "kind": "audio",
            "width": None,
            "height": None,
            "channels": int(samples.shape[1]) if samples.size else 0,
            "n_samples": int(samples.shape[0]),
            "mean": float(flat.mean()) if samples.size else 0.0,
            "rms": float(np.sqrt((flat**2).mean())) if samples.size else 0.0,
        }
    if len(buf) >= 16 and buf[:4] == b"RIFF" and buf[8:12] == b"WEBP":
        from .vp8l import decode_webp_pixels

        px = decode_webp_pixels(buf)  # VP8L + lossy (keyframe) stills
        flat = px.astype(np.float64)
        return {
            "mime": "image/webp",
            "kind": "image",
            "width": int(px.shape[1]),
            "height": int(px.shape[0]),
            "channels": int(px.shape[2]),
            "n_samples": int(px.size),
            "mean": float(flat.mean()),
            "rms": float(np.sqrt((flat**2).mean())),
        }
    if buf[:4] == b"DKIF":
        from .vp8 import decode_ivf_frames

        px = decode_ivf_frames(buf)  # (n_frames, h, w, 4), full VP8 inter
        flat = px.astype(np.float64)
        return {
            "mime": "video/x-ivf",
            "kind": "video",
            "width": int(px.shape[2]),
            "height": int(px.shape[1]),
            "channels": int(px.shape[3]),
            "n_samples": int(px.size),
            "mean": float(flat.mean()),
            "rms": float(np.sqrt((flat**2).mean())),
        }
    if buf[:4] == b"\x1aE\xdf\xa3":
        from .webm import decode_webm_frames

        px = decode_webm_frames(buf)  # VP8 track through Vp8Decoder
        flat = px.astype(np.float64)
        return {
            "mime": "video/webm",
            "kind": "video",
            "width": int(px.shape[2]),
            "height": int(px.shape[1]),
            "channels": int(px.shape[3]),
            "n_samples": int(px.size),
            "mean": float(flat.mean()),
            "rms": float(np.sqrt((flat**2).mean())),
        }
    if buf[:4] in (b"II*\x00", b"MM\x00*"):
        from .tiff import decode_tiff_pixels

        px = decode_tiff_pixels(buf)
        flat = px.astype(np.float64)
        return {
            "mime": "image/tiff",
            "kind": "image",
            "width": int(px.shape[1]),
            "height": int(px.shape[0]),
            "channels": int(px.shape[2]),
            "n_samples": int(px.size),
            "mean": float(flat.mean()),
            "rms": float(np.sqrt((flat**2).mean())),
        }
    if len(buf) >= 54 and buf[:2] == b"BM":
        px = decode_bmp_pixels(buf)
        flat = px.astype(np.float64)
        return {
            "mime": "image/bmp",
            "kind": "image",
            "width": int(px.shape[1]),
            "height": int(px.shape[0]),
            "channels": int(px.shape[2]),
            "n_samples": int(px.size),
            "mean": float(flat.mean()),
            "rms": float(np.sqrt((flat**2).mean())),
        }
    if len(buf) >= 6 and buf[0:2] == b"\x00\x00" and buf[2:4] in (b"\x01\x00", b"\x02\x00"):
        px = decode_ico_pixels(buf)
        flat = px.astype(np.float64)
        return {
            "mime": "image/x-icon",
            "kind": "image",
            "width": int(px.shape[1]),
            "height": int(px.shape[0]),
            "channels": int(px.shape[2]),
            "n_samples": int(px.size),
            "mean": float(flat.mean()),
            "rms": float(np.sqrt((flat**2).mean())),
        }
    raise NotImplementedError(
        "payload decode is stdlib-supported for PNG, GIF, JPEG (baseline + "
        "progressive), lossless WebP, BMP, ICO, PCM WAV and MJPEG/raw-DIB "
        "AVI; other codecs need a codec library"
    )


def featurize_pixels(media: DataFrame) -> DataFrame:
    """Real full-decode feature extraction over Arrow batches — the
    ``decode_pixels`` production path for PNG/WAV payloads. Payloads no
    stdlib decoder covers quarantine as ``application/octet-stream``
    rows with NULL stats (same never-fail policy as ``decode_header``)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for item_id, payload in zip(pdf["item_id"], pdf["payload"]):
                buf = bytes(payload) if payload is not None else b""
                try:
                    feat = decode_media(buf)
                except DECODE_QUARANTINE:
                    # NotImplementedError: codec-needing format; the rest:
                    # corrupt payloads behind a valid signature (bad deflate
                    # stream, truncated chunk walk) — quarantine, never fail
                    # the task (same totality contract as decode_header)
                    feat = {
                        "mime": "application/octet-stream",
                        "kind": "unknown",
                        "width": None,
                        "height": None,
                        "channels": None,
                        "n_samples": None,
                        "mean": None,
                        "rms": None,
                    }
                rows.append({"item_id": item_id, **feat})
            yield pd.DataFrame(rows)

    return media.mapInPandas(run, schema=PIXEL_FEATURES_SCHEMA)
