"""Real pixel/sample decoding for the multimodal path — pure stdlib.

Round 5 upgraded ``featurize_media(fake=False)`` from a stub to real
HEADER decode (multimodal.py); this module goes the rest of the way for
the two formats whose full payload is decodable with nothing but the
standard library:

- **PNG** (RFC 2083): chunk walk → concatenated IDAT → ``zlib``
  inflate → scanline unfiltering (all five filter types: None, Sub,
  Up, Average, Paeth) → ``(h, w, channels)`` uint8 array. Supported:
  bit depth 8, color types 0/2/4/6 (gray, RGB, gray+alpha, RGBA),
  non-interlaced — the shapes ML pipelines actually emit. Palette,
  16-bit and Adam7 raise ``NotImplementedError`` with the exact
  variant named (quarantined upstream, never a task failure).
- **WAV** (RIFF PCM): ``data`` chunk → ``numpy.frombuffer`` →
  ``(n_frames, channels)`` int array (8-bit unsigned / 16-bit /
  32-bit signed little-endian PCM).

JPEG/GIF-LZW/AVI payload decode genuinely needs a codec library and
stays behind the ``decode_pixels`` NotImplementedError contract.

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


def decode_png_pixels(buf: bytes) -> np.ndarray:
    """Full PNG decode → uint8 array of shape (height, width, channels)."""
    if buf[:8] != _PNG_SIGNATURE:
        raise ValueError("not a PNG payload")
    ihdr = None
    idat = bytearray()
    for tag, data in _png_chunks(buf):
        if tag == b"IHDR":
            ihdr = data
        elif tag == b"IDAT":
            idat.extend(data)
    if ihdr is None or len(ihdr) < 13 or not idat:
        raise ValueError("PNG: missing IHDR/IDAT")
    w = int.from_bytes(ihdr[0:4], "big")
    h = int.from_bytes(ihdr[4:8], "big")
    depth, color, interlace = ihdr[8], ihdr[9], ihdr[12]
    if depth != 8:
        raise NotImplementedError(f"PNG bit depth {depth} (only 8 supported)")
    if color not in _PNG_CHANNELS:
        raise NotImplementedError(f"PNG color type {color} (palette unsupported)")
    if interlace != 0:
        raise NotImplementedError("PNG Adam7 interlacing unsupported")
    channels = _PNG_CHANNELS[color]
    stride = w * channels
    # the exact inflated size is known from IHDR: h scanlines of
    # (filter byte + stride). Cap decompression at that bound so a
    # decompression-bomb payload (tiny IDAT inflating to GBs behind a
    # valid signature) raises ValueError → quarantine, instead of
    # OOMing the executor (MemoryError is outside the quarantine
    # contract).
    expected = h * (stride + 1)
    d = zlib.decompressobj()
    raw = d.decompress(bytes(idat), expected)
    if d.unconsumed_tail and d.decompress(d.unconsumed_tail, 1):
        raise ValueError("PNG: inflated stream exceeds h*(stride+1) bound")
    pixels = _unfilter_scanlines(raw, h, stride, channels)
    return np.frombuffer(bytes(pixels), np.uint8).reshape(h, w, channels)


def decode_wav_samples(buf: bytes) -> tuple[np.ndarray, int]:
    """Full PCM WAV decode → (samples array of shape (n_frames,
    channels), sample_rate). 8-bit unsigned, 16/32-bit signed LE."""
    hdr = parse_wav_header(buf)
    if hdr is None:
        raise ValueError("not a RIFF/WAVE payload")
    channels, rate, bits, n_frames = hdr
    if bits not in (8, 16, 32):
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
    dtype = {8: np.uint8, 16: np.dtype("<i2"), 32: np.dtype("<i4")}[bits]
    usable = (len(data) // (channels * dtype.itemsize if bits != 8 else channels)) * channels
    arr = np.frombuffer(data, dtype)[:usable].reshape(-1, channels)
    return arr, rate


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
    raise NotImplementedError(
        "full payload decode is stdlib-supported for PNG and PCM WAV only; "
        "JPEG/GIF/AVI need a codec library"
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
                except (NotImplementedError, ValueError, zlib.error, IndexError):
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
