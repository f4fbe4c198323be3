"""Image resize and video/animation frame sampling — the remaining two
verbs of the multimodal quartet (decode / feature-extract / RESIZE /
FRAME-SAMPLE), real end to end.

Both operators decode with the engine's own pure-stdlib decoders
(PNG/GIF/JPEG/AVI — functions/pixels.py, jpeg.py, avi.py) and re-emit
pixels as **PNG payloads** (filter-0 scanlines + zlib, the trivially
correct encoder: PNG round-trips losslessly through the already
property-tested decoder). One Arrow ``mapInPandas`` pass per operator;
undecodable payloads quarantine as NULL rows, never a task failure.

Scale notes: resized thumbnails and sampled frames are the classic
prep step before embedding/captioning models; output size is bounded
by (target dims × items) regardless of input payload size, so the
stage shrinks data — safe to run widest-first. Nearest-neighbor is the
deterministic, seam-free choice for a correctness-auditable pipeline
(bilinear differs across libraries; NN is reproducible bit-for-bit
from the spec)."""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

from .pixels import DECODE_QUARANTINE


def encode_png_bytes(px: np.ndarray) -> bytes:
    """Minimal lossless PNG: 8-bit gray/gray+alpha/RGB/RGBA, filter 0.
    The product-side inverse of ``decode_png_pixels`` (round-trip
    asserted in tests)."""
    if px.ndim == 2:
        px = px[..., None]
    h, w, ch = px.shape
    color = {1: 0, 3: 2, 2: 4, 4: 6}[ch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    raw = b"".join(
        b"\x00" + px[y].astype(np.uint8).tobytes() for y in range(h)
    )

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def resize_nn(px: np.ndarray, width: int, height: int) -> np.ndarray:
    """Deterministic nearest-index resample to (height, width)."""
    if width < 1 or height < 1:
        raise ValueError("resize_nn: target dims must be >= 1")
    ys = (np.arange(height) * px.shape[0] // height).astype(np.int64)
    xs = (np.arange(width) * px.shape[1] // width).astype(np.int64)
    return px[np.ix_(ys, xs)]


def _decode_image(buf: bytes) -> np.ndarray | None:
    """First displayable frame of any supported image/video payload,
    or None for non-visual/unsupported payloads."""
    from .avi import decode_avi_frames
    from .jpeg import decode_jpeg_pixels
    from .multimodal import _PNG_SIGNATURE
    from .pixels import (
        decode_bmp_pixels,
        decode_gif_pixels,
        decode_ico_pixels,
        decode_png_pixels,
    )

    if buf[:8] == _PNG_SIGNATURE:
        return decode_png_pixels(buf)
    if buf[:6] in (b"GIF87a", b"GIF89a"):
        return decode_gif_pixels(buf)[0]
    if buf[:2] == b"\xff\xd8":
        return decode_jpeg_pixels(buf)
    if len(buf) >= 12 and buf[:4] == b"RIFF" and buf[8:12] == b"AVI ":
        return decode_avi_frames(buf)[0]
    if len(buf) >= 16 and buf[:4] == b"RIFF" and buf[8:12] == b"WEBP":
        from .vp8l import decode_webp_pixels

        return decode_webp_pixels(buf)
    if buf[:4] in (b"II*\x00", b"MM\x00*"):
        from .tiff import decode_tiff_pixels

        return decode_tiff_pixels(buf)
    if len(buf) >= 54 and buf[:2] == b"BM":
        return decode_bmp_pixels(buf)
    if len(buf) >= 6 and buf[0:2] == b"\x00\x00" and buf[2:4] in (b"\x01\x00", b"\x02\x00"):
        return decode_ico_pixels(buf)
    return None


RESIZED_SCHEMA = "item_id bigint, payload binary, width int, height int"


def resize_media(media: DataFrame, width: int, height: int) -> DataFrame:
    """(item_id, png payload, width, height) with every decodable
    image/first-frame payload resampled to the target dims; rows that
    do not decode carry a NULL payload (quarantine)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for item_id, payload in zip(pdf["item_id"], pdf["payload"]):
                buf = bytes(payload) if payload is not None else b""
                try:
                    px = _decode_image(buf)
                except DECODE_QUARANTINE:
                    px = None
                if px is None:
                    rows.append(
                        {"item_id": item_id, "payload": None, "width": None, "height": None}
                    )
                else:
                    out = encode_png_bytes(resize_nn(px, width, height))
                    rows.append(
                        {"item_id": item_id, "payload": out, "width": width, "height": height}
                    )
            yield pd.DataFrame(rows, columns=["item_id", "payload", "width", "height"])

    return media.mapInPandas(run, schema=RESIZED_SCHEMA)


FRAMES_SCHEMA = "item_id bigint, frame_idx int, payload binary, width int, height int"


def sample_frames(media: DataFrame, step: int = 2) -> DataFrame:
    """Explode multi-frame payloads (GIF/AVI) into every ``step``-th
    frame as its own PNG row — the real form of ``featurize_media``'s
    ``sampled_frames`` index list. Single-frame images emit frame 0;
    non-visual payloads emit nothing."""
    if step < 1:
        raise ValueError("sample_frames: step must be >= 1")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .avi import decode_avi_frames
        from .jpeg import decode_jpeg_pixels
        from .multimodal import _PNG_SIGNATURE
        from .pixels import (
            decode_apng_frames,
            decode_bmp_pixels,
            decode_gif_pixels,
            decode_ico_pixels,
        )

        cols = ["item_id", "frame_idx", "payload", "width", "height"]
        for pdf in batches:
            rows = []
            for item_id, payload in zip(pdf["item_id"], pdf["payload"]):
                buf = bytes(payload) if payload is not None else b""
                try:
                    if buf[:6] in (b"GIF87a", b"GIF89a"):
                        frames = decode_gif_pixels(buf)
                    elif len(buf) >= 12 and buf[:4] == b"RIFF" and buf[8:12] == b"AVI ":
                        frames = decode_avi_frames(buf)
                    elif buf[:8] == _PNG_SIGNATURE:
                        frames = decode_apng_frames(buf)  # APNG-aware
                    elif buf[:2] == b"\xff\xd8":
                        frames = decode_jpeg_pixels(buf)[None, ...]
                    elif len(buf) >= 16 and buf[:4] == b"RIFF" and buf[8:12] == b"WEBP":
                        from .vp8l import decode_webp_pixels

                        frames = decode_webp_pixels(buf)[None, ...]
                    elif buf[:4] in (b"II*\x00", b"MM\x00*"):
                        from .tiff import decode_tiff_pixels

                        frames = decode_tiff_pixels(buf)[None, ...]
                    elif len(buf) >= 54 and buf[:2] == b"BM":
                        frames = decode_bmp_pixels(buf)[None, ...]
                    elif len(buf) >= 6 and buf[0:2] == b"\x00\x00" and buf[2:4] in (
                        b"\x01\x00",
                        b"\x02\x00",
                    ):
                        frames = decode_ico_pixels(buf)[None, ...]
                    else:
                        continue
                except DECODE_QUARANTINE:
                    continue
                for i in range(0, frames.shape[0], step):
                    rows.append(
                        {
                            "item_id": item_id,
                            "frame_idx": i,
                            "payload": encode_png_bytes(frames[i]),
                            "width": int(frames.shape[2]),
                            "height": int(frames.shape[1]),
                        }
                    )
            yield pd.DataFrame(rows, columns=cols)

    return media.mapInPandas(run, schema=FRAMES_SCHEMA)
