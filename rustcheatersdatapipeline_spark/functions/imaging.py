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
    or None — delegates to the single shared dispatch in pixels.py."""
    from .pixels import decode_image_payload

    return decode_image_payload(buf)


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
    """Explode multi-frame payloads (GIF/AVI/APNG) into every ``step``-th
    frame as its own PNG row — the real form of ``featurize_media``'s
    ``sampled_frames`` index list. Single-frame images emit frame 0;
    non-visual payloads emit nothing."""
    if step < 1:
        raise ValueError("sample_frames: step must be >= 1")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .pixels import decode_image_frames

        cols = ["item_id", "frame_idx", "payload", "width", "height"]
        for pdf in batches:
            rows = []
            for item_id, payload in zip(pdf["item_id"], pdf["payload"]):
                buf = bytes(payload) if payload is not None else b""
                try:
                    frames = decode_image_frames(buf)
                except DECODE_QUARANTINE:
                    continue
                if frames is None:
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
