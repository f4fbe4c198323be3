"""AVI (RIFF) video frame decode for the codecs that need no codec
library: **MJPEG** (each frame is a standalone baseline JPEG —
decoded by ``functions/jpeg.py``) and **raw DIB / BI_RGB** (bottom-up
BGR rows, 4-byte aligned). Compressed inter-frame codecs (H.264,
MPEG-4, …) raise a ``NotImplementedError`` naming the FourCC — the
last genuine codec-library boundary of the multimodal path.

Container walk (public AVI/RIFF spec): ``RIFF('AVI ')`` holds
``LIST('hdrl')`` — ``avih`` main header plus one ``LIST('strl')`` per
stream with ``strh`` (stream header: fccType/handler) and ``strf``
(BITMAPINFOHEADER for video) — then ``LIST('movi')`` with the frame
chunks ``NNdb``/``NNdc`` (NN = stream index; db=uncompressed,
dc=compressed), each padded to even length. Frame sampling (every
k-th frame) belongs to the caller (``featurize_media``'s
``frame_step``); this module decodes what it is handed.
"""

from __future__ import annotations

import numpy as np

from .jpeg import decode_jpeg_pixels
from .multimodal import parse_avi_header

_AVI_MAX_DECODE_BYTES = 1 << 28


def _chunks(buf: bytes, pos: int, end: int):
    """(chunk id, body offset, body size) for each RIFF chunk in range."""
    while pos + 8 <= end:
        cid = buf[pos : pos + 4]
        sz = int.from_bytes(buf[pos + 4 : pos + 8], "little")
        yield cid, pos + 8, sz
        pos += 8 + sz + (sz & 1)


def _video_stream_info(buf: bytes) -> tuple[int, bytes, bytes | None]:
    """(stream index, handler fourcc, strf body) of the first ``vids``
    stream, scanning LIST('strl') entries inside LIST('hdrl')."""
    idx = -1
    for cid, off, sz in _chunks(buf, 12, len(buf)):
        if cid != b"LIST" or buf[off : off + 4] != b"hdrl":
            continue
        for c2, o2, s2 in _chunks(buf, off + 4, off + sz):
            if c2 != b"LIST" or buf[o2 : o2 + 4] != b"strl":
                continue
            idx += 1
            handler = b""
            strf = None
            is_video = False
            for c3, o3, s3 in _chunks(buf, o2 + 4, o2 + s2):
                if c3 == b"strh" and s3 >= 8:
                    is_video = buf[o3 : o3 + 4] == b"vids"
                    handler = buf[o3 + 4 : o3 + 8]
                elif c3 == b"strf":
                    strf = buf[o3 : o3 + s3]
            if is_video:
                return idx, handler, strf
    raise ValueError("AVI: no video stream in hdrl")


def _decode_dib(body: bytes, w: int, h: int, bpp: int,
                palette: np.ndarray | None = None) -> np.ndarray:
    """Bottom-up DIB rows → (h, w, 3) RGB via the shared BMP unpack:
    32 (alpha dropped — AVI frames are RGB), 24, 16 (RGB555) and
    paletted 8/4/1-bpp with the stream-format color table."""
    from .pixels import _decode_dib_rows

    px = _decode_dib_rows(body, w, h, bpp, palette)[::-1]  # bottom-up
    if px.shape[2] == 4:
        px = px[..., :3]
    return np.ascontiguousarray(px)


def decode_avi_frames(buf: bytes) -> np.ndarray:
    """Full AVI video decode → uint8 array (n_frames, h, w, 3).

    MJPEG frames (JPEG-signature ``dc`` chunks or an ``MJPG`` handler)
    go through ``decode_jpeg_pixels``; ``db``/BI_RGB frames through the
    DIB unpack. Any other compression raises ``NotImplementedError``
    naming the handler FourCC. Corruption raises ValueError. Bounded by
    the same decode-size guard as PNG/GIF/JPEG."""
    hdr = parse_avi_header(buf)
    if hdr is None:
        raise ValueError("not an AVI payload")
    w, h, _ = hdr
    stream, handler, strf = _video_stream_info(buf)
    bpp = int.from_bytes(strf[14:16], "little") if strf and len(strf) >= 16 else 24
    palette = None
    if strf and len(strf) >= 40 and bpp <= 8:
        from .pixels import _parse_dib_header

        try:  # the strf body IS a BITMAPINFOHEADER (+ color table)
            palette = _parse_dib_header(strf)[5]
        except (ValueError, NotImplementedError):
            palette = None
    prefix = b"%02d" % stream
    frames: list[np.ndarray] = []
    for cid, off, sz in _chunks(buf, 12, len(buf)):
        if cid != b"LIST" or buf[off : off + 4] != b"movi":
            continue
        for c2, o2, s2 in _chunks(buf, off + 4, off + sz):
            if c2[:2] != prefix or c2[2:4] not in (b"db", b"dc"):
                continue
            if o2 + s2 > len(buf):
                raise ValueError("AVI: frame chunk truncated at EOF")
            body = buf[o2 : o2 + s2]
            if not body:
                continue  # dropped-frame placeholder (legal in AVI)
            if body[:2] == b"\xff\xd8":
                px = decode_jpeg_pixels(body)
                if px.shape[2] == 1:
                    px = np.repeat(px, 3, axis=2)
            elif c2[2:4] == b"db":
                px = _decode_dib(body, w, h, bpp, palette)
            else:
                four = handler.decode("ascii", "replace").strip() or "unknown"
                raise NotImplementedError(
                    f"AVI: compressed codec '{four}' needs a codec library"
                )
            if px.shape[:2] != (h, w):
                raise ValueError("AVI: frame dimensions disagree with header")
            if (len(frames) + 1) * h * w * 3 > _AVI_MAX_DECODE_BYTES:
                raise ValueError("AVI: decoded frames exceed decode bound")
            frames.append(px)
    if not frames:
        raise ValueError("AVI: no video frames in movi")
    return np.stack(frames)
