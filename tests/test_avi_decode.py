"""AVI MJPEG / raw-DIB frame decode (functions/avi.py).

The oracle is a test-side AVI WRITER emitting spec-exact RIFF nesting
(hdrl → strl → strh/strf, movi → NNdc/NNdb chunks, even-byte padding).
MJPEG frames reuse the baseline-JPEG test encoder, so the expected
frame images come from the same independently-replayed coefficients as
tests/test_jpeg_decode.py; DIB frames round-trip bit-exactly."""

import struct

import numpy as np
import pytest

from rustcheatersdatapipeline_spark.functions.avi import decode_avi_frames
from rustcheatersdatapipeline_spark.functions.multimodal import decode_pixels
from rustcheatersdatapipeline_spark.functions.pixels import decode_media
from tests.test_jpeg_decode import encode_jpeg


def _chunk(cid: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) & 1 else b""
    return cid + struct.pack("<I", len(body)) + body + pad


def _list(ltype: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", ltype + body)


def build_avi(
    w: int,
    h: int,
    frames: list[bytes],
    handler: bytes = b"MJPG",
    compression: int = 0,
    bpp: int = 24,
    kind: bytes = b"dc",
    palette: np.ndarray | None = None,
) -> bytes:
    avih = bytearray(56)
    avih[16:20] = struct.pack("<I", len(frames))
    avih[32:36] = struct.pack("<I", w)
    avih[36:40] = struct.pack("<I", h)
    strh = bytearray(56)
    strh[0:4] = b"vids"
    strh[4:8] = handler
    strf = bytearray(40)  # BITMAPINFOHEADER
    strf[0:4] = struct.pack("<I", 40)
    strf[4:8] = struct.pack("<i", w)
    strf[8:12] = struct.pack("<i", h)
    strf[12:14] = struct.pack("<H", 1)
    strf[14:16] = struct.pack("<H", bpp)
    strf[16:20] = struct.pack("<I", compression)
    if palette is not None:
        strf[32:36] = struct.pack("<I", len(palette))
        pal = np.zeros((len(palette), 4), np.uint8)
        pal[:, [2, 1, 0]] = palette
        strf += pal.tobytes()
    strl = _list(b"strl", _chunk(b"strh", bytes(strh)) + _chunk(b"strf", bytes(strf)))
    hdrl = _list(b"hdrl", _chunk(b"avih", bytes(avih)) + strl)
    movi = _list(b"movi", b"".join(_chunk(b"00" + kind, f) for f in frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _dib_frame(rgb: np.ndarray) -> bytes:
    """Encode (h, w, 3) RGB as a bottom-up, 4-byte-aligned BGR DIB."""
    h, w, _ = rgb.shape
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), np.uint8)
    rows[:, : w * 3] = rgb[::-1, :, ::-1].reshape(h, w * 3)
    return rows.tobytes()


def test_mjpeg_frames_roundtrip():
    rng = np.random.RandomState(3)
    imgs = [rng.randint(0, 256, (16, 24, 3)).astype(np.uint8) for _ in range(3)]
    encoded = [encode_jpeg(i, subsample=(1, 1)) for i in imgs]
    buf = build_avi(24, 16, [e[0] for e in encoded])
    px = decode_avi_frames(buf)
    assert px.shape == (3, 16, 24, 3)
    for got, (_, expected) in zip(px, encoded):
        assert np.abs(got.astype(int) - expected.astype(int)).max() <= 1


def test_raw_dib_frames_bit_exact():
    rng = np.random.RandomState(4)
    imgs = [rng.randint(0, 256, (7, 5, 3)).astype(np.uint8) for _ in range(2)]
    buf = build_avi(5, 7, [_dib_frame(i) for i in imgs], handler=b"DIB ", kind=b"db")
    px = decode_avi_frames(buf)
    assert px.shape == (2, 7, 5, 3)
    for got, want in zip(px, imgs):
        np.testing.assert_array_equal(got, want)


def test_gray_mjpeg_expands_to_three_channels():
    img = np.full((8, 8), 77, np.uint8)
    jpg, _ = encode_jpeg(img)
    px = decode_avi_frames(build_avi(8, 8, [jpg]))
    assert px.shape == (1, 8, 8, 3)
    assert np.all(np.abs(px.astype(int) - 77) <= 1)


def test_unsupported_codec_named():
    buf = build_avi(8, 8, [b"\x00\x01\x02\x03"], handler=b"H264")
    with pytest.raises(NotImplementedError, match="H264"):
        decode_avi_frames(buf)


def test_corruption_and_empties_raise_value_error():
    with pytest.raises(ValueError):
        decode_avi_frames(b"RIFF\x00\x00\x00\x00AVI ")  # no streams
    img = np.zeros((8, 8), np.uint8)
    jpg, _ = encode_jpeg(img)
    good = build_avi(8, 8, [jpg])
    with pytest.raises(ValueError):
        decode_avi_frames(good[:-10])  # truncated frame chunk
    # frame dims disagreeing with the header must not be stacked silently
    with pytest.raises(ValueError):
        decode_avi_frames(build_avi(99, 99, [jpg]))


def test_empty_drop_frame_placeholders_skipped():
    img = np.zeros((8, 8), np.uint8)
    jpg, _ = encode_jpeg(img)
    buf = build_avi(8, 8, [jpg, b"", jpg])
    assert decode_avi_frames(buf).shape[0] == 2


def test_dispatch_and_features():
    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, (8, 8, 3)).astype(np.uint8)
    jpg, expected = encode_jpeg(img)
    buf = build_avi(8, 8, [jpg])
    assert decode_pixels(buf).shape == (1, 8, 8, 3)
    feat = decode_media(buf)
    assert feat["mime"] == "video/x-msvideo" and feat["kind"] == "video"
    assert (feat["width"], feat["height"], feat["channels"]) == (8, 8, 3)
    assert feat["mean"] == pytest.approx(float(expected.mean()), abs=1.5)


def test_dib_frames_paletted_and_32bpp():
    rng = np.random.RandomState(67)
    palette = rng.randint(0, 256, (256, 3)).astype(np.uint8)
    idx = [rng.randint(0, 256, (8, 12)).astype(np.uint8) for _ in range(2)]

    def dib8(i):
        stride = (12 + 3) & ~3
        rows = np.zeros((8, stride), np.uint8)
        rows[:, :12] = i[::-1]
        return rows.tobytes()

    buf = build_avi(12, 8, [dib8(i) for i in idx], handler=b"DIB ",
                    bpp=8, kind=b"db", palette=palette)
    px = decode_avi_frames(buf)
    assert px.shape == (2, 8, 12, 3)
    for got, i in zip(px, idx):
        assert np.array_equal(got, palette[i])
    # 32-bpp BGRA frames: alpha dropped
    rgba = rng.randint(0, 256, (8, 12, 4)).astype(np.uint8)
    rows = rgba[::-1][:, :, [2, 1, 0, 3]].reshape(8, -1)
    buf = build_avi(12, 8, [rows.tobytes()], handler=b"DIB ", bpp=32,
                    kind=b"db")
    px = decode_avi_frames(buf)
    assert np.array_equal(px[0], rgba[..., :3])
