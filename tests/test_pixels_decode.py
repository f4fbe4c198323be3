"""Full PNG/WAV payload decode (functions/pixels.py).

The PNG oracle is a test-side ENCODER implementing the forward filter
transforms (RFC 2083 §6) — the decoder inverts them, so decode(encode(
image)) == image is a bit-exact round trip that fails if either side
drifts from the spec. All five filter types are exercised, plus all
four supported color types."""

import io
import struct
import wave
import zlib

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from rustcheatersdatapipeline_spark.functions.multimodal import media_table
from rustcheatersdatapipeline_spark.functions.pixels import (
    decode_media,
    decode_png_pixels,
    decode_wav_samples,
    featurize_pixels,
)


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def _forward_filter(img: np.ndarray, ftype: int) -> bytes:
    """Apply one PNG filter type to every scanline (the ENCODER side)."""
    h, w, ch = img.shape
    stride = w * ch
    flat = img.reshape(h, stride).astype(np.int32)
    out = bytearray()
    prior = np.zeros(stride, np.int32)
    for y in range(h):
        line = flat[y]
        left = np.concatenate([np.zeros(ch, np.int32), line[:-ch]])
        ul = np.concatenate([np.zeros(ch, np.int32), prior[:-ch]])
        if ftype == 0:
            filt = line
        elif ftype == 1:
            filt = line - left
        elif ftype == 2:
            filt = line - prior
        elif ftype == 3:
            filt = line - ((left + prior) >> 1)
        elif ftype == 4:
            p = left + prior - ul
            pa, pb, pc = np.abs(p - left), np.abs(p - prior), np.abs(p - ul)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prior, ul)
            )
            filt = line - pred
        out.append(ftype)
        out.extend((filt & 0xFF).astype(np.uint8).tobytes())
        prior = line
    return bytes(out)


_COLOR_TYPE = {1: 0, 3: 2, 2: 4, 4: 6}  # channels -> PNG color type


def encode_png(img: np.ndarray, ftype: int = 0) -> bytes:
    h, w, ch = img.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, _COLOR_TYPE[ch], 0, 0, 0)
    raw = _forward_filter(img, ftype)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(samples.shape[1])
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def _gradient(h, w, ch, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_png_roundtrip_all_filters(ftype):
    img = _gradient(13, 17, 3, seed=ftype)
    got = decode_png_pixels(encode_png(img, ftype))
    assert np.array_equal(got, img)


@pytest.mark.parametrize("ch", [1, 2, 3, 4])
def test_png_roundtrip_all_color_types(ch):
    img = _gradient(9, 7, ch, seed=ch)
    got = decode_png_pixels(encode_png(img, ftype=4))
    assert np.array_equal(got, img)


@given(
    h=st.integers(1, 12),
    w=st.integers(1, 12),
    ch=st.sampled_from([1, 2, 3, 4]),
    ftype=st.integers(0, 4),
    seed=st.integers(0, 2**16),
)
@settings(max_examples=40, deadline=None)
def test_png_roundtrip_property(h, w, ch, ftype, seed):
    img = _gradient(h, w, ch, seed=seed)
    assert np.array_equal(decode_png_pixels(encode_png(img, ftype)), img)


def test_png_unsupported_variants_are_named():
    img = _gradient(4, 4, 1)
    png = bytearray(encode_png(img))
    png[24] = 12  # bit depth byte inside IHDR — 12 is not a PNG depth
    with pytest.raises(NotImplementedError, match="bit depth"):
        decode_png_pixels(bytes(png))
    png = bytearray(encode_png(img))
    png[28] = 2  # interlace byte — only 0 (none) and 1 (Adam7) exist
    with pytest.raises(ValueError, match="interlace"):
        decode_png_pixels(bytes(png))


def test_wav_roundtrip_stereo():
    t = np.arange(500)
    samples = np.stack(
        [
            (10000 * np.sin(2 * np.pi * 440 * t / 8000)).astype(np.int64),
            (8000 * np.cos(2 * np.pi * 220 * t / 8000)).astype(np.int64),
        ],
        axis=1,
    )
    got, rate = decode_wav_samples(encode_wav(samples, rate=8000))
    assert rate == 8000
    assert np.array_equal(got, samples.astype("<i2"))


def test_decode_media_features_match_numpy():
    img = _gradient(20, 30, 3, seed=7)
    feat = decode_media(encode_png(img, ftype=2))
    flat = img.astype(np.float64)
    assert (feat["width"], feat["height"], feat["channels"]) == (30, 20, 3)
    assert feat["mean"] == pytest.approx(flat.mean())
    assert feat["rms"] == pytest.approx(np.sqrt((flat**2).mean()))


def test_featurize_pixels_spark_end_to_end(spark):
    img = _gradient(16, 16, 4, seed=3)
    samples = (np.arange(200) % 100 - 50).astype(np.int64).reshape(-1, 2)
    rows = [
        (1, bytearray(encode_png(img, ftype=4))),
        (2, bytearray(encode_wav(samples, rate=16000))),
        (3, bytearray(b"\x00garbage payload")),
    ]
    media = media_table(
        spark.createDataFrame(rows, "item_id long, payload binary"),
        "item_id",
        "payload",
        mime="application/octet-stream",
    )
    out = {r["item_id"]: r.asDict() for r in featurize_pixels(media).collect()}
    assert out[1]["kind"] == "image" and out[1]["width"] == 16
    assert out[1]["mean"] == pytest.approx(img.astype(np.float64).mean())
    assert out[2]["kind"] == "audio" and out[2]["n_samples"] == 100
    assert out[2]["channels"] == 2
    assert out[3]["kind"] == "unknown" and out[3]["mean"] is None

def test_png_decompression_bomb_is_bounded_and_quarantined():
    """ADVICE r5: a tiny IDAT inflating far past h*(stride+1) must raise
    ValueError (-> quarantine) with memory bounded by the IHDR-derived
    size, never OOM the executor."""
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)  # 2x2 gray: 6 bytes
    bomb = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"\x00" * 50_000_000))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="exceeds"):
        decode_png_pixels(bomb)


def encode_palette_png(
    idx: np.ndarray,
    palette: np.ndarray,
    depth: int = 8,
    trns: np.ndarray | None = None,
    ftype: int = 0,
) -> bytes:
    """Test-side color-type-3 encoder: MSB-first index packing per RFC
    2083 §2.3, PLTE (+ optional tRNS) chunks, any filter type — the
    forward transform the palette decoder must invert."""
    h, w = idx.shape
    stride = (w * depth + 7) // 8
    if depth == 8:
        packed = idx.astype(np.uint8)
    else:
        bits = (
            (idx[:, :, None].astype(np.uint8) >> np.arange(depth - 1, -1, -1)) & 1
        ).reshape(h, -1)
        pad = stride * 8 - bits.shape[1]
        if pad:
            bits = np.concatenate([bits, np.zeros((h, pad), np.uint8)], axis=1)
        packed = np.packbits(bits, axis=1)
    raw = _forward_filter(packed[:, :, None], ftype)
    ihdr = struct.pack(">IIBBBBB", w, h, depth, 3, 0, 0, 0)
    out = b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
    out += _chunk(b"PLTE", palette.astype(np.uint8).tobytes())
    if trns is not None:
        out += _chunk(b"tRNS", trns.astype(np.uint8).tobytes())
    return out + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b"")


@pytest.mark.parametrize("depth", [1, 2, 4, 8])
@pytest.mark.parametrize("ftype", [0, 2])
def test_palette_png_roundtrip(depth, ftype):
    rng = np.random.default_rng(depth * 10 + ftype)
    n = 1 << depth
    palette = rng.integers(0, 256, size=(n, 3), dtype=np.uint8)
    idx = rng.integers(0, n, size=(11, 13), dtype=np.uint8)
    got = decode_png_pixels(encode_palette_png(idx, palette, depth, ftype=ftype))
    assert got.shape == (11, 13, 3)
    assert np.array_equal(got, palette[idx])


def test_palette_png_trns_gives_rgba():
    palette = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8)
    trns = np.array([0, 255], np.uint8)  # entry 0 transparent; 2 defaults 255
    idx = np.array([[0, 1], [2, 0]], np.uint8)
    got = decode_png_pixels(encode_palette_png(idx, palette, 8, trns=trns))
    assert got.shape == (2, 2, 4)
    expected_alpha = np.array([[0, 255], [255, 0]], np.uint8)
    assert np.array_equal(got[..., :3], palette[idx])
    assert np.array_equal(got[..., 3], expected_alpha)


@given(
    h=st.integers(1, 10),
    w=st.integers(1, 10),
    depth=st.sampled_from([1, 2, 4, 8]),
    ftype=st.integers(0, 4),
    seed=st.integers(0, 2**16),
)
@settings(max_examples=40, deadline=None)
def test_palette_png_roundtrip_property(h, w, depth, ftype, seed):
    rng = np.random.default_rng(seed)
    n = 1 << depth
    palette = rng.integers(0, 256, size=(n, 3), dtype=np.uint8)
    idx = rng.integers(0, n, size=(h, w), dtype=np.uint8)
    got = decode_png_pixels(encode_palette_png(idx, palette, depth, ftype=ftype))
    assert np.array_equal(got, palette[idx])


def test_palette_png_malformed_quarantines():
    palette = np.zeros((4, 3), np.uint8)
    idx = np.zeros((3, 3), np.uint8)
    # missing PLTE chunk
    png = encode_palette_png(idx, palette, 2)
    i = png.find(b"PLTE")
    no_plte = png[: i - 4] + png[i + 4 + 12 + 8 :]  # drop len+tag+12 bytes+crc
    with pytest.raises((ValueError, IndexError)):
        decode_png_pixels(no_plte)
    # index out of palette range
    small_pal = np.zeros((2, 3), np.uint8)
    bad = encode_palette_png(np.full((2, 2), 3, np.uint8), small_pal, 8)
    with pytest.raises(ValueError, match="palette index"):
        decode_png_pixels(bad)


def test_palette_png_feeds_phash_not_quarantined():
    """The round-6 gap: palette icons/screenshots quarantined out of the
    perceptual index. A palette re-encode of an RGB image must now hash
    within the near-dup radius of the original."""
    from rustcheatersdatapipeline_spark.functions.phash import HAM_K, phash64

    rng = np.random.default_rng(99)
    coarse = rng.integers(0, 4, size=(8, 8), dtype=np.uint8)
    idx = np.repeat(np.repeat(coarse, 8, axis=0), 8, axis=1)  # 64x64, 4 colors
    palette = np.array(
        [[10, 10, 10], [90, 90, 90], [170, 170, 170], [250, 250, 250]], np.uint8
    )
    rgb = palette[idx]
    h_rgb = phash64(rgb)
    h_pal = phash64(decode_png_pixels(encode_palette_png(idx, palette, 2)))
    assert bin(h_rgb ^ h_pal).count("1") <= HAM_K


_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def encode_png_interlaced(img: np.ndarray, ftype: int = 0) -> bytes:
    """Adam7 forward transform: per-pass subimages, each filtered as its
    own scanline group, concatenated in pass order (RFC 2083 §2.6)."""
    h, w, ch = img.shape
    raw = b"".join(
        _forward_filter(np.ascontiguousarray(img[y0::dy, x0::dx]), ftype)
        for x0, y0, dx, dy in _ADAM7
        if img[y0::dy, x0::dx].size
    )
    ihdr = struct.pack(">IIBBBBB", w, h, 8, _COLOR_TYPE[ch], 0, 0, 1)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


def encode_png16(img16: np.ndarray, ftype: int = 0) -> bytes:
    """16-bit PNG (network byte order): hi/lo bytes interleaved into a
    2x-wide byte image so the same forward filters apply (bpp = 2·ch)."""
    h, w, ch = img16.shape
    b = np.zeros((h, w, 2 * ch), np.uint8)
    b[..., 0::2] = (img16 >> 8).astype(np.uint8)
    b[..., 1::2] = (img16 & 0xFF).astype(np.uint8)
    ihdr = struct.pack(">IIBBBBB", w, h, 16, _COLOR_TYPE[ch], 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(_forward_filter(b, ftype)))
        + _chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("ch", [1, 2, 3, 4])
@pytest.mark.parametrize("ftype", [0, 4])
def test_adam7_roundtrip(ch, ftype):
    img = _gradient(13, 11, ch, seed=ch * 10 + ftype)
    got = decode_png_pixels(encode_png_interlaced(img, ftype))
    assert np.array_equal(got, img)


@given(
    h=st.integers(1, 17),
    w=st.integers(1, 17),
    ch=st.sampled_from([1, 2, 3, 4]),
    ftype=st.integers(0, 4),
    seed=st.integers(0, 2**16),
)
@settings(max_examples=40, deadline=None)
def test_adam7_roundtrip_property(h, w, ch, ftype, seed):
    """Any dimensions — including ones where whole passes are empty
    (w or h < pass offsets)."""
    img = _gradient(h, w, ch, seed=seed)
    assert np.array_equal(decode_png_pixels(encode_png_interlaced(img, ftype)), img)


def encode_palette_png_interlaced(
    idx: np.ndarray, palette: np.ndarray, depth: int = 8, ftype: int = 0
) -> bytes:
    h, w = idx.shape
    parts = []
    for x0, y0, dx, dy in _ADAM7:
        sub = idx[y0::dy, x0::dx]
        if sub.size == 0:
            continue
        hp, wp = sub.shape
        if depth == 8:
            packed = sub.astype(np.uint8)
        else:
            bits = (
                (sub[:, :, None].astype(np.uint8) >> np.arange(depth - 1, -1, -1)) & 1
            ).reshape(hp, -1)
            pad = ((wp * depth + 7) // 8) * 8 - bits.shape[1]
            if pad:
                bits = np.concatenate([bits, np.zeros((hp, pad), np.uint8)], axis=1)
            packed = np.packbits(bits, axis=1)
        parts.append(_forward_filter(packed[:, :, None], ftype))
    ihdr = struct.pack(">IIBBBBB", w, h, depth, 3, 0, 0, 1)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"PLTE", palette.astype(np.uint8).tobytes())
        + _chunk(b"IDAT", zlib.compress(b"".join(parts)))
        + _chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("depth", [1, 2, 4, 8])
def test_adam7_palette_roundtrip(depth):
    rng = np.random.default_rng(depth)
    n = 1 << depth
    palette = rng.integers(0, 256, size=(n, 3), dtype=np.uint8)
    idx = rng.integers(0, n, size=(13, 11), dtype=np.uint8)
    got = decode_png_pixels(encode_palette_png_interlaced(idx, palette, depth))
    assert np.array_equal(got, palette[idx])


@pytest.mark.parametrize("ch", [1, 3, 4])
@pytest.mark.parametrize("ftype", [0, 3])
def test_16bit_roundtrip_high_bytes(ch, ftype):
    rng = np.random.default_rng(ch)
    img16 = rng.integers(0, 1 << 16, size=(9, 7, ch), dtype=np.uint16)
    got = decode_png_pixels(encode_png16(img16, ftype))
    assert got.shape == (9, 7, ch)
    assert np.array_equal(got, (img16 >> 8).astype(np.uint8))


def test_wav_24bit_pcm_sign_extended():
    """24-bit PCM (3-byte LE samples) decodes with exact sign
    extension — field-by-field writer, no wave-module involvement."""
    import struct as _struct

    vals = np.array([[0], [1], [-1], [8388607], [-8388608], [-4660]],
                    np.int64)
    frames = b"".join(
        int(v).to_bytes(3, "little", signed=True) for v in vals[:, 0]
    )
    fmt = _struct.pack("<HHIIHH", 1, 1, 48000, 48000 * 3, 3, 24)
    body = b"WAVE" + b"fmt " + _struct.pack("<I", len(fmt)) + fmt
    body += b"data" + _struct.pack("<I", len(frames)) + frames
    buf = b"RIFF" + _struct.pack("<I", len(body)) + body
    samples, rate = decode_wav_samples(buf)
    assert rate == 48000
    assert np.array_equal(samples[:, 0], vals[:, 0])


def encode_gray_subbyte_png(gray_idx: np.ndarray, depth: int,
                            ftype: int = 0) -> bytes:
    """Test-side color-type-0 sub-byte encoder (1/2/4-bit grayscale):
    MSB-first packing, any filter type."""
    h, w = gray_idx.shape
    stride = (w * depth + 7) // 8
    bits = (
        (gray_idx[:, :, None].astype(np.uint8)
         >> np.arange(depth - 1, -1, -1)) & 1
    ).reshape(h, -1)
    pad = stride * 8 - bits.shape[1]
    if pad:
        bits = np.concatenate([bits, np.zeros((h, pad), np.uint8)], axis=1)
    packed = np.packbits(bits, axis=1)
    raw = _forward_filter(packed[:, :, None], ftype)
    ihdr = struct.pack(">IIBBBBB", w, h, depth, 0, 0, 0, 0)
    out = b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
    return out + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b"")


@pytest.mark.parametrize("depth", [1, 2, 4])
@pytest.mark.parametrize("ftype", [0, 2])
def test_gray_subbyte_png_roundtrip(depth, ftype):
    rng = np.random.RandomState(depth * 10 + ftype)
    idx = rng.randint(0, 1 << depth, (11, 13)).astype(np.uint8)
    got = decode_png_pixels(encode_gray_subbyte_png(idx, depth, ftype))
    scale = 255 // ((1 << depth) - 1)
    assert got.shape == (11, 13, 1)
    assert np.array_equal(got[..., 0], (idx * scale).astype(np.uint8))


@pytest.mark.parametrize("depth", [1, 2, 4])
def test_gray_subbyte_png_adam7(depth):
    rng = np.random.RandomState(60 + depth)
    idx = rng.randint(0, 1 << depth, (10, 11)).astype(np.uint8)
    parts = []
    for x0, y0, dx, dy in _ADAM7:
        sub = idx[y0::dy, x0::dx]
        if sub.size == 0:
            continue
        hp, wp = sub.shape
        bits = (
            (sub[:, :, None].astype(np.uint8)
             >> np.arange(depth - 1, -1, -1)) & 1
        ).reshape(hp, -1)
        pad = ((wp * depth + 7) // 8) * 8 - bits.shape[1]
        if pad:
            bits = np.concatenate([bits, np.zeros((hp, pad), np.uint8)],
                                  axis=1)
        parts.append(_forward_filter(np.packbits(bits, axis=1)[:, :, None], 0))
    ihdr = struct.pack(">IIBBBBB", 11, 10, depth, 0, 0, 0, 1)
    buf = (b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
           + _chunk(b"IDAT", zlib.compress(b"".join(parts)))
           + _chunk(b"IEND", b""))
    got = decode_png_pixels(buf)
    scale = 255 // ((1 << depth) - 1)
    assert np.array_equal(got[..., 0], (idx * scale).astype(np.uint8))
