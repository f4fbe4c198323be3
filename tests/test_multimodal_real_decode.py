"""Real header decode (fake=False): featurize_media must extract true
dimensions/frame counts from genuine PNG and WAV bytes built with the
stdlib (zlib/struct for PNG, the wave module for WAV) — no codec libs.
"""

import io
import struct
import wave
import zlib

import pytest

from rustcheatersdatapipeline_spark.functions.multimodal import (
    decode_header,
    decode_pixels,
    featurize_media,
    media_table,
    parse_avi_header,
    parse_gif_header,
    parse_jpeg_header,
    parse_png_header,
    parse_wav_header,
)


def make_png(width: int, height: int) -> bytes:
    """Minimal valid grayscale PNG: signature + IHDR + IDAT + IEND."""

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + bytes(width) for _ in range(height))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def make_gif(width: int, height: int, n_frames: int) -> bytes:
    """Minimal GIF89a: 2-entry global color table, per-frame graphic
    control extension + image descriptor + one LZW sub-block."""
    out = b"GIF89a" + struct.pack("<HH", width, height) + bytes([0x80, 0, 0])
    out += b"\x00\x00\x00\xff\xff\xff"  # global color table (2 × RGB)
    for _ in range(n_frames):
        out += b"\x21\xf9\x04\x00\x00\x00\x00\x00"  # GCE extension chain
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, width, height) + b"\x00"
        out += b"\x02" + bytes([1, 0x44]) + b"\x00"  # LZW min + 1 sub-block
    return out + b"\x3b"


def make_avi(width: int, height: int, n_frames: int) -> bytes:
    """Minimal AVI: RIFF('AVI ') → LIST('hdrl') → avih main header."""
    avih = bytearray(56)
    avih[16:20] = struct.pack("<I", n_frames)
    avih[32:36] = struct.pack("<I", width)
    avih[36:40] = struct.pack("<I", height)
    avih_chunk = b"avih" + struct.pack("<I", len(avih)) + bytes(avih)
    hdrl = b"hdrl" + avih_chunk
    list_chunk = b"LIST" + struct.pack("<I", len(hdrl)) + hdrl
    return b"RIFF" + struct.pack("<I", 4 + len(list_chunk)) + b"AVI " + list_chunk


def make_wav(n_frames: int, rate: int = 8000, channels: int = 1) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(bytes(2 * channels * n_frames))
    return buf.getvalue()


def test_png_header_roundtrip():
    assert parse_png_header(make_png(640, 480)) == (640, 480)
    assert parse_png_header(make_png(1, 1)) == (1, 1)
    assert parse_png_header(b"notapng") is None
    assert parse_png_header(b"") is None


def test_gif_header_roundtrip():
    assert parse_gif_header(make_gif(320, 240, 1)) == (320, 240, 1)
    assert parse_gif_header(make_gif(12, 7, 5)) == (12, 7, 5)  # animation
    assert parse_gif_header(b"GIF89a") is None  # truncated
    assert parse_gif_header(b"JIF89a" + bytes(20)) is None


def test_gif_through_featurize(spark):
    gif = make_gif(64, 48, 7)
    df = spark.createDataFrame([(1, bytearray(gif))], "item_id long, payload binary")
    media = media_table(df, "item_id", "payload", "application/octet-stream")
    r = featurize_media(media, fake=False, frame_step=2).collect()[0]
    assert r["mime"] == "image/gif"
    assert (r["width"], r["height"], r["n_frames"]) == (64, 48, 7)
    assert r["sampled_frames"] == [0, 2, 4, 6]
    assert r["checksum"] == sum(gif)


def make_jpeg(width: int, height: int) -> bytes:
    """Minimal JPEG marker stream: SOI, APP0 (JFIF), DQT stub, SOF0
    carrying the dimensions, EOI. Not decodable image data — but a
    spec-valid marker walk, which is all a header parser may rely on."""
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    dqt = b"\xff\xdb" + struct.pack(">H", 3) + b"\x00"
    sof0 = (
        b"\xff\xc0"
        + struct.pack(">H", 11)
        + b"\x08"
        + struct.pack(">HH", height, width)
        + b"\x01\x01\x11\x00"
    )
    return b"\xff\xd8" + app0 + dqt + sof0 + b"\xff\xd9"


def test_jpeg_header_roundtrip():
    assert parse_jpeg_header(make_jpeg(800, 600)) == (800, 600)
    assert parse_jpeg_header(make_jpeg(1, 1)) == (1, 1)
    assert parse_jpeg_header(b"\xff\xd8\xff\xd9") is None  # EOI before SOF
    assert parse_jpeg_header(b"nope") is None
    assert decode_header(make_jpeg(33, 44)) == ("image/jpeg", 33, 44, 1)


def test_wav_header_roundtrip():
    ch, rate, bits, frames = parse_wav_header(make_wav(1234, rate=44100, channels=2))
    assert (ch, rate, bits, frames) == (2, 44100, 16, 1234)
    assert parse_wav_header(b"RIFFxxxxNOPE") is None
    assert parse_wav_header(b"") is None


def test_avi_header_roundtrip():
    assert parse_avi_header(make_avi(640, 360, 250)) == (640, 360, 250)
    assert parse_avi_header(b"RIFF\x00\x00\x00\x00WAVE") is None  # not AVI
    assert parse_avi_header(b"") is None
    # an AVI payload routes through decode_header as video with frames
    assert decode_header(make_avi(320, 180, 48)) == ("video/x-msvideo", 320, 180, 48)


def test_decode_header_sniffs_and_quarantines():
    assert decode_header(make_png(3, 7)) == ("image/png", 3, 7, 1)
    assert decode_header(make_wav(10)) == ("audio/wav", None, None, 10)
    assert decode_header(b"\x00garbage") == ("application/octet-stream", None, None, 0)


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HAS_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    _HAS_HYPOTHESIS = False


if _HAS_HYPOTHESIS:

    @settings(max_examples=200, deadline=None)
    @given(st.binary(max_size=512))
    def test_decoders_never_crash_on_arbitrary_bytes(buf):
        """A quarantine path only works if the parsers are total: any
        byte string must yield a tuple-or-None, never an exception."""
        for fn in (
            parse_png_header,
            parse_gif_header,
            parse_jpeg_header,
            parse_wav_header,
            parse_avi_header,
        ):
            r = fn(buf)
            assert r is None or isinstance(r, tuple)
        mime, w, h, frames = decode_header(buf)
        assert isinstance(mime, str) and frames >= 0

    @settings(max_examples=100, deadline=None)
    @given(
        st.sampled_from(["png", "gif", "jpeg", "wav", "avi"]),
        st.integers(min_value=0, max_value=400),
        st.binary(min_size=1, max_size=16),
    )
    def test_decoders_never_crash_on_truncated_or_corrupted(kind, cut, junk):
        """Truncations and splices of VALID headers — the realistic
        corruption mode — must also never escape the quarantine path."""
        full = {
            "png": make_png(31, 17),
            "gif": make_gif(31, 17, 3),
            "jpeg": make_jpeg(31, 17),
            "wav": make_wav(50),
            "avi": make_avi(31, 17, 9),
        }[kind]
        for buf in (full[: cut % (len(full) + 1)], full[: cut % (len(full) + 1)] + junk):
            mime, w, h, frames = decode_header(buf)
            assert isinstance(mime, str) and frames >= 0


def test_decode_pixels_contract():
    """Every container format decodes for real now (pixels.py, jpeg.py,
    avi.py); the NotImplementedError boundary survives only INSIDE
    payloads (non-baseline JPEG modes, compressed AVI codecs — see
    their suites). These fixtures are header-only stubs with no valid
    entropy/LZW/movi data, so they are corrupt (ValueError →
    quarantine), not codec-unsupported. Full round-trips live in
    tests/test_gif_decode.py, tests/test_jpeg_decode.py and
    tests/test_avi_decode.py."""
    px = decode_pixels(make_png(2, 2))
    assert px.shape == (2, 2, 1) and px.sum() == 0
    samples, rate = decode_pixels(make_wav(50, rate=8000))
    assert samples.shape == (50, 1) and rate == 8000
    with pytest.raises(ValueError):
        decode_pixels(make_jpeg(4, 4))
    with pytest.raises(ValueError):
        decode_pixels(make_gif(4, 4, 1))
    with pytest.raises(ValueError):
        decode_pixels(make_avi(4, 4, 1))
    with pytest.raises(NotImplementedError):
        decode_pixels(b"\x00unknown-container")


def test_featurize_media_real_decode(spark):
    png = make_png(320, 200)
    wav = make_wav(100, rate=16000)
    junk = b"\xde\xad\xbe\xef" * 5
    df = spark.createDataFrame(
        [(1, bytearray(png)), (2, bytearray(wav)), (3, bytearray(junk))],
        "item_id long, payload binary",
    )
    media = media_table(df, "item_id", "payload", mime="application/octet-stream")
    out = {
        r["item_id"]: r
        for r in featurize_media(media, fake=False, frame_step=3).collect()
    }
    assert out[1]["mime"] == "image/png"
    assert (out[1]["width"], out[1]["height"], out[1]["n_frames"]) == (320, 200, 1)
    assert out[1]["checksum"] == sum(png) and out[1]["n_bytes"] == len(png)
    assert out[1]["sampled_frames"] == [0]

    assert out[2]["mime"] == "audio/wav"
    assert out[2]["width"] is None and out[2]["height"] is None
    assert out[2]["n_frames"] == 100
    # frame sampling capped at MAX_SAMPLED_FRAMES indices
    assert out[2]["sampled_frames"] == list(range(0, 100, 3))[:16]
    assert out[2]["checksum"] == sum(wav)

    assert out[3]["mime"] == "application/octet-stream"
    assert out[3]["n_frames"] == 0 and out[3]["sampled_frames"] == []


def make_mp3(
    n_frames: int,
    mpeg1: bool = True,
    layer: int = 3,
    br_idx: int = 9,
    sr_idx: int = 0,
    mono: bool = False,
    id3v2: bytes | None = None,
    id3v1: bool = False,
) -> bytes:
    """Spec-exact MPEG audio frame stream: each frame is a valid 4-byte
    header followed by zero payload bytes of the computed frame size
    (ISO 11172-3 frame-length formula), optionally wrapped in ID3 tags."""
    version = 3 if mpeg1 else 2
    layer_code = 4 - layer
    b1 = 0xFF
    b2 = 0xE0 | (version << 3) | (layer_code << 1) | 1  # no CRC
    b3 = (br_idx << 4) | (sr_idx << 2)  # no padding
    b4 = (0x3 << 6) if mono else 0x00  # stereo = 00, mono = 11
    from rustcheatersdatapipeline_spark.functions.multimodal import _mp3_frame

    hdr = bytes([b1, b2, b3, b4])
    size, _, _, _ = _mp3_frame(hdr, 0)
    frame = hdr + bytes(size - 4)
    out = b"".join([frame] * n_frames)
    if id3v2 is not None:
        sz = len(id3v2)
        syncsafe = bytes(
            [(sz >> 21) & 0x7F, (sz >> 14) & 0x7F, (sz >> 7) & 0x7F, sz & 0x7F]
        )
        out = b"ID3\x04\x00\x00" + syncsafe + id3v2 + out
    if id3v1:
        out += b"TAG" + bytes(125)
    return out


def test_mp3_header_roundtrip():
    from rustcheatersdatapipeline_spark.functions.multimodal import parse_mp3_header

    # MPEG1 Layer III, 128 kbps, 44100 Hz, stereo
    buf = make_mp3(30)
    ch, rate, frames, dur = parse_mp3_header(buf)
    assert (ch, rate, frames) == (2, 44100, 30)
    assert dur == pytest.approx(30 * 1152 / 44100)
    # ID3v2 prefix + ID3v1 trailer skipped; mono MPEG2 (576 samples/frame)
    buf2 = make_mp3(12, mpeg1=False, sr_idx=1, mono=True, id3v2=b"x" * 300, id3v1=True)
    ch2, rate2, frames2, dur2 = parse_mp3_header(buf2)
    assert (ch2, rate2, frames2) == (1, 24000, 12)
    assert dur2 == pytest.approx(12 * 576 / 24000)
    # a lone sync bigram in junk must NOT sniff as mp3 (2-frame floor)
    assert parse_mp3_header(b"\xff\xfb\x90\x00" + bytes(50)) is None
    assert parse_mp3_header(b"random bytes") is None
    assert decode_header(make_mp3(7)) == ("audio/mpeg", None, None, 7)


def test_mp3_layer1_and_vbr_frame_walk():
    from rustcheatersdatapipeline_spark.functions.multimodal import parse_mp3_header

    # Layer I frame-size formula differs ((12*br/rate + pad)*4)
    l1 = make_mp3(10, layer=1, br_idx=5)
    ch, rate, frames, _ = parse_mp3_header(l1)
    assert (ch, rate, frames) == (2, 44100, 10)
    # VBR: frames at different bitrates still walk exactly
    vbr = make_mp3(5, br_idx=3) + make_mp3(5, br_idx=12)
    assert parse_mp3_header(vbr)[2] == 10


def test_mp3_parser_total_under_mutation():
    import numpy as np

    from rustcheatersdatapipeline_spark.functions.multimodal import parse_mp3_header

    base = make_mp3(8, id3v2=b"t" * 40, id3v1=True)
    rng = np.random.RandomState(1)
    for _ in range(300):
        buf = bytearray(base)
        buf[rng.randint(0, len(buf))] ^= rng.randint(1, 256)
        cut = rng.randint(0, len(buf) + 1)
        r = parse_mp3_header(bytes(buf[:cut]))
        assert r is None or isinstance(r, tuple)


def make_ogg(codec: str, channels: int = 2, rate: int = 44100,
             granules: list[int] = (0, 44100)) -> bytes:
    """Minimal Ogg pages: identification header page + data pages whose
    last granule position encodes the duration (RFC 3533 framing)."""

    def page(granule: int, payload: bytes, seq: int, first: bool = False) -> bytes:
        segs = []
        rest = len(payload)
        while rest >= 255:
            segs.append(255)
            rest -= 255
        segs.append(rest)
        hdr = (
            b"OggS" + bytes([0, 2 if first else 0])
            + granule.to_bytes(8, "little", signed=True)
            + (1).to_bytes(4, "little") + seq.to_bytes(4, "little")
            + bytes(4) + bytes([len(segs)]) + bytes(segs)
        )
        return hdr + payload

    if codec == "opus":
        ident = (
            b"OpusHead" + bytes([1, channels]) + (312).to_bytes(2, "little")
            + (48000).to_bytes(4, "little") + bytes(3)
        )
    else:
        ident = (
            b"\x01vorbis" + bytes(4) + bytes([channels])
            + rate.to_bytes(4, "little") + bytes(14)
        )
    out = page(0, ident, 0, first=True)
    for i, g in enumerate(granules, start=1):
        out += page(g, b"\x00" * 10, i)
    return out


def test_ogg_header_roundtrip():
    from rustcheatersdatapipeline_spark.functions.multimodal import parse_ogg_header

    vorbis = make_ogg("vorbis", channels=2, rate=44100, granules=[22050, 88200])
    codec, ch, rate, dur = parse_ogg_header(vorbis)
    assert (codec, ch, rate) == ("vorbis", 2, 44100)
    assert dur == pytest.approx(2.0)
    opus = make_ogg("opus", channels=1, granules=[48000 + 312])
    codec, ch, rate, dur = parse_ogg_header(opus)
    assert (codec, ch, rate) == ("opus", 1, 48000)
    assert dur == pytest.approx(1.0)  # pre-skip removed
    assert decode_header(vorbis)[0] == "audio/ogg"
    assert parse_ogg_header(b"OggSjunk") is None
    # totality under mutation
    import numpy as np

    rng = np.random.RandomState(3)
    for _ in range(200):
        buf = bytearray(vorbis)
        buf[rng.randint(0, len(buf))] ^= rng.randint(1, 256)
        r = parse_ogg_header(bytes(buf[: rng.randint(0, len(buf) + 1)]))
        assert r is None or isinstance(r, tuple)
