"""WebM (Matroska/EBML) VP8 demux — RFC 8794 walk + interframe decode.

The test-side muxer below builds minimal spec-shaped WebM files
(EBML header, Segment, Info, Tracks, Clusters with SimpleBlock or
BlockGroup/Block, sized and unknown-size variants) around payloads
from the independent VP8 sequence encoder, so expected pixels come
from the encoder model, not the decoder."""

import numpy as np
import pytest

import rustcheatersdatapipeline_spark.functions.vp8 as V
from rustcheatersdatapipeline_spark.functions.vp8 import yuv420_to_rgba
from rustcheatersdatapipeline_spark.functions.webm import decode_webm_frames

from tests.vp8interenc import Vp8SeqEncoder


# ------------------------------------------------------------- test muxer


def _vint(v: int, unknown: bool = False, width: int | None = None) -> bytes:
    if unknown:
        width = width or 8
        return ((1 << (7 * width)) - 1 | (1 << (7 * width))).to_bytes(
            width, "big"
        )
    n = width or 1
    while v >= (1 << (7 * n)) - 1:  # avoid the all-ones (unknown) pattern
        n += 1
    return (v | (1 << (7 * n))).to_bytes(n, "big")


def _elem(eid: int, payload: bytes, unknown_size: bool = False) -> bytes:
    idb = eid.to_bytes((eid.bit_length() + 7) // 8, "big")
    if unknown_size:
        return idb + _vint(0, unknown=True) + payload
    return idb + _vint(len(payload)) + payload


def _uintb(v: int) -> bytes:
    return v.to_bytes(max(1, (v.bit_length() + 7) // 8), "big")


def _simple_block(track: int, tc: int, frame: bytes, key: bool,
                  flags: int | None = None) -> bytes:
    f = (0x80 if key else 0x00) if flags is None else flags
    return _elem(
        0xA3,
        _vint(track) + tc.to_bytes(2, "big", signed=True) + bytes([f]) + frame,
    )


def _track_entry(number: int, codec: bytes, w: int, h: int) -> bytes:
    video = _elem(0xB0, _uintb(w)) + _elem(0xBA, _uintb(h))
    return _elem(
        0xAE,
        _elem(0xD7, _uintb(number)) + _elem(0x83, b"\x01")
        + _elem(0x86, codec) + _elem(0xE0, video),
    )


def _svint(v: int) -> bytes:
    for n in range(1, 9):
        bias = (1 << (7 * n - 1)) - 1
        if -bias <= v <= bias:
            return ((v + bias) | (1 << (7 * n))).to_bytes(n, "big")
    raise AssertionError("delta out of vint range")


def _laced_block(track, tc, frames, mode) -> bytes:
    """One SimpleBlock carrying several frames: mode 1 = Xiph,
    2 = fixed (frames must be equal length), 3 = EBML."""
    flags = 0x80 | (mode << 1)
    body = _vint(track) + tc.to_bytes(2, "big", signed=True) + bytes([flags])
    body += bytes([len(frames) - 1])
    if mode == 1:  # Xiph 255-run sizes for all but the last
        for fr in frames[:-1]:
            n = len(fr)
            body += b"\xff" * (n // 255) + bytes([n % 255])
    elif mode == 2:
        assert len({len(f) for f in frames}) == 1
    else:  # EBML: first absolute VINT, then signed deltas
        body += _vint(len(frames[0]))
        for a, b in zip(frames, frames[1:-1]):
            body += _svint(len(b) - len(a))
    body += b"".join(frames)
    return _elem(0xA3, body)


def make_webm(frames, w, h, *, codec=b"V_VP8", track=1,
              unknown_segment=False, unknown_cluster=False,
              blockgroup=False, extra_track=False, laced=False,
              lace_mode=1):
    header = _elem(
        0x1A45DFA3,
        _elem(0x4286, b"\x01") + _elem(0x4282, b"webm"),
    )
    info = _elem(_INFO := 0x1549A966, _elem(0x2AD7B1, _uintb(1000000)))
    tracks = _track_entry(track, codec, w, h)
    if extra_track:
        tracks += _track_entry(track + 1, b"A_VORBIS", 0, 0)
    tracks = _elem(0x1654AE6B, tracks)
    blocks = _elem(0xE7, b"\x00")  # cluster timecode
    if laced:
        blocks += _laced_block(track, 0, list(frames), lace_mode)
        frames = []
    for i, fr in enumerate(frames):
        key = i == 0
        if blockgroup and i % 2 == 1:
            inner = _elem(
                0xA1,
                _vint(track) + i.to_bytes(2, "big", signed=True)
                + b"\x00" + fr,
            )
            blocks += _elem(0xA0, inner)
        else:
            blocks += _simple_block(track, i, fr, key)
        if extra_track:  # interleave a foreign-track block to be skipped
            blocks += _simple_block(track + 1, i, b"\x00\x01\x02", False)
    cluster = _elem(0x1F43B675, blocks, unknown_size=unknown_cluster)
    segment = _elem(
        0x18538067, info + tracks + cluster, unknown_size=unknown_segment
    )
    return header + segment


def _sequence(seed=81, n_inter=3, h=32, w=32):
    rng = np.random.RandomState(seed)
    enc = Vp8SeqEncoder()

    def rnd(hh, ww):
        return rng.randint(0, 256, (hh, ww), np.uint8)

    payloads, expected = [], []
    p0, e0 = enc.keyframe(rnd(h, w), rnd(h // 2, w // 2), rnd(h // 2, w // 2),
                          q_index=8)
    payloads.append(p0)
    expected.append(e0)
    for i in range(n_inter):
        specs = [[{"ref": V.REF_LAST, "mode": "new",
                   "mv": ((i % 3) * 2 - 2, (i % 2) * 4 - 2)}
                  for _ in range(w // 16)] for _ in range(h // 16)]
        p, e = enc.interframe(rnd(h, w), rnd(h // 2, w // 2),
                              rnd(h // 2, w // 2), specs, q_index=10)
        payloads.append(p)
        expected.append(e)
    return payloads, expected


# ----------------------------------------------------------------- tests


def _assert_rgba(frames, expected):
    assert frames.shape[0] == len(expected)
    for got, e in zip(frames, expected):
        assert np.array_equal(got, yuv420_to_rgba(e["y"], e["u"], e["v"]))


def test_webm_vp8_track_decodes_with_interframes():
    payloads, expected = _sequence()
    frames = decode_webm_frames(make_webm(payloads, 32, 32))
    _assert_rgba(frames, expected)


def test_webm_unknown_size_segment_and_cluster():
    payloads, expected = _sequence(seed=83, n_inter=2)
    buf = make_webm(payloads, 32, 32, unknown_segment=True,
                    unknown_cluster=True)
    _assert_rgba(decode_webm_frames(buf), expected)


def test_webm_blockgroup_blocks_and_foreign_track_skipped():
    payloads, expected = _sequence(seed=85, n_inter=3)
    buf = make_webm(payloads, 32, 32, blockgroup=True, extra_track=True,
                    track=2)
    _assert_rgba(decode_webm_frames(buf), expected)


def test_webm_named_boundaries_and_errors():
    payloads, _ = _sequence(seed=87, n_inter=1)
    with pytest.raises(NotImplementedError, match="V_VP8"):
        decode_webm_frames(make_webm(payloads, 32, 32, codec=b"V_VP9"))

    with pytest.raises(ValueError, match="EBML signature"):
        decode_webm_frames(b"RIFFxxxx" + b"\x00" * 16)
    good = make_webm(payloads, 32, 32)
    with pytest.raises(ValueError):
        decode_webm_frames(good[: len(good) - 5])


def test_webm_totality_fuzz():
    payloads, _ = _sequence(seed=89, n_inter=1)
    good = make_webm(payloads, 32, 32)
    rng = np.random.RandomState(91)
    for trial in range(120):
        buf = bytearray(good)
        if trial % 3 == 0:
            buf = buf[: rng.randint(4, len(buf))]
        else:
            for _ in range(rng.randint(1, 4)):
                buf[rng.randint(0, len(buf))] = rng.randint(0, 256)
        try:
            out = decode_webm_frames(bytes(buf))
            assert out.ndim == 4
        except (ValueError, NotImplementedError):
            pass


def test_webm_through_spark_featurize(spark):
    from rustcheatersdatapipeline_spark.functions.pixels import featurize_pixels

    rows = []
    for i in range(4):
        payloads, _ = _sequence(seed=100 + i, n_inter=2)
        rows.append((i, bytearray(make_webm(payloads, 32, 32))))
    media = spark.createDataFrame(rows, "item_id long, payload binary")
    feats = {r["item_id"]: r for r in featurize_pixels(media).collect()}
    assert len(feats) == 4
    for i in range(4):
        assert feats[i]["kind"] == "video"
        assert feats[i]["mime"] == "video/webm"
        assert (feats[i]["width"], feats[i]["height"]) == (32, 32)
        assert feats[i]["n_samples"] == 3 * 32 * 32 * 4


@pytest.mark.parametrize("mode", [1, 2, 3])
def test_webm_all_lacing_modes(mode):
    """Xiph / fixed / EBML lacing: several VP8 frames in ONE
    SimpleBlock decode in order (fixed lacing pads payloads to equal
    length — trailing bytes beyond the last token partition are inert
    by construction)."""
    payloads, expected = _sequence(seed=93, n_inter=3)
    if mode == 2:
        width = max(len(p) for p in payloads)
        payloads = [p + b"\x00" * (width - len(p)) for p in payloads]
    buf = make_webm(payloads, 32, 32, laced=True, lace_mode=mode)
    _assert_rgba(decode_webm_frames(buf), expected)


def test_webm_laced_fuzz_totality():
    payloads, _ = _sequence(seed=95, n_inter=2)
    rng = np.random.RandomState(97)
    for mode in (1, 3):
        good = make_webm(payloads, 32, 32, laced=True, lace_mode=mode)
        for trial in range(60):
            buf = bytearray(good)
            if trial % 3 == 0:
                buf = buf[: rng.randint(4, len(buf))]
            else:
                for _ in range(rng.randint(1, 4)):
                    buf[rng.randint(0, len(buf))] = rng.randint(0, 256)
            try:
                out = decode_webm_frames(bytes(buf))
                assert out.ndim == 4
            except (ValueError, NotImplementedError):
                pass
