"""MP4 container parsing (functions/mp4.py): the oracle is a test-side
spec-exact WRITER (ISO/IEC 14496-12 box layout — ftyp/mdat/moov with
mvhd, trak/tkhd/mdia/mdhd/hdlr/minf/stbl and full sample tables) — the
parser must recover the planted metadata, resolve sync samples to the
exact payload byte ranges across multi-run stsc chunking, and stay
total under mutation. Codec decode stays a named NotImplementedError
boundary, the AVI pattern."""

import struct

import numpy as np
import pytest

from rustcheatersdatapipeline_spark.functions.mp4 import (
    decode_mp4_frames,
    mp4_keyframe_ranges,
    mp4_metadata,
    parse_mp4_header,
    sample_mp4_keyframes,
)


def _box(four: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", len(payload) + 8) + four + payload


def _full(four: bytes, payload: bytes, version: int = 0) -> bytes:
    return _box(four, bytes([version]) + b"\x00\x00\x00" + payload)


def _u32(*vals: int) -> bytes:
    return b"".join(struct.pack(">I", v) for v in vals)


def _visual_entry(codec: bytes, w: int, h: int) -> bytes:
    body = (
        bytes(6) + struct.pack(">H", 1)          # reserved + data_ref_index
        + bytes(16)                               # pre_defined/reserved
        + struct.pack(">HH", w, h)                # width, height
        + _u32(0x00480000, 0x00480000, 0)         # resolutions + reserved
        + struct.pack(">H", 1)                    # frame_count
        + bytes(32)                               # compressorname
        + struct.pack(">Hh", 24, -1)              # depth, pre_defined
    )
    return _box(codec, body)


def make_mp4(
    samples: list[bytes],
    sync: list[int],
    w: int = 64,
    h: int = 48,
    timescale: int = 600,
    sample_delta: int = 25,
    codec: bytes = b"avc1",
    chunking: list[int] | None = None,
    with_stss: bool = True,
) -> bytes:
    """Minimal but spec-exact MP4: ftyp + mdat (samples laid out per
    ``chunking``) + moov with complete sample tables."""
    chunking = chunking or [len(samples)]
    assert sum(chunking) == len(samples)
    ftyp = _box(b"ftyp", b"isom" + _u32(0x200) + b"isommp41")
    body = b"".join(samples)
    mdat = _box(b"mdat", body)
    mdat_body = len(ftyp) + 8  # absolute offset of the first sample

    # chunk offsets: cumulative over the chunking pattern
    offsets, pos, si = [], mdat_body, 0
    for n_in_chunk in chunking:
        offsets.append(pos)
        pos += sum(len(samples[si + j]) for j in range(n_in_chunk))
        si += n_in_chunk
    # stsc runs: collapse equal consecutive samples-per-chunk
    runs = []
    for ci, n_in_chunk in enumerate(chunking, start=1):
        if not runs or runs[-1][1] != n_in_chunk:
            runs.append((ci, n_in_chunk))

    n = len(samples)
    duration = n * sample_delta
    stsd = _full(b"stsd", _u32(1) + _visual_entry(codec, w, h))
    stts = _full(b"stts", _u32(1, n, sample_delta))
    stsc = _full(
        b"stsc",
        _u32(len(runs)) + b"".join(_u32(first, per, 1) for first, per in runs),
    )
    stsz = _full(b"stsz", _u32(0, n, *[len(s) for s in samples]))
    stco = _full(b"stco", _u32(len(offsets), *offsets))
    stbl_children = stsd + stts + stsc + stsz + stco
    if with_stss:
        stbl_children += _full(b"stss", _u32(len(sync), *sync))
    stbl = _box(b"stbl", stbl_children)
    vmhd = _full(b"vmhd", bytes(8), version=0)
    dref = _full(b"dref", _u32(1) + _full(b"url ", b""))
    dinf = _box(b"dinf", dref)
    minf = _box(b"minf", vmhd + dinf + stbl)
    hdlr = _full(b"hdlr", _u32(0) + b"vide" + _u32(0, 0, 0) + b"video\x00")
    mdhd = _full(
        b"mdhd", _u32(0, 0, timescale, duration) + struct.pack(">HH", 0x55C4, 0)
    )
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    tkhd = _full(
        b"tkhd",
        _u32(0, 0, 1, 0, duration) + bytes(8)
        + struct.pack(">HHHH", 0, 0, 0, 0)
        + _u32(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + _u32(w << 16, h << 16),
    )
    trak = _box(b"trak", tkhd + mdia)
    mvhd = _full(
        b"mvhd",
        _u32(0, 0, timescale, duration, 0x10000) + struct.pack(">H", 0x100)
        + bytes(10)
        + _u32(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + bytes(24) + _u32(2),
    )
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


def _samples(n: int, seed: int = 0) -> list[bytes]:
    rng = np.random.RandomState(seed)
    return [rng.bytes(20 + 7 * i) for i in range(n)]


def test_metadata_roundtrip():
    samples = _samples(8)
    buf = make_mp4(samples, sync=[1, 4, 7], w=320, h=180, timescale=600, sample_delta=30)
    meta = mp4_metadata(buf)
    assert meta["major_brand"] == "isom"
    assert meta["timescale"] == 600
    assert meta["duration_s"] == pytest.approx(8 * 30 / 600)
    (t,) = meta["tracks"]
    assert t["kind"] == "video" and t["codec"] == "avc1"
    assert (t["width"], t["height"]) == (320, 180)
    assert t["n_samples"] == 8
    assert t["sync_samples"] == [1, 4, 7]
    assert t["duration_s"] == pytest.approx(8 * 30 / 600)


def test_keyframe_ranges_exact_across_stsc_runs():
    """Sync samples resolve to the EXACT planted payload bytes even with
    a multi-run sample-to-chunk table (chunks of 3, 3, then 2)."""
    samples = _samples(8, seed=3)
    buf = make_mp4(samples, sync=[1, 3, 6, 8], chunking=[3, 3, 2])
    got = mp4_keyframe_ranges(buf)
    assert [s for s, _, _ in got] == [1, 3, 6, 8]
    for s, off, size in got:
        assert buf[off : off + size] == samples[s - 1]


def test_no_stss_means_every_sample_is_sync():
    samples = _samples(5, seed=4)
    buf = make_mp4(samples, sync=[], with_stss=False)
    got = mp4_keyframe_ranges(buf)
    assert [s for s, _, _ in got] == [1, 2, 3, 4, 5]
    for s, off, size in got:
        assert buf[off : off + size] == samples[s - 1]


def test_decode_header_covers_mp4():
    from rustcheatersdatapipeline_spark.functions.multimodal import decode_header

    buf = make_mp4(_samples(6), sync=[1, 5], w=128, h=96)
    assert parse_mp4_header(buf) == (128, 96, 6)
    assert decode_header(buf) == ("video/mp4", 128, 96, 6)


def test_codec_boundary_named():
    buf = make_mp4(_samples(3), sync=[1], codec=b"hvc1")
    with pytest.raises(NotImplementedError, match="hvc1"):
        decode_mp4_frames(buf)


def test_spark_keyframe_sampling(spark):
    samples = _samples(8, seed=9)
    rows = [
        (1, bytearray(make_mp4(samples, sync=[1, 3, 5, 7], chunking=[4, 4]))),
        (2, bytearray(b"not an mp4")),
    ]
    media = spark.createDataFrame(rows, "item_id long, payload binary")
    out = sample_mp4_keyframes(media).collect()
    assert {r["item_id"] for r in out} == {1}  # junk quarantined
    assert [r["sample"] for r in out] == [1, 3, 5, 7]
    for r in out:
        assert bytes(r["payload"]) == samples[r["sample"] - 1]
        assert r["codec"] == "avc1" and (r["width"], r["height"]) == (64, 48)
    stepped = sample_mp4_keyframes(media, step=2).collect()
    assert [r["sample"] for r in stepped] == [1, 5]


def test_mutation_totality():
    """decode_header stays total and the mp4 walkers stay inside the
    quarantine exception surface under cut/xor mutation."""
    from rustcheatersdatapipeline_spark.functions.multimodal import decode_header

    base = make_mp4(_samples(4), sync=[1, 3])
    rng = np.random.RandomState(0)
    for _ in range(300):
        buf = bytearray(base)
        i = rng.randint(0, len(buf))
        buf[i] ^= rng.randint(1, 256)
        cut = rng.randint(0, len(buf) + 1)
        payload = bytes(buf[:cut])
        decode_header(payload)  # must never raise
        for fn in (mp4_metadata, mp4_keyframe_ranges):
            try:
                fn(payload)
            except (ValueError, IndexError, NotImplementedError):
                pass


# ------------------------------------------------- fragmented (DASH/CMAF)

_NON_SYNC = 0x00010000


def _trak_empty_stbl(w: int, h: int, codec: bytes, track_id: int, timescale: int) -> bytes:
    """trak whose stbl declares ZERO samples — the fragmented layout."""
    stsd = _full(b"stsd", _u32(1) + _visual_entry(codec, w, h))
    stbl = _box(b"stbl", stsd + _full(b"stts", _u32(0)) + _full(b"stsc", _u32(0))
                + _full(b"stsz", _u32(0, 0)) + _full(b"stco", _u32(0)))
    vmhd = _full(b"vmhd", bytes(8), version=0)
    dinf = _box(b"dinf", _full(b"dref", _u32(1) + _full(b"url ", b"")))
    minf = _box(b"minf", vmhd + dinf + stbl)
    hdlr = _full(b"hdlr", _u32(0) + b"vide" + _u32(0, 0, 0) + b"video\x00")
    mdhd = _full(b"mdhd", _u32(0, 0, timescale, 0) + struct.pack(">HH", 0x55C4, 0))
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    tkhd = _full(
        b"tkhd",
        _u32(0, 0, track_id, 0, 0) + bytes(8) + struct.pack(">HHHH", 0, 0, 0, 0)
        + _u32(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + _u32(w << 16, h << 16),
    )
    return _box(b"trak", tkhd + mdia)


def make_fmp4(
    fragments: list[list[bytes]],
    sync: set[int],
    w: int = 64,
    h: int = 48,
    codec: bytes = b"avc1",
    track_id: int = 1,
    use_defaults: bool = False,
) -> bytes:
    """Fragmented MP4: empty moov sample tables, samples in
    moof/traf/trun + mdat per fragment. ``sync`` holds GLOBAL sample
    numbers (1-based). Two trun styles: per-sample sizes+flags, or
    (``use_defaults``) tfhd default size/flags with trun
    first-sample-flags — the CMAF keyframe-leads-fragment idiom (then
    ``sync`` must be exactly the first sample of each fragment and all
    samples of a fragment must share one size)."""
    ftyp = _box(b"ftyp", b"isom" + _u32(0x200) + b"isomiso5")
    moov = _box(
        b"moov",
        _full(b"mvhd", _u32(0, 0, 600, 0, 0x10000) + struct.pack(">H", 0x100)
              + bytes(10) + _u32(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
              + bytes(24) + _u32(2))
        + _trak_empty_stbl(w, h, codec, track_id, 600),
    )
    out = ftyp + moov
    sample_no = 0
    for seq, samples in enumerate(fragments, start=1):
        start_no = sample_no + 1

        def build_moof(data_offset: int) -> bytes:
            mfhd = _full(b"mfhd", _u32(seq))
            if use_defaults:
                tfhd = _box(
                    b"tfhd",
                    b"\x00\x02\x00\x30" + _u32(track_id, len(samples[0]), _NON_SYNC),
                )
                trun = _box(
                    b"trun",
                    b"\x00\x00\x00\x05" + _u32(len(samples))
                    + struct.pack(">i", data_offset) + _u32(0),  # first = sync
                )
            else:
                tfhd = _box(b"tfhd", b"\x00\x02\x00\x00" + _u32(track_id))
                body = b"\x00\x00\x06\x01" + _u32(len(samples)) + struct.pack(
                    ">i", data_offset
                )
                for i, s in enumerate(samples):
                    flags = 0 if (start_no + i) in sync else _NON_SYNC
                    body += _u32(len(s), flags)
                trun = _box(b"trun", body)
            return _box(b"moof", mfhd + _box(b"traf", tfhd + trun))

        probe = build_moof(0)
        moof = build_moof(len(probe) + 8)  # data starts after mdat header
        out += moof + _box(b"mdat", b"".join(samples))
        sample_no += len(samples)
    return out


def test_fragmented_keyframe_ranges_exact():
    samples = _samples(9, seed=12)
    frags = [samples[0:4], samples[4:7], samples[7:9]]
    sync = {1, 5, 8}
    buf = make_fmp4(frags, sync)
    got = mp4_keyframe_ranges(buf)
    assert [s for s, _, _ in got] == sorted(sync)
    for s, off, size in got:
        assert buf[off : off + size] == samples[s - 1]


def test_fragmented_cmaf_defaults_first_sample_sync():
    """tfhd default size+flags with trun first-sample-flags: the first
    sample of each fragment is the keyframe, everything else non-sync."""
    rng = np.random.RandomState(13)
    frags = [[rng.bytes(32) for _ in range(3)] for _ in range(3)]
    flat = [s for f in frags for s in f]
    buf = make_fmp4(frags, sync={1, 4, 7}, use_defaults=True)
    got = mp4_keyframe_ranges(buf)
    assert [s for s, _, _ in got] == [1, 4, 7]
    for s, off, size in got:
        assert buf[off : off + size] == flat[s - 1]


def test_fragmented_spark_sampling(spark):
    samples = _samples(6, seed=14)
    buf = make_fmp4([samples[:3], samples[3:]], sync={1, 4, 6})
    media = spark.createDataFrame(
        [(1, bytearray(buf))], "item_id long, payload binary"
    )
    out = sample_mp4_keyframes(media).collect()
    assert [r["sample"] for r in out] == [1, 4, 6]
    for r in out:
        assert bytes(r["payload"]) == samples[r["sample"] - 1]


def test_fragmented_mutation_totality():
    from rustcheatersdatapipeline_spark.functions.multimodal import decode_header

    base = make_fmp4([_samples(4, seed=15)], sync={1, 3})
    rng = np.random.RandomState(2)
    for _ in range(200):
        buf = bytearray(base)
        buf[rng.randint(0, len(buf))] ^= rng.randint(1, 256)
        payload = bytes(buf[: rng.randint(0, len(buf) + 1)])
        decode_header(payload)
        for fn in (mp4_metadata, mp4_keyframe_ranges):
            try:
                fn(payload)
            except (ValueError, IndexError, NotImplementedError):
                pass


def test_zero_first_chunk_rejected():
    """A corrupt stsc with first_chunk=0 must raise, not silently read
    the LAST chunk offset via negative indexing."""
    samples = _samples(4, seed=20)
    buf = bytearray(make_mp4(samples, sync=[1]))
    i = buf.find(b"stsc")
    # stsc body: version/flags(4) entry_count(4) first_chunk(4) ...
    buf[i + 12 : i + 16] = (0).to_bytes(4, "big")
    with pytest.raises(ValueError, match="first_chunk"):
        mp4_keyframe_ranges(bytes(buf))
