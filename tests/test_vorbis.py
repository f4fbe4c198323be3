"""Ogg Vorbis decoder — differential tests against the independent
test encoder/model in ``tests/vorbisenc.py`` (same discipline as
mp3enc/vp8enc: shared codeword-assignment + dB table DATA, separately
written math — the model IMDCT is the literal O(n^2) cosine sum, the
engine's is an FFT factorization), plus the spec's worked codeword
example, Ogg CRC checks, named boundaries, and totality fuzzing."""

from __future__ import annotations

import numpy as np
import pytest

from rustcheatersdatapipeline_spark.functions import vorbis as V
from rustcheatersdatapipeline_spark.functions.vorbis import decode_vorbis_samples
from tests.vorbisenc import (
    Book,
    VorbisStream,
    expected_pcm,
    fixed_book,
    model_floor_curve,
)


def _vec_entry(a, b):
    return (a + 2) * 4 + (b + 2)


def _simple_stream(channels=1, bs=(64, 64), coupling=(), rtype=1,
                   modes=None, floor=None):
    floor_book = fixed_book(3)
    classbook = fixed_book(2, dims=2)
    mults = []
    for e in range(16):
        mults += [e // 4, e % 4]
    value_book = Book(2, [4] * 16, lookup=2, mults=mults, minimum=-2.0,
                      delta=1.0, value_bits=3)
    floor = floor or {
        "partitions": 1, "class_list": [0],
        "classes": [{"dim": 2, "subclass": 0, "masterbook": None,
                     "books": [0]}],
        "multiplier": 1, "rangebits": 5, "xs": [0, 32, 8, 20],
    }
    end = (max(bs) // 2) * (channels if rtype == 2 else 1)
    residue = {"type": rtype, "begin": 0, "end": end, "psize": 4,
               "classifications": 2, "classbook": 1,
               "books": [[None] * 8, [2] + [None] * 7]}
    return VorbisStream(
        rate=8000, channels=channels, bs=bs,
        books=[floor_book, classbook, value_book],
        floor=floor, residue=residue, coupling=list(coupling),
        modes=modes or [{"blockflag": 0}],
    )


def _mono_frame(st, rng, ys=None):
    """Random mono short-block frame + its model spectrum."""
    n2 = st.bs[0] // 2
    nparts = n2 // 4
    classes = [int(c) for c in rng.integers(0, 2, nparts)]
    vectors = []
    v = np.zeros(n2)
    for part in range(nparts):
        if not classes[part]:
            continue
        for i in (0, 2):
            a, b = int(rng.integers(-2, 2)), int(rng.integers(-2, 2))
            vectors.append((0, part, _vec_entry(a, b)))
            v[part * 4 + i] += a
            v[part * 4 + i + 1] += b
    ys = ys or [int(rng.integers(40, 200)), int(rng.integers(40, 200)),
                int(rng.integers(0, 8)), int(rng.integers(0, 8))]
    frame = {"mode": 0, "floors": [ys], "classes": [classes],
             "vectors": [vectors]}
    spec = (v * model_floor_curve(st.floor, ys, n2))[None, :]
    return frame, spec


def _roundtrip(st, frames, spectra):
    buf = st.encode(frames)
    got, rate = decode_vorbis_samples(buf)
    want = expected_pcm(st, frames, spectra)
    w16 = np.clip(np.rint(want * 32767.0), -32768, 32767)
    assert got.shape == w16.shape
    assert rate == st.rate
    assert np.max(np.abs(got.astype(np.int64) - w16.astype(np.int64))) <= 1
    return got, buf


# ------------------------------------------------------------ primitives


def test_codeword_assignment_matches_spec_worked_example():
    """Vorbis I spec 3.2.1's eight-entry example, verbatim."""
    dec = V.assign_codewords([2, 4, 4, 4, 4, 2, 3, 3])
    assert dec == {"00": 0, "0100": 1, "0101": 2, "0110": 3,
                   "0111": 4, "10": 5, "110": 6, "111": 7}


def test_codeword_assignment_rejects_oversubscribed():
    with pytest.raises(ValueError, match="over-subscribed"):
        V.assign_codewords([1, 1, 1])


def test_imdct_fft_equals_direct_cosine_sum():
    rng = np.random.default_rng(3)
    for n in (64, 128, 2048):
        x = rng.normal(size=n // 2)
        j = np.arange(n)[:, None]
        k = np.arange(n // 2)[None, :]
        direct = np.cos(2 * np.pi / n * (j + 0.5 + n / 4.0) * (k + 0.5)) @ x
        assert np.abs(V._imdct(x, n) - direct).max() < 1e-9


def test_float32_pack_unpack():
    from tests.vorbisenc import pack_float32

    for x in (0.0, 1.0, -1.0, 0.5, -2.0, 255.0, 1.0 / 1024):
        assert V._float32_unpack(pack_float32(x)) == x


def test_inverse_db_table_endpoints_and_ratio():
    t = V.FLOOR1_INVERSE_DB
    assert t[255] == 1.0
    assert abs(t[0] - 1.0649863e-07) < 2e-13
    ratios = t[1:] / t[:-1]
    assert np.allclose(ratios, ratios[0], rtol=1e-6)


# ------------------------------------------------------------ round trips


def test_mono_roundtrip_residue_type1():
    st = _simple_stream()
    rng = np.random.default_rng(11)
    frames, spectra = zip(*[_mono_frame(st, rng) for _ in range(4)])
    got, _ = _roundtrip(st, list(frames), list(spectra))
    assert np.any(got)


def test_mono_roundtrip_residue_type0_interleaved_spread():
    """Type 0 spreads each codebook vector with stride psize/dims —
    the layout that differs from type 1."""
    st = _simple_stream(rtype=0)
    rng = np.random.default_rng(5)
    n2 = 32
    classes = [1, 0, 1, 1, 0, 1, 0, 1]
    vectors, v = [], np.zeros(n2)
    for part in range(8):
        if not classes[part]:
            continue
        for i in (0, 1):  # psize/dims = 2 vectors, stride 2
            a, b = int(rng.integers(-2, 2)), int(rng.integers(-2, 2))
            vectors.append((0, part, _vec_entry(a, b)))
            v[part * 4 + i] += a
            v[part * 4 + i + 2] += b
    ys = [90, 130, 3, 6]
    frame = {"mode": 0, "floors": [ys], "classes": [classes],
             "vectors": [vectors]}
    spec = (v * model_floor_curve(st.floor, ys, n2))[None, :]
    _roundtrip(st, [frame] * 3, [spec] * 3)


def test_stereo_coupling_type2_and_window_transitions():
    st = _simple_stream(channels=2, bs=(64, 256), coupling=[(0, 1)],
                        rtype=2,
                        modes=[{"blockflag": 0}, {"blockflag": 1}])
    rng = np.random.default_rng(7)

    def make(mode, pl, nl):
        n = 256 if mode else 64
        n2 = n // 2
        nparts = n2 * 2 // 4
        classes = [int(c) for c in rng.integers(0, 2, nparts)]
        vectors, v = [], np.zeros(n2 * 2)
        for part in range(nparts):
            if not classes[part]:
                continue
            for i in (0, 2):
                a, b = int(rng.integers(-2, 2)), int(rng.integers(-2, 2))
                vectors.append((0, part, _vec_entry(a, b)))
                v[part * 4 + i] += a
                v[part * 4 + i + 1] += b
        ys = [int(rng.integers(60, 140)), int(rng.integers(60, 140)),
              int(rng.integers(0, 8)), int(rng.integers(0, 8))]
        f = {"mode": mode, "prev_long": pl, "next_long": nl,
             "floors": [ys, ys], "classes": [classes], "vectors": [vectors]}
        mag, ang = v[0::2].copy(), v[1::2].copy()
        M, A = mag.copy(), ang.copy()
        for i in range(n2):
            m, a = mag[i], ang[i]
            if m > 0:
                M[i], A[i] = (m, m - a) if a > 0 else (m + a, m)
            else:
                M[i], A[i] = (m, m + a) if a > 0 else (m - a, m)
        curve = model_floor_curve(st.floor, ys, n2)
        return f, np.stack([M * curve, A * curve])

    seq = [(0, 1, 1), (1, 0, 1), (1, 1, 1), (1, 1, 0), (0, 1, 1), (0, 1, 1)]
    frames, spectra = zip(*[make(m, p, x) for m, p, x in seq])
    got, _ = _roundtrip(st, list(frames), list(spectra))
    assert got.shape[1] == 2 and np.any(got)


def test_floor_subclass_masterbook_path():
    """A floor class with subclass bits: the per-dimension book is
    selected by a masterbook-decoded class value."""
    floor_book = fixed_book(3)          # book 0: values 0..7
    master = fixed_book(2)              # book 1: cval 0..3
    alt_book = fixed_book(4)            # book 2: values 0..15
    classbook = fixed_book(2, dims=2)   # book 3
    mults = []
    for e in range(16):
        mults += [e // 4, e % 4]
    value_book = Book(2, [4] * 16, lookup=2, mults=mults, minimum=-2.0,
                      delta=1.0, value_bits=3)  # book 4
    floor = {"partitions": 1, "class_list": [0],
             "classes": [{"dim": 2, "subclass": 1, "masterbook": 1,
                          "books": [0, 2]}],
             "multiplier": 2, "rangebits": 5, "xs": [0, 32, 8, 20]}
    residue = {"type": 1, "begin": 0, "end": 32, "psize": 4,
               "classifications": 2, "classbook": 3,
               "books": [[None] * 8, [4] + [None] * 7]}
    st = VorbisStream(rate=8000, channels=1, bs=(64, 64),
                      books=[floor_book, master, alt_book, classbook,
                             value_book],
                      floor=floor, residue=residue)

    # encode by hand: cval = 0b01 -> dim0 uses books[1]=alt(4 bits),
    # dim1 uses books[0]=floor_book(3 bits)
    from tests.vorbisenc import BitWriter

    def packet(ys, classes, vectors):
        bw = BitWriter()
        bw.w(0, 1)
        bw.w(1, 1)          # floor nonzero
        bw.w(ys[0], 7)      # multiplier 2 -> range 128 -> 7 bits
        bw.w(ys[1], 7)
        bw.code(master.codes[0b01])
        bw.code(alt_book.codes[ys[2]])    # cval & 1 = 1 -> books[1]
        bw.code(floor_book.codes[ys[3]])  # cval >> 1 = 0 -> books[0]
        nparts = 8
        for p in range(8):
            pc = 0
            while pc < nparts:
                if p == 0:
                    temp = 0
                    for i in range(2):
                        temp = temp * 2 + classes[pc + i]
                    bw.code(classbook.codes[temp])
                for _ in range(2):
                    if pc >= nparts:
                        break
                    if classes[pc]:
                        for pass_, part, entry in vectors:
                            if pass_ == p and part == pc:
                                bw.code(value_book.codes[entry])
                    pc += 1
        return bw.bytes()

    rng = np.random.default_rng(13)
    ys = [60, 80, 9, 4]
    classes = [1, 0, 0, 1, 0, 0, 1, 0]
    vectors, v = [], np.zeros(32)
    for part in (0, 3, 6):
        for i in (0, 2):
            a, b = int(rng.integers(-2, 2)), int(rng.integers(-2, 2))
            vectors.append((0, part, _vec_entry(a, b)))
            v[part * 4 + i] += a
            v[part * 4 + i + 1] += b
    pkt = packet(ys, classes, vectors)
    out = bytearray()
    out += st._page([st._ident()], 0, 0, header_type=0x02)
    out += st._page([st._comment(), st._setup()], 1, 0)
    out += st._page([pkt], 2, -1)
    out += st._page([pkt], 3, 32, header_type=0x04)
    got, rate = decode_vorbis_samples(bytes(out))
    spec = (v * model_floor_curve(floor, ys, 32))[None, :]
    want = expected_pcm(st, [{"mode": 0}] * 2, [spec, spec])
    w16 = np.clip(np.rint(want * 32767.0), -32768, 32767)
    assert got.shape == w16.shape == (32, 1)
    assert np.max(np.abs(got.astype(np.int64) - w16.astype(np.int64))) <= 1


def test_unused_floor_channel_is_silent():
    st = _simple_stream(channels=2, rtype=1)
    rng = np.random.default_rng(17)
    f, spec = _mono_frame(st, rng)
    frame = {"mode": 0, "floors": [f["floors"][0], None],
             "classes": [f["classes"][0], None],
             "vectors": [f["vectors"][0]]}
    spec2 = np.vstack([spec, np.zeros_like(spec)])
    got, _ = _roundtrip(st, [frame] * 3, [spec2] * 3)
    assert np.any(got[:, 0]) and not np.any(got[:, 1])


def test_granule_position_truncates_tail():
    st = _simple_stream()
    rng = np.random.default_rng(19)
    frames, spectra = zip(*[_mono_frame(st, rng) for _ in range(4)])
    buf = bytearray(st.encode(list(frames)))
    # rewrite the last page's granule from 96 to 80 (trim 16 samples)
    i = buf.rfind(b"OggS")
    buf[i + 6 : i + 14] = (80).to_bytes(8, "little", signed=True)
    page = bytearray(buf[i:])
    page[22:26] = b"\x00\x00\x00\x00"
    buf[i + 22 : i + 26] = V._ogg_crc(bytes(page)).to_bytes(4, "little")
    got, _ = decode_vorbis_samples(bytes(buf))
    assert got.shape == (80, 1)


# ------------------------------------------------------------- boundaries


def test_floor0_lsp_roundtrip():
    """Floor type 0 (legacy LSP): bark-mapped line-spectral-pair curve,
    coefficients VQ-decoded with the running ``last`` accumulator —
    differential against an independently written LSP model."""
    from tests.vorbisenc import model_floor0_curve

    classbook = fixed_book(2, dims=2)                    # book 0
    mults = []
    for e in range(16):
        mults += [e // 4, e % 4]
    value_book = Book(2, [4] * 16, lookup=2, mults=mults, minimum=-2.0,
                      delta=1.0, value_bits=3)           # book 1
    # LSP coefficient book: dims 2, lookup 2, values in [0.0, 0.75]
    lsp_mults = []
    for e in range(16):
        lsp_mults += [e // 4, e % 4]
    lsp_book = Book(2, [4] * 16, lookup=2, mults=lsp_mults, minimum=0.0,
                    delta=0.25, value_bits=3)            # book 2
    floor = {"type": 0, "order": 4, "rate": 8000, "bark_map_size": 32,
             "amplitude_bits": 6, "amplitude_offset": 20, "books": [2]}
    residue = {"type": 1, "begin": 0, "end": 32, "psize": 4,
               "classifications": 2, "classbook": 0,
               "books": [[None] * 8, [1] + [None] * 7]}
    st = VorbisStream(rate=8000, channels=1, bs=(64, 64),
                      books=[classbook, value_book, lsp_book],
                      floor=floor, residue=residue)

    rng = np.random.default_rng(43)
    classes = [1, 0, 1, 0, 1, 0, 1, 1]
    vectors, v = [], np.zeros(32)
    for part in range(8):
        if not classes[part]:
            continue
        for i in (0, 2):
            a, b = int(rng.integers(-2, 2)), int(rng.integers(-2, 2))
            vectors.append((0, part, _vec_entry(a, b)))
            v[part * 4 + i] += a
            v[part * 4 + i + 1] += b
    # LSP entries: two dims-2 vectors cover order 4; the decoder adds
    # the PREVIOUS vector's final scalar to every element of the next
    # vector (spec 6.2.2), not a running within-vector sum
    entries = [6, 9]  # vectors (0.25, 0.50) then (0.50, 0.25)
    c0, c1 = lsp_book.vector_of(6)
    c2, c3 = lsp_book.vector_of(9)
    coeffs = [c0, c1, c2 + c1, c3 + c1]
    amplitude = 40
    frame = {"mode": 0,
             "floors": [{"amplitude": amplitude, "entries": entries}],
             "classes": [classes], "vectors": [vectors]}
    curve = model_floor0_curve(floor, amplitude, coeffs, 32)
    spec = (v * curve)[None, :]
    got, _ = _roundtrip(st, [frame] * 3, [spec] * 3)
    assert np.any(got)


def test_floor0_zero_amplitude_is_silent_channel():
    from tests.vorbisenc import model_floor0_curve  # noqa: F401

    classbook = fixed_book(2, dims=2)
    lsp_book = Book(2, [4] * 16, lookup=2,
                    mults=[x for e in range(16) for x in (e // 4, e % 4)],
                    minimum=0.0, delta=0.25, value_bits=3)
    floor = {"type": 0, "order": 4, "rate": 8000, "bark_map_size": 32,
             "amplitude_bits": 6, "amplitude_offset": 20, "books": [1]}
    residue = {"type": 1, "begin": 0, "end": 32, "psize": 4,
               "classifications": 2, "classbook": 0,
               "books": [[None] * 8, [None] * 8]}
    st = VorbisStream(rate=8000, channels=1, bs=(64, 64),
                      books=[classbook, lsp_book],
                      floor=floor, residue=residue)
    frame = {"mode": 0, "floors": [None], "classes": [None], "vectors": []}
    got, _ = _roundtrip(st, [frame] * 3,
                        [np.zeros((1, 32))] * 3)
    assert not np.any(got)


def test_crc_mismatch_raises():
    st = _simple_stream()
    rng = np.random.default_rng(23)
    frames, spectra = zip(*[_mono_frame(st, rng) for _ in range(2)])
    buf = bytearray(st.encode(list(frames)))
    buf[-1] ^= 0x40  # flip a bit in the last page body
    with pytest.raises(ValueError, match="CRC"):
        decode_vorbis_samples(bytes(buf))


def test_totality_under_mutation_and_truncation():
    """Arbitrary corruption never escapes the quarantine contract."""
    st = _simple_stream(channels=2, bs=(64, 256), coupling=[(0, 1)],
                        rtype=2,
                        modes=[{"blockflag": 0}, {"blockflag": 1}])
    rng = np.random.default_rng(29)
    n2 = 32
    classes = [int(c) for c in rng.integers(0, 2, 16)]
    vectors = []
    for part in range(16):
        if classes[part]:
            vectors += [(0, part, 5), (0, part, 9)]
    frame = {"mode": 0, "floors": [[90, 110, 2, 5]] * 2,
             "classes": [classes], "vectors": [vectors]}
    base = st.encode([frame] * 3)
    for trial in range(120):
        buf = bytearray(base)
        for _ in range(rng.integers(1, 4)):
            buf[rng.integers(0, len(buf))] ^= 1 << rng.integers(0, 8)
        try:
            decode_vorbis_samples(bytes(buf))
        except (ValueError, NotImplementedError):
            pass  # exactly the DECODE_QUARANTINE surface — nothing else
    for cut in range(0, len(base), 37):
        try:
            decode_vorbis_samples(base[:cut])
        except (ValueError, NotImplementedError):
            pass


# ------------------------------------------------------------ integration


def test_wired_into_shared_audio_dispatch():
    from rustcheatersdatapipeline_spark.functions.audio import (
        audio_features,
        decode_audio_samples,
    )

    st = _simple_stream()
    rng = np.random.default_rng(31)
    frames, spectra = zip(*[_mono_frame(st, rng) for _ in range(6)])
    buf = st.encode(list(frames))
    samples, rate, bits = decode_audio_samples(buf)
    assert rate == 8000 and bits == 16 and samples.shape[1] == 1
    feats = audio_features(samples, rate, bits)
    assert feats["n_samples"] == samples.shape[0]


def test_decode_media_routes_ogg_vorbis():
    from rustcheatersdatapipeline_spark.functions.pixels import decode_media

    st = _simple_stream()
    rng = np.random.default_rng(37)
    frames, _ = zip(*[_mono_frame(st, rng) for _ in range(4)])
    out = decode_media(st.encode(list(frames)))
    assert out["mime"] == "audio/ogg" and out["kind"] == "audio"
    assert out["n_samples"] == 96 and out["channels"] == 1


def _webm_wrap(header_packets, audio_packets, codec=b"A_VORBIS",
               track_num=1):
    """Minimal WebM: Tracks{audio TrackEntry + Xiph-laced CodecPrivate}
    + one Cluster of SimpleBlocks (hand EBML, golden-vector style)."""
    def el(eid, body):
        if len(body) < 127:
            return eid + bytes((0x80 | len(body),)) + body
        assert len(body) < (1 << 14)
        return eid + bytes((0x40 | (len(body) >> 8), len(body) & 0xFF)) + body

    lace = bytes((len(header_packets) - 1,))
    for pkt in header_packets[:-1]:
        q, r = divmod(len(pkt), 255)
        lace += bytes([255] * q + [r])
    private = lace + b"".join(header_packets)
    entry = el(b"\xae",
               el(b"\xd7", bytes((track_num,)))
               + el(b"\x83", b"\x02")        # audio
               + el(b"\x86", codec)
               + el(b"\x63\xa2", private))
    tracks = el(b"\x16\x54\xae\x6b", entry)
    blocks = b"".join(
        el(b"\xa3", bytes((0x80 | track_num,)) + b"\x00\x00" + b"\x80" + pkt)
        for pkt in audio_packets
    )
    cluster = el(b"\x1f\x43\xb6\x75", el(b"\xe7", b"\x00") + blocks)
    segment = el(b"\x18\x53\x80\x67", tracks + cluster)
    return el(b"\x1a\x45\xdf\xa3", b"") + segment


def test_webm_vorbis_audio_matches_ogg_path():
    """The same Vorbis packets through the WebM (Xiph-laced
    CodecPrivate) path and the Ogg path must produce identical PCM,
    modulo the Ogg granule trim (absent in WebM)."""
    from rustcheatersdatapipeline_spark.functions.webm import decode_webm_audio

    st = _simple_stream()
    rng = np.random.default_rng(41)
    frames, _ = zip(*[_mono_frame(st, rng) for _ in range(5)])
    frames = list(frames)
    ogg_got, _ = decode_vorbis_samples(st.encode(frames))
    headers = [st._ident(), st._comment(), st._setup()]
    audio = [st.audio_packet(f) for f in frames]
    webm_got, rate = decode_webm_audio(_webm_wrap(headers, audio))
    assert rate == 8000
    assert np.array_equal(webm_got, ogg_got)

    from rustcheatersdatapipeline_spark.functions.audio import decode_audio_samples

    s2, r2, bits = decode_audio_samples(_webm_wrap(headers, audio))
    assert np.array_equal(s2, ogg_got) and r2 == 8000 and bits == 16


def test_webm_non_vorbis_audio_is_named_boundary():
    from rustcheatersdatapipeline_spark.functions.webm import decode_webm_audio

    st = _simple_stream()
    headers = [st._ident(), st._comment(), st._setup()]
    buf = _webm_wrap(headers, [b"\x00"], codec=b"A_OPUS")
    with pytest.raises(NotImplementedError, match="A_OPUS"):
        decode_webm_audio(buf)


def test_truncated_header_packets_stay_inside_quarantine():
    """A short/truncated HEADER packet must raise inside
    DECODE_QUARANTINE, never escape as a bare _EndOfPacket.

    _parse_headers runs OUTSIDE the per-audio-packet try blocks, so
    before r12 a truncated setup packet (reachable via WebM
    CodecPrivate, which has no CRC, or a CRC-valid Ogg page carrying a
    short setup packet) raised the internal _EndOfPacket sentinel past
    the quarantine tuple — a permanent poison pill under foreachBatch
    replay. _EndOfPacket now subclasses ValueError; this pins it."""
    from rustcheatersdatapipeline_spark.functions.pixels import DECODE_QUARANTINE
    from rustcheatersdatapipeline_spark.functions.vorbis import (
        decode_vorbis_packets,
    )
    from rustcheatersdatapipeline_spark.functions.webm import decode_webm_audio

    st = _simple_stream()
    ident, comment, setup = st._ident(), st._comment(), st._setup()

    # every strict-prefix truncation of every header packet, through the
    # container-independent core (shared by the Ogg and WebM paths)
    for idx, pkt in enumerate((ident, comment, setup)):
        for cut in range(len(pkt)):
            headers = [ident, comment, setup]
            headers[idx] = pkt[:cut]
            with pytest.raises(DECODE_QUARANTINE):
                decode_vorbis_packets(headers)

    # the advisor's exact repro: truncated setup inside WebM CodecPrivate
    # (no CRC protects it) must quarantine, not poison
    buf = _webm_wrap([ident, comment, setup[: len(setup) // 2]], [b"\x00"])
    with pytest.raises(DECODE_QUARANTINE):
        decode_webm_audio(buf)

    # the sentinel itself is inside the quarantine surface by type
    assert issubclass(V._EndOfPacket, ValueError)
