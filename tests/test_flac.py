"""FLAC decode (functions/flac.py): the oracle is a test-side
spec-exact ENCODER — STREAMINFO, byte-aligned frame headers with real
CRC-8/CRC-16, UTF-8-style frame numbers, all four subframe types
(constant, verbatim, fixed orders 0-4, quantized LPC), Rice residual
partitions with zigzag + escape-to-raw, wasted bits, and the three
stereo decorrelation modes. Lossless ⇒ byte-exact sample round trips."""

import numpy as np
import pytest

from rustcheatersdatapipeline_spark.functions.flac import (
    decode_flac_samples,
    parse_flac_header,
)


class MsbWriter:
    def __init__(self):
        self.bits: list[int] = []

    def write(self, val: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.bits.append((val >> i) & 1)

    def signed(self, val: int, n: int) -> None:
        self.write(val & ((1 << n) - 1), n)

    def align(self) -> None:
        while len(self.bits) % 8:
            self.bits.append(0)

    def to_bytes(self) -> bytes:
        self.align()
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for bit in self.bits[i : i + 8]:
                b = (b << 1) | bit
            out.append(b)
        return bytes(out)


def _crc8(data: bytes) -> int:
    crc = 0
    for byte in data:
        crc ^= byte
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for byte in data:
        crc ^= byte << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


def _rice(w: MsbWriter, val: int, param: int) -> None:
    v = (val << 1) if val >= 0 else (-val << 1) - 1  # zigzag
    q = v >> param
    for _ in range(q):
        w.write(0, 1)
    w.write(1, 1)
    if param:
        w.write(v & ((1 << param) - 1), param)


_FIXED = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


def _emit_residuals(
    w: MsbWriter, res: list[int], blocksize: int, order: int,
    param: int = 4, part_order: int = 0, escape: bool = False,
) -> None:
    w.write(0, 2)  # rice method (4-bit params)
    w.write(part_order, 4)
    nparts = 1 << part_order
    i = 0
    for p in range(nparts):
        count = (blocksize >> part_order) - (order if p == 0 else 0)
        if escape and p == 0:
            w.write(15, 4)  # escape
            raw = max((max(abs(r) for r in res[i : i + count]) if count else 0).bit_length() + 1, 2)
            w.write(raw, 5)
            for r in res[i : i + count]:
                w.signed(r, raw)
        else:
            w.write(param, 4)
            for r in res[i : i + count]:
                _rice(w, r, param)
        i += count
    assert i == len(res)


def _emit_subframe(
    w: MsbWriter, samples: list[int], bps: int, kind: str,
    order: int = 2, wasted: int = 0,
    lpc: tuple | None = None, escape: bool = False, part_order: int = 0,
) -> None:
    blocksize = len(samples)
    w.write(0, 1)  # pad
    if wasted:
        assert all(s % (1 << wasted) == 0 for s in samples)
        samples = [s >> wasted for s in samples]
        bps -= wasted
    if kind == "constant":
        w.write(0, 6)
    elif kind == "verbatim":
        w.write(1, 6)
    elif kind == "fixed":
        w.write(8 + order, 6)
    else:
        w.write(31 + order, 6)
    if wasted:
        w.write(1, 1)
        for _ in range(wasted - 1):
            w.write(0, 1)
        w.write(1, 1)  # unary(wasted - 1)
    else:
        w.write(0, 1)
    if kind == "constant":
        assert len(set(samples)) == 1
        w.signed(samples[0], bps)
        return
    if kind == "verbatim":
        for s in samples:
            w.signed(s, bps)
        return
    if kind == "fixed":
        coeffs, shift = _FIXED[order], 0
    else:
        coeffs, shift = lpc
    for s in samples[:order]:
        w.signed(s, bps)
    if kind == "lpc":
        precision = max(max(abs(c) for c in coeffs).bit_length() + 1, 2)
        w.write(precision - 1, 4)
        w.write(shift, 5)
        for c in coeffs:
            w.signed(c, precision)
    res = []
    for i in range(order, blocksize):
        acc = sum(c * samples[i - 1 - j] for j, c in enumerate(coeffs))
        pred = acc >> shift if kind == "lpc" else acc
        res.append(samples[i] - pred)
    _emit_residuals(w, res, blocksize, order, part_order=part_order, escape=escape)


def _streaminfo(channels: int, rate: int, bps: int, total: int) -> bytes:
    body = bytearray()
    body += (16).to_bytes(2, "big") * 2  # min/max blocksize
    body += bytes(6)  # min/max frame size (unknown)
    packed = (rate << 44) | ((channels - 1) << 41) | ((bps - 1) << 36) | total
    body += packed.to_bytes(8, "big")
    body += bytes(16)  # md5 (unset)
    return bytes([0x80]) + len(body).to_bytes(3, "big") + bytes(body)


def encode_flac(
    chans: list[list[int]], rate: int = 8000, bps: int = 16,
    mode: str = "independent", frame_blocks: int | None = None, **sub_kw,
) -> bytes:
    """Valid FLAC stream: ``chans`` = per-channel sample lists;
    ``mode`` ∈ independent/left_side/right_side/mid_side; frames of
    ``frame_blocks`` samples (default: one frame)."""
    n = len(chans[0])
    channels = len(chans)
    out = bytearray(b"fLaC" + _streaminfo(channels, rate, bps, n))
    frame_blocks = frame_blocks or n
    frame_no = 0
    for start in range(0, n, frame_blocks):
        blocksize = min(frame_blocks, n - start)
        w = MsbWriter()
        w.write(0b11111111111110, 14)
        w.write(0, 1)
        w.write(0, 1)  # fixed blocking
        bs_code = 6 if blocksize <= 256 else 7  # 8/16-bit blocksize-1 follows
        w.write(bs_code, 4)
        w.write(0, 4)  # sample rate from STREAMINFO
        ch_code = {
            "independent": channels - 1,
            "left_side": 8,
            "right_side": 9,
            "mid_side": 10,
        }[mode]
        w.write(ch_code, 4)
        w.write(0, 3)  # bps from STREAMINFO
        w.write(0, 1)
        w.write(frame_no, 8)  # UTF-8 number < 0x80
        w.write(blocksize - 1, 8 if bs_code == 6 else 16)
        hdr = w.to_bytes()
        w = MsbWriter()
        for b in hdr:
            w.write(b, 8)
        w.write(_crc8(hdr), 8)
        segs = [c[start : start + blocksize] for c in chans]
        if mode == "independent":
            for seg in segs:
                _emit_subframe(w, seg, bps, **sub_kw)
        else:
            l, r = segs
            side = [a - b for a, b in zip(l, r)]
            if mode == "left_side":
                _emit_subframe(w, l, bps, **sub_kw)
                _emit_subframe(w, side, bps + 1, **sub_kw)
            elif mode == "right_side":
                _emit_subframe(w, side, bps + 1, **sub_kw)
                _emit_subframe(w, r, bps, **sub_kw)
            else:
                mid = [(a + b) >> 1 for a, b in zip(l, r)]
                _emit_subframe(w, mid, bps, **sub_kw)
                _emit_subframe(w, side, bps + 1, **sub_kw)
        w.align()
        frame = w.to_bytes()
        out += frame + _crc16(frame).to_bytes(2, "big")
        frame_no += 1
    return bytes(out)


def _rand(n, seed, lo=-2000, hi=2000):
    return [int(v) for v in np.random.RandomState(seed).randint(lo, hi, n)]


def _check(chans, **kw):
    buf = encode_flac(chans, **kw)
    samples, rate = decode_flac_samples(buf)
    assert rate == kw.get("rate", 8000)
    assert samples.shape == (len(chans[0]), len(chans))
    for c, want in enumerate(chans):
        assert samples[:, c].tolist() == want


def test_header_parse():
    buf = encode_flac([_rand(32, 0)], rate=44100, kind="verbatim")
    assert parse_flac_header(buf) == (1, 44100, 16, 32)


def test_constant_and_verbatim():
    _check([[123] * 40], kind="constant")
    _check([_rand(40, 1)], kind="verbatim")


@pytest.mark.parametrize("order", [0, 1, 2, 3, 4])
def test_fixed_orders(order):
    _check([_rand(64, 2 + order)], kind="fixed", order=order)


def test_lpc_subframe():
    _check(
        [_rand(64, 9)],
        kind="lpc", order=3, lpc=([70, -40, 10], 6),
    )


def test_rice_partitions_and_escape():
    _check([_rand(64, 10)], kind="fixed", order=2, part_order=2)
    _check([_rand(64, 11, lo=-30000, hi=30000)], kind="fixed", order=1, escape=True)


def test_wasted_bits():
    samples = [v * 8 for v in _rand(48, 12, lo=-200, hi=200)]
    _check([samples], kind="fixed", order=1, wasted=3)


@pytest.mark.parametrize("mode", ["independent", "left_side", "right_side", "mid_side"])
def test_stereo_modes(mode):
    l = _rand(48, 13)
    r = [v + d for v, d in zip(l, _rand(48, 14, lo=-50, hi=50))]
    _check([l, r], mode=mode, kind="fixed", order=2)


def test_multi_frame_stream():
    _check([_rand(96, 15)], kind="fixed", order=2, frame_blocks=32)


def test_feeds_audio_stack():
    """FLAC and the equivalent WAV yield identical feature rows and
    fingerprints — the whole audio stack gains compressed input."""
    from rustcheatersdatapipeline_spark.functions.audio import (
        audio_features,
        audio_fingerprint,
    )
    from tests.test_pixels_decode import encode_wav

    t = np.arange(4096)
    sig = (
        8000 * np.sin(2 * np.pi * 440 * t / 8000)
        + 4000 * np.sin(2 * np.pi * 1200 * t / 8000)
    ).astype(np.int64)
    chans = [sig.tolist()]
    flac_samples, rate = decode_flac_samples(
        encode_flac(chans, kind="fixed", order=2, frame_blocks=1024)
    )
    from rustcheatersdatapipeline_spark.functions.pixels import decode_wav_samples

    wav_samples, _ = decode_wav_samples(encode_wav(sig[:, None], rate=8000))
    assert np.array_equal(flac_samples[:, 0], wav_samples[:, 0])
    f1 = audio_features(flac_samples, rate, 16)
    f2 = audio_features(wav_samples, rate, 16)
    assert f1 == f2
    assert audio_fingerprint(flac_samples, rate, 16) == audio_fingerprint(
        wav_samples, rate, 16
    )


def test_mutation_totality():
    from rustcheatersdatapipeline_spark.functions.pixels import DECODE_QUARANTINE

    base = encode_flac(
        [_rand(64, 20)], kind="lpc", order=2, lpc=([80, -30], 6), frame_blocks=32
    )
    rng = np.random.RandomState(0)
    for _ in range(400):
        buf = bytearray(base)
        buf[rng.randint(0, len(buf))] ^= rng.randint(1, 256)
        payload = bytes(buf[: rng.randint(0, len(buf) + 1)])
        try:
            decode_flac_samples(payload)
        except DECODE_QUARANTINE:
            pass


def test_flac_through_spark_featurizers(spark):
    """FLAC payloads flow through the Spark audio featurizers exactly
    like WAV, and decode_header reports audio/flac."""
    from rustcheatersdatapipeline_spark.functions.audio import (
        featurize_audio,
        featurize_audio_fingerprint,
    )
    from rustcheatersdatapipeline_spark.functions.multimodal import decode_header
    from rustcheatersdatapipeline_spark.functions.phash import image_neardup
    from tests.test_pixels_decode import encode_wav

    t = np.arange(2048)
    sig = (9000 * np.sin(2 * np.pi * 660 * t / 8000)).astype(np.int64)
    flac = encode_flac([sig.tolist()], kind="fixed", order=2, frame_blocks=512)
    wav = encode_wav(sig[:, None], rate=8000)
    assert decode_header(flac) == ("audio/flac", None, None, 2048)

    media = spark.createDataFrame(
        [(1, bytearray(flac)), (2, bytearray(wav)), (3, bytearray(b"junk"))],
        "item_id long, payload binary",
    )
    feats = {r["item_id"]: r for r in featurize_audio(media).collect()}
    assert feats[1]["n_samples"] == 2048 and feats[2]["n_samples"] == 2048
    assert feats[1]["centroid_hz"] == pytest.approx(feats[2]["centroid_hz"])
    assert feats[3]["rate"] is None  # quarantined
    # the FLAC and WAV of the same signal are perceptual twins
    fps = featurize_audio_fingerprint(media)
    pairs = {(r["item_a"], r["item_b"]) for r in image_neardup(fps).collect()}
    assert (1, 2) in pairs
