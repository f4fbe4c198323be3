"""FLAC (free lossless audio codec, public spec / RFC 9639) full
decode — pure stdlib + numpy.

The audio-side twin of the VP8L work: WAV covers raw PCM, but archived
and crawled audio is overwhelmingly compressed, and FLAC is the one
mainstream audio codec that is fully decodable without a codec library
— MSB-first bit stream, UTF-8-style frame numbering, four subframe
types (constant, verbatim, fixed-order prediction, quantized LPC),
Rice-coded residual partitions with escape-to-raw, wasted-bits
shifting, and inter-channel decorrelation (left/side, right/side,
mid/side). Lossy codecs (MP3/AAC/Opus payload decode) stay behind the
named ``NotImplementedError`` boundary; MP3 container METADATA is
already parsed (multimodal.parse_mp3_header).

Output feeds the existing audio stack unchanged: ``(n_frames,
channels) int`` samples + rate — exactly ``decode_wav_samples``'s
shape, so ``audio_features`` / ``audio_fingerprint`` /
``featurize_audio*`` apply verbatim.
"""

from __future__ import annotations

import numpy as np

#: decoded-sample ceiling (× ~4 B ≈ the image decode bounds)
_FLAC_MAX_SAMPLES = 1 << 26

_FIXED_COEFFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}

_BLOCK_SIZES = {
    1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
    13: 8192, 14: 16384, 15: 32768,
}

_SAMPLE_SIZES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


class _MsbReader:
    def __init__(self, data: bytes, pos_bits: int = 0) -> None:
        self.d = data
        self.pos = pos_bits

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            byte = self.pos >> 3
            if byte >= len(self.d):
                raise ValueError("FLAC: truncated bitstream")
            v = (v << 1) | ((self.d[byte] >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return v

    def signed(self, n: int) -> int:
        v = self.bits(n)
        return v - (1 << n) if v >= (1 << (n - 1)) else v

    def unary(self) -> int:
        q = 0
        while self.bits(1) == 0:
            q += 1
            if q > 1 << 24:
                raise ValueError("FLAC: runaway unary code")
        return q

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def at_end(self) -> bool:
        return self.pos >= 8 * len(self.d)


def parse_flac_header(buf: bytes) -> tuple[int, int, int, int] | None:
    """(channels, sample_rate, bits_per_sample, total_samples) from the
    STREAMINFO block, else None (total-like the other header sniffers)."""
    if len(buf) < 8 or buf[:4] != b"fLaC":
        return None
    pos = 4
    while pos + 4 <= len(buf):
        hdr = buf[pos]
        btype = hdr & 0x7F
        size = int.from_bytes(buf[pos + 1 : pos + 4], "big")
        body = buf[pos + 4 : pos + 4 + size]
        if btype == 0:
            if len(body) < 18:
                return None
            packed = int.from_bytes(body[10:18], "big")
            rate = packed >> 44
            channels = ((packed >> 41) & 0x7) + 1
            bps = ((packed >> 36) & 0x1F) + 1
            total = packed & ((1 << 36) - 1)
            if rate == 0:
                return None
            return channels, rate, bps, total
        if hdr & 0x80:
            break
        pos += 4 + size
    return None


def _metadata_end(buf: bytes) -> int:
    pos = 4
    while pos + 4 <= len(buf):
        hdr = buf[pos]
        size = int.from_bytes(buf[pos + 1 : pos + 4], "big")
        pos += 4 + size
        if hdr & 0x80:
            return pos
    raise ValueError("FLAC: unterminated metadata blocks")


def _read_utf8_number(rd: _MsbReader) -> int:
    """The frame header's UTF-8-style coded number (up to 7 bytes)."""
    b0 = rd.bits(8)
    if b0 < 0x80:
        return b0
    n = 0
    probe = b0
    while probe & 0x40:
        n += 1
        probe <<= 1
    if n == 0 or n > 6:
        raise ValueError("FLAC: bad UTF-8 coded number")
    v = b0 & (0x3F >> n)
    for _ in range(n):
        c = rd.bits(8)
        if c & 0xC0 != 0x80:
            raise ValueError("FLAC: bad UTF-8 continuation")
        v = (v << 6) | (c & 0x3F)
    return v


def _read_residuals(rd: _MsbReader, blocksize: int, order: int) -> list[int]:
    method = rd.bits(2)
    if method > 1:
        raise ValueError("FLAC: reserved residual coding method")
    param_bits = 4 + method
    escape = (1 << param_bits) - 1
    part_order = rd.bits(4)
    nparts = 1 << part_order
    if blocksize % nparts:
        raise ValueError("FLAC: partition order does not divide block size")
    out: list[int] = []
    for p in range(nparts):
        count = (blocksize >> part_order) - (order if p == 0 else 0)
        if count < 0:
            raise ValueError("FLAC: predictor order exceeds first partition")
        param = rd.bits(param_bits)
        if param == escape:
            raw = rd.bits(5)
            for _ in range(count):
                out.append(rd.signed(raw) if raw else 0)
        else:
            for _ in range(count):
                q = rd.unary()
                r = rd.bits(param) if param else 0
                v = (q << param) | r
                out.append((v >> 1) ^ -(v & 1))  # zigzag
    return out


def _decode_subframe(rd: _MsbReader, blocksize: int, bps: int) -> list[int]:
    if rd.bits(1):
        raise ValueError("FLAC: subframe padding bit set")
    stype = rd.bits(6)
    wasted = 0
    if rd.bits(1):
        wasted = rd.unary() + 1
        bps -= wasted
    if bps <= 0:
        raise ValueError("FLAC: wasted bits exhaust the sample size")
    if stype == 0:  # CONSTANT
        v = rd.signed(bps)
        samples = [v] * blocksize
    elif stype == 1:  # VERBATIM
        samples = [rd.signed(bps) for _ in range(blocksize)]
    elif 8 <= stype <= 12:  # FIXED, order 0-4
        order = stype - 8
        if order > blocksize:
            raise ValueError("FLAC: fixed order exceeds block size")
        samples = [rd.signed(bps) for _ in range(order)]
        res = _read_residuals(rd, blocksize, order)
        coeffs = _FIXED_COEFFS[order]
        for r in res:
            pred = sum(c * samples[-1 - j] for j, c in enumerate(coeffs))
            samples.append(pred + r)
    elif stype >= 32:  # LPC, order 1-32
        order = stype - 31
        if order > blocksize:
            raise ValueError("FLAC: LPC order exceeds block size")
        samples = [rd.signed(bps) for _ in range(order)]
        precision = rd.bits(4) + 1
        if precision == 16:
            raise ValueError("FLAC: invalid LPC precision")
        shift = rd.bits(5)
        coeffs = [rd.signed(precision) for _ in range(order)]
        res = _read_residuals(rd, blocksize, order)
        for r in res:
            acc = sum(c * samples[-1 - j] for j, c in enumerate(coeffs))
            samples.append((acc >> shift) + r)
    else:
        raise ValueError("FLAC: reserved subframe type")
    if wasted:
        samples = [s << wasted for s in samples]
    return samples


def decode_flac_samples(buf: bytes) -> tuple[np.ndarray, int]:
    """Full FLAC decode → ((n_frames, channels) int32 samples, rate) —
    ``decode_wav_samples``'s contract, so the whole audio feature /
    fingerprint stack applies unchanged. Corruption raises ValueError
    (quarantined upstream via DECODE_QUARANTINE)."""
    info = parse_flac_header(buf)
    if info is None:
        raise ValueError("not a FLAC payload")
    channels, rate, bps_info, total = info
    if total * channels > _FLAC_MAX_SAMPLES:
        raise ValueError("FLAC: stream exceeds decode bound")
    rd = _MsbReader(buf, 8 * _metadata_end(buf))
    chans: list[list[int]] = [[] for _ in range(channels)]
    decoded = 0
    while not rd.at_end():
        if rd.bits(14) != 0b11111111111110:
            raise ValueError("FLAC: lost frame sync")
        rd.bits(1)  # reserved
        rd.bits(1)  # blocking strategy
        bs_code = rd.bits(4)
        sr_code = rd.bits(4)
        ch_code = rd.bits(4)
        ss_code = rd.bits(3)
        rd.bits(1)  # reserved
        _read_utf8_number(rd)
        if bs_code == 0:
            raise ValueError("FLAC: reserved block size code")
        elif bs_code == 6:
            blocksize = rd.bits(8) + 1
        elif bs_code == 7:
            blocksize = rd.bits(16) + 1
        else:
            blocksize = _BLOCK_SIZES[bs_code]
        if sr_code == 12:
            rd.bits(8)
        elif sr_code in (13, 14):
            rd.bits(16)
        elif sr_code == 15:
            raise ValueError("FLAC: invalid sample rate code")
        bps = bps_info if ss_code == 0 else _SAMPLE_SIZES.get(ss_code)
        if bps is None:
            raise ValueError("FLAC: reserved sample size code")
        rd.bits(8)  # header CRC-8 (not verified — integrity is the
        # transport's concern here; structure errors still raise)
        if ch_code < 8:
            n_ch = ch_code + 1
            if n_ch != channels:
                raise ValueError("FLAC: frame channel count differs from STREAMINFO")
            subs = [_decode_subframe(rd, blocksize, bps) for _ in range(n_ch)]
        elif ch_code in (8, 9, 10):
            if channels != 2:
                raise ValueError("FLAC: stereo decorrelation in non-stereo stream")
            if ch_code == 8:  # left/side
                left = _decode_subframe(rd, blocksize, bps)
                side = _decode_subframe(rd, blocksize, bps + 1)
                subs = [left, [l - s for l, s in zip(left, side)]]
            elif ch_code == 9:  # right/side
                side = _decode_subframe(rd, blocksize, bps + 1)
                right = _decode_subframe(rd, blocksize, bps)
                subs = [[r + s for r, s in zip(right, side)], right]
            else:  # mid/side
                mid = _decode_subframe(rd, blocksize, bps)
                side = _decode_subframe(rd, blocksize, bps + 1)
                left = []
                right = []
                for m, s in zip(mid, side):
                    mm = (m << 1) | (s & 1)
                    left.append((mm + s) >> 1)
                    right.append((mm - s) >> 1)
                subs = [left, right]
        else:
            raise ValueError("FLAC: reserved channel assignment")
        rd.align()
        rd.bits(16)  # frame CRC-16 (consumed, not verified)
        for c in range(channels):
            chans[c].extend(subs[c])
        decoded += blocksize
        if decoded > _FLAC_MAX_SAMPLES:
            raise ValueError("FLAC: stream exceeds decode bound")
        if total and decoded >= total:
            break
    n = min(decoded, total) if total else decoded
    out = np.zeros((n, channels), np.int32)
    for c in range(channels):
        out[:, c] = np.array(chans[c][:n], np.int64).astype(np.int32)
    return out, rate
