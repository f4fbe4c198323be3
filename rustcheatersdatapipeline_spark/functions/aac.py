"""AAC stream STRUCTURE parse — pure stdlib.

The fixed-width layers of ISO 13818-7 / 14496-3: ADTS frame-header
walk (sync, profile, sampling index, channel config, frame lengths —
everything a curation pipeline filters crawled audio on) and the
AudioSpecificConfig record MP4 ``mp4a`` tracks carry inside ``esds``.

The FILTERBANK/spectral layer is the named boundary, stated honestly:
AAC-LC is Huffman-coded (NOT arithmetic), but its 12 spectral/scale
codebooks are tabulated ISO data that fails this build's offline
self-certification discipline (the prefix-free + Kraft bar that
admitted MP3 tables 10-13 and rejected 15/16/24 — see
functions/mp3.py). Payload decode quarantines with the object type
named rather than silently mis-decoding.
"""

from __future__ import annotations

#: ISO 14496-3 samplingFrequencyIndex table
SAMPLE_RATES = (96000, 88200, 64000, 48000, 44100, 32000, 24000, 22050,
                16000, 12000, 11025, 8000, 7350)

#: channelConfiguration -> channel count (1..7; 7 means 8 channels)
CHANNELS = (0, 1, 2, 3, 4, 5, 6, 8)

AUDIO_OBJECT_TYPES = {1: "AAC main", 2: "AAC LC", 3: "AAC SSR",
                      4: "AAC LTP", 5: "SBR", 29: "PS"}


def _adts_frame(buf: bytes, pos: int):
    """(frame_length, rate, channels, profile) or None."""
    if pos + 7 > len(buf):
        return None
    if buf[pos] != 0xFF or (buf[pos + 1] & 0xF6) != 0xF0:
        return None  # sync 0xFFF + layer 00
    protection_absent = buf[pos + 1] & 1
    profile = (buf[pos + 2] >> 6) & 3
    sr_idx = (buf[pos + 2] >> 2) & 0xF
    if sr_idx >= len(SAMPLE_RATES):
        return None
    channel_cfg = ((buf[pos + 2] & 1) << 2) | (buf[pos + 3] >> 6)
    frame_len = ((buf[pos + 3] & 3) << 11) | (buf[pos + 4] << 3) | (buf[pos + 5] >> 5)
    if frame_len < (7 if protection_absent else 9):
        return None
    return frame_len, SAMPLE_RATES[sr_idx], CHANNELS[channel_cfg], profile


def parse_adts_header(buf: bytes) -> tuple[int, int, int, float] | None:
    """(rate, channels, n_frames, duration_s) from an ADTS AAC stream,
    else None — total like the other header sniffers. Requires at
    least two coherent frames (or one frame ending exactly at EOF) so
    random data cannot sync."""
    first = _adts_frame(buf, 0)
    if first is None:
        return None
    frame_len, rate, channels, _profile = first
    n_frames = 0
    pos = 0
    while pos < len(buf):
        f = _adts_frame(buf, pos)
        if f is None:
            break
        n_frames += 1
        pos += f[0]
    if n_frames == 0 or (n_frames == 1 and pos != len(buf)):
        return None
    return rate, channels, n_frames, n_frames * 1024.0 / rate


def parse_audio_specific_config(cfg: bytes) -> dict:
    """AudioSpecificConfig (ISO 14496-3 §1.6.2.1): object type, rate,
    channels — the record inside an MP4 ``esds`` box."""
    if len(cfg) < 2:
        raise ValueError("AAC: AudioSpecificConfig too short")
    bitpos = 0

    def u(n):
        nonlocal bitpos
        v = 0
        for _ in range(n):
            byte = bitpos >> 3
            if byte >= len(cfg):
                raise ValueError("AAC: truncated AudioSpecificConfig")
            v = (v << 1) | ((cfg[byte] >> (7 - (bitpos & 7))) & 1)
            bitpos += 1
        return v

    aot = u(5)
    if aot == 31:
        aot = 32 + u(6)
    sr_idx = u(4)
    rate = u(24) if sr_idx == 15 else (
        SAMPLE_RATES[sr_idx] if sr_idx < len(SAMPLE_RATES) else None
    )
    channel_cfg = u(4)
    frame_len_flag = None
    if aot in (1, 2, 3, 4):  # GASpecificConfig
        frame_len_flag = u(1)
    return {
        "object_type": aot,
        "object_name": AUDIO_OBJECT_TYPES.get(aot, str(aot)),
        "rate": rate,
        "channels": CHANNELS[channel_cfg] if channel_cfg < len(CHANNELS) else None,
        "frame_length": (960 if frame_len_flag else 1024)
        if frame_len_flag is not None
        else None,
    }


def parse_esds_config(body: bytes) -> bytes | None:
    """Extract the AudioSpecificConfig (DecSpecificInfo, tag 5) from an
    ``esds`` box body (after the full-box header): the MPEG-4 ES
    descriptor nesting ES(3) -> DecoderConfig(4) -> DecSpecificInfo(5),
    each tag followed by a 7-bit-groups expandable length."""
    pos = 0

    def read_len(p):
        size = 0
        for _ in range(4):
            if p >= len(body):
                raise ValueError("AAC: truncated esds descriptor")
            b = body[p]
            p += 1
            size = (size << 7) | (b & 0x7F)
            if not b & 0x80:
                break
        return size, p

    def walk(p, end):
        while p < end:
            tag = body[p]
            size, q = read_len(p + 1)
            if tag == 5:
                return body[q : q + size]
            if tag == 3:
                # ES descriptor (ISO 14496-1 §7.2.6.5): es_id(2) then a
                # flags byte whose bits gate OPTIONAL fields that must be
                # skipped before the nested descriptors — 2-byte
                # dependsOn_ES_ID (streamDependenceFlag, 0x80), URLlength
                # + URLstring (URL_Flag, 0x40), 2-byte OCR_ES_ID
                # (OCRstreamFlag, 0x20). Ignoring them misaligns the walk
                # and can silently return a wrong AudioSpecificConfig.
                r = q + 2
                if r >= len(body) or r >= q + size:
                    raise ValueError("AAC: truncated esds ES descriptor")
                flags = body[r]
                r += 1
                if flags & 0x80:
                    r += 2
                if flags & 0x40:
                    if r >= len(body) or r >= q + size:
                        raise ValueError("AAC: truncated esds URL field")
                    r += 1 + body[r]
                if flags & 0x20:
                    r += 2
                if r > q + size:
                    raise ValueError("AAC: esds ES optional fields overrun")
                hit = walk(r, q + size)
            elif tag == 4:
                # DecoderConfig: 13 fixed bytes then nested
                hit = walk(q + 13, q + size)
            else:
                hit = None
            if hit is not None:
                return hit
            p = q + size
        return None

    return walk(pos, len(body))


def decode_aac_samples(buf: bytes) -> None:
    """Spectral decode is the named boundary — see module docstring."""
    raise NotImplementedError(
        "AAC: spectral decode (the ISO spectral/scalefactor Huffman "
        "codebooks are tabulated data pending a validating source); "
        "framing, rate/channel/profile metadata are available via "
        "functions/aac.py"
    )
