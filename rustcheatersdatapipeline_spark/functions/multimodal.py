"""Multimodal (image/audio/video) column processing.

Design: media are opaque ``binary`` payload columns with a typed
metadata struct alongside — the pattern a 100 TB training-data pipeline
uses (payload stays columnar in Parquet, metadata prunes without
touching bytes). All per-item compute runs through ``mapInPandas``
(Arrow batches, zero-copy into numpy), partitioned by whatever key the
caller bucketed on.

Two decode paths:

- ``fake=True`` — deterministic byte-derived pseudo-decode; keeps the
  whole Spark path executable and oracle-checkable in any container.
- ``fake=False`` — REAL header-level decoding with pure stdlib parsing
  of public formats: PNG (signature + IHDR width/height, RFC 2083),
  GIF (logical screen descriptor + block-stream walk counting image
  descriptors — true multi-frame counts for animations) and WAV (RIFF
  chunk walk, fmt/data chunks). No codec libraries needed: dimensions,
  frame counts and durations live in the headers. Unrecognized
  payloads degrade to ``application/octet-stream`` with NULL
  dimensions (quarantine-style, never a task failure).

Full pixel/sample decoding (``decode_pixels`` / pixels.py, jpeg.py,
avi.py) is real for PNG (all still-image variants), GIF, JPEG
(baseline + progressive), AVI (MJPEG/DIB) and PCM WAV; formats that
stay behind a named NotImplementedError (H.264/H.265 macroblocks,
arithmetic JPEG, AAC spectra) raise a clearly-marked boundary — see
functions/h264.py and functions/aac.py for the honest per-codec
rationale (CABAC/arithmetic JPEG are arithmetic-coded; H.264-CAVLC
and AAC-LC are VLC-coded but their ITU/ISO codebooks are tabulated
data pending a validating source, the same self-certification bar as
the MP3 tables).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: output schema of featurize_media (mapInPandas contract)
MEDIA_FEATURES_SCHEMA = (
    "item_id bigint, mime string, n_bytes int, width int, height int, "
    "n_frames int, sampled_frames array<int>, checksum bigint"
)

#: real-decode cap on the emitted sampled-frame index list — audio frame
#: counts are ~sample-rate sized and the feature row must stay bounded
MAX_SAMPLED_FRAMES = 16

_PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"


def media_table(df: DataFrame, id_col: str, payload_col, mime: str) -> DataFrame:
    """Normalize any source into the engine's media-table shape:
    (item_id, payload binary, meta struct<mime,n_bytes>)."""
    payload = payload_col if not isinstance(payload_col, str) else F.col(payload_col)
    payload = payload.cast("binary")
    return df.select(
        F.col(id_col).cast("long").alias("item_id"),
        payload.alias("payload"),
        F.struct(
            F.lit(mime).alias("mime"), F.length(payload).alias("n_bytes")
        ).alias("meta"),
    )


def parse_png_header(buf: bytes) -> tuple[int, int] | None:
    """(width, height) from a PNG signature + IHDR chunk, else None.

    Layout (public spec, RFC 2083 §3): 8-byte signature, then the IHDR
    chunk — 4-byte length, ``IHDR`` tag, big-endian u32 width, u32
    height. IHDR is required to be first, so a fixed offset is exact.
    """
    if len(buf) >= 24 and buf[:8] == _PNG_SIGNATURE and buf[12:16] == b"IHDR":
        w = int.from_bytes(buf[16:20], "big")
        h = int.from_bytes(buf[20:24], "big")
        if w > 0 and h > 0:
            return w, h
    return None


def parse_apng_frame_count(buf: bytes) -> int:
    """Animation frame count from an APNG acTL chunk (which must
    precede IDAT, public APNG spec), else 1 for a still PNG."""
    pos = 8
    while pos + 8 <= len(buf):
        size = int.from_bytes(buf[pos : pos + 4], "big")
        tag = buf[pos + 4 : pos + 8]
        if tag == b"acTL" and pos + 12 <= len(buf):
            return max(int.from_bytes(buf[pos + 8 : pos + 12], "big"), 1)
        if tag in (b"IDAT", b"IEND"):
            break
        pos += 12 + size
    return 1


def parse_gif_header(buf: bytes) -> tuple[int, int, int] | None:
    """(width, height, n_frames) from a GIF87a/GIF89a payload, else None.

    Layout (public spec): 6-byte signature, logical screen descriptor
    (u16le width, u16le height, packed flags at +10 whose bit 7 / low 3
    bits describe the global color table), then a block stream — frames
    are Image Descriptors (0x2C, 9-byte header + optional local color
    table + LZW sub-blocks), 0x21 introduces extensions (sub-block
    chains), 0x3B terminates. Frame count = image descriptors seen.
    """
    if len(buf) < 13 or buf[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    w = int.from_bytes(buf[6:8], "little")
    h = int.from_bytes(buf[8:10], "little")
    if w == 0 or h == 0:
        return None
    packed = buf[10]
    pos = 13
    if packed & 0x80:  # global color table present
        pos += 3 * (2 << (packed & 0x07))

    def skip_subblocks(p: int) -> int:
        while p < len(buf):
            size = buf[p]
            p += 1
            if size == 0:
                return p
            p += size
        return p

    frames = 0
    while pos < len(buf):
        b = buf[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label byte + sub-block chain
            pos = skip_subblocks(pos + 2)
        elif b == 0x2C:  # image descriptor
            frames += 1
            if pos + 10 > len(buf):
                break
            ipacked = buf[pos + 9]
            pos += 10
            if ipacked & 0x80:  # local color table
                pos += 3 * (2 << (ipacked & 0x07))
            pos += 1  # LZW minimum code size
            pos = skip_subblocks(pos)
        else:  # corrupt stream — stop at what we could parse
            break
    return w, h, frames


def parse_avi_header(buf: bytes) -> tuple[int, int, int] | None:
    """(width, height, n_frames) from an AVI payload, else None.

    AVI is RIFF with form type ``AVI `` (public spec): top-level chunks,
    where ``LIST`` chunks carry a 4-byte list type then sub-chunks. The
    main header lives in ``LIST hdrl`` → ``avih`` chunk:
    dwTotalFrames at +16, dwWidth at +32, dwHeight at +36 (all u32le).
    """
    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"AVI ":
        return None

    def find_avih(p: int, end: int) -> bytes | None:
        while p + 8 <= end:
            cid = buf[p : p + 4]
            sz = int.from_bytes(buf[p + 4 : p + 8], "little")
            if cid == b"avih":
                return buf[p + 8 : p + 8 + sz]
            if cid == b"LIST" and sz >= 4:
                hit = find_avih(p + 12, min(end, p + 8 + sz))
                if hit is not None:
                    return hit
            p += 8 + sz + (sz & 1)
        return None

    avih = find_avih(12, len(buf))
    if avih is None or len(avih) < 40:
        return None
    frames = int.from_bytes(avih[16:20], "little")
    w = int.from_bytes(avih[32:36], "little")
    h = int.from_bytes(avih[36:40], "little")
    if w == 0 or h == 0:
        return None
    return w, h, frames


def parse_jpeg_header(buf: bytes) -> tuple[int, int] | None:
    """(width, height) from a JPEG payload, else None.

    Walks the marker stream (public JFIF/JPEG spec): 0xFFD8 SOI, then
    0xFF-prefixed segments with big-endian u16 lengths, until a start-
    of-frame marker (0xC0-0xCF excluding DHT 0xC4, DNL 0xC8, DAC 0xCC)
    whose payload carries u16 height at +3 and u16 width at +5.
    """
    if len(buf) < 4 or buf[0:2] != b"\xff\xd8":
        return None
    pos = 2
    while pos + 4 <= len(buf):
        if buf[pos] != 0xFF:
            return None  # marker desync — not a parseable JPEG
        marker = buf[pos + 1]
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7:  # standalone markers
            pos += 2
            continue
        if marker == 0xD9:  # EOI before any SOF
            return None
        seg_len = int.from_bytes(buf[pos + 2 : pos + 4], "big")
        if seg_len < 2:
            return None
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            if pos + 9 > len(buf):
                return None
            h = int.from_bytes(buf[pos + 5 : pos + 7], "big")
            w = int.from_bytes(buf[pos + 7 : pos + 9], "big")
            return (w, h) if w > 0 and h > 0 else None
        pos += 2 + seg_len
    return None


def parse_wav_header(buf: bytes) -> tuple[int, int, int, int] | None:
    """(channels, sample_rate, bits_per_sample, n_frames) from a RIFF/WAVE
    payload, else None.

    Walks the RIFF chunk list (public spec: 4-byte id, little-endian u32
    size, word-aligned) collecting the ``fmt `` chunk (channels at +2,
    rate at +4, block align at +12, bits at +14) and the ``data`` chunk
    size; frames = data size / block align.
    """
    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        return None
    pos, fmt, data_size = 12, None, None
    while pos + 8 <= len(buf):
        cid = buf[pos : pos + 4]
        sz = int.from_bytes(buf[pos + 4 : pos + 8], "little")
        if cid == b"fmt ":
            fmt = buf[pos + 8 : pos + 8 + sz]
        elif cid == b"data":
            data_size = sz
        pos += 8 + sz + (sz & 1)  # chunks are word-aligned
    if fmt is None or len(fmt) < 16:
        return None
    channels = int.from_bytes(fmt[2:4], "little")
    rate = int.from_bytes(fmt[4:8], "little")
    block_align = int.from_bytes(fmt[12:14], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if channels == 0 or rate == 0 or block_align == 0:
        return None
    n_frames = (data_size or 0) // block_align
    return channels, rate, bits, n_frames


#: MPEG audio bitrate tables, kbps (public spec ISO 11172-3 / 13818-3);
#: index 0 = "free" and 15 = invalid — both rejected here
_MP3_BITRATES = {
    # (mpeg1?, layer) -> 14 usable rates
    (True, 1): (32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448),
    (True, 2): (32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384),
    (True, 3): (32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320),
    (False, 1): (32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256),
    (False, 2): (8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
    (False, 3): (8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
}
_MP3_RATES = {3: (44100, 48000, 32000), 2: (22050, 24000, 16000), 0: (11025, 12000, 8000)}


def _mp3_frame(buf: bytes, pos: int) -> tuple[int, int, int, int] | None:
    """(frame size, samples per frame, sample rate, channels) of a valid
    MPEG audio frame header at ``pos``, else None."""
    if pos + 4 > len(buf):
        return None
    b1, b2, b3, b4 = buf[pos : pos + 4]
    if b1 != 0xFF or (b2 & 0xE0) != 0xE0:
        return None
    version = (b2 >> 3) & 0x3  # 3=MPEG1, 2=MPEG2, 0=MPEG2.5, 1=reserved
    layer_code = (b2 >> 1) & 0x3  # 3=L1, 2=L2, 1=L3, 0=reserved
    if version == 1 or layer_code == 0:
        return None
    layer = 4 - layer_code
    br_idx = (b3 >> 4) & 0xF
    sr_idx = (b3 >> 2) & 0x3
    if br_idx in (0, 15) or sr_idx == 3:
        return None
    mpeg1 = version == 3
    bitrate = _MP3_BITRATES[(mpeg1, layer)][br_idx - 1] * 1000
    rate = _MP3_RATES[version][sr_idx]
    padding = (b3 >> 1) & 0x1
    channels = 1 if ((b4 >> 6) & 0x3) == 3 else 2
    if layer == 1:
        size = (12 * bitrate // rate + padding) * 4
        samples = 384
    elif layer == 2:
        size = 144 * bitrate // rate + padding
        samples = 1152
    else:  # layer III
        if mpeg1:
            size = 144 * bitrate // rate + padding
            samples = 1152
        else:
            size = 72 * bitrate // rate + padding
            samples = 576
    return (size, samples, rate, channels) if size > 4 else None


def parse_mp3_header(buf: bytes) -> tuple[int, int, int, float] | None:
    """(channels, sample_rate, n_frames, duration_s) of an MPEG audio
    payload, else None.

    Skips a leading ID3v2 tag (syncsafe size), then walks frame headers
    advancing by each frame's computed size — exact frame counts and
    duration for CBR and VBR alike, no decode. Sniff discipline: at
    least TWO consecutive frames agreeing on sample rate are required
    (a lone 0xFFE bigram appears constantly in random bytes); trailing
    ID3v1 ('TAG', 128 bytes) and < 4 bytes of junk are tolerated,
    anything else rejects the payload rather than misreporting it."""
    pos = 0
    if buf[:3] == b"ID3" and len(buf) >= 10:
        size = 0
        for b in buf[6:10]:
            if b & 0x80:
                return None
            size = (size << 7) | b
        pos = 10 + size
    frames = 0
    duration = 0.0
    rate0 = channels = None
    while pos < len(buf):
        if buf[pos : pos + 3] == b"TAG" and len(buf) - pos == 128:
            break  # ID3v1 trailer
        f = _mp3_frame(buf, pos)
        if f is None:
            if len(buf) - pos < 4 and frames >= 2:
                break  # trailing sub-header junk after valid audio
            return None
        size, samples, rate, ch = f
        if rate0 is None:
            rate0, channels = rate, ch
        elif rate != rate0:
            return None
        frames += 1
        duration += samples / rate
        pos += size
    if frames < 2 or rate0 is None:
        return None
    return channels, rate0, frames, duration


def parse_webp_header(buf: bytes) -> tuple[int, int, int] | None:
    """(width, height, n_frames) of a WebP payload, else None.

    RIFF container with form ``WEBP`` (public spec): ``VP8 `` lossy
    bitstream (3-byte start code 0x9D012A then 14-bit dims), ``VP8L``
    lossless (signature 0x2F then packed 14-bit dims-1), or ``VP8X``
    extended (24-bit dims-1; animations carry one ``ANMF`` chunk per
    frame). Only the headers are read here; full pixel decode lives
    in ``vp8l.decode_webp_pixels`` (lossless + lossy keyframes)."""
    if len(buf) < 16 or buf[:4] != b"RIFF" or buf[8:12] != b"WEBP":
        return None
    pos = 12
    dims = None
    frames = 0
    while pos + 8 <= len(buf):
        cid = buf[pos : pos + 4]
        sz = int.from_bytes(buf[pos + 4 : pos + 8], "little")
        body = buf[pos + 8 : pos + 8 + sz]
        if cid == b"VP8 " and len(body) >= 10 and body[3:6] == b"\x9d\x01\x2a":
            w = int.from_bytes(body[6:8], "little") & 0x3FFF
            h = int.from_bytes(body[8:10], "little") & 0x3FFF
            dims = dims or (w, h)
            frames += 1
        elif cid == b"VP8L" and len(body) >= 5 and body[0] == 0x2F:
            bits = int.from_bytes(body[1:5], "little")
            dims = dims or ((bits & 0x3FFF) + 1, ((bits >> 14) & 0x3FFF) + 1)
            frames += 1
        elif cid == b"VP8X" and len(body) >= 10:
            w = int.from_bytes(body[4:7], "little") + 1
            h = int.from_bytes(body[7:10], "little") + 1
            dims = (w, h)
        elif cid == b"ANMF":
            frames += 1
        pos += 8 + sz + (sz & 1)
    if dims is None or dims[0] == 0 or dims[1] == 0:
        return None
    return dims[0], dims[1], max(frames, 1)


def parse_bmp_header(buf: bytes) -> tuple[int, int] | None:
    """(width, height) of an uncompressed-or-not BMP file, else None."""
    if len(buf) < 54 or buf[:2] != b"BM":
        return None
    w = int.from_bytes(buf[18:22], "little", signed=True)
    h = abs(int.from_bytes(buf[22:26], "little", signed=True))
    return (w, h) if w > 0 and h > 0 else None


def parse_ico_header(buf: bytes) -> tuple[int, int, int] | None:
    """(width, height of the largest entry, entry count) of an ICO/CUR
    payload, else None. The 4-byte magic is weak, so the directory must
    also be structurally plausible before we claim the mime."""
    if len(buf) < 6 or buf[0:2] != b"\x00\x00" or buf[2:4] not in (b"\x01\x00", b"\x02\x00"):
        return None
    count = int.from_bytes(buf[4:6], "little")
    if count == 0 or 6 + 16 * count > len(buf):
        return None
    best = None
    for i in range(count):
        e = buf[6 + 16 * i : 6 + 16 * (i + 1)]
        size = int.from_bytes(e[8:12], "little")
        off = int.from_bytes(e[12:16], "little")
        if size == 0 or off + size > len(buf):
            return None  # implausible directory — not an ICO
        w, h = e[0] or 256, e[1] or 256
        if best is None or w * h > best[0] * best[1]:
            best = (w, h)
    return best[0], best[1], count


def parse_ogg_header(buf: bytes) -> tuple[str, int, int, float] | None:
    """(codec, channels, sample_rate, duration_s) of an Ogg stream
    (public RFC 3533 container + the Vorbis/Opus identification
    headers), else None. Duration comes from the LAST page's granule
    position — sample count for Vorbis, 48 kHz ticks minus pre-skip
    for Opus — no packet decode needed."""
    if len(buf) < 28 or buf[:4] != b"OggS":
        return None
    codec = None
    channels = rate = 0
    pre_skip = 0
    last_granule = 0
    pos = 0
    while pos + 27 <= len(buf):
        if buf[pos : pos + 4] != b"OggS":
            break
        granule = int.from_bytes(buf[pos + 6 : pos + 14], "little", signed=True)
        if granule > 0:
            last_granule = granule
        nsegs = buf[pos + 26]
        seg_table = buf[pos + 27 : pos + 27 + nsegs]
        if len(seg_table) < nsegs:
            break
        body = pos + 27 + nsegs
        size = sum(seg_table)
        payload = buf[body : body + size]
        if codec is None:
            if payload[:8] == b"OpusHead" and len(payload) >= 19:
                codec = "opus"
                channels = payload[9]
                pre_skip = int.from_bytes(payload[10:12], "little")
                rate = 48000  # granule positions are always 48 kHz ticks
            elif payload[:7] == b"\x01vorbis" and len(payload) >= 30:
                codec = "vorbis"
                channels = payload[11]
                rate = int.from_bytes(payload[12:16], "little")
        pos = body + size
    if codec is None or rate == 0:
        return None
    ticks = max(last_granule - (pre_skip if codec == "opus" else 0), 0)
    return codec, channels, rate, ticks / rate


def decode_header(buf: bytes) -> tuple[str, int | None, int | None, int]:
    """Sniff + parse a payload's real header: (mime, width, height,
    n_frames). PNG → (w, h, 1 frame); WAV → (NULL, NULL, audio frames);
    anything else quarantines as octet-stream with zero frames."""
    png = parse_png_header(buf)
    if png is not None:
        return "image/png", png[0], png[1], parse_apng_frame_count(buf)
    gif = parse_gif_header(buf)
    if gif is not None:
        return "image/gif", gif[0], gif[1], gif[2]
    jpg = parse_jpeg_header(buf)
    if jpg is not None:
        return "image/jpeg", jpg[0], jpg[1], 1
    avi = parse_avi_header(buf)
    if avi is not None:
        return "video/x-msvideo", avi[0], avi[1], avi[2]
    from .mp4 import parse_mp4_header

    mp4 = parse_mp4_header(buf)
    if mp4 is not None:
        return "video/mp4", mp4[0], mp4[1], mp4[2]
    webp = parse_webp_header(buf)
    if webp is not None:
        return "image/webp", webp[0], webp[1], webp[2]
    wav = parse_wav_header(buf)
    if wav is not None:
        return "audio/wav", None, None, wav[3]
    mp3 = parse_mp3_header(buf)
    if mp3 is not None:
        return "audio/mpeg", None, None, mp3[2]
    from .flac import parse_flac_header

    flac = parse_flac_header(buf)
    if flac is not None:
        return "audio/flac", None, None, flac[3]
    ogg = parse_ogg_header(buf)
    if ogg is not None:
        return "audio/ogg", None, None, int(ogg[3] * ogg[2])
    from .tiff import parse_tiff_header

    tif = parse_tiff_header(buf)
    if tif is not None:
        return "image/tiff", tif[0], tif[1], 1
    bmp = parse_bmp_header(buf)
    if bmp is not None:
        return "image/bmp", bmp[0], bmp[1], 1
    ico = parse_ico_header(buf)
    if ico is not None:
        return "image/x-icon", ico[0], ico[1], ico[2]
    return "application/octet-stream", None, None, 0


def decode_pixels(buf: bytes):
    """Full pixel/sample decode. PNG, GIF, JPEG (baseline + progressive) and PCM WAV
    decode with nothing but stdlib+numpy (functions/pixels.py: zlib
    inflate + scanline unfiltering; pure-Python GIF-LZW + palette
    composite; functions/jpeg.py: Huffman + dequant + matrix IDCT;
    RIFF data chunk + frombuffer); the one format that genuinely needs
    a codec library (compressed AVI/MP4 frame payloads) — and the
    remaining JPEG modes (arithmetic/12-bit/hierarchical) — raise
    NotImplementedError.

    Returns the raw array: (h, w, channels) uint8 for PNG/JPEG,
    (n_frames, h, w, 3) uint8 for GIF/AVI, ((n_frames, channels),
    rate) for WAV. The bounded-feature production path is
    ``pixels.featurize_pixels``."""
    from .avi import decode_avi_frames
    from .jpeg import decode_jpeg_pixels
    from .pixels import decode_gif_pixels, decode_png_pixels, decode_wav_samples

    if buf[:8] == _PNG_SIGNATURE:
        return decode_png_pixels(buf)
    if len(buf) >= 6 and buf[:6] in (b"GIF87a", b"GIF89a"):
        return decode_gif_pixels(buf)
    if len(buf) >= 2 and buf[:2] == b"\xff\xd8":
        return decode_jpeg_pixels(buf)
    if len(buf) >= 12 and buf[:4] == b"RIFF" and buf[8:12] == b"WAVE":
        return decode_wav_samples(buf)
    if len(buf) >= 12 and buf[:4] == b"RIFF" and buf[8:12] == b"AVI ":
        return decode_avi_frames(buf)
    raise NotImplementedError(
        "payload decode is stdlib-supported for PNG, GIF, JPEG (baseline + progressive), "
        "PCM WAV and MJPEG/raw-DIB AVI; other codecs (H.264, MPEG-4, "
        "arithmetic JPEG, ...) need a codec library"
    )


def _fake_decode(buf: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for a codec: derives (width, height,
    n_frames) from the payload bytes. Used by the driver-oracle query so
    the full Spark path stays executable and hash-checkable anywhere."""
    n = len(buf)
    w = 16 + (n % 64)
    h = 16 + ((n // 64) % 64)
    frames = 1 + (n % 8)
    return w, h, frames


def featurize_media(media: DataFrame, fake: bool = True, frame_step: int = 2) -> DataFrame:
    """Decode → feature-extract → frame-sample over Arrow batches.

    One ``mapInPandas`` pass per partition: each batch arrives as a
    pandas DataFrame with the binary payload as Python bytes.
    ``fake=False`` runs the real stdlib header decode (PNG/WAV);
    ``fake=True`` the deterministic pseudo-codec. ``checksum`` is a
    plain byte sum — a cheap integrity fingerprint the oracle can
    recompute. The real path caps ``sampled_frames`` at
    ``MAX_SAMPLED_FRAMES`` indices (audio frame counts are unbounded).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for item_id, payload, meta in zip(
                pdf["item_id"], pdf["payload"], pdf["meta"]
            ):
                buf = bytes(payload) if payload is not None else b""
                if fake:
                    w, h, frames = _fake_decode(buf)
                    mime = meta["mime"]
                    sampled = list(range(0, frames, frame_step))
                else:
                    mime, w, h, frames = decode_header(buf)
                    sampled = list(range(0, frames, frame_step))[:MAX_SAMPLED_FRAMES]
                rows.append(
                    {
                        "item_id": item_id,
                        "mime": mime,
                        "n_bytes": len(buf),
                        "width": w,
                        "height": h,
                        "n_frames": frames,
                        "sampled_frames": sampled,
                        "checksum": sum(buf) if buf else 0,
                    }
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(run, schema=MEDIA_FEATURES_SCHEMA)
