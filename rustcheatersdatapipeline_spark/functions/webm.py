"""WebM (Matroska/EBML) demux for VP8 video — pure stdlib.

Walks the public EBML structure (RFC 8794) and the Matroska/WebM
element vocabulary far enough to extract a VP8 track's frames and feed
them through :class:`.vp8.Vp8Decoder` — the container real-world VP8
video actually ships in (IVF is the test-stream carrier; WebM is the
crawl-data carrier).  Reference parity: the reference pipeline stores
media opaquely (dags/custom_operators/SteamToS3Operator.py); this is
engine extension surface feeding sample_frames/video-phash like AVI.

Supported: EBML header + Segment (sized or unknown-size), Info
(TimecodeScale), Tracks (TrackEntry: number/type/CodecID/Video dims),
Clusters (sized or unknown-size, children-terminated) with SimpleBlock
and BlockGroup/Block frames in storage order, and all three block
lacing modes (Xiph / fixed / EBML signed-delta sizes).  Named
boundary: non-VP8 codec IDs.
"""

from __future__ import annotations

import numpy as np

# ----------------------------------------------------------- EBML parsing

_UNKNOWN = -1  # unknown-size marker (all value bits set)

# element IDs (with the length-marker bits, as stored)
_EBML_HEADER = 0x1A45DFA3
_SEGMENT = 0x18538067
_INFO = 0x1549A966
_TIMECODE_SCALE = 0x2AD7B1
_TRACKS = 0x1654AE6B
_TRACK_ENTRY = 0xAE
_TRACK_NUMBER = 0xD7
_TRACK_TYPE = 0x83
_CODEC_ID = 0x86
_VIDEO = 0xE0
_PIXEL_WIDTH = 0xB0
_PIXEL_HEIGHT = 0xBA
_CLUSTER = 0x1F43B675
_TIMECODE = 0xE7
_SIMPLE_BLOCK = 0xA3
_BLOCK_GROUP = 0xA0
_BLOCK = 0xA1
_CODEC_PRIVATE = 0x63A2

#: elements that may legally appear inside a Cluster — used to find the
#: end of an unknown-size cluster without a byte scan
_CLUSTER_CHILDREN = {
    _TIMECODE, _SIMPLE_BLOCK, _BLOCK_GROUP, 0xAB, 0x5854, 0xA7, 0xBF
}


def _read_id(buf: bytes, pos: int) -> tuple[int, int]:
    """EBML element ID: 1-4 bytes, length-marker bits KEPT."""
    if pos >= len(buf):
        raise ValueError("WebM: truncated element id")
    first = buf[pos]
    if first == 0:
        raise ValueError("WebM: invalid element id")
    n = 1
    mask = 0x80
    while not (first & mask):
        mask >>= 1
        n += 1
        if n > 4:
            raise ValueError("WebM: element id longer than 4 bytes")
    if pos + n > len(buf):
        raise ValueError("WebM: truncated element id")
    return int.from_bytes(buf[pos : pos + n], "big"), pos + n


def _read_size(buf: bytes, pos: int) -> tuple[int, int]:
    """EBML data size: 1-8 byte VINT, marker bit cleared; all value
    bits set means 'unknown size'."""
    if pos >= len(buf):
        raise ValueError("WebM: truncated element size")
    first = buf[pos]
    if first == 0:
        raise ValueError("WebM: invalid element size")
    n = 1
    mask = 0x80
    while not (first & mask):
        mask >>= 1
        n += 1
        if n > 8:
            raise ValueError("WebM: element size longer than 8 bytes")
    if pos + n > len(buf):
        raise ValueError("WebM: truncated element size")
    value = int.from_bytes(buf[pos : pos + n], "big") & ~(mask << (8 * (n - 1)))
    if value == (1 << (7 * n)) - 1:
        return _UNKNOWN, pos + n
    return value, pos + n


def _uint(data: bytes) -> int:
    return int.from_bytes(data, "big")


def _walk(buf: bytes, pos: int, end: int):
    """Yield (element_id, payload_start, payload_end, next_pos) for the
    sized children of [pos, end); unknown-size children are yielded
    with payload_end == -1 and next_pos at the payload start."""
    while pos < end:
        eid, p = _read_id(buf, pos)
        size, p = _read_size(buf, p)
        if size == _UNKNOWN:
            yield eid, p, _UNKNOWN, p
            return  # caller decides how far the unknown element runs
        stop = p + size
        if stop > end:
            raise ValueError("WebM: element extends past its parent")
        yield eid, p, stop, stop
        pos = stop


def _parse_track_entry(buf: bytes, start: int, end: int) -> dict:
    out = {"number": None, "type": None, "codec": None, "w": None, "h": None,
           "private": None}
    for eid, p, stop, _nxt in _walk(buf, start, end):
        if stop == _UNKNOWN:
            raise ValueError("WebM: unknown-size element inside TrackEntry")
        if eid == _CODEC_PRIVATE:
            out["private"] = buf[p:stop]
        elif eid == _TRACK_NUMBER:
            out["number"] = _uint(buf[p:stop])
        elif eid == _TRACK_TYPE:
            out["type"] = _uint(buf[p:stop])
        elif eid == _CODEC_ID:
            out["codec"] = buf[p:stop].rstrip(b"\x00").decode("ascii", "replace")
        elif eid == _VIDEO:
            for vid, vp, vstop, _ in _walk(buf, p, stop):
                if vid == _PIXEL_WIDTH:
                    out["w"] = _uint(buf[vp:vstop])
                elif vid == _PIXEL_HEIGHT:
                    out["h"] = _uint(buf[vp:vstop])
    return out


def _read_vint(buf: bytes, pos: int) -> tuple[int, int]:
    """Plain VINT (no unknown-size semantics) — block track numbers."""
    if pos >= len(buf):
        raise ValueError("WebM: truncated vint")
    first = buf[pos]
    if first == 0:
        raise ValueError("WebM: invalid vint")
    n = 1
    mask = 0x80
    while not (first & mask):
        mask >>= 1
        n += 1
        if n > 8:
            raise ValueError("WebM: vint longer than 8 bytes")
    if pos + n > len(buf):
        raise ValueError("WebM: truncated vint")
    value = int.from_bytes(buf[pos : pos + n], "big") & ~(mask << (8 * (n - 1)))
    return value, pos + n


def _read_svint(buf: bytes, pos: int) -> tuple[int, int]:
    """Signed VINT (EBML lacing deltas): unsigned VINT minus the
    mid-range bias (2^(7n-1) - 1)."""
    first = buf[pos] if pos < len(buf) else 0
    n = 1
    mask = 0x80
    while n <= 8 and not (first & mask):
        mask >>= 1
        n += 1
    v, q = _read_vint(buf, pos)
    return v - ((1 << (7 * n - 1)) - 1), q


def _block_frames(buf: bytes, p: int, stop: int, track: int) -> list[bytes]:
    """Frame payloads of a (Simple)Block for ``track`` ([] if another
    track's) — all three lacing modes (RFC 9559 §10: Xiph 255-run
    sizes, fixed equal division, EBML VINT + signed-delta sizes)."""
    tn, q = _read_vint(buf, p)
    if q + 3 > stop:
        raise ValueError("WebM: truncated block header")
    flags = buf[q + 2]
    q += 3
    if tn != track:
        return []
    lacing = (flags >> 1) & 0x3
    if lacing == 0:
        return [buf[q:stop]]
    if q >= stop:
        raise ValueError("WebM: laced block missing frame count")
    n_frames = buf[q] + 1
    q += 1
    sizes: list[int] = []
    if lacing == 2:  # fixed: equal division of the remaining bytes
        total = stop - q
        if n_frames == 0 or total % n_frames:
            raise ValueError("WebM: fixed lacing does not divide evenly")
        sizes = [total // n_frames] * n_frames
    elif lacing == 1:  # Xiph: 255-run sums for all but the last frame
        for _ in range(n_frames - 1):
            s = 0
            while True:
                if q >= stop:
                    raise ValueError("WebM: truncated Xiph lacing sizes")
                s += buf[q]
                last = buf[q]
                q += 1
                if last != 255:
                    break
            sizes.append(s)
        sizes.append(stop - q - sum(sizes))
    else:  # EBML: first size as VINT, then signed deltas
        s, q = _read_vint(buf, q)
        if q > stop:
            raise ValueError("WebM: truncated EBML lacing sizes")
        sizes.append(s)
        for _ in range(n_frames - 2):
            d, q = _read_svint(buf, q)
            if q > stop:
                raise ValueError("WebM: truncated EBML lacing sizes")
            sizes.append(sizes[-1] + d)
        if n_frames >= 2:
            sizes.append(stop - q - sum(sizes))
    out = []
    for s in sizes:
        if s < 0 or q + s > stop:
            raise ValueError("WebM: lacing sizes exceed the block")
        out.append(buf[q : q + s])
        q += s
    if q != stop:
        raise ValueError("WebM: lacing sizes do not cover the block")
    return out


def _segment_layout(buf: bytes):
    """(track entries, cluster (start, end|UNKNOWN) list, seg_end) of a
    WebM/Matroska stream — the shared walk behind the video and audio
    iterators."""
    if len(buf) < 4 or buf[:4] != b"\x1aE\xdf\xa3":
        raise ValueError("WebM: bad EBML signature")
    # EBML header
    eid, p = _read_id(buf, 0)
    size, p = _read_size(buf, p)
    if size == _UNKNOWN:
        raise ValueError("WebM: unknown-size EBML header")
    pos = p + size
    # Segment
    eid, p = _read_id(buf, pos)
    if eid != _SEGMENT:
        raise ValueError("WebM: missing Segment element")
    size, p = _read_size(buf, p)
    seg_end = len(buf) if size == _UNKNOWN else p + size
    if seg_end > len(buf):
        raise ValueError("WebM: Segment extends past payload")

    entries = []
    saw_tracks = False
    pos = p
    cluster_positions = []
    while pos < seg_end:
        eid, q = _read_id(buf, pos)
        size, q = _read_size(buf, q)
        if eid == _CLUSTER:
            cluster_positions.append((q, _UNKNOWN if size == _UNKNOWN else q + size))
            if size == _UNKNOWN:
                # children-terminated: advance by parsing cluster children
                pos = _cluster_end(buf, q, seg_end)
            else:
                pos = q + size
            continue
        if size == _UNKNOWN:
            raise ValueError("WebM: unknown-size non-cluster element")
        if eid == _TRACKS:
            saw_tracks = True
            for tid, tp, tstop, _ in _walk(buf, q, q + size):
                if tid == _TRACK_ENTRY:
                    entries.append(_parse_track_entry(buf, tp, tstop))
        pos = q + size
    if not saw_tracks:
        raise ValueError("WebM: no Tracks element")
    return entries, cluster_positions, seg_end


def _iter_track_payloads(buf: bytes, track: int, cluster_positions, seg_end):
    for cstart, cend in cluster_positions:
        end = _cluster_end(buf, cstart, seg_end) if cend == _UNKNOWN else cend
        for eid, p, stop, _ in _walk(buf, cstart, end):
            if stop == _UNKNOWN:
                raise ValueError("WebM: nested unknown-size cluster child")
            if eid == _SIMPLE_BLOCK:
                yield from _block_frames(buf, p, stop, track)
            elif eid == _BLOCK_GROUP:
                for gid, gp, gstop, _ in _walk(buf, p, stop):
                    if gid == _BLOCK:
                        yield from _block_frames(buf, gp, gstop, track)


def iter_webm_vp8_frames(buf: bytes):
    """Yield the VP8 track's frame payloads in storage order."""
    entries, clusters, seg_end = _segment_layout(buf)
    track = next(
        (e["number"] for e in entries if e["type"] == 1 and e["codec"] == "V_VP8"),
        None,
    )
    if track is None:
        if entries:
            raise NotImplementedError(
                "WebM: no V_VP8 video track (other codecs need a codec "
                "library)"
            )
        raise ValueError("WebM: no Tracks element")
    yield from _iter_track_payloads(buf, track, clusters, seg_end)


def _xiph_unlace(private: bytes) -> list[bytes]:
    """CodecPrivate Xiph lacing (Matroska spec): count-1 byte, then
    255-run sizes for all but the last packet, remainder is last."""
    if not private:
        raise ValueError("WebM: empty CodecPrivate")
    n = private[0] + 1
    sizes = []
    pos = 1
    for _ in range(n - 1):
        v = 0
        while True:
            if pos >= len(private):
                raise ValueError("WebM: truncated Xiph lacing")
            b = private[pos]
            pos += 1
            v += b
            if b != 255:
                break
        sizes.append(v)
    out = []
    for sz in sizes:
        if pos + sz > len(private):
            raise ValueError("WebM: Xiph-laced packet past end")
        out.append(private[pos : pos + sz])
        pos += sz
    out.append(private[pos:])
    return out


def decode_webm_audio(buf: bytes):
    """Decode a WebM file's Vorbis audio track → (int16 (n, ch), rate):
    the A_VORBIS CodecPrivate carries the three Vorbis header packets
    Xiph-laced; cluster blocks carry raw audio packets. Other audio
    codecs (A_OPUS is range/arithmetic-coded, A_AAC per functions/
    aac.py) raise the named boundary."""
    from .vorbis import decode_vorbis_packets

    entries, clusters, seg_end = _segment_layout(buf)
    audio = [e for e in entries if e["type"] == 2]
    vorbis = next((e for e in audio if e["codec"] == "A_VORBIS"), None)
    if vorbis is None:
        if audio:
            raise NotImplementedError(
                f"WebM: audio codec {audio[0]['codec']} payload decode"
            )
        raise ValueError("WebM: no audio track")
    if not vorbis["private"]:
        raise ValueError("WebM: A_VORBIS track without CodecPrivate")
    headers = _xiph_unlace(vorbis["private"])
    if len(headers) != 3:
        raise ValueError("WebM: A_VORBIS CodecPrivate must lace 3 packets")
    packets = headers + list(
        _iter_track_payloads(buf, vorbis["number"], clusters, seg_end)
    )
    return decode_vorbis_packets(packets)


def _cluster_end(buf: bytes, start: int, seg_end: int) -> int:
    """End offset of an unknown-size cluster: children-terminated per
    RFC 8794 (the first element that is not a valid cluster child)."""
    pos = start
    while pos < seg_end:
        eid, p = _read_id(buf, pos)
        if eid not in _CLUSTER_CHILDREN:
            return pos
        size, p = _read_size(buf, p)
        if size == _UNKNOWN:
            raise ValueError("WebM: unknown-size cluster child")
        pos = p + size
    return seg_end


def decode_webm_frames(buf: bytes) -> np.ndarray:
    """Decode a WebM file's VP8 track → (n, h, w, 4) RGBA of the shown
    frames, through the stateful interframe decoder."""
    from .vp8 import _VP8_MAX_DECODE_BYTES, Vp8Decoder, yuv420_to_rgba

    dec = Vp8Decoder()
    frames: list[np.ndarray] = []
    n_payloads = 0
    for payload in iter_webm_vp8_frames(buf):
        n_payloads += 1
        f = dec.decode(payload)
        if f["header"]["show_frame"]:
            h, w = f["y"].shape
            if (len(frames) + 1) * h * w * 4 > _VP8_MAX_DECODE_BYTES:
                raise ValueError("WebM: decoded size exceeds bound")
            frames.append(yuv420_to_rgba(f["y"], f["u"], f["v"]))
    if not frames:
        raise ValueError(
            "WebM: no shown VP8 frames"
            if n_payloads
            else "WebM: VP8 track has no blocks"
        )
    return np.stack(frames)
