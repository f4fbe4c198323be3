"""MP4 / ISO BMFF container parsing — pure stdlib, payloads opaque.

The modern-crawl companion to the AVI path (functions/avi.py): MP4 is
the dominant video container in 2020s web data, but its codecs (H.264/
H.265/AAC) genuinely need codec libraries, so the scope is exactly what
the container gives away for free (public spec, ISO/IEC 14496-12):

- **box walk**: u32be size + fourcc, 64-bit ``largesize`` and
  size==0 (to-end-of-file) forms handled;
- **metadata**: ``moov/mvhd`` movie timescale+duration, per-``trak``
  ``mdia/mdhd`` timescale+duration, ``hdlr`` handler kind,
  ``stbl/stsd`` codec fourcc and (for visual sample entries)
  width/height, ``stsz`` sample count;
- **keyframe sampling**: ``stss`` sync-sample numbers resolved to BYTE
  RANGES via the ``stsc`` sample-to-chunk + ``stco``/``co64`` chunk
  offsets + ``stsz`` size table — the real plumbing a frame-extraction
  stage needs, with the bitstream itself left opaque.

``decode_mp4_frames`` raises ``NotImplementedError`` naming the codec
fourcc — the same quarantined boundary as AVI's compressed codecs
(avi.py): the pipeline carries the payloads, indexes the metadata, and
never crashes a task on them.

Reference note: the reference pipeline (RustCheatersDataPipeline) has
no media handling at all — this module is engine extension surface for
the 100 TB training-data mission.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame

#: sanity ceiling on table entry counts — a crafted header declaring
#: billions of samples must fail parsing, not allocate
_MAX_TABLE_ENTRIES = 1 << 22


def _boxes(buf: bytes, pos: int, end: int) -> Iterator[tuple[bytes, int, int]]:
    """(fourcc, body offset, body end) for each box in [pos, end);
    stops at the first malformed size rather than guessing."""
    while pos + 8 <= end:
        size = int.from_bytes(buf[pos : pos + 4], "big")
        four = buf[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:  # 64-bit largesize follows the fourcc
            if pos + 16 > end:
                return
            size = int.from_bytes(buf[pos + 8 : pos + 16], "big")
            body = pos + 16
        elif size == 0:  # box extends to end of enclosing scope
            size = end - pos
        if size < body - pos or pos + size > end:
            return
        yield four, body, pos + size
        pos += size


def _find(buf: bytes, pos: int, end: int, path: tuple[bytes, ...]) -> tuple[int, int] | None:
    """Body range of the first box at a nested fourcc path."""
    for four, body, box_end in _boxes(buf, pos, end):
        if four == path[0]:
            if len(path) == 1:
                return body, box_end
            return _find(buf, body, box_end, path[1:])
    return None


def _u32s(buf: bytes, pos: int, n: int) -> list[int]:
    if n > _MAX_TABLE_ENTRIES or pos + 4 * n > len(buf):
        raise ValueError("MP4: table overruns its box")
    return [int.from_bytes(buf[pos + 4 * i : pos + 4 * i + 4], "big") for i in range(n)]


def _full_box(buf: bytes, body: int) -> tuple[int, int]:
    """(version, first-field offset) of a FullBox body."""
    return buf[body], body + 4


def _mvhd_times(buf: bytes, body: int, end: int) -> tuple[int, int] | None:
    """(timescale, duration) from an mvhd/mdhd body (both share the
    version-dependent layout: v0 u32 times after 2 u32 dates, v1 u64)."""
    if body >= end:
        return None
    version, p = _full_box(buf, body)
    if version == 1:
        p += 16  # creation + modification (u64 each)
        if p + 12 > end:
            return None
        ts = int.from_bytes(buf[p : p + 4], "big")
        dur = int.from_bytes(buf[p + 4 : p + 12], "big")
    else:
        p += 8  # creation + modification (u32 each)
        if p + 8 > end:
            return None
        ts = int.from_bytes(buf[p : p + 4], "big")
        dur = int.from_bytes(buf[p + 4 : p + 8], "big")
    return (ts, dur) if ts > 0 else None


_VISUAL_HANDLERS = {b"vide"}


def _parse_stsd(buf: bytes, body: int, end: int, visual: bool) -> dict:
    """Codec fourcc (+ dimensions for visual sample entries) from the
    first sample description entry."""
    _, p = _full_box(buf, body)
    count = int.from_bytes(buf[p : p + 4], "big")
    out: dict = {"codec": None, "width": None, "height": None}
    if count < 1:
        return out
    entry = p + 4
    if entry + 8 > end:
        return out
    out["codec"] = buf[entry + 4 : entry + 8].decode("ascii", "replace").strip()
    if visual and entry + 8 + 28 <= end:
        # VisualSampleEntry: 6 reserved + 2 dri + 16 pre_defined/reserved,
        # then u16 width, u16 height (ISO 14496-12 §12.1.3)
        out["width"] = int.from_bytes(buf[entry + 8 + 24 : entry + 8 + 26], "big")
        out["height"] = int.from_bytes(buf[entry + 8 + 26 : entry + 8 + 28], "big")
    if out["codec"] in ("avc1", "avc3"):
        # VisualSampleEntry body is 78 bytes; child boxes follow —
        # the avcC decoder-config record carries SPS/PPS (ISO 14496-15)
        for four, b2, e2 in _boxes(buf, entry + 8 + 78, end):
            if four == b"avcC":
                from .h264 import parse_avcc_config

                try:
                    out["h264"] = parse_avcc_config(buf[b2:e2])
                except ValueError:
                    pass
                break
    if out["codec"] == "mp4a":
        # AudioSampleEntry body is 28 bytes; the esds child carries the
        # AudioSpecificConfig (object type / rate / channels)
        for four, b2, e2 in _boxes(buf, entry + 8 + 28, end):
            if four == b"esds":
                from .aac import (
                    parse_audio_specific_config,
                    parse_esds_config,
                )

                _, p2 = _full_box(buf, b2)
                try:
                    cfg = parse_esds_config(buf[p2:e2])
                    if cfg:
                        out["aac"] = parse_audio_specific_config(cfg)
                except ValueError:
                    pass
                break
    return out


def _parse_stsz(buf: bytes, body: int, end: int) -> tuple[int, list[int] | None]:
    """(sample_count, per-sample sizes or None when uniform)."""
    _, p = _full_box(buf, body)
    uniform = int.from_bytes(buf[p : p + 4], "big")
    count = int.from_bytes(buf[p + 4 : p + 8], "big")
    if uniform:
        return count, None
    return count, _u32s(buf, p + 8, count)


def _track_info(buf: bytes, body: int, end: int) -> dict | None:
    """Metadata dict for one trak box, or None when mdia is absent."""
    mdia = _find(buf, body, end, (b"mdia",))
    if mdia is None:
        return None
    info: dict = {
        "kind": None, "codec": None, "width": None, "height": None,
        "timescale": None, "duration_s": None, "n_samples": 0,
        "sync_samples": [],
    }
    hdlr = _find(buf, *mdia, (b"hdlr",))
    visual = False
    if hdlr is not None:
        _, p = _full_box(buf, hdlr[0])
        handler = buf[p + 4 : p + 8]
        visual = handler in _VISUAL_HANDLERS
        info["kind"] = {b"vide": "video", b"soun": "audio"}.get(
            handler, handler.decode("ascii", "replace").strip() or None
        )
    mdhd = _find(buf, *mdia, (b"mdhd",))
    if mdhd is not None:
        times = _mvhd_times(buf, *mdhd)
        if times is not None:
            info["timescale"] = times[0]
            info["duration_s"] = times[1] / times[0]
    stbl = _find(buf, *mdia, (b"minf", b"stbl"))
    if stbl is not None:
        stsd = _find(buf, *stbl, (b"stsd",))
        if stsd is not None:
            info.update(_parse_stsd(buf, *stsd, visual))
        stsz = _find(buf, *stbl, (b"stsz",))
        if stsz is not None:
            info["n_samples"] = _parse_stsz(buf, *stsz)[0]
        stss = _find(buf, *stbl, (b"stss",))
        if stss is not None:
            _, p = _full_box(buf, stss[0])
            n = int.from_bytes(buf[p : p + 4], "big")
            info["sync_samples"] = _u32s(buf, p + 4, n)
        elif info["n_samples"]:
            # no stss box means EVERY sample is a sync sample (spec)
            info["sync_samples"] = list(range(1, info["n_samples"] + 1))
    return info


def mp4_metadata(buf: bytes) -> dict:
    """Container metadata of an MP4/ISO-BMFF payload: major brand,
    movie duration, and per-track kind/codec/dimensions/timing/sample
    counts + sync-sample numbers. Raises ValueError for non-MP4 bytes
    or a payload whose moov cannot be walked."""
    ftyp = _find(buf, 0, len(buf), (b"ftyp",))
    if ftyp is None:
        raise ValueError("not an MP4 payload (no ftyp box)")
    out: dict = {
        "major_brand": buf[ftyp[0] : ftyp[0] + 4].decode("ascii", "replace").strip(),
        "timescale": None,
        "duration_s": None,
        "tracks": [],
    }
    moov = _find(buf, 0, len(buf), (b"moov",))
    if moov is None:
        raise ValueError("MP4: no moov box")
    mvhd = _find(buf, *moov, (b"mvhd",))
    if mvhd is not None:
        times = _mvhd_times(buf, *mvhd)
        if times is not None:
            out["timescale"], dur = times
            out["duration_s"] = dur / times[0]
    for four, body, end in _boxes(buf, *moov):
        if four == b"trak":
            t = _track_info(buf, body, end)
            if t is not None:
                out["tracks"].append(t)
    return out


def parse_mp4_header(buf: bytes) -> tuple[int | None, int | None, int] | None:
    """(width, height, n_samples of the first video track) for
    ``decode_header`` integration, else None — total like the other
    header sniffers (any malformed structure → None, never a raise)."""
    if len(buf) < 12 or buf[4:8] != b"ftyp":
        return None
    try:
        meta = mp4_metadata(buf)
    except (ValueError, IndexError):
        return None
    video = [t for t in meta["tracks"] if t["kind"] == "video"]
    if video:
        v = video[0]
        return v["width"], v["height"], v["n_samples"]
    if meta["tracks"]:
        t = meta["tracks"][0]
        return None, None, t["n_samples"]
    return None, None, 0


def _sample_ranges(buf: bytes, stbl_body: int, stbl_end: int) -> list[tuple[int, int]]:
    """(absolute byte offset, size) for every sample of one track,
    resolved from stsc (sample→chunk runs) + stco/co64 (chunk offsets)
    + stsz (sizes) — the complete public mapping (ISO 14496-12 §8.7)."""
    stsz = _find(buf, stbl_body, stbl_end, (b"stsz",))
    stsc = _find(buf, stbl_body, stbl_end, (b"stsc",))
    stco = _find(buf, stbl_body, stbl_end, (b"stco",))
    co64 = _find(buf, stbl_body, stbl_end, (b"co64",))
    if stsz is None or stsc is None or (stco is None and co64 is None):
        raise ValueError("MP4: incomplete sample tables (stsz/stsc/stco)")
    count, sizes = _parse_stsz(buf, *stsz)
    if sizes is None:
        _, p = _full_box(buf, stsz[0])
        sizes = [int.from_bytes(buf[p : p + 4], "big")] * count
    if stco is not None:
        _, p = _full_box(buf, stco[0])
        n = int.from_bytes(buf[p : p + 4], "big")
        offsets = _u32s(buf, p + 4, n)
    else:
        _, p = _full_box(buf, co64[0])
        n = int.from_bytes(buf[p : p + 4], "big")
        if n > _MAX_TABLE_ENTRIES or p + 4 + 8 * n > len(buf):
            raise ValueError("MP4: co64 table overruns its box")
        offsets = [
            int.from_bytes(buf[p + 4 + 8 * i : p + 12 + 8 * i], "big") for i in range(n)
        ]
    _, p = _full_box(buf, stsc[0])
    n_runs = int.from_bytes(buf[p : p + 4], "big")
    runs = [
        tuple(_u32s(buf, p + 4 + 12 * i, 3))  # first_chunk, samples/chunk, sdi
        for i in range(min(n_runs, _MAX_TABLE_ENTRIES))
    ]
    ranges: list[tuple[int, int]] = []
    sample = 0
    for ri, (first, per_chunk, _sdi) in enumerate(runs):
        if first < 1:  # chunks are 1-based; 0 would negative-index stco
            raise ValueError("MP4: stsc first_chunk must be >= 1")
        last = runs[ri + 1][0] - 1 if ri + 1 < len(runs) else len(offsets)
        for chunk in range(first, last + 1):
            if chunk - 1 >= len(offsets) or sample >= count:
                break
            pos = offsets[chunk - 1]
            for _ in range(per_chunk):
                if sample >= count:
                    break
                ranges.append((pos, sizes[sample]))
                pos += sizes[sample]
                sample += 1
    if sample < count:
        raise ValueError("MP4: sample tables cover fewer samples than stsz declares")
    return ranges


def _video_track_id(buf: bytes, moov: tuple[int, int]) -> tuple[int, dict] | None:
    """(track_id from tkhd, track info) of the first video trak."""
    for four, body, end in _boxes(buf, *moov):
        if four != b"trak":
            continue
        mdia = _find(buf, body, end, (b"mdia",))
        if mdia is None:
            continue
        hdlr = _find(buf, *mdia, (b"hdlr",))
        if hdlr is None:
            continue
        _, p = _full_box(buf, hdlr[0])
        if buf[p + 4 : p + 8] != b"vide":
            continue
        tkhd = _find(buf, body, end, (b"tkhd",))
        track_id = None
        if tkhd is not None:
            version, q = _full_box(buf, tkhd[0])
            q += 16 if version == 1 else 8  # creation+modification times
            track_id = int.from_bytes(buf[q : q + 4], "big")
        return track_id, {"body": body, "end": end, "mdia": mdia}
    return None


#: trun/tfhd sample flag: bit 16 of sample_flags = sample_is_non_sync
_NON_SYNC_FLAG = 0x00010000


def _fragment_ranges(buf: bytes, track_id: int | None) -> list[tuple[int, int, int]]:
    """(sample number, offset, size) of every SYNC sample carried in
    movie fragments (moof/traf/trun — the DASH/CMAF layout where the
    moov sample tables are empty and samples stream in fragments).
    Offsets follow the spec default base: base_data_offset = start of
    the moof box, overridable by tfhd; trun data_offset is relative to
    that base. Sync detection: first_sample_flags / per-sample flags /
    tfhd default_sample_flags (bit ``sample_is_non_sync``)."""
    out: list[tuple[int, int, int]] = []
    sample_no = 0
    for four, moof_body, moof_end in _boxes(buf, 0, len(buf)):
        if four != b"moof":
            continue
        moof_start = moof_body - 8
        for t4, traf_body, traf_end in _boxes(buf, moof_body, moof_end):
            if t4 != b"traf":
                continue
            tfhd = _find(buf, traf_body, traf_end, (b"tfhd",))
            if tfhd is None:
                continue
            _, p = _full_box(buf, tfhd[0])
            flags = int.from_bytes(buf[tfhd[0] + 1 : tfhd[0] + 4], "big")
            tid = int.from_bytes(buf[p : p + 4], "big")
            if track_id is not None and tid != track_id:
                continue
            q = p + 4
            base = moof_start
            if flags & 0x000001:  # base-data-offset-present
                base = int.from_bytes(buf[q : q + 8], "big")
                q += 8
            if flags & 0x000002:  # sample-description-index-present
                q += 4
            if flags & 0x000008:  # default-sample-duration-present
                q += 4
            default_size = None
            if flags & 0x000010:  # default-sample-size-present
                default_size = int.from_bytes(buf[q : q + 4], "big")
                q += 4
            default_flags = 0
            if flags & 0x000020:  # default-sample-flags-present
                default_flags = int.from_bytes(buf[q : q + 4], "big")
            for r4, run_body, run_end in _boxes(buf, traf_body, traf_end):
                if r4 != b"trun":
                    continue
                version, rp = _full_box(buf, run_body)
                rflags = int.from_bytes(buf[run_body + 1 : run_body + 4], "big")
                count = int.from_bytes(buf[rp : rp + 4], "big")
                if count > _MAX_TABLE_ENTRIES:
                    raise ValueError("MP4: trun sample count overruns")
                rp += 4
                pos = base
                if rflags & 0x000001:  # data-offset-present
                    pos = base + int.from_bytes(buf[rp : rp + 4], "big", signed=True)
                    rp += 4
                first_flags = None
                if rflags & 0x000004:  # first-sample-flags-present
                    first_flags = int.from_bytes(buf[rp : rp + 4], "big")
                    rp += 4
                for i in range(count):
                    if rflags & 0x000100:  # sample-duration-present
                        rp += 4
                    if rflags & 0x000200:  # sample-size-present
                        size = int.from_bytes(buf[rp : rp + 4], "big")
                        rp += 4
                    elif default_size is not None:
                        size = default_size
                    else:
                        raise ValueError("MP4: trun sample without a size")
                    sflags = default_flags
                    if rflags & 0x000400:  # sample-flags-present
                        sflags = int.from_bytes(buf[rp : rp + 4], "big")
                        rp += 4
                    elif i == 0 and first_flags is not None:
                        sflags = first_flags
                    if rflags & 0x000800:  # composition-time-offset
                        rp += 4
                    if rp > len(buf):
                        raise ValueError("MP4: trun overruns payload")
                    sample_no += 1
                    if not sflags & _NON_SYNC_FLAG:
                        out.append((sample_no, pos, size))
                    pos += size
    return out


def mp4_keyframe_ranges(buf: bytes) -> list[tuple[int, int, int]]:
    """(sample number, byte offset, size) of every SYNC sample of the
    first video track — keyframe sampling without touching the codec:
    the extracted byte ranges are the opaque coded keyframes a
    downstream decoder (or a sampling stage shipping them to one) needs.
    Covers both layouts: classic moov sample tables (stss × stsc × stco
    × stsz) and FRAGMENTED files (moof/traf/trun with empty moov
    tables — the DASH/CMAF shape). Raises ValueError when the payload
    has no video track or incomplete sample tables."""
    moov = _find(buf, 0, len(buf), (b"moov",))
    if moov is None:
        raise ValueError("MP4: no moov box")
    video = _video_track_id(buf, moov)
    if video is None:
        raise ValueError("MP4: no video track")
    track_id, tr = video
    info = _track_info(buf, tr["body"], tr["end"])
    if info["n_samples"] == 0:
        # fragmented layout: samples live in moof/trun, not stbl
        frag = _fragment_ranges(buf, track_id)
        for _s, off, size in frag:
            if off + size > len(buf):
                raise ValueError("MP4: fragment sample range past end of payload")
        if frag:
            return frag
        raise ValueError("MP4: no samples in moov tables or fragments")
    stbl = _find(buf, *tr["mdia"], (b"minf", b"stbl"))
    if stbl is None:
        raise ValueError("MP4: video track without stbl")
    ranges = _sample_ranges(buf, *stbl)
    out = []
    for s in info["sync_samples"]:
        if not 1 <= s <= len(ranges):
            raise ValueError("MP4: stss names a sample outside stsz")
        off, size = ranges[s - 1]
        if off + size > len(buf):
            raise ValueError("MP4: sample range past end of payload")
        out.append((s, off, size))
    return out


def decode_mp4_frames(buf: bytes):
    """Pixel decode is a codec-library boundary, exactly the AVI
    pattern (avi.py): name the codec, quarantine upstream."""
    meta = mp4_metadata(buf)
    video = [t for t in meta["tracks"] if t["kind"] == "video"]
    codec = video[0]["codec"] if video else "unknown"
    raise NotImplementedError(
        f"MP4: coded video ('{codec}') needs a codec library; container "
        "metadata and keyframe byte ranges are available via "
        "mp4_metadata/mp4_keyframe_ranges"
    )


MP4_KEYFRAMES_SCHEMA = (
    "item_id bigint, sample int, codec string, width int, height int, "
    "offset bigint, n_bytes bigint, payload binary"
)


def sample_mp4_keyframes(media: DataFrame, step: int = 1) -> DataFrame:
    """Every ``step``-th sync sample of each MP4 payload as its own row
    with the OPAQUE coded bytes — the MP4 counterpart of
    ``imaging.sample_frames`` with the decode boundary made explicit:
    downstream stages dedup/ship/store the coded keyframes; decoding
    them is the declared codec-library boundary. Non-MP4 or malformed
    payloads emit nothing (quarantine discipline)."""
    if step < 1:
        raise ValueError("sample_mp4_keyframes: step must be >= 1")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "item_id", "sample", "codec", "width", "height",
            "offset", "n_bytes", "payload",
        ]
        for pdf in batches:
            rows = []
            for item_id, payload in zip(pdf["item_id"], pdf["payload"]):
                buf = bytes(payload) if payload is not None else b""
                try:
                    meta = mp4_metadata(buf)
                    video = [t for t in meta["tracks"] if t["kind"] == "video"]
                    if not video:
                        continue
                    v = video[0]
                    ranges = mp4_keyframe_ranges(buf)
                except (NotImplementedError, ValueError, IndexError):
                    continue
                for s, off, size in ranges[::step]:
                    rows.append(
                        {
                            "item_id": item_id,
                            "sample": s,
                            "codec": v["codec"],
                            "width": v["width"],
                            "height": v["height"],
                            "offset": off,
                            "n_bytes": size,
                            "payload": buf[off : off + size],
                        }
                    )
            yield pd.DataFrame(rows, columns=cols)

    return media.mapInPandas(run, schema=MP4_KEYFRAMES_SCHEMA)
