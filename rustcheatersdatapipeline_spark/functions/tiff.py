"""TIFF (public spec 6.0) baseline decode — pure stdlib + numpy.

The scan/archive image format: still the lingua franca of digitized
documents and datasets even where the open web favors JPEG/PNG/WebP.
Scope (named boundaries like every decoder here): the baseline spec —
both byte orders, multi-strip images, compression None / PackBits /
LZW (the TIFF variant: MSB-first packing with the early-change quirk)
/ Deflate (8 and legacy 32946, inflate bounded by the declared strip
size), the horizontal-differencing predictor (tag 317 value 2) on
8-bit samples, 8/16-bit grayscale (both photometric polarities;
16-bit keeps the high byte, the PNG16 policy), RGB incl. 48-bit,
RGBA (extra
sample), palette-color (ColorMap), 1-bit bilevel for the
None/PackBits fax-scan shape, and new-style JPEG (compression 7,
TIFF Tech Note 2): each strip is a self-contained abbreviated JPEG
stream, shared tables arriving via the JPEGTables tag (347) are
spliced in after each strip's SOI before handing the stream to
``functions/jpeg.py``; the TILED layout (tags 322-325) decodes for
every supported compression including JPEG tiles and bilevel tiles,
with predictor differencing restarting per tile row. Old-style JPEG
(compression 6) and the other exotic compressions raise
``NotImplementedError`` with the scheme named.
Only the FIRST IFD (page) decodes — multi-page parity lives in the
frame-sampling layer like GIF/APNG if ever needed.
"""

from __future__ import annotations

import zlib

import numpy as np

_TIFF_MAX_DECODE_BYTES = 1 << 28


def _byte_order(buf: bytes) -> str | None:
    if buf[:4] == b"II*\x00":
        return "little"
    if buf[:4] == b"MM\x00*":
        return "big"
    return None


_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 6: 1, 7: 1}


def _read_ifd(buf: bytes, order: str) -> dict[int, list[int]]:
    """First IFD's tag → value-list map (BYTE/ASCII/SHORT/LONG types)."""
    off = int.from_bytes(buf[4:8], order)
    if off + 2 > len(buf):
        raise ValueError("TIFF: IFD offset out of range")
    n = int.from_bytes(buf[off : off + 2], order)
    tags: dict[int, list[int]] = {}
    for i in range(n):
        e = off + 2 + 12 * i
        if e + 12 > len(buf):
            raise ValueError("TIFF: truncated IFD")
        tag = int.from_bytes(buf[e : e + 2], order)
        typ = int.from_bytes(buf[e + 2 : e + 4], order)
        count = int.from_bytes(buf[e + 4 : e + 8], order)
        size = _TYPE_SIZES.get(typ)
        if size is None or count > 1 << 22:
            continue  # rational/unknown types are metadata we don't need
        total = size * count
        if total <= 4:
            data = buf[e + 8 : e + 8 + total]
        else:
            voff = int.from_bytes(buf[e + 8 : e + 12], order)
            data = buf[voff : voff + total]
        if len(data) < total:
            raise ValueError("TIFF: tag value out of range")
        tags[tag] = [
            int.from_bytes(data[j * size : (j + 1) * size], order)
            for j in range(count)
        ]
    return tags


def parse_tiff_header(buf: bytes) -> tuple[int, int] | None:
    """(width, height) of the first page, else None (total sniffer)."""
    order = _byte_order(buf)
    if order is None or len(buf) < 8:
        return None
    try:
        tags = _read_ifd(buf, order)
    except (ValueError, IndexError):
        return None
    w = tags.get(256, [0])[0]
    h = tags.get(257, [0])[0]
    return (w, h) if w > 0 and h > 0 else None


def _unpackbits(data: bytes, expected: int) -> bytes:
    """TIFF PackBits RLE (spec section 9)."""
    out = bytearray()
    i = 0
    while i < len(data) and len(out) < expected:
        n = data[i]
        i += 1
        if n < 128:
            out += data[i : i + n + 1]
            i += n + 1
        elif n > 128:
            if i >= len(data):
                break
            out += bytes([data[i]]) * (257 - n)
            i += 1
        # 128: no-op
    if len(out) < expected:
        raise ValueError("TIFF: PackBits strip shorter than declared")
    return bytes(out[:expected])


def _lzw_decode(data: bytes, expected: int) -> bytes:
    """TIFF-variant LZW (spec section 13): MSB-first code packing,
    Clear=256 / EOI=257, 8-bit roots, EARLY CHANGE — the code width
    bumps when the table reaches 2^w - 1 (one entry earlier than GIF)."""
    out = bytearray()
    table: list[bytes] = []

    def reset() -> None:
        table.clear()
        table.extend(bytes([i]) for i in range(256))
        table.append(b"")  # 256 clear
        table.append(b"")  # 257 eoi

    reset()
    width = 9
    acc = 0
    nbits = 0
    prev: bytes | None = None
    for byte in data:
        acc = (acc << 8) | byte
        nbits += 8
        while nbits >= width:
            code = (acc >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            if code == 256:
                reset()
                width = 9
                prev = None
                continue
            if code == 257:
                if len(out) < expected:
                    raise ValueError("TIFF: LZW ended before strip filled")
                return bytes(out[:expected])
            if prev is None:
                if code >= len(table):
                    raise ValueError("TIFF: LZW code before any literal")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ValueError("TIFF: LZW code out of range")
            out += entry
            if len(out) > expected:
                raise ValueError("TIFF: LZW output exceeds strip size")
            prev = entry
            if len(table) >= (1 << width) - 1 and width < 12:  # early change
                width += 1
    if len(out) < expected:
        raise ValueError("TIFF: LZW strip shorter than declared")
    return bytes(out[:expected])


def _jpeg_tables_prefix(tags: dict[int, list[int]]) -> bytes:
    tables = tags.get(347)
    if not tables:
        return b""
    tb = bytes(tables)
    if len(tb) < 4 or tb[:2] != b"\xff\xd8":
        raise ValueError("TIFF: invalid JPEGTables stream")
    end = tb.rfind(b"\xff\xd9")
    if end == -1:
        raise ValueError("TIFF: JPEGTables missing EOI")
    return tb[2:end]


def _decode_jpeg_tiles(buf, tags, w, h, tw, th, offsets, counts) -> np.ndarray:
    """JPEG-compressed tiles: every tile is a full (th, tw) JPEG stream
    with the shared JPEGTables splice, stitched on the padded grid."""
    from .jpeg import decode_jpeg_pixels

    prefix = _jpeg_tables_prefix(tags)
    across, down = -(-w // tw), -(-h // th)
    if len(offsets) < across * down or len(counts) < across * down:
        raise ValueError("TIFF: tile tables shorter than the grid")
    canvas = None
    for ti in range(across * down):
        off, cnt = offsets[ti], counts[ti]
        tile = buf[off : off + cnt]
        if len(tile) < cnt:
            raise ValueError("TIFF: tile out of range")
        if tile[:2] != b"\xff\xd8":
            raise ValueError("TIFF: JPEG tile missing SOI")
        px = decode_jpeg_pixels(b"\xff\xd8" + prefix + tile[2:])
        if px.shape[0] < th or px.shape[1] < tw:
            raise ValueError("TIFF: JPEG tile smaller than declared")
        if canvas is None:
            canvas = np.zeros((down * th, across * tw, px.shape[2]), np.uint8)
        if px.shape[2] != canvas.shape[2]:
            raise ValueError("TIFF: JPEG tiles disagree on channel count")
        r, c = divmod(ti, across)
        canvas[r * th : (r + 1) * th, c * tw : (c + 1) * tw] = px[:th, :tw]
    return np.ascontiguousarray(canvas[:h, :w])


def _decode_jpeg_strips(
    buf: bytes,
    tags: dict[int, list[int]],
    w: int,
    h: int,
    rows_per_strip: int,
    offsets: list[int],
    counts: list[int],
) -> np.ndarray:
    """New-style JPEG strips (TIFF Tech Note 2): every strip is a full
    JPEG stream covering ``rows_per_strip`` rows; a JPEGTables tag
    holds shared DQT/DHT segments as an abbreviated table stream
    (SOI tables EOI) spliced in after each strip's SOI."""
    from .jpeg import decode_jpeg_pixels

    prefix = _jpeg_tables_prefix(tags)
    parts: list[np.ndarray] = []
    rows_done = 0
    for off, cnt in zip(offsets, counts):
        strip = buf[off : off + cnt]
        if len(strip) < cnt:
            raise ValueError("TIFF: strip out of range")
        if strip[:2] != b"\xff\xd8":
            raise ValueError("TIFF: JPEG strip missing SOI")
        px = decode_jpeg_pixels(b"\xff\xd8" + prefix + strip[2:])
        strip_rows = min(rows_per_strip, h - rows_done)
        if px.shape[0] < strip_rows or px.shape[1] < w:
            raise ValueError("TIFF: JPEG strip smaller than declared")
        parts.append(px[:strip_rows, :w])
        rows_done += strip_rows
        if rows_done >= h:
            break
    if rows_done < h:
        raise ValueError("TIFF: strips cover fewer rows than ImageLength")
    if len({p.shape[2] for p in parts}) != 1:
        raise ValueError("TIFF: JPEG strips disagree on channel count")
    return np.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]


def decode_tiff_pixels(buf: bytes) -> np.ndarray:
    """First-page decode → uint8 (h, w, 1|3|4), display-oriented (the
    TIFF Orientation tag 274 is applied — same semantics as EXIF in
    JPEG, same dispatch-layer policy). Corruption raises ValueError;
    out-of-scope compressions raise NotImplementedError (both inside
    the shared DECODE_QUARANTINE)."""
    px = _decode_tiff_raw(buf)
    order = _byte_order(buf)
    o = _read_ifd(buf, order).get(274, [1])[0]
    if o != 1 and 1 <= o <= 8:
        from .jpeg import apply_exif_orientation

        px = np.ascontiguousarray(apply_exif_orientation(px, o))
    return px


def _decompress_segment(comp: int, data: bytes, expected: int) -> bytes:
    """One strip's / tile's bytes under the shared compression switch."""
    if comp == 1:
        if len(data) < expected:
            raise ValueError("TIFF: uncompressed segment shorter than declared")
        return data[:expected]
    if comp == 32773:
        return _unpackbits(data, expected)
    if comp in (8, 32946):  # Adobe deflate / legacy deflate
        d = zlib.decompressobj()
        try:
            inflated = d.decompress(data, expected)
        except zlib.error as exc:
            raise ValueError(f"TIFF: bad deflate segment ({exc})") from None
        if len(inflated) < expected:
            raise ValueError("TIFF: deflate segment shorter than declared")
        return inflated
    return _lzw_decode(data, expected)


def _decode_tiff_raw(buf: bytes) -> np.ndarray:
    order = _byte_order(buf)
    if order is None:
        raise ValueError("not a TIFF payload")
    tags = _read_ifd(buf, order)
    w = tags.get(256, [0])[0]
    h = tags.get(257, [0])[0]
    if w <= 0 or h <= 0:
        raise ValueError("TIFF: missing dimensions")
    spp = tags.get(277, [1])[0]
    bits = tags.get(258, [1] * spp)
    comp = tags.get(259, [1])[0]
    photo = tags.get(262, [1])[0]
    rows_per_strip = tags.get(278, [h])[0] or h
    offsets = tags.get(273)
    counts = tags.get(279)
    tile_off, tile_cnt = tags.get(324), tags.get(325)
    tiled = (
        322 in tags and 323 in tags
        and tile_off is not None and tile_cnt is not None
    )
    if not tiled and (
        offsets is None or counts is None or len(offsets) != len(counts)
    ):
        raise ValueError("TIFF: missing strip tables")
    if comp == 7 and tiled:
        tw, th = tags[322][0], tags[323][0]
        if tw <= 0 or th <= 0:
            raise ValueError("TIFF: bad tile dimensions")
        if w * h * 3 > _TIFF_MAX_DECODE_BYTES:
            raise ValueError("TIFF: image exceeds decode bound")
        return _decode_jpeg_tiles(buf, tags, w, h, tw, th, tile_off, tile_cnt)
    if comp == 7:
        if w * h * 3 > _TIFF_MAX_DECODE_BYTES:
            raise ValueError("TIFF: image exceeds decode bound")
        return _decode_jpeg_strips(buf, tags, w, h, rows_per_strip, offsets, counts)
    if comp == 6:
        raise NotImplementedError("TIFF: old-style JPEG (compression 6) unsupported")
    if comp not in (1, 5, 8, 32773, 32946):
        raise NotImplementedError(f"TIFF: compression scheme {comp} unsupported")
    predictor = tags.get(317, [1])[0]
    if predictor not in (1, 2):
        raise NotImplementedError(f"TIFF: predictor {predictor} unsupported")
    if set(bits) == {1} and spp == 1:
        depth = 1
    elif set(bits) == {8}:
        depth = 8
    elif set(bits) == {16}:
        depth = 16  # scientific/scan data: high-byte downscale (PNG16 policy)
        if predictor == 2:
            raise NotImplementedError("TIFF: predictor 2 on 16-bit samples")
    else:
        raise NotImplementedError(f"TIFF: bits-per-sample {bits} unsupported")
    if spp not in (1, 3, 4):
        raise NotImplementedError(f"TIFF: {spp} samples per pixel unsupported")
    if w * h * max(spp, 1) > _TIFF_MAX_DECODE_BYTES:
        raise ValueError("TIFF: image exceeds decode bound")

    if tiled:
        # tiled layout (spec section 15): the image is a grid of
        # independently-compressed tw x th tiles, left-to-right then
        # top-to-bottom, each padded to full tile size; predictor 2
        # differencing restarts at every tile row
        tw, th = tags[322][0], tags[323][0]
        if tw <= 0 or th <= 0:
            raise ValueError("TIFF: bad tile dimensions")
        across, down = -(-w // tw), -(-h // th)
        if down * th * across * tw * spp > _TIFF_MAX_DECODE_BYTES:
            raise ValueError("TIFF: tile grid exceeds decode bound")
        if len(tile_off) < across * down or len(tile_cnt) < across * down:
            raise ValueError("TIFF: tile tables shorter than the grid")
        t_bytes = (tw * spp * depth + 7) // 8
        canvas = np.zeros((down * th, across * tw, spp), np.uint8)
        for ti in range(across * down):
            off, cnt = tile_off[ti], tile_cnt[ti]
            data = buf[off : off + cnt]
            if len(data) < cnt:
                raise ValueError("TIFF: tile out of range")
            rawt = _decompress_segment(comp, data, th * t_bytes)
            if depth == 1:  # bilevel tiles: MSB-first bit rows
                rows = np.frombuffer(
                    bytes(rawt[: th * t_bytes]), np.uint8
                ).reshape(th, t_bytes)
                arr = np.unpackbits(rows, axis=1)[:, :tw][..., None]
            elif depth == 16:
                dt = ">u2" if order == "big" else "<u2"
                a16 = np.frombuffer(
                    bytes(rawt[: th * t_bytes]), dt
                ).reshape(th, tw, spp)
                arr = (a16 >> 8).astype(np.uint8)
            else:
                arr = np.frombuffer(
                    bytes(rawt[: th * t_bytes]), np.uint8
                ).reshape(th, tw, spp)
                if predictor == 2:
                    arr = np.cumsum(
                        arr, axis=1, dtype=np.uint32
                    ).astype(np.uint8)
            r, c = divmod(ti, across)
            canvas[r * th : (r + 1) * th, c * tw : (c + 1) * tw] = arr
        cropped = np.ascontiguousarray(canvas[:h, :w])
        if depth == 1:
            px = cropped[..., 0]
            px = (px * 255) if photo == 1 else ((1 - px) * 255)
            return px.astype(np.uint8)[..., None]
        raw = cropped.tobytes()
        predictor = 1  # already undone per tile
        row_bytes = w * spp
    else:
        row_bytes = (w * spp * depth + 7) // 8
        raw = bytearray()
        rows_done = 0
        for off, cnt in zip(offsets, counts):
            strip = buf[off : off + cnt]
            if len(strip) < cnt:
                raise ValueError("TIFF: strip out of range")
            strip_rows = min(rows_per_strip, h - rows_done)
            raw += _decompress_segment(comp, strip, strip_rows * row_bytes)
            rows_done += strip_rows
            if rows_done >= h:
                break
        if rows_done < h:
            raise ValueError("TIFF: strips cover fewer rows than ImageLength")

    if predictor == 2:
        # horizontal differencing (spec section 14): each byte sample
        # stores the delta to the sample one pixel left, per channel —
        # undo with a prefix sum along the row, modulo 256
        if depth != 8:
            raise NotImplementedError("TIFF: predictor 2 on sub-byte samples")
        arr = np.frombuffer(bytes(raw), np.uint8).reshape(h, w, spp)
        raw = np.cumsum(arr, axis=1, dtype=np.uint32).astype(np.uint8).tobytes()

    if depth == 1:
        rows = np.frombuffer(bytes(raw), np.uint8).reshape(h, row_bytes)
        px = np.unpackbits(rows, axis=1)[:, :w].astype(np.uint8)
        px = (px * 255) if photo == 1 else ((1 - px) * 255)  # 0=WhiteIsZero
        return px.astype(np.uint8)[..., None]
    if depth == 16:
        dt = ">u2" if order == "big" else "<u2"
        a16 = np.frombuffer(bytes(raw[: h * w * spp * 2]), dt).reshape(h, w, spp)
        px = (a16 >> 8).astype(np.uint8)
    else:
        px = np.frombuffer(bytes(raw)[: h * w * spp], np.uint8).reshape(h, w, spp)
    if photo == 3:  # palette-color: ColorMap of 3 * 2^depth u16 entries
        cmap = tags.get(320)
        if spp != 1 or cmap is None or len(cmap) < 3 * 256:
            raise ValueError("TIFF: palette image without a valid ColorMap")
        table = (np.array(cmap[: 3 * 256], np.uint32) // 257).astype(np.uint8)
        lut = np.stack([table[0:256], table[256:512], table[512:768]], axis=1)
        return lut[px[..., 0]]
    if photo == 0 and spp == 1:  # WhiteIsZero: invert to the usual polarity
        px = 255 - px
    return px.copy()