"""VP8L (WebP lossless) full payload decode — pure stdlib + numpy.

WebP is the third pillar of modern web imagery next to JPEG/PNG; its
LOSSLESS coding mode (VP8L, public "WebP Lossless Bitstream
Specification") is a self-contained entropy format — LSB-first bit
stream, canonical (DEFLATE-style) Huffman codes whose code lengths are
themselves Huffman-coded, LZ77 backward references with a 2-D local
distance map, an optional color cache, meta-Huffman tiling, and four
invertible transforms (predictor, cross-color, subtract-green, color
indexing with sub-byte bundling) — all decodable with no codec
library. The LOSSY VP8 mode genuinely needs one (boolean arithmetic
coder + loop filter) and stays behind the named
``NotImplementedError`` boundary, the same contract as H.264 in
AVI/MP4.

Decode cost is a per-pixel Python loop (payload decode is the declared
Python boundary of the multimodal path, Arrow-batched one level up) and
is bounded by the same decode-size guard as PNG/GIF/JPEG.

The 2-D distance map (codes 1..120 → (dx, dy) neighbor offsets) is
GENERATED from its ordering rule — neighbors sorted by squared
Euclidean distance, then larger dy first, then larger dx first — which
reproduces the table in the specification.
"""

from __future__ import annotations

import numpy as np

#: pixel-count ceiling (×4 bytes ≈ the PNG/GIF/JPEG decode bounds)
_VP8L_MAX_PIXELS = 1 << 24

#: code-length-code symbol order (spec section on Huffman code lengths)
_CL_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)


def _distance_map() -> list[tuple[int, int]]:
    cands = [
        (dx, dy)
        for dy in range(0, 9)
        for dx in range(-8, 9)
        if (dy > 0 or dx > 0)
    ]
    cands.sort(key=lambda p: (p[0] * p[0] + p[1] * p[1], -p[1], -p[0]))
    return cands[:120]


_DIST_MAP = _distance_map()


class _LsbReader:
    """LSB-first bit reader (VP8L convention; opposite of JPEG's)."""

    def __init__(self, data: bytes) -> None:
        self.d = data
        self.pos = 0

    def bits(self, n: int) -> int:
        v = 0
        for i in range(n):
            byte = self.pos >> 3
            if byte >= len(self.d):
                raise ValueError("VP8L: truncated bitstream")
            v |= ((self.d[byte] >> (self.pos & 7)) & 1) << i
            self.pos += 1
        return v


class _Code:
    """A prefix code: either a zero-bit single symbol or a canonical
    table {(length, msb-first code): symbol}."""

    __slots__ = ("single", "table")

    def __init__(self, single: int | None, table: dict | None) -> None:
        self.single = single
        self.table = table

    def read(self, rd: _LsbReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        for length in range(1, 16):
            code = (code << 1) | rd.bits(1)
            sym = self.table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("VP8L: invalid Huffman code")


def _canonical(lengths: list[int]) -> _Code:
    used = [(ln, sym) for sym, ln in enumerate(lengths) if ln > 0]
    if not used:
        raise ValueError("VP8L: empty Huffman code")
    if len(used) == 1:
        return _Code(used[0][1], None)
    table: dict = {}
    code = 0
    for ln in range(1, 16):
        for sym, l in enumerate(lengths):
            if l == ln:
                table[(ln, code)] = sym
                code += 1
        code <<= 1
    return _Code(None, table)


def _read_code(rd: _LsbReader, alphabet_size: int) -> _Code:
    if rd.bits(1):  # simple code: 1 or 2 symbols
        num = rd.bits(1) + 1
        s0 = rd.bits(8) if rd.bits(1) else rd.bits(1)
        if s0 >= alphabet_size:
            raise ValueError("VP8L: simple-code symbol out of range")
        if num == 1:
            return _Code(s0, None)
        s1 = rd.bits(8)
        if s1 >= alphabet_size:
            raise ValueError("VP8L: simple-code symbol out of range")
        return _Code(None, {(1, 0): s0, (1, 1): s1})  # read order, not sorted
    num_cl = 4 + rd.bits(4)
    cl_lengths = [0] * 19
    for i in range(num_cl):
        cl_lengths[_CL_ORDER[i]] = rd.bits(3)
    cl = _canonical(cl_lengths)
    lengths = [0] * alphabet_size
    if rd.bits(1):  # coded-symbol-count limit
        length_nbits = 2 + 2 * rd.bits(3)
        max_symbol = 2 + rd.bits(length_nbits)
    else:
        max_symbol = alphabet_size
    sym = 0
    prev = 8
    while sym < alphabet_size:
        if max_symbol <= 0:
            break
        max_symbol -= 1
        c = cl.read(rd)
        if c < 16:
            lengths[sym] = c
            sym += 1
            if c:
                prev = c
        else:
            if c == 16:
                rep, val = 3 + rd.bits(2), prev
            elif c == 17:
                rep, val = 3 + rd.bits(3), 0
            else:
                rep, val = 11 + rd.bits(7), 0
            if sym + rep > alphabet_size:
                raise ValueError("VP8L: code-length repeat overruns alphabet")
            for _ in range(rep):
                lengths[sym] = val
                sym += 1
    return _canonical(lengths)


def _read_group(rd: _LsbReader, cache_bits: int) -> tuple:
    green = _read_code(rd, 256 + 24 + ((1 << cache_bits) if cache_bits else 0))
    red = _read_code(rd, 256)
    blue = _read_code(rd, 256)
    alpha = _read_code(rd, 256)
    dist = _read_code(rd, 40)
    return green, red, blue, alpha, dist


def _prefix_val(rd: _LsbReader, code: int) -> int:
    """LZ77 length/distance prefix decoding (spec: 4 direct codes then
    pairs with growing extra-bit counts)."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + rd.bits(extra) + 1


def _plane_to_dist(v: int, xsize: int) -> int:
    if v > 120:
        return v - 120
    dx, dy = _DIST_MAP[v - 1]
    d = dy * xsize + dx
    return d if d >= 1 else 1


def _decode_pixels(
    rd: _LsbReader,
    xsize: int,
    ysize: int,
    groups: list,
    cache_bits: int,
    meta: np.ndarray | None,
    hbits: int,
) -> np.ndarray:
    n = xsize * ysize
    out = np.zeros(n, np.uint32)
    cache = [0] * (1 << cache_bits) if cache_bits else None
    shift = 32 - cache_bits if cache_bits else 0
    pos = 0
    g = groups[0]
    while pos < n:
        if meta is not None:
            y, x = divmod(pos, xsize)
            g = groups[int(meta[y >> hbits, x >> hbits])]
        green_c, red_c, blue_c, alpha_c, dist_c = g
        s = green_c.read(rd)
        if s < 256:
            r = red_c.read(rd)
            b = blue_c.read(rd)
            a = alpha_c.read(rd)
            px = (a << 24) | (r << 16) | (s << 8) | b
            out[pos] = px
            if cache is not None:
                cache[((0x1E35A7BD * px) & 0xFFFFFFFF) >> shift] = px
            pos += 1
        elif s < 280:
            length = _prefix_val(rd, s - 256)
            dist = _plane_to_dist(_prefix_val(rd, dist_c.read(rd)), xsize)
            if dist < 1 or dist > pos or pos + length > n:
                raise ValueError("VP8L: backward reference out of range")
            for _ in range(length):
                px = int(out[pos - dist])
                out[pos] = px
                if cache is not None:
                    cache[((0x1E35A7BD * px) & 0xFFFFFFFF) >> shift] = px
                pos += 1
        else:
            if cache is None:
                raise ValueError("VP8L: cache symbol without color cache")
            out[pos] = cache[s - 280]
            pos += 1
    return out.reshape(ysize, xsize)


def _subimage(rd: _LsbReader, xsize: int, ysize: int) -> np.ndarray:
    """Entropy-coded subimage (transform data / meta-Huffman image): no
    transforms, no meta, but its OWN optional color cache."""
    if xsize * ysize > _VP8L_MAX_PIXELS:
        raise ValueError("VP8L: subimage exceeds decode bound")
    cache_bits = 0
    if rd.bits(1):
        cache_bits = rd.bits(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError("VP8L: bad color-cache size")
    group = _read_group(rd, cache_bits)
    return _decode_pixels(rd, xsize, ysize, [group], cache_bits, None, 0)


def _avg2(a: int, b: int) -> int:
    return (
        ((((a >> 24) & 0xFF) + ((b >> 24) & 0xFF)) >> 1) << 24
        | ((((a >> 16) & 0xFF) + ((b >> 16) & 0xFF)) >> 1) << 16
        | ((((a >> 8) & 0xFF) + ((b >> 8) & 0xFF)) >> 1) << 8
        | ((((a) & 0xFF) + ((b) & 0xFF)) >> 1)
    )


def _select(t: int, l: int, tl: int) -> int:
    diff = 0
    for sh in (24, 16, 8, 0):
        tc, lc, tlc = (t >> sh) & 0xFF, (l >> sh) & 0xFF, (tl >> sh) & 0xFF
        diff += abs(lc - tlc) - abs(tc - tlc)
    return t if diff <= 0 else l


def _clamp_add_full(l: int, t: int, tl: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        v = ((l >> sh) & 0xFF) + ((t >> sh) & 0xFF) - ((tl >> sh) & 0xFF)
        out |= max(0, min(255, v)) << sh
    return out


def _clamp_add_half(l: int, t: int, tl: int) -> int:
    ave = _avg2(l, t)
    out = 0
    for sh in (24, 16, 8, 0):
        a = (ave >> sh) & 0xFF
        b = (tl >> sh) & 0xFF
        v = a + int((a - b) / 2)  # C truncation toward zero
        out |= max(0, min(255, v)) << sh
    return out


_PREDICTORS = [
    lambda l, t, tl, tr: 0xFF000000,
    lambda l, t, tl, tr: l,
    lambda l, t, tl, tr: t,
    lambda l, t, tl, tr: tr,
    lambda l, t, tl, tr: tl,
    lambda l, t, tl, tr: _avg2(_avg2(l, tr), t),
    lambda l, t, tl, tr: _avg2(l, tl),
    lambda l, t, tl, tr: _avg2(l, t),
    lambda l, t, tl, tr: _avg2(tl, t),
    lambda l, t, tl, tr: _avg2(t, tr),
    lambda l, t, tl, tr: _avg2(_avg2(l, tl), _avg2(t, tr)),
    lambda l, t, tl, tr: _select(t, l, tl),
    lambda l, t, tl, tr: _clamp_add_full(l, t, tl),
    lambda l, t, tl, tr: _clamp_add_half(l, t, tl),
]


def _add_px(a: int, b: int) -> int:
    return (
        ((((a >> 24) + (b >> 24)) & 0xFF) << 24)
        | ((((a >> 16) + (b >> 16)) & 0xFF) << 16)
        | ((((a >> 8) + (b >> 8)) & 0xFF) << 8)
        | (((a + b) & 0xFF))
    )


def _inv_predictor(px: np.ndarray, size_bits: int, modes: np.ndarray) -> None:
    """In-place predictor inverse (spec border rules: (0,0) → opaque
    black, row 0 → L, column 0 → T; rightmost column's TR is the
    CURRENT row's leftmost pixel — rows are contiguous in scan order)."""
    h, w = px.shape
    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = int(px[0, x - 1])
            elif x == 0:
                pred = int(px[y - 1, 0])
            else:
                mode = (int(modes[y >> size_bits, x >> size_bits]) >> 8) & 0xFF
                if mode >= len(_PREDICTORS):
                    raise ValueError("VP8L: invalid predictor mode")
                l = int(px[y, x - 1])
                t = int(px[y - 1, x])
                tl = int(px[y - 1, x - 1])
                tr = int(px[y - 1, x + 1]) if x + 1 < w else int(px[y, 0])
                pred = _PREDICTORS[mode](l, t, tl, tr)
            px[y, x] = _add_px(int(px[y, x]), pred)


def _int8(v: int) -> int:
    return v - 256 if v >= 128 else v


def _inv_color_transform(px: np.ndarray, size_bits: int, elems: np.ndarray) -> None:
    """In-place cross-color inverse: per-tile multipliers stored in the
    element pixel's blue/green/red channels (green→red, green→blue,
    red→blue); delta = (int8(m) * int8(c)) >> 5 with sign-preserving
    shift."""
    h, w = px.shape
    for y in range(h):
        for x in range(w):
            e = int(elems[y >> size_bits, x >> size_bits])
            g2r = _int8(e & 0xFF)
            g2b = _int8((e >> 8) & 0xFF)
            r2b = _int8((e >> 16) & 0xFF)
            v = int(px[y, x])
            a = (v >> 24) & 0xFF
            r = (v >> 16) & 0xFF
            g = (v >> 8) & 0xFF
            b = v & 0xFF
            r = (r + ((g2r * _int8(g)) >> 5)) & 0xFF
            b = (b + ((g2b * _int8(g)) >> 5)) & 0xFF
            b = (b + ((r2b * _int8(r)) >> 5)) & 0xFF
            px[y, x] = (a << 24) | (r << 16) | (g << 8) | b


def _inv_subtract_green(px: np.ndarray) -> np.ndarray:
    g = (px >> 8) & 0xFF
    r = (((px >> 16) & 0xFF) + g) & 0xFF
    b = ((px & 0xFF) + g) & 0xFF
    return (px & 0xFF00FF00) | (r << 16) | b


def _inv_palette(
    px: np.ndarray, palette: np.ndarray, width_bits: int, orig_xsize: int
) -> np.ndarray:
    h = px.shape[0]
    idx_bits = 8 >> width_bits
    mask = (1 << idx_bits) - 1
    per = 1 << width_bits
    green = ((px >> 8) & 0xFF).astype(np.int64)
    out = np.zeros((h, orig_xsize), np.uint32)
    for x in range(orig_xsize):
        packed = green[:, x >> width_bits] if width_bits else green[:, x]
        idx = (packed >> ((x % per) * idx_bits)) & mask if width_bits else packed
        if int(idx.max(initial=0)) >= len(palette):
            raise ValueError("VP8L: palette index out of range")
        out[:, x] = palette[idx]
    return out


def decode_vp8l_stream(data: bytes) -> np.ndarray:
    """Decode a raw VP8L stream (starting at the 0x2F signature byte)
    → uint8 (h, w, 4) RGBA."""
    if not data or data[0] != 0x2F:
        raise ValueError("not a VP8L stream")
    rd = _LsbReader(data[1:])
    w = rd.bits(14) + 1
    h = rd.bits(14) + 1
    rd.bits(1)  # alpha-is-used hint
    if rd.bits(3) != 0:
        raise ValueError("VP8L: unsupported version")
    if w * h > _VP8L_MAX_PIXELS:
        raise ValueError("VP8L: image exceeds decode bound")

    transforms: list[tuple] = []
    seen = set()
    xsize = w
    while rd.bits(1):
        ttype = rd.bits(2)
        if ttype in seen:
            raise ValueError("VP8L: repeated transform")
        seen.add(ttype)
        if ttype == 0:  # predictor
            sb = rd.bits(3) + 2
            sub = _subimage(rd, -(-xsize // (1 << sb)), -(-h // (1 << sb)))
            transforms.append(("pred", sb, sub))
        elif ttype == 1:  # cross-color
            sb = rd.bits(3) + 2
            sub = _subimage(rd, -(-xsize // (1 << sb)), -(-h // (1 << sb)))
            transforms.append(("color", sb, sub))
        elif ttype == 2:
            transforms.append(("sub_green",))
        else:  # color indexing
            n_colors = rd.bits(8) + 1
            pal_img = _subimage(rd, n_colors, 1)[0]
            # palette entries are delta-coded per channel
            pal = pal_img.astype(np.uint32).copy()
            for i in range(1, n_colors):
                pal[i] = _add_px(int(pal[i]), int(pal[i - 1]))
            if n_colors <= 2:
                wb = 3
            elif n_colors <= 4:
                wb = 2
            elif n_colors <= 16:
                wb = 1
            else:
                wb = 0
            transforms.append(("palette", pal, wb, xsize))
            xsize = -(-xsize // (1 << wb))

    cache_bits = 0
    if rd.bits(1):
        cache_bits = rd.bits(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError("VP8L: bad color-cache size")
    meta = None
    hbits = 0
    ngroups = 1
    if rd.bits(1):  # meta-Huffman tiling
        hbits = rd.bits(3) + 2
        mimg = _subimage(rd, -(-xsize // (1 << hbits)), -(-h // (1 << hbits)))
        meta = (mimg >> 8) & 0xFFFF
        ngroups = int(meta.max()) + 1
        if ngroups > 1 << 16:
            raise ValueError("VP8L: too many meta groups")
    groups = [_read_group(rd, cache_bits) for _ in range(ngroups)]
    px = _decode_pixels(rd, xsize, h, groups, cache_bits, meta, hbits)

    for t in reversed(transforms):
        if t[0] == "palette":
            px = _inv_palette(px, t[1], t[2], t[3])
        elif t[0] == "sub_green":
            px = _inv_subtract_green(px)
        elif t[0] == "pred":
            _inv_predictor(px, t[1], t[2])
        else:
            _inv_color_transform(px, t[1], t[2])

    out = np.zeros((h, px.shape[1], 4), np.uint8)
    out[..., 0] = (px >> 16) & 0xFF  # R
    out[..., 1] = (px >> 8) & 0xFF  # G
    out[..., 2] = px & 0xFF  # B
    out[..., 3] = (px >> 24) & 0xFF  # A
    return out


def decode_webp_pixels(buf: bytes) -> np.ndarray:
    """Decode a WebP container payload → uint8 (h, w, 4) RGBA.

    Lossless (VP8L) decodes fully, including inside an extended (VP8X)
    layout; a lossy ``VP8 `` chunk decodes through :mod:`.vp8` (WebP
    stills are keyframes; an interframe payload in a STILL has no
    reference buffers and raises ``ValueError`` — inside an ANIMATION
    the per-animation :class:`.vp8.Vp8Decoder` supplies them, see
    ``decode_webp_frames``)."""
    if len(buf) < 16 or buf[:4] != b"RIFF" or buf[8:12] != b"WEBP":
        raise ValueError("not a WebP payload")
    pos = 12
    px = None
    while pos + 8 <= len(buf):
        cid = buf[pos : pos + 4]
        sz = int.from_bytes(buf[pos + 4 : pos + 8], "little")
        body = buf[pos + 8 : pos + 8 + sz]
        if cid == b"VP8L" and px is None:
            px = decode_vp8l_stream(body)
        elif cid == b"VP8 " and px is None:
            from .vp8 import decode_vp8_rgba

            px = decode_vp8_rgba(body)
        elif cid == b"ANMF" and len(body) >= 16:
            # animation: the still view is the first composited frame
            # (same >=16 well-formedness guard as decode_webp_frames,
            # or the two dispatchers would recurse on truncated input)
            return decode_webp_frames(buf)[0]
        pos += 8 + sz + (sz & 1)
    if px is None:
        raise ValueError("WebP: no VP8/VP8L bitstream chunk")
    return _apply_webp_exif(buf, px)


def _webp_exif_orientation(buf: bytes) -> int:
    """Orientation from a VP8X container's ``EXIF`` chunk (raw TIFF
    bytes per the container spec; some muxers keep the JPEG-style
    ``Exif\\0\\0`` prefix — both accepted). 1 when absent/malformed."""
    pos = 12
    while pos + 8 <= len(buf):
        cid = buf[pos : pos + 4]
        sz = int.from_bytes(buf[pos + 4 : pos + 8], "little")
        body = buf[pos + 8 : pos + 8 + sz]
        if cid == b"EXIF":
            from .jpeg import orientation_from_tiff

            if body[:6] == b"Exif\x00\x00":
                body = body[6:]
            return orientation_from_tiff(body)
        pos += 8 + sz + (sz & 1)
    return 1


def _apply_webp_exif(buf: bytes, px):
    o = _webp_exif_orientation(buf)
    if o != 1:
        from .jpeg import apply_exif_orientation

        px = np.ascontiguousarray(apply_exif_orientation(px, o))
    return px


_WEBP_MAX_DECODE_BYTES = 1 << 28  # 256 MiB, same bomb bound as GIF/APNG


def _decode_webp_subframe(body: bytes, vp8_state=None) -> np.ndarray:
    """Decode the VP8/VP8L subchunk inside an ANMF frame body.

    ``vp8_state`` is the animation's shared :class:`vp8.Vp8Decoder`:
    lossy ANMF frames form one elementary stream, so an INTER-coded
    frame decodes against the previous lossy frame's reference buffers
    (keyframes reset them — the libwebp-emitted all-keyframe case is
    unchanged)."""
    pos = 0
    while pos + 8 <= len(body):
        cid = body[pos : pos + 4]
        sz = int.from_bytes(body[pos + 4 : pos + 8], "little")
        data = body[pos + 8 : pos + 8 + sz]
        if cid == b"VP8L":
            return decode_vp8l_stream(data)
        if cid == b"VP8 ":
            from .vp8 import decode_vp8_rgba, yuv420_to_rgba

            if vp8_state is None:
                return decode_vp8_rgba(data)
            f = vp8_state.decode(data)
            return yuv420_to_rgba(f["y"], f["u"], f["v"])
        pos += 8 + sz + (sz & 1)
    raise ValueError("WebP: ANMF frame without VP8/VP8L subchunk")


def decode_webp_frames(buf: bytes) -> np.ndarray:
    """Animated WebP (VP8X + ANIM/ANMF, public container spec) → uint8
    (n_frames, h, w, 4): frames COMPOSITED onto the canvas per each
    frame's blend/dispose flags — the same discipline as
    ``decode_apng_frames``. Still WebPs yield their single frame.

    ANMF layout: 3-byte x/2, y/2, w-1, h-1, duration, then a flags
    byte (bit 1: 1 = overwrite instead of alpha-blend; bit 0: 1 =
    dispose frame rect to transparent), then the frame's bitstream
    subchunks. The canvas starts transparent (the ANIM background
    color is a hint for players; compositing uses the APNG/GIF
    transparent-canvas discipline)."""
    if len(buf) < 16 or buf[:4] != b"RIFF" or buf[8:12] != b"WEBP":
        raise ValueError("not a WebP payload")
    canvas_wh = None
    anim: list[tuple[dict, bytes]] = []
    pos = 12
    while pos + 8 <= len(buf):
        cid = buf[pos : pos + 4]
        sz = int.from_bytes(buf[pos + 4 : pos + 8], "little")
        body = buf[pos + 8 : pos + 8 + sz]
        if cid == b"VP8X" and len(body) >= 10:
            w = int.from_bytes(body[4:7], "little") + 1
            h = int.from_bytes(body[7:10], "little") + 1
            canvas_wh = (w, h)
        elif cid == b"ANMF" and len(body) >= 16:
            anim.append(
                (
                    {
                        "x": int.from_bytes(body[0:3], "little") * 2,
                        "y": int.from_bytes(body[3:6], "little") * 2,
                        "w": int.from_bytes(body[6:9], "little") + 1,
                        "h": int.from_bytes(body[9:12], "little") + 1,
                        "no_blend": (body[15] >> 1) & 1,
                        "dispose": body[15] & 1,
                    },
                    body[16:],
                )
            )
        pos += 8 + sz + (sz & 1)
    if not anim:
        return decode_webp_pixels(buf)[None, ...]
    if canvas_wh is None:
        raise ValueError("WebP: ANMF frames without a VP8X canvas")
    w, h = canvas_wh
    if len(anim) * h * w * 4 > _WEBP_MAX_DECODE_BYTES:
        raise ValueError("WebP: decoded frames exceed decode bound")
    from .vp8 import Vp8Decoder

    canvas = np.zeros((h, w, 4), np.uint8)
    vp8_state = Vp8Decoder()  # shared across the animation's VP8 frames
    out = []
    for meta, body in anim:
        fw, fh, fx, fy = meta["w"], meta["h"], meta["x"], meta["y"]
        if fx + fw > w or fy + fh > h:
            raise ValueError("WebP: frame region outside the canvas")
        region = _decode_webp_subframe(body, vp8_state)
        if region.shape[:2] != (fh, fw):
            raise ValueError("WebP: frame bitstream dims disagree with ANMF")
        target = canvas[fy : fy + fh, fx : fx + fw]
        if meta["no_blend"]:
            target[...] = region
        else:  # src-over alpha composite (non-premultiplied, APNG math)
            sa = region[..., 3:].astype(np.uint32)
            da = target[..., 3:].astype(np.uint32)
            oa = sa * 255 + da * (255 - sa)
            num = (
                region[..., :3].astype(np.uint32) * sa * 255
                + target[..., :3].astype(np.uint32) * da * (255 - sa)
            )
            target[..., :3] = np.where(oa > 0, num // np.maximum(oa, 1), 0).astype(
                np.uint8
            )
            target[..., 3:] = (oa // 255).astype(np.uint8)
        out.append(canvas.copy())
        if meta["dispose"]:
            canvas[fy : fy + fh, fx : fx + fw] = 0
    o = _webp_exif_orientation(buf)
    if o != 1:
        from .jpeg import apply_exif_orientation

        out = [np.ascontiguousarray(apply_exif_orientation(f, o)) for f in out]
    return np.stack(out)
