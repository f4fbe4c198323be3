"""VP8L (lossless WebP) decode (functions/vp8l.py).

The oracle is a test-side spec-exact ENCODER: LSB-first bit writer,
canonical Huffman codes emitted through the code-length code (plus the
simple 1/2-symbol forms for constant channels), literal ARGB pixels,
LZ77 backward references (both >120 direct distances and the 2-D
neighbor plane codes), color cache hits, meta-Huffman tiling, and the
forward transforms (subtract-green, fixed-mode predictor with the
spec's border rules, color indexing with sub-byte bundling). Lossless
⇒ decode(encode(img)) == img exactly."""

import struct

import numpy as np
import pytest

from rustcheatersdatapipeline_spark.functions.vp8l import (
    _DIST_MAP,
    _PREDICTORS,
    decode_vp8l_stream,
    decode_webp_pixels,
)

_CL_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)


class LsbWriter:
    def __init__(self):
        self.bits: list[int] = []

    def write(self, val: int, n: int) -> None:
        for i in range(n):
            self.bits.append((val >> i) & 1)

    def write_code(self, code: int, length: int) -> None:
        """Huffman codes are consumed root-first: MSB first."""
        for i in range(length - 1, -1, -1):
            self.bits.append((code >> i) & 1)

    def to_bytes(self) -> bytes:
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for j, bit in enumerate(self.bits[i : i + 8]):
                b |= bit << j
            out.append(b)
        return bytes(out)


def _canonical_codes(lengths: dict[int, int]) -> dict[int, tuple[int, int]]:
    """symbol -> (length, msb-first code), DEFLATE canonical order."""
    out = {}
    code = 0
    for ln in range(1, 16):
        for sym in sorted(s for s, l in lengths.items() if l == ln):
            out[sym] = (ln, code)
            code += 1
        code <<= 1
    return out


class CodeSpec:
    """One prefix code of the stream: single-symbol (zero bits per use),
    simple 2-symbol, or a flat canonical code emitted via the
    code-length code (unused symbols keep length 0 — the alphabet is
    never fully used here, so the cl code always has >= 2 symbols)."""

    def __init__(self, symbols: set[int], alphabet_size: int):
        self.alphabet = alphabet_size
        syms = sorted(symbols) or [0]
        self.syms = syms
        if len(syms) == 1:
            self.kind = "single"
        elif len(syms) == 2:
            self.kind = "pair"
        else:
            self.kind = "full"
            assert len(syms) < alphabet_size, "flat path needs an unused symbol"
            ln = max(1, (len(syms) - 1).bit_length())
            self.lengths = {s: ln for s in syms}
            self.codes = _canonical_codes(self.lengths)

    def emit_def(self, w: LsbWriter) -> None:
        if self.kind in ("single", "pair"):
            w.write(1, 1)  # simple form
            w.write(0 if self.kind == "single" else 1, 1)
            s0 = self.syms[0]
            if s0 <= 1:
                w.write(0, 1)
                w.write(s0, 1)
            else:
                w.write(1, 1)
                w.write(s0, 8)
            if self.kind == "pair":
                w.write(self.syms[1], 8)
            return
        w.write(0, 1)  # full form, via the code-length code
        used = sorted(set(self.lengths.values()) | {0})
        cl_ln = max(1, (len(used) - 1).bit_length())
        cl_codes = _canonical_codes({l: cl_ln for l in used})
        w.write(15, 4)  # num_code_lengths = 19
        for sym in _CL_ORDER:
            w.write(cl_ln if sym in cl_codes else 0, 3)
        w.write(0, 1)  # no coded-symbol-count shortcut
        for sym in range(self.alphabet):
            ln, code = cl_codes[self.lengths.get(sym, 0)]
            w.write_code(code, ln)

    def emit_sym(self, w: LsbWriter, sym: int) -> None:
        if self.kind == "single":
            assert sym == self.syms[0]
            return
        if self.kind == "pair":
            w.write(self.syms.index(sym), 1)
            return
        ln, code = self.codes[sym]
        w.write_code(code, ln)


def _prefix_encode(v: int) -> tuple[int, int, int]:
    """value -> (code, extra_val, extra_bits): inverse of _prefix_val."""
    assert v >= 1
    if v <= 4:
        return v - 1, 0, 0
    t = v - 1
    e = t.bit_length() - 2
    b = (t >> e) & 1
    r = t & ((1 << e) - 1)
    return 2 * e + 2 + b, r, e


def _to_argb(px: np.ndarray) -> np.ndarray:
    a = (
        px[..., 3].astype(np.uint32)
        if px.shape[-1] == 4
        else np.full(px.shape[:2], 255, np.uint32)
    )
    return (
        (a << 24)
        | (px[..., 0].astype(np.uint32) << 16)
        | (px[..., 1].astype(np.uint32) << 8)
        | px[..., 2].astype(np.uint32)
    )


def _sub_px(a: int, b: int) -> int:
    return (
        ((((a >> 24) - (b >> 24)) & 0xFF) << 24)
        | ((((a >> 16) - (b >> 16)) & 0xFF) << 16)
        | ((((a >> 8) - (b >> 8)) & 0xFF) << 8)
        | (((a - b) & 0xFF))
    )


def _forward_predictor(argb: np.ndarray, mode: int, size_bits: int) -> np.ndarray:
    """Residuals whose inverse reconstruction is exact (decoder border
    rules mirrored: (0,0) black, row0 L, col0 T, rightmost TR = current
    row's leftmost)."""
    h, w = argb.shape
    res = np.zeros_like(argb)
    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = int(argb[0, x - 1])
            elif x == 0:
                pred = int(argb[y - 1, 0])
            else:
                l = int(argb[y, x - 1])
                t = int(argb[y - 1, x])
                tl = int(argb[y - 1, x - 1])
                tr = int(argb[y - 1, x + 1]) if x + 1 < w else int(argb[y, 0])
                pred = _PREDICTORS[mode](l, t, tl, tr)
            res[y, x] = _sub_px(int(argb[y, x]), pred)
    return res


def _emit_entropy_image(w: LsbWriter, argb_flat: list[int]) -> None:
    """Subimage stream: no cache, one group, all literals."""
    w.write(0, 1)  # no color cache
    green = CodeSpec({(p >> 8) & 0xFF for p in argb_flat}, 256 + 24)
    red = CodeSpec({(p >> 16) & 0xFF for p in argb_flat}, 256)
    blue = CodeSpec({p & 0xFF for p in argb_flat}, 256)
    alpha = CodeSpec({(p >> 24) & 0xFF for p in argb_flat}, 256)
    dist = CodeSpec({0}, 40)
    for c in (green, red, blue, alpha, dist):
        c.emit_def(w)
    for p in argb_flat:
        green.emit_sym(w, (p >> 8) & 0xFF)
        red.emit_sym(w, (p >> 16) & 0xFF)
        blue.emit_sym(w, p & 0xFF)
        alpha.emit_sym(w, (p >> 24) & 0xFF)


def encode_vp8l(
    px: np.ndarray,
    transforms: tuple = (),
    pred_mode: int = 7,
    pred_size_bits: int = 9,
    ops: list | None = None,
    cache_bits: int = 0,
    meta: tuple | None = None,
) -> bytes:
    """Raw VP8L stream for an (h, w, 3|4) uint8 image.

    ``transforms``: ordered subset of ("pred", "sub_green", "palette")
    in READ order (forward-applied in that order; the decoder inverts
    in reverse). ``ops``: [("lit",), ("copy", length, dist[, prefix_val
    for 2-D plane codes]), ("cache",)] consumed in pixel order; default
    all-literal. ``meta``: (hbits, group_fn(tile_x, tile_y)) for
    meta-Huffman tiling."""
    h, width = px.shape[:2]
    argb = _to_argb(px)
    w = LsbWriter()
    w.write(width - 1, 14)
    w.write(h - 1, 14)
    w.write(1 if px.shape[-1] == 4 else 0, 1)
    w.write(0, 3)  # version

    xsize = width
    declared = []
    for t in transforms:
        if t == "palette":
            colors: list[int] = []
            index_of: dict[int, int] = {}
            for p in argb.reshape(-1):
                if int(p) not in index_of:
                    index_of[int(p)] = len(colors)
                    colors.append(int(p))
            n = len(colors)
            assert n <= 16, "test encoder: palette <= 16 colors"
            wb = 3 if n <= 2 else (2 if n <= 4 else 1)
            idx_bits = 8 >> wb
            per = 1 << wb
            packed_x = -(-xsize // per)
            packed = [[0] * packed_x for _ in range(h)]
            for y in range(h):
                for x in range(xsize):
                    v = index_of[int(argb[y, x])]
                    packed[y][x >> wb] |= v << ((x % per) * idx_bits)
            argb = (
                0xFF000000 | (np.array(packed, np.uint32) << 8)
            ).astype(np.uint32)
            xsize = packed_x
            deltas = [colors[0]] + [
                _sub_px(colors[i], colors[i - 1]) for i in range(1, n)
            ]
            declared.append(("palette", deltas))
        elif t == "sub_green":
            g = (argb >> 8) & 0xFF
            r = (((argb >> 16) & 0xFF) - g) & 0xFF
            b = ((argb & 0xFF) - g) & 0xFF
            argb = (argb & np.uint32(0xFF00FF00)) | (r << 16) | b
            declared.append(("sub_green",))
        elif t == "pred":
            argb = _forward_predictor(argb, pred_mode, pred_size_bits)
            declared.append(("pred", pred_mode, pred_size_bits, xsize))
        else:
            raise AssertionError(t)

    for t in declared:
        w.write(1, 1)
        if t[0] == "pred":
            w.write(0, 2)
            w.write(t[2] - 2, 3)
            bw, bh = -(-t[3] // (1 << t[2])), -(-h // (1 << t[2]))
            _emit_entropy_image(w, [0xFF000000 | (t[1] << 8)] * (bw * bh))
        elif t[0] == "sub_green":
            w.write(2, 2)
        else:
            w.write(3, 2)
            w.write(len(t[1]) - 1, 8)
            _emit_entropy_image(w, t[1])
    w.write(0, 1)  # end of transforms

    if cache_bits:
        w.write(1, 1)
        w.write(cache_bits, 4)
    else:
        w.write(0, 1)

    flat = [int(v) for v in argb.reshape(-1)]
    n = len(flat)
    ops = ops or [("lit",)] * n

    if meta is not None:
        hbits, group_fn = meta
        w.write(1, 1)
        w.write(hbits - 2, 3)
        mw, mh = -(-xsize // (1 << hbits)), -(-h // (1 << hbits))
        meta_px = [
            0xFF000000 | (group_fn(tx, ty) << 8)
            for ty in range(mh)
            for tx in range(mw)
        ]
        _emit_entropy_image(w, meta_px)
        ngroups = max(group_fn(tx, ty) for ty in range(mh) for tx in range(mw)) + 1
    else:
        w.write(0, 1)
        hbits, group_fn, ngroups = 0, None, 1

    # pass 1: walk ops, collect per-group symbol sets
    cache = [0] * (1 << cache_bits) if cache_bits else None
    shift = 32 - cache_bits if cache_bits else 0
    green_alpha = 256 + 24 + ((1 << cache_bits) if cache_bits else 0)
    per_group = [
        {"g": set(), "r": set(), "b": set(), "a": set(), "d": set()}
        for _ in range(ngroups)
    ]
    emits: list[tuple] = []
    pos = 0

    def _insert(p: int) -> None:
        if cache is not None:
            cache[((0x1E35A7BD * p) & 0xFFFFFFFF) >> shift] = p

    for op in ops:
        assert pos < n, "ops overrun the image"
        gi = (
            group_fn((pos % xsize) >> hbits, (pos // xsize) >> hbits)
            if group_fn
            else 0
        )
        ch = per_group[gi]
        if op[0] == "lit":
            p = flat[pos]
            ch["g"].add((p >> 8) & 0xFF)
            ch["r"].add((p >> 16) & 0xFF)
            ch["b"].add(p & 0xFF)
            ch["a"].add((p >> 24) & 0xFF)
            emits.append((gi, "lit", p))
            _insert(p)
            pos += 1
        elif op[0] == "copy":
            length, dist_v = op[1], op[2]
            prefix_val = op[3] if len(op) > 3 else dist_v + 120
            assert dist_v <= pos and pos + length <= n
            lcode, _, _ = _prefix_encode(length)
            dcode, _, _ = _prefix_encode(prefix_val)
            ch["g"].add(256 + lcode)
            ch["d"].add(dcode)
            emits.append((gi, "copy", (length, prefix_val)))
            for _ in range(length):
                assert flat[pos] == flat[pos - dist_v], "copy op mismatch"
                _insert(flat[pos])
                pos += 1
        else:  # cache hit
            p = flat[pos]
            assert cache is not None
            idx = ((0x1E35A7BD * p) & 0xFFFFFFFF) >> shift
            assert cache[idx] == p, "cache op on a non-cached pixel"
            ch["g"].add(280 + idx)
            emits.append((gi, "cache", idx))
            pos += 1
    assert pos == n, "ops must cover every pixel"

    specs = [
        (
            CodeSpec(ch["g"] or {0}, green_alpha),
            CodeSpec(ch["r"] or {0}, 256),
            CodeSpec(ch["b"] or {0}, 256),
            CodeSpec(ch["a"] or {0}, 256),
            CodeSpec(ch["d"] or {0}, 40),
        )
        for ch in per_group
    ]
    for g in specs:
        for c in g:
            c.emit_def(w)
    # pass 2: emit the entropy stream
    for gi, kind, payload in emits:
        green, red, blue, alpha, dist = specs[gi]
        if kind == "lit":
            p = payload
            green.emit_sym(w, (p >> 8) & 0xFF)
            red.emit_sym(w, (p >> 16) & 0xFF)
            blue.emit_sym(w, p & 0xFF)
            alpha.emit_sym(w, (p >> 24) & 0xFF)
        elif kind == "copy":
            length, prefix_val = payload
            lcode, lex, lbits = _prefix_encode(length)
            green.emit_sym(w, 256 + lcode)
            w.write(lex, lbits)  # length extras precede the distance
            dcode, dex, dbits = _prefix_encode(prefix_val)
            dist.emit_sym(w, dcode)
            w.write(dex, dbits)
        else:
            green.emit_sym(w, 280 + payload)
    return b"\x2f" + w.to_bytes()


def wrap_webp(vp8l: bytes) -> bytes:
    chunk = b"VP8L" + struct.pack("<I", len(vp8l)) + vp8l
    if len(vp8l) % 2:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


# ----------------------------------------------------------------- tests


def _rand_rgba(h, w, seed, alpha=True):
    rng = np.random.RandomState(seed)
    px = rng.randint(0, 256, (h, w, 4)).astype(np.uint8)
    if not alpha:
        px[..., 3] = 255
    return px


def _roundtrip(px, **kw):
    got = decode_vp8l_stream(encode_vp8l(px, **kw))
    want = px if px.shape[-1] == 4 else np.concatenate(
        [px, np.full((*px.shape[:2], 1), 255, np.uint8)], axis=2
    )
    assert np.array_equal(got, want)


def test_literals_roundtrip():
    _roundtrip(_rand_rgba(7, 9, 1))
    _roundtrip(_rand_rgba(1, 1, 2))
    _roundtrip(_rand_rgba(3, 1, 3))


def test_constant_channels_use_simple_codes():
    px = _rand_rgba(5, 5, 4)
    px[..., 3] = 255  # alpha constant → single-symbol code
    px[..., 2] = np.where(px[..., 2] > 127, 200, 30)  # blue → 2-symbol
    _roundtrip(px)


def test_subtract_green_roundtrip():
    _roundtrip(_rand_rgba(6, 8, 5), transforms=("sub_green",))


@pytest.mark.parametrize("mode", list(range(14)))
def test_predictor_all_modes_roundtrip(mode):
    _roundtrip(_rand_rgba(8, 11, 10 + mode), transforms=("pred",), pred_mode=mode)


def test_predictor_plus_subtract_green():
    # read order (pred, sub_green): decoder inverts sub_green first
    _roundtrip(
        _rand_rgba(9, 7, 30), transforms=("pred", "sub_green"), pred_mode=11
    )


@pytest.mark.parametrize("n_colors", [2, 4, 13])
def test_palette_bundling_roundtrip(n_colors):
    rng = np.random.RandomState(40 + n_colors)
    palette = rng.randint(0, 256, (n_colors, 4)).astype(np.uint8)
    idx = rng.randint(0, n_colors, (9, 13))
    _roundtrip(palette[idx], transforms=("palette",))


def test_lz77_direct_distance():
    px = _rand_rgba(4, 8, 50)
    px[2] = px[1]  # row 2 copies row 1 → distance 8, length 8
    ops = [("lit",)] * 16 + [("copy", 8, 8)] + [("lit",)] * 8
    _roundtrip(px, ops=ops)


def test_lz77_plane_code_distance():
    """2-D distance map: code 1 = (0, 1) → distance xsize."""
    px = _rand_rgba(4, 8, 51)
    px[2] = px[1]
    assert _DIST_MAP[0] == (0, 1)
    ops = [("lit",)] * 16 + [("copy", 8, 8, 1)] + [("lit",)] * 8
    _roundtrip(px, ops=ops)


def test_color_cache_roundtrip():
    px = _rand_rgba(3, 6, 52)
    px[2, 5] = px[0, 0]  # last pixel repeats the first → cache hit
    ops = [("lit",)] * 17 + [("cache",)]
    _roundtrip(px, ops=ops, cache_bits=6)


def test_meta_huffman_groups():
    """Two Huffman groups split left/right at a 4-pixel tile boundary."""
    rng = np.random.RandomState(53)
    px = np.zeros((8, 8, 4), np.uint8)
    px[:, :4] = rng.randint(0, 128, (8, 4, 4))
    px[:, 4:] = rng.randint(128, 256, (8, 4, 4))
    _roundtrip(px, meta=(2, lambda tx, ty: 0 if tx == 0 else 1))


def test_container_and_lossy_boundary():
    px = _rand_rgba(5, 5, 60)
    buf = wrap_webp(encode_vp8l(px))
    assert np.array_equal(decode_webp_pixels(buf)[..., :4], px)
    # lossy keyframes decode (tests/test_vp8.py) and interframes decode
    # inside sequences (tests/test_vp8_inter.py); a WebP STILL carrying
    # an interframe has no reference buffers — a data error
    inter = (
        b"RIFF" + struct.pack("<I", 16) + b"WEBP"
        + b"VP8 " + struct.pack("<I", 10) + b"\x01" + b"\x00" * 9
    )
    with pytest.raises(ValueError, match="without a prior keyframe"):
        decode_webp_pixels(inter)
    truncated = (
        b"RIFF" + struct.pack("<I", 16) + b"WEBP"
        + b"VP8 " + struct.pack("<I", 4) + b"\x00\x00\x00\x00"
    )
    with pytest.raises(ValueError):
        decode_webp_pixels(truncated)
    with pytest.raises(ValueError):
        decode_webp_pixels(b"RIFF\x00\x00\x00\x00WAVE")


def test_header_sniff_agrees_with_decode():
    from rustcheatersdatapipeline_spark.functions.multimodal import parse_webp_header

    px = _rand_rgba(11, 17, 61)
    buf = wrap_webp(encode_vp8l(px))
    assert parse_webp_header(buf) == (17, 11, 1)
    assert decode_webp_pixels(buf).shape == (11, 17, 4)


def test_mutation_totality():
    from rustcheatersdatapipeline_spark.functions.pixels import DECODE_QUARANTINE

    base = wrap_webp(
        encode_vp8l(_rand_rgba(6, 6, 62), transforms=("pred",), pred_mode=12)
    )
    rng = np.random.RandomState(0)
    for _ in range(400):
        buf = bytearray(base)
        buf[rng.randint(0, len(buf))] ^= rng.randint(1, 256)
        payload = bytes(buf[: rng.randint(0, len(buf) + 1)])
        try:
            decode_webp_pixels(payload)
        except DECODE_QUARANTINE:
            pass
