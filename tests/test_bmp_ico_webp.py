"""BMP / ICO (favicon) decode + WebP header sniff (functions/pixels.py,
multimodal.py). Oracles are test-side spec-exact writers: BMP
(BITMAPFILEHEADER + BITMAPINFOHEADER, bottom-up/top-down, 32/24-bpp and
paletted rows), ICO (directory + DIB entries with AND masks, or
PNG-compressed entries), WebP (RIFF with VP8/VP8L/VP8X/ANMF chunks)."""

import struct

import numpy as np
import pytest

from rustcheatersdatapipeline_spark.functions.multimodal import (
    decode_header,
    parse_bmp_header,
    parse_ico_header,
    parse_webp_header,
)
from rustcheatersdatapipeline_spark.functions.pixels import (
    decode_bmp_pixels,
    decode_ico_pixels,
)


def _dib_header(w: int, h: int, bpp: int, n_pal: int = 0) -> bytes:
    return struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, bpp, 0, 0, 2835, 2835, n_pal, 0
    )


def _pack_rows(px: np.ndarray, bpp: int, palette: np.ndarray | None = None) -> bytes:
    """Rows in storage order (caller pre-flips for bottom-up)."""
    h, w = px.shape[:2]
    out = bytearray()
    for y in range(h):
        if bpp == 32:
            row = px[y][:, [2, 1, 0, 3]].tobytes()  # RGBA → BGRA
        elif bpp == 24:
            row = px[y][:, ::-1].tobytes()  # RGB → BGR
        elif bpp == 8:
            row = px[y].tobytes()  # indices
        else:
            bits = (
                (px[y][:, None].astype(np.uint8) >> np.arange(bpp - 1, -1, -1)) & 1
            ).reshape(-1)
            pad = (-len(bits)) % 8
            bits = np.concatenate([bits, np.zeros(pad, np.uint8)])
            row = np.packbits(bits).tobytes()
        row += bytes((-len(row)) % 4)  # 4-byte align
        out += row
    return bytes(out)


def make_bmp(px: np.ndarray, bpp: int = 24, top_down: bool = False,
             palette: np.ndarray | None = None) -> bytes:
    h, w = px.shape[:2]
    n_pal = len(palette) if palette is not None else 0
    pal_bytes = b""
    if palette is not None:
        pal = np.zeros((n_pal, 4), np.uint8)
        pal[:, [2, 1, 0]] = palette  # RGB → BGRX
        pal_bytes = pal.tobytes()
    rows = _pack_rows(px if top_down else px[::-1], bpp)
    dib = _dib_header(w, h if not top_down else -h, bpp, n_pal)
    off = 14 + len(dib) + len(pal_bytes)
    hdr = b"BM" + struct.pack("<IHHI", off + len(rows), 0, 0, off)
    return hdr + dib + pal_bytes + rows


def make_ico(entries: list[bytes], dims: list[tuple[int, int]]) -> bytes:
    """entries = raw per-image payloads (DIB or PNG)."""
    n = len(entries)
    out = bytearray(b"\x00\x00\x01\x00" + struct.pack("<H", n))
    off = 6 + 16 * n
    for (w, h), e in zip(dims, entries):
        out += bytes([w % 256, h % 256, 0, 0]) + struct.pack(
            "<HHII", 1, 32, len(e), off
        )
        off += len(e)
    for e in entries:
        out += e
    return bytes(out)


def make_ico_dib_entry(px: np.ndarray, bpp: int = 32,
                       palette: np.ndarray | None = None,
                       mask: np.ndarray | None = None) -> bytes:
    """DIB entry with DOUBLED height and a 1-bit AND mask."""
    h, w = px.shape[:2]
    n_pal = len(palette) if palette is not None else 0
    pal_bytes = b""
    if palette is not None:
        pal = np.zeros((n_pal, 4), np.uint8)
        pal[:, [2, 1, 0]] = palette
        pal_bytes = pal.tobytes()
    rows = _pack_rows(px[::-1], bpp)
    if mask is None:
        mask = np.zeros((h, w), np.uint8)
    mrows = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        bits = np.concatenate([mask[y], np.zeros((-w) % 8, np.uint8)])
        row = np.packbits(bits).tobytes()
        row += bytes((-len(row)) % 4)
        mrows += row
    return _dib_header(w, 2 * h, bpp, n_pal) + pal_bytes + rows + bytes(mrows)


def _rand_rgba(h, w, seed):
    return np.random.RandomState(seed).randint(0, 256, (h, w, 4)).astype(np.uint8)


def test_bmp_24_and_32_roundtrip():
    px = _rand_rgba(9, 7, 1)
    got32 = decode_bmp_pixels(make_bmp(px, bpp=32))
    assert np.array_equal(got32, px)
    got24 = decode_bmp_pixels(make_bmp(px[..., :3], bpp=24))
    assert np.array_equal(got24, px[..., :3])
    # top-down rows
    got_td = decode_bmp_pixels(make_bmp(px[..., :3], bpp=24, top_down=True))
    assert np.array_equal(got_td, px[..., :3])


@pytest.mark.parametrize("bpp", [1, 4, 8])
def test_bmp_paletted_roundtrip(bpp):
    rng = np.random.RandomState(bpp)
    n = 1 << bpp
    palette = rng.randint(0, 256, (n, 3)).astype(np.uint8)
    idx = rng.randint(0, n, (11, 13)).astype(np.uint8)
    buf = make_bmp(idx, bpp=bpp, palette=palette)
    assert np.array_equal(decode_bmp_pixels(buf), palette[idx])
    assert parse_bmp_header(buf) == (13, 11)
    assert decode_header(buf) == ("image/bmp", 13, 11, 1)


def test_ico_dib_entry_with_mask():
    rng = np.random.RandomState(5)
    px = rng.randint(0, 256, (8, 8, 3)).astype(np.uint8)
    mask = (rng.randint(0, 2, (8, 8))).astype(np.uint8)  # 1 = transparent
    buf = make_ico([make_ico_dib_entry(px, bpp=24, mask=mask)], [(8, 8)])
    got = decode_ico_pixels(buf)
    assert got.shape == (8, 8, 4)
    assert np.array_equal(got[..., :3], px)
    assert np.array_equal(got[..., 3], np.where(mask == 1, 0, 255))
    assert parse_ico_header(buf) == (8, 8, 1)
    assert decode_header(buf) == ("image/x-icon", 8, 8, 1)


def test_ico_32bpp_alpha_from_pixels():
    px = _rand_rgba(6, 6, 6)
    buf = make_ico([make_ico_dib_entry(px, bpp=32)], [(6, 6)])
    assert np.array_equal(decode_ico_pixels(buf), px)


def test_ico_png_entry_and_largest_selection():
    from tests.test_pixels_decode import encode_png

    rng = np.random.RandomState(7)
    small = rng.randint(0, 256, (4, 4, 3)).astype(np.uint8)
    big = rng.randint(0, 256, (16, 16, 3)).astype(np.uint8)
    buf = make_ico(
        [make_ico_dib_entry(small, bpp=24), encode_png(big)],
        [(4, 4), (16, 16)],
    )
    got = decode_ico_pixels(buf)  # must pick the larger (PNG) entry
    assert got.shape == (16, 16, 4)
    assert np.array_equal(got[..., :3], big)
    assert (got[..., 3] == 255).all()


def test_webp_header_variants():
    def riff(chunks: bytes) -> bytes:
        return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WEBP" + chunks

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) % 2 else b"")

    vp8 = chunk(b"VP8 ", b"\x00\x00\x00\x9d\x01\x2a" + struct.pack("<HH", 320, 240) + b"\x00" * 8)
    assert parse_webp_header(riff(vp8)) == (320, 240, 1)
    bits = (99 | (49 << 14))  # w-1=99, h-1=49
    vp8l = chunk(b"VP8L", b"\x2f" + struct.pack("<I", bits) + b"\x00" * 4)
    assert parse_webp_header(riff(vp8l)) == (100, 50, 1)
    vp8x = chunk(b"VP8X", b"\x00" * 4 + (63).to_bytes(3, "little") + (31).to_bytes(3, "little"))
    anim = riff(vp8x + chunk(b"ANMF", b"\x00" * 16) + chunk(b"ANMF", b"\x00" * 16))
    assert parse_webp_header(anim) == (64, 32, 2)
    assert decode_header(riff(vp8)) == ("image/webp", 320, 240, 1)
    assert parse_webp_header(b"RIFF\x00\x00\x00\x00WAVE") is None


@pytest.mark.slow
def test_phash_and_resize_cover_bmp_ico(spark):
    """Favicons join the perceptual index: a BMP and its ICO wrapping
    hash identically; resize_media thumbnails a BMP."""
    from rustcheatersdatapipeline_spark.functions.imaging import resize_media
    from rustcheatersdatapipeline_spark.functions.phash import featurize_phash
    from rustcheatersdatapipeline_spark.functions.pixels import decode_png_pixels

    rng = np.random.RandomState(9)
    coarse = rng.randint(0, 256, (8, 8)).astype(np.uint8)
    img = np.repeat(np.repeat(coarse, 8, axis=0), 8, axis=1)
    rgb = np.stack([img] * 3, axis=-1)
    bmp = make_bmp(rgb, bpp=24)
    ico = make_ico([make_ico_dib_entry(rgb, bpp=24)], [(64, 64)])
    media = spark.createDataFrame(
        [(1, bytearray(bmp)), (2, bytearray(ico))], "item_id long, payload binary"
    )
    hashes = {r["item_id"]: r["phash"] for r in featurize_phash(media).collect()}
    assert bin(hashes[1] ^ hashes[2]).count("1") <= 3
    out = {r["item_id"]: r for r in resize_media(media, 8, 8).collect()}
    assert decode_png_pixels(bytes(out[1]["payload"])).shape == (8, 8, 3)


def test_bmp_ico_mutation_totality():
    rng = np.random.RandomState(11)
    px = _rand_rgba(8, 8, 12)
    bases = [
        make_bmp(px[..., :3], bpp=24),
        make_ico([make_ico_dib_entry(px, bpp=32)], [(8, 8)]),
    ]
    from rustcheatersdatapipeline_spark.functions.pixels import DECODE_QUARANTINE

    for base in bases:
        for _ in range(150):
            buf = bytearray(base)
            buf[rng.randint(0, len(buf))] ^= rng.randint(1, 256)
            payload = bytes(buf[: rng.randint(0, len(buf) + 1)])
            decode_header(payload)  # total
            for fn in (decode_bmp_pixels, decode_ico_pixels):
                try:
                    fn(payload)
                except DECODE_QUARANTINE:
                    pass


# ------------------------------------------------- r10: RLE/core/16-bit


def _rle8_encode(idx: np.ndarray) -> bytes:
    """Forward BI_RLE8: encoded runs + end-of-line/bitmap escapes,
    with an absolute run thrown in per row when it fits."""
    h, w = idx.shape
    out = bytearray()
    for y in range(h):
        x = 0
        used_abs = False
        while x < w:
            run = 1
            while x + run < w and idx[y, x + run] == idx[y, x] and run < 255:
                run += 1
            if run < 3 and not used_abs and w - x >= 3:
                n = min(w - x, 255)
                out += bytes([0, n]) + idx[y, x : x + n].tobytes()
                if n & 1:
                    out += b"\x00"  # word alignment
                x += n
                used_abs = True
                continue
            out += bytes([run, idx[y, x]])
            x += run
        out += b"\x00\x00"  # end of line
    out += b"\x00\x01"  # end of bitmap
    return bytes(out)


def _rle4_encode(idx: np.ndarray) -> bytes:
    h, w = idx.shape
    out = bytearray()
    for y in range(h):
        x = 0
        while x < w:
            n = min(w - x, 254)
            pair_val = 0
            # encoded run alternating two nibbles: use per-pixel pairs
            a = int(idx[y, x])
            b = int(idx[y, x + 1]) if x + 1 < w else a
            run = 0
            while (x + run < w and run < 255
                   and int(idx[y, x + run]) == (a, b)[run & 1]):
                run += 1
            out += bytes([run, (a << 4) | b])
            x += run
            del n, pair_val
        out += b"\x00\x00"
    out += b"\x00\x01"
    return bytes(out)


def make_bmp_rle(idx: np.ndarray, palette: np.ndarray, bpp: int) -> bytes:
    h, w = idx.shape
    data = _rle8_encode(idx) if bpp == 8 else _rle4_encode(idx)
    n_pal = len(palette)
    pal = np.zeros((n_pal, 4), np.uint8)
    pal[:, [2, 1, 0]] = palette
    comp = 1 if bpp == 8 else 2
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, bpp, comp,
                      len(data), 0, 0, n_pal, 0)
    off = 14 + len(dib) + len(pal.tobytes())
    hdr = b"BM" + struct.pack("<IHHI", off + len(data), 0, 0, off)
    return hdr + dib + pal.tobytes() + data


def test_bmp_rle8_and_rle4_decode():
    rng = np.random.RandomState(47)
    palette = rng.randint(0, 256, (16, 3)).astype(np.uint8)
    idx = rng.randint(0, 16, (9, 13)).astype(np.uint8)
    idx[2, :] = 5  # long encoded run
    idx[:, 0] = 3
    for bpp in (8, 4):
        buf = make_bmp_rle(idx, palette, bpp)
        got = decode_bmp_pixels(buf)
        # storage is bottom-up: decoded rows flip
        assert np.array_equal(got, palette[idx][::-1])


def test_bmp_core_header_and_16bpp():
    rng = np.random.RandomState(53)
    # OS/2 BITMAPCOREHEADER, 24-bpp
    px = rng.randint(0, 256, (5, 7, 3)).astype(np.uint8)
    rows = _pack_rows(px[::-1], 24)
    dib = struct.pack("<IHHHH", 12, 7, 5, 1, 24)
    off = 14 + len(dib)
    buf = b"BM" + struct.pack("<IHHI", off + len(rows), 0, 0, off) + dib + rows
    assert np.array_equal(decode_bmp_pixels(buf), px)
    # 16-bpp RGB555
    v555 = rng.randint(0, 1 << 15, (6, 9)).astype(np.uint16)
    rows = bytearray()
    for y in range(5, -1, -1):  # bottom-up
        row = v555[y].astype("<u2").tobytes()
        row += bytes((-len(row)) % 4)
        rows += row
    dib = struct.pack("<IiiHHIIiiII", 40, 9, 6, 1, 16, 0,
                      len(rows), 0, 0, 0, 0)
    off = 14 + len(dib)
    buf = (b"BM" + struct.pack("<IHHI", off + len(rows), 0, 0, off)
           + dib + bytes(rows))
    got = decode_bmp_pixels(buf)
    r = ((v555.astype(np.uint32) >> 10) & 31) * 255 // 31
    g = ((v555.astype(np.uint32) >> 5) & 31) * 255 // 31
    b = (v555.astype(np.uint32) & 31) * 255 // 31
    want = np.stack([r, g, b], axis=2).astype(np.uint8)
    assert np.array_equal(got, want)


def test_bmp_rle_totality():
    rng = np.random.RandomState(59)
    palette = rng.randint(0, 256, (16, 3)).astype(np.uint8)
    idx = rng.randint(0, 16, (8, 8)).astype(np.uint8)
    good = make_bmp_rle(idx, palette, 8)
    from rustcheatersdatapipeline_spark.functions.pixels import (
        DECODE_QUARANTINE,
        decode_bmp_pixels as dec,
    )

    for trial in range(80):
        buf = bytearray(good)
        if trial % 3 == 0:
            buf = buf[: rng.randint(2, len(buf))]
        else:
            for _ in range(rng.randint(1, 4)):
                buf[rng.randint(0, len(buf))] = rng.randint(0, 256)
        try:
            out = dec(bytes(buf))
            assert out.ndim == 3
        except DECODE_QUARANTINE:
            pass
