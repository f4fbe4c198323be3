"""TIFF decode (functions/tiff.py): the oracle is a test-side writer —
IFD construction in both byte orders, multi-strip layout, and forward
None / PackBits / TIFF-LZW (early change) compressors. Lossless ⇒
byte-exact round trips."""

import zlib

import numpy as np
import pytest

from rustcheatersdatapipeline_spark.functions.jpeg import decode_jpeg_pixels
from rustcheatersdatapipeline_spark.functions.tiff import (
    decode_tiff_pixels,
    parse_tiff_header,
)


def _pack_bits(row: bytes) -> bytes:
    """Forward PackBits: literal runs + repeat runs."""
    out = bytearray()
    i = 0
    n = len(row)
    while i < n:
        # find a repeat run of >= 3
        j = i
        while j + 1 < n and row[j + 1] == row[j] and j - i < 127:
            j += 1
        if j - i >= 2:
            out += bytes([257 - (j - i + 1), row[i]])
            i = j + 1
            continue
        # literal run until the next repeat of >= 3
        k = i
        while k < n and k - i < 127:
            if k + 2 < n and row[k] == row[k + 1] == row[k + 2]:
                break
            k += 1
        out += bytes([k - i - 1]) + row[i:k]
        i = k
    return bytes(out)


def _lzw_encode(data: bytes) -> bytes:
    """Forward TIFF-LZW with the early-change width bump."""
    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    bits: list[int] = []

    def emit(code: int) -> None:
        for i in range(width - 1, -1, -1):
            bits.append((code >> i) & 1)

    emit(256)  # Clear
    prev = b""
    for byte in data:
        cur = prev + bytes([byte])
        if cur in table:
            prev = cur
            continue
        emit(table[prev])
        table[cur] = next_code
        next_code += 1
        # early change, encoder side: bump when the next assignable
        # code reaches 2^w — the decoder (which builds each entry one
        # code later) bumps at 2^w - 1, and the pair stays in lockstep
        # (the old `>= 2^w - 1` here desynced at table entry 510,
        # caught by the 1536-byte random tiles in the tiled-layout
        # tests)
        if next_code >= (1 << width) and width < 12:
            width += 1
        if next_code >= 4094:  # keep the table bounded: restart
            emit(256)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        prev = bytes([byte])
    if prev:
        emit(table[prev])
    emit(257)  # EOI
    out = bytearray()
    for i in range(0, len(bits), 8):
        b = 0
        for bit in bits[i : i + 8]:
            b = (b << 1) | bit
        b <<= (8 - len(bits[i : i + 8])) % 8 if len(bits[i : i + 8]) < 8 else 0
        out.append(b)
    return bytes(out)


def make_tiff(
    px: np.ndarray,
    order: str = "little",
    comp: int = 1,
    rows_per_strip: int | None = None,
    photometric: int | None = None,
    colormap: np.ndarray | None = None,
    bilevel: bool = False,
    jpeg_strips: list[bytes] | None = None,
    jpeg_tables: bytes | None = None,
    predictor: int = 1,
    extra_tags: list | None = None,
) -> bytes:
    h, w = px.shape[:2]
    spp = 1 if px.ndim == 2 else px.shape[2]
    rows_per_strip = rows_per_strip or h
    if jpeg_strips is not None:
        comp = 7
    if bilevel:
        row_bytes = (w + 7) // 8
        flat_rows = [
            np.packbits(px[y].astype(np.uint8)).tobytes()[:row_bytes] for y in range(h)
        ]
    else:
        if predictor == 2:
            planes = px.astype(np.int16)
            if planes.ndim == 2:
                planes = planes[..., None]
            diffed = planes.copy()
            diffed[:, 1:] = planes[:, 1:] - planes[:, :-1]
            flat_rows = [(diffed[y] % 256).astype(np.uint8).tobytes() for y in range(h)]
        else:
            flat_rows = [px[y].astype(np.uint8).tobytes() for y in range(h)]

    if jpeg_strips is not None:
        strips = list(jpeg_strips)
    else:
        strips = []
        for start in range(0, h, rows_per_strip):
            raw = b"".join(flat_rows[start : start + rows_per_strip])
            if comp == 1:
                strips.append(raw)
            elif comp == 32773:
                strips.append(_pack_bits(raw))
            elif comp in (8, 32946):
                strips.append(zlib.compress(raw))
            else:
                strips.append(_lzw_encode(raw))

    def u(v, size):
        return int(v).to_bytes(size, order)

    entries = []  # (tag, type, count, packed-value or data-bytes)

    def entry(tag, typ, values):
        size = {3: 2, 4: 4}[typ]
        data = b"".join(u(v, size) for v in values)
        entries.append((tag, typ, len(values), data))

    bits = 1 if bilevel else 8
    entry(256, 4, [w])
    entry(257, 4, [h])
    entry(258, 3, [bits] * spp)
    entry(259, 3, [comp])
    entry(262, 3, [photometric if photometric is not None else (2 if spp >= 3 else 1)])
    entry(277, 3, [spp])
    entry(278, 4, [rows_per_strip])
    entry(279, 4, [len(s) for s in strips])
    if colormap is not None:
        entry(320, 3, [int(v) for v in colormap.reshape(-1)])
    if jpeg_tables is not None:
        entries.append((347, 7, len(jpeg_tables), jpeg_tables))
    if predictor != 1:
        entry(317, 3, [predictor])
    if spp == 4:
        entry(338, 3, [1])  # extra sample = associated alpha
    for tag, typ, values in (extra_tags or []):
        entry(tag, typ, values)

    # layout: header(8) + IFD + out-of-line values + strips
    n_with_offsets = len(entries) + 1  # plus StripOffsets
    ifd_size = 2 + 12 * n_with_offsets + 4
    pos = 8 + ifd_size
    blobs = []
    packed = []
    for tag, typ, count, data in entries:
        if len(data) <= 4:
            packed.append((tag, typ, count, data + bytes(4 - len(data))))
        else:
            packed.append((tag, typ, count, u(pos, 4)))
            blobs.append(data)
            pos += len(data)
    # strip offsets table
    off_table_pos = pos if len(strips) > 1 else None
    if len(strips) > 1:
        pos += 4 * len(strips)
    strip_offsets = []
    for s in strips:
        strip_offsets.append(pos)
        pos += len(s)
    so_data = b"".join(u(o, 4) for o in strip_offsets)
    if len(strips) > 1:
        packed.append((273, 4, len(strips), u(off_table_pos, 4)))
        blobs.append(so_data)
    else:
        packed.append((273, 4, 1, so_data))
    packed.sort(key=lambda e: e[0])

    out = (b"II*\x00" if order == "little" else b"MM\x00*") + u(8, 4)
    out += u(len(packed), 2)
    for tag, typ, count, val in packed:
        out += u(tag, 2) + u(typ, 2) + u(count, 4) + val
    out += u(0, 4)  # no next IFD
    for b in blobs:
        out += b
    for s in strips:
        out += s
    return bytes(out)


def _rand(h, w, ch, seed):
    a = np.random.RandomState(seed).randint(0, 256, (h, w, ch) if ch else (h, w))
    return a.astype(np.uint8)


@pytest.mark.parametrize("order", ["little", "big"])
@pytest.mark.parametrize("comp", [1, 32773, 5, 8, 32946])
def test_rgb_roundtrip_all_compressions(order, comp):
    px = _rand(11, 7, 3, seed=comp)
    got = decode_tiff_pixels(make_tiff(px, order=order, comp=comp))
    assert np.array_equal(got, px)


def test_multistrip_and_gray_and_rgba():
    gray = _rand(16, 9, 0, seed=9)
    got = decode_tiff_pixels(make_tiff(gray, comp=5, rows_per_strip=5))
    assert np.array_equal(got[..., 0], gray)
    rgba = _rand(6, 6, 4, seed=10)
    got = decode_tiff_pixels(make_tiff(rgba, comp=32773, rows_per_strip=2))
    assert np.array_equal(got, rgba)


def test_white_is_zero_inverted():
    gray = _rand(5, 5, 0, seed=11)
    got = decode_tiff_pixels(make_tiff(gray, photometric=0))
    assert np.array_equal(got[..., 0], 255 - gray)


def test_palette_color():
    rng = np.random.RandomState(12)
    cmap16 = rng.randint(0, 1 << 16, (3, 256)).astype(np.uint32)
    idx = rng.randint(0, 256, (7, 9)).astype(np.uint8)
    buf = make_tiff(idx, photometric=3, colormap=cmap16)
    got = decode_tiff_pixels(buf)
    lut = (cmap16 // 257).astype(np.uint8)
    want = np.stack([lut[0][idx], lut[1][idx], lut[2][idx]], axis=-1)
    assert np.array_equal(got, want)


def test_bilevel_fax_shape():
    rng = np.random.RandomState(13)
    bits = rng.randint(0, 2, (10, 19)).astype(np.uint8)
    got = decode_tiff_pixels(make_tiff(bits, bilevel=True, photometric=1))
    assert np.array_equal(got[..., 0], bits * 255)
    got0 = decode_tiff_pixels(make_tiff(bits, bilevel=True, photometric=0))
    assert np.array_equal(got0[..., 0], (1 - bits) * 255)


def test_header_and_named_boundaries():
    px = _rand(4, 6, 3, seed=14)
    buf = make_tiff(px)
    assert parse_tiff_header(buf) == (6, 4)
    buf2 = bytearray(make_tiff(px))
    i = buf2.find((259).to_bytes(2, "little"))
    buf2[i + 8 : i + 10] = (4).to_bytes(2, "little")
    with pytest.raises(NotImplementedError, match="compression scheme 4"):
        decode_tiff_pixels(bytes(buf2))
    buf3 = bytearray(make_tiff(px))
    i = buf3.find((259).to_bytes(2, "little"))
    buf3[i + 8 : i + 10] = (6).to_bytes(2, "little")
    with pytest.raises(NotImplementedError, match="old-style JPEG"):
        decode_tiff_pixels(bytes(buf3))


def test_mutation_totality():
    from rustcheatersdatapipeline_spark.functions.pixels import DECODE_QUARANTINE

    base = make_tiff(_rand(8, 8, 3, seed=15), comp=5, rows_per_strip=3)
    rng = np.random.RandomState(0)
    for _ in range(300):
        buf = bytearray(base)
        buf[rng.randint(0, len(buf))] ^= rng.randint(1, 256)
        try:
            decode_tiff_pixels(bytes(buf[: rng.randint(0, len(buf) + 1)]))
        except DECODE_QUARANTINE:
            pass


# --------------------------------------------- new-style JPEG (comp 7)


def _split_jpeg_tables(buf: bytes) -> tuple[bytes, bytes]:
    """Split a full baseline JPEG into (JPEGTables stream, abbreviated
    image stream) per TIFF Tech Note 2: tables = SOI DQT/DHT EOI,
    image = SOI <everything else> ... EOI."""
    segs = []
    pos = 2
    while True:
        marker = buf[pos + 1]
        if marker == 0xDA:
            tail = buf[pos:]  # SOS + entropy-coded data + EOI
            break
        ln = int.from_bytes(buf[pos + 2 : pos + 4], "big")
        segs.append((marker, buf[pos : pos + 2 + ln]))
        pos += 2 + ln
    tables = b"".join(s for m, s in segs if m in (0xDB, 0xC4))
    rest = b"".join(s for m, s in segs if m not in (0xDB, 0xC4))
    return b"\xff\xd8" + tables + b"\xff\xd9", b"\xff\xd8" + rest + tail


def test_jpeg_in_tiff_single_strip():
    from tests.test_jpeg_decode import encode_jpeg

    img = _rand(21, 13, 3, seed=31)
    jpg, _ = encode_jpeg(img, subsample=(1, 1))
    expected = decode_jpeg_pixels(jpg)
    buf = make_tiff(img, photometric=6, jpeg_strips=[jpg])
    assert np.array_equal(decode_tiff_pixels(buf), expected)
    assert parse_tiff_header(buf) == (13, 21)


def test_jpeg_in_tiff_multistrip_and_gray():
    from tests.test_jpeg_decode import encode_jpeg

    img = _rand(20, 16, 3, seed=32)
    bands = [img[0:8], img[8:16], img[16:20]]
    jpgs = [encode_jpeg(b, subsample=(1, 1))[0] for b in bands]
    expected = np.concatenate([decode_jpeg_pixels(j)[: b.shape[0]] for j, b in zip(jpgs, bands)])
    buf = make_tiff(img, photometric=6, rows_per_strip=8, jpeg_strips=jpgs)
    assert np.array_equal(decode_tiff_pixels(buf), expected)

    gray = _rand(9, 11, 0, seed=33)
    jpg, _ = encode_jpeg(gray)
    buf = make_tiff(gray, jpeg_strips=[jpg])
    assert np.array_equal(decode_tiff_pixels(buf), decode_jpeg_pixels(jpg))


def test_jpeg_in_tiff_shared_tables():
    """Strips with their DQT/DHT factored out into the JPEGTables tag
    must decode identically to the self-contained streams."""
    from tests.test_jpeg_decode import encode_jpeg

    img = _rand(16, 12, 3, seed=34)
    bands = [img[0:8], img[8:16]]
    jpgs = [encode_jpeg(b, subsample=(1, 1))[0] for b in bands]
    tables, _ = _split_jpeg_tables(jpgs[0])
    abbreviated = [_split_jpeg_tables(j)[1] for j in jpgs]
    assert all(b"\xff\xdb" not in a[:50] for a in abbreviated)
    buf = make_tiff(img, photometric=6, rows_per_strip=8,
                    jpeg_strips=abbreviated, jpeg_tables=tables)
    expected = np.concatenate([decode_jpeg_pixels(j) for j in jpgs])
    assert np.array_equal(decode_tiff_pixels(buf), expected)


def test_jpeg_in_tiff_mutation_totality():
    from rustcheatersdatapipeline_spark.functions.pixels import DECODE_QUARANTINE
    from tests.test_jpeg_decode import encode_jpeg

    img = _rand(8, 8, 3, seed=35)
    jpg, _ = encode_jpeg(img, subsample=(1, 1))
    tables, abbrev = _split_jpeg_tables(jpg)
    base = make_tiff(img, photometric=6, jpeg_strips=[abbrev], jpeg_tables=tables)
    rng = np.random.RandomState(1)
    for _ in range(300):
        buf = bytearray(base)
        buf[rng.randint(0, len(buf))] ^= rng.randint(1, 256)
        try:
            decode_tiff_pixels(bytes(buf[: rng.randint(0, len(buf) + 1)]))
        except DECODE_QUARANTINE:
            pass


@pytest.mark.parametrize("comp", [5, 8])
def test_horizontal_predictor(comp):
    """Predictor 2 (horizontal differencing) under LZW and Deflate,
    color and grayscale, multi-strip."""
    rgb = _rand(13, 9, 3, seed=41)
    got = decode_tiff_pixels(make_tiff(rgb, comp=comp, predictor=2, rows_per_strip=4))
    assert np.array_equal(got, rgb)
    gray = _rand(7, 15, 0, seed=42)
    got = decode_tiff_pixels(make_tiff(gray, comp=comp, predictor=2))
    assert np.array_equal(got[..., 0], gray)


def make_tiled_tiff(px: np.ndarray, tw: int, th: int, comp: int = 1,
                    predictor: int = 1, order: str = "little",
                    jpeg_tiles: list[bytes] | None = None,
                    bilevel: bool = False) -> bytes:
    """Tiled-layout writer (tags 322-325): grid of padded tiles,
    left-to-right then top-to-bottom, each compressed independently,
    predictor differencing restarting per tile row."""
    h, w = px.shape[:2]
    spp = 1 if px.ndim == 2 else px.shape[2]
    if px.ndim == 2:
        px = px[..., None]
    across, down = -(-w // tw), -(-h // th)
    padded = np.zeros((down * th, across * tw, spp), np.uint8)
    padded[:h, :w] = px
    if jpeg_tiles is not None:
        comp = 7
        tiles = list(jpeg_tiles)
    else:
        tiles = []
    for ti in range(0 if jpeg_tiles is not None else across * down):
        r, c = divmod(ti, across)
        tile = padded[r * th : (r + 1) * th, c * tw : (c + 1) * tw]
        if bilevel:
            raw = np.packbits(tile[..., 0], axis=1).tobytes()
        elif predictor == 2:
            t = tile.astype(np.int16)
            d = t.copy()
            d[:, 1:] = t[:, 1:] - t[:, :-1]
            raw = (d % 256).astype(np.uint8).tobytes()
        else:
            raw = tile.tobytes()
        if comp == 1:
            tiles.append(raw)
        elif comp == 32773:
            tiles.append(_pack_bits(raw))
        elif comp in (8, 32946):
            tiles.append(zlib.compress(raw))
        else:
            tiles.append(_lzw_encode(raw))

    def u(v, size):
        return int(v).to_bytes(size, order)

    entries = []

    def entry(tag, typ, values):
        size = {3: 2, 4: 4}[typ]
        entries.append((tag, typ, len(values),
                        b"".join(u(v, size) for v in values)))

    entry(256, 4, [w])
    entry(257, 4, [h])
    entry(258, 3, [1 if bilevel else 8] * spp)
    entry(259, 3, [comp])
    entry(262, 3, [2 if spp >= 3 else 1])
    entry(277, 3, [spp])
    if predictor != 1:
        entry(317, 3, [predictor])
    entry(322, 4, [tw])
    entry(323, 4, [th])
    entry(325, 4, [len(t) for t in tiles])
    n_entries = len(entries) + 1  # + TileOffsets
    ifd_size = 2 + 12 * n_entries + 4
    pos = 8 + ifd_size
    blobs, packed = [], []
    for tag, typ, count, data in entries:
        if len(data) <= 4:
            packed.append((tag, typ, count, data + bytes(4 - len(data))))
        else:
            packed.append((tag, typ, count, u(pos, 4)))
            blobs.append(data)
            pos += len(data)
    off_table_pos = pos if len(tiles) > 1 else None
    if off_table_pos is not None:
        pos += 4 * len(tiles)
    tile_offsets = []
    for t in tiles:
        tile_offsets.append(pos)
        pos += len(t)
    if off_table_pos is not None:
        packed.append((324, 4, len(tiles), u(off_table_pos, 4)))
        blobs.append(b"".join(u(o, 4) for o in tile_offsets))
    else:
        packed.append((324, 4, 1, u(tile_offsets[0], 4)))
    packed.sort(key=lambda e: e[0])
    out = bytearray()
    out += (b"II" if order == "little" else b"MM")
    out += u(42, 2) + u(8, 4)
    out += u(len(packed), 2)
    for tag, typ, count, val in packed:
        out += u(tag, 2) + u(typ, 2) + u(count, 4) + val
    out += u(0, 4)
    for b in blobs:
        out += b
    for t in tiles:
        out += t
    return bytes(out)


@pytest.mark.parametrize("comp", [1, 5, 8, 32773])
def test_tiled_layout_decodes(comp):
    rng = np.random.RandomState(19)
    px = rng.randint(0, 256, (37, 53, 3), np.uint8)  # non-multiple dims
    buf = make_tiled_tiff(px, 32, 16, comp=comp)
    assert np.array_equal(decode_tiff_pixels(buf), px)


def test_tiled_predictor_restarts_per_tile_row():
    rng = np.random.RandomState(23)
    px = rng.randint(0, 256, (20, 40), np.uint8)
    buf = make_tiled_tiff(px, 16, 16, comp=8, predictor=2)
    got = decode_tiff_pixels(buf)
    assert np.array_equal(got[..., 0], px)


def test_tiled_gray_single_tile_and_big_endian():
    rng = np.random.RandomState(29)
    px = rng.randint(0, 256, (16, 16), np.uint8)
    buf = make_tiled_tiff(px, 16, 16, order="big")
    assert np.array_equal(decode_tiff_pixels(buf)[..., 0], px)


def test_tiled_error_paths():
    rng = np.random.RandomState(31)
    px = rng.randint(0, 256, (16, 16, 3), np.uint8)
    good = make_tiled_tiff(px, 16, 16)
    import pytest as _pytest

    with _pytest.raises((ValueError, NotImplementedError, IndexError)):
        decode_tiff_pixels(good[: len(good) - 40])
    for trial in range(60):
        buf = bytearray(good)
        if trial % 3 == 0:
            buf = buf[: rng.randint(8, len(buf))]
        else:
            for _ in range(rng.randint(1, 4)):
                buf[rng.randint(0, len(buf))] = rng.randint(0, 256)
        try:
            out = decode_tiff_pixels(bytes(buf))
            assert out.ndim == 3
        except (ValueError, NotImplementedError, IndexError):
            pass


def test_lzw_early_change_boundary_roundtrips():
    """Regression pin for the early-change lockstep: random streams
    long enough to cross the 9->10 bit boundary (table entry 510) and
    the 12-bit restart both round-trip. The engine decoder follows the
    libtiff semantics (decoder bumps at 2^w - 1, one entry before the
    encoder's 2^w, compensating the decoder's one-entry lag); the test
    encoder's old bump-at-2^w-1 desynced exactly at entry 510."""
    from rustcheatersdatapipeline_spark.functions.tiff import _lzw_decode

    for seed, n in ((19, 600), (20, 1536), (21, 25000)):
        rng = np.random.RandomState(seed)
        raw = rng.randint(0, 256, n).astype(np.uint8).tobytes()
        assert _lzw_decode(_lzw_encode(raw), n) == raw


def test_tiled_jpeg_with_shared_tables():
    """JPEG-compressed tiles (comp 7 + tags 322-325) stitch on the
    padded grid with the JPEGTables splice handled per tile."""
    rng = np.random.RandomState(61)
    from tests.test_jpeg_decode import encode_jpeg

    px = rng.randint(0, 256, (20, 28, 3), np.uint8)
    tw, th = 16, 16
    across, down = 2, 2
    padded = np.zeros((down * th, across * tw, 3), np.uint8)
    padded[:20, :28] = px
    tiles, expected_tiles = [], []
    for ti in range(4):
        r, c = divmod(ti, across)
        tile = padded[r * th : (r + 1) * th, c * tw : (c + 1) * tw]
        buf, exp = encode_jpeg(tile)
        tiles.append(buf)
        expected_tiles.append(exp)
    buf = make_tiled_tiff(px, tw, th, jpeg_tiles=tiles)
    got = decode_tiff_pixels(buf)
    assert got.shape == (20, 28, 3)
    want = np.zeros_like(padded)
    for ti in range(4):
        r, c = divmod(ti, across)
        want[r * th : (r + 1) * th, c * tw : (c + 1) * tw] = expected_tiles[ti]
    assert np.array_equal(got, want[:20, :28])


@pytest.mark.parametrize("comp", [1, 32773])
def test_tiled_bilevel_decodes(comp):
    rng = np.random.RandomState(73)
    bits = rng.randint(0, 2, (21, 37)).astype(np.uint8)
    buf = make_tiled_tiff(bits, 16, 16, comp=comp, bilevel=True)
    got = decode_tiff_pixels(buf)
    assert got.shape == (21, 37, 1)
    assert np.array_equal(got[..., 0], bits * 255)  # BlackIsZero polarity


@pytest.mark.parametrize("order", ["little", "big"])
def test_16bit_samples_high_byte_downscale(order):
    """48-bit RGB / 16-bit gray TIFFs decode with the PNG16 policy:
    keep the high byte. Field-by-field writer (bits 258 = 16)."""
    rng = np.random.RandomState(79)
    vals = rng.randint(0, 1 << 16, (7, 9, 3)).astype(np.uint16)
    flat_rows = [
        vals[y].astype(">u2" if order == "big" else "<u2").tobytes()
        for y in range(7)
    ]
    strips = [b"".join(flat_rows)]

    def u(v, size):
        return int(v).to_bytes(size, order)

    def short(v):  # SHORT values are LEFT-justified in the value field
        return u(v, 2) + b"\x00\x00"

    entries = [
        (256, 4, 1, u(9, 4)), (257, 4, 1, u(7, 4)),
        (258, 3, 3, None),  # out-of-line 16,16,16
        (259, 3, 1, short(1)), (262, 3, 1, short(2)),
        (277, 3, 1, short(3)), (278, 4, 1, u(7, 4)),
        (279, 4, 1, u(len(strips[0]), 4)),
    ]
    n = len(entries) + 1
    ifd_size = 2 + 12 * n + 4
    pos = 8 + ifd_size
    bits_off = pos
    pos += 6
    strip_off = pos
    out = bytearray()
    out += (b"II*\x00" if order == "little" else b"MM\x00*") + u(8, 4)
    out += u(n, 2)
    packed = []
    for tag, typ, count, val in entries:
        if tag == 258:
            packed.append((tag, typ, count, u(bits_off, 4)))
        else:
            packed.append((tag, typ, count, val))
    packed.append((273, 4, 1, u(strip_off, 4)))
    packed.sort(key=lambda e: e[0])
    for tag, typ, count, val in packed:
        out += u(tag, 2) + u(typ, 2) + u(count, 4) + val
    out += u(0, 4)
    out += u(16, 2) + u(16, 2) + u(16, 2)
    out += strips[0]
    got = decode_tiff_pixels(bytes(out))
    assert np.array_equal(got, (vals >> 8).astype(np.uint8))
