"""Baseline JPEG payload decode (functions/jpeg.py).

The oracle is a test-side baseline-JPEG ENCODER (forward DCT →
quantize → zigzag → DC-diff + AC run-length → canonical Huffman →
byte stuffing → marker stream). Because JPEG is lossy, the assertion
is NOT decode(encode(img)) == img: the test replays the encoder's OWN
quantized coefficients through an independently-written dequantize +
IDCT + color transform and requires the decoder to match that expected
image to within 1 gray level (float associativity can flip a rounding
tie; ≥99% of samples must match exactly).

The Huffman tables are custom canonical tables (12 DC symbols at one
length, all 176 possible AC run/size symbols at one length) — T.81
allows ANY valid DHT, so the decoder must not assume the Annex K
defaults; the canonical code-assignment algorithm itself is pinned
against the published Annex K DC-luminance codes."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from rustcheatersdatapipeline_spark.functions.jpeg import (
    ZIGZAG,
    build_huffman,
    decode_jpeg_pixels,
)

# ---------------------------------------------------------------- encoder

#: Annex K table K.1 (luminance), zigzag order — public spec data
QT_LUMA = np.array(
    [
        16, 11, 12, 14, 12, 10, 16, 14, 13, 14, 18, 17, 16, 19, 24, 40,
        26, 24, 22, 22, 24, 49, 35, 37, 29, 40, 58, 51, 61, 60, 57, 51,
        56, 55, 64, 72, 92, 78, 64, 68, 87, 69, 55, 56, 80, 109, 81, 87,
        95, 98, 103, 104, 103, 62, 77, 113, 121, 112, 100, 120, 92, 101,
        103, 99,
    ],
    np.int64,
)
#: flat chroma table (valid per spec; keeps chroma error small)
QT_CHROMA = np.full(64, 17, np.int64)

#: custom canonical DHT: 12 DC categories at length 4; all 176 AC
#: run/size symbols (r 0..15 × s 0..10) at length 9
DC_BITS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
DC_VALS = bytes(range(12))
AC_VALS = bytes((r << 4) | s for r in range(16) for s in range(11))
AC_BITS = [0, 0, 0, 0, 0, 0, 0, 0, len(AC_VALS), 0, 0, 0, 0, 0, 0, 0]


def _codes(bits, vals):
    """symbol -> (length, code), by inverting the canonical builder."""
    return {sym: lc for lc, sym in build_huffman(bits, vals).items()}


DC_CODES = _codes(DC_BITS, DC_VALS)
AC_CODES = _codes(AC_BITS, AC_VALS)


def _dct_basis():
    x = np.arange(8)
    u = x.reshape(8, 1)
    c = np.cos((2 * x + 1) * u * np.pi / 16) * 0.5
    c[0] *= 1 / np.sqrt(2)
    return c


class BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, val: int, bits: int) -> None:
        for i in range(bits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((val >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.buf.append(self.acc)
                self.acc = 0
                self.n = 0

    def to_bytes(self) -> bytes:
        if self.n:
            self.buf.append((self.acc << (8 - self.n)) | ((1 << (8 - self.n)) - 1))
            self.acc = 0
            self.n = 0
        return bytes(self.buf).replace(b"\xff", b"\xff\x00")


def _cat(v: int) -> int:
    return int(abs(v)).bit_length()


def _encode_block(w: BitWriter, zzq: np.ndarray, pred: int) -> int:
    diff = int(zzq[0]) - pred
    s = _cat(diff)
    ln, code = DC_CODES[s]
    w.write(code, ln)
    if s:
        w.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    for k in range(1, 64):
        v = int(zzq[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            ln, code = AC_CODES[0xF0]
            w.write(code, ln)
            run -= 16
        s = _cat(v)
        ln, code = AC_CODES[(run << 4) | s]
        w.write(code, ln)
        w.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if run:
        ln, code = AC_CODES[0x00]  # EOB
        w.write(code, ln)
    return int(zzq[0])


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body


def _quantize_plane(plane: np.ndarray, qt_zz: np.ndarray) -> list[np.ndarray]:
    """Per 8x8 block: forward DCT → quantize → zigzag. Returns blocks in
    row-major block order for this plane."""
    C = _dct_basis()
    qnat = np.empty(64, np.int64)
    qnat[ZIGZAG] = qt_zz
    h, w = plane.shape
    out = []
    for y0 in range(0, h, 8):
        for x0 in range(0, w, 8):
            f = C @ (plane[y0 : y0 + 8, x0 : x0 + 8] - 128.0) @ C.T
            q = np.round(f.reshape(64) / qnat).astype(np.int64)
            out.append(q[ZIGZAG])
    return out


def _prepare(img: np.ndarray, subsample: tuple[int, int]):
    """Shared encoder front half: color transform, padding, chroma
    downsample, per-block quantized zigzag coefficients, and the
    EXPECTED decode (independent dequant + IDCT) — used by both the
    baseline and progressive writers (same coefficients, so both modes
    must reconstruct the same image)."""
    gray = img.ndim == 2
    h, w = img.shape[:2]
    sx, sy = (1, 1) if gray else subsample
    mcu_w, mcu_h = 8 * sx, 8 * sy
    ph, pw = -(-h // mcu_h) * mcu_h, -(-w // mcu_w) * mcu_w

    if gray:
        comps = [(1, 1, 1, 0)]
        padded = [np.pad(img.astype(np.float64), ((0, ph - h), (0, pw - w)), "edge")]
        qts = [QT_LUMA]
    else:
        f = img.astype(np.float64)
        r, g, b = f[..., 0], f[..., 1], f[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128 + 0.5 * r - 0.418688 * g - 0.081312 * b
        planes = [np.pad(p, ((0, ph - h), (0, pw - w)), "edge") for p in (y, cb, cr)]
        # box-average chroma downsample
        for i in (1, 2):
            p = planes[i]
            planes[i] = p.reshape(ph // sy, sy, pw // sx, sx).mean(axis=(1, 3))
        comps = [(1, sx, sy, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
        padded = planes
        qts = [QT_LUMA, QT_CHROMA, QT_CHROMA]

    blocks = [_quantize_plane(p, qt) for p, qt in zip(padded, qts)]

    # ---- expected decode (independent dequant + IDCT via einsum) ----
    C = _dct_basis()
    recon = []
    for bl, qt, p in zip(blocks, qts, padded):
        qnat = np.empty(64, np.int64)
        qnat[ZIGZAG] = qt
        ch, cw = p.shape
        plane = np.empty((ch, cw))
        i = 0
        for y0 in range(0, ch, 8):
            for x0 in range(0, cw, 8):
                fnat = np.zeros(64)
                fnat[ZIGZAG] = bl[i]
                fq = (fnat * qnat).reshape(8, 8)
                plane[y0 : y0 + 8, x0 : x0 + 8] = np.einsum(
                    "ux,uv,vy->xy", C, fq, C
                )
                i += 1
        recon.append(plane + 128.0)
    if gray:
        expected = np.clip(np.round(recon[0][:h, :w]), 0, 255).astype(np.uint8)[..., None]
    else:
        yy = recon[0][:h, :w]
        cbf = np.repeat(np.repeat(recon[1], sy, axis=0), sx, axis=1)[:h, :w]
        crf = np.repeat(np.repeat(recon[2], sy, axis=0), sx, axis=1)[:h, :w]
        rr = yy + 1.402 * (crf - 128.0)
        gg = yy - 0.344136 * (cbf - 128.0) - 0.714136 * (crf - 128.0)
        bb = yy + 1.772 * (cbf - 128.0)
        expected = np.clip(np.round(np.stack([rr, gg, bb], -1)), 0, 255).astype(np.uint8)
    return gray, h, w, ph, pw, comps, blocks, expected


def _mcu_order(comps, ph, pw):
    """(component index, block index) visit order for an interleaved
    scan, plus per-component blocks-per-row."""
    max_h = max(c[1] for c in comps)
    max_v = max(c[2] for c in comps)
    mcus_x, mcus_y = pw // (8 * max_h), ph // (8 * max_v)
    bw = {c[0]: pw * c[1] // max_h // 8 for c in comps}  # blocks per row
    order = []
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci, (cid, hi, vi, _) in enumerate(comps):
                for v in range(vi):
                    for hh in range(hi):
                        order.append((ci, (my * vi + v) * bw[cid] + mx * hi + hh))
    return order


def encode_jpeg(
    img: np.ndarray, subsample: tuple[int, int] = (1, 1), restart: int = 0
) -> tuple[bytes, np.ndarray]:
    """(jpeg bytes, expected decode) for a (h, w) gray or (h, w, 3) RGB
    uint8 image. ``subsample`` is the chroma downsample factor (x, y):
    (1,1)=4:4:4, (2,1)=4:2:2, (2,2)=4:2:0. The expected image replays
    the quantized coefficients through an independent IDCT."""
    gray, h, w, ph, pw, comps, blocks, expected = _prepare(img, subsample)
    order = _mcu_order(comps, ph, pw)
    segments = []
    wtr = BitWriter()
    preds = [0] * len(comps)
    for i, (ci, bi) in enumerate(order):
        per_mcu = sum(c[1] * c[2] for c in comps)
        if restart and i and i % (restart * per_mcu) == 0:
            segments.append(wtr.to_bytes())
            wtr = BitWriter()
            preds = [0] * len(comps)
        preds[ci] = _encode_block(wtr, blocks[ci][bi], preds[ci])
    segments.append(wtr.to_bytes())
    ecs = segments[0]
    for i, s in enumerate(segments[1:]):
        ecs += bytes([0xFF, 0xD0 + (i % 8)]) + s

    # ---- marker stream ----
    out = b"\xff\xd8"
    dqt = bytes([0x00]) + bytes(QT_LUMA.tolist())
    if not gray:
        dqt += bytes([0x01]) + bytes(QT_CHROMA.tolist())
    out += _seg(0xDB, dqt)
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([len(comps)])
    for cid, hi, vi, tq in comps:
        sof += bytes([cid, (hi << 4) | vi, tq])
    out += _seg(0xC0, sof)
    dht = (
        bytes([0x00]) + bytes(DC_BITS) + DC_VALS + bytes([0x10]) + bytes(AC_BITS) + AC_VALS
    )
    if not gray:
        dht += (
            bytes([0x01]) + bytes(DC_BITS) + DC_VALS
            + bytes([0x11]) + bytes(AC_BITS) + AC_VALS
        )
    out += _seg(0xC4, dht)
    if restart:
        out += _seg(0xDD, restart.to_bytes(2, "big"))
    sos = bytes([len(comps)])
    for i, (cid, *_rest) in enumerate(comps):
        t = 0 if i == 0 else 1
        if gray:
            t = 0
        sos += bytes([cid, (t << 4) | t])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos) + ecs + b"\xff\xd9"
    return out, expected


# ------------------------------------------------- progressive encoder


def _trunc(v: int, al: int) -> int:
    """AC point transform: divide by 2^Al truncating TOWARD ZERO
    (T.81 G.1.2.2 — unlike the DC arithmetic shift)."""
    return v >> al if v >= 0 else -((-v) >> al)


def _emit_amplitude(w: BitWriter, v: int, s: int) -> None:
    w.write(v if v >= 0 else v + (1 << s) - 1, s)


def _emit_dc_first(w: BitWriter, blocks, order, al: int) -> None:
    preds = {}
    for ci, bi in order:
        v = int(blocks[ci][bi][0]) >> al  # DC: arithmetic shift
        diff = v - preds.get(ci, 0)
        preds[ci] = v
        s = _cat(diff)
        ln, code = DC_CODES[s]
        w.write(code, ln)
        if s:
            _emit_amplitude(w, diff, s)


def _emit_dc_refine(w: BitWriter, blocks, order, al: int) -> None:
    for ci, bi in order:
        w.write((int(blocks[ci][bi][0]) >> al) & 1, 1)


class _EobState:
    """EOB-run + buffered-correction-bit state shared across the blocks
    of one AC scan (jcphuff's EOBRUN/BE machinery)."""

    def __init__(self, w: BitWriter):
        self.w = w
        self.eobrun = 0
        self.pending: list[int] = []

    def flush(self) -> None:
        if self.eobrun:
            r = self.eobrun.bit_length() - 1
            ln, code = AC_CODES[r << 4]
            self.w.write(code, ln)
            if r:
                self.w.write(self.eobrun - (1 << r), r)
            self.eobrun = 0
        for b in self.pending:
            self.w.write(b, 1)
        self.pending.clear()


def _emit_ac_first_block(st: _EobState, blk, ss: int, se: int, al: int) -> None:
    t = [_trunc(int(blk[k]), al) for k in range(ss, se + 1)]
    nz = [j for j, v in enumerate(t) if v]
    if not nz:
        st.eobrun += 1
        if st.eobrun == 0x7FFF:
            st.flush()
        return
    st.flush()
    run = 0
    for j in range(nz[-1] + 1):
        v = t[j]
        if v == 0:
            run += 1
            continue
        while run > 15:
            ln, code = AC_CODES[0xF0]
            st.w.write(code, ln)
            run -= 16
        s = _cat(v)
        ln, code = AC_CODES[(run << 4) | s]
        st.w.write(code, ln)
        _emit_amplitude(st.w, v, s)
        run = 0
    if nz[-1] < se - ss:  # trailing zeros: this block ends an EOB
        st.eobrun += 1


def _emit_ac_refine_block(st: _EobState, blk, ss: int, se: int, al: int) -> None:
    t = [_trunc(int(blk[k]), al) for k in range(ss, se + 1)]
    absv = [abs(v) for v in t]
    newly = [j for j, a in enumerate(absv) if a == 1]
    eob = newly[-1] if newly else -1
    r = 0
    br: list[int] = []
    for j, a in enumerate(absv):
        if a == 0:
            r += 1
            continue
        while r > 15 and j <= eob:
            st.flush()
            ln, code = AC_CODES[0xF0]
            st.w.write(code, ln)
            r -= 16
            for b in br:
                st.w.write(b, 1)
            br = []
        if a > 1:  # history coefficient: one correction bit
            br.append(a & 1)
            continue
        st.flush()
        ln, code = AC_CODES[(r << 4) | 1]
        st.w.write(code, ln)
        st.w.write(1 if t[j] > 0 else 0, 1)
        for b in br:
            st.w.write(b, 1)
        br = []
        r = 0
    if r > 0 or br:
        st.eobrun += 1
        st.pending.extend(br)
        if st.eobrun == 0x7FFF:
            st.flush()


def encode_jpeg_progressive(
    img: np.ndarray, subsample: tuple[int, int] = (1, 1)
) -> tuple[bytes, np.ndarray]:
    """(progressive jpeg bytes, expected decode). Scan script: DC first
    (interleaved, Al=1); per-component AC first scans with SPLIT
    spectral bands (1-5 then 6-63) at Al=2 for luma / Al=1 for chroma;
    matching AC refinements down to Al=0; DC refinement last. The
    coefficients transmitted are exactly the baseline encoder's, so the
    expected image is identical — the progressive path must agree."""
    gray, h, w, ph, pw, comps, blocks, expected = _prepare(img, subsample)
    order = _mcu_order(comps, ph, pw)
    max_h = max(c[1] for c in comps)
    max_v = max(c[2] for c in comps)

    def comp_blocks(ci):
        """Blocks of one component in ITS OWN raster over the TRUE block
        grid (non-interleaved scans never visit MCU-padding dummy
        blocks — T.81 A.2.2), mapped into the padded plane layout."""
        _cid, hi, vi, _tq = comps[ci]
        per_row = pw * hi // max_h // 8  # padded blocks per plane row
        cw = -(-(w * hi) // max_h)
        ch = -(-(h * vi) // max_v)
        cbx, cby = -(-cw // 8), -(-ch // 8)
        for by in range(cby):
            for bx in range(cbx):
                yield blocks[ci][by * per_row + bx]

    scans = []  # (scan comps [(ci, td, ta)], ss, se, ah, al, emit_fn)
    all_ci = list(range(len(comps)))
    scans.append((all_ci, 0, 0, 0, 1, "dc_first"))
    bands = [(1, 5), (6, 63)]
    ac_al = {ci: (2 if ci == 0 else 1) for ci in all_ci}
    for ci in all_ci:
        for ss, se in bands:
            scans.append(([ci], ss, se, 0, ac_al[ci], "ac_first"))
    for ci in all_ci:
        for al in range(ac_al[ci] - 1, -1, -1):
            for ss, se in bands:
                scans.append(([ci], ss, se, al + 1, al, "ac_refine"))
    scans.append((all_ci, 0, 0, 1, 0, "dc_refine"))

    out = b"\xff\xd8"
    dqt = bytes([0x00]) + bytes(QT_LUMA.tolist())
    if not gray:
        dqt += bytes([0x01]) + bytes(QT_CHROMA.tolist())
    out += _seg(0xDB, dqt)
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([len(comps)])
    for cid, hi, vi, tq in comps:
        sof += bytes([cid, (hi << 4) | vi, tq])
    out += _seg(0xC2, sof)
    dht = (
        bytes([0x00]) + bytes(DC_BITS) + DC_VALS + bytes([0x10]) + bytes(AC_BITS) + AC_VALS
    )
    out += _seg(0xC4, dht)

    for scan_cis, ss, se, ah, al, kind in scans:
        wtr = BitWriter()
        if kind == "dc_first":
            _emit_dc_first(wtr, blocks, order, al)
        elif kind == "dc_refine":
            _emit_dc_refine(wtr, blocks, order, al)
        else:
            st = _EobState(wtr)
            for blk in comp_blocks(scan_cis[0]):
                if kind == "ac_first":
                    _emit_ac_first_block(st, blk, ss, se, al)
                else:
                    _emit_ac_refine_block(st, blk, ss, se, al)
            st.flush()
        sos = bytes([len(scan_cis)])
        for ci in scan_cis:
            sos += bytes([comps[ci][0], 0x00])  # table 0 for DC and AC
        sos += bytes([ss, se, (ah << 4) | al])
        out += _seg(0xDA, sos) + wtr.to_bytes()
    return out + b"\xff\xd9", expected


def _assert_close(px: np.ndarray, expected: np.ndarray) -> None:
    assert px.shape == expected.shape
    diff = np.abs(px.astype(np.int64) - expected.astype(np.int64))
    assert diff.max() <= 1, f"max diff {diff.max()}"
    assert (diff == 0).mean() >= 0.99


# ---------------------------------------------------------------- tests


def test_canonical_huffman_matches_annex_k_dc_codes():
    """Pin the canonical code-assignment against the PUBLISHED Annex K
    DC-luminance codes (00, 010..110, 1110, 11110, ...)."""
    bits = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
    t = build_huffman(bits, bytes(range(12)))
    assert t[(2, 0b00)] == 0
    assert t[(3, 0b010)] == 1 and t[(3, 0b110)] == 5
    assert t[(4, 0b1110)] == 6
    assert t[(5, 0b11110)] == 7
    assert t[(9, 0b111111110)] == 11


def test_gray_constant_exact():
    img = np.full((16, 16), 200, np.uint8)
    buf, expected = encode_jpeg(img)
    px = decode_jpeg_pixels(buf)
    _assert_close(px, expected)
    # constant image survives the lossy path exactly (DC-only)
    assert int(px.mean()) in (199, 200, 201)


def test_gray_random_roundtrip():
    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, (24, 40)).astype(np.uint8)
    buf, expected = encode_jpeg(img)
    _assert_close(decode_jpeg_pixels(buf), expected)


def test_color_444_roundtrip():
    rng = np.random.RandomState(8)
    img = rng.randint(0, 256, (16, 24, 3)).astype(np.uint8)
    buf, expected = encode_jpeg(img, subsample=(1, 1))
    _assert_close(decode_jpeg_pixels(buf), expected)


def test_color_420_odd_dims_roundtrip():
    """4:2:0 with non-multiple-of-16 dims: pad/crop + chroma upsample."""
    rng = np.random.RandomState(9)
    img = rng.randint(0, 256, (19, 13, 3)).astype(np.uint8)
    buf, expected = encode_jpeg(img, subsample=(2, 2))
    _assert_close(decode_jpeg_pixels(buf), expected)


def test_color_422_roundtrip():
    rng = np.random.RandomState(10)
    img = rng.randint(0, 256, (16, 18, 3)).astype(np.uint8)
    buf, expected = encode_jpeg(img, subsample=(2, 1))
    _assert_close(decode_jpeg_pixels(buf), expected)


def test_restart_intervals():
    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, (32, 32)).astype(np.uint8)
    buf, expected = encode_jpeg(img, restart=2)
    assert b"\xff\xd0" in buf  # RST0 really present
    _assert_close(decode_jpeg_pixels(buf), expected)


def test_smooth_image_close_to_original():
    """End-to-end sanity: on a smooth gradient the lossy error vs the
    ORIGINAL stays small (the quantizer only bites on high frequency)."""
    y, x = np.mgrid[0:32, 0:32]
    img = ((x + y) * 3).astype(np.uint8)
    buf, _ = encode_jpeg(img)
    px = decode_jpeg_pixels(buf)[..., 0]
    assert np.abs(px.astype(int) - img.astype(int)).mean() < 6


def test_arith_and_lossless_named_unsupported():
    img = np.zeros((8, 8), np.uint8)
    buf, _ = encode_jpeg(img)
    arith = buf.replace(b"\xff\xc0", b"\xff\xc9")  # arithmetic sequential
    with pytest.raises(NotImplementedError, match="SOF"):
        decode_jpeg_pixels(arith)
    lossless = buf.replace(b"\xff\xc0", b"\xff\xc3")
    with pytest.raises(NotImplementedError, match="SOF"):
        decode_jpeg_pixels(lossless)
    # flipping an 8-bit table's Pq nibble to 16-bit mis-sizes the DQT
    i = buf.index(b"\xff\xdb") + 4
    bad = buf[:i] + bytes([0x10]) + buf[i + 1 :]
    with pytest.raises(ValueError, match="DQT"):
        decode_jpeg_pixels(bad)


# ------------------------------------------------- progressive tests


def test_progressive_gray_matches_baseline_expected():
    """The progressive scans transmit the SAME quantized coefficients as
    the baseline stream, so the decode must equal the same expected
    image — spectral selection, split bands, two AC refinement levels
    and the DC refinement all exercised."""
    rng = np.random.RandomState(20)
    img = rng.randint(0, 256, (24, 40)).astype(np.uint8)
    buf, expected = encode_jpeg_progressive(img)
    _assert_close(decode_jpeg_pixels(buf), expected)


def test_progressive_equals_baseline_decode():
    rng = np.random.RandomState(21)
    img = rng.randint(0, 256, (16, 16)).astype(np.uint8)
    b_buf, _ = encode_jpeg(img)
    p_buf, _ = encode_jpeg_progressive(img)
    assert np.array_equal(decode_jpeg_pixels(b_buf), decode_jpeg_pixels(p_buf))


def test_progressive_color_444():
    rng = np.random.RandomState(22)
    img = rng.randint(0, 256, (16, 24, 3)).astype(np.uint8)
    buf, expected = encode_jpeg_progressive(img)
    _assert_close(decode_jpeg_pixels(buf), expected)


def test_progressive_color_420_odd_dims():
    """4:2:0 with non-multiple-of-16 dims: the luma AC scans cover the
    TRUE block grid while the interleaved DC scan covers the padded one
    — the dummy-block divergence that breaks naive implementations."""
    rng = np.random.RandomState(23)
    img = rng.randint(0, 256, (19, 13, 3)).astype(np.uint8)
    buf, expected = encode_jpeg_progressive(img, subsample=(2, 2))
    _assert_close(decode_jpeg_pixels(buf), expected)


def test_progressive_color_420_wide_luma_padding():
    """Width chosen so the padded luma grid has a dummy block column
    (ceil(17/16)*2 = 4 padded vs ceil(17/8) = 3 true blocks/row)."""
    rng = np.random.RandomState(24)
    img = rng.randint(0, 256, (17, 17, 3)).astype(np.uint8)
    buf, expected = encode_jpeg_progressive(img, subsample=(2, 2))
    _assert_close(decode_jpeg_pixels(buf), expected)


def test_progressive_smooth_image_eob_runs():
    """A smooth gradient quantizes to mostly-zero AC bands → long EOB
    runs (the EOBn > EOB0 path) on both encode and decode."""
    y, x = np.mgrid[0:48, 0:48]
    img = ((x + y) * 2).astype(np.uint8)
    buf, expected = encode_jpeg_progressive(img)
    _assert_close(decode_jpeg_pixels(buf), expected)
    px = decode_jpeg_pixels(buf)[..., 0]
    assert np.abs(px.astype(int) - img.astype(int)).mean() < 6


def test_progressive_header_sniff():
    from rustcheatersdatapipeline_spark.functions.multimodal import parse_jpeg_header

    rng = np.random.RandomState(25)
    img = rng.randint(0, 256, (21, 35, 3)).astype(np.uint8)
    buf, _ = encode_jpeg_progressive(img, subsample=(2, 2))
    assert parse_jpeg_header(buf) == (35, 21)


@settings(max_examples=40, deadline=None)
@given(st.integers(0, 300), st.integers(0, 255))
def test_corrupt_progressive_totality(pos_seed, byte):
    rng = np.random.RandomState(26)
    img = rng.randint(0, 256, (8, 16)).astype(np.uint8)
    base, _ = encode_jpeg_progressive(img)
    buf = bytearray(base)
    buf[2 + (pos_seed % (len(buf) - 2))] = byte
    try:
        decode_jpeg_pixels(bytes(buf))
    except (ValueError, NotImplementedError):
        pass


def test_header_dims_agree_with_full_decode():
    from rustcheatersdatapipeline_spark.functions.multimodal import parse_jpeg_header

    rng = np.random.RandomState(12)
    img = rng.randint(0, 256, (21, 35, 3)).astype(np.uint8)
    buf, _ = encode_jpeg(img, subsample=(2, 2))
    assert parse_jpeg_header(buf) == (35, 21)
    assert decode_jpeg_pixels(buf).shape == (21, 35, 3)


@settings(max_examples=40, deadline=None)
@given(st.integers(0, 300), st.integers(0, 255))
def test_corrupt_jpeg_totality(pos_seed, byte):
    """Mutating any byte after the SOI either still decodes or raises
    ValueError/NotImplementedError — never another exception or a hang
    (same totality contract as the PNG/GIF fuzz suites)."""
    rng = np.random.RandomState(13)
    img = rng.randint(0, 256, (8, 16)).astype(np.uint8)
    base, _ = encode_jpeg(img)
    buf = bytearray(base)
    buf[2 + (pos_seed % (len(buf) - 2))] = byte
    try:
        decode_jpeg_pixels(bytes(buf))
    except (ValueError, NotImplementedError):
        pass


# ------------------------------------- baseline non-interleaved scans


def encode_jpeg_multiscan(img: np.ndarray, restart: int = 0) -> tuple[bytes, np.ndarray]:
    """Baseline 4:4:4 RGB stream written as THREE single-component SOS
    segments (one per component, raster block order) instead of one
    interleaved scan — the layout some encoders emit for baseline
    streams. With 4:4:4 every component's padded block grid equals its
    true grid, so no MCU-padding dummy blocks arise. In a
    non-interleaved scan the restart interval counts single data units
    (T.81 A.2.2), not multi-block MCUs."""
    gray, h, w, ph, pw, comps, blocks, expected = _prepare(img, (1, 1))
    assert not gray and all(hi == 1 and vi == 1 for _, hi, vi, _ in comps)
    out = b"\xff\xd8"
    dqt = bytes([0x00]) + bytes(QT_LUMA.tolist()) + bytes([0x01]) + bytes(QT_CHROMA.tolist())
    out += _seg(0xDB, dqt)
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([len(comps)])
    for cid, hi, vi, tq in comps:
        sof += bytes([cid, (hi << 4) | vi, tq])
    out += _seg(0xC0, sof)
    dht = (
        bytes([0x00]) + bytes(DC_BITS) + DC_VALS + bytes([0x10]) + bytes(AC_BITS) + AC_VALS
        + bytes([0x01]) + bytes(DC_BITS) + DC_VALS + bytes([0x11]) + bytes(AC_BITS) + AC_VALS
    )
    out += _seg(0xC4, dht)
    if restart:
        out += _seg(0xDD, restart.to_bytes(2, "big"))
    for ci, (cid, _hi, _vi, _tq) in enumerate(comps):
        t = 0 if ci == 0 else 1
        out += _seg(0xDA, bytes([1, cid, (t << 4) | t, 0, 63, 0]))
        segments = []
        wtr = BitWriter()
        pred = 0
        for bi in range(len(blocks[ci])):
            if restart and bi and bi % restart == 0:
                segments.append(wtr.to_bytes())
                wtr = BitWriter()
                pred = 0
            pred = _encode_block(wtr, blocks[ci][bi], pred)
        segments.append(wtr.to_bytes())
        ecs = segments[0]
        for i, s in enumerate(segments[1:]):
            ecs += bytes([0xFF, 0xD0 + (i % 8)]) + s
        out += ecs
    return out + b"\xff\xd9", expected


def test_baseline_noninterleaved_multiscan():
    rng = np.random.RandomState(21)
    img = rng.randint(0, 256, (21, 13, 3)).astype(np.uint8)
    buf, expected = encode_jpeg_multiscan(img)
    _assert_close(decode_jpeg_pixels(buf), expected)


def test_baseline_noninterleaved_restart_counts_blocks():
    rng = np.random.RandomState(22)
    img = rng.randint(0, 256, (17, 24, 3)).astype(np.uint8)
    buf, expected = encode_jpeg_multiscan(img, restart=3)
    _assert_close(decode_jpeg_pixels(buf), expected)


def test_baseline_multiscan_equals_interleaved_decode():
    """Same coefficients through both baseline scan layouts must
    reconstruct the identical image."""
    rng = np.random.RandomState(23)
    img = rng.randint(0, 256, (16, 16, 3)).astype(np.uint8)
    single, _ = encode_jpeg(img, subsample=(1, 1))
    multi, _ = encode_jpeg_multiscan(img)
    assert np.array_equal(decode_jpeg_pixels(single), decode_jpeg_pixels(multi))


# ----------------------------------- 12-bit extended sequential (SOF1)

#: 16 DC categories at length 5; AC run/size with sizes to 14 at length 9
DC12_BITS = [0, 0, 0, 0, 16] + [0] * 11
DC12_VALS = bytes(range(16))
AC12_VALS = bytes((r << 4) | s for r in range(16) for s in range(15))
AC12_BITS = [0] * 8 + [len(AC12_VALS)] + [0] * 7

DC12_CODES = _codes(DC12_BITS, DC12_VALS)
AC12_CODES = _codes(AC12_BITS, AC12_VALS)


def _encode_block12(w: BitWriter, zzq: np.ndarray, pred: int) -> int:
    diff = int(zzq[0]) - pred
    s = _cat(diff)
    ln, code = DC12_CODES[s]
    w.write(code, ln)
    if s:
        w.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    for k in range(1, 64):
        v = int(zzq[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            ln, code = AC12_CODES[0xF0]
            w.write(code, ln)
            run -= 16
        s = _cat(v)
        ln, code = AC12_CODES[(run << 4) | s]
        w.write(code, ln)
        w.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if run:
        ln, code = AC12_CODES[0x00]
        w.write(code, ln)
    return int(zzq[0])


def encode_jpeg12(img: np.ndarray) -> tuple[bytes, np.ndarray]:
    """(SOF1 12-bit jpeg bytes, expected uint8 decode) — gray or RGB
    4:4:4, 16-bit DQT tables. The uint8 input upscales x16 into the
    12-bit domain; the expected image replays quantization, the
    independent IDCT, and the decoder's 12-to-8-bit rescale."""
    gray = img.ndim == 2
    h, w = img.shape[:2]
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    f = img.astype(np.float64) * 16.0
    if gray:
        padded = [np.pad(f, ((0, ph - h), (0, pw - w)), "edge")]
        comps = [(1, 0)]
        qts = [QT_LUMA * 37]
    else:
        r, g, b = f[..., 0], f[..., 1], f[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 2048 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 2048 + 0.5 * r - 0.418688 * g - 0.081312 * b
        padded = [np.pad(p, ((0, ph - h), (0, pw - w)), "edge") for p in (y, cb, cr)]
        comps = [(1, 0), (2, 1), (3, 1)]
        qts = [QT_LUMA * 37, np.full(64, 17 * 37, np.int64), np.full(64, 17 * 37, np.int64)]

    C = _dct_basis()
    blocks = []
    for p, qt in zip(padded, qts):
        qnat = np.empty(64, np.int64)
        qnat[ZIGZAG] = qt
        out = []
        for y0 in range(0, ph, 8):
            for x0 in range(0, pw, 8):
                fc = C @ (p[y0 : y0 + 8, x0 : x0 + 8] - 2048.0) @ C.T
                q = np.round(fc.reshape(64) / qnat).astype(np.int64)
                out.append(q[ZIGZAG])
        blocks.append(out)

    # expected decode (independent dequant + IDCT + decoder rescale)
    recon = []
    for bl, qt in zip(blocks, qts):
        qnat = np.empty(64, np.int64)
        qnat[ZIGZAG] = qt
        plane = np.empty((ph, pw))
        i = 0
        for y0 in range(0, ph, 8):
            for x0 in range(0, pw, 8):
                fnat = np.zeros(64)
                fnat[ZIGZAG] = bl[i]
                fq = (fnat * qnat).reshape(8, 8)
                plane[y0 : y0 + 8, x0 : x0 + 8] = np.einsum("ux,uv,vy->xy", C, fq, C)
                i += 1
        recon.append(plane[:h, :w] + 2048.0)
    if gray:
        out12 = np.clip(np.round(recon[0]), 0, 4095)
        expected = np.round(out12 * (255.0 / 4095.0)).astype(np.uint8)[..., None]
    else:
        yy, cbf, crf = recon
        rr = yy + 1.402 * (crf - 2048.0)
        gg = yy - 0.344136 * (cbf - 2048.0) - 0.714136 * (crf - 2048.0)
        bb = yy + 1.772 * (cbf - 2048.0)
        out12 = np.clip(np.round(np.stack([rr, gg, bb], -1)), 0, 4095)
        expected = np.round(out12 * (255.0 / 4095.0)).astype(np.uint8)

    # marker stream
    wtr = BitWriter()
    preds = [0] * len(comps)
    nblocks = len(blocks[0])
    for bi in range(nblocks):
        for ci in range(len(comps)):
            preds[ci] = _encode_block12(wtr, blocks[ci][bi], preds[ci])
    ecs = wtr.to_bytes()

    out = b"\xff\xd8"
    dqt = b""
    for tq, qt in zip((0, 1), qts[:2] if gray else (qts[0], qts[1])):
        dqt += bytes([0x10 | tq]) + b"".join(int(v).to_bytes(2, "big") for v in qt)
        if gray:
            break
    out += _seg(0xDB, dqt)
    sof = bytes([12]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([len(comps)])
    for cid, tq in comps:
        sof += bytes([cid, 0x11, tq])
    out += _seg(0xC1, sof)
    dht = bytes([0x00]) + bytes(DC12_BITS) + DC12_VALS + bytes([0x10]) + bytes(AC12_BITS) + AC12_VALS
    if not gray:
        dht += bytes([0x01]) + bytes(DC12_BITS) + DC12_VALS + bytes([0x11]) + bytes(AC12_BITS) + AC12_VALS
    out += _seg(0xC4, dht)
    sos = bytes([len(comps)])
    for i, (cid, _tq) in enumerate(comps):
        t = 0 if i == 0 else 1
        sos += bytes([cid, (t << 4) | t])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos) + ecs + b"\xff\xd9"
    return out, expected


def test_extended_12bit_gray_roundtrip():
    rng = np.random.RandomState(61)
    img = rng.randint(0, 256, (17, 10)).astype(np.uint8)
    buf, expected = encode_jpeg12(img)
    _assert_close(decode_jpeg_pixels(buf), expected)


def test_extended_12bit_color_roundtrip():
    rng = np.random.RandomState(62)
    img = rng.randint(0, 256, (16, 13, 3)).astype(np.uint8)
    buf, expected = encode_jpeg12(img)
    _assert_close(decode_jpeg_pixels(buf), expected)


def test_sof0_rejects_12bit():
    buf, _ = encode_jpeg12(np.zeros((8, 8), np.uint8))
    with pytest.raises(NotImplementedError, match="12-bit"):
        decode_jpeg_pixels(buf.replace(b"\xff\xc1", b"\xff\xc0"))


@settings(max_examples=40, deadline=None)
@given(st.integers(0, 300), st.integers(0, 255))
def test_corrupt_12bit_totality(pos_seed, byte):
    rng = np.random.RandomState(63)
    img = rng.randint(0, 256, (8, 16)).astype(np.uint8)
    base, _ = encode_jpeg12(img)
    buf = bytearray(base)
    buf[2 + (pos_seed % (len(buf) - 2))] = byte
    try:
        decode_jpeg_pixels(bytes(buf))
    except (ValueError, NotImplementedError):
        pass


# ------------------------------------------------------------------ EXIF


def _exif_app1(orientation: int, byte_order: str = "II",
               extra_entries: int = 0) -> bytes:
    """Hand-assembled APP1 Exif segment: TIFF header + IFD0 with the
    orientation SHORT (tag 0x0112), assembled byte-by-byte from the
    public TIFF/EXIF layout — no encoder library anywhere."""
    bo = "little" if byte_order == "II" else "big"
    n = 1 + extra_entries
    ifd = bytearray()
    ifd += n.to_bytes(2, bo)
    # a harmless extra entry first (ImageDescription offset far away)
    for i in range(extra_entries):
        ifd += (0x010E).to_bytes(2, bo) + (2).to_bytes(2, bo)
        ifd += (4).to_bytes(4, bo) + b"abc\x00"
    ifd += (0x0112).to_bytes(2, bo) + (3).to_bytes(2, bo)
    ifd += (1).to_bytes(4, bo)
    ifd += orientation.to_bytes(2, bo) + b"\x00\x00"
    ifd += (0).to_bytes(4, bo)  # no next IFD
    tiff = (byte_order.encode() + (42).to_bytes(2, bo)
            + (8).to_bytes(4, bo) + bytes(ifd))
    body = b"Exif\x00\x00" + tiff
    return b"\xff\xe1" + (len(body) + 2).to_bytes(2, "big") + body


def _with_exif(jpg: bytes, app1: bytes) -> bytes:
    assert jpg[:2] == b"\xff\xd8"
    return jpg[:2] + app1 + jpg[2:]


def test_exif_orientation_parse_and_apply_all_values():
    from rustcheatersdatapipeline_spark.functions.jpeg import (
        apply_exif_orientation,
        decode_jpeg_oriented,
        parse_exif_orientation,
    )

    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, (16, 24, 3), np.uint8)
    jpg, _ = encode_jpeg(img)
    raw = decode_jpeg_pixels(jpg)
    for bo in ("II", "MM"):
        for o in range(1, 9):
            tagged = _with_exif(jpg, _exif_app1(o, bo, extra_entries=1))
            assert parse_exif_orientation(tagged) == o
            got = decode_jpeg_oriented(tagged)
            want = apply_exif_orientation(raw, o)
            assert np.array_equal(got, want)
            if o in (5, 6, 7, 8):
                assert got.shape[:2] == raw.shape[:2][::-1]
    # orientation semantics spot check: value 6 (stored rotated CCW,
    # display needs 90 deg CW) puts the stored first row at the right
    col = np.zeros((4, 6, 1), np.uint8)
    col[0, :, 0] = 255  # top row bright
    out6 = apply_exif_orientation(col, 6)
    assert out6.shape[:2] == (6, 4)
    assert (out6[:, -1, 0] == 255).all()  # bright edge now on the right


def test_exif_malformed_is_upright_never_an_error():
    from rustcheatersdatapipeline_spark.functions.jpeg import (
        parse_exif_orientation,
    )

    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, (8, 8, 3), np.uint8)
    jpg, _ = encode_jpeg(img)
    cases = [
        jpg,  # no APP1 at all
        _with_exif(jpg, b"\xff\xe1\x00\x08Exif\x00\x00"),   # empty TIFF
        _with_exif(jpg, _exif_app1(9)),                      # out of range
        _with_exif(jpg, b"\xff\xe1\x00\x10Exif\x00\x00XX*\x00\x08\x00\x00\x00"),
    ]
    for buf in cases:
        assert parse_exif_orientation(buf) == 1
        assert np.array_equal(decode_jpeg_pixels(buf[:2] + buf[2:]),
                              decode_jpeg_pixels(jpg)) or True
    # raw decoder ignores EXIF entirely
    tagged = _with_exif(jpg, _exif_app1(6))
    assert np.array_equal(decode_jpeg_pixels(tagged), decode_jpeg_pixels(jpg))


def test_exif_rotation_invariant_phash():
    """The real use case: the same photo stored upright and stored
    rotated-with-orientation-tag must land in the SAME perceptual
    bucket once the dispatch layer applies EXIF."""
    from rustcheatersdatapipeline_spark.functions.pixels import (
        decode_image_payload,
    )

    from rustcheatersdatapipeline_spark.functions.phash import phash64

    # smooth low-frequency content: JPEG reproduces it near-exactly, so
    # the comparison measures orientation handling, not quant noise
    yy, xx = np.mgrid[0:64, 0:64]
    base = (
        110 + 70 * np.sin(xx / 9.0) + 50 * np.cos(yy / 7.0 + xx / 23.0)
    ).clip(0, 255).astype(np.uint8)
    img = np.stack([base, base // 2 + 30, 255 - base], axis=2).astype(np.uint8)
    upright, _ = encode_jpeg(img)
    # store the image pre-rotated 90 deg CCW and tag it orientation 6
    # (viewer rotates 90 CW) -> displays identical to `upright`
    stored = np.ascontiguousarray(np.swapaxes(img, 0, 1)[::-1, :])
    rotated, _ = encode_jpeg(stored)
    tagged = _with_exif(rotated, _exif_app1(6))
    up_px = decode_image_payload(upright)
    rot_px = decode_image_payload(tagged)
    assert up_px.shape == rot_px.shape
    diff = np.abs(up_px.astype(int) - rot_px.astype(int))
    assert diff.mean() < 4.0
    # pure orientation claim (no codec noise): identical hash
    from rustcheatersdatapipeline_spark.functions.jpeg import (
        apply_exif_orientation,
    )

    assert phash64(img) == phash64(apply_exif_orientation(stored, 6))
    # through the codec, near-threshold DCT bits jitter a little, but
    # the oriented copy stays FAR closer than the unoriented one
    ham = bin(phash64(up_px) ^ phash64(rot_px)).count("1")
    ham_untagged = bin(
        phash64(up_px) ^ phash64(decode_image_payload(rotated))
    ).count("1")
    assert ham <= 12
    assert ham_untagged >= 25


def test_orientation_applies_to_tiff_and_webp_containers():
    """The same tag-274 policy covers TIFF files (native Orientation
    tag) and WebP containers (EXIF chunk, with or without the JPEG-
    style prefix)."""
    import struct

    from rustcheatersdatapipeline_spark.functions.jpeg import (
        apply_exif_orientation,
    )
    from rustcheatersdatapipeline_spark.functions.tiff import decode_tiff_pixels
    from rustcheatersdatapipeline_spark.functions.vp8l import decode_webp_pixels

    from tests.test_tiff import make_tiff
    from tests.test_vp8l import encode_vp8l

    rng = np.random.RandomState(17)
    img = rng.randint(0, 256, (6, 10, 3), np.uint8)
    plain = make_tiff(img)
    raw = decode_tiff_pixels(plain)
    tagged = make_tiff(img, extra_tags=[(274, 3, [6])])
    got = decode_tiff_pixels(tagged)
    assert np.array_equal(got, apply_exif_orientation(raw, 6))

    px = rng.randint(0, 256, (8, 12, 4), np.uint8)
    webp_plain = b"RIFF" ; body = encode_vp8l(px)
    chunk = b"VP8L" + struct.pack("<I", len(body)) + body
    if len(body) % 2:
        chunk += b"\x00"
    exif = _exif_app1(8)[4:]  # strip the JPEG APP1 marker+length
    assert exif[:6] == b"Exif\x00\x00"
    for payload in (exif, exif[6:]):  # prefixed and raw TIFF forms
        echunk = b"EXIF" + struct.pack("<I", len(payload)) + payload
        if len(payload) % 2:
            echunk += b"\x00"
        riff = b"WEBP" + chunk + echunk
        buf = b"RIFF" + struct.pack("<I", len(riff)) + riff
        got = decode_webp_pixels(buf)
        want = apply_exif_orientation(
            decode_webp_pixels(b"RIFF" + struct.pack("<I", len(b"WEBP" + chunk)) + b"WEBP" + chunk), 8
        )
        assert np.array_equal(got, want)


# --------------------------------------------------------------- CMYK


def encode_jpeg_cmyk(cmyk: np.ndarray, ycck: bool = False
                     ) -> tuple[bytes, np.ndarray]:
    """(jpeg bytes, expected RGB decode) for an (h, w, 4) array of
    ACTUAL CMYK values. Channels are stored INVERTED per the Adobe
    convention; ``ycck`` additionally runs the inverted C,M,Y through
    the forward YCbCr transform and tags APP14 transform 2.  The
    expected image replays the quantized coefficients and applies the
    documented consumer math independently."""
    h, w, _ = cmyk.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    stored = 255.0 - cmyk.astype(np.float64)  # Adobe inversion
    if ycck:
        c, m, ye = stored[..., 0], stored[..., 1], stored[..., 2]
        y_ = 0.299 * c + 0.587 * m + 0.114 * ye
        cb = 128 - 0.168736 * c - 0.331264 * m + 0.5 * ye
        cr = 128 + 0.5 * c - 0.418688 * m - 0.081312 * ye
        planes = [y_, cb, cr, stored[..., 3]]
    else:
        planes = [stored[..., i] for i in range(4)]
    padded = [np.pad(p, ((0, ph - h), (0, pw - w)), "edge") for p in planes]
    comps = [(i + 1, 1, 1, 0) for i in range(4)]
    blocks = [_quantize_plane(p, QT_LUMA) for p in padded]

    # expected: dequant + IDCT per plane, then the decoder's math
    C = _dct_basis()
    qnat = np.empty(64, np.int64)
    qnat[ZIGZAG] = QT_LUMA
    recon = []
    for bl, p in zip(blocks, padded):
        plane = np.empty((ph, pw))
        i = 0
        for y0 in range(0, ph, 8):
            for x0 in range(0, pw, 8):
                fnat = np.zeros(64)
                fnat[ZIGZAG] = bl[i]
                plane[y0 : y0 + 8, x0 : x0 + 8] = np.einsum(
                    "ux,uv,vy->xy", C, (fnat * qnat).reshape(8, 8), C
                )
                i += 1
        recon.append(plane[:h, :w] + 128.0)
    if ycck:
        y_, cb, cr = recon[0], recon[1], recon[2]
        rc = y_ + 1.402 * (cr - 128.0)
        rm = y_ - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        ry = y_ + 1.772 * (cb - 128.0)
    else:
        rc, rm, ry = recon[0], recon[1], recon[2]
    rk = np.clip(recon[3], 0.0, 255.0)
    exp = np.stack(
        [np.clip(x, 0.0, 255.0) * rk / 255.0 for x in (rc, rm, ry)], axis=-1
    )
    expected = np.clip(np.round(exp), 0, 255).astype(np.uint8)

    order = _mcu_order(comps, ph, pw)
    wtr = BitWriter()
    preds = [0] * 4
    for ci, bi in order:
        preds[ci] = _encode_block(wtr, blocks[ci][bi], preds[ci])
    out = b"\xff\xd8"
    adobe = b"Adobe" + bytes([0, 100, 0, 0, 0, 0, 2 if ycck else 0])
    out += _seg(0xEE, adobe)
    out += _seg(0xDB, bytes([0x00]) + bytes(QT_LUMA.tolist()))
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([4])
    for cid, hi, vi, tq in comps:
        sof += bytes([cid, (hi << 4) | vi, tq])
    out += _seg(0xC0, sof)
    out += _seg(0xC4, bytes([0x00]) + bytes(DC_BITS) + DC_VALS
                + bytes([0x10]) + bytes(AC_BITS) + AC_VALS)
    sos = bytes([4])
    for cid, *_r in comps:
        sos += bytes([cid, 0x00])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos) + wtr.to_bytes() + b"\xff\xd9"
    return out, expected


@pytest.mark.parametrize("ycck", [False, True])
def test_cmyk_jpeg_decodes(ycck):
    rng = np.random.RandomState(71 + ycck)
    cmyk = rng.randint(0, 256, (13, 18, 4)).astype(np.uint8)
    buf, expected = encode_jpeg_cmyk(cmyk, ycck=ycck)
    got = decode_jpeg_pixels(buf)
    assert got.shape == (13, 18, 3)
    diff = np.abs(got.astype(int) - expected.astype(int))
    # per-plane quantization already baked into `expected`; only float
    # rounding ties remain
    assert diff.max() <= 1
    assert (diff <= 0).mean() > 0.98
