"""JPEG (ITU-T T.81) full-frame decode — pure numpy + stdlib.

Round 5 left JPEG behind a ``NotImplementedError`` ("needs a codec
library"); round 6 removed that boundary for **baseline sequential DCT
(SOF0)** and round 7 for **progressive DCT (SOF2)** — together the two
modes that cover essentially every JPEG on the web, plus **extended
sequential (SOF1)** with 12-bit samples and 16-bit quantizer tables
(the medical/scientific shape; 12-bit output rescales onto the uint8
pixel contract). Supported: 8/12-bit samples, grayscale or
3-component YCbCr with the common sampling
layouts (4:4:4, 4:2:2, 4:2:0 — any integer factors dividing the max),
restart intervals, multi-table DQT/DHT segments, baseline streams with
one non-interleaved scan per component; progressive spectral selection
+ successive approximation (DC first/refine, AC first/refine with EOB
runs, interleaved DC and single-component AC scans per G.2). Both
modes accumulate into one per-component coefficient tensor so the
dequantize → de-zigzag → IDCT → upsample → YCbCr tail runs once,
vectorized over all blocks, instead of per 8x8 block.
Out of scope — each raises ``NotImplementedError`` with the exact
variant named (quarantined upstream, never a task failure):
hierarchical/lossless modes and arithmetic coding.

Decode path per ECS segment: Huffman-decode (canonical tables from the
DHT BITS/HUFFVAL lists) → DC-predict + amplitude-extend → de-zigzag →
dequantize → 8×8 IDCT as two matrix products with the orthonormal
DCT-II basis (numpy, vectorizable) → level shift → per-component plane
assembly → chroma upsample (integer repeat) → YCbCr→RGB (the JFIF
fixed-point-free float transform).

Spark integration: this is a payload decoder behind
``pixels.decode_media`` / ``featurize_pixels`` — an Arrow-boundary
step over ``mapInPandas`` batches, same contract as PNG/GIF/WAV. At
100 TB the decoded tensors are transient per-batch state feeding
bounded feature rows; nothing here re-materializes pixels.

The Huffman bit loop is plain Python: payload decode is already the
declared Python boundary of the multimodal path, and per-image cost is
bounded by the same decode-size guard as GIF.
"""

from __future__ import annotations

import numpy as np

#: zigzag scan order (T.81 figure 5): index = scan position, value =
#: position in the 8x8 block (row-major)
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

#: decoded-output ceiling (same contract as the PNG/GIF bomb guards)
_JPEG_MAX_DECODE_BYTES = 1 << 28


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8x8 DCT-II basis: C[u, x] = a(u) cos((2x+1)uπ/16)."""
    x = np.arange(8)
    u = x.reshape(8, 1)
    c = np.cos((2 * x + 1) * u * np.pi / 16) * 0.5
    c[0] *= 1 / np.sqrt(2)
    return c


_C = _dct_matrix()


class HuffTable(dict):
    """{(code_length, code): symbol} plus a lazily-built 256-entry
    lookahead LUT for codes of <= 8 bits (the overwhelming majority in
    real streams) — one list index replaces up to 8 per-bit dict walks
    in the decode hot loop. Plain-dict semantics otherwise, so every
    existing call site and test is unchanged."""

    __slots__ = ("_lut",)

    @property
    def lut(self) -> list:
        try:
            return self._lut
        except AttributeError:
            lut: list = [None] * 256
            for (length, code), sym in self.items():
                if length <= 8:
                    base = code << (8 - length)
                    for suffix in range(1 << (8 - length)):
                        lut[base | suffix] = (sym, length)
            self._lut = lut
            return lut


def build_huffman(bits: list[int], vals: bytes) -> HuffTable:
    """{(code_length, code): symbol} from the DHT BITS/HUFFVAL lists —
    canonical code assignment per T.81 annex C."""
    table = HuffTable()
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


class _BitReader:
    """MSB-first bit reader over an (already unstuffed) ECS segment."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0  # bit cursor

    def bit(self) -> int:
        byte = self.pos >> 3
        if byte >= len(self.data):
            raise ValueError("JPEG: truncated entropy-coded segment")
        b = (self.data[byte] >> (7 - (self.pos & 7))) & 1
        self.pos += 1
        return b

    def bits(self, n: int) -> int:
        if n == 0:
            return 0
        end = self.pos + n
        if end > len(self.data) << 3:
            raise ValueError("JPEG: truncated entropy-coded segment")
        byte0 = self.pos >> 3
        byte_end = (end + 7) >> 3
        chunk = int.from_bytes(self.data[byte0:byte_end], "big")
        shift = ((byte_end - byte0) << 3) - (end - (byte0 << 3))
        self.pos = end
        return (chunk >> shift) & ((1 << n) - 1)

    def _peek8(self) -> int:
        byte = self.pos >> 3
        off = self.pos & 7
        d = self.data
        b0 = d[byte] if byte < len(d) else 0
        b1 = d[byte + 1] if byte + 1 < len(d) else 0
        return ((b0 << 8) | b1) >> (8 - off) & 0xFF

    def decode(self, table: dict[tuple[int, int], int]) -> int:
        if isinstance(table, HuffTable):
            entry = table.lut[self._peek8()]
            if entry is not None:
                sym, length = entry
                self.pos += length
                if self.pos > len(self.data) << 3:
                    raise ValueError("JPEG: truncated entropy-coded segment")
                return sym
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("JPEG: invalid Huffman code")


def _extend(v: int, s: int) -> int:
    """Amplitude extension (T.81 F.2.2.1): map the s received bits to
    the signed coefficient value."""
    return v if s == 0 or v >= (1 << (s - 1)) else v - (1 << s) + 1


def _unstuff(ecs: bytes) -> bytes:
    return ecs.replace(b"\xff\x00", b"\xff")


def _split_scan(buf: bytes, pos: int) -> tuple[list[bytes], int]:
    """ECS bytes from ``pos`` split at restart markers; returns the
    unstuffed segments and the offset of the terminating marker."""
    segments: list[bytes] = []
    start = pos
    i = pos
    n = len(buf)
    while i < n - 1:
        if buf[i] == 0xFF and buf[i + 1] != 0x00:
            m = buf[i + 1]
            if 0xD0 <= m <= 0xD7:  # restart marker — segment boundary
                segments.append(_unstuff(buf[start:i]))
                i += 2
                start = i
                continue
            segments.append(_unstuff(buf[start:i]))
            return segments, i
        i += 1
    segments.append(_unstuff(buf[start:]))
    return segments, n


class _ProgState:
    """Coefficient accumulator for progressive (SOF2) decoding.

    Each SOS contributes one piece of the picture (T.81 G.2): a DC scan
    (interleaved over all scan components in MCU order, or a single
    component over its own block grid) or a single-component AC scan
    over one spectral band; successive approximation splits each into a
    first pass (Ah=0, values at precision ``<< Al``) and refinement
    passes (Ah>0, one magnitude bit per coefficient, EOB runs batching
    all-zero bands). Coefficients live in zigzag order per block until
    ``finish`` dequantizes and runs the shared IDCT/assembly tail."""

    def __init__(self, frame, prec: int = 8) -> None:
        h, w, comps = frame
        if h == 0 or w == 0:
            raise ValueError("JPEG: zero frame dimension")
        if h * w * 3 > _JPEG_MAX_DECODE_BYTES:
            raise ValueError("JPEG: frame exceeds decode bound")
        self.h, self.w, self.comps = h, w, comps
        self.prec = prec
        self.adobe: int | None = None  # Adobe APP14 transform flag
        self.dc_max = 11 if prec == 8 else 15  # T.81 F.1.2.1.1 / extended
        self.max_h = max(hi for _, hi, _, _ in comps)
        self.max_v = max(vi for _, _, vi, _ in comps)
        for _, hi, vi, _ in comps:
            if hi < 1 or vi < 1 or self.max_h % hi or self.max_v % vi:
                raise NotImplementedError("JPEG: non-integer sampling ratio")
        self.mcus_x = -(-w // (8 * self.max_h))
        self.mcus_y = -(-h // (8 * self.max_v))
        self.coef: dict[int, np.ndarray] = {}
        self.cdims: dict[int, tuple[int, int]] = {}  # true block dims
        self.info: dict[int, tuple[int, int, int]] = {}
        for cid, hi, vi, tq in comps:
            by, bx = self.mcus_y * vi, self.mcus_x * hi
            self.coef[cid] = np.zeros((by, bx, 64), np.int32)
            cw = -(-w * hi // self.max_h)
            ch = -(-h * vi // self.max_v)
            self.cdims[cid] = (-(-ch // 8), -(-cw // 8))
            self.info[cid] = (hi, vi, tq)
        self.scans_done = 0

    # -- scan dispatch -----------------------------------------------------

    def decode_scan(self, scan, ss, se, ah, al, huff, restart, segments) -> None:
        if ss == 0:
            if se != 0:
                raise ValueError("JPEG: progressive DC scan with Se != 0")
            self._dc_scan(scan, ah, al, huff, restart, segments)
        else:
            if len(scan) != 1:
                raise ValueError("JPEG: progressive AC scan must be single-component")
            if not ss <= se <= 63:
                raise ValueError("JPEG: bad spectral band")
            self._ac_scan(scan[0], ss, se, ah, al, huff, restart, segments)
        self.scans_done += 1

    def _blocks_in_scan(self, scan):
        """Block visit order: MCU-interleaved for multi-component scans,
        the component's own raster for single-component scans (dummy
        edge blocks only exist in the interleaved form, per spec)."""
        if len(scan) > 1:
            for my in range(self.mcus_y):
                for mx in range(self.mcus_x):
                    for cid, _td, _ta in scan:
                        hi, vi, _ = self.info[cid]
                        for v in range(vi):
                            for hh in range(hi):
                                yield cid, my * vi + v, mx * hi + hh
        else:
            cid = scan[0][0]
            cby, cbx = self.cdims[cid]
            for by in range(cby):
                for bx in range(cbx):
                    yield cid, by, bx

    def _mcu_size(self, scan) -> int:
        """Blocks per restart-counting unit (MCU; 1 for non-interleaved)."""
        if len(scan) > 1:
            return sum(self.info[cid][0] * self.info[cid][1] for cid, *_ in scan)
        return 1

    def baseline_scan(self, scan, huff, restart, segments) -> None:
        """Baseline sequential (SOF0) scan: full-precision DC + AC per
        block, MCU-interleaved or single-component raster. Sharing the
        coefficient tensor with the progressive path means the
        dequantize/IDCT/assembly tail runs once, vectorized over every
        block (``finish``), instead of per 8x8 block — and baseline
        streams with one non-interleaved scan per component decode
        naturally instead of being rejected."""
        tables = {}
        for cid, td, ta in scan:
            if cid not in self.coef:
                raise ValueError("JPEG: scan references unknown component")
            try:
                tables[cid] = (huff[(0, td)], huff[(1, ta)])
            except KeyError:
                raise ValueError("JPEG: missing Huffman table") from None
        seg_iter = iter(segments)
        rd = _BitReader(next(seg_iter))
        preds = {cid: 0 for cid, *_ in scan}
        per_mcu = self._mcu_size(scan)
        for i, (cid, by, bx) in enumerate(self._blocks_in_scan(scan)):
            if restart and i and i % (restart * per_mcu) == 0:
                try:
                    rd = _BitReader(next(seg_iter))
                except StopIteration:
                    raise ValueError("JPEG: missing restart segment") from None
                preds = {c: 0 for c in preds}
            blk = self.coef[cid][by, bx]
            dc_tbl, ac_tbl = tables[cid]
            s = rd.decode(dc_tbl)
            if s > self.dc_max:
                raise ValueError("JPEG: DC category out of range")
            preds[cid] += _extend(rd.bits(s), s)
            blk[0] = preds[cid]
            k = 1
            while k < 64:
                rs = rd.decode(ac_tbl)
                r, size = rs >> 4, rs & 0x0F
                if size == 0:
                    if r == 15:  # ZRL: sixteen zeros
                        k += 16
                        continue
                    break  # EOB
                k += r
                if k > 63:
                    raise ValueError("JPEG: AC run past end of block")
                blk[k] = _extend(rd.bits(size), size)
                k += 1
        self.scans_done += 1

    def _dc_scan(self, scan, ah, al, huff, restart, segments) -> None:
        for cid, *_ in scan:
            if cid not in self.coef:
                raise ValueError("JPEG: scan references unknown component")
        tables = {}
        if ah == 0:
            for cid, td, _ta in scan:
                if (0, td) not in huff:
                    raise ValueError("JPEG: missing DC Huffman table")
                tables[cid] = huff[(0, td)]
        seg_iter = iter(segments)
        rd = _BitReader(next(seg_iter))
        preds = {cid: 0 for cid, *_ in scan}
        per_mcu = self._mcu_size(scan)
        for i, (cid, by, bx) in enumerate(self._blocks_in_scan(scan)):
            if restart and i and i % (restart * per_mcu) == 0:
                try:
                    rd = _BitReader(next(seg_iter))
                except StopIteration:
                    raise ValueError("JPEG: missing restart segment") from None
                preds = {c: 0 for c in preds}
            blk = self.coef[cid][by, bx]
            if ah == 0:
                s = rd.decode(tables[cid])
                if s > self.dc_max:
                    raise ValueError("JPEG: DC category out of range")
                preds[cid] += _extend(rd.bits(s), s)
                blk[0] = preds[cid] << al
            elif rd.bit():
                blk[0] |= 1 << al

    def _ac_scan(self, comp, ss, se, ah, al, huff, restart, segments) -> None:
        cid, _td, ta = comp
        if cid not in self.coef:
            raise ValueError("JPEG: scan references unknown component")
        if (1, ta) not in huff:
            raise ValueError("JPEG: missing AC Huffman table")
        ac = huff[(1, ta)]
        seg_iter = iter(segments)
        rd = _BitReader(next(seg_iter))
        eobrun = 0
        for i, (_cid, by, bx) in enumerate(self._blocks_in_scan([comp])):
            if restart and i and i % restart == 0:
                try:
                    rd = _BitReader(next(seg_iter))
                except StopIteration:
                    raise ValueError("JPEG: missing restart segment") from None
                eobrun = 0
            blk = self.coef[cid][by, bx]
            if ah == 0:
                eobrun = self._ac_first_block(rd, ac, blk, ss, se, al, eobrun)
            else:
                eobrun = self._ac_refine_block(rd, ac, blk, ss, se, al, eobrun)

    @staticmethod
    def _ac_first_block(rd, ac, blk, ss, se, al, eobrun) -> int:
        if eobrun > 0:
            return eobrun - 1
        k = ss
        while k <= se:
            rs = rd.decode(ac)
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r == 15:  # ZRL
                    k += 16
                    continue
                eobrun = 1 << r
                if r:
                    eobrun += rd.bits(r)
                return eobrun - 1  # run covers this block
            k += r
            if k > se:
                raise ValueError("JPEG: AC run past spectral band")
            blk[k] = _extend(rd.bits(s), s) << al
            k += 1
        return 0

    @staticmethod
    def _ac_refine_block(rd, ac, blk, ss, se, al, eobrun) -> int:
        """T.81 G.1.2.3 refinement: newly-nonzero coefficients arrive as
        ±1<<Al; previously-nonzero ones receive one magnitude correction
        bit, read positionally while runs/ZRL advance over zero-history
        coefficients."""
        p1 = 1 << al
        k = ss

        def correct(pos: int) -> None:
            if rd.bit() and (abs(int(blk[pos])) & p1) == 0:
                blk[pos] += p1 if blk[pos] > 0 else -p1

        if eobrun == 0:
            while k <= se:
                rs = rd.decode(ac)
                r, s = rs >> 4, rs & 0x0F
                val = 0
                if s == 0:
                    if r != 15:
                        eobrun = 1 << r
                        if r:
                            eobrun += rd.bits(r)
                        break
                    # ZRL: r==15 → advance over 16 zero-history coefs
                else:
                    if s != 1:
                        raise ValueError("JPEG: refinement size must be 1")
                    val = p1 if rd.bit() else -p1
                while k <= se:
                    if blk[k] != 0:
                        correct(k)
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if val and k <= se:
                    blk[k] = val
                k += 1
        if eobrun > 0:
            while k <= se:
                if blk[k] != 0:
                    correct(k)
                k += 1
            eobrun -= 1
        return eobrun

    # -- final assembly ----------------------------------------------------

    def finish(self, qts) -> np.ndarray:
        planes: dict[int, np.ndarray] = {}
        for cid, (hi, vi, tq) in self.info.items():
            if tq not in qts:
                raise ValueError("JPEG: missing quantizer table")
            zz = self.coef[cid]
            by, bx, _ = zz.shape
            nat = np.zeros((by, bx, 64), np.float64)
            nat[..., ZIGZAG] = zz * qts[tq]
            spatial = _C.T @ nat.reshape(by, bx, 8, 8) @ _C
            planes[cid] = spatial.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
        half = float(1 << (self.prec - 1))
        maxval = float((1 << self.prec) - 1)
        full = []
        for cid, hi, vi, _tq in self.comps:
            p = planes[cid]
            if hi != self.max_h or vi != self.max_v:
                p = np.repeat(
                    np.repeat(p, self.max_v // vi, axis=0), self.max_h // hi, axis=1
                )
            full.append(p[: self.h, : self.w] + half)
        if len(full) == 1:
            out = np.clip(np.round(full[0]), 0, maxval)
        elif len(full) == 4:
            # Adobe CMYK/YCCK (APP14 transform 0/2): channels are stored
            # INVERTED (the Adobe convention); YCCK additionally runs
            # the inverted C,M,Y through the YCbCr transform.  RGB =
            # stored_cmy * stored_k / maxval — the standard consumer
            # math once both inversions cancel.
            if self.adobe == 2:  # YCCK
                y, cb, cr = full[0], full[1], full[2]
                c = y + 1.402 * (cr - half)
                m = y - 0.344136 * (cb - half) - 0.714136 * (cr - half)
                ye = y + 1.772 * (cb - half)
            else:  # transform 0 / absent: plain inverted CMYK
                c, m, ye = full[0], full[1], full[2]
            k = np.clip(full[3], 0.0, maxval)
            r = np.clip(c, 0.0, maxval) * k / maxval
            g = np.clip(m, 0.0, maxval) * k / maxval
            b = np.clip(ye, 0.0, maxval) * k / maxval
            out = np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, maxval)
        else:
            y, cb, cr = full
            r = y + 1.402 * (cr - half)
            g = y - 0.344136 * (cb - half) - 0.714136 * (cr - half)
            b = y + 1.772 * (cb - half)
            out = np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, maxval)
        if self.prec > 8:  # 12-bit samples → the uint8 pixel contract
            out = np.round(out * (255.0 / maxval))
        out = out.astype(np.uint8)
        return out[..., None] if len(full) == 1 else out


def decode_jpeg_pixels(buf: bytes) -> np.ndarray:
    """Full JPEG decode (baseline SOF0 or progressive SOF2) → uint8
    array of shape (h, w, 1) for grayscale or (h, w, 3) RGB — including
    4-component Adobe CMYK/YCCK frames (APP14 transform flag), which
    convert to RGB via the standard consumer math. Corruption raises
    ValueError; spec features beyond these modes raise
    NotImplementedError (both quarantined by ``featurize_pixels``,
    never a task failure)."""
    if len(buf) < 4 or buf[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    qts: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame = None
    prog: _ProgState | None = None
    baseline = False
    restart = 0
    adobe_transform: int | None = None
    pos = 2
    n = len(buf)
    while pos + 2 <= n:
        if buf[pos] != 0xFF:
            raise ValueError("JPEG: marker desync")
        marker = buf[pos + 1]
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:
            if prog is not None and prog.scans_done:
                return prog.finish(qts)
            raise ValueError("JPEG: EOI before SOS")
        if pos + 4 > n:
            raise ValueError("JPEG: truncated segment header")
        seg_len = int.from_bytes(buf[pos + 2 : pos + 4], "big")
        if seg_len < 2 or pos + 2 + seg_len > n:
            raise ValueError("JPEG: truncated segment")
        body = buf[pos + 4 : pos + 2 + seg_len]
        if marker == 0xDB:  # DQT (possibly several tables, 8 or 16-bit)
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                if pq == 0:
                    if i + 65 > len(body):
                        raise ValueError("JPEG: truncated DQT")
                    qts[tq] = np.frombuffer(body[i + 1 : i + 65], np.uint8).astype(
                        np.int64
                    )
                    i += 65
                elif pq == 1:
                    if i + 129 > len(body):
                        raise ValueError("JPEG: truncated DQT")
                    qts[tq] = np.frombuffer(body[i + 1 : i + 129], ">u2").astype(
                        np.int64
                    )
                    i += 129
                else:
                    raise ValueError("JPEG: bad DQT element precision")
        elif marker == 0xC4:  # DHT (possibly several tables)
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                if i + 17 > len(body):
                    raise ValueError("JPEG: truncated DHT")
                bits = list(body[i + 1 : i + 17])
                cnt = sum(bits)
                vals = body[i + 17 : i + 17 + cnt]
                if len(vals) < cnt:
                    raise ValueError("JPEG: truncated DHT values")
                huff[(tc, th)] = build_huffman(bits, vals)
                i += 17 + cnt
        elif marker in (0xC0, 0xC1, 0xC2):  # baseline / extended seq. / progressive
            if len(body) < 6:
                raise ValueError("JPEG: truncated SOF")
            prec, h, w = body[0], int.from_bytes(body[1:3], "big"), int.from_bytes(body[3:5], "big")
            if prec not in (8, 12) or (marker == 0xC0 and prec != 8):
                raise NotImplementedError(f"JPEG: {prec}-bit precision (SOF{marker - 0xC0})")
            nc = body[5]
            if nc not in (1, 3, 4):
                raise NotImplementedError(f"JPEG: {nc}-component frame")
            if len(body) < 6 + 3 * nc:
                raise ValueError("JPEG: truncated SOF components")
            comps = []
            for c in range(nc):
                cid, hv, tq = body[6 + 3 * c], body[7 + 3 * c], body[8 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (h, w, comps)
            prog = _ProgState(frame, prec)
            prog.adobe = adobe_transform
            baseline = marker != 0xC2
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "JPEG: only sequential SOF0/SOF1 / progressive SOF2 supported"
            )
        elif marker == 0xCC:
            raise NotImplementedError("JPEG: arithmetic coding")
        elif marker == 0xDD:  # DRI
            restart = int.from_bytes(body[0:2], "big")
        elif marker == 0xEE and body[:5] == b"Adobe" and len(body) >= 12:
            adobe_transform = body[11]  # 0=CMYK, 1=YCbCr, 2=YCCK
            if prog is not None:
                prog.adobe = adobe_transform
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG: SOS before SOF")
            if not body:
                raise ValueError("JPEG: truncated SOS")
            ns = body[0]
            if len(body) < 1 + 2 * ns:
                raise ValueError("JPEG: truncated SOS components")
            scan = []
            for c in range(ns):
                cs, tdta = body[1 + 2 * c], body[2 + 2 * c]
                scan.append((cs, tdta >> 4, tdta & 0x0F))
            segments, end = _split_scan(buf, pos + 2 + seg_len)
            if baseline:
                prog.baseline_scan(scan, huff, restart, segments)
                if len(scan) == len(frame[2]):
                    return prog.finish(qts)  # single interleaved scan
                pos = end
                continue
            if len(body) < 1 + 2 * ns + 3:
                raise ValueError("JPEG: progressive SOS missing Ss/Se/Ah/Al")
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ahal = body[3 + 2 * ns]
            prog.decode_scan(scan, ss, se, ahal >> 4, ahal & 0x0F, huff, restart, segments)
            pos = end
            continue
        pos += 2 + seg_len
    if prog is not None and prog.scans_done:
        raise ValueError("JPEG: stream missing EOI")
    raise ValueError("JPEG: no SOS marker")


# ----------------------------------------------------------------- EXIF


def parse_exif_orientation(buf: bytes) -> int:
    """EXIF orientation (tag 274 / 0x0112) from the first APP1 ``Exif``
    segment — 1 (upright) when absent, malformed, or out of range.
    Metadata parse must NEVER fail a decode, so every error path
    returns 1.

    The payload is a TIFF IFD (the structure ``tiff.py`` decodes for
    whole files): byte-order mark II/MM, magic 42, IFD0 offset, then
    12-byte entries (tag u16, type u16, count u32, value-or-offset).
    Camera JPEGs carry the display rotation here; applying it at the
    dispatch layer makes pHash/near-dup invariant to how a phone held
    the sensor."""
    try:
        if len(buf) < 4 or buf[:2] != b"\xff\xd8":
            return 1
        pos = 2
        n = len(buf)
        while pos + 4 <= n:
            if buf[pos] != 0xFF:
                return 1
            marker = buf[pos + 1]
            if marker in (0xD8,) or 0xD0 <= marker <= 0xD7:
                pos += 2
                continue
            if marker in (0xD9, 0xDA):  # EOI / SOS: no APP1 before scan
                return 1
            seg_len = int.from_bytes(buf[pos + 2 : pos + 4], "big")
            if seg_len < 2 or pos + 2 + seg_len > n:
                return 1
            body = buf[pos + 4 : pos + 2 + seg_len]
            if marker == 0xE1 and body[:6] == b"Exif\x00\x00":
                return orientation_from_tiff(body[6:])
            pos += 2 + seg_len
        return 1
    except Exception:
        return 1


def orientation_from_tiff(tiff: bytes) -> int:
    """Orientation tag (0x0112) from raw TIFF-IFD bytes — the shared
    core for JPEG APP1, the WebP ``EXIF`` chunk and TIFF files; 1 on
    any malformed path."""
    try:
        if len(tiff) < 8:
            return 1
        if tiff[:2] == b"II":
            bo = "little"
        elif tiff[:2] == b"MM":
            bo = "big"
        else:
            return 1
        if int.from_bytes(tiff[2:4], bo) != 42:
            return 1
        ifd = int.from_bytes(tiff[4:8], bo)
        if ifd + 2 > len(tiff):
            return 1
        count = int.from_bytes(tiff[ifd : ifd + 2], bo)
        for i in range(count):
            e = ifd + 2 + 12 * i
            if e + 12 > len(tiff):
                return 1
            tag = int.from_bytes(tiff[e : e + 2], bo)
            if tag != 0x0112:
                continue
            typ = int.from_bytes(tiff[e + 2 : e + 4], bo)
            cnt = int.from_bytes(tiff[e + 4 : e + 8], bo)
            if typ != 3 or cnt != 1:  # SHORT, one value
                return 1
            # SHORT value sits in the value field's first 2 bytes
            # (value fields are left-justified)
            val = int.from_bytes(tiff[e + 8 : e + 10], bo)
            return val if 1 <= val <= 8 else 1
        return 1
    except Exception:
        return 1


def apply_exif_orientation(px: np.ndarray, orientation: int) -> np.ndarray:
    """Transform stored pixels into display orientation (EXIF tag 274
    semantics; value 6 means the stored image must rotate 90° CW to
    display upright)."""
    if orientation == 2:
        return px[:, ::-1]
    if orientation == 3:
        return px[::-1, ::-1]
    if orientation == 4:
        return px[::-1, :]
    if orientation == 5:
        return np.swapaxes(px, 0, 1)
    if orientation == 6:
        return np.swapaxes(px, 0, 1)[:, ::-1]
    if orientation == 7:
        return np.swapaxes(px, 0, 1)[::-1, ::-1]
    if orientation == 8:
        return np.swapaxes(px, 0, 1)[::-1, :]
    return px


def decode_jpeg_oriented(buf: bytes) -> np.ndarray:
    """``decode_jpeg_pixels`` + EXIF orientation — the dispatch-layer
    entry (``decode_media``/``decode_image_payload``), so featurize,
    pHash and resize see photos the way a viewer does.  The raw decoder
    stays codec-exact (tests compare it against the spec transforms
    directly)."""
    px = decode_jpeg_pixels(buf)
    o = parse_exif_orientation(buf)
    return np.ascontiguousarray(apply_exif_orientation(px, o)) if o != 1 else px
