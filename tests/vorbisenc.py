"""Independent Ogg Vorbis test encoder + reconstruction model.

Builds spec-conformant Vorbis I streams (Ogg pages with real CRCs,
ident/comment/setup headers, stream-defined codebooks, floor-1 curves,
residue types 0/1/2, optional square-polar coupling, long+short
windows) from caller-chosen floor/residue data, and computes the
expected PCM through its OWN floor-render / direct-cosine IMDCT /
window / overlap model — written separately from the engine decoder so
round trips cross two independent readings of the spec. Only the
canonical codeword-assignment algorithm and the closed-form inverse-dB
table are shared with the engine module (``assign_codewords``,
``FLOOR1_INVERSE_DB``), the same shared-DATA discipline as
``tests/mp3enc.py``.

The engine decoder computes its IMDCT via an FFT factorization; the
model here uses the literal O(n^2) cosine sum from the spec, so the
transform math is cross-checked numerically, not just the bitstream.
"""

from __future__ import annotations

import numpy as np

from rustcheatersdatapipeline_spark.functions.vorbis import (
    FLOOR1_INVERSE_DB,
    _ogg_crc,
    assign_codewords,
)

# ------------------------------------------------------------ bit writer


class BitWriter:
    """Vorbis LSB-first bitpacking."""

    def __init__(self) -> None:
        self.bits: list[int] = []

    def w(self, value: int, n: int) -> None:
        for i in range(n):
            self.bits.append((value >> i) & 1)

    def code(self, codeword: str) -> None:
        """Huffman codewords are emitted MSB-of-codeword first."""
        for c in codeword:
            self.bits.append(1 if c == "1" else 0)

    def bytes(self) -> bytes:
        out = bytearray((len(self.bits) + 7) // 8)
        for i, b in enumerate(self.bits):
            if b:
                out[i >> 3] |= 1 << (i & 7)
        return bytes(out)


def pack_float32(x: float) -> int:
    """Inverse of the Vorbis float32 unpack (mantissa * 2^(exp-788))."""
    if x == 0.0:
        return 0
    sign = 0x80000000 if x < 0 else 0
    x = abs(x)
    exp = 788
    while x != int(x) and exp > 0:
        x *= 2.0
        exp -= 1
    m = int(x)
    while m > 0x1FFFFF:
        assert m % 2 == 0, "mantissa does not fit the packed format"
        m //= 2
        exp += 1
    return sign | (exp << 21) | m


# -------------------------------------------------------------- codebooks


class Book:
    """A codebook the encoder both serializes and encodes with."""

    def __init__(self, dims, lengths, lookup=0, mults=None, minimum=0.0,
                 delta=1.0, value_bits=8, sequence_p=0):
        self.dims = dims
        self.lengths = list(lengths)
        self.lookup = lookup
        self.mults = list(mults or [])
        self.minimum = minimum
        self.delta = delta
        self.value_bits = value_bits
        self.sequence_p = sequence_p
        dec = assign_codewords(self.lengths)
        self.codes = {entry: code for code, entry in dec.items()}

    def write(self, bw: BitWriter) -> None:
        bw.w(0x564342, 24)
        bw.w(self.dims, 16)
        bw.w(len(self.lengths), 24)
        bw.w(0, 1)  # unordered
        sparse = any(l is None for l in self.lengths)
        bw.w(1 if sparse else 0, 1)
        for l in self.lengths:
            if sparse:
                bw.w(0 if l is None else 1, 1)
                if l is None:
                    continue
            bw.w(l - 1, 5)
        bw.w(self.lookup, 4)
        if self.lookup:
            bw.w(pack_float32(self.minimum), 32)
            bw.w(pack_float32(self.delta), 32)
            bw.w(self.value_bits - 1, 4)
            bw.w(self.sequence_p, 1)
            for m in self.mults:
                bw.w(m, self.value_bits)

    def vector_of(self, entry: int) -> list[float]:
        assert self.lookup == 2
        return [
            self.mults[entry * self.dims + d] * self.delta + self.minimum
            for d in range(self.dims)
        ]


def fixed_book(bits: int, dims: int = 1) -> Book:
    """Complete tree of 2^bits equal-length codes (scalar)."""
    return Book(dims, [bits] * (1 << bits))


# ------------------------------------------------------------- the stream


class VorbisStream:
    """A one-logical-stream Ogg Vorbis encoder with a fixed simple
    layout: caller supplies books, one floor-1 config, one residue
    config, one mapping, and one or two modes (short/long)."""

    def __init__(self, rate=8000, channels=1, bs=(64, 64), books=None,
                 floor=None, residue=None, coupling=(), modes=None):
        self.rate = rate
        self.channels = channels
        self.bs = bs
        self.books = books or []
        self.floor = floor
        self.residue = residue
        self.coupling = list(coupling)
        self.modes = modes or [{"blockflag": 0}]

    # ---- headers

    def _ident(self) -> bytes:
        bw = BitWriter()
        bw.w(0, 32)
        bw.w(self.channels, 8)
        bw.w(self.rate, 32)
        bw.w(0, 32), bw.w(0, 32), bw.w(0, 32)
        bw.w(self.bs[0].bit_length() - 1, 4)
        bw.w(self.bs[1].bit_length() - 1, 4)
        bw.w(1, 1)
        return b"\x01vorbis" + bw.bytes()

    def _comment(self) -> bytes:
        vendor = b"vorbisenc-test"
        return (
            b"\x03vorbis"
            + len(vendor).to_bytes(4, "little") + vendor
            + (0).to_bytes(4, "little") + b"\x01"
        )

    def _setup(self) -> bytes:
        bw = BitWriter()
        bw.w(len(self.books) - 1, 8)
        for b in self.books:
            b.write(bw)
        bw.w(0, 6)          # 1 time transform
        bw.w(0, 16)
        bw.w(0, 6)          # 1 floor
        fl = self.floor
        if fl.get("type") == 0:
            bw.w(0, 16)     # floor type 0 (LSP)
            bw.w(fl["order"], 8)
            bw.w(fl["rate"], 16)
            bw.w(fl["bark_map_size"], 16)
            bw.w(fl["amplitude_bits"], 6)
            bw.w(fl["amplitude_offset"], 8)
            bw.w(len(fl["books"]) - 1, 4)
            for b in fl["books"]:
                bw.w(b, 8)
            return self._setup_tail(bw)
        bw.w(1, 16)         # floor type 1
        bw.w(fl["partitions"], 5)
        for c in fl["class_list"]:
            bw.w(c, 4)
        for cls in fl["classes"]:
            bw.w(cls["dim"] - 1, 3)
            bw.w(cls["subclass"], 2)
            if cls["subclass"]:
                bw.w(cls["masterbook"], 8)
            for bk in cls["books"]:
                bw.w(bk + 1, 8)
        bw.w(fl["multiplier"] - 1, 2)
        bw.w(fl["rangebits"], 4)
        for x in fl["xs"][2:]:
            bw.w(x, fl["rangebits"])
        return self._setup_tail(bw)

    def _setup_tail(self, bw: BitWriter) -> bytes:
        bw.w(0, 6)          # 1 residue
        rs = self.residue
        bw.w(rs["type"], 16)
        bw.w(rs["begin"], 24)
        bw.w(rs["end"], 24)
        bw.w(rs["psize"] - 1, 24)
        bw.w(rs["classifications"] - 1, 6)
        bw.w(rs["classbook"], 8)
        for c in range(rs["classifications"]):
            row = rs["books"][c]
            cascade = 0
            for p in range(8):
                if row[p] is not None:
                    cascade |= 1 << p
            bw.w(cascade & 7, 3)
            if cascade > 7:
                bw.w(1, 1)
                bw.w(cascade >> 3, 5)
            else:
                bw.w(0, 1)
        for c in range(rs["classifications"]):
            for p in range(8):
                if rs["books"][c][p] is not None:
                    bw.w(rs["books"][c][p], 8)
        bw.w(0, 6)          # 1 mapping, type 0
        bw.w(0, 16)
        if self.coupling:
            bw.w(0, 1)      # submaps flag: 1 submap
            bw.w(1, 1)      # coupling flag
            bw.w(len(self.coupling) - 1, 8)
            nb = max(1, (self.channels - 1).bit_length())
            for m, a in self.coupling:
                bw.w(m, nb)
                bw.w(a, nb)
        else:
            bw.w(0, 1)
            bw.w(0, 1)
        bw.w(0, 2)          # reserved
        bw.w(0, 8)          # submap: time config (unused)
        bw.w(0, 8)          # floor number
        bw.w(0, 8)          # residue number
        bw.w(len(self.modes) - 1, 6)
        for m in self.modes:
            bw.w(m["blockflag"], 1)
            bw.w(0, 16)
            bw.w(0, 16)
            bw.w(0, 8)      # mapping number
        bw.w(1, 1)          # framing
        return b"\x05vorbis" + bw.bytes()

    def _emit_floor0(self, bw: BitWriter, fd) -> None:
        fl = self.floor
        if fd is None:
            bw.w(0, fl["amplitude_bits"])
            return
        bw.w(fd["amplitude"], fl["amplitude_bits"])
        nb = len(fl["books"])
        bw.w(fd.get("booknumber", 0), nb.bit_length())  # ilog(nb) bits
        book = self.books[fl["books"][fd.get("booknumber", 0)]]
        for e in fd["entries"]:
            bw.code(book.codes[e])

    # ---- audio packets

    def audio_packet(self, frame: dict) -> bytes:
        """frame: mode (int), window flags, per-channel floor Y lists
        (or None), residue classes per channel, residue vector entries:
        {"mode": 0, "prev_long": 1, "next_long": 1,
         "floors": [ [y0, y1, ...] | None, ...],
         "classes": [[c per partition] per coded-vector],
         "vectors": [[(pass, part, entry), ...] per coded-vector]}"""
        bw = BitWriter()
        bw.w(0, 1)
        nmodes = len(self.modes)
        mode_bits = max(0, (nmodes - 1).bit_length())
        bw.w(frame["mode"], mode_bits)
        mode = self.modes[frame["mode"]]
        n = self.bs[1] if mode["blockflag"] else self.bs[0]
        if mode["blockflag"]:
            bw.w(frame.get("prev_long", 1), 1)
            bw.w(frame.get("next_long", 1), 1)
        fl = self.floor
        if fl.get("type") == 0:
            for fd in frame["floors"]:
                self._emit_floor0(bw, fd)
            return self._emit_residue(bw, frame, n)
        rng = {1: 256, 2: 128, 3: 86, 4: 64}[fl["multiplier"]]
        ybits = (rng - 1).bit_length()
        for ys in frame["floors"]:
            if ys is None:
                bw.w(0, 1)
                continue
            bw.w(1, 1)
            bw.w(ys[0], ybits)
            bw.w(ys[1], ybits)
            i = 2
            for p in range(fl["partitions"]):
                cls = fl["classes"][fl["class_list"][p]]
                assert cls["subclass"] == 0, "test encoder: subclass 0 only"
                book = self.books[cls["books"][0]]
                for _ in range(cls["dim"]):
                    bw.code(book.codes[ys[i]])
                    i += 1
        return self._emit_residue(bw, frame, n)

    def _emit_residue(self, bw: BitWriter, frame: dict, n: int) -> bytes:
        rs = self.residue
        n2 = n // 2
        vec_len = n2 * self.channels if rs["type"] == 2 else n2
        begin = min(rs["begin"], vec_len)
        end = min(rs["end"], vec_len)
        psize = rs["psize"]
        nparts = (end - begin) // psize
        classbook = self.books[rs["classbook"]]
        cwords = classbook.dims
        classes = frame["classes"]
        vectors = frame.get("vectors", [])
        coded = len(classes)
        for p in range(8):
            pc = 0
            while pc < nparts:
                if p == 0:
                    for j in range(coded):
                        if classes[j] is None:
                            continue
                        temp = 0
                        for i in range(cwords):
                            c = classes[j][pc + i] if pc + i < nparts else 0
                            temp = temp * rs["classifications"] + c
                        bw.code(classbook.codes[temp])
                for _ in range(cwords):
                    if pc >= nparts:
                        break
                    for j in range(coded):
                        if classes[j] is None:
                            continue
                        book_id = rs["books"][classes[j][pc]][p]
                        if book_id is not None:
                            for pass_, part, entry in vectors[j]:
                                if pass_ == p and part == pc:
                                    bw.code(self.books[book_id].codes[entry])
                    pc += 1
        return bw.bytes()

    # ---- Ogg framing

    def _page(self, packets, seqno, granule, header_type=0, serial=7777):
        lace = bytearray()
        body = bytearray()
        for pkt in packets:
            body.extend(pkt)
            q, r = divmod(len(pkt), 255)
            lace.extend([255] * q)
            lace.append(r)
        hdr = bytearray(b"OggS")
        hdr.append(0)
        hdr.append(header_type)
        hdr += int(granule).to_bytes(8, "little", signed=True)
        hdr += serial.to_bytes(4, "little")
        hdr += seqno.to_bytes(4, "little")
        hdr += b"\x00\x00\x00\x00"
        hdr.append(len(lace))
        hdr += lace
        page = hdr + body
        crc = _ogg_crc(bytes(page))
        page[22:26] = crc.to_bytes(4, "little")
        return bytes(page)

    def encode(self, frames: list[dict]) -> bytes:
        """Serialize headers + audio packets into an Ogg stream with
        correct granule positions."""
        out = bytearray()
        out += self._page([self._ident()], 0, 0, header_type=0x02)
        out += self._page([self._comment(), self._setup()], 1, 0)
        # granule accounting mirrors lapping: packet i>0 emits
        # (n_prev + n_cur) / 4 samples
        total = 0
        prev_n = None
        pkts = []
        for f in frames:
            mode = self.modes[f["mode"]]
            n = self.bs[1] if mode["blockflag"] else self.bs[0]
            if prev_n is not None:
                total += prev_n // 4 + n // 4
            prev_n = n
            pkts.append(self.audio_packet(f))
        for i, pkt in enumerate(pkts):
            last = i == len(pkts) - 1
            out += self._page(
                [pkt], 2 + i, total if last else -1,
                header_type=0x04 if last else 0,
            )
        return bytes(out)


# -------------------------------------------------- reconstruction model


def model_floor_curve(fl: dict, ys: list[int], n2: int) -> np.ndarray:
    """Independent floor-1 synthesis: same spec, separate code."""
    rng = {1: 256, 2: 128, 3: 86, 4: 64}[fl["multiplier"]]
    xs = fl["xs"]
    fin = [0] * len(xs)
    flag = [False] * len(xs)
    flag[0] = flag[1] = True
    fin[0], fin[1] = ys[0], ys[1]
    for i in range(2, len(xs)):
        lo = max((j for j in range(i) if xs[j] < xs[i]), key=lambda j: xs[j])
        hi = min((j for j in range(i) if xs[j] > xs[i]), key=lambda j: xs[j])
        dy = fin[hi] - fin[lo]
        adx = xs[hi] - xs[lo]
        off = (abs(dy) * (xs[i] - xs[lo])) // adx
        pred = fin[lo] - off if dy < 0 else fin[lo] + off
        val = ys[i]
        hr, lr = rng - pred, pred
        room = 2 * min(hr, lr)
        if val:
            flag[lo] = flag[hi] = flag[i] = True
            if val >= room:
                fin[i] = val - lr + pred if hr > lr else pred - (val - hr) - 1
            else:
                fin[i] = pred - (val + 1) // 2 if val % 2 else pred + val // 2
        else:
            fin[i] = pred
    mult = fl["multiplier"]
    # spec 7.2.4: final_Y scales by the multiplier BEFORE the line
    # render, so interpolation steps happen in dB-table units
    pts = sorted(
        (xs[j], max(0, min(fin[j], rng - 1)) * mult)
        for j in range(len(xs))
        if flag[j]
    )
    curve = np.zeros(n2)
    for (x0, y0), (x1, y1) in zip(pts, pts[1:]):
        dy, adx = y1 - y0, x1 - x0
        base = dy // adx
        sy = base - 1 if dy < 0 else base + 1
        ady = abs(dy) - abs(base) * adx
        err, y = 0, y0
        if x0 < n2:
            curve[x0] = FLOOR1_INVERSE_DB[min(255, y0)]
        for x in range(x0 + 1, min(x1, n2)):
            err += ady
            if err >= adx:
                err -= adx
                y += sy
            else:
                y += base
            curve[x] = FLOOR1_INVERSE_DB[min(255, y)]
    lastx, lasty = pts[-1]
    if lastx < n2:
        curve[lastx:] = FLOOR1_INVERSE_DB[min(255, lasty)]
    return curve


def model_imdct(spec: np.ndarray, n: int) -> np.ndarray:
    """Literal O(n^2) cosine-sum IMDCT from the spec definition."""
    j = np.arange(n)[:, None]
    k = np.arange(n // 2)[None, :]
    basis = np.cos(2.0 * np.pi / n * (j + 0.5 + n / 4.0) * (k + 0.5))
    return basis @ spec


def model_window(n: int, prev_n: int, next_n: int) -> np.ndarray:
    w = np.zeros(n)
    ls, rs = min(n, prev_n) // 2, min(n, next_n) // 2
    lstart, rend = n // 4 - ls // 2, 3 * n // 4 + rs // 2
    i = np.arange(ls)
    w[lstart:lstart + ls] = np.sin(
        np.pi / 2 * np.sin(np.pi / (2 * ls) * (i + 0.5)) ** 2
    )
    w[lstart + ls:rend - rs] = 1.0
    i = np.arange(rs)
    w[rend - rs:rend] = np.sin(
        np.pi / 2 * np.sin(np.pi / (2 * rs) * (i + rs + 0.5)) ** 2
    )
    return w


def expected_pcm(stream: VorbisStream, frames: list[dict],
                 spectra: list[np.ndarray]) -> np.ndarray:
    """Model output: per-frame final spectra (channels x n/2, AFTER
    coupling and floor multiply — the caller states them) through the
    model IMDCT + window + centered overlap-add."""
    chunks = []
    prev = None
    prev_n = 0
    for f, spec in zip(frames, spectra):
        mode = stream.modes[f["mode"]]
        n = stream.bs[1] if mode["blockflag"] else stream.bs[0]
        if mode["blockflag"]:
            pn = stream.bs[1] if f.get("prev_long", 1) else stream.bs[0]
            nn = stream.bs[1] if f.get("next_long", 1) else stream.bs[0]
        else:
            pn = nn = n
        w = model_window(n, pn, nn)
        ch = spec.shape[0]
        data = np.stack([model_imdct(spec[j], n) * w for j in range(ch)])
        if prev is not None:
            out_len = prev_n // 4 + n // 4
            out = np.zeros((out_len, ch))
            seg = prev[:, prev_n // 2:]
            upto = min(out_len, seg.shape[1])
            out[:upto] += seg[:, :upto].T
            off = prev_n // 4 - n // 4
            a0, b0 = max(0, off), max(0, -off)
            span = min(out_len - a0, n // 2 - b0)
            out[a0:a0 + span] += data[:, b0:b0 + span].T
            chunks.append(out)
        prev, prev_n = data, n
    return np.concatenate(chunks, axis=0)


def model_floor0_curve(fl: dict, amplitude: int, coeffs, n2: int) -> np.ndarray:
    """Independent floor-0 (LSP) synthesis: same spec, separate code."""
    import math

    def bark(x):
        return (13.1 * math.atan(0.00074 * x)
                + 2.24 * math.atan(0.0000185 * x * x) + 0.0001 * x)

    order = fl["order"]
    bms = fl["bark_map_size"]
    half = fl["rate"] / 2.0
    mp = [min(bms - 1, int(bark(half * i / n2) * bms / bark(half)))
          for i in range(n2)]
    cosc = [math.cos(c) for c in coeffs]
    amp_max = (1 << fl["amplitude_bits"]) - 1
    out = np.zeros(n2)
    for i in range(n2):
        w = math.pi * mp[i] / bms
        cw = math.cos(w)
        if order % 2:
            p = (1.0 - cw * cw) * math.prod(
                4.0 * (cosc[2 * j + 1] - cw) ** 2 for j in range((order - 1) // 2)
            )
            q = 0.25 * math.prod(
                4.0 * (cosc[2 * j] - cw) ** 2 for j in range((order + 1) // 2)
            )
        else:
            p = (1.0 - cw) / 2.0 * math.prod(
                4.0 * (cosc[2 * j + 1] - cw) ** 2 for j in range(order // 2)
            )
            q = (1.0 + cw) / 2.0 * math.prod(
                4.0 * (cosc[2 * j] - cw) ** 2 for j in range(order // 2)
            )
        arg = 0.11512925 * (
            amplitude * fl["amplitude_offset"] / (amp_max * math.sqrt(p + q))
            - fl["amplitude_offset"]
        )
        out[i] = math.exp(min(arg, 700.0))  # same clamp as the engine
    return out
