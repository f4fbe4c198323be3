"""Ogg Vorbis payload decoder — pure stdlib + numpy.

Implements Vorbis I decode end-to-end for mono and multi-channel
streams: Ogg page demux (CRC-checked, continued packets), the three
header packets, stream-defined Huffman codebooks with the canonical
lowest-available-leaf codeword assignment, VQ lookup types 1/2, BOTH
floor types — 1 (the piecewise-line dB-domain amplitude curve with the
spec's integer render_point/render_line math) and 0 (the legacy LSP
curve: bark-mapped line spectral pairs, closed-form) — residue types
0/1/2 with cascade passes, square-polar channel coupling, the
FFT-based inverse MDCT, Vorbis windowing and unequal-blocksize
overlap-add, and final granule-position truncation.

Unlike MP3 (ISO-tabulated Huffman data, see functions/mp3.py), Vorbis
carries its entropy codebooks INSIDE the stream and assigns codewords
algorithmically, so this decoder has no large transcribed data tables:
everything is closed-form from the public Vorbis I specification. The
one tabulated constant, ``floor1_inverse_dB_table``, is generated from
its closed form ``10^((i-255) * 7/256)`` (a 0.546875 dB step spanning
~139.45 dB, endpoints 1.0649863e-07 and 1.0 — matching the spec's
listed float32 values).

No named codec boundaries remain inside Vorbis I: reserved (non-0/1)
floor/mapping/time/window/transform types raise ValueError as
malformed streams, per spec.

Engine contract: int16 samples like WAV/FLAC/MP3, feeding the shared
feature/fingerprint stack (reference parity: the reference stores
media opaquely, SteamToS3Operator.py; payload decode feeds featurize
like every other codec here).
"""

from __future__ import annotations

import numpy as np

#: decode bound, same spirit as the FLAC/MP3/image bomb bounds
_VORBIS_MAX_SAMPLES = 1 << 26

# ------------------------------------------------------------------- Ogg

_CRC_TABLE = []
for _i in range(256):
    _r = _i << 24
    for _ in range(8):
        _r = ((_r << 1) ^ 0x04C11DB7) if (_r & 0x80000000) else (_r << 1)
        _r &= 0xFFFFFFFF
    _CRC_TABLE.append(_r)


def _ogg_crc(data: bytes) -> int:
    """Ogg page CRC-32: poly 0x04C11DB7, init 0, no reflection."""
    r = 0
    for b in data:
        r = ((r << 8) & 0xFFFFFFFF) ^ _CRC_TABLE[((r >> 24) & 0xFF) ^ b]
    return r


def _ogg_packets(buf: bytes):
    """Yield (serial, granule_of_page, packet_bytes, packet_complete)
    for every packet in the physical stream, joining packets continued
    across pages. CRC failures and malformed capture raise ValueError."""
    pos = 0
    partial: dict[int, bytearray] = {}
    while pos < len(buf):
        nxt = buf.find(b"OggS", pos)
        if nxt < 0:
            break
        pos = nxt
        if pos + 27 > len(buf):
            raise ValueError("Ogg: truncated page header")
        if buf[pos + 4] != 0:
            raise ValueError("Ogg: unsupported stream structure version")
        header_type = buf[pos + 5]
        granule = int.from_bytes(buf[pos + 6 : pos + 14], "little", signed=True)
        serial = int.from_bytes(buf[pos + 14 : pos + 18], "little")
        crc = int.from_bytes(buf[pos + 22 : pos + 26], "little")
        nsegs = buf[pos + 26]
        lace = buf[pos + 27 : pos + 27 + nsegs]
        if len(lace) < nsegs:
            raise ValueError("Ogg: truncated segment table")
        body_at = pos + 27 + nsegs
        body_len = sum(lace)
        if body_at + body_len > len(buf):
            raise ValueError("Ogg: page body truncated")
        page = bytearray(buf[pos : body_at + body_len])
        page[22:26] = b"\x00\x00\x00\x00"
        if _ogg_crc(bytes(page)) != crc:
            raise ValueError("Ogg: page CRC mismatch")
        if not (header_type & 0x01):
            partial.pop(serial, None)  # fresh packet boundary
        body = buf[body_at : body_at + body_len]
        at = 0
        cur = partial.pop(serial, bytearray())
        for si, seg in enumerate(lace):
            cur.extend(body[at : at + seg])
            at += seg
            if seg < 255:
                yield serial, granule, bytes(cur), True
                cur = bytearray()
        if cur:
            partial[serial] = cur
        pos = body_at + body_len


# ------------------------------------------------------------- bit reader


class _BitReader:
    """Vorbis bitpacking: LSB-first within each byte."""

    __slots__ = ("d", "pos")

    def __init__(self, data: bytes) -> None:
        self.d = data
        self.pos = 0

    def bits(self, n: int) -> int:
        v = 0
        for i in range(n):
            byte = self.pos >> 3
            if byte >= len(self.d):
                raise _EndOfPacket()
            v |= ((self.d[byte] >> (self.pos & 7)) & 1) << i
            self.pos += 1
        return v

    def bit(self) -> int:
        byte = self.pos >> 3
        if byte >= len(self.d):
            raise _EndOfPacket()
        b = (self.d[byte] >> (self.pos & 7)) & 1
        self.pos += 1
        return b


class _EndOfPacket(ValueError):
    """Running off the end of an audio packet is NOT an error in
    Vorbis: remaining vectors are zero (spec 1.3.2).

    Subclasses ValueError so that the *unexpected* escape paths —
    a truncated/short HEADER packet reaching `_parse_headers` (e.g.
    via WebM CodecPrivate, which carries no CRC), where no caller
    catches `_EndOfPacket` — fall inside `pixels.DECODE_QUARANTINE`
    and quarantine the row instead of becoming a permanent poison
    pill under foreachBatch replay. Every intentional end-of-packet
    site still catches the exact class, so audio-packet semantics
    are unchanged."""


def _ilog(x: int) -> int:
    n = 0
    while x > 0:
        n += 1
        x >>= 1
    return n


def _float32_unpack(v: int) -> float:
    mantissa = v & 0x1FFFFF
    exponent = (v >> 21) & 0x3FF
    if v & 0x80000000:
        mantissa = -mantissa
    return float(mantissa) * (2.0 ** (exponent - 788))


def _lookup1_values(entries: int, dims: int) -> int:
    v = int(entries ** (1.0 / dims))
    while (v + 1) ** dims <= entries:
        v += 1
    while v**dims > entries:
        v -= 1
    return v


# -------------------------------------------------------------- codebooks


def assign_codewords(lengths: list[int | None]) -> dict[str, int]:
    """Canonical Vorbis codeword assignment (spec 3.2.1): each used
    entry, in entry order, takes the LOWEST-valued available leaf of
    its length. Returns {codeword bitstring: entry}. Raises on an
    over-subscribed tree."""
    free = [""]  # disjoint free subtree prefixes, numerically sorted
    out: dict[str, int] = {}
    for i, l in enumerate(lengths):
        if l is None:
            continue
        k = next((j for j, p in enumerate(free) if len(p) <= l), None)
        if k is None:
            raise ValueError("Vorbis: over-subscribed codebook tree")
        p = free.pop(k)
        code = p + "0" * (l - len(p))
        out[code] = i
        sibs = [p + "0" * (m - len(p) - 1) + "1" for m in range(len(p) + 1, l + 1)]
        # deeper siblings start at smaller values: insert deepest-first
        # so the free list stays numerically sorted
        free[k:k] = sibs[::-1]
    return out


class _Codebook:
    __slots__ = ("dims", "entries", "decoder", "vq", "lengths")

    def __init__(self, rd: _BitReader) -> None:
        if rd.bits(24) != 0x564342:  # 'BCV'
            raise ValueError("Vorbis: bad codebook sync pattern")
        self.dims = rd.bits(16)
        self.entries = rd.bits(24)
        lengths: list[int | None] = []
        if rd.bit():  # ordered
            cur_len = rd.bits(5) + 1
            n = 0
            while n < self.entries:
                cnt = rd.bits(_ilog(self.entries - n))
                if n + cnt > self.entries:
                    raise ValueError("Vorbis: ordered codebook overrun")
                lengths.extend([cur_len] * cnt)
                n += cnt
                cur_len += 1
        else:
            sparse = rd.bit()
            for _ in range(self.entries):
                if sparse and not rd.bit():
                    lengths.append(None)
                else:
                    lengths.append(rd.bits(5) + 1)
        self.lengths = lengths
        self.decoder = assign_codewords(lengths)
        self.vq = None
        lookup = rd.bits(4)
        if lookup not in (0, 1, 2):
            raise ValueError(f"Vorbis: reserved codebook lookup type {lookup}")
        if lookup and self.dims == 0:
            raise ValueError("Vorbis: VQ codebook with zero dimensions")
        if lookup:
            minimum = _float32_unpack(rd.bits(32))
            delta = _float32_unpack(rd.bits(32))
            value_bits = rd.bits(4) + 1
            sequence_p = rd.bit()
            if lookup == 1:
                lv = _lookup1_values(self.entries, self.dims)
            else:
                lv = self.entries * self.dims
            mults = np.array([rd.bits(value_bits) for _ in range(lv)], np.float64)
            vq = np.zeros((self.entries, self.dims), np.float64)
            if lookup == 1:
                for e in range(self.entries):
                    last = 0.0
                    div = 1
                    for d in range(self.dims):
                        off = (e // div) % lv
                        vq[e, d] = mults[off] * delta + minimum + last
                        if sequence_p:
                            last = vq[e, d]
                        div *= lv
            else:
                for e in range(self.entries):
                    last = 0.0
                    for d in range(self.dims):
                        vq[e, d] = mults[e * self.dims + d] * delta + minimum + last
                        if sequence_p:
                            last = vq[e, d]
            self.vq = vq

    def read_scalar(self, rd: _BitReader) -> int:
        code = ""
        dec = self.decoder
        for _ in range(33):
            code += "1" if rd.bit() else "0"
            hit = dec.get(code)
            if hit is not None:
                return hit
        raise ValueError("Vorbis: invalid Huffman codeword")

    def read_vector(self, rd: _BitReader) -> np.ndarray:
        if self.vq is None:
            raise ValueError("Vorbis: VQ read from a scalar codebook")
        return self.vq[self.read_scalar(rd)]


# ------------------------------------------------------------ floor type 0


def _parse_floor0(rd: _BitReader) -> dict:
    order = rd.bits(8)
    rate = rd.bits(16)
    bark_map_size = rd.bits(16)
    amplitude_bits = rd.bits(6)
    amplitude_offset = rd.bits(8)
    n_books = rd.bits(4) + 1
    books = [rd.bits(8) for _ in range(n_books)]
    if order == 0 or rate == 0 or bark_map_size == 0:
        raise ValueError("Vorbis: invalid floor0 configuration")
    return {
        "type": 0, "order": order, "rate": rate,
        "bark_map_size": bark_map_size, "amplitude_bits": amplitude_bits,
        "amplitude_offset": amplitude_offset, "books": books,
    }


def _floor0_decode(rd: _BitReader, fl: dict, books: list[_Codebook]):
    """(amplitude, LSP coefficients) for one channel; None = unused
    (a zero amplitude is floor0's channel-unused signal)."""
    amplitude = rd.bits(fl["amplitude_bits"]) if fl["amplitude_bits"] else 0
    if amplitude <= 0:
        return None
    booknum = rd.bits(_ilog(len(fl["books"])))
    if booknum >= len(fl["books"]):
        raise ValueError("Vorbis: floor0 book number out of range")
    book = books[fl["books"][booknum]]
    coeffs: list[float] = []
    last = 0.0
    while len(coeffs) < fl["order"]:
        vec = book.read_vector(rd)
        coeffs.extend(float(v) + last for v in vec)
        last = coeffs[-1]
    return amplitude, coeffs[: fl["order"]]


def _bark(x: float) -> float:
    import math

    return (
        13.1 * math.atan(0.00074 * x)
        + 2.24 * math.atan(0.0000185 * x * x)
        + 0.0001 * x
    )


def _floor0_synthesize(fl: dict, data, n2: int) -> np.ndarray:
    """LSP curve synthesis (spec 6.2.3): piecewise-constant over the
    bark map, each segment the LSP magnitude response at its map
    frequency, amplitude-scaled in the 0.11512925 (ln10/20) domain."""
    import math

    amplitude, coeffs = data
    order = fl["order"]
    bms = fl["bark_map_size"]
    half_rate = fl["rate"] / 2.0
    scale = bms / _bark(half_rate)
    mp = [
        min(bms - 1, int(_bark(half_rate * i / n2) * scale)) for i in range(n2)
    ]
    cos_coeffs = [math.cos(c) for c in coeffs]
    out = np.zeros(n2)
    i = 0
    while i < n2:
        w = math.pi * mp[i] / bms
        cw = math.cos(w)
        if order % 2:
            p = (1.0 - cw * cw)
            for j in range((order - 1) // 2):
                d = cos_coeffs[2 * j + 1] - cw
                p *= 4.0 * d * d
            q = 0.25
            for j in range((order + 1) // 2):
                d = cos_coeffs[2 * j] - cw
                q *= 4.0 * d * d
        else:
            p = (1.0 - cw) / 2.0
            q = (1.0 + cw) / 2.0
            for j in range(order // 2):
                d = cos_coeffs[2 * j + 1] - cw
                p *= 4.0 * d * d
                d = cos_coeffs[2 * j] - cw
                q *= 4.0 * d * d
        denom = math.sqrt(p + q)
        if denom <= 0:
            val = 1.0
        else:
            amp_max = (1 << fl["amplitude_bits"]) - 1
            # clamp the exponent: a degenerate LSP root (denom -> 0 on
            # a corrupt stream) must yield a huge-but-finite curve, not
            # an OverflowError escaping the quarantine contract
            arg = 0.11512925 * (
                amplitude * fl["amplitude_offset"] / (amp_max * denom)
                - fl["amplitude_offset"]
            )
            val = math.exp(min(arg, 700.0))
        m = mp[i]
        while i < n2 and mp[i] == m:
            out[i] = val
            i += 1
    return out


# ------------------------------------------------------------ floor type 1

#: closed form of the spec's floor1_inverse_dB_table: geometric,
#: 0.546875 dB per step, table[255] = 1.0 (see module docstring)
FLOOR1_INVERSE_DB = np.power(
    10.0, (np.arange(256, dtype=np.float64) - 255.0) * (7.0 / 256.0)
).astype(np.float32).astype(np.float64)

_FLOOR1_RANGES = (256, 128, 86, 64)


def _parse_floor1(rd: _BitReader) -> dict:
    partitions = rd.bits(5)
    class_list = [rd.bits(4) for _ in range(partitions)]
    maximum_class = max(class_list) if class_list else -1
    classes = []
    for _ in range(maximum_class + 1):
        dim = rd.bits(3) + 1
        subclass = rd.bits(2)
        masterbook = rd.bits(8) if subclass else None
        books = [rd.bits(8) - 1 for _ in range(1 << subclass)]
        classes.append(
            {"dim": dim, "subclass": subclass, "masterbook": masterbook,
             "books": books}
        )
    multiplier = rd.bits(2) + 1
    rangebits = rd.bits(4)
    xs = [0, 1 << rangebits]
    for p in range(partitions):
        for _ in range(classes[class_list[p]]["dim"]):
            xs.append(rd.bits(rangebits))
    if len(set(xs)) != len(xs):
        raise ValueError("Vorbis: floor1 X values must be unique")
    return {
        "type": 1, "partitions": partitions, "class_list": class_list,
        "classes": classes, "multiplier": multiplier, "xs": xs,
    }


def _floor1_decode(rd: _BitReader, fl: dict, books: list[_Codebook]):
    """Read the packet's Y list for one channel; None = unused floor."""
    if not rd.bit():
        return None
    rng = _FLOOR1_RANGES[fl["multiplier"] - 1]
    ys = [rd.bits(_ilog(rng - 1)), rd.bits(_ilog(rng - 1))]
    for p in range(fl["partitions"]):
        cls = fl["classes"][fl["class_list"][p]]
        cbits = cls["subclass"]
        csub = (1 << cbits) - 1
        cval = 0
        if cbits:
            cval = books[cls["masterbook"]].read_scalar(rd)
        for _ in range(cls["dim"]):
            book = cls["books"][cval & csub]
            cval >>= cbits
            ys.append(books[book].read_scalar(rd) if book >= 0 else 0)
    return ys


def _render_point(x0: int, y0: int, x1: int, y1: int, x: int) -> int:
    dy = y1 - y0
    adx = x1 - x0
    err = abs(dy) * (x - x0)
    off = err // adx
    return y0 - off if dy < 0 else y0 + off


def _render_line(x0: int, y0: int, x1: int, y1: int, out: np.ndarray) -> None:
    dy = y1 - y0
    adx = x1 - x0
    base = dy // adx
    sy = base - 1 if dy < 0 else base + 1
    ady = abs(dy) - abs(base) * adx
    out[x0] = y0
    err = 0
    y = y0
    for x in range(x0 + 1, min(x1, len(out))):
        err += ady
        if err >= adx:
            err -= adx
            y += sy
        else:
            y += base
        out[x] = y


def _floor1_synthesize(fl: dict, ys: list[int], n2: int) -> np.ndarray:
    """Amplitude curve over n2 spectral lines (spec 7.2.4)."""
    rng = _FLOOR1_RANGES[fl["multiplier"] - 1]
    xs = fl["xs"]
    count = len(xs)
    step2 = [False] * count
    final = [0] * count
    step2[0] = step2[1] = True
    final[0] = ys[0]
    final[1] = ys[1]
    for i in range(2, count):
        # neighbors among positions 0..i-1 in X order
        lo = hi = None
        for j in range(i):
            if xs[j] < xs[i] and (lo is None or xs[j] > xs[lo]):
                lo = j
            if xs[j] > xs[i] and (hi is None or xs[j] < xs[hi]):
                hi = j
        pred = _render_point(xs[lo], final[lo], xs[hi], final[hi], xs[i])
        val = ys[i] if i < len(ys) else 0
        highroom = rng - pred
        lowroom = pred
        room = 2 * min(highroom, lowroom)
        if val:
            step2[lo] = step2[hi] = step2[i] = True
            if val >= room:
                final[i] = (
                    val - lowroom + pred
                    if highroom > lowroom
                    else pred - (val - highroom) - 1
                )
            else:
                final[i] = (
                    pred - ((val + 1) // 2) if val & 1 else pred + val // 2
                )
        else:
            step2[i] = False
            final[i] = pred
    order = sorted(range(count), key=lambda j: xs[j])
    curve_y = np.zeros(n2, np.int64)
    lx, ly = 0, final[order[0]] * fl["multiplier"]
    for j in order[1:]:
        if not step2[j]:
            continue
        hx = xs[j]
        hy = min(max(final[j], 0), rng - 1) * fl["multiplier"]
        if hx >= n2:
            # render toward the clipped point, then stop
            if hx > lx:
                _render_line(lx, ly, hx, hy, curve_y)
            lx, ly = hx, hy
            break
        _render_line(lx, ly, hx, hy, curve_y)
        lx, ly = hx, hy
    if lx < n2:
        curve_y[lx:] = ly
    np.clip(curve_y, 0, 255, out=curve_y)
    return FLOOR1_INVERSE_DB[curve_y]


# --------------------------------------------------------------- residues


def _parse_residue(rd: _BitReader) -> dict:
    rtype = rd.bits(16)
    if rtype not in (0, 1, 2):
        raise ValueError(f"Vorbis: reserved residue type {rtype}")
    begin = rd.bits(24)
    end = rd.bits(24)
    psize = rd.bits(24) + 1
    classifications = rd.bits(6) + 1
    classbook = rd.bits(8)
    cascade = []
    for _ in range(classifications):
        low = rd.bits(3)
        bitflag = rd.bit()
        high = rd.bits(5) if bitflag else 0
        cascade.append((high << 3) | low)
    books = []
    for c in range(classifications):
        row = []
        for p in range(8):
            row.append(rd.bits(8) if (cascade[c] >> p) & 1 else None)
        books.append(row)
    return {
        "type": rtype, "begin": begin, "end": end, "psize": psize,
        "classifications": classifications, "classbook": classbook,
        "books": books,
    }


def _residue_decode(
    rd: _BitReader, res: dict, books: list[_Codebook],
    do_decode: list[bool], n2: int,
) -> np.ndarray:
    """Decode one residue over len(do_decode) vectors of n2 values
    (spec 8.6.2). Type 2 callers pass a single interleaved vector."""
    ch = len(do_decode)
    out = np.zeros((ch, n2), np.float64)
    begin = min(res["begin"], n2)
    end = min(res["end"], n2)
    if end <= begin or not any(do_decode):
        return out
    classbook = books[res["classbook"]]
    cwords = classbook.dims
    if cwords < 1:
        # a zero-dims classbook would never advance the partition
        # cursor — corrupt stream, not a hang
        raise ValueError("Vorbis: residue classbook needs >= 1 dimension")
    psize = res["psize"]
    nparts = (end - begin) // psize
    cls = np.zeros((ch, nparts + cwords), np.int64)
    try:
        for p in range(8):
            pc = 0
            while pc < nparts:
                if p == 0:
                    for j in range(ch):
                        if not do_decode[j]:
                            continue
                        temp = classbook.read_scalar(rd)
                        for i in range(cwords - 1, -1, -1):
                            cls[j, pc + i] = temp % res["classifications"]
                            temp //= res["classifications"]
                for _ in range(cwords):
                    if pc >= nparts:
                        break
                    for j in range(ch):
                        if not do_decode[j]:
                            pass
                        else:
                            book_id = res["books"][cls[j, pc]][p]
                            if book_id is not None:
                                _residue_partition(
                                    rd, books[book_id], res["type"],
                                    out[j], begin + pc * psize, psize,
                                )
                    pc += 1
    except _EndOfPacket:
        pass  # remaining residue vectors are zero (spec 1.3.2)
    return out


def _residue_partition(
    rd: _BitReader, book: _Codebook, rtype: int,
    v: np.ndarray, offset: int, psize: int,
) -> None:
    if rtype == 0:
        step = psize // book.dims
        for i in range(step):
            vec = book.read_vector(rd)
            v[offset + i : offset + i + step * book.dims : step] += vec
    else:  # types 1 and 2 share the partition layout
        i = 0
        while i < psize:
            vec = book.read_vector(rd)
            v[offset + i : offset + i + book.dims] += vec
            i += book.dims


# ------------------------------------------------------------ MDCT/window


def _imdct(spec: np.ndarray, n: int) -> np.ndarray:
    """Vorbis inverse MDCT: n/2 spectral lines -> n time samples,
    y[j] = sum_k X[k] cos(2*pi/n * (j + 0.5 + n/4) * (k + 0.5)),
    computed via one n-point FFT (O(n log n), no cached matrices)."""
    h = n // 2
    k = np.arange(h)
    c = spec * np.exp(1j * 2.0 * np.pi * (0.5 + n / 4.0) * (k + 0.5) / n)
    s = np.fft.ifft(c, n) * n
    j = np.arange(n)
    return (np.exp(1j * np.pi * j / n) * s).real


def _vorbis_window(n: int) -> np.ndarray:
    i = np.arange(n)
    s = np.sin(np.pi / n * (i + 0.5))
    return np.sin(np.pi / 2.0 * s * s)


def _shaped_window(n: int, prev_n: int, next_n: int) -> np.ndarray:
    """The block's window with slopes sized for its neighbors: a long
    block next to a short one carries the SHORT slope centered in the
    corresponding half, flat 1.0 between, 0.0 outside (spec 4.3.1)."""
    w = np.zeros(n)
    ls = min(n, prev_n) // 2  # left slope width
    rs = min(n, next_n) // 2
    left_start = n // 4 - ls // 2
    right_end = 3 * n // 4 + rs // 2
    lw = _vorbis_window(2 * ls)[:ls]
    rw = _vorbis_window(2 * rs)[rs:]
    w[left_start : left_start + ls] = lw
    w[left_start + ls : right_end - rs] = 1.0
    w[right_end - rs : right_end] = rw
    return w


# ----------------------------------------------------------------- decode


def _parse_headers(packets):
    ident = packets[0]
    rd = _BitReader(ident[7:])
    if ident[:7] != b"\x01vorbis":
        raise ValueError("Vorbis: bad identification header")
    if rd.bits(32) != 0:
        raise ValueError("Vorbis: unsupported stream version")
    channels = rd.bits(8)
    rate = rd.bits(32)
    rd.bits(32), rd.bits(32), rd.bits(32)  # bitrate hints
    bs = rd.bits(4), rd.bits(4)
    bs0, bs1 = 1 << bs[0], 1 << bs[1]
    if channels == 0 or rate == 0 or bs0 > bs1 or not rd.bit():
        raise ValueError("Vorbis: invalid identification header")
    if not (64 <= bs0 <= 8192 and 64 <= bs1 <= 8192):
        raise ValueError("Vorbis: blocksize out of range")

    setup = packets[2]
    if setup[:7] != b"\x05vorbis":
        raise ValueError("Vorbis: bad setup header")
    rd = _BitReader(setup[7:])
    books = [_Codebook(rd) for _ in range(rd.bits(8) + 1)]
    for _ in range(rd.bits(6) + 1):  # time domain transforms
        if rd.bits(16) != 0:
            raise ValueError("Vorbis: reserved time transform")
    floors = []
    for _ in range(rd.bits(6) + 1):
        ftype = rd.bits(16)
        if ftype == 0:
            floors.append(_parse_floor0(rd))
        elif ftype == 1:
            floors.append(_parse_floor1(rd))
        else:
            raise ValueError(f"Vorbis: reserved floor type {ftype}")
    residues = [_parse_residue(rd) for _ in range(rd.bits(6) + 1)]
    mappings = []
    for _ in range(rd.bits(6) + 1):
        if rd.bits(16) != 0:
            raise ValueError("Vorbis: reserved mapping type")
        submaps = rd.bits(4) + 1 if rd.bit() else 1
        coupling = []
        if rd.bit():
            steps = rd.bits(8) + 1
            nb = _ilog(channels - 1)
            for _ in range(steps):
                m = rd.bits(nb)
                a = rd.bits(nb)
                if m == a or m >= channels or a >= channels:
                    raise ValueError("Vorbis: bad coupling step")
                coupling.append((m, a))
        if rd.bits(2) != 0:
            raise ValueError("Vorbis: mapping reserved bits set")
        mux = [rd.bits(4) for _ in range(channels)] if submaps > 1 else [0] * channels
        if any(m >= submaps for m in mux):
            raise ValueError("Vorbis: mapping mux out of range")
        submap_cfg = []
        for _ in range(submaps):
            rd.bits(8)  # unused time config
            submap_cfg.append({"floor": rd.bits(8), "residue": rd.bits(8)})
        mappings.append(
            {"coupling": coupling, "mux": mux, "submaps": submap_cfg}
        )
    modes = []
    for _ in range(rd.bits(6) + 1):
        blockflag = rd.bit()
        if rd.bits(16) != 0 or rd.bits(16) != 0:
            raise ValueError("Vorbis: reserved window/transform type")
        modes.append({"blockflag": blockflag, "mapping": rd.bits(8)})
    if not rd.bit():
        raise ValueError("Vorbis: setup framing bit unset")
    return {
        "channels": channels, "rate": rate, "bs": (bs0, bs1),
        "books": books, "floors": floors, "residues": residues,
        "mappings": mappings, "modes": modes,
    }


def decode_vorbis_samples(buf: bytes) -> tuple[np.ndarray, int]:
    """Full Vorbis decode of an Ogg stream: (int16 samples (n, ch),
    rate). Raises ValueError on corruption, NotImplementedError on the
    named floor-0 boundary."""
    packets = []
    serial_want = None
    granules = []
    for serial, granule, pkt, _complete in _ogg_packets(buf):
        if serial_want is None:
            if pkt[:7] == b"\x01vorbis":
                serial_want = serial
            else:
                continue
        if serial != serial_want:
            continue
        packets.append(pkt)
        granules.append(granule)
    last_granule = next(
        (g for g in reversed(granules) if g is not None and g >= 0), None
    )
    return decode_vorbis_packets(packets, last_granule)


def decode_vorbis_packets(
    packets: list[bytes], last_granule: int | None = None
) -> tuple[np.ndarray, int]:
    """Decode a raw Vorbis packet sequence (3 headers + audio packets)
    — the container-independent core shared by the Ogg path above and
    the WebM/Matroska ``V_VORBIS`` path (functions/webm.py), whose
    CodecPrivate carries the same three header packets Xiph-laced."""
    if len(packets) < 3:
        raise ValueError("Vorbis: missing header packets")
    hdr = _parse_headers(packets)
    ch, rate = hdr["channels"], hdr["rate"]
    bs0, bs1 = hdr["bs"]
    books, modes = hdr["books"], hdr["modes"]
    mode_bits = _ilog(len(modes) - 1)

    pcm: list[np.ndarray] = []
    prev_data: np.ndarray | None = None  # windowed TD data, prev block
    prev_n = 0
    total = 0
    for pkt in packets[3:]:
        rd = _BitReader(pkt)
        try:
            if rd.bit() != 0:
                continue  # not an audio packet
            mode = modes[rd.bits(mode_bits)]
        except _EndOfPacket:
            continue
        n = bs1 if mode["blockflag"] else bs0
        long_prev = long_next = True
        if mode["blockflag"]:
            try:
                # window flags (spec 4.3.2): 1 = that neighbor is long
                long_prev = rd.bit() == 1
                long_next = rd.bit() == 1
            except _EndOfPacket:
                continue
        mapping = hdr["mappings"][mode["mapping"]]
        n2 = n // 2
        # ---- floors
        floor_ys = []
        no_residue = []
        try:
            for j in range(ch):
                fl = hdr["floors"][mapping["submaps"][mapping["mux"][j]]["floor"]]
                if fl["type"] == 0:
                    ys = _floor0_decode(rd, fl, books)
                else:
                    ys = _floor1_decode(rd, fl, books)
                floor_ys.append(ys)
                no_residue.append(ys is None)
        except _EndOfPacket:
            # an end-of-packet during floor decode of channel 0 means
            # this packet produces silence but still advances lapping
            floor_ys += [None] * (ch - len(floor_ys))
            no_residue += [True] * (ch - len(no_residue))
        # coupling: a coupled channel pair decodes residue if EITHER
        # side has a nonzero floor
        for m, a in mapping["coupling"]:
            if not (no_residue[m] and no_residue[a]):
                no_residue[m] = no_residue[a] = False
        # ---- residues per submap
        spectra = np.zeros((ch, n2), np.float64)
        for s, sub in enumerate(mapping["submaps"]):
            in_sub = [j for j in range(ch) if mapping["mux"][j] == s]
            if not in_sub:
                continue
            res = hdr["residues"][sub["residue"]]
            if res["type"] == 2:
                do = [not all(no_residue[j] for j in in_sub)]
                v = _residue_decode(rd, res, books, do, n2 * len(in_sub))[0]
                for idx, j in enumerate(in_sub):
                    spectra[j] = v[idx :: len(in_sub)]
            else:
                do = [not no_residue[j] for j in in_sub]
                v = _residue_decode(rd, res, books, do, n2)
                for idx, j in enumerate(in_sub):
                    spectra[j] = v[idx]
        # ---- inverse coupling (square polar, spec 4.3.5)
        for m, a in reversed(mapping["coupling"]):
            mag = spectra[m].copy()
            ang = spectra[a].copy()
            new_m = mag.copy()
            new_a = ang.copy()
            pos = mag > 0
            new_m[pos & (ang > 0)] = mag[pos & (ang > 0)]
            new_a[pos & (ang > 0)] = mag[pos & (ang > 0)] - ang[pos & (ang > 0)]
            sel = pos & (ang <= 0)
            new_a[sel] = mag[sel]
            new_m[sel] = mag[sel] + ang[sel]
            neg = ~pos
            sel = neg & (ang > 0)
            new_m[sel] = mag[sel]
            new_a[sel] = mag[sel] + ang[sel]
            sel = neg & (ang <= 0)
            new_a[sel] = mag[sel]
            new_m[sel] = mag[sel] - ang[sel]
            spectra[m] = new_m
            spectra[a] = new_a
        # ---- floor curve multiply + IMDCT + window
        prev_nb = (bs1 if long_prev else bs0) if mode["blockflag"] else 0
        next_nb = (bs1 if long_next else bs0) if mode["blockflag"] else 0
        if not mode["blockflag"]:
            prev_nb = next_nb = n
        w = _shaped_window(n, prev_nb, next_nb)
        data = np.zeros((ch, n), np.float64)
        for j in range(ch):
            if floor_ys[j] is None:
                continue
            fl = hdr["floors"][mapping["submaps"][mapping["mux"][j]]["floor"]]
            if fl["type"] == 0:
                curve = _floor0_synthesize(fl, floor_ys[j], n2)
            else:
                curve = _floor1_synthesize(fl, floor_ys[j], n2)
            data[j] = _imdct(spectra[j] * curve, n) * w
        # ---- overlap-add with centered alignment (unequal blocks)
        if prev_data is not None:
            out_len = prev_n // 4 + n // 4
            out = np.zeros((out_len, ch), np.float64)
            # prev right half starts at the output origin
            seg = prev_data[:, prev_n // 2 :]
            upto = min(out_len, seg.shape[1])
            out[:upto] += seg[:, :upto].T
            # current left half offset so window centers align
            off = prev_n // 4 - n // 4
            seg = data[:, : n // 2]
            a0 = max(0, off)
            b0 = max(0, -off)
            span = min(out_len - a0, n // 2 - b0)
            if span > 0:
                out[a0 : a0 + span] += seg[:, b0 : b0 + span].T
            pcm.append(out)
            total += out_len
            if total > _VORBIS_MAX_SAMPLES:
                raise ValueError("Vorbis: decoded size exceeds bound")
        prev_data = data
        prev_n = n
    if not pcm:
        raise ValueError("Vorbis: no audio packets decoded")
    samples = np.concatenate(pcm, axis=0)
    # granule position of the final page = total PCM length (spec A.2)
    if last_granule is not None and 0 < last_granule < len(samples):
        samples = samples[:last_granule]
    out16 = np.clip(np.rint(samples * 32767.0), -32768, 32767).astype(np.int16)
    return out16, rate
