"""Independent MPEG-1 Layer III test encoder + reconstruction model.

Builds spec-conformant Layer III frames from caller-chosen quantized
spectra and coding parameters, and computes the expected PCM through
its OWN requantize/reorder/alias/IMDCT/synthesis implementation —
written separately from the engine decoder so the round-trip tests
exercise two independent readings of the ISO 11172-3 math. Only pure
DATA tables (Huffman codes, scalefactor bands, the synthesis window)
are shared with the engine module, same discipline as
``tests/vp8enc.py``.

The encoder emits real main-data distribution: each frame's granule
bits go into a virtual bitstream that is sliced into the frames'
main-data regions, with ``main_data_begin`` back-pointers — so
multi-frame streams genuinely exercise the decoder's bit reservoir.
"""

from __future__ import annotations

import numpy as np

from rustcheatersdatapipeline_spark.functions import mp3 as M

_BR_IDX = {32000: 1, 40000: 2, 48000: 3, 56000: 4, 64000: 5, 80000: 6,
           96000: 7, 112000: 8, 128000: 9, 160000: 10, 192000: 11,
           224000: 12, 256000: 13, 320000: 14}
_SR_IDX = {44100: 0, 48000: 1, 32000: 2}
#: MPEG-2 LSF layer III bitrates / rates
_BR_IDX_LSF = {8000: 1, 16000: 2, 24000: 3, 32000: 4, 40000: 5, 48000: 6,
               56000: 7, 64000: 8, 80000: 9, 96000: 10, 112000: 11,
               128000: 12, 144000: 13, 160000: 14}
_SR_IDX_LSF = {22050: 0, 24000: 1, 16000: 2}


class BitWriter:
    def __init__(self) -> None:
        self.bits: list[int] = []

    def w(self, value: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.bits.append((value >> i) & 1)

    def pad_to_byte(self) -> None:
        while len(self.bits) % 8:
            self.bits.append(0)

    def bytes(self) -> bytes:
        assert len(self.bits) % 8 == 0
        return bytes(
            int("".join(map(str, self.bits[i : i + 8])), 2)
            for i in range(0, len(self.bits), 8)
        )


def _enc_pair(bw: BitWriter, table: int, x: int, y: int) -> None:
    base, linbits = M.ESC_TABLES.get(table, (table, 0))
    nx, hlen, hcod = M.HUFFMAN_TABLES[base]
    ax, ay = abs(x), abs(y)
    if linbits:
        # ESC tables: magnitude 15 is the escape symbol; values
        # 15..15+2^linbits-1 ride the escape
        assert ax <= 14 + (1 << linbits) and ay <= 14 + (1 << linbits), (
            f"value {x},{y} exceeds table {table} (linbits {linbits})"
        )
        cx, cy = min(ax, 15), min(ay, 15)
    else:
        assert ax < nx and ay < nx, f"value {x},{y} exceeds table {table}"
        cx, cy = ax, ay
    idx = cx * nx + cy
    bw.w(hcod[idx], hlen[idx])
    # spec bit order: x linbits, x sign, y linbits, y sign
    if cx:
        if cx == 15 and linbits:
            bw.w(ax - 15, linbits)
        bw.w(1 if x < 0 else 0, 1)
    if cy:
        if cy == 15 and linbits:
            bw.w(ay - 15, linbits)
        bw.w(1 if y < 0 else 0, 1)


def _enc_quad(bw: BitWriter, table_sel: int, vals) -> None:
    q = 0
    for v in vals:
        q = (q << 1) | (1 if v else 0)
    if table_sel:
        bw.w(q ^ 0xF, 4)
    else:
        hlen, hcod = M.COUNT1_A
        bw.w(hcod[q], hlen[q])
    for v in vals:
        if v:
            bw.w(1 if v < 0 else 0, 1)


def encode_granule_channel(bw: BitWriter, g: dict, rate: int,
                           gr: int, scfsi, wrote_sf_prev) -> dict:
    """Append one granule-channel's part2_3 bits; returns side-info
    fields (big_values, part2_3_length, ...)."""
    start = len(bw.bits)
    vals = list(g["is"])
    assert len(vals) == 576
    bt = g.get("block_type", 0)
    short = bt == 2
    lsf = g.get("lsf", False)
    # scalefactors
    if lsf:
        slen, nl, ns, _pre = M._lsf_scalefac_layout(
            g.get("scalefac_compress", 0)
        )
        if short:
            sfs = g.get("scalefac_short") or [[0] * 13 for _ in range(3)]
            flat = [sfs[w][band] for band in range(12) for w in range(3)]
            i = 0
            for gi in range(4):
                for _ in range(ns[gi]):
                    assert flat[i] < (1 << slen[gi]) or slen[gi] == 0
                    bw.w(flat[i], slen[gi])
                    i += 1
        else:
            sfl = g.get("scalefac_long") or [0] * 22
            band = 0
            for gi in range(4):
                for _ in range(nl[gi]):
                    assert sfl[band] < (1 << slen[gi]) or slen[gi] == 0
                    bw.w(sfl[band], slen[gi])
                    band += 1
    elif short and g.get("mixed"):
        # mixed blocks: 8 long bands (slen1), short 3..5 (slen1),
        # short 6..11 (slen2)
        slen1, slen2 = M.SLEN[g.get("scalefac_compress", 0)]
        sfl = g.get("scalefac_long") or [0] * 22
        sfs = g.get("scalefac_short") or [[0] * 13 for _ in range(3)]
        for band in range(8):
            assert sfl[band] < (1 << slen1) or slen1 == 0
            bw.w(sfl[band], slen1)
        for band in range(3, 6):
            for w in range(3):
                assert sfs[w][band] < (1 << slen1) or slen1 == 0
                bw.w(sfs[w][band], slen1)
        for band in range(6, 12):
            for w in range(3):
                bw.w(sfs[w][band], slen2)
    elif short:
        slen1, slen2 = M.SLEN[g.get("scalefac_compress", 0)]
        sfs = g.get("scalefac_short") or [[0] * 13 for _ in range(3)]
        for band in range(6):
            for w in range(3):
                assert sfs[w][band] < (1 << slen1) or slen1 == 0
                bw.w(sfs[w][band], slen1)
        for band in range(6, 12):
            for w in range(3):
                bw.w(sfs[w][band], slen2)
    else:
        slen1, slen2 = M.SLEN[g.get("scalefac_compress", 0)]
        sfl = g.get("scalefac_long") or [0] * 22
        groups = ((0, 6, slen1), (6, 11, slen1), (11, 16, slen2), (16, 21, slen2))
        for gi, (lo, hi, sl) in enumerate(groups):
            if gr == 1 and scfsi[gi]:
                assert wrote_sf_prev is not None
                assert sfl[lo:hi] == wrote_sf_prev[lo:hi], "scfsi bands must match"
                continue
            for band in range(lo, hi):
                assert sfl[band] < (1 << sl) or sl == 0
                bw.w(sfl[band], sl)
    # regions
    last_big = -1
    last_nz = -1
    for i, v in enumerate(vals):
        if v:
            last_nz = i
        if abs(v) > 1:
            last_big = i
    big_end = g.get("big_end")
    if big_end is None:
        big_end = ((last_big + 2) // 2) * 2 if last_big >= 0 else 0
    assert big_end % 2 == 0 and big_end >= last_big + 1
    big_values = big_end // 2
    assert big_values <= 288
    # table boundaries: ANY window-switching block type (1/2/3) uses the
    # spec-fixed region split (36/576) with two table selects
    switching = bt != 0
    if switching:
        region1_start, region2_start = 36, 576
        tsel = list(g.get("table_select", [1, 1]))[:2]
        tables3 = tsel + [tsel[-1]]
    else:
        long_b = M.SFB_LONG[rate]
        r0 = min(g.get("region0_count", 8) + 1, 22)
        r1 = min(r0 + g.get("region1_count", 7) + 1, 22)
        region1_start, region2_start = long_b[r0], long_b[r1]
        tables3 = list(g.get("table_select", [1, 1, 1]))
    for i in range(0, big_end, 2):
        if i < region1_start:
            t = tables3[0]
        elif i < region2_start:
            t = tables3[1]
        else:
            t = tables3[2]
        x, y = vals[i], vals[i + 1]
        if t == 0:
            assert x == 0 and y == 0, "table 0 region must be silent"
            continue
        _enc_pair(bw, t, x, y)
    # count1 quads
    c1sel = g.get("count1table_select", 0)
    count1_end = ((max(last_nz + 1, big_end) - big_end + 3) // 4) * 4 + big_end
    for i in range(big_end, min(count1_end, 576), 4):
        quad = vals[i : i + 4]
        assert all(abs(v) <= 1 for v in quad), "count1 region must be +-1"
        _enc_quad(bw, c1sel, quad)
    part2_3 = len(bw.bits) - start
    si = {
        "part2_3_length": part2_3,
        "big_values": big_values,
        "global_gain": g.get("global_gain", 210),
        "scalefac_compress": g.get("scalefac_compress", 0),
        "block_type": bt,
        "mixed": 1 if (bt == 2 and g.get("mixed")) else 0,
        "subblock_gain": g.get("subblock_gain", [0, 0, 0]),
        "table_select": tables3[:2] if switching else tables3,
        "region0_count": None if switching else g.get("region0_count", 8),
        "region1_count": None if switching else g.get("region1_count", 7),
        "preflag": g.get("preflag", 0),
        "scalefac_scale": g.get("scalefac_scale", 0),
        "count1table_select": c1sel,
    }
    return si


def decoded_extent(g: dict) -> int:
    """Index just past the last Huffman-decoded value the stream
    carries for this granule (big_values pairs + count1 quads) — the
    decoder's intensity zero-bound. Mirrors encode_granule_channel's
    region math exactly."""
    vals = list(g["is"])
    last_big = last_nz = -1
    for i, v in enumerate(vals):
        if v:
            last_nz = i
        if abs(v) > 1:
            last_big = i
    big_end = g.get("big_end")
    if big_end is None:
        big_end = ((last_big + 2) // 2) * 2 if last_big >= 0 else 0
    count1_end = ((max(last_nz + 1, big_end) - big_end + 3) // 4) * 4 + big_end
    return min(count1_end, 576)


def encode_mp3(frames: list, rate: int = 48000, bitrate: int = 320000,
               channels: int = 1, ms_stereo: bool = False,
               intensity: bool = False, scfsi=None) -> bytes:
    """``frames``: list of [gr0, gr1] (MPEG-1 rates) or [gr0] (LSF
    rates 22050/24000/16000 — MPEG-2 one-granule frames), each granule
    a list of per-channel dicts (keys: is, global_gain,
    scalefac_long/short, block_type, table_select, ...). Returns the
    packed Layer III payload."""
    mpeg1 = rate in _SR_IDX
    scfsi = scfsi or [[0, 0, 0, 0] for _ in range(channels)]
    if mpeg1:
        frame_size = 144 * bitrate // rate
        si_len = 17 if channels == 1 else 32
        n_gr = 2
    else:
        frame_size = 72 * bitrate // rate
        si_len = 9 if channels == 1 else 17
        n_gr = 1
        assert not intensity, "LSF intensity not modeled"
    region = frame_size - 4 - si_len
    md_blocks: list[bytes] = []
    side_infos: list[tuple[int, list]] = []
    v_off = 0  # bytes of main data emitted so far
    emitted = 0  # region bytes emitted so far
    for fi, grs in enumerate(frames):
        assert len(grs) == n_gr
        bw = BitWriter()
        si_fields = []
        prev_long = [None] * channels
        for gr in range(n_gr):
            per_ch = []
            for ch in range(channels):
                g = dict(grs[gr][ch], lsf=not mpeg1)
                fs = encode_granule_channel(
                    bw, g, rate, gr, scfsi[ch], prev_long[ch]
                )
                if g.get("block_type", 0) != 2:
                    prev_long[ch] = g.get("scalefac_long") or [0] * 22
                per_ch.append(fs)
            si_fields.append(per_ch)
        bw.pad_to_byte()
        md = bw.bytes()
        main_data_begin = emitted - v_off
        assert 0 <= main_data_begin <= 511, "reservoir out of range"
        assert v_off + len(md) <= emitted + region, "main data overflows frame"
        md_blocks.append(md)
        side_infos.append((main_data_begin, si_fields))
        v_off += len(md)
        emitted += region
    stream = b"".join(md_blocks) + b"\x00" * (emitted - v_off)
    out = bytearray()
    for fi in range(len(frames)):
        hdr = BitWriter()
        hdr.w(0x7FF, 11)
        hdr.w(3 if mpeg1 else 2, 2)  # MPEG-1 / MPEG-2 LSF
        hdr.w(1, 2)  # Layer III
        hdr.w(1, 1)  # no CRC
        hdr.w((_BR_IDX if mpeg1 else _BR_IDX_LSF)[bitrate], 4)
        hdr.w((_SR_IDX if mpeg1 else _SR_IDX_LSF)[rate], 2)
        hdr.w(0, 1)  # padding
        hdr.w(0, 1)  # private
        if channels == 1:
            hdr.w(3, 2)
            hdr.w(0, 2)
        elif ms_stereo or intensity:
            hdr.w(1, 2)  # joint stereo
            hdr.w((int(ms_stereo) << 1) | int(intensity), 2)
        else:
            hdr.w(0, 2)
            hdr.w(0, 2)
        hdr.w(0, 1)  # copyright
        hdr.w(0, 1)  # original
        hdr.w(0, 2)  # emphasis
        si = BitWriter()
        mdb, fields = side_infos[fi]
        if mpeg1:
            si.w(mdb, 9)
            si.w(0, 5 if channels == 1 else 3)
            for ch in range(channels):
                for b in scfsi[ch]:
                    si.w(b, 1)
        else:
            si.w(mdb, 8)
            si.w(0, 1 if channels == 1 else 2)
        for gr in range(n_gr):
            for ch in range(channels):
                f = fields[gr][ch]
                si.w(f["part2_3_length"], 12)
                si.w(f["big_values"], 9)
                si.w(f["global_gain"], 8)
                si.w(f["scalefac_compress"], 4 if mpeg1 else 9)
                if f["block_type"] != 0:
                    si.w(1, 1)  # window switching
                    si.w(f["block_type"], 2)
                    si.w(f.get("mixed", 0), 1)
                    for t in f["table_select"][:2]:
                        si.w(t, 5)
                    for sb in f["subblock_gain"]:
                        si.w(sb, 3)
                else:
                    si.w(0, 1)
                    for t in f["table_select"][:3]:
                        si.w(t, 5)
                    si.w(f["region0_count"], 4)
                    si.w(f["region1_count"], 3)
                if mpeg1:
                    si.w(f["preflag"], 1)
                si.w(f["scalefac_scale"], 1)
                si.w(f["count1table_select"], 1)
        si.pad_to_byte()
        sib = si.bytes()
        assert len(sib) == si_len, (len(sib), si_len)
        body = stream[fi * region : (fi + 1) * region]
        out += hdr.bytes() + sib + body
    return bytes(out)


# ------------------------------------------------- reconstruction model


def _model_requantize(g: dict, rate: int) -> np.ndarray:
    vals = np.array(g["is"], np.float64)
    sign = np.sign(vals) + (vals == 0)
    mag = np.abs(vals) ** (4.0 / 3.0)
    gain = 0.25 * (g.get("global_gain", 210) - 210)
    scale = 0.5 * (1 + g.get("scalefac_scale", 0))
    exp = np.zeros(576)
    if g.get("block_type", 0) == 2:
        sb = M.SFB_SHORT[rate]
        sfs = g.get("scalefac_short") or [[0] * 13 for _ in range(3)]
        first_short = 0
        if g.get("mixed"):
            first_short = 3
            lb = M.SFB_LONG[rate]
            sfl = g.get("scalefac_long") or [0] * 22
            for band in range(8):
                s_ = sfl[band] + (M.PRETAB[band] if g.get("preflag", 0) else 0)
                exp[lb[band] : lb[band + 1]] = gain - scale * s_
        for band in range(first_short, 13):
            lo, hi = sb[band], sb[band + 1]
            wlen = hi - lo
            for w in range(3):
                s = 3 * lo + w * wlen
                exp[s : s + wlen] = (
                    gain - 2.0 * g.get("subblock_gain", [0, 0, 0])[w]
                    - scale * sfs[w][band]
                )
    else:
        lb = M.SFB_LONG[rate]
        sfl = g.get("scalefac_long") or [0] * 22
        for band in range(22):
            s = sfl[band] + (M.PRETAB[band] if g.get("preflag", 0) else 0)
            exp[lb[band] : lb[band + 1]] = gain - scale * s
    return sign * mag * np.exp2(exp)


def _model_reorder(xr: np.ndarray, rate: int, first_band: int = 0) -> np.ndarray:
    sb = M.SFB_SHORT[rate]
    out = xr.copy()
    for band in range(first_band, 13):
        lo, hi = sb[band], sb[band + 1]
        wlen = hi - lo
        base = 3 * lo
        seg = xr[base : base + 3 * wlen]
        for w in range(3):
            for line in range(wlen):
                out[base + 3 * line + w] = seg[w * wlen + line]
    return out


def _model_alias(xr: np.ndarray, n_bounds: int = 31) -> np.ndarray:
    out = xr.copy()
    for sbnd in range(1, 1 + n_bounds):
        p = 18 * sbnd
        for i in range(8):
            a, b = out[p - 1 - i], out[p + i]
            out[p - 1 - i] = a * M.ALIAS_CS[i] - b * M.ALIAS_CA[i]
            out[p + i] = b * M.ALIAS_CS[i] + a * M.ALIAS_CA[i]
    return out


def _model_imdct36(X: np.ndarray, block_type: int) -> np.ndarray:
    n = 36
    out = np.zeros(n)
    for t in range(n):
        out[t] = sum(
            X[k] * np.cos(np.pi / 72 * (2 * t + 1 + 18) * (2 * k + 1))
            for k in range(18)
        )
    if block_type == 0:
        win = [np.sin(np.pi / 36 * (t + 0.5)) for t in range(36)]
    elif block_type == 1:
        win = [np.sin(np.pi / 36 * (t + 0.5)) for t in range(18)]
        win += [1.0] * 6
        win += [np.sin(np.pi / 12 * (t - 18 + 0.5)) for t in range(24, 30)]
        win += [0.0] * 6
    elif block_type == 3:
        win = [0.0] * 6
        win += [np.sin(np.pi / 12 * (t - 6 + 0.5)) for t in range(6, 12)]
        win += [1.0] * 6
        win += [np.sin(np.pi / 36 * (t + 0.5)) for t in range(18, 36)]
    return out * np.array(win)


def _model_imdct_short(X: np.ndarray) -> np.ndarray:
    z = np.zeros(36)
    for w in range(3):
        xw = X[w::3]
        y = np.array([
            sum(xw[k] * np.cos(np.pi / 24 * (2 * t + 1 + 6) * (2 * k + 1))
                for k in range(6))
            for t in range(12)
        ])
        y *= np.array([np.sin(np.pi / 12 * (t + 0.5)) for t in range(12)])
        z[6 + 6 * w : 18 + 6 * w] += y
    return z


class ModelSynth:
    def __init__(self) -> None:
        self.v = np.zeros(1024)

    def run(self, bands: np.ndarray) -> np.ndarray:
        out = np.empty(576)
        for ss in range(18):
            self.v = np.concatenate([np.zeros(64), self.v[:-64]])
            for i in range(64):
                self.v[i] = sum(
                    np.cos((16 + i) * (2 * k + 1) * np.pi / 64) * bands[k, ss]
                    for k in range(32)
                )
            u = np.zeros(512)
            for i in range(8):
                u[64 * i : 64 * i + 32] = self.v[128 * i : 128 * i + 32]
                u[64 * i + 32 : 64 * i + 64] = self.v[128 * i + 96 : 128 * i + 128]
            w = u * np.asarray(M.SYNTH_WINDOW_D)
            for j in range(32):
                out[32 * ss + j] = sum(w[j + 32 * i] for i in range(16))
        return out


def _model_stereo(xrs, grs_gr, rate, ms_stereo, intensity):
    """Model joint-stereo processing — independent mirror of the spec
    rules (MS full-spectrum; intensity on long-block bands at/above
    the right channel's decoded extent, is_pos panning, 7 = illegal)."""
    L, R = xrs
    inv = 1.0 / np.sqrt(2.0)
    if not intensity:
        if ms_stereo:
            return [(L + R) * inv, (L - R) * inv]
        return xrs
    g_r = grs_gr[1]
    zero_bound = decoded_extent(g_r)
    out_l, out_r = L.copy(), R.copy()
    if g_r.get("block_type", 0) == 2:
        # short blocks: per (window, band) segments in pre-reorder
        # order; a segment wholly at/above the right channel's decoded
        # extent is intensity-coded with that window's scalefactor
        sb = M.SFB_SHORT[rate]
        sfs_r = g_r.get("scalefac_short") or [[0] * 13 for _ in range(3)]
        for band in range(13):
            lo, hi = sb[band], sb[band + 1]
            width = hi - lo
            for w in range(3):
                s = 3 * lo + w * width
                e = s + width
                if s >= zero_bound:
                    is_pos = sfs_r[w][band]
                    if is_pos == 7:
                        if ms_stereo:
                            out_l[s:e] = (L[s:e] + R[s:e]) * inv
                            out_r[s:e] = (L[s:e] - R[s:e]) * inv
                        continue
                    if is_pos == 6:
                        out_l[s:e] = L[s:e]
                        out_r[s:e] = 0.0
                    else:
                        ratio = np.tan(is_pos * np.pi / 12.0)
                        out_l[s:e] = L[s:e] * (ratio / (1.0 + ratio))
                        out_r[s:e] = L[s:e] * (1.0 / (1.0 + ratio))
                elif ms_stereo:
                    out_l[s:e] = (L[s:e] + R[s:e]) * inv
                    out_r[s:e] = (L[s:e] - R[s:e]) * inv
        return [out_l, out_r]
    lb = M.SFB_LONG[rate]
    sfl_r = g_r.get("scalefac_long") or [0] * 22
    for sfb in range(22):
        lo, hi = lb[sfb], lb[sfb + 1]
        if lo >= zero_bound:
            is_pos = sfl_r[sfb]
            if is_pos == 7:
                if ms_stereo:
                    out_l[lo:hi] = (L[lo:hi] + R[lo:hi]) * inv
                    out_r[lo:hi] = (L[lo:hi] - R[lo:hi]) * inv
                continue
            if is_pos == 6:
                out_l[lo:hi] = L[lo:hi]
                out_r[lo:hi] = 0.0
            else:
                ratio = np.tan(is_pos * np.pi / 12.0)
                out_l[lo:hi] = L[lo:hi] * (ratio / (1.0 + ratio))
                out_r[lo:hi] = L[lo:hi] * (1.0 / (1.0 + ratio))
        elif ms_stereo:
            out_l[lo:hi] = (L[lo:hi] + R[lo:hi]) * inv
            out_r[lo:hi] = (L[lo:hi] - R[lo:hi]) * inv
    return [out_l, out_r]


def expected_pcm(frames: list, rate: int = 48000, channels: int = 1,
                 ms_stereo: bool = False,
                 intensity: bool = False) -> np.ndarray:
    """Expected float PCM (n, channels) for the exact stream
    ``encode_mp3(frames, ...)`` produces."""
    overlap = [np.zeros((32, 18)) for _ in range(channels)]
    synths = [ModelSynth() for _ in range(channels)]
    chunks = []
    for grs in frames:
        for gr in range(len(grs)):
            xrs = [
                _model_requantize(grs[gr][ch], rate) for ch in range(channels)
            ]
            if channels == 2:
                xrs = _model_stereo(xrs, grs[gr], rate, ms_stereo, intensity)
            outs = []
            for ch in range(channels):
                g = grs[gr][ch]
                xr = xrs[ch]
                if g.get("block_type", 0) == 2:
                    if g.get("mixed"):
                        xr = _model_alias(_model_reorder(xr, rate, 3), 1)
                    else:
                        xr = _model_reorder(xr, rate)
                else:
                    xr = _model_alias(xr)
                bands = np.empty((32, 18))
                for sbnd in range(32):
                    X = xr[18 * sbnd : 18 * sbnd + 18]
                    if g.get("block_type", 0) == 2 and not (
                        g.get("mixed") and sbnd < 2
                    ):
                        block = _model_imdct_short(X)
                    else:
                        bt = 0 if (g.get("mixed") and sbnd < 2) else g.get("block_type", 0)
                        block = _model_imdct36(X, bt)
                    bands[sbnd] = block[:18] + overlap[ch][sbnd]
                    overlap[ch][sbnd] = block[18:]
                for sbnd in range(1, 32, 2):
                    for t in range(1, 18, 2):
                        bands[sbnd, t] = -bands[sbnd, t]
                outs.append(synths[ch].run(bands))
            chunks.append(np.stack(outs, axis=1))
    return np.concatenate(chunks, axis=0)
