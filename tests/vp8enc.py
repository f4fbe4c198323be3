"""Test-side VP8 keyframe encoder — an independent spec model.

Produces RFC 6386 keyframe bitstreams AND the bit-exact expected
reconstruction (prediction + quantized residual + optional loop
filter), so tests assert ``decode(encode(img)) == expected`` the same
way ``tests/test_jpeg_decode.py`` does for lossy JPEG: the expected
image replays the encoder's own reconstruction model, written
independently of the decoder (numpy/vectorized here vs the decoder's
scalar loops) so a shared bug cannot hide.

The boolean encoder is exact interval arithmetic over a Python bigint:
after N renormalization shifts the valid bitstreams are precisely the
(N+16)-bit integers in [low, low + (range << 8)); emitting ``low``
left-aligned is therefore a valid stream by construction for the §7.3
decoder — no carry bookkeeping to get subtly wrong.
"""

from __future__ import annotations

import numpy as np

from rustcheatersdatapipeline_spark.functions import vp8 as V

# --------------------------------------------------------------- bool enc


class BoolEncoder:
    def __init__(self) -> None:
        self.low = 0
        self.range_ = 255
        self.shifts = 0

    def write_bool(self, prob: int, bit: int) -> None:
        split = 1 + (((self.range_ - 1) * prob) >> 8)
        if bit:
            self.low += split << 8
            self.range_ -= split
        else:
            self.range_ = split
        while self.range_ < 128:
            self.low <<= 1
            self.range_ <<= 1
            self.shifts += 1

    def write_literal(self, bits: int, value: int) -> None:
        for i in range(bits - 1, -1, -1):
            self.write_bool(128, (value >> i) & 1)

    def write_signed(self, bits: int, value: int) -> None:
        self.write_literal(bits, abs(value))
        self.write_bool(128, 1 if value < 0 else 0)

    def write_flagged_signed(self, bits: int, value: int) -> None:
        if value == 0:
            self.write_bool(128, 0)
        else:
            self.write_bool(128, 1)
            self.write_signed(bits, value)

    def write_tree(self, tree, probs, value: int, start: int = 0) -> None:
        for pi, bit in _tree_path(tree, value, start):
            self.write_bool(probs[pi], bit)

    def to_bytes(self) -> bytes:
        nbits = self.shifts + 16
        assert self.low < (1 << nbits)
        nbytes = (nbits + 7) // 8
        return (self.low << (8 * nbytes - nbits)).to_bytes(nbytes, "big")


def _tree_path(tree, value: int, start: int = 0):
    """(prob_index, bit) path from ``start`` to leaf ``-value``."""
    stack = [(start, [])]
    while stack:
        i, path = stack.pop()
        for b in (0, 1):
            j = tree[i + b]
            step = path + [(i >> 1, b)]
            if j <= 0:
                if -j == value:
                    return step
            else:
                stack.append((j, step))
    raise KeyError(f"value {value} not in tree")


# ------------------------------------------------------------- transforms


def fdct4x4(block: np.ndarray) -> np.ndarray:
    """Integer forward DCT matching the inverse's scaling conventions."""
    b = block.astype(np.int64)
    t = np.zeros((4, 4), np.int64)
    for r in range(4):
        i0, i1, i2, i3 = b[r]
        a1, b1 = (i0 + i3) * 8, (i1 + i2) * 8
        c1, d1 = (i1 - i2) * 8, (i0 - i3) * 8
        t[r, 0] = a1 + b1
        t[r, 2] = a1 - b1
        t[r, 1] = (c1 * 2217 + d1 * 5352 + 14500) >> 12
        t[r, 3] = (d1 * 2217 - c1 * 5352 + 7500) >> 12
    o = np.zeros((4, 4), np.int64)
    for c in range(4):
        i0, i1, i2, i3 = t[:, c]
        a1, b1 = i0 + i3, i1 + i2
        c1, d1 = i1 - i2, i0 - i3
        o[0, c] = (a1 + b1 + 7) >> 4
        o[2, c] = (a1 - b1 + 7) >> 4
        o[1, c] = ((c1 * 2217 + d1 * 5352 + 12000) >> 16) + (1 if d1 else 0)
        o[3, c] = (d1 * 2217 - c1 * 5352 + 51000) >> 16
    return o


_WHT_M = np.array(
    [[1, 1, 1, 1], [1, 1, -1, -1], [1, -1, -1, 1], [1, -1, 1, -1]], np.int64
)


def fwht4x4(dcs: np.ndarray) -> np.ndarray:
    """Forward Walsh-Hadamard for the Y2 block (encoder's free choice of
    scaling; reconstruction is simulated through the exact inverse)."""
    x = _WHT_M @ dcs.astype(np.int64) @ _WHT_M
    return (x + 8) >> 4


def iwht4x4_np(block: np.ndarray) -> np.ndarray:
    """Independent vectorized inverse WHT (same math as §14.2)."""
    b = block.astype(np.int64)
    t = np.zeros((4, 4), np.int64)
    t[0] = b[0] + b[3] + (b[1] + b[2])
    t[1] = (b[1] - b[2]) + (b[0] - b[3])
    t[2] = (b[0] + b[3]) - (b[1] + b[2])
    t[3] = (b[0] - b[3]) - (b[1] - b[2])
    o = np.zeros((4, 4), np.int64)
    a1, b1 = t[:, 0] + t[:, 3], t[:, 1] + t[:, 2]
    c1, d1 = t[:, 1] - t[:, 2], t[:, 0] - t[:, 3]
    o[:, 0] = (a1 + b1 + 3) >> 3
    o[:, 1] = (c1 + d1 + 3) >> 3
    o[:, 2] = (a1 - b1 + 3) >> 3
    o[:, 3] = (d1 - c1 + 3) >> 3
    return o


def idct4x4_np(block: np.ndarray) -> np.ndarray:
    """Independent vectorized inverse DCT (same math as §14.3)."""
    b = block.astype(np.int64)

    def butterfly(i0, i1, i2, i3):
        a1, b1 = i0 + i2, i0 - i2
        c1 = ((i1 * V.SINPI8SQRT2) >> 16) - (i3 + ((i3 * V.COSPI8SQRT2MINUS1) >> 16))
        d1 = (i1 + ((i1 * V.COSPI8SQRT2MINUS1) >> 16)) + ((i3 * V.SINPI8SQRT2) >> 16)
        return a1 + d1, b1 + c1, b1 - c1, a1 - d1

    t = np.zeros((4, 4), np.int64)
    t[0], t[1], t[2], t[3] = butterfly(b[0], b[1], b[2], b[3])
    o = np.zeros((4, 4), np.int64)
    o0, o1, o2, o3 = butterfly(t[:, 0], t[:, 1], t[:, 2], t[:, 3])
    o[:, 0] = (o0 + 4) >> 3
    o[:, 1] = (o1 + 4) >> 3
    o[:, 2] = (o2 + 4) >> 3
    o[:, 3] = (o3 + 4) >> 3
    return o


def quantize(coeffs: np.ndarray, dc_q: int, ac_q: int) -> np.ndarray:
    q = np.full((4, 4), ac_q, np.int64)
    q[0, 0] = dc_q
    c = coeffs.astype(np.int64)
    return np.sign(c) * (np.abs(c) // q)


# -------------------------------------------------------------- predictors
# Independent implementations of §12 (vectorized / table-driven, vs the
# decoder's scalar form).


def _pred_16_8(canvas, y0, x0, size, mode, have_above, have_left):
    above = canvas[y0 - 1, x0 : x0 + size].astype(np.int64)
    left = canvas[y0 : y0 + size, x0 - 1].astype(np.int64)
    al = int(canvas[y0 - 1, x0 - 1])
    if mode == V.DC_PRED:
        if have_above and have_left:
            dc = (int(above.sum() + left.sum()) + size) >> (5 if size == 16 else 4)
        elif have_above:
            dc = (int(above.sum()) + size // 2) >> (4 if size == 16 else 3)
        elif have_left:
            dc = (int(left.sum()) + size // 2) >> (4 if size == 16 else 3)
        else:
            dc = 128
        return np.full((size, size), dc, np.int64)
    if mode == V.V_PRED:
        return np.broadcast_to(above, (size, size)).copy()
    if mode == V.H_PRED:
        return np.broadcast_to(left[:, None], (size, size)).copy()
    return np.clip(left[:, None] + above[None, :] - al, 0, 255)


def _a2(x, y):
    return (x + y + 1) >> 1


def _a3(x, y, z):
    return (x + 2 * y + z + 2) >> 2


def _pred_b4(canvas, y0, x0, mode, tr) -> np.ndarray:
    A = np.concatenate(
        [canvas[y0 - 1, x0 : x0 + 4].astype(np.int64), np.asarray(tr, np.int64)]
    )
    L = canvas[y0 : y0 + 4, x0 - 1].astype(np.int64)
    P = int(canvas[y0 - 1, x0 - 1])
    o = np.zeros((4, 4), np.int64)
    if mode == V.B_DC_PRED:
        o[:] = (int(A[:4].sum() + L.sum()) + 4) >> 3
    elif mode == V.B_TM_PRED:
        o[:] = np.clip(L[:, None] + A[None, :4] - P, 0, 255)
    elif mode == V.B_VE_PRED:
        e = np.concatenate([[P], A[:5]])
        o[:] = _a3(e[:4], e[1:5], e[2:6])
    elif mode == V.B_HE_PRED:
        e = np.concatenate([[P], L])
        col = np.array(
            [_a3(e[0], e[1], e[2]), _a3(e[1], e[2], e[3]),
             _a3(e[2], e[3], e[4]), _a3(L[2], L[3], L[3])]
        )
        o[:] = col[:, None]
    elif mode == V.B_LD_PRED:
        d = np.array([_a3(A[i], A[i + 1], A[i + 2]) for i in range(6)]
                     + [_a3(A[6], A[7], A[7])])
        idx = np.arange(4)[:, None] + np.arange(4)[None, :]
        o[:] = d[idx]
    elif mode == V.B_RD_PRED:
        E = np.array([L[3], L[2], L[1], L[0], P, A[0], A[1], A[2], A[3]], np.int64)
        d = _a3(E[:-2], E[1:-1], E[2:])  # diagonal values for d = 1..7
        idx = 4 + np.arange(4)[None, :] - np.arange(4)[:, None] - 1
        o[:] = d[idx]
    elif mode == V.B_VR_PRED:
        r0 = [_a2(P, A[0]), _a2(A[0], A[1]), _a2(A[1], A[2]), _a2(A[2], A[3])]
        r1 = [_a3(L[0], P, A[0]), _a3(P, A[0], A[1]),
              _a3(A[0], A[1], A[2]), _a3(A[1], A[2], A[3])]
        o[0] = r0
        o[1] = r1
        o[2] = [_a3(L[1], L[0], P)] + r0[:3]
        o[3] = [_a3(L[2], L[1], L[0])] + r1[:3]
    elif mode == V.B_VL_PRED:
        r0 = [_a2(A[i], A[i + 1]) for i in range(4)]
        r1 = [_a3(A[i], A[i + 1], A[i + 2]) for i in range(4)]
        o[0] = r0
        o[1] = r1
        o[2] = r0[1:] + [_a3(A[4], A[5], A[6])]
        o[3] = r1[1:] + [_a3(A[5], A[6], A[7])]
    elif mode == V.B_HD_PRED:
        pp = np.array([L[3], L[2], L[1], L[0], P, A[0], A[1], A[2]], np.int64)
        e2 = [_a2(pp[i], pp[i + 1]) for i in range(4)]
        e3 = [_a3(pp[i], pp[i + 1], pp[i + 2]) for i in range(6)]
        o[3] = [e2[0], e3[0], e2[1], e3[1]]
        o[2] = [e2[1], e3[1], e2[2], e3[2]]
        o[1] = [e2[2], e3[2], e2[3], e3[3]]
        o[0] = [e2[3], e3[3], e3[4], e3[5]]
    elif mode == V.B_HU_PRED:
        o[0] = [_a2(L[0], L[1]), _a3(L[0], L[1], L[2]),
                _a2(L[1], L[2]), _a3(L[1], L[2], L[3])]
        o[1] = [o[0][2], o[0][3], _a2(L[2], L[3]), _a3(L[2], L[3], L[3])]
        o[2] = [o[1][2], o[1][3], L[3], L[3]]
        o[3] = L[3]
    else:
        raise ValueError(mode)
    return o


# ---------------------------------------------------------- loop filter model
# Vectorized (edge-at-a-time) deblock model vs the decoder's scalar
# per-pixel loops — independent implementation of §15.


def _vc(a):
    return np.clip(a, -128, 127)


def _lf_common(p1, p0, q0, q1, outer_mask):
    a = _vc(np.where(outer_mask, _vc(p1 - q1), 0) + 3 * (q0 - p0))
    f = _vc(a + 4) >> 3
    e = _vc(a + 3) >> 3
    return _vc(q0 - f), _vc(p0 + e), f


def _lf_apply_edge(cols, kind, hev_t, interior, edge_lim):
    """cols: (n, 8) int32 signed view [p3..q3] straddling one edge."""
    p3, p2, p1, p0 = cols[:, 0], cols[:, 1], cols[:, 2], cols[:, 3]
    q0, q1, q2, q3 = cols[:, 4], cols[:, 5], cols[:, 6], cols[:, 7]
    base = np.abs(p0 - q0) * 2 + np.abs(p1 - q1) // 2 <= edge_lim
    if kind == "simple":
        nq0, np0, _ = _lf_common(p1, p0, q0, q1, np.ones_like(base))
        cols[:, 4] = np.where(base, nq0, q0)
        cols[:, 3] = np.where(base, np0, p0)
        return
    ok = (
        base
        & (np.abs(p3 - p2) <= interior)
        & (np.abs(p2 - p1) <= interior)
        & (np.abs(p1 - p0) <= interior)
        & (np.abs(q1 - q0) <= interior)
        & (np.abs(q2 - q1) <= interior)
        & (np.abs(q3 - q2) <= interior)
    )
    hev = (np.abs(p1 - p0) > hev_t) | (np.abs(q1 - q0) > hev_t)
    if kind == "sub":
        nq0, np0, f = _lf_common(p1, p0, q0, q1, hev)
        a2_ = (f + 1) >> 1
        nq1 = np.where(hev, q1, _vc(q1 - a2_))
        np1 = np.where(hev, p1, _vc(p1 + a2_))
        cols[:, 4] = np.where(ok, nq0, q0)
        cols[:, 3] = np.where(ok, np0, p0)
        cols[:, 5] = np.where(ok, nq1, q1)
        cols[:, 2] = np.where(ok, np1, p1)
        return
    # MB edge, normal filter
    hq0, hp0, _ = _lf_common(p1, p0, q0, q1, np.ones_like(hev))
    w = _vc(_vc(p1 - q1) + 3 * (q0 - p0))
    a27 = _vc((27 * w + 63) >> 7)
    a18 = _vc((18 * w + 63) >> 7)
    a9 = _vc((9 * w + 63) >> 7)
    nq0 = np.where(hev, hq0, _vc(q0 - a27))
    np0 = np.where(hev, hp0, _vc(p0 + a27))
    nq1 = np.where(hev, q1, _vc(q1 - a18))
    np1 = np.where(hev, p1, _vc(p1 + a18))
    nq2 = np.where(hev, q2, _vc(q2 - a9))
    np2 = np.where(hev, p2, _vc(p2 + a9))
    cols[:, 4] = np.where(ok, nq0, q0)
    cols[:, 3] = np.where(ok, np0, p0)
    cols[:, 5] = np.where(ok, nq1, q1)
    cols[:, 2] = np.where(ok, np1, p1)
    cols[:, 6] = np.where(ok, nq2, q2)
    cols[:, 1] = np.where(ok, np2, p2)


def _lf_plane_mb(plane, my, mx, bsize, level, sharpness, simple,
                 edge_x, edge_y, internal, keyframe=True):
    interior, hev_t, mb_lim, sub_lim = V._filter_limits(
        level, sharpness, keyframe
    )
    by, bx = my * bsize, mx * bsize
    mb_kind = "simple" if simple else "mb"
    sub_kind = "simple" if simple else "sub"
    if edge_x:
        seg = plane[by : by + bsize, bx - 4 : bx + 4]
        _lf_apply_edge(seg, mb_kind, hev_t, interior, mb_lim)
    if internal:
        for x in range(bx + 4, bx + bsize, 4):
            seg = plane[by : by + bsize, x - 4 : x + 4]
            _lf_apply_edge(seg, sub_kind, hev_t, interior, sub_lim)
    if edge_y:
        seg = plane[by - 4 : by + 4, bx : bx + bsize].T.copy()
        _lf_apply_edge(seg, mb_kind, hev_t, interior, mb_lim)
        plane[by - 4 : by + 4, bx : bx + bsize] = seg.T
    if internal:
        for yy in range(by + 4, by + bsize, 4):
            seg = plane[yy - 4 : yy + 4, bx : bx + bsize].T.copy()
            _lf_apply_edge(seg, sub_kind, hev_t, interior, sub_lim)
            plane[yy - 4 : yy + 4, bx : bx + bsize] = seg.T


def model_loop_filter(y, u, v, mb_meta, hdr, keyframe=True):
    """Expected-side deblock over full (padded) planes. ``mb_meta`` is a
    2-D list of dicts with ymode/segment/has_coeffs (plus ref/mode for
    interframe MBs)."""
    seg = hdr["segmentation"]
    lfd = hdr.get("lf_delta", {"enabled": 0})
    simple = hdr["filter_type"] == 1
    ys = y.astype(np.int32) - 128
    us = u.astype(np.int32) - 128
    vs = v.astype(np.int32) - 128
    for my, row in enumerate(mb_meta):
        for mx, mb in enumerate(row):
            level = hdr["filter_level"]
            if seg["enabled"]:
                sv = seg["lf"][mb["segment"]]
                level = sv if seg["abs_values"] else level + sv
            mode = mb.get("mode", mb["ymode"])
            if lfd["enabled"]:
                ref = mb.get("ref", V.REF_INTRA)
                level += lfd["ref"][ref]
                if ref == V.REF_INTRA:
                    if mode == V.B_PRED:
                        level += lfd["mode"][0]
                elif mode == V.ZEROMV:
                    level += lfd["mode"][1]
                elif mode == V.SPLITMV:
                    level += lfd["mode"][3]
                else:
                    level += lfd["mode"][2]
            level = min(63, max(0, level))
            if level == 0:
                continue
            internal = mode in (V.B_PRED, V.SPLITMV) or mb["has_coeffs"]
            args = (level, hdr["sharpness"], simple, mx > 0, my > 0, internal,
                    keyframe)
            _lf_plane_mb(ys, my, mx, 16, *args)
            if not simple:
                _lf_plane_mb(us, my, mx, 8, *args)
                _lf_plane_mb(vs, my, mx, 8, *args)
    c8 = lambda a: np.clip(a + 128, 0, 255).astype(np.uint8)  # noqa: E731
    return c8(ys), c8(us), c8(vs)


# --------------------------------------------------------------- encoder


def _pad_to_mb(plane, mb_mult):
    h, w = plane.shape
    H = (h + mb_mult - 1) // mb_mult * mb_mult
    W = (w + mb_mult - 1) // mb_mult * mb_mult
    return np.pad(plane, ((0, H - h), (0, W - w)), mode="edge")


def _enc_canvas(h, w):
    can = np.empty((h + 1, w + 9), np.int64)
    can[0, :] = 127
    can[1:, 0] = 129
    can[1:, 1 + w :] = 127
    return can


def _token_value(e, probs, qval, prev_zero):
    """Write one coefficient token (+extra bits, sign)."""
    start = 2 if prev_zero else 0
    a = abs(qval)
    if a <= 4:
        tok = a  # DCT_0..DCT_4
    elif a <= 6:
        tok = V.DCT_CAT1
    elif a <= 10:
        tok = V.DCT_CAT2
    elif a <= 18:
        tok = V.DCT_CAT3
    elif a <= 34:
        tok = V.DCT_CAT4
    elif a <= 66:
        tok = V.DCT_CAT5
    else:
        tok = V.DCT_CAT6
    e.write_tree(V.COEFF_TREE, probs, tok, start)
    if tok >= V.DCT_CAT1:
        cat = tok - V.DCT_CAT1
        extra = a - V.CAT_BASE[cat]
        cp = V.CAT_PROBS[cat]
        for i, p in enumerate(cp):
            e.write_bool(p, (extra >> (len(cp) - 1 - i)) & 1)
    if a != 0:
        e.write_bool(128, 1 if qval < 0 else 0)


def _write_block_tokens(e, probs_bt, ctx, first, zz_coeffs):
    """zz_coeffs: 16 quantized ints in ZIGZAG order. Returns nonzero."""
    last_nz = -1
    for i in range(15, first - 1, -1):
        if zz_coeffs[i]:
            last_nz = i
            break
    if last_nz < first:
        # empty block: a lone EOB (never follows a zero token)
        e.write_tree(V.COEFF_TREE, probs_bt[V.COEFF_BANDS[first]][ctx], V.DCT_EOB)
        return False
    prev_zero = False
    c = first
    while c <= last_nz:
        probs = probs_bt[V.COEFF_BANDS[c]][ctx]
        qv = zz_coeffs[c]
        _token_value(e, probs, qv, prev_zero)
        prev_zero = qv == 0
        ctx = 0 if qv == 0 else (1 if abs(qv) == 1 else 2)
        c += 1
    if c < 16:
        e.write_tree(V.COEFF_TREE, probs_bt[V.COEFF_BANDS[c]][ctx], V.DCT_EOB)
    return True


def _zigzag_of(mat: np.ndarray) -> list:
    flat = mat.reshape(-1)
    return [int(flat[V.ZIGZAG[i]]) for i in range(16)]


def encode_vp8(
    y: np.ndarray,
    u: np.ndarray,
    v: np.ndarray,
    *,
    q_index: int = 8,
    q_deltas: dict | None = None,
    ymodes=None,
    bmodes=None,
    uvmodes=None,
    filter_level: int = 0,
    filter_type: int = 0,
    sharpness: int = 0,
    n_partitions: int = 1,
    mb_no_skip: int = 1,
    prob_skip_false: int = 200,
    explicit_probs=None,
    segmentation: dict | None = None,
    kf_bmode_probs=None,
):
    """Encode planes (uint8; u/v are half-size) as a VP8 keyframe.

    ``ymodes``/``uvmodes``: (mb_h, mb_w) arrays of mode ids (default all
    DC_PRED); ``bmodes``: dict {(my,mx): [16 submodes]} for B_PRED MBs.
    ``explicit_probs``: 4x8x3x11 coefficient probabilities the STREAM
    should use; transmitted as sparse per-entry updates relative to the
    RFC §13.5 defaults under the §13.4 flag probabilities — the exact
    header path a real encoder takes (an entry equal to the default
    costs one flag bit; a differing entry costs flag + 8-bit literal).
    ``segmentation``: {"abs": 0/1, "quant": [4], "lf": [4],
    "map": (mb_h, mb_w) ids, "tree_probs": [3]}.

    Returns (payload_bytes, expected) where expected = dict of cropped
    uint8 y/u/v planes from the encoder's own reconstruction model.
    """
    h, w = y.shape
    assert u.shape == v.shape == ((h + 1) // 2, (w + 1) // 2)
    mb_w, mb_h = (w + 15) // 16, (h + 15) // 16
    yp = _pad_to_mb(y, 16).astype(np.int64)
    up = _pad_to_mb(u, 8).astype(np.int64)
    vp = _pad_to_mb(v, 8).astype(np.int64)
    if ymodes is None:
        ymodes = np.full((mb_h, mb_w), V.DC_PRED, int)
    if uvmodes is None:
        uvmodes = np.full((mb_h, mb_w), V.DC_PRED, int)
    bmodes = bmodes or {}
    seg = segmentation
    probs = explicit_probs if explicit_probs is not None else V.DEFAULT_COEFF_PROBS

    # quantizers per segment
    q_deltas = q_deltas or {}
    quants = []
    for s in range(4):
        qi = q_index
        if seg:
            qi = seg["quant"][s] if seg.get("abs") else qi + seg["quant"][s]
        quants.append(V.dequant_factors(qi, q_deltas))

    # ---- model pass: reconstruct + collect quantized tokens per MB
    y_can = _enc_canvas(mb_h * 16, mb_w * 16)
    u_can = _enc_canvas(mb_h * 8, mb_w * 8)
    v_can = _enc_canvas(mb_h * 8, mb_w * 8)
    mb_data = []  # [my][mx] -> dict
    for my in range(mb_h):
        row = []
        for mx in range(mb_w):
            sid = int(seg["map"][my][mx]) if seg else 0
            quant = quants[sid]
            ym = int(ymodes[my][mx])
            uvm = int(uvmodes[my][mx])
            by, bx = my * 16 + 1, mx * 16 + 1
            have_a, have_l = my > 0, mx > 0
            has_y2 = ym != V.B_PRED
            y_tokens = []
            if has_y2:
                pred = _pred_16_8(y_can, by, bx, 16, ym, have_a, have_l)
                raw = np.zeros((16, 4, 4), np.int64)
                dcs = np.zeros((4, 4), np.int64)
                for sb in range(16):
                    r, c = sb >> 2, sb & 3
                    res = (
                        yp[my * 16 + 4 * r : my * 16 + 4 * r + 4,
                           mx * 16 + 4 * c : mx * 16 + 4 * c + 4]
                        - pred[4 * r : 4 * r + 4, 4 * c : 4 * c + 4]
                    )
                    raw[sb] = fdct4x4(res)
                    dcs[r, c] = raw[sb][0, 0]
                qy2 = quantize(fwht4x4(dcs), quant["y2"][0], quant["y2"][1])
                y2_tokens = _zigzag_of(qy2)
                # decoded DCs: dequant y2 -> iwht
                dq2 = qy2 * np.where(
                    np.arange(16).reshape(4, 4) == 0, quant["y2"][0], quant["y2"][1]
                )
                dec_dcs = iwht4x4_np(dq2)
                for sb in range(16):
                    r, c = sb >> 2, sb & 3
                    qb = quantize(raw[sb], 1, quant["y"][1])  # DC replaced below
                    qb[0, 0] = 0
                    y_tokens.append(_zigzag_of(qb))
                    deq = qb * quant["y"][1]
                    deq[0, 0] = dec_dcs[r, c]
                    rec = pred[4 * r : 4 * r + 4, 4 * c : 4 * c + 4] + idct4x4_np(deq)
                    y_can[by + 4 * r : by + 4 * r + 4, bx + 4 * c : bx + 4 * c + 4] = (
                        np.clip(rec, 0, 255)
                    )
            else:
                y2_tokens = None
                sub = bmodes.get((my, mx), [V.B_DC_PRED] * 16)
                mb_top = by - 1
                for sb in range(16):
                    r, c = sb >> 2, sb & 3
                    y0, x0 = by + 4 * r, bx + 4 * c
                    if c == 3 and r > 0:
                        tr = y_can[mb_top, bx + 16 : bx + 20]
                    else:
                        tr = y_can[y0 - 1, x0 + 4 : x0 + 8]
                    pred = _pred_b4(y_can, y0, x0, sub[sb], tr)
                    res = (
                        yp[my * 16 + 4 * r : my * 16 + 4 * r + 4,
                           mx * 16 + 4 * c : mx * 16 + 4 * c + 4]
                        - pred
                    )
                    qb = quantize(fdct4x4(res), quant["y"][0], quant["y"][1])
                    y_tokens.append(_zigzag_of(qb))
                    deq = qb * quant["y"][1]
                    deq[0, 0] = qb[0, 0] * quant["y"][0]
                    rec = pred + idct4x4_np(deq)
                    y_can[y0 : y0 + 4, x0 : x0 + 4] = np.clip(rec, 0, 255)
            cy, cx = my * 8 + 1, mx * 8 + 1
            uv_tokens = {"u": [], "v": []}
            for plane, src, can in (("u", up, u_can), ("v", vp, v_can)):
                pred = _pred_16_8(can, cy, cx, 8, uvm, have_a, have_l)
                for sb in range(4):
                    r, c = sb >> 1, sb & 1
                    res = (
                        src[my * 8 + 4 * r : my * 8 + 4 * r + 4,
                            mx * 8 + 4 * c : mx * 8 + 4 * c + 4]
                        - pred[4 * r : 4 * r + 4, 4 * c : 4 * c + 4]
                    )
                    qb = quantize(fdct4x4(res), quant["uv"][0], quant["uv"][1])
                    uv_tokens[plane].append(_zigzag_of(qb))
                    deq = qb * quant["uv"][1]
                    deq[0, 0] = qb[0, 0] * quant["uv"][0]
                    rec = pred[4 * r : 4 * r + 4, 4 * c : 4 * c + 4] + idct4x4_np(deq)
                    can[cy + 4 * r : cy + 4 * r + 4, cx + 4 * c : cx + 4 * c + 4] = (
                        np.clip(rec, 0, 255)
                    )
            all_zero = (
                (y2_tokens is None or not any(y2_tokens))
                and not any(any(t[1 if has_y2 else 0 :]) for t in y_tokens)
                and not any(any(t) for t in uv_tokens["u"])
                and not any(any(t) for t in uv_tokens["v"])
            )
            skip = 1 if (mb_no_skip and all_zero) else 0
            has_coeffs = not all_zero
            row.append(
                {
                    "segment": sid,
                    "skip": skip,
                    "ymode": ym,
                    "uvmode": uvm,
                    "bmodes": bmodes.get((my, mx)),
                    "y2": y2_tokens,
                    "y": y_tokens,
                    "u": uv_tokens["u"],
                    "v": uv_tokens["v"],
                    "has_coeffs": has_coeffs,
                }
            )
        mb_data.append(row)

    # ---- first partition: header + modes
    e = BoolEncoder()
    e.write_bool(128, 0)  # color_space
    e.write_bool(128, 0)  # clamping
    if seg:
        e.write_bool(128, 1)  # segmentation_enabled
        e.write_bool(128, 1)  # update_map
        e.write_bool(128, 1)  # update_data
        e.write_bool(128, 1 if seg.get("abs") else 0)
        for q in seg["quant"]:
            e.write_flagged_signed(7, q)
        for f in seg.get("lf", [0, 0, 0, 0]):
            e.write_flagged_signed(6, f)
        for p in seg.get("tree_probs", [128, 128, 128]):
            e.write_bool(128, 1)
            e.write_literal(8, p)
    else:
        e.write_bool(128, 0)
    e.write_bool(128, filter_type)
    e.write_literal(6, filter_level)
    e.write_literal(3, sharpness)
    e.write_bool(128, 0)  # lf delta disabled
    e.write_literal(2, {1: 0, 2: 1, 4: 2, 8: 3}[n_partitions])
    e.write_literal(7, q_index)
    q_deltas = q_deltas or {}
    for k in ("y1dc", "y2dc", "y2ac", "uvdc", "uvac"):
        e.write_flagged_signed(4, q_deltas.get(k, 0))
    e.write_bool(128, 1)  # refresh entropy
    for bt in range(4):
        for band in range(8):
            for ctx in range(3):
                for tok in range(11):
                    up_p = V.COEFF_UPDATE_PROBS[bt][band][ctx][tok]
                    pv = probs[bt][band][ctx][tok]
                    # update-relative-to-RFC path (§13.4): transmit an
                    # entry only where the stream's table differs from
                    # the §13.5 default — what real encoders emit
                    if pv != V.DEFAULT_COEFF_PROBS[bt][band][ctx][tok]:
                        e.write_bool(up_p, 1)
                        e.write_literal(8, pv)
                    else:
                        e.write_bool(up_p, 0)
    e.write_bool(128, mb_no_skip)
    if mb_no_skip:
        e.write_literal(8, prob_skip_false)

    bmp = kf_bmode_probs or V.KF_BMODE_PROBS
    above_b = [[V.B_DC_PRED] * 4 for _ in range(mb_w)]
    for my in range(mb_h):
        left_b = [V.B_DC_PRED] * 4
        for mx in range(mb_w):
            mb = mb_data[my][mx]
            if seg:
                e.write_tree(
                    V.SEGMENT_TREE, seg.get("tree_probs", [128] * 3), mb["segment"]
                )
            if mb_no_skip:
                e.write_bool(prob_skip_false, mb["skip"])
            e.write_tree(V.KF_YMODE_TREE, V.KF_YMODE_PROBS, mb["ymode"])
            if mb["ymode"] == V.B_PRED:
                sub = mb["bmodes"] or [V.B_DC_PRED] * 16
                for sb in range(16):
                    r, c = sb >> 2, sb & 3
                    am = above_b[mx][c] if r == 0 else sub[sb - 4]
                    lm = left_b[r] if c == 0 else sub[sb - 1]
                    e.write_tree(V.BMODE_TREE, bmp[am][lm], sub[sb])
                above_b[mx] = sub[12:16]
                left_b = [sub[3], sub[7], sub[11], sub[15]]
            else:
                implied = {
                    V.DC_PRED: V.B_DC_PRED,
                    V.V_PRED: V.B_VE_PRED,
                    V.H_PRED: V.B_HE_PRED,
                    V.TM_PRED: V.B_TM_PRED,
                }[mb["ymode"]]
                above_b[mx] = [implied] * 4
                left_b = [implied] * 4
            e.write_tree(V.UV_MODE_TREE, V.KF_UV_MODE_PROBS, mb["uvmode"])
    part0 = e.to_bytes()

    # ---- token partitions with decoder-identical context tracking
    encs = [BoolEncoder() for _ in range(n_partitions)]
    above_ctx = [
        {"y": [0] * 4, "u": [0] * 2, "v": [0] * 2, "y2": 0} for _ in range(mb_w)
    ]
    for my in range(mb_h):
        te = encs[my % n_partitions]
        left = {"y": [0] * 4, "u": [0] * 2, "v": [0] * 2, "y2": 0}
        for mx in range(mb_w):
            mb = mb_data[my][mx]
            a = above_ctx[mx]
            has_y2 = mb["ymode"] != V.B_PRED
            if mb["skip"]:
                a["y"][:] = [0] * 4
                left["y"][:] = [0] * 4
                for pl in ("u", "v"):
                    a[pl][:] = [0] * 2
                    left[pl][:] = [0] * 2
                if has_y2:
                    a["y2"] = left["y2"] = 0
                continue
            if has_y2:
                ctx = a["y2"] + left["y2"]
                nz = _write_block_tokens(te, probs[V.BT_Y2], ctx, 0, mb["y2"])
                a["y2"] = left["y2"] = int(nz)
            bt = V.BT_Y_NO_DC if has_y2 else V.BT_Y_WITH_DC
            first = 1 if has_y2 else 0
            for sb in range(16):
                r, c = sb >> 2, sb & 3
                ctx = a["y"][c] + left["y"][r]
                nz = _write_block_tokens(te, probs[bt], ctx, first, mb["y"][sb])
                a["y"][c] = left["y"][r] = int(nz)
            for pl in ("u", "v"):
                for sb in range(4):
                    r, c = sb >> 1, sb & 1
                    ctx = a[pl][c] + left[pl][r]
                    nz = _write_block_tokens(
                        te, probs[V.BT_UV], ctx, 0, mb[pl][sb]
                    )
                    a[pl][c] = left[pl][r] = int(nz)
    tok_parts = [te.to_bytes() for te in encs]

    # ---- assemble payload
    tag = 0 | (0 << 1) | (1 << 4) | (len(part0) << 5)
    head = bytes(
        [tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF, 0x9D, 0x01, 0x2A]
    )
    wc, hc = w & 0x3FFF, h & 0x3FFF
    head += bytes([wc & 0xFF, wc >> 8, hc & 0xFF, hc >> 8])
    # size table (all but the last partition) precedes partition data
    payload = head + part0
    for p in tok_parts[:-1]:
        payload += bytes([len(p) & 0xFF, (len(p) >> 8) & 0xFF, (len(p) >> 16) & 0xFF])
    payload += b"".join(tok_parts)

    # ---- expected reconstruction (+ loop filter model)
    ye = y_can[1:, 1 : 1 + mb_w * 16].astype(np.uint8)
    ue = u_can[1:, 1 : 1 + mb_w * 8].astype(np.uint8)
    ve = v_can[1:, 1 : 1 + mb_w * 8].astype(np.uint8)
    if filter_level > 0:
        hdr = {
            "segmentation": {
                "enabled": 1 if seg else 0,
                "abs_values": 1 if (seg and seg.get("abs")) else 0,
                "lf": (seg or {}).get("lf", [0] * 4),
            },
            "lf_delta": {"enabled": 0, "ref": [0] * 4, "mode": [0] * 4},
            "filter_type": filter_type,
            "filter_level": filter_level,
            "sharpness": sharpness,
        }
        ye, ue, ve = model_loop_filter(ye, ue, ve, mb_data, hdr)
    ch, cw = (h + 1) // 2, (w + 1) // 2
    expected = {
        "y": ye[:h, :w], "u": ue[:ch, :cw], "v": ve[:ch, :cw],
        # uncropped mb-multiple planes: the reference-buffer state a
        # sequence encoder (tests/vp8interenc.py) carries forward
        "y_pad": ye, "u_pad": ue, "v_pad": ve,
        "probs": probs,
    }
    return payload, expected


def wrap_webp(vp8_payload: bytes) -> bytes:
    chunk = b"VP8 " + len(vp8_payload).to_bytes(4, "little") + vp8_payload
    if len(vp8_payload) & 1:
        chunk += b"\x00"
    return b"RIFF" + (4 + len(chunk)).to_bytes(4, "little") + b"WEBP" + chunk
