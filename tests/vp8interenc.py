"""Test-side VP8 SEQUENCE encoder — an independent spec model for
interframes (P-frames), extending :mod:`tests.vp8enc` the same way the
decoder extends its keyframe path.

Produces multi-frame RFC 6386 bitstreams (keyframe + interframes with
inter/intra MBs, all MV modes incl. SPLITMV, golden/altref refresh and
copy semantics, sign bias, entropy persistence) AND the bit-exact
expected reconstruction of every frame, so tests assert
``decode(encode(seq)) == expected`` end-to-end.

Independence notes (shared-bug hygiene, same philosophy as vp8enc):

- motion compensation here is scalar per-pixel two-pass filtering with
  clamped-index border addressing, vs the decoder's vectorized slicing
  over ``np.pad``-replicated planes;
- the near-MV survey is a candidate-list reimplementation of §16.3,
  vs the decoder's pointer-walk transcription;
- chroma MV derivation and rounding are recomputed from the spec text.

Tables (trees, probabilities, filters) are shared with the decoder via
``V.*`` — the provenance contract lives in the decoder's docstring.
"""

from __future__ import annotations

import numpy as np

from rustcheatersdatapipeline_spark.functions import vp8 as V

from tests.vp8enc import (
    BoolEncoder,
    _enc_canvas,
    _pad_to_mb,
    _pred_16_8,
    _pred_b4,
    _write_block_tokens,
    _zigzag_of,
    encode_vp8,
    fdct4x4,
    fwht4x4,
    idct4x4_np,
    iwht4x4_np,
    model_loop_filter,
    quantize,
)

# ----------------------------------------------------- MV component write


def write_mv_component(e: BoolEncoder, p, v: int) -> None:
    """v in quarter-pel units, |v| <= 1023 (§17.2)."""
    x = abs(v)
    assert x < (1 << V.MV_LONG_WIDTH)
    if x < 8:
        e.write_bool(p[V.MV_PIS_SHORT], 0)
        e.write_tree(V.SMALL_MV_TREE, p[V.MV_SHORT:], x)
    else:
        e.write_bool(p[V.MV_PIS_SHORT], 1)
        for i in range(3):
            e.write_bool(p[V.MV_BITS + i], (x >> i) & 1)
        for i in range(V.MV_LONG_WIDTH - 1, 3, -1):
            e.write_bool(p[V.MV_BITS + i], (x >> i) & 1)
        if x & 0xFFF0:
            e.write_bool(p[V.MV_BITS + 3], (x >> 3) & 1)
        else:
            assert (x >> 3) & 1, "bit 3 implicit-1 violated"
    if x:
        e.write_bool(p[V.MV_SIGN], 1 if v < 0 else 0)


def write_mv(e: BoolEncoder, mv_probs, residual) -> None:
    for comp in (0, 1):
        v = residual[comp]
        assert v % 2 == 0, "MV residuals are quarter-pel (even 1/8 units)"
        write_mv_component(e, mv_probs[comp], v // 2)


# --------------------------------------------------- MC model (scalar)


def _filt_taps(vals, taps):
    s = 0
    for v, t in zip(vals, taps):
        s += v * t
    s = (s + 64) >> 7
    return 0 if s < 0 else (255 if s > 255 else s)


def mc_model(ref: np.ndarray, py: int, px: int, bh: int, bw: int,
             mv, bilinear: bool) -> np.ndarray:
    """Scalar-model motion compensation with clamped-index border
    replication (independent of the decoder's padded-slice version)."""
    H, W = ref.shape

    def at(r, c):
        rr = 0 if r < 0 else (H - 1 if r >= H else r)
        cc = 0 if c < 0 else (W - 1 if c >= W else c)
        return int(ref[rr, cc])

    base_r = py + (mv[0] >> 3)
    base_c = px + (mv[1] >> 3)
    fr, fc = mv[0] & 7, mv[1] & 7
    if fr == 0 and fc == 0:
        return np.array(
            [[at(base_r + i, base_c + j) for j in range(bw)] for i in range(bh)],
            np.int32,
        )
    bank = V.BILINEAR_FILTERS if bilinear else V.SIXTAP_FILTERS
    lo = 0 if bilinear else 2
    n = 2 if bilinear else 6
    if fc and fr:
        rows = bh + n - 1
        tmp = [
            [
                _filt_taps(
                    [at(base_r - lo + i, base_c - lo + j + k) for k in range(n)],
                    bank[fc],
                )
                for j in range(bw)
            ]
            for i in range(rows)
        ]
        return np.array(
            [
                [
                    _filt_taps([tmp[i + k][j] for k in range(n)], bank[fr])
                    for j in range(bw)
                ]
                for i in range(bh)
            ],
            np.int32,
        )
    if fc:
        return np.array(
            [
                [
                    _filt_taps(
                        [at(base_r + i, base_c - lo + j + k) for k in range(n)],
                        bank[fc],
                    )
                    for j in range(bw)
                ]
                for i in range(bh)
            ],
            np.int32,
        )
    return np.array(
        [
            [
                _filt_taps(
                    [at(base_r - lo + i + k, base_c + j) for k in range(n)],
                    bank[fr],
                )
                for j in range(bw)
            ]
            for i in range(bh)
        ],
        np.int32,
    )


def _half_away(v: int) -> int:
    return ((abs(v) + 1) >> 1) * (-1 if v < 0 else 1)


def _avg4_away(vals) -> int:
    s = sum(vals)
    return ((abs(s) + 4) >> 3) * (-1 if s < 0 else 1)


def _clamp(v, lo, hi):
    return lo if v < lo else (hi if v > hi else v)


def _clamp_mode_mv(mv, my, mx, mb_w, mb_h):
    return (
        _clamp(mv[0], -(my * 128) - 128, (mb_h - 1 - my) * 128 + 128),
        _clamp(mv[1], -(mx * 128) - 128, (mb_w - 1 - mx) * 128 + 128),
    )


def _umv(mv, my, mx, mb_w, mb_h):
    r, c = mv
    tl, tr_ = -(mx * 128), (mb_w - 1 - mx) * 128
    tt, tb = -(my * 128), (mb_h - 1 - my) * 128
    if c < tl - 152:
        c = tl - 128
    elif c > tr_ + 144:
        c = tr_ + 128
    if r < tt - 152:
        r = tt - 128
    elif r > tb + 144:
        r = tb + 128
    return (r, c)


# ------------------------------------------------------ near-MV survey


def survey_near_mvs(grid, my, mx, mb_w, mb_h, refframe, sign_bias):
    """Independent §16.3 model: ordered candidate list with top-slot
    dedup, zero/intra weight pool, above-left fold-back, split count."""
    def nb(r, c):
        if r < 0 or c < 0:
            return None
        return grid[r][c]

    ordered = ((nb(my - 1, mx), 2), (nb(my, mx - 1), 2), (nb(my - 1, mx - 1), 1))
    zero_like = 0
    cand: list[list] = []  # [mv, weight] in discovery order
    for neighbor, wgt in ordered:
        if neighbor is None or neighbor["ref"] == V.REF_INTRA:
            continue
        mv = neighbor["mv"]
        if sign_bias[neighbor["ref"]] != sign_bias[refframe]:
            mv = (-mv[0], -mv[1])
        if mv == (0, 0):
            zero_like += wgt
            continue
        if cand and cand[-1][0] == mv:
            cand[-1][1] += wgt
        else:
            cand.append([mv, wgt])
    if len(cand) == 3:
        # third slot can only come from above-left; its weight is
        # dropped, folded into slot 1 when it duplicates slot 1's MV
        if cand[2][0] == cand[0][0]:
            cand[0][1] += 1
        cand = cand[:2]
    split_cnt = 0
    for neighbor, wgt in ordered:
        if neighbor is not None and neighbor["mode"] == V.SPLITMV:
            split_cnt += wgt
    c1 = cand[0] if cand else [(0, 0), 0]
    c2 = cand[1] if len(cand) > 1 else [(0, 0), 0]
    if c2[1] > c1[1]:
        c1, c2 = c2, c1
    best = c1[0] if c1[1] >= zero_like else (0, 0)
    cnt = [zero_like, c1[1], c2[1], split_cnt]
    return (
        _clamp_mode_mv(best, my, mx, mb_w, mb_h),
        _clamp_mode_mv(c1[0], my, mx, mb_w, mb_h),
        _clamp_mode_mv(c2[0], my, mx, mb_w, mb_h),
        cnt,
    )


def _left_bmv(grid, my, mx, sub, b):
    if b & 3:
        return sub[b - 1]
    neighbor = grid[my][mx - 1] if mx > 0 else None
    if neighbor is None:
        return (0, 0)
    if neighbor["mode"] != V.SPLITMV:
        return neighbor["mv"]
    return neighbor["sub_mvs"][b + 3]


def _above_bmv(grid, my, mx, sub, b):
    if b >= 4:
        return sub[b - 4]
    neighbor = grid[my - 1][mx] if my > 0 else None
    if neighbor is None:
        return (0, 0)
    if neighbor["mode"] != V.SPLITMV:
        return neighbor["mv"]
    return neighbor["sub_mvs"][b + 12]


# ------------------------------------------------------ sequence encoder


class Vp8SeqEncoder:
    """Stateful encoder: ``keyframe(...)`` then ``interframe(...)``
    produce payloads a :class:`V.Vp8Decoder` must reconstruct
    bit-exactly to each returned ``expected``."""

    def __init__(self, version: int = 0) -> None:
        assert 0 <= version <= 3
        self.version = version
        self.w = self.h = None
        self.refs = {"last": None, "golden": None, "altref": None}
        self.entropy = V._default_entropy()
        self.lf_deltas = {"ref": [0] * 4, "mode": [0] * 4}

    # -- keyframe: delegate to the single-frame encoder, capture state
    def keyframe(self, y, u, v, **kw):
        payload, expected = encode_vp8(y, u, v, **kw)
        if self.version:
            tag = payload[0] | (payload[1] << 8) | (payload[2] << 16)
            tag |= self.version << 1
            payload = bytes(
                [tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF]
            ) + payload[3:]
        self.w, self.h = y.shape[1], y.shape[0]
        frame = {
            "y": expected["y_pad"], "u": expected["u_pad"], "v": expected["v_pad"]
        }
        self.refs = {"last": frame, "golden": frame, "altref": frame}
        # encode_vp8 always refreshes entropy; keyframes reset the rest
        self.entropy = V._default_entropy()
        self.entropy["coeff"] = expected["probs"]
        self.lf_deltas = {"ref": [0] * 4, "mode": [0] * 4}
        return payload, expected

    def interframe(
        self,
        y,
        u,
        v,
        mb_specs,
        *,
        q_index: int = 8,
        q_deltas: dict | None = None,
        filter_level: int = 0,
        filter_type: int = 0,
        sharpness: int = 0,
        n_partitions: int = 1,
        mb_no_skip: int = 1,
        prob_skip_false: int = 200,
        prob_intra: int = 128,
        prob_last: int = 128,
        prob_golden: int = 128,
        refresh_last: int = 1,
        refresh_golden: int = 0,
        refresh_alt: int = 0,
        copy_golden: int = 0,
        copy_alt: int = 0,
        sign_bias_golden: int = 0,
        sign_bias_alt: int = 0,
        refresh_entropy: int = 1,
        show_frame: int = 1,
        explicit_probs=None,
        ymode_probs=None,
        uv_probs=None,
        mv_prob_updates: dict | None = None,
        lf_deltas: dict | str | None = None,
    ):
        """Encode one interframe.  ``mb_specs[my][mx]``:

        - intra:  ``{"intra": ymode, "uvmode": m, "bmodes": [16]}``
        - inter:  ``{"ref": 1|2|3, "mode": "zero"|"nearest"|"near"}``
                  ``{"ref": r, "mode": "new", "mv": (dr8, dc8)}``  (absolute,
                  even 1/8-pel components)
                  ``{"ref": r, "mode": "split", "part": 0..3,
                     "sub": [per-partition ("new",(r,c)) | ("left",) |
                             ("above",) | ("zero",)]}``
        """
        h, w = y.shape
        assert (w, h) == (self.w, self.h), "interframe cannot change dims"
        assert self.refs["last"] is not None
        mb_w, mb_h = (w + 15) // 16, (h + 15) // 16
        yp = _pad_to_mb(y, 16).astype(np.int64)
        up = _pad_to_mb(u, 8).astype(np.int64)
        vp = _pad_to_mb(v, 8).astype(np.int64)
        bilinear = self.version >= 1
        fullpel = self.version == 3
        sign_bias = {V.REF_INTRA: 0, V.REF_LAST: 0,
                     V.REF_GOLDEN: sign_bias_golden,
                     V.REF_ALTREF: sign_bias_alt}
        refname = {V.REF_LAST: "last", V.REF_GOLDEN: "golden",
                   V.REF_ALTREF: "altref"}

        base = self.entropy
        probs = explicit_probs if explicit_probs is not None else base["coeff"]
        mvp = [list(base["mv"][0]), list(base["mv"][1])]
        for (comp, i), val in (mv_prob_updates or {}).items():
            x = val >> 1
            assert val == ((x << 1) if x else 1), "mv prob must be even or 1"
            mvp[comp][i] = val
        ym_probs = list(ymode_probs) if ymode_probs else list(base["ymode"])
        uvm_probs = list(uv_probs) if uv_probs else list(base["uv"])

        q_deltas = q_deltas or {}
        quant = V.dequant_factors(q_index, q_deltas)

        # ---- model pass: modes, MVs, prediction, tokens, reconstruction
        y_can = _enc_canvas(mb_h * 16, mb_w * 16)
        u_can = _enc_canvas(mb_h * 8, mb_w * 8)
        v_can = _enc_canvas(mb_h * 8, mb_w * 8)
        grid: list[list] = []  # decoded-info view for context modelling
        mb_data: list[list] = []
        for my in range(mb_h):
            grow: list = []
            drow: list = []
            grid.append(grow)
            mb_data.append(drow)
            for mx in range(mb_w):
                spec = mb_specs[my][mx]
                info = {"ref": V.REF_INTRA, "mode": V.DC_PRED, "mv": (0, 0),
                        "sub_mvs": None}
                extra: dict = {}
                if "intra" in spec:
                    ym = spec["intra"]
                    info["mode"] = ym
                    pred_y, pred_u, pred_v = None, None, None
                else:
                    ref = spec["ref"]
                    info["ref"] = ref
                    best, nearest, near, cnt = survey_near_mvs(
                        grid, my, mx, mb_w, mb_h, ref, sign_bias
                    )
                    extra["cnt"] = cnt
                    extra["best"] = best
                    mname = spec["mode"]
                    if mname == "zero":
                        info["mode"], info["mv"] = V.ZEROMV, (0, 0)
                    elif mname == "nearest":
                        info["mode"], info["mv"] = V.NEARESTMV, nearest
                    elif mname == "near":
                        info["mode"], info["mv"] = V.NEARMV, near
                    elif mname == "new":
                        info["mode"], info["mv"] = V.NEWMV, tuple(spec["mv"])
                        extra["residual"] = (
                            info["mv"][0] - best[0], info["mv"][1] - best[1]
                        )
                    else:
                        info["mode"] = V.SPLITMV
                        part = spec["part"]
                        labels = V.MBSPLITS[part]
                        sub: list = [None] * 16
                        info["sub_mvs"] = sub
                        extra["part"] = part
                        extra["sub_writes"] = []
                        for j in range(V.MBSPLIT_COUNTS[part]):
                            k = labels.index(j)
                            lmv = _left_bmv(grid, my, mx, sub, k)
                            amv = _above_bmv(grid, my, mx, sub, k)
                            sspec = spec["sub"][j]
                            if sspec[0] == "new":
                                smv = tuple(sspec[1])
                                extra["sub_writes"].append(
                                    (V.NEW4X4, lmv, amv,
                                     (smv[0] - best[0], smv[1] - best[1]))
                                )
                            elif sspec[0] == "left":
                                smv = lmv
                                extra["sub_writes"].append(
                                    (V.LEFT4X4, lmv, amv, None)
                                )
                            elif sspec[0] == "above":
                                smv = amv
                                extra["sub_writes"].append(
                                    (V.ABOVE4X4, lmv, amv, None)
                                )
                            else:
                                smv = (0, 0)
                                extra["sub_writes"].append(
                                    (V.ZERO4X4, lmv, amv, None)
                                )
                            for b in range(16):
                                if labels[b] == j:
                                    sub[b] = smv
                        info["mv"] = sub[15]
                grow.append(info)

                # ---- prediction
                sid = 0
                by, bx = my * 16 + 1, mx * 16 + 1
                cy, cx = my * 8 + 1, mx * 8 + 1
                have_a, have_l = my > 0, mx > 0
                if info["ref"] == V.REF_INTRA:
                    ym = info["mode"]
                    uvm = spec["uvmode"]
                    has_y2 = ym != V.B_PRED
                    mode_field = ym
                else:
                    ref_planes = self.refs[refname[info["ref"]]]
                    if info["mode"] != V.SPLITMV:
                        mv = _umv(info["mv"], my, mx, mb_w, mb_h)
                        if fullpel:
                            mv = (mv[0] & ~7, mv[1] & ~7)
                        pred_y = mc_model(
                            ref_planes["y"], my * 16, mx * 16, 16, 16, mv,
                            bilinear,
                        )
                        uvmv = (_half_away(mv[0]), _half_away(mv[1]))
                        if fullpel:
                            uvmv = (uvmv[0] & ~7, uvmv[1] & ~7)
                        pred_u = mc_model(
                            ref_planes["u"], my * 8, mx * 8, 8, 8, uvmv,
                            bilinear,
                        )
                        pred_v = mc_model(
                            ref_planes["v"], my * 8, mx * 8, 8, 8, uvmv,
                            bilinear,
                        )
                    else:
                        subc = [
                            _umv(s, my, mx, mb_w, mb_h) for s in info["sub_mvs"]
                        ]
                        if fullpel:
                            subc = [(r & ~7, c & ~7) for r, c in subc]
                        pred_y = np.empty((16, 16), np.int32)
                        for b in range(16):
                            r, c = b >> 2, b & 3
                            pred_y[4 * r: 4 * r + 4, 4 * c: 4 * c + 4] = (
                                mc_model(
                                    ref_planes["y"], my * 16 + 4 * r,
                                    mx * 16 + 4 * c, 4, 4, subc[b], bilinear,
                                )
                            )
                        pred_u = np.empty((8, 8), np.int32)
                        pred_v = np.empty((8, 8), np.int32)
                        for r in range(2):
                            for c in range(2):
                                ks = (8 * r + 2 * c, 8 * r + 2 * c + 1,
                                      8 * r + 2 * c + 4, 8 * r + 2 * c + 5)
                                uvmv = (
                                    _avg4_away([subc[k][0] for k in ks]),
                                    _avg4_away([subc[k][1] for k in ks]),
                                )
                                if fullpel:
                                    uvmv = (uvmv[0] & ~7, uvmv[1] & ~7)
                                pred_u[4 * r: 4 * r + 4, 4 * c: 4 * c + 4] = (
                                    mc_model(
                                        ref_planes["u"], my * 8 + 4 * r,
                                        mx * 8 + 4 * c, 4, 4, uvmv, bilinear,
                                    )
                                )
                                pred_v[4 * r: 4 * r + 4, 4 * c: 4 * c + 4] = (
                                    mc_model(
                                        ref_planes["v"], my * 8 + 4 * r,
                                        mx * 8 + 4 * c, 4, 4, uvmv, bilinear,
                                    )
                                )
                    ym = None
                    uvm = None
                    has_y2 = info["mode"] != V.SPLITMV
                    mode_field = info["mode"]

                # ---- luma residual model
                y_tokens: list = []
                if info["ref"] == V.REF_INTRA and ym == V.B_PRED:
                    y2_tokens = None
                    sub_modes = spec.get("bmodes") or [V.B_DC_PRED] * 16
                    mb_top = by - 1
                    for sb in range(16):
                        r, c = sb >> 2, sb & 3
                        y0, x0 = by + 4 * r, bx + 4 * c
                        if c == 3 and r > 0:
                            tr = y_can[mb_top, bx + 16: bx + 20]
                        else:
                            tr = y_can[y0 - 1, x0 + 4: x0 + 8]
                        pred = _pred_b4(y_can, y0, x0, sub_modes[sb], tr)
                        res = (
                            yp[my * 16 + 4 * r: my * 16 + 4 * r + 4,
                               mx * 16 + 4 * c: mx * 16 + 4 * c + 4] - pred
                        )
                        qb = quantize(fdct4x4(res), quant["y"][0], quant["y"][1])
                        y_tokens.append(_zigzag_of(qb))
                        deq = qb * quant["y"][1]
                        deq[0, 0] = qb[0, 0] * quant["y"][0]
                        rec = pred + idct4x4_np(deq)
                        y_can[y0: y0 + 4, x0: x0 + 4] = np.clip(rec, 0, 255)
                else:
                    if info["ref"] == V.REF_INTRA:
                        pred_y = _pred_16_8(y_can, by, bx, 16, ym, have_a, have_l)
                        pred_u = _pred_16_8(u_can, cy, cx, 8, uvm, have_a, have_l)
                        pred_v = _pred_16_8(v_can, cy, cx, 8, uvm, have_a, have_l)
                    if has_y2:
                        raw = np.zeros((16, 4, 4), np.int64)
                        dcs = np.zeros((4, 4), np.int64)
                        for sb in range(16):
                            r, c = sb >> 2, sb & 3
                            res = (
                                yp[my * 16 + 4 * r: my * 16 + 4 * r + 4,
                                   mx * 16 + 4 * c: mx * 16 + 4 * c + 4]
                                - pred_y[4 * r: 4 * r + 4, 4 * c: 4 * c + 4]
                            )
                            raw[sb] = fdct4x4(res)
                            dcs[r, c] = raw[sb][0, 0]
                        qy2 = quantize(fwht4x4(dcs), quant["y2"][0], quant["y2"][1])
                        y2_tokens = _zigzag_of(qy2)
                        dq2 = qy2 * np.where(
                            np.arange(16).reshape(4, 4) == 0,
                            quant["y2"][0], quant["y2"][1],
                        )
                        dec_dcs = iwht4x4_np(dq2)
                        for sb in range(16):
                            r, c = sb >> 2, sb & 3
                            qb = quantize(raw[sb], 1, quant["y"][1])
                            qb[0, 0] = 0
                            y_tokens.append(_zigzag_of(qb))
                            deq = qb * quant["y"][1]
                            deq[0, 0] = dec_dcs[r, c]
                            rec = (
                                pred_y[4 * r: 4 * r + 4, 4 * c: 4 * c + 4]
                                + idct4x4_np(deq)
                            )
                            y_can[by + 4 * r: by + 4 * r + 4,
                                  bx + 4 * c: bx + 4 * c + 4] = np.clip(rec, 0, 255)
                    else:  # SPLITMV: per-block DC in the DCT (no Y2)
                        y2_tokens = None
                        for sb in range(16):
                            r, c = sb >> 2, sb & 3
                            res = (
                                yp[my * 16 + 4 * r: my * 16 + 4 * r + 4,
                                   mx * 16 + 4 * c: mx * 16 + 4 * c + 4]
                                - pred_y[4 * r: 4 * r + 4, 4 * c: 4 * c + 4]
                            )
                            qb = quantize(fdct4x4(res), quant["y"][0], quant["y"][1])
                            y_tokens.append(_zigzag_of(qb))
                            deq = qb * quant["y"][1]
                            deq[0, 0] = qb[0, 0] * quant["y"][0]
                            rec = (
                                pred_y[4 * r: 4 * r + 4, 4 * c: 4 * c + 4]
                                + idct4x4_np(deq)
                            )
                            y_can[by + 4 * r: by + 4 * r + 4,
                                  bx + 4 * c: bx + 4 * c + 4] = np.clip(rec, 0, 255)

                # ---- chroma residual model
                if info["ref"] == V.REF_INTRA and ym == V.B_PRED:
                    pred_u = _pred_16_8(u_can, cy, cx, 8, uvm, have_a, have_l)
                    pred_v = _pred_16_8(v_can, cy, cx, 8, uvm, have_a, have_l)
                uv_tokens = {"u": [], "v": []}
                for plane, src, can, pred in (
                    ("u", up, u_can, pred_u), ("v", vp, v_can, pred_v)
                ):
                    for sb in range(4):
                        r, c = sb >> 1, sb & 1
                        res = (
                            src[my * 8 + 4 * r: my * 8 + 4 * r + 4,
                                mx * 8 + 4 * c: mx * 8 + 4 * c + 4]
                            - pred[4 * r: 4 * r + 4, 4 * c: 4 * c + 4]
                        )
                        qb = quantize(fdct4x4(res), quant["uv"][0], quant["uv"][1])
                        uv_tokens[plane].append(_zigzag_of(qb))
                        deq = qb * quant["uv"][1]
                        deq[0, 0] = qb[0, 0] * quant["uv"][0]
                        rec = (
                            pred[4 * r: 4 * r + 4, 4 * c: 4 * c + 4]
                            + idct4x4_np(deq)
                        )
                        can[cy + 4 * r: cy + 4 * r + 4,
                            cx + 4 * c: cx + 4 * c + 4] = np.clip(rec, 0, 255)

                all_zero = (
                    (y2_tokens is None or not any(y2_tokens))
                    and not any(any(t[1 if has_y2 else 0:]) for t in y_tokens)
                    and not any(any(t) for t in uv_tokens["u"])
                    and not any(any(t) for t in uv_tokens["v"])
                )
                skip = 1 if (mb_no_skip and all_zero) else 0
                drow.append(
                    {
                        "segment": sid,
                        "skip": skip,
                        "ymode": ym,
                        "uvmode": uvm,
                        "bmodes": spec.get("bmodes"),
                        "ref": info["ref"],
                        "mode": mode_field,
                        "has_y2": has_y2,
                        "y2": y2_tokens,
                        "y": y_tokens,
                        "u": uv_tokens["u"],
                        "v": uv_tokens["v"],
                        "has_coeffs": not all_zero,
                        "extra": extra,
                    }
                )

        # ---- first partition: header + modes/MVs
        e = BoolEncoder()
        e.write_bool(128, 0)  # segmentation disabled
        e.write_bool(128, filter_type)
        e.write_literal(6, filter_level)
        e.write_literal(3, sharpness)
        if lf_deltas is None:
            e.write_bool(128, 0)
            lfd_hdr = {"enabled": 0, "ref": [0] * 4, "mode": [0] * 4}
        elif lf_deltas == "keep":
            e.write_bool(128, 1)
            e.write_bool(128, 0)  # no update: persisted values apply
            lfd_hdr = {"enabled": 1, "ref": list(self.lf_deltas["ref"]),
                       "mode": list(self.lf_deltas["mode"])}
        else:
            e.write_bool(128, 1)
            e.write_bool(128, 1)
            for d in lf_deltas["ref"]:
                e.write_flagged_signed(6, d)
            for d in lf_deltas["mode"]:
                e.write_flagged_signed(6, d)
            lfd_hdr = {"enabled": 1, "ref": list(lf_deltas["ref"]),
                       "mode": list(lf_deltas["mode"])}
            self.lf_deltas = {"ref": list(lf_deltas["ref"]),
                              "mode": list(lf_deltas["mode"])}
        e.write_literal(2, {1: 0, 2: 1, 4: 2, 8: 3}[n_partitions])
        e.write_literal(7, q_index)
        for k in ("y1dc", "y2dc", "y2ac", "uvdc", "uvac"):
            e.write_flagged_signed(4, q_deltas.get(k, 0))
        e.write_bool(128, refresh_golden)
        e.write_bool(128, refresh_alt)
        if not refresh_golden:
            e.write_literal(2, copy_golden)
        if not refresh_alt:
            e.write_literal(2, copy_alt)
        e.write_bool(128, sign_bias_golden)
        e.write_bool(128, sign_bias_alt)
        e.write_bool(128, refresh_entropy)
        e.write_bool(128, refresh_last)
        for bt in range(4):
            for band in range(8):
                for ctx in range(3):
                    for tok in range(11):
                        up_p = V.COEFF_UPDATE_PROBS[bt][band][ctx][tok]
                        pv = probs[bt][band][ctx][tok]
                        if pv != base["coeff"][bt][band][ctx][tok]:
                            e.write_bool(up_p, 1)
                            e.write_literal(8, pv)
                        else:
                            e.write_bool(up_p, 0)
        e.write_bool(128, mb_no_skip)
        if mb_no_skip:
            e.write_literal(8, prob_skip_false)
        e.write_literal(8, prob_intra)
        e.write_literal(8, prob_last)
        e.write_literal(8, prob_golden)
        if ymode_probs:
            e.write_bool(128, 1)
            for p in ym_probs:
                e.write_literal(8, p)
        else:
            e.write_bool(128, 0)
        if uv_probs:
            e.write_bool(128, 1)
            for p in uvm_probs:
                e.write_literal(8, p)
        else:
            e.write_bool(128, 0)
        for comp in range(2):
            for i in range(19):
                if mvp[comp][i] != base["mv"][comp][i]:
                    e.write_bool(V.MV_UPDATE_PROBS[comp][i], 1)
                    e.write_literal(7, mvp[comp][i] >> 1)
                else:
                    e.write_bool(V.MV_UPDATE_PROBS[comp][i], 0)

        for my in range(mb_h):
            for mx in range(mb_w):
                mb = mb_data[my][mx]
                if mb_no_skip:
                    e.write_bool(prob_skip_false, mb["skip"])
                if mb["ref"] == V.REF_INTRA:
                    e.write_bool(prob_intra, 0)
                    e.write_tree(V.YMODE_TREE, ym_probs, mb["ymode"])
                    if mb["ymode"] == V.B_PRED:
                        for sm in mb["bmodes"] or [V.B_DC_PRED] * 16:
                            e.write_tree(V.BMODE_TREE, V.B_MODE_PROBS_INTER, sm)
                    e.write_tree(V.UV_MODE_TREE, uvm_probs, mb["uvmode"])
                    continue
                e.write_bool(prob_intra, 1)
                if mb["ref"] == V.REF_LAST:
                    e.write_bool(prob_last, 0)
                else:
                    e.write_bool(prob_last, 1)
                    e.write_bool(
                        prob_golden, 1 if mb["ref"] == V.REF_ALTREF else 0
                    )
                cnt = mb["extra"]["cnt"]
                mprobs = [
                    V.MODE_CONTEXTS[cnt[0]][0] & 0xFF,
                    V.MODE_CONTEXTS[cnt[1]][1] & 0xFF,
                    V.MODE_CONTEXTS[cnt[2]][2] & 0xFF,
                    V.MODE_CONTEXTS[cnt[3]][3] & 0xFF,
                ]
                e.write_tree(V.MV_REF_TREE, mprobs, mb["mode"])
                if mb["mode"] == V.NEWMV:
                    write_mv(e, mvp, mb["extra"]["residual"])
                elif mb["mode"] == V.SPLITMV:
                    e.write_tree(V.MBSPLIT_TREE, V.MBSPLIT_PROBS,
                                 mb["extra"]["part"])
                    for sref, lmv, amv, res in mb["extra"]["sub_writes"]:
                        sp = V.SUB_MV_REF_PROBS[
                            ((amv == (0, 0)) << 2)
                            | ((lmv == (0, 0)) << 1)
                            | (lmv == amv)
                        ]
                        e.write_tree(V.SUB_MV_REF_TREE, sp, sref)
                        if sref == V.NEW4X4:
                            write_mv(e, mvp, res)
        part0 = e.to_bytes()

        # ---- token partitions
        encs = [BoolEncoder() for _ in range(n_partitions)]
        above_ctx = [
            {"y": [0] * 4, "u": [0] * 2, "v": [0] * 2, "y2": 0}
            for _ in range(mb_w)
        ]
        for my in range(mb_h):
            te = encs[my % n_partitions]
            left = {"y": [0] * 4, "u": [0] * 2, "v": [0] * 2, "y2": 0}
            for mx in range(mb_w):
                mb = mb_data[my][mx]
                a = above_ctx[mx]
                has_y2 = mb["has_y2"]
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

        # ---- assemble payload (3-byte interframe tag only)
        tag = 1 | (self.version << 1) | (show_frame << 4) | (len(part0) << 5)
        payload = bytes([tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF])
        payload += part0
        for p in tok_parts[:-1]:
            payload += bytes(
                [len(p) & 0xFF, (len(p) >> 8) & 0xFF, (len(p) >> 16) & 0xFF]
            )
        payload += b"".join(tok_parts)

        # ---- expected reconstruction + loop filter
        ye = y_can[1:, 1: 1 + mb_w * 16].astype(np.uint8)
        ue = u_can[1:, 1: 1 + mb_w * 8].astype(np.uint8)
        ve = v_can[1:, 1: 1 + mb_w * 8].astype(np.uint8)
        if filter_level > 0:
            hdr = {
                "segmentation": {"enabled": 0, "abs_values": 0, "lf": [0] * 4},
                "lf_delta": lfd_hdr,
                "filter_type": filter_type,
                "filter_level": filter_level,
                "sharpness": sharpness,
            }
            ye, ue, ve = model_loop_filter(
                ye, ue, ve, mb_data, hdr, keyframe=False
            )
        ch, cw = (h + 1) // 2, (w + 1) // 2
        expected = {
            "y": ye[:h, :w], "u": ue[:ch, :cw], "v": ve[:ch, :cw],
            "y_pad": ye, "u_pad": ue, "v_pad": ve,
        }

        # ---- reference buffer + entropy bookkeeping
        new = {"y": ye, "u": ue, "v": ve}
        if copy_alt == 1:
            self.refs["altref"] = self.refs["last"]
        elif copy_alt == 2:
            self.refs["altref"] = self.refs["golden"]
        if copy_golden == 1:
            self.refs["golden"] = self.refs["last"]
        elif copy_golden == 2:
            self.refs["golden"] = self.refs["altref"]
        if refresh_golden:
            self.refs["golden"] = new
        if refresh_alt:
            self.refs["altref"] = new
        if refresh_last:
            self.refs["last"] = new
        if refresh_entropy:
            self.entropy = {
                "coeff": probs, "ymode": ym_probs, "uv": uvm_probs, "mv": mvp
            }
        return payload, expected
