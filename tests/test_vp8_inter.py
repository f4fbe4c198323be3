"""VP8 interframe (P-frame) decode — RFC 6386 §16-§18.

Verification layers (the repo's three-layer codec model):

1. bit-exact round trips against the INDEPENDENT sequence-encoder model
   (``tests/vp8interenc.py``) over the full mode/MV space: all inter
   modes incl. SPLITMV partitionings and sub-MV references, subpel
   phases, golden/altref refresh + copy + sign-bias semantics, entropy
   and loop-filter-delta persistence, versions 0/1/3, multi-partition;
2. GOLDEN-MOTION fixtures whose expected pixels are computed directly
   from the spec's filter arithmetic (not through either model) —
   integer shifts must equal array rolls, half-pel on a linear ramp
   must equal the neighbor average;
3. totality fuzzing: mutated/truncated interframe streams either decode
   or raise the quarantine exception set — never crash otherwise.

Reference parity: /root/reference stores avatar images opaquely
(dags/custom_operators/SteamToS3Operator.py); full VP8 video decode is
engine extension surface feeding sample_frames/video-phash like AVI.
"""

import numpy as np
import pytest

import rustcheatersdatapipeline_spark.functions.vp8 as V
from rustcheatersdatapipeline_spark.functions.vp8 import (
    Vp8Decoder,
    decode_ivf_frames,
    yuv420_to_rgba,
)

from tests.vp8interenc import Vp8SeqEncoder


def _rnd(rng, h, w):
    return rng.randint(0, 256, (h, w), np.uint8)


def _assert_frame(got, exp):
    assert np.array_equal(got["y"], exp["y"])
    assert np.array_equal(got["u"], exp["u"])
    assert np.array_equal(got["v"], exp["v"])


def _start(seed=3, h=32, w=48, q=8):
    rng = np.random.RandomState(seed)
    enc = Vp8SeqEncoder()
    p0, e0 = enc.keyframe(
        _rnd(rng, h, w), _rnd(rng, h // 2, w // 2), _rnd(rng, h // 2, w // 2),
        q_index=q,
    )
    dec = Vp8Decoder()
    f0 = dec.decode(p0)
    _assert_frame(f0, e0)
    return rng, enc, dec, f0


# ------------------------------------------------------------ round trips


def test_zeromv_static_scene_roundtrip_and_skip():
    _, enc, dec, f0 = _start()
    specs = [[{"ref": V.REF_LAST, "mode": "zero"} for _ in range(3)]
             for _ in range(2)]
    p1, e1 = enc.interframe(
        f0["y"].copy(), f0["u"].copy(), f0["v"].copy(), specs
    )
    f1 = dec.decode(p1)
    _assert_frame(f1, e1)
    # a static scene predicted with ZEROMV reproduces frame 0 exactly
    assert np.array_equal(f1["y"], f0["y"])
    assert np.array_equal(f1["u"], f0["u"])


def test_newmv_all_subpel_phases_roundtrip():
    rng, enc, dec, _ = _start(seed=7)
    mvs = [(2, 6), (4, -2), (-6, 4), (0, 2), (6, 6), (-4, -6)]
    specs = [[{"ref": V.REF_LAST, "mode": "new", "mv": mvs[r * 3 + c]}
              for c in range(3)] for r in range(2)]
    p1, e1 = enc.interframe(
        _rnd(rng, 32, 48), _rnd(rng, 16, 24), _rnd(rng, 16, 24), specs,
        q_index=12,
    )
    _assert_frame(dec.decode(p1), e1)


def test_nearest_near_and_intra_modes_in_interframe():
    rng, enc, dec, _ = _start(seed=9)
    specs = [
        [{"ref": V.REF_LAST, "mode": "new", "mv": (8, 16)},
         {"ref": V.REF_LAST, "mode": "nearest"},
         {"intra": V.TM_PRED, "uvmode": V.DC_PRED}],
        [{"ref": V.REF_LAST, "mode": "new", "mv": (-8, 8)},
         {"ref": V.REF_LAST, "mode": "near"},
         {"intra": V.B_PRED, "uvmode": V.V_PRED,
          "bmodes": list(range(10)) + [0] * 6}],
    ]
    p1, e1 = enc.interframe(
        _rnd(rng, 32, 48), _rnd(rng, 16, 24), _rnd(rng, 16, 24), specs,
        q_index=10,
    )
    _assert_frame(dec.decode(p1), e1)


def test_splitmv_all_partitionings_and_sub_refs():
    rng, enc, dec, _ = _start(seed=13)
    specs = [
        [{"ref": V.REF_LAST, "mode": "split", "part": 0,
          "sub": [("new", (4, 6)), ("zero",)]},
         {"ref": V.REF_LAST, "mode": "split", "part": 1,
          "sub": [("left",), ("new", (-2, 4))]},
         {"ref": V.REF_LAST, "mode": "split", "part": 2,
          "sub": [("new", (2, 2)), ("above",), ("left",), ("zero",)]}],
        [{"ref": V.REF_LAST, "mode": "split", "part": 3,
          "sub": [("new", ((i % 3 - 1) * 2, (i % 5 - 2) * 2))
                  for i in range(16)]},
         {"ref": V.REF_LAST, "mode": "nearest"},
         {"ref": V.REF_LAST, "mode": "zero"}],
    ]
    p1, e1 = enc.interframe(
        _rnd(rng, 32, 48), _rnd(rng, 16, 24), _rnd(rng, 16, 24), specs,
        q_index=10,
    )
    _assert_frame(dec.decode(p1), e1)


def test_golden_altref_refresh_copy_and_sign_bias():
    rng, enc, dec, _ = _start(seed=11, h=32, w=32)

    def nxt():
        return _rnd(rng, 32, 32), _rnd(rng, 16, 16), _rnd(rng, 16, 16)

    # hidden altref frame
    y, u, v = nxt()
    pa, ea = enc.interframe(
        y, u, v,
        [[{"ref": V.REF_LAST, "mode": "new", "mv": (2, -4)} for _ in range(2)]
         for _ in range(2)],
        refresh_alt=1, refresh_last=0, show_frame=0, q_index=9,
    )
    fa = dec.decode(pa)
    assert fa["header"]["show_frame"] == 0
    _assert_frame(fa, ea)
    # reference golden + altref with altref sign bias set
    y, u, v = nxt()
    pg, eg = enc.interframe(
        y, u, v,
        [[{"ref": V.REF_ALTREF, "mode": "new", "mv": (4, 4)},
          {"ref": V.REF_GOLDEN, "mode": "zero"}],
         [{"ref": V.REF_LAST, "mode": "nearest"},
          {"ref": V.REF_ALTREF, "mode": "near"}]],
        refresh_golden=1, sign_bias_alt=1, q_index=9,
    )
    _assert_frame(dec.decode(pg), eg)
    # buffer copies: last->golden, golden->altref (sequential semantics)
    y, u, v = nxt()
    pc, ec = enc.interframe(
        y, u, v,
        [[{"ref": V.REF_GOLDEN, "mode": "zero"},
          {"ref": V.REF_LAST, "mode": "zero"}],
         [{"ref": V.REF_ALTREF, "mode": "zero"},
          {"ref": V.REF_LAST, "mode": "new", "mv": (0, 2)}]],
        refresh_golden=0, refresh_alt=0, copy_golden=1, copy_alt=2, q_index=9,
    )
    _assert_frame(dec.decode(pc), ec)
    # and the copies are observable: predict off the copied buffers
    y, u, v = nxt()
    pd, ed = enc.interframe(
        y, u, v,
        [[{"ref": V.REF_GOLDEN, "mode": "new", "mv": (2, 2)},
          {"ref": V.REF_ALTREF, "mode": "new", "mv": (-2, 2)}],
         [{"ref": V.REF_GOLDEN, "mode": "zero"},
          {"ref": V.REF_ALTREF, "mode": "zero"}]],
        q_index=9,
    )
    _assert_frame(dec.decode(pd), ed)


def test_entropy_updates_persist_only_when_refreshed():
    rng, enc, dec, _ = _start(seed=17, h=32, w=32, q=20)
    probs2 = [[[[200] * 11 for _ in range(3)] for _ in range(8)]
              for _ in range(4)]
    zspecs = [[{"ref": V.REF_LAST, "mode": "zero"} for _ in range(2)]
              for _ in range(2)]

    def nxt():
        return _rnd(rng, 32, 32), _rnd(rng, 16, 16), _rnd(rng, 16, 16)

    # refresh_entropy=1: coeff + mv prob updates persist to next frame
    y, u, v = nxt()
    pe, ee = enc.interframe(
        y, u, v, zspecs, explicit_probs=probs2, refresh_entropy=1,
        q_index=20, mv_prob_updates={(0, 0): 100, (1, 5): 88},
    )
    _assert_frame(dec.decode(pe), ee)
    y, u, v = nxt()
    pf, ef = enc.interframe(
        y, u, v,
        [[{"ref": V.REF_LAST, "mode": "new", "mv": (6, -6)} for _ in range(2)]
         for _ in range(2)],
        q_index=20,
    )
    _assert_frame(dec.decode(pf), ef)
    # refresh_entropy=0: updates apply to THIS frame only
    probs3 = [[[[60] * 11 for _ in range(3)] for _ in range(8)]
              for _ in range(4)]
    y, u, v = nxt()
    pg, eg = enc.interframe(
        y, u, v, zspecs, explicit_probs=probs3, refresh_entropy=0, q_index=20
    )
    _assert_frame(dec.decode(pg), eg)
    y, u, v = nxt()
    ph, eh = enc.interframe(y, u, v, zspecs, q_index=20)
    _assert_frame(dec.decode(ph), eh)
    # decoder state proves non-persistence: probs2 still live
    assert dec.entropy["coeff"][0][1][0][0] == 200
    assert dec.entropy["mv"][0][0] == 100


def test_ymode_uvmode_prob_overrides():
    rng, enc, dec, _ = _start(seed=19, h=32, w=32)
    specs = [[{"intra": V.V_PRED, "uvmode": V.H_PRED},
              {"intra": V.DC_PRED, "uvmode": V.TM_PRED}],
             [{"ref": V.REF_LAST, "mode": "zero"},
              {"intra": V.H_PRED, "uvmode": V.DC_PRED}]]
    p1, e1 = enc.interframe(
        _rnd(rng, 32, 32), _rnd(rng, 16, 16), _rnd(rng, 16, 16), specs,
        q_index=10, ymode_probs=[40, 200, 120, 80], uv_probs=[90, 180, 33],
    )
    _assert_frame(dec.decode(p1), e1)


def test_loop_filter_ref_mode_deltas_and_persistence():
    rng, enc, dec, _ = _start(seed=21, h=32, w=32)
    specs = [
        [{"ref": V.REF_LAST, "mode": "new", "mv": (2, 6)},
         {"intra": V.DC_PRED, "uvmode": V.DC_PRED}],
        [{"ref": V.REF_GOLDEN, "mode": "zero"},
         {"ref": V.REF_LAST, "mode": "split", "part": 2,
          "sub": [("new", (2, 0)), ("zero",), ("left",), ("above",)]}],
    ]
    p1, e1 = enc.interframe(
        _rnd(rng, 32, 32), _rnd(rng, 16, 16), _rnd(rng, 16, 16), specs,
        filter_level=24, sharpness=1, q_index=16,
        lf_deltas={"ref": [2, -1, 3, 1], "mode": [4, -2, 2, 4]},
    )
    _assert_frame(dec.decode(p1), e1)
    # enabled-without-update: the persisted deltas apply
    p2, e2 = enc.interframe(
        _rnd(rng, 32, 32), _rnd(rng, 16, 16), _rnd(rng, 16, 16),
        [[{"ref": V.REF_LAST, "mode": "zero"} for _ in range(2)]
         for _ in range(2)],
        filter_level=18, q_index=16, lf_deltas="keep",
    )
    _assert_frame(dec.decode(p2), e2)


@pytest.mark.parametrize("version", [1, 3])
def test_bilinear_and_fullpel_versions(version):
    rng = np.random.RandomState(31 + version)
    enc = Vp8SeqEncoder(version=version)
    dec = Vp8Decoder()
    pk, ek = enc.keyframe(
        _rnd(rng, 32, 32), _rnd(rng, 16, 16), _rnd(rng, 16, 16), q_index=8
    )
    fk = dec.decode(pk)
    assert fk["header"]["version"] == version
    _assert_frame(fk, ek)
    mv = (8, -16) if version == 3 else (2, 6)
    pv, ev = enc.interframe(
        _rnd(rng, 32, 32), _rnd(rng, 16, 16), _rnd(rng, 16, 16),
        [[{"ref": V.REF_LAST, "mode": "new", "mv": mv} for _ in range(2)]
         for _ in range(2)],
        q_index=12,
    )
    _assert_frame(dec.decode(pv), ev)


def test_multi_partition_interframe_and_long_mvs():
    rng = np.random.RandomState(37)
    enc = Vp8SeqEncoder()
    dec = Vp8Decoder()
    pk, _ = enc.keyframe(
        _rnd(rng, 64, 48), _rnd(rng, 32, 24), _rnd(rng, 32, 24), q_index=8
    )
    dec.decode(pk)
    specs = [[{"ref": V.REF_LAST, "mode": "new",
               "mv": ((r % 3) * 2, (c % 3) * 2 - 2)} for c in range(3)]
             for r in range(4)]
    pp, ep = enc.interframe(
        _rnd(rng, 64, 48), _rnd(rng, 32, 24), _rnd(rng, 32, 24), specs,
        q_index=14, n_partitions=4,
    )
    _assert_frame(dec.decode(pp), ep)
    # long MV components (> 7 quarter-pel: the 10-bit path incl. the
    # implicit bit-3 rule at x in [8, 15])
    specs = [[{"ref": V.REF_LAST, "mode": "new", "mv": (16, 30)}
              if (r + c) % 2 == 0 else
              {"ref": V.REF_LAST, "mode": "new", "mv": (-64, 128)}
              for c in range(3)] for r in range(4)]
    pL, eL = enc.interframe(
        _rnd(rng, 64, 48), _rnd(rng, 32, 24), _rnd(rng, 32, 24), specs,
        q_index=14,
    )
    _assert_frame(dec.decode(pL), eL)


# ------------------------------------------------------- golden motion


def test_golden_motion_integer_shift_is_an_exact_roll():
    """Spec-level fixture, computed WITHOUT either model: a NEWMV
    integer MV with zero residual must reproduce the reference frame
    shifted by exactly (mv>>3) pixels (interior blocks, no border
    reads)."""
    rng = np.random.RandomState(41)
    enc = Vp8SeqEncoder()
    dec = Vp8Decoder()
    p0, _ = enc.keyframe(
        _rnd(rng, 48, 48), _rnd(rng, 24, 24), _rnd(rng, 24, 24), q_index=0
    )
    f0 = dec.decode(p0)
    # centre MB (1,1) copies from 8 px up-left; target content equals
    # that region so the residual quantizes to zero
    y1 = f0["y"].copy()
    u1 = f0["u"].copy()
    v1 = f0["v"].copy()
    y1[16:32, 16:32] = f0["y"][8:24, 8:24]
    u1[8:16, 8:16] = f0["u"][4:12, 4:12]
    v1[8:16, 8:16] = f0["v"][4:12, 4:12]
    specs = [
        [{"ref": V.REF_LAST, "mode": "zero"} for _ in range(3)]
        for _ in range(3)
    ]
    specs[1][1] = {"ref": V.REF_LAST, "mode": "new", "mv": (-64, -64)}
    p1, _ = enc.interframe(y1, u1, v1, specs, q_index=0)
    f1 = dec.decode(p1)
    assert np.array_equal(f1["y"][16:32, 16:32], f0["y"][8:24, 8:24])
    assert np.array_equal(f1["u"][8:16, 8:16], f0["u"][4:12, 4:12])
    assert np.array_equal(f1["y"][:16], f0["y"][:16])  # ZEROMV rows


def test_golden_motion_halfpel_matches_spec_tap_arithmetic():
    """Half-pel horizontal prediction recomputed in THIS test straight
    from the published tap row {3,-16,77,77,-16,3} and the (acc+64)>>7
    rounding rule — independent of both the decoder's and the encoder
    model's filter implementations."""
    rng = np.random.RandomState(43)
    flat = np.full((24, 24), 128, np.uint8)
    enc = Vp8SeqEncoder()
    dec = Vp8Decoder()
    p0, _ = enc.keyframe(_rnd(rng, 48, 48), flat, flat, q_index=0)
    f0 = dec.decode(p0)
    base = f0["y"].astype(np.int64)
    # expected MC for MB (1,1) with mv (0, 4): phase 4 of the 6-tap bank
    taps = (3, -16, 77, 77, -16, 3)
    expect = np.zeros((16, 16), np.int64)
    for r in range(16):
        for c in range(16):
            acc = sum(
                t * base[16 + r, 16 + c - 2 + k] for k, t in enumerate(taps)
            )
            expect[r, c] = min(255, max(0, (acc + 64) >> 7))
    # target content equals the prediction -> residual quantizes to 0
    y1 = f0["y"].copy()
    y1[16:32, 16:32] = expect.astype(np.uint8)
    specs = [[{"ref": V.REF_LAST, "mode": "zero"} for _ in range(3)]
             for _ in range(3)]
    specs[1][1] = {"ref": V.REF_LAST, "mode": "new", "mv": (0, 4)}
    p1, _ = enc.interframe(y1, f0["u"].copy(), f0["v"].copy(), specs,
                           q_index=0)
    f1 = dec.decode(p1)
    assert np.array_equal(f1["y"][16:32, 16:32].astype(np.int64), expect)


# ------------------------------------------------------------- totality


def test_interframe_totality_fuzz():
    rng = np.random.RandomState(53)
    enc = Vp8SeqEncoder()
    p0, _ = enc.keyframe(
        _rnd(rng, 32, 32), _rnd(rng, 16, 16), _rnd(rng, 16, 16), q_index=8
    )
    specs = [
        [{"ref": V.REF_LAST, "mode": "new", "mv": (2, 6)},
         {"intra": V.B_PRED, "uvmode": V.DC_PRED, "bmodes": [0] * 16}],
        [{"ref": V.REF_LAST, "mode": "split", "part": 2,
          "sub": [("new", (2, 0)), ("zero",), ("left",), ("above",)]},
         {"ref": V.REF_LAST, "mode": "nearest"}],
    ]
    p1, _ = enc.interframe(
        _rnd(rng, 32, 32), _rnd(rng, 16, 16), _rnd(rng, 16, 16), specs,
        q_index=10, filter_level=12,
    )
    for trial in range(150):
        buf = bytearray(p1)
        if trial % 3 == 0 and len(buf) > 4:
            buf = buf[: rng.randint(1, len(buf))]  # truncation
        else:
            for _ in range(rng.randint(1, 4)):
                buf[rng.randint(0, len(buf))] = rng.randint(0, 256)
        dec = Vp8Decoder()
        dec.decode(p0)
        try:
            out = dec.decode(bytes(buf))
            assert out["y"].shape == (32, 32)
        except (ValueError, NotImplementedError):
            pass  # quarantine set — anything else is a crash bug


# ------------------------------------------------------------------ IVF


def make_ivf(frames, w, h, fourcc=b"VP80"):
    hdr = (b"DKIF" + (0).to_bytes(2, "little") + (32).to_bytes(2, "little")
           + fourcc + w.to_bytes(2, "little") + h.to_bytes(2, "little")
           + (30).to_bytes(4, "little") + (1).to_bytes(4, "little")
           + len(frames).to_bytes(4, "little") + b"\x00\x00\x00\x00")
    out = bytearray(hdr)
    for i, p in enumerate(frames):
        out += len(p).to_bytes(4, "little") + i.to_bytes(8, "little") + p
    return bytes(out)


def _ivf_sequence(seed=61, n_inter=3):
    rng = np.random.RandomState(seed)
    enc = Vp8SeqEncoder()
    payloads = []
    expected = []
    p0, e0 = enc.keyframe(
        _rnd(rng, 32, 32), _rnd(rng, 16, 16), _rnd(rng, 16, 16), q_index=8
    )
    payloads.append(p0)
    expected.append(e0)
    for i in range(n_inter):
        mv = ((i % 3) * 2 - 2, (i % 2) * 4 - 2)
        specs = [[{"ref": V.REF_LAST, "mode": "new", "mv": mv}
                  for _ in range(2)] for _ in range(2)]
        p, e = enc.interframe(
            _rnd(rng, 32, 32), _rnd(rng, 16, 16), _rnd(rng, 16, 16), specs,
            q_index=10,
        )
        payloads.append(p)
        expected.append(e)
    return payloads, expected


def test_ivf_decode_matches_expected_frames():
    payloads, expected = _ivf_sequence()
    frames = decode_ivf_frames(make_ivf(payloads, 32, 32))
    assert frames.shape == (4, 32, 32, 4)
    for got, e in zip(frames, expected):
        assert np.array_equal(got, yuv420_to_rgba(e["y"], e["u"], e["v"]))


def test_ivf_hidden_frames_update_refs_but_emit_nothing():
    rng = np.random.RandomState(67)
    enc = Vp8SeqEncoder()
    p0, e0 = enc.keyframe(
        _rnd(rng, 32, 32), _rnd(rng, 16, 16), _rnd(rng, 16, 16), q_index=8
    )
    ph, _ = enc.interframe(  # hidden altref
        _rnd(rng, 32, 32), _rnd(rng, 16, 16), _rnd(rng, 16, 16),
        [[{"ref": V.REF_LAST, "mode": "zero"} for _ in range(2)]
         for _ in range(2)],
        refresh_alt=1, refresh_last=0, show_frame=0, q_index=10,
    )
    ps, es = enc.interframe(  # shown frame predicting off the altref
        _rnd(rng, 32, 32), _rnd(rng, 16, 16), _rnd(rng, 16, 16),
        [[{"ref": V.REF_ALTREF, "mode": "new", "mv": (2, 2)}
          for _ in range(2)] for _ in range(2)],
        q_index=10,
    )
    frames = decode_ivf_frames(make_ivf([p0, ph, ps], 32, 32))
    assert frames.shape == (2, 32, 32, 4)  # hidden frame not emitted
    assert np.array_equal(frames[0], yuv420_to_rgba(e0["y"], e0["u"], e0["v"]))
    assert np.array_equal(frames[1], yuv420_to_rgba(es["y"], es["u"], es["v"]))


def test_ivf_error_paths():
    payloads, _ = _ivf_sequence(n_inter=1)
    good = make_ivf(payloads, 32, 32)
    with pytest.raises(ValueError, match="signature"):
        decode_ivf_frames(b"XKIF" + good[4:])
    with pytest.raises(NotImplementedError, match="VP80"):
        decode_ivf_frames(make_ivf(payloads, 32, 32, fourcc=b"VP90"))
    with pytest.raises(ValueError):
        decode_ivf_frames(good[: len(good) - 3])  # truncated frame
    with pytest.raises(ValueError, match="no shown frames"):
        decode_ivf_frames(good[:32])


def test_ivf_through_spark_featurize_and_frame_sampling(spark):
    from rustcheatersdatapipeline_spark.functions.imaging import sample_frames
    from rustcheatersdatapipeline_spark.functions.pixels import featurize_pixels

    rows = []
    for i in range(6):
        payloads, _ = _ivf_sequence(seed=70 + i, n_inter=3)
        rows.append((i, bytearray(make_ivf(payloads, 32, 32))))
    rows.append((99, bytearray(b"not media at all")))
    media = spark.createDataFrame(rows, "item_id long, payload binary")
    feats = {r["item_id"]: r for r in featurize_pixels(media).collect()}
    assert len(feats) == 7
    for i in range(6):
        assert feats[i]["kind"] == "video"
        assert feats[i]["mime"] == "video/x-ivf"
        assert (feats[i]["width"], feats[i]["height"]) == (32, 32)
        assert feats[i]["n_samples"] == 4 * 32 * 32 * 4
    assert feats[99]["kind"] == "unknown"
    sampled = sample_frames(media.filter("item_id < 2"), step=2).collect()
    # 4 shown frames, step 2 -> frames 0 and 2 per item
    assert sorted((r["item_id"], r["frame_idx"]) for r in sampled) == [
        (0, 0), (0, 2), (1, 0), (1, 2)
    ]


# ------------------------------------------------- survey worked examples


def test_near_mv_survey_hand_worked_examples():
    """§16.3 semantics pinned by HAND-DERIVED fixtures (weights: above
    2, left 2, above-left 1; top-slot-only dedup; fold-back of a third
    distinct candidate equal to the first; zero/intra pool; swap;
    best-vs-zero tie broken toward nearest).  Both the decoder's
    pointer-walk and the encoder model's candidate-list implementation
    must reproduce the same literal values."""
    from tests.vp8interenc import survey_near_mvs

    def mb(ref, mode, mv):
        return {"ref": ref, "mode": mode, "mv": mv, "sub_mvs": None}

    I, L, G = V.REF_INTRA, V.REF_LAST, V.REF_GOLDEN
    nb = {I: 0, L: 0, G: 0, V.REF_ALTREF: 0}  # no sign bias
    cases = [
        # all three neighbors carry (8,8): 2+2+1 weights all fold into
        # the nearest slot -> cnt [0,5,0,0]
        ([[mb(L, V.NEWMV, (8, 8)), mb(L, V.NEWMV, (8, 8)), None],
          [mb(L, V.NEWMV, (8, 8)), None, None]], nb,
         ((8, 8), (8, 8), (0, 0), [0, 5, 0, 0])),
        # above and above-left are zero-MV inter (pool 2+1=3), left has
        # (8,0) w2: pool outweighs -> best stays (0,0)
        ([[mb(L, V.ZEROMV, (0, 0)), mb(L, V.ZEROMV, (0, 0)), None],
          [mb(L, V.NEWMV, (8, 0)), None, None]], nb,
         ((0, 0), (8, 0), (0, 0), [3, 2, 0, 0])),
        # three distinct slots where the third (above-left) equals the
        # first (above): its weight folds back into nearest (+1)
        ([[mb(L, V.NEWMV, (4, 4)), mb(L, V.NEWMV, (4, 4)), None],
          [mb(L, V.NEWMV, (-4, 4)), None, None]], nb,
         ((4, 4), (4, 4), (-4, 4), [0, 3, 2, 0])),
        # out-of-frame above row (intra border): left (6,0) w2 becomes
        # nearest, above-left (2,2) w1 near — no swap
        ([[mb(L, V.NEWMV, (2, 2)), mb(I, V.DC_PRED, (0, 0)), None],
          [mb(L, V.NEWMV, (6, 0)), None, None]], nb,
         ((6, 0), (6, 0), (2, 2), [0, 2, 1, 0])),
    ]
    for grid, bias, want in cases:
        assert V.find_near_mvs(grid, 1, 1, 3, 2, L, bias) == want
        assert survey_near_mvs(grid, 1, 1, 3, 2, L, bias) == want
    # golden-ref neighbors with opposite sign bias negate into a
    # last-ref survey: (8,-8) becomes (-8,8)
    bias = {I: 0, L: 0, G: 1, V.REF_ALTREF: 0}
    grid = [[mb(G, V.NEWMV, (8, -8)), mb(G, V.NEWMV, (8, -8)), None],
            [mb(I, V.DC_PRED, (0, 0)), None, None]]
    want = ((-8, 8), (-8, 8), (0, 0), [0, 3, 0, 0])
    assert V.find_near_mvs(grid, 1, 1, 3, 2, L, bias) == want
    assert survey_near_mvs(grid, 1, 1, 3, 2, L, bias) == want


def test_mode_context_table_narrows_mod_256():
    """The public reference source stores two >255 entries in the
    mode-context table (257, 336) in an int array narrowed to an 8-bit
    probability on use; the decode path must apply the same mod-256
    narrowing (257 -> 1, 336 -> 80)."""
    assert V.MODE_CONTEXTS[5][0] & 0xFF == 1
    assert V.MODE_CONTEXTS[5][1] & 0xFF == 80


# ------------------------------------------------------ property fuzzing


from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@st.composite
def _mb_spec(draw):
    kind = draw(st.sampled_from(
        ["zero", "nearest", "near", "new", "split", "intra"]
    ))
    ref = draw(st.sampled_from([V.REF_LAST, V.REF_GOLDEN, V.REF_ALTREF]))
    mv = st.tuples(
        st.integers(-12, 12).map(lambda v: v * 2),
        st.integers(-12, 12).map(lambda v: v * 2),
    )
    if kind == "intra":
        ym = draw(st.sampled_from(
            [V.DC_PRED, V.V_PRED, V.H_PRED, V.TM_PRED, V.B_PRED]
        ))
        spec = {"intra": ym,
                "uvmode": draw(st.sampled_from(
                    [V.DC_PRED, V.V_PRED, V.H_PRED, V.TM_PRED]))}
        if ym == V.B_PRED:
            spec["bmodes"] = draw(
                st.lists(st.integers(0, 9), min_size=16, max_size=16)
            )
        return spec
    if kind == "new":
        return {"ref": ref, "mode": "new", "mv": draw(mv)}
    if kind == "split":
        part = draw(st.integers(0, 3))
        n = V.MBSPLIT_COUNTS[part]
        subs = draw(st.lists(
            st.one_of(
                st.tuples(st.just("new"), mv),
                st.sampled_from([("left",), ("above",), ("zero",)]),
            ),
            min_size=n, max_size=n,
        ))
        return {"ref": ref, "mode": "split", "part": part, "sub": list(subs)}
    return {"ref": ref, "mode": kind}


@given(
    data=st.data(),
    seed=st.integers(0, 2**31 - 1),
    n_frames=st.integers(1, 3),
)
@pytest.mark.slow
@settings(max_examples=40, deadline=None)
def test_property_random_sequences_roundtrip(data, seed, n_frames):
    """Any encoder-expressible sequence round-trips bit-exactly: random
    mode grids (all inter modes, refs, split layouts, intra-in-inter),
    random refresh/show patterns, random quantizers and filter
    levels."""
    rng = np.random.RandomState(seed)
    enc = Vp8SeqEncoder()
    dec = Vp8Decoder()
    p0, e0 = enc.keyframe(
        _rnd(rng, 32, 32), _rnd(rng, 16, 16), _rnd(rng, 16, 16),
        q_index=int(rng.randint(0, 40)),
    )
    _assert_frame(dec.decode(p0), e0)
    for _ in range(n_frames):
        specs = [[data.draw(_mb_spec()) for _ in range(2)] for _ in range(2)]
        p, e = enc.interframe(
            _rnd(rng, 32, 32), _rnd(rng, 16, 16), _rnd(rng, 16, 16), specs,
            q_index=int(rng.randint(0, 60)),
            filter_level=int(rng.randint(0, 34)),
            filter_type=int(rng.randint(0, 2)),
            refresh_golden=int(rng.randint(0, 2)),
            refresh_alt=int(rng.randint(0, 2)),
            refresh_last=int(rng.randint(0, 2)),
            show_frame=int(rng.randint(0, 2)),
            refresh_entropy=int(rng.randint(0, 2)),
        )
        _assert_frame(dec.decode(p), e)


def test_mid_stream_dimension_change_resets_segment_map():
    """A new keyframe with different dimensions drops the persisted
    per-MB segment map (it no longer fits the MB grid) and the stream
    keeps decoding."""
    rng = np.random.RandomState(97)
    dec = Vp8Decoder()
    from tests.vp8enc import encode_vp8

    seg = {"abs": 1, "quant": [8, 12, 16, 20], "lf": [0, 0, 0, 0],
           "map": [[(r + c) % 4 for c in range(3)] for r in range(2)],
           "tree_probs": [128, 128, 128]}
    p_big, e_big = encode_vp8(
        _rnd(rng, 32, 48), _rnd(rng, 16, 24), _rnd(rng, 16, 24),
        q_index=8, segmentation=seg,
    )
    _assert_frame(dec.decode(p_big), e_big)
    assert dec.seg_map is not None
    p_small, e_small = encode_vp8(
        _rnd(rng, 16, 16), _rnd(rng, 8, 8), _rnd(rng, 8, 8), q_index=8
    )
    f = dec.decode(p_small)
    _assert_frame(f, e_small)
    assert dec.seg_map is None
    assert (dec.width, dec.height) == (16, 16)


def test_inter_tree_tables_are_structurally_valid():
    """Mis-transcription catcher for the tree-shaped constants (the
    analog of the MP3 Kraft/prefix checks): every tree must be a
    well-formed binary tree whose leaves are exactly the expected
    value set, each internal node an in-range even index."""
    def leaves(tree):
        seen = []
        n = len(tree)
        def walk(i):
            assert 0 <= i < n and i % 2 == 0
            for b in (0, 1):
                node = tree[i + b]
                if node <= 0:
                    seen.append(-node)
                else:
                    assert node % 2 == 0 and node > i
                    walk(node)
        walk(0)
        return sorted(seen)

    assert leaves(V.MV_REF_TREE) == sorted(
        [V.ZEROMV, V.NEARESTMV, V.NEARMV, V.NEWMV, V.SPLITMV]
    )
    assert leaves(V.SUB_MV_REF_TREE) == [V.LEFT4X4, V.ABOVE4X4, V.ZERO4X4,
                                         V.NEW4X4]
    assert leaves(V.MBSPLIT_TREE) == [0, 1, 2, 3]
    assert leaves(V.SMALL_MV_TREE) == list(range(8))
    assert leaves(V.YMODE_TREE) == sorted(
        [V.DC_PRED, V.V_PRED, V.H_PRED, V.TM_PRED, V.B_PRED]
    )
    # fill tables: each partitioning labels all 16 blocks with exactly
    # its subset count, contiguous labels from 0
    for part, labels in enumerate(V.MBSPLITS):
        assert len(labels) == 16
        assert sorted(set(labels)) == list(range(V.MBSPLIT_COUNTS[part]))
    # probability tables: 8-bit, nonzero where used as denominators
    for comp in range(2):
        assert len(V.DEFAULT_MV_PROBS[comp]) == 19
        assert len(V.MV_UPDATE_PROBS[comp]) == 19
        assert all(1 <= p <= 255 for p in V.DEFAULT_MV_PROBS[comp])
        assert all(1 <= p <= 255 for p in V.MV_UPDATE_PROBS[comp])
    assert all(len(r) == 4 for r in V.MODE_CONTEXTS)
    assert all(1 <= (p & 0xFF) <= 255 for r in V.MODE_CONTEXTS for p in r)
    for row in V.SUB_MV_REF_PROBS:
        assert len(row) == 3 and all(1 <= p <= 255 for p in row)
    for bank in (V.SIXTAP_FILTERS, V.BILINEAR_FILTERS):
        for taps in bank:
            assert sum(taps) == 128  # unity DC gain, the spec invariant
