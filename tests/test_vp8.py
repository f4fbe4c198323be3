"""Lossy VP8 keyframe decoder tests.

Round-trip strategy mirrors ``test_jpeg_decode.py``: the test-side
encoder (``tests/vp8enc.py``) is an independent spec model that also
produces the bit-exact expected reconstruction, so every assertion is
``decode(encode(img)) == expected`` with NO shared arithmetic between
the two sides (scalar decoder vs vectorized encoder model); reference
parity target: avatar/image payloads stored opaquely by
/root/reference/dags/custom_operators/SteamToS3Operator.py:42-119.
"""

from __future__ import annotations

import random
import struct

import numpy as np
import pytest

from rustcheatersdatapipeline_spark.functions import vp8 as V
from rustcheatersdatapipeline_spark.functions.vp8 import (
    BoolDecoder,
    decode_vp8_frame,
    decode_vp8_rgba,
    inverse_dct4x4,
    inverse_wht4x4,
)
from rustcheatersdatapipeline_spark.functions.vp8l import decode_webp_pixels

from tests.vp8enc import (
    BoolEncoder,
    encode_vp8,
    idct4x4_np,
    iwht4x4_np,
    wrap_webp,
    _tree_path,
)


def _rand_planes(rng, h, w):
    return (
        rng.integers(0, 256, (h, w), dtype=np.uint8),
        rng.integers(0, 256, ((h + 1) // 2, (w + 1) // 2), dtype=np.uint8),
        rng.integers(0, 256, ((h + 1) // 2, (w + 1) // 2), dtype=np.uint8),
    )


def _assert_roundtrip(y, u, v, **kw):
    payload, exp = encode_vp8(y, u, v, **kw)
    f = decode_vp8_frame(payload)
    for pl in ("y", "u", "v"):
        assert np.array_equal(f[pl], exp[pl]), (
            pl,
            kw,
            int(np.abs(f[pl].astype(int) - exp[pl].astype(int)).max()),
        )
    return payload, f


# ------------------------------------------------------------- bool coder


def test_bool_coder_roundtrip_fuzz():
    rng = random.Random(42)
    for _ in range(300):
        seq = [
            (rng.randint(1, 254), rng.randint(0, 1))
            for _ in range(rng.randint(1, 600))
        ]
        e = BoolEncoder()
        for p, b in seq:
            e.write_bool(p, b)
        d = BoolDecoder(e.to_bytes())
        assert [d.read_bool(p) for p, _ in seq] == [b for _, b in seq]
        assert not d.overrun


def test_bool_coder_literals_and_trees():
    rng = random.Random(7)
    e = BoolEncoder()
    lits = [(rng.randint(1, 16), rng.getrandbits(12)) for _ in range(50)]
    for bits, _ in lits:
        pass
    vals = []
    for bits, raw in lits:
        v = raw & ((1 << bits) - 1)
        vals.append((bits, v))
        e.write_literal(bits, v)
    toks = [rng.choice([0, 1, 2, 3, 4, 5, 11]) for _ in range(60)]
    probs = tuple(rng.randint(1, 254) for _ in range(11))
    for t in toks:
        e.write_tree(V.COEFF_TREE, probs, t)
    d = BoolDecoder(e.to_bytes())
    for bits, v in vals:
        assert d.read_literal(bits) == v
    for t in toks:
        assert d.read_tree(V.COEFF_TREE, probs) == t


def test_tree_paths_cover_all_leaves():
    for tree, n in ((V.COEFF_TREE, 12), (V.BMODE_TREE, 10), (V.KF_YMODE_TREE, 5)):
        values = set()
        for v in range(n):
            path = _tree_path(tree, v if tree is not V.KF_YMODE_TREE else v)
            assert path
            values.add(v)
        assert len(values) == n


# ------------------------------------------------------------- transforms


def test_inverse_transforms_differential():
    """Decoder scalar §14.2/§14.3 vs the encoder's vectorized forms."""
    rng = np.random.default_rng(3)
    for _ in range(200):
        blk = rng.integers(-2048, 2048, 16).tolist()
        m = np.array(blk).reshape(4, 4)
        assert inverse_dct4x4(blk) == idct4x4_np(m).reshape(-1).tolist()
        assert inverse_wht4x4(blk) == iwht4x4_np(m).reshape(-1).tolist()


def test_dequant_factors_follow_spec_rules():
    q = V.dequant_factors(0, {})
    assert q["y"] == (4, 4)
    assert q["y2"][0] == 8  # doubled DC
    assert q["y2"][1] == 8  # 155/100 scaled, floored at 8
    q = V.dequant_factors(127, {})
    assert q["uv"][0] == 132  # chroma DC cap
    assert q["y"][1] == V.AC_QLOOKUP[127]
    # index clamping via deltas
    assert V.dequant_factors(127, {"y1dc": 50})["y"][0] == V.DC_QLOOKUP[127]


# -------------------------------------------------------------- roundtrips


def test_constant_gray_exact():
    y = np.full((32, 48), 120, np.uint8)
    u = np.full((16, 24), 100, np.uint8)
    v = np.full((16, 24), 140, np.uint8)
    _assert_roundtrip(y, u, v, q_index=0)


@pytest.mark.parametrize("mode", [V.DC_PRED, V.V_PRED, V.H_PRED, V.TM_PRED])
def test_each_16x16_mode_exact(mode):
    rng = np.random.default_rng(mode)
    y, u, v = _rand_planes(rng, 48, 80)
    modes = np.full((3, 5), mode)
    _assert_roundtrip(y, u, v, ymodes=modes, uvmodes=modes, q_index=20)


def test_mixed_modes_coarse_and_fine_quant():
    rng = np.random.default_rng(5)
    y, u, v = _rand_planes(rng, 48, 80)
    ym = rng.integers(0, 4, (3, 5))
    uvm = rng.integers(0, 4, (3, 5))
    for q in (0, 35, 90, 127):
        _assert_roundtrip(y, u, v, ymodes=ym, uvmodes=uvm, q_index=q)


def test_bpred_all_submodes_exact():
    rng = np.random.default_rng(9)
    y, u, v = _rand_planes(rng, 48, 80)
    ym = np.full((3, 5), V.B_PRED)
    bm = {
        (my, mx): [(my * 16 + mx * 4 + sb) % 10 for sb in range(16)]
        for my in range(3)
        for mx in range(5)
    }
    _assert_roundtrip(y, u, v, ymodes=ym, bmodes=bm, q_index=15)


def test_bpred_and_16x16_interleaved():
    rng = np.random.default_rng(13)
    y, u, v = _rand_planes(rng, 48, 80)
    ym = rng.integers(0, 5, (3, 5))  # includes B_PRED
    bm = {
        (my, mx): [int(x) for x in rng.integers(0, 10, 16)]
        for my in range(3)
        for mx in range(5)
        if ym[my][mx] == V.B_PRED
    }
    _assert_roundtrip(y, u, v, ymodes=ym, bmodes=bm, q_index=25)


def test_multiple_token_partitions():
    rng = np.random.default_rng(17)
    y, u, v = _rand_planes(rng, 80, 48)
    for n in (2, 4, 8):
        _assert_roundtrip(y, u, v, q_index=30, n_partitions=n)


def test_skip_macroblocks_engage():
    """A flat frame at coarse quant should skip-code most MBs — the
    stream with skip enabled must be smaller AND both must decode."""
    y = np.full((96, 160), 128, np.uint8)
    u = np.full((48, 80), 128, np.uint8)
    v = np.full((48, 80), 128, np.uint8)
    # prob_skip_false=30 makes each skip=1 flag ≈0.18 bits; with the RFC
    # §13.5 tables an all-EOB macroblock costs a few bits, so the skip
    # stream is strictly smaller (at the old neutral-128 tables ANY skip
    # prob won; the real tables price empty blocks nearly as low)
    with_skip, _ = _assert_roundtrip(
        y, u, v, q_index=100, mb_no_skip=1, prob_skip_false=30
    )
    without, _ = _assert_roundtrip(y, u, v, q_index=100, mb_no_skip=0)
    assert len(with_skip) < len(without)


def test_explicit_coeff_prob_update_path():
    """Full 1056-entry explicit probability transmission (§13.4) —
    the stream is self-describing, independent of module defaults."""
    rng = np.random.default_rng(21)
    y, u, v = _rand_planes(rng, 48, 48)
    ep = tuple(
        tuple(
            tuple(
                tuple(((bt * 31 + band * 7 + ctx * 3 + t * 11) % 253) + 1
                      for t in range(11))
                for ctx in range(3)
            )
            for band in range(8)
        )
        for bt in range(4)
    )
    _assert_roundtrip(y, u, v, q_index=25, explicit_probs=ep)


def test_segmentation_quant_overrides():
    rng = np.random.default_rng(23)
    y, u, v = _rand_planes(rng, 48, 80)
    seg = {
        "abs": 0,
        "quant": [0, 20, -5, 40],
        "lf": [0, 0, 0, 0],
        "map": rng.integers(0, 4, (3, 5)).tolist(),
        "tree_probs": [100, 150, 200],
    }
    _assert_roundtrip(y, u, v, q_index=30, segmentation=seg)
    seg_abs = dict(seg, abs=1, quant=[10, 60, 100, 127])
    _assert_roundtrip(y, u, v, q_index=30, segmentation=seg_abs)


def test_quantizer_deltas_roundtrip():
    rng = np.random.default_rng(27)
    y, u, v = _rand_planes(rng, 32, 32)
    _assert_roundtrip(
        y, u, v, q_index=40,
        q_deltas={"y1dc": 5, "y2dc": -3, "y2ac": 7, "uvdc": -2, "uvac": 4},
    )


def test_odd_dimensions_cropped():
    rng = np.random.default_rng(31)
    y, u, v = _rand_planes(rng, 37, 51)
    _, f = _assert_roundtrip(y, u, v, q_index=20)
    assert f["y"].shape == (37, 51)
    assert f["u"].shape == (19, 26)


# -------------------------------------------------------------- loop filter


@pytest.mark.parametrize("level", [5, 20, 45, 63])
def test_normal_loop_filter_differential(level):
    rng = np.random.default_rng(level)
    y, u, v = _rand_planes(rng, 48, 80)
    ym = rng.integers(0, 4, (3, 5))
    _assert_roundtrip(y, u, v, q_index=40, filter_level=level, ymodes=ym)


@pytest.mark.parametrize("sharpness", [1, 3, 7])
def test_loop_filter_sharpness(sharpness):
    rng = np.random.default_rng(40 + sharpness)
    y, u, v = _rand_planes(rng, 48, 80)
    _assert_roundtrip(y, u, v, q_index=40, filter_level=30, sharpness=sharpness)


def test_simple_filter_luma_only():
    rng = np.random.default_rng(51)
    y, u, v = _rand_planes(rng, 48, 80)
    payload, f = _assert_roundtrip(
        y, u, v, q_index=40, filter_level=25, filter_type=1
    )
    # chroma must equal the unfiltered reconstruction
    _, exp_nofilt = encode_vp8(y, u, v, q_index=40, filter_level=0)
    assert np.array_equal(f["u"], exp_nofilt["u"])
    assert np.array_equal(f["v"], exp_nofilt["v"])


def test_bpred_with_filter():
    rng = np.random.default_rng(53)
    y, u, v = _rand_planes(rng, 48, 80)
    ym = np.full((3, 5), V.B_PRED)
    bm = {
        (my, mx): [int(x) for x in rng.integers(0, 10, 16)]
        for my in range(3)
        for mx in range(5)
    }
    _assert_roundtrip(y, u, v, q_index=25, filter_level=35, ymodes=ym, bmodes=bm)


# ------------------------------------------------------------- integration


def test_webp_container_and_rgba():
    rng = np.random.default_rng(61)
    y, u, v = _rand_planes(rng, 32, 48)
    payload, _ = encode_vp8(y, u, v, q_index=10)
    px = decode_webp_pixels(wrap_webp(payload))
    assert px.shape == (32, 48, 4)
    assert int(px[..., 3].min()) == 255
    # gray YUV → R == G == B under BT.601
    g = np.full((16, 16), 90, np.uint8)
    half = np.full((8, 8), 128, np.uint8)
    rgba = decode_vp8_rgba(encode_vp8(g, half, half, q_index=0)[0])
    assert np.array_equal(rgba[..., 0], rgba[..., 1])
    assert np.array_equal(rgba[..., 1], rgba[..., 2])


def test_interframe_without_reference_is_a_data_error():
    # interframes decode through Vp8Decoder (tests/test_vp8_inter.py);
    # in a STILL context there are no reference buffers, so a lone
    # interframe payload is a data error, not a feature boundary
    inter = b"\x01" + b"\x00" * 12
    with pytest.raises(ValueError, match="without a prior keyframe"):
        decode_vp8_frame(inter)


def test_phash_integration(spark):
    """A lossy WebP joins the perceptual index: its pHash stays within
    a small Hamming distance of the same image delivered as PNG."""
    from rustcheatersdatapipeline_spark.functions.phash import featurize_phash

    from tests.test_pixels_decode import encode_png

    rng = np.random.RandomState(71)
    coarse = rng.randint(0, 256, (8, 8)).astype(np.uint8)
    gray = np.repeat(np.repeat(coarse, 8, axis=0), 8, axis=1)
    half = np.full((32, 32), 128, np.uint8)
    lossy = wrap_webp(encode_vp8(gray, half, half, q_index=4)[0])
    rgb = np.stack([gray] * 3, axis=-1)
    png = encode_png(rgb)
    media = spark.createDataFrame(
        [(1, bytearray(lossy)), (2, bytearray(png))],
        "item_id long, payload binary",
    )
    hashes = {r["item_id"]: r["phash"] for r in featurize_phash(media).collect()}
    assert bin(hashes[1] ^ hashes[2]).count("1") <= 6


def test_mutation_and_truncation_totality():
    """Corrupt/truncated VP8 payloads must decode or raise a
    quarantinable error — never hang or escape the contract."""
    from rustcheatersdatapipeline_spark.functions.pixels import DECODE_QUARANTINE

    rng = np.random.RandomState(77)
    y, u, v = (
        rng.randint(0, 256, (32, 32)).astype(np.uint8),
        rng.randint(0, 256, (16, 16)).astype(np.uint8),
        rng.randint(0, 256, (16, 16)).astype(np.uint8),
    )
    base, _ = encode_vp8(y, u, v, q_index=20, filter_level=12)
    webp = wrap_webp(base)
    for _ in range(150):
        buf = bytearray(webp)
        buf[rng.randint(0, len(buf))] ^= rng.randint(1, 256)
        payload = bytes(buf[: rng.randint(12, len(buf) + 1)])
        try:
            out = decode_webp_pixels(payload)
            assert isinstance(out, np.ndarray)
        except DECODE_QUARANTINE:
            pass


def test_probability_table_injection():
    """The two engine-default probability tables are injectable on both
    sides — the documented path to real-world (RFC-constant) parity:
    an encoder/decoder pair sharing ALTERNATIVE tables round-trips
    exactly, and a decoder with mismatched tables diverges."""
    rng = np.random.default_rng(97)
    y, u, v = _rand_planes(rng, 48, 48)
    ym = np.full((3, 3), V.B_PRED)
    bm = {
        (my, mx): [int(x) for x in rng.integers(0, 10, 16)]
        for my in range(3)
        for mx in range(3)
    }
    alt_bmode = tuple(
        tuple(
            tuple(int(rng.integers(40, 220)) for _ in range(9))
            for _left in range(10)
        )
        for _above in range(10)
    )
    alt_coeff = tuple(
        tuple(
            tuple(tuple(int(rng.integers(30, 230)) for _ in range(11))
                  for _ctx in range(3))
            for _band in range(8)
        )
        for _bt in range(4)
    )
    payload, exp = encode_vp8(
        y, u, v, q_index=20, ymodes=ym, bmodes=bm,
        kf_bmode_probs=alt_bmode, explicit_probs=None,
    )
    # bmode table must match on both sides (it is not transmitted)
    f = decode_vp8_frame(payload, kf_bmode_probs=alt_bmode)
    for pl in ("y", "u", "v"):
        assert np.array_equal(f[pl], exp[pl])
    # coeff defaults injected as well (no in-stream updates transmitted)
    import tests.vp8enc as enc

    payload2, exp2 = encode_vp8(y, u, v, q_index=20, explicit_probs=alt_coeff)
    # explicit_probs transmits the table in-stream: default decoder works
    f2 = decode_vp8_frame(payload2)
    assert np.array_equal(f2["y"], exp2["y"])
    # a decoder given WRONG bmode tables diverges (tables matter)
    wrong = decode_vp8_frame(payload)  # module defaults, not alt_bmode
    assert not np.array_equal(wrong["y"], exp["y"])


def test_decode_bound_rejects_claimed_giant_dims():
    """A ~70-byte payload claiming 16383x16383 must hit the 256 MiB bomb
    bound BEFORE any canvas/mode allocation (ADVICE r9: 14-bit dims
    otherwise drive ~1 GiB of canvases and ~1M macroblocks of decode)."""
    import time

    tag = (0) | (0 << 1) | (1 << 4) | (30 << 5)  # keyframe, part0_size=30
    buf = bytes([tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF])
    buf += b"\x9d\x01\x2a"
    buf += (16383).to_bytes(2, "little") + (16383).to_bytes(2, "little")
    buf += bytes(60)
    t0 = time.monotonic()
    with pytest.raises(ValueError, match="decode bound"):
        V.decode_vp8_frame(buf)
    assert time.monotonic() - t0 < 2.0  # rejected at header time

    # the bound also guards the WebP still path (RIFF container route)
    body = buf
    riff = (
        b"RIFF" + (4 + 8 + len(body)).to_bytes(4, "little") + b"WEBP"
        + b"VP8 " + len(body).to_bytes(4, "little") + body
    )
    with pytest.raises(ValueError, match="decode bound"):
        decode_webp_pixels(riff)


def test_rfc_tables_structural_invariants():
    """The transcribed RFC 6386 tables have the spec's exact shapes and
    legal probability values, and are genuinely non-uniform (the r9
    neutral placeholders are gone)."""
    assert len(V.DEFAULT_COEFF_PROBS) == 4
    assert len(V.COEFF_UPDATE_PROBS) == 4
    for bt in range(4):
        assert len(V.DEFAULT_COEFF_PROBS[bt]) == 8
        for band in range(8):
            assert len(V.DEFAULT_COEFF_PROBS[bt][band]) == 3
            for ctx in range(3):
                row = V.DEFAULT_COEFF_PROBS[bt][band][ctx]
                urow = V.COEFF_UPDATE_PROBS[bt][band][ctx]
                assert len(row) == 11 and len(urow) == 11
                assert all(1 <= p <= 255 for p in row)
                assert all(1 <= p <= 255 for p in urow)
    assert len(V.KF_BMODE_PROBS) == 10
    assert all(len(a) == 10 for a in V.KF_BMODE_PROBS)
    assert all(len(l) == 9 for a in V.KF_BMODE_PROBS for l in a)
    assert all(1 <= p <= 255 for a in V.KF_BMODE_PROBS for l in a for p in l)
    # non-uniform: distinct contexts carry distinct distributions
    flat_coeff = {r for bt in V.DEFAULT_COEFF_PROBS for b in bt for r in b}
    assert len(flat_coeff) > 50
    flat_bmode = {l for a in V.KF_BMODE_PROBS for l in a}
    assert len(flat_bmode) > 50
    # spec spot-anchors (§13.5 first non-trivial row, §11.5 [0][0])
    assert V.DEFAULT_COEFF_PROBS[0][1][0][:6] == (253, 136, 254, 255, 228, 219)
    assert V.KF_BMODE_PROBS[0][0] == (231, 120, 48, 89, 115, 113, 120, 152, 112)
    assert V.COEFF_UPDATE_PROBS[0][1][0][:2] == (176, 246)


def test_sparse_prob_updates_roundtrip():
    """Update-relative-to-RFC header path: a stream whose coefficient
    table differs from the §13.5 defaults in only a FEW entries
    transmits exactly those updates (tiny header) and decodes exactly —
    with NO table injection on the decode side."""
    rng = np.random.default_rng(4242)
    y, u, v = _rand_planes(rng, 32, 32)
    # hand-picked sparse deltas: perturb five entries across block
    # types/bands/contexts, keep everything else at the RFC default
    probs = [
        [[list(ctx) for ctx in band] for band in bt]
        for bt in V.DEFAULT_COEFF_PROBS
    ]
    deltas = [(0, 1, 0, 0, 200), (1, 0, 2, 1, 99), (2, 3, 1, 2, 44),
              (3, 7, 0, 1, 180), (0, 4, 2, 5, 7)]
    for bt, band, ctx, tok, val in deltas:
        assert probs[bt][band][ctx][tok] != val
        probs[bt][band][ctx][tok] = val
    payload, exp = encode_vp8(y, u, v, q_index=13, explicit_probs=probs)
    # the sparse header is materially smaller than a full-table one
    # (1056 literals ≈ 1.2 KiB) — proves updates were actually sparse
    base_payload, _ = encode_vp8(y, u, v, q_index=13)
    assert len(payload) - len(base_payload) < 64
    f = decode_vp8_frame(payload)  # no injection: RFC defaults + updates
    for pl in ("y", "u", "v"):
        assert np.array_equal(f[pl], exp[pl])


def test_default_probs_stream_needs_no_updates_at_all():
    """An encoder using the RFC defaults verbatim transmits 1056 zero
    flags and decodes exactly — the common real-world fast path."""
    rng = np.random.default_rng(777)
    y, u, v = _rand_planes(rng, 48, 32)
    ym = np.full((3, 2), V.B_PRED)
    bm = {
        (my, mx): [int(x) for x in rng.integers(0, 10, 16)]
        for my in range(3)
        for mx in range(2)
    }
    payload, exp = encode_vp8(y, u, v, q_index=26, ymodes=ym, bmodes=bm,
                              filter_level=12)
    f = decode_vp8_frame(payload)
    for pl in ("y", "u", "v"):
        assert np.array_equal(f[pl], exp[pl])
