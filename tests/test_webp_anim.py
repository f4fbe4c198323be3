"""Animated WebP (VP8X/ANIM/ANMF) compositing.

Differential strategy: the composite math (src-over, dispose-to-
background) is the same public discipline APNG uses, so the strongest
assertion is CROSS-CODEC — build an APNG with the identical frame
stack and require frame-for-frame equality against the independently
implemented ``decode_apng_frames``. Binary-alpha cases are also
checked against a trivial mask model."""

import struct

import numpy as np
import pytest

from rustcheatersdatapipeline_spark.functions.pixels import (
    DECODE_QUARANTINE,
    decode_image_frames,
)
from rustcheatersdatapipeline_spark.functions.vp8l import (
    decode_webp_frames,
    decode_webp_pixels,
)

from tests.test_apng import make_apng
from tests.test_vp8l import encode_vp8l
from tests.vp8enc import encode_vp8


def _chunk(cid: bytes, body: bytes) -> bytes:
    out = cid + struct.pack("<I", len(body)) + body
    return out + (b"\x00" if len(body) % 2 else b"")


def make_webp_anim(canvas_wh, frames) -> bytes:
    """frames: (payload_chunk_id, payload, x, y, w, h, dispose,
    no_blend). x/y must be even (stored divided by 2 per spec)."""
    w, h = canvas_wh
    vp8x = bytes([0x02, 0, 0, 0]) + (w - 1).to_bytes(3, "little") + (
        h - 1
    ).to_bytes(3, "little")
    body = _chunk(b"VP8X", vp8x)
    body += _chunk(b"ANIM", b"\x00" * 4 + b"\x00\x00")
    for cid, payload, x, y, fw, fh, dispose, no_blend in frames:
        hdr = (
            (x // 2).to_bytes(3, "little")
            + (y // 2).to_bytes(3, "little")
            + (fw - 1).to_bytes(3, "little")
            + (fh - 1).to_bytes(3, "little")
            + (24).to_bytes(3, "little")  # duration ms
            + bytes([(no_blend << 1) | dispose])
        )
        body += _chunk(b"ANMF", hdr + _chunk(cid, payload))
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WEBP" + body


def _rgba(h, w, seed, alpha=255):
    rng = np.random.RandomState(seed)
    px = rng.randint(0, 256, (h, w, 4)).astype(np.uint8)
    px[..., 3] = alpha
    return px


def test_matches_apng_compositor_frame_for_frame():
    """Same frame stack through both containers: lossless WebP frames
    vs APNG frames must composite identically (incl. fractional alpha
    src-over and dispose-to-background)."""
    base = _rgba(12, 16, 1)
    f2 = _rgba(6, 8, 2, alpha=130)  # fractional alpha, blended
    f3 = _rgba(4, 4, 3)  # opaque overwrite + dispose
    webp = make_webp_anim(
        (16, 12),
        [
            (b"VP8L", encode_vp8l(base), 0, 0, 16, 12, 0, 1),
            (b"VP8L", encode_vp8l(f2), 4, 2, 8, 6, 0, 0),
            (b"VP8L", encode_vp8l(f3), 8, 4, 4, 4, 1, 1),
            (b"VP8L", encode_vp8l(f3), 0, 0, 4, 4, 0, 0),
        ],
    )
    apng = make_apng(
        base,
        [
            (f2, 4, 2, 0, 1),  # blend=1 is APNG's OVER
            (f3, 8, 4, 1, 0),  # dispose=1 background, blend=0 source
            (f3, 0, 0, 0, 1),
        ],
    )
    got = decode_webp_frames(webp)
    from rustcheatersdatapipeline_spark.functions.pixels import decode_apng_frames

    expected = decode_apng_frames(apng)
    assert got.shape == expected.shape == (4, 12, 16, 4)
    for i in range(4):
        assert np.array_equal(got[i], expected[i]), f"frame {i}"


def test_binary_alpha_mask_model():
    base = _rgba(8, 8, 5)
    patch = _rgba(4, 4, 6)
    patch[:2, :, 3] = 0  # top half fully transparent
    webp = make_webp_anim(
        (8, 8),
        [
            (b"VP8L", encode_vp8l(base), 0, 0, 8, 8, 0, 1),
            (b"VP8L", encode_vp8l(patch), 2, 2, 4, 4, 0, 0),
        ],
    )
    got = decode_webp_frames(webp)
    model = base.copy()
    sel = patch[..., 3] == 255
    region = model[2:6, 2:6]
    region[sel] = patch[sel]
    assert np.array_equal(got[1], model)


def test_lossy_vp8_frames_in_animation():
    """VP8 (lossy) keyframes as animation frames: composite equals the
    encoder model's expected reconstructions placed per frame."""
    y1 = np.full((16, 16), 90, np.uint8)
    half = np.full((8, 8), 128, np.uint8)
    p1, exp1 = encode_vp8(y1, half, half, q_index=0)
    y2 = np.full((16, 16), 200, np.uint8)
    p2, exp2 = encode_vp8(y2, half, half, q_index=0)
    webp = make_webp_anim(
        (32, 16),
        [
            (b"VP8 ", p1, 0, 0, 16, 16, 0, 1),
            (b"VP8 ", p2, 16, 0, 16, 16, 0, 1),
        ],
    )
    got = decode_webp_frames(webp)
    assert got.shape == (2, 16, 32, 4)
    from rustcheatersdatapipeline_spark.functions.vp8 import yuv420_to_rgba

    r1 = yuv420_to_rgba(exp1["y"], exp1["u"], exp1["v"])
    r2 = yuv420_to_rgba(exp2["y"], exp2["u"], exp2["v"])
    assert np.array_equal(got[1][:, :16], r1)
    assert np.array_equal(got[1][:, 16:], r2)
    # transparent where frame 1 hasn't painted yet
    assert int(got[0][:, 16:, 3].max()) == 0


def test_still_and_first_frame_fallbacks():
    px = _rgba(5, 7, 9)
    still = b"RIFF" + struct.pack("<I", 4 + len(_chunk(b"VP8L", encode_vp8l(px)))) + b"WEBP" + _chunk(b"VP8L", encode_vp8l(px))
    assert decode_webp_frames(still).shape == (1, 5, 7, 4)
    anim = make_webp_anim(
        (8, 8), [(b"VP8L", encode_vp8l(_rgba(8, 8, 10)), 0, 0, 8, 8, 0, 1)]
    )
    # the still view of an animation is its first composited frame
    assert np.array_equal(decode_webp_pixels(anim), decode_webp_frames(anim)[0])
    # and the shared frames dispatch routes WebP animations
    assert decode_image_frames(anim).shape == (1, 8, 8, 4)


def test_bounds_and_mutation_totality():
    big = make_webp_anim(
        (8, 8), [(b"VP8L", encode_vp8l(_rgba(8, 8, 11)), 0, 0, 8, 8, 0, 1)]
    )
    # frame region outside the canvas
    bad = make_webp_anim(
        (8, 8), [(b"VP8L", encode_vp8l(_rgba(8, 8, 11)), 4, 4, 8, 8, 0, 1)]
    )
    with pytest.raises(ValueError, match="outside the canvas"):
        decode_webp_frames(bad)
    rng = np.random.RandomState(13)
    for _ in range(120):
        buf = bytearray(big)
        buf[rng.randint(0, len(buf))] ^= rng.randint(1, 256)
        payload = bytes(buf[: rng.randint(12, len(buf) + 1)])
        try:
            out = decode_webp_frames(payload)
            assert isinstance(out, np.ndarray)
        except DECODE_QUARANTINE:
            pass


def test_interframe_anmf_decodes_against_prior_frame():
    """Inter-coded ANMF frames decode for real (the r10 boundary is
    CLOSED): a lossy animation whose second frame is a genuine VP8
    interframe (ZEROMV + residual off the first frame's buffers)
    reconstructs bit-exactly via the per-animation Vp8Decoder, and
    matches the encoder model's expected planes through the container
    path."""
    from rustcheatersdatapipeline_spark.functions.vp8 import yuv420_to_rgba
    from tests.vp8interenc import Vp8SeqEncoder

    rng = np.random.RandomState(23)
    y0 = rng.randint(0, 256, (16, 16), np.uint8)
    u0 = rng.randint(0, 256, (8, 8), np.uint8)
    v0 = rng.randint(0, 256, (8, 8), np.uint8)
    enc = Vp8SeqEncoder()
    kf, e0 = enc.keyframe(y0, u0, v0, q_index=6)
    # second frame: shifted content predicted with NEWMV off frame 1
    y1 = np.roll(y0, 4, axis=1)
    u1 = np.roll(u0, 2, axis=1)
    v1 = np.roll(v0, 2, axis=1)
    import rustcheatersdatapipeline_spark.functions.vp8 as V

    specs = [[{"ref": V.REF_LAST, "mode": "new", "mv": (0, 32)}]]
    pf, e1 = enc.interframe(y1, u1, v1, specs, q_index=6)
    assert pf[0] & 1 == 1  # genuinely inter-coded
    anim = make_webp_anim(
        (16, 16),
        [(b"VP8 ", kf, 0, 0, 16, 16, 0, 1), (b"VP8 ", pf, 0, 0, 16, 16, 0, 1)],
    )
    frames = decode_webp_frames(anim)
    assert frames.shape == (2, 16, 16, 4)
    exp0 = yuv420_to_rgba(e0["y"], e0["u"], e0["v"])
    exp1 = yuv420_to_rgba(e1["y"], e1["u"], e1["v"])
    assert np.array_equal(frames[0], exp0)
    assert np.array_equal(frames[1], exp1)


def test_lossy_animation_spark_featurize_with_inter_frames(spark):
    """The r10 quarantine-rate gate, inverted now the boundary is
    closed: a synthetic animated-lossy corpus where 10 of 40
    animations carry a REAL inter-coded second ANMF frame decodes
    100% — no quarantine — through the Spark featurize path, keyframe
    and interframe animations alike."""
    from rustcheatersdatapipeline_spark.functions.pixels import featurize_pixels
    from tests.vp8interenc import Vp8SeqEncoder

    import rustcheatersdatapipeline_spark.functions.vp8 as V

    half = np.full((8, 8), 128, np.uint8)
    rows = []
    for i in range(40):
        y = np.full((16, 16), 40 + 5 * (i % 20), np.uint8)
        enc = Vp8SeqEncoder()
        kf, _ = enc.keyframe(y, half, half, q_index=4)
        frames = [(b"VP8 ", kf, 0, 0, 16, 16, 0, 1)]
        if i % 4 == 0:  # 10 of 40 get a true inter-coded second frame
            pf, _ = enc.interframe(
                np.roll(y, 2, axis=0), half, half,
                [[{"ref": V.REF_LAST, "mode": "new", "mv": (16, 0)}]],
                q_index=4,
            )
            assert pf[0] & 1 == 1
            frames.append((b"VP8 ", pf, 0, 0, 16, 16, 0, 0))
        else:
            kf2, _ = Vp8SeqEncoder().keyframe(
                np.full((16, 16), 45 + 5 * (i % 20), np.uint8), half, half,
                q_index=4,
            )
            frames.append((b"VP8 ", kf2, 0, 0, 16, 16, 0, 0))
        rows.append((i, bytearray(make_webp_anim((16, 16), frames))))
    media = spark.createDataFrame(rows, "item_id long, payload binary")
    feats = featurize_pixels(media).collect()
    assert len(feats) == 40
    quarantined = {r["item_id"] for r in feats if r["kind"] == "unknown"}
    decoded = {r["item_id"] for r in feats if r["kind"] == "image"}
    assert quarantined == set()
    assert len(decoded) == 40
    for r in feats:
        assert (r["width"], r["height"]) == (16, 16)
