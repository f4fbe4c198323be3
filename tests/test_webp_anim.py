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


def test_interframe_anmf_quarantine_rate_gate(spark):
    """Scoped inter-coded-ANMF gate (r10): a synthetic animated-lossy
    corpus — 30 all-keyframe animations plus 10 whose second ANMF frame
    is inter-coded (frame-tag LSB=1) — driven through the SPARK
    featurize path. Keyframe animations all decode; the inter-coded
    ones quarantine (never fail the task), and the measured quarantine
    rate is exactly the planted interframe fraction. The decoder-level
    boundary stays named so the rate is attributable."""
    import pytest as _pytest

    from rustcheatersdatapipeline_spark.functions.pixels import featurize_pixels
    from rustcheatersdatapipeline_spark.functions.vp8 import parse_frame_tag

    half = np.full((8, 8), 128, np.uint8)

    def keyframe(seed):
        y = np.full((16, 16), 40 + 5 * seed, np.uint8)
        p, _ = encode_vp8(y, half, half, q_index=4)
        return p

    def interframe_payload(seed):
        p = bytearray(keyframe(seed))
        p[0] |= 0x01  # frame-tag LSB: interframe
        return bytes(p)

    # the decoder-level boundary is NAMED (attribution for the rate)
    with _pytest.raises(NotImplementedError, match="interframe"):
        parse_frame_tag(interframe_payload(0))

    rows = []
    for i in range(40):
        frames = [(b"VP8 ", keyframe(i), 0, 0, 16, 16, 0, 1)]
        if i % 4 == 0:  # 10 of 40 get an inter-coded second frame
            frames.append((b"VP8 ", interframe_payload(i), 0, 0, 16, 16, 0, 0))
        else:
            frames.append((b"VP8 ", keyframe(i + 1), 0, 0, 16, 16, 0, 0))
        rows.append((i, bytearray(make_webp_anim((16, 16), frames))))
    media = spark.createDataFrame(rows, "item_id long, payload binary")
    feats = featurize_pixels(media).collect()
    assert len(feats) == 40
    quarantined = {r["item_id"] for r in feats if r["kind"] == "unknown"}
    decoded = {r["item_id"] for r in feats if r["kind"] == "image"}
    assert quarantined == set(range(0, 40, 4))
    assert len(decoded) == 30
    assert len(quarantined) / len(feats) == 0.25  # exactly the planted rate
    for r in feats:
        if r["kind"] == "image":
            assert (r["width"], r["height"]) == (16, 16)
