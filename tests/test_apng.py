"""APNG frame decode + composite (functions/pixels.py
decode_apng_frames): the oracle is a test-side APNG writer (acTL /
fcTL / fdAT chunks over the existing PNG encoder machinery) plus
hand-computed numpy composites for every dispose/blend combination."""

import struct
import zlib

import numpy as np
import pytest

from rustcheatersdatapipeline_spark.functions.pixels import (
    decode_apng_frames,
    decode_png_pixels,
)
from tests.test_pixels_decode import _chunk, _forward_filter


def _ihdr(w, h, ch=4):
    color = {1: 0, 3: 2, 2: 4, 4: 6}[ch]
    return _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0))


def _fctl(seq, w, h, x, y, dispose=0, blend=0):
    return _chunk(
        b"fcTL",
        struct.pack(">IIIIIHHBB", seq, w, h, x, y, 1, 10, dispose, blend),
    )


def _img_data(px):
    return zlib.compress(_forward_filter(px, 0))


def make_apng(
    first: np.ndarray,
    frames: list[tuple[np.ndarray, int, int, int, int]],
    first_in_anim: bool = True,
) -> bytes:
    """first = full-canvas IDAT image; frames = (pixels, x, y, dispose,
    blend) coded as fdAT. When first_in_anim, the IDAT image is frame 1
    (fcTL before IDAT); otherwise it is the standalone default image."""
    h, w, _ = first.shape
    n_anim = len(frames) + (1 if first_in_anim else 0)
    out = b"\x89PNG\r\n\x1a\n" + _ihdr(w, h)
    out += _chunk(b"acTL", struct.pack(">II", n_anim, 0))
    seq = 0
    if first_in_anim:
        out += _fctl(seq, w, h, 0, 0)
        seq += 1
    out += _chunk(b"IDAT", _img_data(first))
    for px, x, y, dispose, blend in frames:
        fh, fw, _ = px.shape
        out += _fctl(seq, fw, fh, x, y, dispose, blend)
        seq += 1
        out += _chunk(b"fdAT", struct.pack(">I", seq) + _img_data(px))
        seq += 1
    return out + _chunk(b"IEND", b"")


def _rgba(h, w, seed, alpha=255):
    rng = np.random.RandomState(seed)
    px = rng.randint(0, 256, (h, w, 4)).astype(np.uint8)
    px[..., 3] = alpha
    return px


def test_still_png_single_frame():
    from tests.test_pixels_decode import encode_png

    img = _rgba(6, 5, 1)
    frames = decode_apng_frames(encode_png(img))
    assert frames.shape == (1, 6, 5, 4)
    assert np.array_equal(frames[0], img)


def test_composite_source_blend_and_dispose_none():
    base = _rgba(8, 8, 2)
    patch = _rgba(3, 4, 3)
    buf = make_apng(base, [(patch, 2, 1, 0, 0)])
    frames = decode_apng_frames(buf)
    assert frames.shape == (2, 8, 8, 4)
    assert np.array_equal(frames[0], base)
    want = base.copy()
    want[1:4, 2:6] = patch
    assert np.array_equal(frames[1], want)


def test_dispose_background_clears_region():
    base = _rgba(6, 6, 4)
    p1 = _rgba(2, 2, 5)
    p2 = _rgba(1, 1, 6)
    # frame2 drawn with dispose=1: region cleared before frame3
    buf = make_apng(base, [(p1, 1, 1, 1, 0), (p2, 4, 4, 0, 0)])
    frames = decode_apng_frames(buf)
    f2 = base.copy()
    f2[1:3, 1:3] = p1
    assert np.array_equal(frames[1], f2)
    f3 = base.copy()
    f3[1:3, 1:3] = 0  # cleared to fully transparent
    f3[4:5, 4:5] = p2
    assert np.array_equal(frames[2], f3)


def test_dispose_previous_reverts():
    base = _rgba(6, 6, 7)
    p1 = _rgba(3, 3, 8)
    p2 = _rgba(1, 1, 9)
    buf = make_apng(base, [(p1, 0, 0, 2, 0), (p2, 5, 5, 0, 0)])
    frames = decode_apng_frames(buf)
    f3 = base.copy()  # p1's region reverted
    f3[5:6, 5:6] = p2
    assert np.array_equal(frames[2], f3)


def test_blend_over_binary_alpha():
    base = _rgba(4, 4, 10)
    patch = _rgba(2, 2, 11, alpha=0)
    patch[0, 0, 3] = 255  # one opaque pixel, rest fully transparent
    buf = make_apng(base, [(patch, 1, 1, 0, 1)])
    frames = decode_apng_frames(buf)
    want = base.copy()
    want[1, 1] = patch[0, 0]  # opaque src replaces
    assert np.array_equal(frames[1], want)  # transparent src leaves dst


def test_default_image_not_in_animation():
    base = _rgba(5, 5, 12)
    f1 = _rgba(5, 5, 13)
    buf = make_apng(base, [(f1, 0, 0, 0, 0)], first_in_anim=False)
    frames = decode_apng_frames(buf)
    assert frames.shape == (1, 5, 5, 4)
    assert np.array_equal(frames[0], f1)  # IDAT image excluded
    # but the still decode still returns the default image
    assert np.array_equal(decode_png_pixels(buf), base)


@pytest.mark.slow
def test_header_and_spark_sampling(spark):
    from rustcheatersdatapipeline_spark.functions.imaging import sample_frames
    from rustcheatersdatapipeline_spark.functions.multimodal import decode_header

    base = _rgba(6, 6, 14)
    buf = make_apng(base, [(_rgba(2, 2, 15), 0, 0, 0, 0), (_rgba(2, 2, 16), 3, 3, 0, 0)])
    assert decode_header(buf) == ("image/png", 6, 6, 3)
    media = spark.createDataFrame([(1, bytearray(buf))], "item_id long, payload binary")
    out = sample_frames(media, step=1).collect()
    assert [r["frame_idx"] for r in out] == [0, 1, 2]
    got0 = decode_png_pixels(bytes(out[0]["payload"]))
    assert np.array_equal(got0, base)


def test_mutation_totality():
    from rustcheatersdatapipeline_spark.functions.pixels import DECODE_QUARANTINE

    base = make_apng(_rgba(5, 5, 20), [(_rgba(2, 2, 21), 1, 1, 1, 1)])
    rng = np.random.RandomState(0)
    for _ in range(300):
        buf = bytearray(base)
        buf[rng.randint(0, len(buf))] ^= rng.randint(1, 256)
        payload = bytes(buf[: rng.randint(0, len(buf) + 1)])
        try:
            decode_apng_frames(payload)
        except DECODE_QUARANTINE:
            pass
