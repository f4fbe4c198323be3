"""Resize + frame-sample (functions/imaging.py): the product PNG
encoder must round-trip through the property-tested decoder; resize
must equal direct numpy indexing; frame sampling must emit exactly the
step-indexed frames of a GIF/AVI, decodable back to the source pixels."""

import numpy as np
import pytest

from rustcheatersdatapipeline_spark.functions.imaging import (
    encode_png_bytes,
    resize_media,
    resize_nn,
    sample_frames,
)
from rustcheatersdatapipeline_spark.functions.pixels import decode_png_pixels
from tests.test_gif_decode import _color_table, _frame, build_gif
from tests.test_jpeg_decode import encode_jpeg


def test_png_encoder_roundtrips_through_decoder():
    rng = np.random.RandomState(1)
    for ch in (1, 2, 3, 4):
        img = rng.randint(0, 256, (9, 7, ch)).astype(np.uint8)
        np.testing.assert_array_equal(decode_png_pixels(encode_png_bytes(img)), img)


def test_resize_nn_matches_direct_indexing():
    rng = np.random.RandomState(2)
    img = rng.randint(0, 256, (10, 20, 3)).astype(np.uint8)
    out = resize_nn(img, 5, 4)
    assert out.shape == (4, 5, 3)
    ys = (np.arange(4) * 10 // 4)
    xs = (np.arange(5) * 20 // 5)
    np.testing.assert_array_equal(out, img[np.ix_(ys, xs)])
    with pytest.raises(ValueError):
        resize_nn(img, 0, 4)


def test_resize_media_spark(spark):
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (16, 12, 3)).astype(np.uint8)
    jpg, expected = encode_jpeg(img)
    rows = [
        (1, bytearray(encode_png_bytes(img))),
        (2, bytearray(jpg)),
        (3, bytearray(b"not media")),
    ]
    media = spark.createDataFrame(rows, "item_id long, payload binary")
    out = {r["item_id"]: r for r in resize_media(media, 8, 8).collect()}
    px1 = decode_png_pixels(bytes(out[1]["payload"]))
    np.testing.assert_array_equal(px1, resize_nn(img, 8, 8))
    px2 = decode_png_pixels(bytes(out[2]["payload"]))
    assert px2.shape == (8, 8, 3)  # decoded JPEG, resampled
    assert out[3]["payload"] is None and out[3]["width"] is None  # quarantined


def test_sample_frames_gif(spark):
    rng = np.random.RandomState(4)
    table = _color_table(8)
    idxs = [rng.randint(0, 8, (6, 6)).astype(np.uint8) for _ in range(5)]
    gif = build_gif(6, 6, [_frame(i, min_code=3) for i in idxs], gct=table)
    media = spark.createDataFrame([(7, bytearray(gif))], "item_id long, payload binary")
    rows = sorted(sample_frames(media, step=2).collect(), key=lambda r: r["frame_idx"])
    assert [r["frame_idx"] for r in rows] == [0, 2, 4]
    # frame 0 composites only the first image descriptor → exact pixels
    np.testing.assert_array_equal(
        decode_png_pixels(bytes(rows[0]["payload"])), table[idxs[0]]
    )


def test_sample_frames_single_image_and_junk(spark):
    img = np.zeros((4, 4, 3), np.uint8)
    rows = [(1, bytearray(encode_png_bytes(img))), (2, bytearray(b"junk"))]
    media = spark.createDataFrame(rows, "item_id long, payload binary")
    got = sample_frames(media, step=3).collect()
    assert len(got) == 1 and got[0]["item_id"] == 1 and got[0]["frame_idx"] == 0


def _corrupt_idat_png(img: np.ndarray) -> bytes:
    """Valid PNG signature + chunk walk, garbage deflate in IDAT — the
    repro from the round-6 advisory: decode raises zlib.error, which the
    featurizers MUST quarantine (a task crash is a permanent poison pill
    under foreachBatch replay)."""
    buf = bytearray(encode_png_bytes(img))
    i = buf.find(b"IDAT")
    assert i != -1
    buf[i + 4 : i + 12] = b"\x78\x9c\xff\xff\xff\xff\xff\xff"
    return bytes(buf)


def test_corrupt_idat_reproduces_zlib_error():
    import zlib

    img = np.random.RandomState(7).randint(0, 256, (16, 16, 3)).astype(np.uint8)
    with pytest.raises(zlib.error):
        decode_png_pixels(_corrupt_idat_png(img))


def test_corrupt_idat_quarantines_not_crashes(spark):
    """One corrupt PNG in the batch must not fail the task in ANY
    featurizer: resize → NULL payload row, sample_frames → no frames,
    phash → row dropped; the healthy sibling row survives untouched."""
    from rustcheatersdatapipeline_spark.functions.phash import featurize_phash

    img = np.random.RandomState(8).randint(0, 256, (16, 16, 3)).astype(np.uint8)
    rows = [
        (1, bytearray(encode_png_bytes(img))),
        (2, bytearray(_corrupt_idat_png(img))),
    ]
    media = spark.createDataFrame(rows, "item_id long, payload binary")

    resized = {r["item_id"]: r for r in resize_media(media, 8, 8).collect()}
    assert resized[1]["payload"] is not None
    assert resized[2]["payload"] is None  # quarantined, task alive

    frames = sample_frames(media, step=1).collect()
    assert {r["item_id"] for r in frames} == {1}

    hashed = featurize_phash(media).collect()
    assert {r["item_id"] for r in hashed} == {1}
