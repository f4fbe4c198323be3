"""Perceptual image hash + image near-dup (functions/phash.py).

Properties pinned: determinism, invariance under the perturbations the
hash is FOR (re-encode, resize, mild brightness shift → Hamming ≤ 3),
discrimination between unrelated images (Hamming around 32 for random
structure), and completeness of the banded candidate join (every
pair ≤ the radius that a brute-force popcount scan finds)."""

import numpy as np
import pytest

from rustcheatersdatapipeline_spark.functions.phash import (
    HAM_K,
    featurize_phash,
    image_neardup,
    phash64,
)
from tests.test_jpeg_decode import encode_jpeg
from tests.test_pixels_decode import encode_png


def _ham(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def _textured(seed: int, h: int = 64, w: int = 64) -> np.ndarray:
    """Low-frequency random texture — what pHash actually discriminates
    (iid noise hashes near-randomly under ANY perceptual hash)."""
    rng = np.random.RandomState(seed)
    coarse = rng.randint(0, 256, (8, 8)).astype(np.float64)
    img = np.repeat(np.repeat(coarse, h // 8, axis=0), w // 8, axis=1)
    return np.clip(img, 0, 255).astype(np.uint8)


def test_deterministic_and_resolution_invariant():
    img = _textured(1)
    assert phash64(img) == phash64(img)
    up = np.repeat(np.repeat(img, 2, axis=0), 2, axis=1)  # 2x upscale
    assert _ham(phash64(img), phash64(up)) <= HAM_K


def test_brightness_shift_within_radius():
    img = _textured(2)
    brighter = np.clip(img.astype(int) + 12, 0, 255).astype(np.uint8)
    assert _ham(phash64(img), phash64(brighter)) <= HAM_K


def test_jpeg_reencode_within_radius():
    """The flagship use: a JPEG re-encode of a PNG is a byte-level
    stranger but a perceptual twin."""
    img = _textured(3)
    from rustcheatersdatapipeline_spark.functions.jpeg import decode_jpeg_pixels

    jpg, _ = encode_jpeg(img)
    assert _ham(phash64(img), phash64(decode_jpeg_pixels(jpg))) <= HAM_K


def test_unrelated_images_far_apart():
    hs = [phash64(_textured(s)) for s in range(10, 22)]
    dists = [_ham(a, b) for i, a in enumerate(hs) for b in hs[i + 1 :]]
    assert min(dists) > HAM_K  # no false near-dups among unrelated images
    assert sum(dists) / len(dists) > 20  # and they spread out


def test_color_and_gray_agree():
    img = _textured(4)
    rgb = np.stack([img, img, img], axis=-1)
    assert phash64(img) == phash64(rgb)


def test_degenerate_inputs_raise():
    with pytest.raises(ValueError):
        phash64(np.zeros((1, 5), np.uint8))


def test_spark_neardup_end_to_end(spark):
    """PNG originals + JPEG re-encodes + one resized copy: near-dup
    pairs = exactly the perceptual-twin pairs, verified complete
    against a brute-force popcount over all hash pairs."""
    rows = []
    imgs = {}
    for i in range(6):
        img = _textured(30 + i)
        imgs[i] = img
        rows.append((i, bytearray(encode_png(img[..., None]))))
    # 100: JPEG re-encode of image 0; 101: 2x upscale of image 1
    jpg, _ = encode_jpeg(imgs[0])
    rows.append((100, bytearray(jpg)))
    up = np.repeat(np.repeat(imgs[1], 2, axis=0), 2, axis=1)
    rows.append((101, bytearray(encode_png(up[..., None]))))
    media = spark.createDataFrame(rows, "item_id long, payload binary")

    hashes = featurize_phash(media).cache()
    got = {(r["item_a"], r["item_b"]) for r in image_neardup(hashes).collect()}

    hv = {r["item_id"]: r["phash"] & ((1 << 64) - 1) for r in hashes.collect()}
    brute = {
        (a, b)
        for a in hv
        for b in hv
        if a < b and _ham(hv[a], hv[b]) <= HAM_K
    }
    hashes.unpersist()
    assert got == brute  # banded join is complete, no false pairs
    assert (0, 100) in got and (1, 101) in got  # the planted twins


def test_image_dedup_clusters_transitive(spark):
    """A re-encode chain (PNG → JPEG → JPEG-of-JPEG) must land in ONE
    cluster even when the chain's ends are farther apart than the pair
    radius; unrelated images stay singletons with themselves as
    survivor."""
    from rustcheatersdatapipeline_spark.functions.jpeg import decode_jpeg_pixels
    from rustcheatersdatapipeline_spark.functions.phash import image_dedup_clusters

    img = _textured(50)
    jpg1, _ = encode_jpeg(img)
    px1 = decode_jpeg_pixels(jpg1)
    jpg2, _ = encode_jpeg(px1[..., 0] if px1.shape[2] == 1 else px1)
    rows = [
        (1, bytearray(encode_png(img[..., None]))),
        (2, bytearray(jpg1)),
        (3, bytearray(jpg2)),
        (9, bytearray(encode_png(_textured(51)[..., None]))),  # unrelated
    ]
    media = spark.createDataFrame(rows, "item_id long, payload binary")
    hashes = featurize_phash(media)
    out = {r["item_id"]: r for r in image_dedup_clusters(hashes).collect()}
    assert out[1]["cluster"] == out[2]["cluster"] == out[3]["cluster"] == 1
    assert out[9]["cluster"] == 9 and out[9]["survivor"] == 1
    assert out[1]["survivor"] == 1 and out[2]["survivor"] == 0
