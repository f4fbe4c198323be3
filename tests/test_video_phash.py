"""Video near-dup via keyframe pHash sequences (functions/phash.py).

Composes the already-tested pieces — AVI DIB decode, pHash, pigeonhole
banding — into a video-level signature; these tests pin the composition
semantics on raw-DIB AVIs whose pixels are controlled exactly.
"""

import numpy as np
import pytest

from rustcheatersdatapipeline_spark.functions.phash import (
    featurize_video_phash,
    video_neardup,
)

from .test_avi_decode import _dib_frame, build_avi

W, H = 32, 24


def _frame(k: int) -> np.ndarray:
    """Structured content: a horizontal gradient with a bright square
    whose position encodes the frame index — perceptually distinct
    frames, stable pHash under small perturbations."""
    px = np.zeros((H, W, 3), np.uint8)
    px[:, :, 0] = np.linspace(0, 200, W, dtype=np.uint8)[None, :]
    px[:, :, 1] = np.linspace(200, 0, H, dtype=np.uint8)[:, None]
    x = 2 + 3 * k
    px[6:14, x : x + 6, :] = 255
    return px


def _avi(frames: list[np.ndarray]) -> bytes:
    return build_avi(W, H, [_dib_frame(f) for f in frames], handler=b"DIB ", kind=b"db")


def _media(spark, items: dict[int, bytes]):
    return spark.createDataFrame(
        [(i, bytearray(b)) for i, b in items.items()], "item_id bigint, payload binary"
    )


BASE = [_frame(k) for k in range(6)]


def _noisy(f: np.ndarray) -> np.ndarray:
    g = f.astype(np.int16).copy()
    g[::4, ::4, :] += 2  # mild uniform brightening of a sparse grid
    return np.clip(g, 0, 255).astype(np.uint8)


def test_signatures_are_duration_normalized(spark):
    """The same content re-muxed at 2x the frame count (every frame
    doubled) samples IDENTICAL keyframes."""
    doubled = [f for f in BASE for _ in (0, 1)]
    sigs = featurize_video_phash(
        _media(spark, {1: _avi(BASE), 2: _avi(doubled)})
    ).collect()
    by_item = {}
    for r in sigs:
        by_item.setdefault(r["item_id"], {})[r["frame_rank"]] = r["phash"]
    assert by_item[1] == by_item[2]
    assert set(by_item[1]) == {0, 1, 2, 3}


def test_neardup_finds_noisy_copy_and_rejects_distinct(spark):
    noisy = [_noisy(f) for f in BASE]
    other = [_frame(5 - k)[::-1] for k in range(6)]  # different content
    sigs = featurize_video_phash(
        _media(spark, {1: _avi(BASE), 2: _avi(noisy), 3: _avi(other)})
    )
    pairs = {(r["item_a"], r["item_b"]): r["n_frames_matched"]
             for r in video_neardup(sigs).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] >= 3
    assert all(3 not in p for p in pairs)


def test_single_scene_collision_is_not_a_pair(spark):
    """Two videos sharing ONE scene (rank) must not pair at the default
    3-of-4 vote."""
    shared_last = [_frame(5 - k) for k in range(5)] + [BASE[5]]
    sigs = featurize_video_phash(_media(spark, {1: _avi(BASE), 2: _avi(shared_last)}))
    assert video_neardup(sigs).collect() == []


def test_rank_tolerance_catches_trimmed_copy(spark):
    """A copy missing the first frame mismatches on aligned ranks but
    matches neighbors with rank_tolerance=1."""
    trimmed = BASE[1:]
    sigs = featurize_video_phash(_media(spark, {1: _avi(BASE), 2: _avi(trimmed)}))
    strict = video_neardup(sigs, min_matching=2).collect()
    loose = video_neardup(sigs, min_matching=2, rank_tolerance=1).collect()
    assert len(loose) == 1 and loose[0]["n_frames_matched"] >= 2
    # and the loose match strictly dominates the aligned one
    strict_n = strict[0]["n_frames_matched"] if strict else 0
    assert loose[0]["n_frames_matched"] >= strict_n


def test_undecodable_payload_quarantines_out(spark):
    sigs = featurize_video_phash(
        _media(spark, {1: _avi(BASE), 2: b"\x00not a video"})
    ).collect()
    assert {r["item_id"] for r in sigs} == {1}


def test_n_frames_validation(spark):
    with pytest.raises(ValueError, match="n_frames"):
        featurize_video_phash(_media(spark, {1: _avi(BASE)}), n_frames=1)


def test_video_neardup_complete_vs_bruteforce(spark):
    """Banded candidates must find EXACTLY the brute-force pair set on
    random signatures with planted near-pairs (completeness is the
    pigeonhole claim, lifted to sequences)."""
    import itertools
    import random

    rng = random.Random(8)
    n, ranks = 30, 4
    sigs = {}
    for i in range(n):
        sigs[i] = [rng.getrandbits(64) for _ in range(ranks)]
    # plant: 5 pairs at controlled per-frame distances
    for j, (a, b) in enumerate([(0, 1), (2, 3), (4, 5), (6, 7), (8, 9)]):
        base = sigs[a]
        copy = []
        for r, h in enumerate(base):
            flips = rng.sample(range(64), j % 4)  # hamming 0..3 per frame
            for f in flips:
                h ^= 1 << f
            copy.append(h)
        sigs[b] = copy

    def ham(x, y):
        return bin(x ^ y).count("1")

    expect = set()
    for a, b in itertools.combinations(range(n), 2):
        matched = sum(1 for r in range(ranks) if ham(sigs[a][r], sigs[b][r]) <= 3)
        if matched >= 3:
            expect.add((a, b))

    rows = [
        (i, r, h - (1 << 64) if h >= (1 << 63) else h)
        for i, hs in sigs.items()
        for r, h in enumerate(hs)
    ]
    df = spark.createDataFrame(rows, "item_id bigint, frame_rank int, phash bigint")
    got = {(r["item_a"], r["item_b"]) for r in video_neardup(df).collect()}
    assert got == expect and len(expect) >= 4
