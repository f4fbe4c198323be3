"""Perceptual image hashing (pHash, DCT variant — public method) and
image near-duplicate detection over media payloads.

The image-side twin of the text SimHash pipeline: re-encoded,
resized, or slightly-retouched copies of an image survive in crawl
data where byte-level dedup sees distinct payloads. pHash reduces each
image to a 64-bit sketch of its low-frequency structure — gray
downscale to 32×32, 2-D DCT, keep the 8×8 lowest AC frequencies,
threshold at their median — so perceptually-equal images land within a
few bits of Hamming distance.

Scale shape (mirrors ``plans/training.py simhash_neardup``): hashing
is one Arrow ``mapInPandas`` pass over payload bytes (decode already
is the declared Python boundary); candidate generation splits the
64-bit hash into ``HAM_K + 1`` bands — the pigeonhole principle makes
the band equi-join COMPLETE for Hamming ≤ ``HAM_K`` (any pair within
the radius agrees on at least one full band) — and verification is a
codegen'd ``bit_count(xor)``. No pairwise scan at any corpus size.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Hamming radius for near-duplicate pairs; 4 bands of 16 bits make the
#: band join complete for distance <= 3 (pigeonhole: 3 flipped bits can
#: touch at most 3 of the 4 bands, so one band always matches exactly)
HAM_K = 3
N_BANDS = HAM_K + 1

_RESIZE = 32
_KEEP = 8


def _dct_matrix(n: int) -> np.ndarray:
    x = np.arange(n)
    u = x.reshape(n, 1)
    c = np.cos((2 * x + 1) * u * np.pi / (2 * n)) * np.sqrt(2.0 / n)
    c[0] *= 1 / np.sqrt(2)
    return c


_C32 = _dct_matrix(_RESIZE)


def phash64(px: np.ndarray) -> int:
    """64-bit DCT pHash of an image array (h, w[, channels]), uint8.

    Deterministic and resolution-independent: nearest-index downscale to
    32×32 gray, orthonormal 2-D DCT, the 8×8 lowest-frequency block
    minus the DC term thresholded at its median. Returns an UNSIGNED
    value in [0, 2^64) packed row-major (bit 63 = first coefficient)."""
    a = np.asarray(px, np.float64)
    if a.ndim == 3:
        a = a.mean(axis=2)
    if a.ndim != 2 or a.shape[0] < 2 or a.shape[1] < 2:
        raise ValueError("phash64: need a (h, w[, c]) image with h, w >= 2")
    ys = (np.arange(_RESIZE) * a.shape[0] // _RESIZE).astype(np.int64)
    xs = (np.arange(_RESIZE) * a.shape[1] // _RESIZE).astype(np.int64)
    small = a[np.ix_(ys, xs)]
    freq = _C32 @ small @ _C32.T
    block = freq[:_KEEP, :_KEEP].copy().reshape(-1)
    block[0] = np.median(block[1:])  # DC carries only global brightness
    bits = block > np.median(block)
    h = 0
    for b in bits:
        h = (h << 1) | int(b)
    return h


PHASH_SCHEMA = "item_id bigint, phash bigint, width int, height int"


def featurize_phash(media: DataFrame) -> DataFrame:
    """(item_id, phash, width, height) for every decodable IMAGE payload
    (PNG/GIF first frame/JPEG incl. progressive); undecodable or non-image rows
    are dropped — they quarantine through ``featurize_pixels``' path,
    not here. ``phash`` is stored as a SIGNED 64-bit reinterpretation so
    it stays a plain bigint column."""
    from .pixels import DECODE_QUARANTINE, decode_image_payload

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for item_id, payload in zip(pdf["item_id"], pdf["payload"]):
                buf = bytes(payload) if payload is not None else b""
                try:
                    px = decode_image_payload(buf)
                    if px is None:
                        continue
                    h = phash64(px)
                except DECODE_QUARANTINE:
                    continue
                rows.append(
                    {
                        "item_id": item_id,
                        "phash": h - (1 << 64) if h >= (1 << 63) else h,
                        "width": int(px.shape[1]),
                        "height": int(px.shape[0]),
                    }
                )
            yield pd.DataFrame(
                rows, columns=["item_id", "phash", "width", "height"]
            )

    return media.mapInPandas(run, schema=PHASH_SCHEMA)


def explode_bands(hashes: DataFrame, extra: tuple[str, ...] = ("item_id",)) -> DataFrame:
    """(extra..., phash, band, key): the pigeonhole band split of the
    ``phash`` column — shared by batch near-dup and the incremental
    media index path so the two can never band differently."""
    width = 64 // N_BANDS
    return hashes.select(
        *extra,
        "phash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftrightunsigned(F.col("phash"), i * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("key"),
                    )
                    for i in range(N_BANDS)
                ]
            )
        ).alias("bk"),
    ).select(*extra, "phash", "bk.band", "bk.key")


def image_neardup(hashes: DataFrame, max_hamming: int = HAM_K) -> DataFrame:
    """(item_a, item_b, hamming) pairs with Hamming(phash) <= radius.

    Complete by the pigeonhole band split (``N_BANDS`` 16-bit bands for
    the default radius 3); verification is codegen'd
    ``bit_count(a XOR b)`` on the candidates only. The default radius
    catches re-encodes and mild retouches; raise it (with more bands)
    only with a recall audit."""
    if max_hamming >= N_BANDS:
        raise ValueError("bands must outnumber the Hamming radius")
    bands = explode_bands(hashes)
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.item_id") < F.col("b.item_id")),
        )
        .select(
            F.col("a.item_id").alias("item_a"),
            F.col("b.item_id").alias("item_b"),
            F.col("a.phash").alias("ha"),
            F.col("b.phash").alias("hb"),
        )
        .distinct()
    )
    ham = F.expr("bit_count(ha ^ hb)").alias("hamming")
    return (
        cand.select("item_a", "item_b", ham)
        .filter(F.col("hamming") <= max_hamming)
        .orderBy("item_a", "item_b")
    )


def image_dedup_clusters(hashes: DataFrame, max_hamming: int = HAM_K) -> DataFrame:
    """(item_id, cluster, survivor) — perceptual duplicate FAMILIES.

    Pairwise near-dup misses transitive chains (A≈B, B≈C but A̸≈C:
    progressive re-encodes drift a few bits per hop); clustering the
    pair graph with the engine's pointer-jumping connected components
    (operators/graph.py, O(log diameter) rounds) groups the whole
    family, and the min-id member is the deterministic survivor —
    identical survivor-election semantics to the text-side
    ``dedup_cluster``. Items with no near pair form singleton clusters
    (survivor = themselves)."""
    from ..operators.graph import connected_components

    pairs = image_neardup(hashes, max_hamming)
    comp = connected_components(pairs, "item_a", "item_b")
    return (
        hashes.select("item_id")
        .join(comp.withColumnRenamed("node", "item_id"), "item_id", "left")
        .select(
            "item_id",
            F.coalesce(F.col("component"), F.col("item_id")).alias("cluster"),
        )
        .withColumn("survivor", (F.col("item_id") == F.col("cluster")).cast("int"))
    )


# --------------------------------------------------------------------------
# video: keyframe pHash sequences
# --------------------------------------------------------------------------

#: evenly-spaced keyframes hashed per video, and how many of those rank
#: positions must match (each within HAM_K) for a near-dup verdict —
#: 3-of-4 tolerates one scene swap/retitle while rejecting coincidental
#: single-frame collisions
VIDEO_FRAMES = 4
VIDEO_MIN_MATCH = 3

VIDEO_PHASH_SCHEMA = "item_id bigint, frame_rank int, phash bigint"


def featurize_video_phash(media: DataFrame, n_frames: int = VIDEO_FRAMES) -> DataFrame:
    """(item_id, frame_rank, phash) — pHash of ``n_frames`` evenly-spaced
    frames per multi-frame payload (AVI/GIF/APNG through the shared
    decode dispatch). Rank positions are duration-NORMALIZED (rank r
    samples frame ⌊r·(T−1)/(n−1)⌋), so two copies of the same content at
    different frame counts (re-muxed, fps-converted) hash the same
    positions. One decode per video, no per-frame PNG round-trip;
    undecodable payloads quarantine out exactly like the still path."""
    if n_frames < 2:
        raise ValueError("featurize_video_phash: n_frames must be >= 2")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .pixels import DECODE_QUARANTINE, decode_image_frames

        cols = ["item_id", "frame_rank", "phash"]
        for pdf in batches:
            rows = []
            for item_id, payload in zip(pdf["item_id"], pdf["payload"]):
                buf = bytes(payload) if payload is not None else b""
                try:
                    frames = decode_image_frames(buf)
                except DECODE_QUARANTINE:
                    continue
                if frames is None or frames.shape[0] == 0:
                    continue
                t = frames.shape[0]
                for r in range(n_frames):
                    idx = (r * (t - 1)) // (n_frames - 1)
                    h = phash64(frames[idx])
                    rows.append(
                        {
                            "item_id": item_id,
                            "frame_rank": r,
                            "phash": h - (1 << 64) if h >= (1 << 63) else h,
                        }
                    )
            yield pd.DataFrame(rows, columns=cols)

    return media.mapInPandas(run, schema=VIDEO_PHASH_SCHEMA)


def video_neardup(
    sigs: DataFrame,
    min_matching: int = VIDEO_MIN_MATCH,
    max_hamming: int = HAM_K,
    rank_tolerance: int = 0,
) -> DataFrame:
    """(item_a, item_b, n_frames_matched) video near-dup pairs: at least
    ``min_matching`` rank positions whose frame pHashes are within
    ``max_hamming``.

    Candidates reuse the image pigeonhole machinery per frame — the
    band equi-join is complete for each frame pair within the radius,
    and a qualifying VIDEO pair needs every counted frame pair to be
    within the radius, so completeness lifts from frames to videos.
    ``rank_tolerance=1`` also matches neighboring rank positions
    (trimmed/offset copies) at ~3x the candidate volume. Never a
    pairwise scan: candidates ≈ videos sharing a (band, key) bucket per
    rank."""
    if max_hamming >= N_BANDS:
        raise ValueError("bands must outnumber the Hamming radius")
    bands = explode_bands(sigs, extra=("item_id", "frame_rank"))
    a, b = bands.alias("a"), bands.alias("b")
    rank_cond = (
        (F.col("a.frame_rank") == F.col("b.frame_rank"))
        if rank_tolerance == 0
        else (
            F.abs(F.col("a.frame_rank") - F.col("b.frame_rank")) <= rank_tolerance
        )
    )
    matched = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.item_id") < F.col("b.item_id"))
            & rank_cond,
        )
        .select(
            F.col("a.item_id").alias("item_a"),
            F.col("b.item_id").alias("item_b"),
            F.col("a.frame_rank").alias("rank_a"),
            F.col("b.frame_rank").alias("rank_b"),
            F.expr("bit_count(a.phash ^ b.phash)").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("item_a", "item_b", "rank_a")
        .distinct()  # one vote per (pair, source rank) however many bands agree
    )
    return (
        matched.groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).cast("int").alias("n_frames_matched"))
        .filter(F.col("n_frames_matched") >= min_matching)
        .orderBy("item_a", "item_b")
    )
