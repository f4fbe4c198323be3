"""Audio feature extraction (functions/audio.py): the features must
match first-principles DSP expectations on synthesized signals — a pure
tone's ZCR is 2·f/rate and its spectral centroid sits at f; white noise
is brighter than any tone; silence has zero RMS; a square wave at full
scale clips."""

import numpy as np
import pytest

from rustcheatersdatapipeline_spark.functions.audio import (
    audio_features,
    featurize_audio,
)
from tests.test_pixels_decode import encode_wav


def _tone(f: float, rate: int = 8000, sec: float = 1.0, amp: float = 0.5) -> np.ndarray:
    t = np.arange(int(rate * sec)) / rate
    return (np.sin(2 * np.pi * f * t) * amp * 32767).astype(np.int16)[:, None]


def test_pure_tone_zcr_and_centroid():
    rate, f = 8000, 440.0
    feat = audio_features(_tone(f, rate), rate)
    assert feat["zcr"] == pytest.approx(2 * f / rate, rel=0.05)
    assert feat["centroid_hz"] == pytest.approx(f, rel=0.25)  # window leakage
    assert feat["rolloff_hz"] < 1200
    assert feat["clip_ratio"] == 0.0
    assert feat["duration_s"] == pytest.approx(1.0)


def test_noise_brighter_than_tone():
    rate = 8000
    rng = np.random.RandomState(0)
    noise = (rng.uniform(-0.5, 0.5, rate) * 32767).astype(np.int16)[:, None]
    tone = audio_features(_tone(300, rate), rate)
    white = audio_features(noise, rate)
    assert white["centroid_hz"] > 2 * tone["centroid_hz"]
    assert white["zcr"] > tone["zcr"]


def test_silence_and_clipping():
    rate = 8000
    silent = audio_features(np.zeros((rate, 1), np.int16), rate)
    assert silent["rms_mean"] == 0.0 and silent["centroid_hz"] == 0.0
    square = (np.sign(_tone(200, rate, amp=1.0)) * 32767).astype(np.int16)
    clipped = audio_features(square, rate)
    assert clipped["clip_ratio"] > 0.9


def test_stereo_and_8bit_paths():
    rate = 8000
    stereo = np.repeat(_tone(440, rate), 2, axis=1)
    feat = audio_features(stereo, rate)
    assert feat["channels"] == 2
    eight = ((_tone(440, rate, amp=0.4)[:, 0] / 256) + 128).astype(np.uint8)[:, None]
    f8 = audio_features(eight, rate, bits=8)
    assert f8["zcr"] == pytest.approx(2 * 440 / rate, rel=0.05)


def test_degenerate_raises():
    with pytest.raises(ValueError):
        audio_features(np.zeros((0, 1), np.int16), 8000)


@pytest.mark.slow
def test_spark_featurize_with_quarantine(spark):
    rate = 16000
    wav = encode_wav(_tone(440, rate), rate=rate)
    rows = [
        (1, bytearray(wav)),
        (2, bytearray(b"\xde\xad\xbe\xef" * 4)),  # not audio → NULL row
    ]
    media = spark.createDataFrame(rows, "item_id long, payload binary")
    out = {r["item_id"]: r for r in featurize_audio(media).collect()}
    assert out[1]["rate"] == rate
    assert out[1]["zcr"] == pytest.approx(2 * 440 / rate, rel=0.05)
    assert out[2]["rate"] is None and out[2]["zcr"] is None


def _ham(a: int, b: int) -> int:
    return bin((a % (1 << 64)) ^ (b % (1 << 64))).count("1")


def _chord(freqs, rate=8000, sec=1.0, amp=0.2, noise=0.0, seed=0):
    t = np.arange(int(rate * sec)) / rate
    rng = np.random.RandomState(seed)
    sig = sum(np.sin(2 * np.pi * f * t + i) for i, f in enumerate(freqs))
    sig = sig * amp / len(freqs) + rng.normal(0, noise, len(t))
    return (np.clip(sig, -1, 1) * 32767).astype(np.int16)[:, None]


def test_fingerprint_volume_invariant_and_noise_robust():
    from rustcheatersdatapipeline_spark.functions.audio import audio_fingerprint

    base = _chord([300, 700, 1500])
    fp = audio_fingerprint(base, 8000)
    louder = _chord([300, 700, 1500], amp=0.5)
    assert _ham(fp, audio_fingerprint(louder, 8000)) <= 3
    noisy = _chord([300, 700, 1500], noise=0.01, seed=5)
    assert _ham(fp, audio_fingerprint(noisy, 8000)) <= 3


def _varied_clip(seed: int, rate: int = 8000) -> np.ndarray:
    """Time-varying clip with a seed-chosen spectral occupancy: two
    halves, each a chord of 3 tones drawn from distinct octave bands —
    the structure real audio has (stationary equal-energy chords are
    the known degenerate case for ANY occupancy sketch: two different
    chords can legitimately share coarse band occupancy)."""
    rng = np.random.RandomState(seed)
    centers = np.geomspace(60, 3600, 12)
    halves = []
    for _ in range(2):
        freqs = rng.choice(centers, size=3, replace=False)
        halves.append(_chord(list(freqs), rate=rate, sec=0.5, noise=0.01, seed=seed))
    return np.concatenate(halves)


def test_fingerprint_separates_unrelated_clips():
    from rustcheatersdatapipeline_spark.functions.audio import audio_fingerprint

    fps = [audio_fingerprint(_varied_clip(s), 8000) for s in range(10)]
    dists = [_ham(a, b) for i, a in enumerate(fps) for b in fps[i + 1 :]]
    assert min(dists) > 3
    assert sum(dists) / len(dists) > 10


@pytest.mark.slow
def test_audio_neardup_via_shared_banding(spark):
    """The pHash banded join is modality-blind: feed audio fingerprints
    through image_neardup and find the planted volume-twin."""
    from rustcheatersdatapipeline_spark.functions.audio import (
        featurize_audio_fingerprint,
    )
    from rustcheatersdatapipeline_spark.functions.phash import image_neardup

    rows = [
        (1, bytearray(encode_wav(_chord([300, 700, 1500]), rate=8000))),
        (2, bytearray(encode_wav(_chord([300, 700, 1500], amp=0.5), rate=8000))),
        (3, bytearray(encode_wav(_chord([450, 1100, 2600], seed=9), rate=8000))),
        (4, bytearray(b"not audio at all")),
    ]
    media = spark.createDataFrame(rows, "item_id long, payload binary")
    fps = featurize_audio_fingerprint(media)
    assert fps.count() == 3  # junk skipped
    pairs = {(r["item_a"], r["item_b"]) for r in image_neardup(fps).collect()}
    assert (1, 2) in pairs
    assert all(3 not in p for p in pairs)


def test_fingerprint_shift_tolerance_silence_pad():
    """Round-6 directive #7: the base fingerprint is alignment-sensitive
    — a silence pad shifts every segment. The trim-anchored variant must
    re-anchor a 5%-padded clip to the same grid (near-zero Hamming)."""
    from rustcheatersdatapipeline_spark.functions.audio import (
        audio_fingerprint,
        audio_fingerprint_anchors,
    )

    clip = _varied_clip(3)
    for frac in (20, 4):  # 5% and 25% (≈ the 0.5 s case) leading silence
        pad = np.zeros((len(clip) // frac, 1), np.int16)
        padded = np.concatenate([pad, clip])
        base = audio_fingerprint_anchors(clip, 8000, n_anchors=4)
        shifted = audio_fingerprint_anchors(padded, 8000, n_anchors=4)
        # anchor-0 alone agrees: trim alignment removes the pad entirely
        assert _ham(base[0], shifted[0]) <= 3
        assert min(_ham(a, b) for a in base for b in shifted) <= 3
    # the failure the variant exists for: the UNALIGNED fingerprint of a
    # 25%-padded clip drifts past the radius (measured 5-9 across seeds)
    quarter = np.concatenate([np.zeros((len(clip) // 4, 1), np.int16), clip])
    assert _ham(audio_fingerprint(clip, 8000), audio_fingerprint(quarter, 8000)) > 3


def test_fingerprint_shift_tolerance_crop():
    """A 5% head CROP (content offset, not silence) must still land
    within the radius through SOME anchor pair."""
    from rustcheatersdatapipeline_spark.functions.audio import (
        audio_fingerprint_anchors,
    )

    clip = _varied_clip(4)
    cropped = clip[len(clip) // 20 :]
    base = audio_fingerprint_anchors(clip, 8000, n_anchors=4)
    shifted = audio_fingerprint_anchors(cropped, 8000, n_anchors=4)
    assert min(_ham(a, b) for a in base for b in shifted) <= 3


def test_fingerprint_shift_variant_still_separates():
    from rustcheatersdatapipeline_spark.functions.audio import (
        audio_fingerprint_anchors,
    )

    sets = [audio_fingerprint_anchors(_varied_clip(s), 8000) for s in range(10, 18)]
    cross = [
        min(_ham(a, b) for a in sets[i] for b in sets[j])
        for i in range(len(sets))
        for j in range(i + 1, len(sets))
    ]
    assert min(cross) > 3  # no anchor pair of unrelated clips collides


def test_audio_shift_neardup_spark_end_to_end(spark):
    """The offset twin is found through the shared banded join; the
    distinct clip stays isolated — same machinery, multi-row index."""
    from rustcheatersdatapipeline_spark.functions.audio import (
        featurize_audio_fingerprint_shift,
    )
    from rustcheatersdatapipeline_spark.functions.phash import image_neardup

    clip = _varied_clip(21)
    pad = np.zeros((len(clip) // 20, 1), np.int16)
    rows = [
        (1, bytearray(encode_wav(clip, rate=8000))),
        (2, bytearray(encode_wav(np.concatenate([pad, clip]), rate=8000))),
        (3, bytearray(encode_wav(_varied_clip(35), rate=8000))),
    ]
    media = spark.createDataFrame(rows, "item_id long, payload binary")
    fps = featurize_audio_fingerprint_shift(media)
    assert fps.count() == 12  # 4 anchors x 3 clips
    pairs = {(r["item_a"], r["item_b"]) for r in image_neardup(fps).collect()}
    assert (1, 2) in pairs
    assert all(3 not in p for p in pairs)
