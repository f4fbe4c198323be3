"""Audio feature extraction over decoded PCM payloads — pure numpy.

The audio-side analog of ``featurize_pixels``: WAV payloads decode
(functions/pixels.py) and reduce to BOUNDED per-item spectral/temporal
features — never re-materialized samples — in one Arrow ``mapInPandas``
pass. Features are the standard public DSP set a data-curation pipeline
filters on (silence/clipping detection, tonal-vs-noise separation):

- duration / sample rate / channel count
- RMS envelope mean+std over 1024-sample frames (silence ↔ dynamics)
- clipping ratio (|sample| at full scale)
- zero-crossing rate (tonal content ≈ 2·f₀/rate for a pure tone)
- spectral centroid and 85 % rolloff in Hz (brightness), via the
  magnitude spectrum of the mean-over-channels signal (numpy rFFT,
  Hann window, frame-averaged)

Undecodable/corrupt payloads quarantine as NULL-feature rows with the
mime sentinel, same never-fail contract as the pixel path.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

FRAME = 1024

AUDIO_FEATURES_SCHEMA = (
    "item_id bigint, rate int, channels int, n_samples bigint, "
    "duration_s double, rms_mean double, rms_std double, clip_ratio double, "
    "zcr double, centroid_hz double, rolloff_hz double"
)


def audio_features(samples: np.ndarray, rate: int, bits: int = 16) -> dict:
    """Bounded feature dict for a (n_frames, channels) PCM array."""
    if samples.ndim != 2 or samples.size == 0 or rate <= 0:
        raise ValueError("audio_features: need non-empty (n, ch) samples")
    full = float(2 ** (bits - 1) - 1)
    if samples.dtype == np.uint8:  # 8-bit WAV is unsigned, center it
        x = samples.astype(np.float64) - 128.0
        full = 127.0
    else:
        x = samples.astype(np.float64)
    mono = x.mean(axis=1) / full
    n = mono.shape[0]

    nf = max(n // FRAME, 1)
    frames = mono[: nf * FRAME].reshape(nf, -1)
    rms = np.sqrt((frames**2).mean(axis=1))
    clip = float((np.abs(mono) >= 0.999).mean())
    zcr = float((np.diff(np.signbit(mono)) != 0).mean()) if n > 1 else 0.0

    win = np.hanning(frames.shape[1])
    mag = np.abs(np.fft.rfft(frames * win, axis=1)).mean(axis=0)
    freqs = np.fft.rfftfreq(frames.shape[1], d=1.0 / rate)
    total = mag.sum()
    if total > 0:
        centroid = float((freqs * mag).sum() / total)
        roll_idx = int(np.searchsorted(np.cumsum(mag), 0.85 * total))
        rolloff = float(freqs[min(roll_idx, len(freqs) - 1)])
    else:
        centroid = 0.0
        rolloff = 0.0
    return {
        "rate": int(rate),
        "channels": int(samples.shape[1]),
        "n_samples": int(n),
        "duration_s": float(n / rate),
        "rms_mean": float(rms.mean()),
        "rms_std": float(rms.std()),
        "clip_ratio": clip,
        "zcr": zcr,
        "centroid_hz": centroid,
        "rolloff_hz": rolloff,
    }


_NULL_FEAT = {k: None for k in (
    "rate", "channels", "n_samples", "duration_s", "rms_mean", "rms_std",
    "clip_ratio", "zcr", "centroid_hz", "rolloff_hz",
)}


def decode_audio_samples(buf: bytes) -> tuple[np.ndarray, int, int]:
    """(samples (n, ch), rate, bits) for any stdlib-decodable audio
    payload — PCM WAV, FLAC (functions/flac.py), MP3 (functions/mp3.py) or Ogg
    Vorbis (functions/vorbis.py). The single dispatch
    point all audio featurizers share, so adding a codec extends the
    whole feature/fingerprint stack at once."""
    from .pixels import decode_wav_samples

    if buf[:4] == b"fLaC":
        from .flac import decode_flac_samples, parse_flac_header

        samples, rate = decode_flac_samples(buf)
        return samples, rate, parse_flac_header(buf)[2]
    if buf[:4] == b"OggS":
        from .vorbis import decode_vorbis_samples

        samples, rate = decode_vorbis_samples(buf)
        return samples, rate, 16
    if buf[:4] == b"\x1aE\xdf\xa3":  # EBML: WebM/Matroska audio track
        from .webm import decode_webm_audio

        samples, rate = decode_webm_audio(buf)
        return samples, rate, 16
    if buf[:3] == b"ID3" or (
        len(buf) >= 4 and buf[0] == 0xFF and (buf[1] & 0xE0) == 0xE0
    ):
        from .multimodal import parse_mp3_header

        if parse_mp3_header(buf) is not None:
            from .mp3 import decode_mp3_samples

            samples, rate = decode_mp3_samples(buf)
            return samples, rate, 16
    samples, rate = decode_wav_samples(buf)
    bits = {np.dtype("u1"): 8, np.dtype("<i2"): 16}.get(samples.dtype, 32)
    return samples, rate, bits


def featurize_audio(media: DataFrame) -> DataFrame:
    """(item_id, features...) for every decodable PCM WAV payload;
    non-audio or corrupt payloads yield NULL-feature rows (quarantine,
    never a task failure)."""
    from .pixels import DECODE_QUARANTINE

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["item_id", *_NULL_FEAT]
        for pdf in batches:
            rows = []
            for item_id, payload in zip(pdf["item_id"], pdf["payload"]):
                buf = bytes(payload) if payload is not None else b""
                try:
                    samples, rate, bits = decode_audio_samples(buf)
                    feat = audio_features(samples, rate, bits)
                except DECODE_QUARANTINE:
                    feat = _NULL_FEAT
                rows.append({"item_id": item_id, **feat})
            yield pd.DataFrame(rows, columns=cols)

    return media.mapInPandas(run, schema=AUDIO_FEATURES_SCHEMA)


# ------------------------------------------------------------------ near-dup

#: fingerprint layout: time segments x band bits = 64
_FP_SEGMENTS = 8
_FP_BANDS = 8


def audio_fingerprint(samples: np.ndarray, rate: int, bits: int = 16) -> int:
    """64-bit perceptual audio fingerprint (band-energy occupancy — the
    spectral-sketch family of Haitsma-Kalker, public method): split the
    clip into 8 equal time segments, measure 8 log-spaced band energies
    per segment (rFFT), and emit ``energy > mean(segment energies)/2``
    per band — 8 x 8 = 64 bits. The threshold is RELATIVE, so the bits
    are volume-invariant; it sits midway between an occupied band and
    an empty one, so re-encode/quantization noise cannot flip it
    (adjacent-band delta SIGNS — the naive rule — are coin flips
    whenever two bands carry equal energy, e.g. any multi-tone or
    stationary signal). Unrelated audio differs wherever its spectral
    occupancy differs; pairs within Hamming <= 3 are perceptual twins —
    ``phash.explode_bands``/``image_neardup`` apply verbatim (the
    banding math is modality-blind)."""
    if samples.ndim != 2 or samples.size == 0 or rate <= 0:
        raise ValueError("audio_fingerprint: need non-empty (n, ch) samples")
    full = 127.0 if samples.dtype == np.uint8 else float(2 ** (bits - 1) - 1)
    x = (samples.astype(np.float64) - 128.0) if samples.dtype == np.uint8 else samples.astype(np.float64)
    mono = x.mean(axis=1) / full
    n = len(mono)
    if n < _FP_SEGMENTS * 16:
        raise ValueError("audio_fingerprint: clip too short to segment")
    seg_len = n // _FP_SEGMENTS
    # log-spaced band edges over the usable spectrum
    edges = np.unique(
        np.geomspace(2, seg_len // 2, _FP_BANDS + 1).astype(np.int64)
    )
    while len(edges) < _FP_BANDS + 1:  # short clips: pad linearly
        edges = np.append(edges, edges[-1] + 1)
    fp = 0
    for s in range(_FP_SEGMENTS):
        seg = mono[s * seg_len : (s + 1) * seg_len]
        mag = np.abs(np.fft.rfft(seg * np.hanning(len(seg)))) ** 2
        energies = np.array(
            [mag[edges[b] : edges[b + 1]].sum() for b in range(_FP_BANDS)]
        )
        thresh = energies.mean() / 2.0
        for e in energies:
            fp = (fp << 1) | int(e > thresh)
    return fp


#: silence floor for trim alignment, relative to the clip's peak |amp|
_TRIM_REL_AMP = 0.02


def _trim_silence(mono: np.ndarray) -> np.ndarray:
    """Strip leading/trailing samples below a RELATIVE amplitude floor —
    the alignment anchor that makes padding-induced time shifts (the
    common re-encode artifact) vanish before segmentation. Relative so
    volume changes do not move the anchor; all-silent clips return
    themselves (nothing to anchor on)."""
    peak = float(np.abs(mono).max())
    if peak <= 0.0:
        return mono
    live = np.flatnonzero(np.abs(mono) >= peak * _TRIM_REL_AMP)
    return mono[live[0] : live[-1] + 1] if live.size else mono


def audio_fingerprint_anchors(
    samples: np.ndarray, rate: int, bits: int = 16, n_anchors: int = 4, trim: bool = True
) -> list[int]:
    """Shift-tolerant fingerprints: the 64-bit band-occupancy sketch
    computed at ``n_anchors`` sub-segment offsets of the segmentation
    grid (offset j·seg_len/n_anchors), after optionally trimming
    leading/trailing silence.

    Why: the base fingerprint's segment grid is anchored at sample 0, so
    a time offset shifts every segment's content — a 0.5 s pad can flip
    bits across all 8 segments at once. Two complementary fixes, both
    reusing the banded-join machinery unchanged:

    - **trim alignment** removes the offset entirely when it is silence
      (padding, encoder priming) — the shifted clip re-anchors to the
      same first audible sample;
    - **sliding anchors** cover content offsets (crops): any residual
      shift is within seg_len/(2·n_anchors) of SOME anchor, so one of
      the emitted fingerprints sees near-identical segment content and
      lands within the Hamming radius of the counterpart's anchor set.

    Emitting multiple (item, phash) rows is exactly the multiprobe shape
    ann_lsh_search_multiprobe uses: candidates come from ANY anchor
    pair; pairs dedup in the band join's ``distinct``."""
    if samples.ndim != 2 or samples.size == 0 or rate <= 0:
        raise ValueError("audio_fingerprint_anchors: need non-empty (n, ch) samples")
    full = 127.0 if samples.dtype == np.uint8 else float(2 ** (bits - 1) - 1)
    x = (samples.astype(np.float64) - 128.0) if samples.dtype == np.uint8 else samples.astype(np.float64)
    mono = x.mean(axis=1) / full
    if trim:
        mono = _trim_silence(mono)
    n = len(mono)
    if n < _FP_SEGMENTS * 16:
        raise ValueError("audio_fingerprint_anchors: clip too short to segment")
    seg_len = n // _FP_SEGMENTS
    two_d = mono.reshape(-1, 1)
    out = []
    for j in range(max(n_anchors, 1)):
        off = j * seg_len // max(n_anchors, 1)
        part = two_d[off:]
        if len(part) < _FP_SEGMENTS * 16:
            break
        # bits=16 with float input: full-scale already normalized above
        out.append(audio_fingerprint((part * 32767.0).astype("<i2"), rate, 16))
    return out


def featurize_audio_fingerprint(media: DataFrame) -> DataFrame:
    """(item_id, phash) rows for every decodable, long-enough WAV —
    column named ``phash`` so ``functions.phash.image_neardup`` /
    ``explode_bands`` / ``image_dedup_clusters`` apply verbatim to
    audio (the banding math is modality-blind: 64 bits are 64 bits)."""
    from .pixels import DECODE_QUARANTINE

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for item_id, payload in zip(pdf["item_id"], pdf["payload"]):
                buf = bytes(payload) if payload is not None else b""
                try:
                    samples, rate, bits = decode_audio_samples(buf)
                    fp = audio_fingerprint(samples, rate, bits)
                except DECODE_QUARANTINE:
                    continue
                rows.append(
                    {"item_id": item_id, "phash": fp - (1 << 64) if fp >= (1 << 63) else fp}
                )
            yield pd.DataFrame(rows, columns=["item_id", "phash"])

    return media.mapInPandas(run, schema="item_id bigint, phash bigint")


def featurize_audio_fingerprint_shift(
    media: DataFrame, n_anchors: int = 4, trim: bool = True
) -> DataFrame:
    """Shift-tolerant fingerprint rows: one (item_id, phash) row PER
    ANCHOR per decodable WAV (silence-trimmed, then the segmentation
    grid slid by sub-segment offsets — audio_fingerprint_anchors). The
    multi-row shape plugs straight into ``phash.image_neardup`` /
    ``image_dedup_clusters``: a time-shifted re-encode matches through
    whichever anchor pair aligns, and the candidate join's ``distinct``
    collapses multiple agreeing anchors to one pair. Index cost is
    ``n_anchors`` rows per clip (~200 B) — the standard multiprobe
    recall/space trade, chosen index-side so queries stay one join."""
    from .pixels import DECODE_QUARANTINE

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for item_id, payload in zip(pdf["item_id"], pdf["payload"]):
                buf = bytes(payload) if payload is not None else b""
                try:
                    samples, rate, bits = decode_audio_samples(buf)
                    fps = audio_fingerprint_anchors(
                        samples, rate, bits, n_anchors=n_anchors, trim=trim
                    )
                except DECODE_QUARANTINE:
                    continue
                rows.extend(
                    {"item_id": item_id, "phash": fp - (1 << 64) if fp >= (1 << 63) else fp}
                    for fp in fps
                )
            yield pd.DataFrame(rows, columns=["item_id", "phash"])

    return media.mapInPandas(run, schema="item_id bigint, phash bigint")
