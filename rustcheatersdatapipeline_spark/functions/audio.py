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


def featurize_audio(media: DataFrame) -> DataFrame:
    """(item_id, features...) for every decodable PCM WAV payload;
    non-audio or corrupt payloads yield NULL-feature rows (quarantine,
    never a task failure)."""
    from .pixels import decode_wav_samples

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["item_id", *_NULL_FEAT]
        for pdf in batches:
            rows = []
            for item_id, payload in zip(pdf["item_id"], pdf["payload"]):
                buf = bytes(payload) if payload is not None else b""
                try:
                    samples, rate = decode_wav_samples(buf)
                    bits = {np.dtype("u1"): 8, np.dtype("<i2"): 16}.get(
                        samples.dtype, 32
                    )
                    feat = audio_features(samples, rate, bits)
                except (NotImplementedError, ValueError, IndexError):
                    feat = _NULL_FEAT
                rows.append({"item_id": item_id, **feat})
            yield pd.DataFrame(rows, columns=cols)

    return media.mapInPandas(run, schema=AUDIO_FEATURES_SCHEMA)
