"""Multimodal (image/audio/video) column processing.

Design: media are opaque ``binary`` payload columns with a typed
metadata struct alongside — the pattern a 100 TB training-data pipeline
uses (payload stays columnar in Parquet, metadata prunes without
touching bytes). All per-item compute runs through ``mapInPandas``
(Arrow batches, zero-copy into numpy), partitioned by whatever key the
caller bucketed on.

The actual codecs (PIL/ffmpeg/librosa) are NOT in this container, so
``decode_image`` is a clearly-marked stub: ``fake=True`` substitutes a
deterministic byte-derived decode so the Spark-side plumbing — schema,
batch shape, UDF signature, partitioning — is real and tested;
``fake=False`` raises NotImplementedError where the codec call belongs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: output schema of featurize_media (mapInPandas contract)
MEDIA_FEATURES_SCHEMA = (
    "item_id bigint, mime string, n_bytes int, width int, height int, "
    "n_frames int, sampled_frames array<int>, checksum bigint"
)


def media_table(df: DataFrame, id_col: str, payload_col, mime: str) -> DataFrame:
    """Normalize any source into the engine's media-table shape:
    (item_id, payload binary, meta struct<mime,n_bytes>)."""
    payload = payload_col if not isinstance(payload_col, str) else F.col(payload_col)
    payload = payload.cast("binary")
    return df.select(
        F.col(id_col).cast("long").alias("item_id"),
        payload.alias("payload"),
        F.struct(
            F.lit(mime).alias("mime"), F.length(payload).alias("n_bytes")
        ).alias("meta"),
    )


def _fake_decode(buf: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for a codec: derives (width, height,
    n_frames) from the payload bytes. Replace with PIL/ffmpeg in a
    codec-enabled image."""
    n = len(buf)
    w = 16 + (n % 64)
    h = 16 + ((n // 64) % 64)
    frames = 1 + (n % 8)
    return w, h, frames


def featurize_media(media: DataFrame, fake: bool = True, frame_step: int = 2) -> DataFrame:
    """Decode → feature-extract → frame-sample over Arrow batches.

    One ``mapInPandas`` pass per partition: each batch arrives as a
    pandas DataFrame with the binary payload as Python bytes; a real
    deployment feeds them to the codec, here the fake decode keeps the
    whole path executable. ``checksum`` is a plain byte sum — a cheap
    integrity fingerprint the oracle can recompute.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if not fake:
            raise NotImplementedError(
                "real codecs (PIL/ffmpeg) are not available in this image; "
                "run with fake=True or install a codec-enabled runtime"
            )
        for pdf in batches:
            rows = []
            for item_id, payload, meta in zip(
                pdf["item_id"], pdf["payload"], pdf["meta"]
            ):
                buf = bytes(payload) if payload is not None else b""
                w, h, frames = _fake_decode(buf)
                sampled = list(range(0, frames, frame_step))
                rows.append(
                    {
                        "item_id": item_id,
                        "mime": meta["mime"],
                        "n_bytes": len(buf),
                        "width": w,
                        "height": h,
                        "n_frames": frames,
                        "sampled_frames": sampled,
                        "checksum": sum(buf) if buf else 0,
                    }
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(run, schema=MEDIA_FEATURES_SCHEMA)
