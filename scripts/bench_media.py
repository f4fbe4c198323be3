"""Media decode throughput bench: generate a mixed corpus of REAL
payloads with the test-side encoders (PNG, progressive+baseline JPEG,
GIF, lossless WebP, BMP, ICO, FLAC, WAV), then measure the Arrow
featurizer paths — ``featurize_pixels`` (full decode → bounded stats)
and ``featurize_phash`` (decode → 64-bit perceptual hash) — on
local[N] and report MB/s and items/s.

Usage: python scripts/bench_media.py [--items N] [--size PX]

Prints ONE JSON line:
  {"metric": "media_decode", "mb": ..., "pixels_sec": ...,
   "phash_sec": ..., "mb_per_s": ..., "items": ..., "per_mime": {...}}

At 100 TB the decode stage is embarrassingly parallel (per-item Arrow
work, zero shuffle): cluster throughput = this figure x executor
cores / local cores.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rustcheatersdatapipeline_spark.session import get_spark  # noqa: E402


def _payloads(n_items: int, size: int) -> list[tuple[int, bytes]]:
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
    from tests.test_bmp_ico_webp import make_bmp, make_ico, make_ico_dib_entry
    from tests.test_flac import encode_flac
    from tests.test_gif_decode import _color_table, _frame, build_gif
    from tests.test_jpeg_decode import encode_jpeg, encode_jpeg_progressive
    from tests.test_pixels_decode import encode_png, encode_wav
    from tests.test_vp8l import encode_vp8l, wrap_webp
    from tests.test_vp8_inter import make_ivf
    from tests.vp8interenc import Vp8SeqEncoder

    rng = np.random.RandomState(7)
    out = []
    for i in range(n_items):
        kind = i % 9
        if kind in (0, 1):  # textured PNG / RGBA PNG
            coarse = rng.randint(0, 256, (8, 8, 3 if kind == 0 else 4)).astype(np.uint8)
            img = np.repeat(np.repeat(coarse, size // 8, 0), size // 8, 1)
            p = encode_png(img, ftype=2)
        elif kind == 2:  # baseline JPEG
            img = rng.randint(0, 256, (size, size, 3)).astype(np.uint8)
            p, _ = encode_jpeg(img, subsample=(2, 2))
        elif kind == 3:  # progressive JPEG
            img = rng.randint(0, 256, (size, size)).astype(np.uint8)
            p, _ = encode_jpeg_progressive(img)
        elif kind == 4:  # GIF (2 frames)
            table = _color_table(8)
            frames = [
                _frame(rng.randint(0, 8, (size // 2, size // 2)).astype(np.uint8))
                for _ in range(2)
            ]
            p = build_gif(size // 2, size // 2, frames, table)
        elif kind == 5:  # lossless WebP (value range keeps one unused
            # symbol per channel — the test encoder's flat-code scope)
            img = rng.randint(0, 255, (size // 2, size // 2, 4)).astype(np.uint8)
            p = wrap_webp(encode_vp8l(img))
        elif kind == 6:  # BMP inside an ICO + raw BMP alternating
            img = rng.randint(0, 256, (32, 32, 3)).astype(np.uint8)
            p = (
                make_bmp(img, bpp=24)
                if (i // 8) % 2
                else make_ico([make_ico_dib_entry(img, bpp=24)], [(32, 32)])
            )
        elif kind == 8:  # IVF VP8 video: keyframe + 2 interframes
            enc = Vp8SeqEncoder()
            half = np.full((16, 16), 128, np.uint8)
            y0 = rng.randint(0, 256, (32, 32)).astype(np.uint8)
            fr = [enc.keyframe(y0, half, half, q_index=12)[0]]
            for k in range(2):
                specs = [[{"ref": 1, "mode": "new",
                           "mv": (2 * (k + 1), -2 * (k + 1))}
                          for _ in range(2)] for _ in range(2)]
                fr.append(enc.interframe(
                    rng.randint(0, 256, (32, 32)).astype(np.uint8),
                    half, half, specs, q_index=24)[0])
            p = make_ivf(fr, 32, 32)
        else:  # FLAC / WAV audio
            sig = (8000 * np.sin(2 * np.pi * 440 * np.arange(4096) / 8000)).astype(np.int64)
            p = (
                encode_flac([sig.tolist()], kind="fixed", order=2, frame_blocks=1024)
                if (i // 8) % 2
                else encode_wav(sig[:, None], rate=8000)
            )
        out.append((i, p))
    return out


def main() -> None:
    n_items = int(sys.argv[sys.argv.index("--items") + 1]) if "--items" in sys.argv else 512
    size = int(sys.argv[sys.argv.index("--size") + 1]) if "--size" in sys.argv else 64

    spark = get_spark(cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    from rustcheatersdatapipeline_spark.functions.phash import featurize_phash
    from rustcheatersdatapipeline_spark.functions.pixels import featurize_pixels

    rows = _payloads(n_items, size)
    total_mb = sum(len(p) for _, p in rows) / 1e6
    media = spark.createDataFrame(
        [(i, bytearray(p)) for i, p in rows], "item_id long, payload binary"
    ).repartition(int(os.environ.get("SPARK_GRAFT_CPUS", "32"))).cache()
    media.count()

    t0 = time.time()
    stats = featurize_pixels(media).groupBy("mime").count().collect()
    pixels_sec = time.time() - t0
    t0 = time.time()
    n_hashed = featurize_phash(media).count()
    phash_sec = time.time() - t0

    per_mime = {r["mime"]: r["count"] for r in stats}
    print(
        json.dumps(
            {
                "metric": "media_decode",
                "mb": round(total_mb, 2),
                "items": n_items,
                "pixels_sec": round(pixels_sec, 2),
                "phash_sec": round(phash_sec, 2),
                "mb_per_s": round(total_mb / pixels_sec, 2),
                "items_per_s": round(n_items / pixels_sec, 1),
                "hashed": n_hashed,
                "per_mime": per_mime,
            }
        )
    )


if __name__ == "__main__":
    main()
