"""Totality fuzz for the full decoders: corrupt payloads must
quarantine, never raise out of the feature extractor (the same
contract tests/test_multimodal_real_decode.py pins for headers)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from rustcheatersdatapipeline_spark.functions.pixels import decode_media
from tests.test_pixels_decode import _gradient, encode_png, encode_wav

def _decode_total(buf: bytes):
    """decode_media restricted to the exception surface featurize_pixels
    quarantines — anything else is a totality bug."""
    import zlib

    try:
        return decode_media(bytes(buf))
    except (NotImplementedError, ValueError, zlib.error, IndexError):
        return None


@given(
    cut=st.integers(0, 400),
    xor_at=st.integers(0, 399),
    xor_val=st.integers(1, 255),
)
@settings(max_examples=60, deadline=None)
def test_mutated_png_never_escapes(cut, xor_at, xor_val):
    png = bytearray(encode_png(_gradient(6, 6, 3, seed=1), ftype=2))
    if xor_at < len(png):
        png[xor_at] ^= xor_val
    _decode_total(bytes(png[: cut if cut < len(png) else len(png)]))


@given(
    cut=st.integers(0, 300),
    xor_at=st.integers(0, 299),
    xor_val=st.integers(1, 255),
)
@settings(max_examples=60, deadline=None)
def test_mutated_wav_never_escapes(cut, xor_at, xor_val):
    wav = bytearray(
        encode_wav(np.arange(40, dtype=np.int64).reshape(-1, 2), rate=8000)
    )
    if xor_at < len(wav):
        wav[xor_at] ^= xor_val
    _decode_total(bytes(wav[: cut if cut < len(wav) else len(wav)]))


@given(junk=st.binary(min_size=0, max_size=200))
@settings(max_examples=60, deadline=None)
def test_arbitrary_bytes_never_escape(junk):
    _decode_total(junk)


@given(
    cut=st.integers(0, 400),
    xor_at=st.integers(0, 399),
    xor_val=st.integers(1, 255),
    depth=st.sampled_from([1, 2, 4, 8]),
)
@settings(max_examples=60, deadline=None)
def test_mutated_palette_png_never_escapes(cut, xor_at, xor_val, depth):
    from tests.test_pixels_decode import encode_palette_png

    rng = np.random.default_rng(depth)
    n = 1 << depth
    png = bytearray(
        encode_palette_png(
            rng.integers(0, n, size=(6, 6), dtype=np.uint8),
            rng.integers(0, 256, size=(n, 3), dtype=np.uint8),
            depth,
            trns=rng.integers(0, 256, size=(min(n, 3),), dtype=np.uint8),
            ftype=2,
        )
    )
    if xor_at < len(png):
        png[xor_at] ^= xor_val
    _decode_total(bytes(png[: cut if cut < len(png) else len(png)]))


@given(junk=st.binary(min_size=0, max_size=300))
@settings(max_examples=80, deadline=None)
def test_shared_dispatchers_total_on_arbitrary_bytes(junk):
    """The unified dispatch helpers must stay inside the quarantine
    surface for ANY bytes — they are the single entry every featurizer
    now routes through."""
    import zlib

    from rustcheatersdatapipeline_spark.functions.pixels import (
        decode_image_frames,
        decode_image_payload,
    )

    for fn in (decode_image_payload, decode_image_frames):
        try:
            r = fn(bytes(junk))
            assert r is None or r.dtype == np.uint8
        except (NotImplementedError, ValueError, zlib.error, IndexError):
            pass


def _webp_payloads():
    """Module-cached lossy + animated WebP payloads for fuzzing."""
    global _WEBP_CACHE
    try:
        return _WEBP_CACHE
    except NameError:
        pass
    from tests.vp8enc import encode_vp8, wrap_webp
    from tests.test_webp_anim import make_webp_anim
    from tests.test_vp8l import encode_vp8l

    rng = np.random.RandomState(3)
    y = rng.randint(0, 256, (16, 16)).astype(np.uint8)
    half = np.full((8, 8), 128, np.uint8)
    lossy = wrap_webp(encode_vp8(y, half, half, q_index=20, filter_level=10)[0])
    px = rng.randint(0, 256, (8, 8, 4)).astype(np.uint8)
    anim = make_webp_anim(
        (8, 8),
        [
            (b"VP8L", encode_vp8l(px), 0, 0, 8, 8, 0, 1),
            (b"VP8 ", encode_vp8(
                np.full((8, 8), 90, np.uint8),
                np.full((4, 4), 128, np.uint8),
                np.full((4, 4), 128, np.uint8),
                q_index=0,
            )[0], 0, 0, 8, 8, 0, 0),
        ],
    )
    _WEBP_CACHE = (lossy, anim)
    return _WEBP_CACHE


@given(
    cut=st.integers(0, 600),
    xor_at=st.integers(0, 599),
    xor_val=st.integers(1, 255),
)
@settings(max_examples=60, deadline=None)
def test_mutated_lossy_webp_never_escapes(cut, xor_at, xor_val):
    buf = bytearray(_webp_payloads()[0])
    if xor_at < len(buf):
        buf[xor_at] ^= xor_val
    _decode_total(bytes(buf[: cut if cut < len(buf) else len(buf)]))


@given(
    cut=st.integers(0, 600),
    xor_at=st.integers(0, 599),
    xor_val=st.integers(1, 255),
)
@settings(max_examples=60, deadline=None)
def test_mutated_animated_webp_never_escapes(cut, xor_at, xor_val):
    from rustcheatersdatapipeline_spark.functions.pixels import (
        decode_image_frames,
    )

    buf = bytearray(_webp_payloads()[1])
    if xor_at < len(buf):
        buf[xor_at] ^= xor_val
    payload = bytes(buf[: cut if cut < len(buf) else len(buf)])
    _decode_total(payload)
    import zlib

    try:
        decode_image_frames(payload)
    except (NotImplementedError, ValueError, zlib.error, IndexError):
        pass
