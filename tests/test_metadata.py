"""Embedded media text-metadata extraction (functions/metadata.py) —
hand-built fixtures per container family (no metadata-writing library
anywhere), Spark end-to-end, and totality under mutation."""

import zlib

import numpy as np
import pytest

from rustcheatersdatapipeline_spark.functions.metadata import (
    extract_media_metadata,
    extract_metadata,
)


# ----------------------------------------------------------- fixtures


def _syncsafe(n: int) -> bytes:
    return bytes([(n >> 21) & 0x7F, (n >> 14) & 0x7F, (n >> 7) & 0x7F, n & 0x7F])


def make_id3v2(frames, major=3) -> bytes:
    body = b""
    for fid, enc, text in frames:
        if enc == 0:
            data = bytes([0]) + text.encode("latin-1")
        elif enc == 1:
            data = bytes([1]) + text.encode("utf-16")  # BOM included
        else:
            data = bytes([3]) + text.encode("utf-8")
        size = _syncsafe(len(data)) if major >= 4 else len(data).to_bytes(4, "big")
        body += fid + size + b"\x00\x00" + data
    return b"ID3" + bytes([major, 0, 0]) + _syncsafe(len(body)) + body


def make_flac_with_comments(pairs, vendor="engine-test") -> bytes:
    vb = vendor.encode()
    block = len(vb).to_bytes(4, "little") + vb
    block += len(pairs).to_bytes(4, "little")
    for k, v in pairs:
        ent = f"{k}={v}".encode()
        block += len(ent).to_bytes(4, "little") + ent
    streaminfo = bytes([0x00]) + (34).to_bytes(3, "big") + bytes(34)
    comment = bytes([0x80 | 4]) + len(block).to_bytes(3, "big") + block
    return b"fLaC" + streaminfo + comment


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    return (len(body).to_bytes(4, "big") + tag + body
            + zlib.crc32(tag + body).to_bytes(4, "big"))


def make_png_with_text() -> bytes:
    from tests.test_pixels_decode import encode_png

    base = encode_png(np.zeros((2, 2, 3), np.uint8), ftype=0)
    iend = base[-12:]
    extra = _png_chunk(b"tEXt", b"Title\x00hello png")
    extra += _png_chunk(b"zTXt", b"Descr\x00\x00" + zlib.compress(b"deflated words"))
    extra += _png_chunk(
        b"iTXt", b"Caption\x00\x00\x00en\x00\x00" + "ünicode".encode()
    )
    return base[:-12] + extra + iend


def _ascii_ifd_entry(tag: int, text: bytes, data_off: int, bo="little"):
    cnt = len(text)
    e = tag.to_bytes(2, bo) + (2).to_bytes(2, bo) + cnt.to_bytes(4, bo)
    if cnt <= 4:
        return e + text + bytes(4 - cnt), b""
    return e + data_off.to_bytes(4, bo), text


def make_tiff_ascii(make=b"CamCo\x00", model=b"X-1000 Ultra\x00") -> bytes:
    # header + IFD with two ASCII tags (one inline, one out-of-line)
    bo = "little"
    n = 2
    ifd_off = 8
    data_off = ifd_off + 2 + 12 * n + 4
    e1, blob1 = _ascii_ifd_entry(0x010F, make, data_off, bo)
    e2, blob2 = _ascii_ifd_entry(0x0110, model, data_off + len(blob1), bo)
    out = b"II" + (42).to_bytes(2, bo) + ifd_off.to_bytes(4, bo)
    out += n.to_bytes(2, bo) + e1 + e2 + (0).to_bytes(4, bo)
    return out + blob1 + blob2


def make_jpeg_with_exif_and_comment() -> bytes:
    from tests.test_jpeg_decode import encode_jpeg

    jpg, _ = encode_jpeg(np.zeros((8, 8), np.uint8))
    tiff = make_tiff_ascii()
    app1 = b"Exif\x00\x00" + tiff
    seg = b"\xff\xe1" + (len(app1) + 2).to_bytes(2, "big") + app1
    com = b"a jpeg comment"
    seg += b"\xff\xfe" + (len(com) + 2).to_bytes(2, "big") + com
    return jpg[:2] + seg + jpg[2:]


def make_gif_with_comment() -> bytes:
    from tests.test_gif_decode import _color_table, _frame, build_gif

    base = build_gif(4, 4, [_frame(np.zeros((4, 4), np.uint8))], _color_table(2))
    comment = b"\x21\xfe" + bytes([11]) + b"gif comment" + b"\x00"
    # splice after the global color table (header 13 + 2-entry table)
    gct = 3 << ((base[10] & 0x07) + 1)
    cut = 13 + gct
    return base[:cut] + comment + base[cut:]


def make_wav_with_info() -> bytes:
    from tests.test_pixels_decode import encode_wav

    base = encode_wav(np.zeros((16, 1), np.int64), rate=8000)
    info = b"INFO"
    for key, val in ((b"INAM", b"a title\x00"), (b"ISFT", b"engine\x00")):
        info += key + len(val).to_bytes(4, "little") + val
    return base + b"LIST" + len(info).to_bytes(4, "little") + info


# ----------------------------------------------------------------- tests


def test_id3v2_text_frames_all_encodings():
    buf = make_id3v2(
        [(b"TIT2", 0, "latin title"), (b"TPE1", 1, "ütf16 ártist"),
         (b"TALB", 3, "utf8 album")],
        major=3,
    )
    got = dict((k, v) for _s, k, v in extract_metadata(buf))
    assert got == {"TIT2": "latin title", "TPE1": "ütf16 ártist",
                   "TALB": "utf8 album"}
    buf4 = make_id3v2([(b"TIT2", 3, "v2.4 title")], major=4)
    assert ("id3v2", "TIT2", "v2.4 title") in extract_metadata(buf4)


def test_flac_vorbis_comments():
    buf = make_flac_with_comments(
        [("title", "flac song"), ("ARTIST", "someone")]
    )
    rows = extract_metadata(buf)
    assert ("vorbis", "TITLE", "flac song") in rows
    assert ("vorbis", "ARTIST", "someone") in rows
    assert ("vorbis", "vendor", "engine-test") in rows


def test_png_text_chunks_all_three_forms():
    rows = dict((k, v) for _s, k, v in extract_metadata(make_png_with_text()))
    assert rows == {"Title": "hello png", "Descr": "deflated words",
                    "Caption": "ünicode"}


def test_jpeg_exif_ascii_and_comment():
    rows = dict((k, v) for _s, k, v in
                extract_metadata(make_jpeg_with_exif_and_comment()))
    assert rows["Make"] == "CamCo"
    assert rows["Model"] == "X-1000 Ultra"
    assert rows["Comment"] == "a jpeg comment"


def test_tiff_ascii_tags_direct():
    rows = dict((k, v) for _s, k, v in extract_metadata(make_tiff_ascii()))
    assert rows == {"Make": "CamCo", "Model": "X-1000 Ultra"}


def test_gif_comment_extension():
    rows = extract_metadata(make_gif_with_comment())
    assert ("gif", "Comment", "gif comment") in rows


def test_riff_info_chunks():
    rows = dict((k, v) for _s, k, v in extract_metadata(make_wav_with_info()))
    assert rows["Title"] == "a title"
    assert rows["Software"] == "engine"


def test_metadata_is_total_under_mutation():
    fixtures = [
        make_id3v2([(b"TIT2", 0, "x")]),
        make_flac_with_comments([("a", "b")]),
        make_png_with_text(),
        make_jpeg_with_exif_and_comment(),
        make_gif_with_comment(),
        make_wav_with_info(),
        make_tiff_ascii(),
    ]
    rng = np.random.RandomState(31)
    for base in fixtures:
        for trial in range(60):
            buf = bytearray(base)
            if trial % 3 == 0:
                buf = buf[: rng.randint(1, len(buf))]
            else:
                for _ in range(rng.randint(1, 5)):
                    buf[rng.randint(0, len(buf))] = rng.randint(0, 256)
            rows = extract_metadata(bytes(buf))  # must never raise
            assert len(rows) <= 64
            for _s, k, v in rows:
                assert len(v) <= 512 and len(k) <= 69


def test_extract_media_metadata_spark(spark):
    rows = [
        (0, bytearray(make_id3v2([(b"TIT2", 0, "song zero")]))),
        (1, bytearray(make_png_with_text())),
        (2, bytearray(make_jpeg_with_exif_and_comment())),
        (3, bytearray(b"no metadata here")),
        (4, bytearray(make_wav_with_info())),
    ]
    media = spark.createDataFrame(rows, "item_id long, payload binary")
    out = extract_media_metadata(media).collect()
    by_item = {}
    for r in out:
        by_item.setdefault(r["item_id"], {})[r["key"]] = r["value"]
    assert by_item[0]["TIT2"] == "song zero"
    assert by_item[1]["Title"] == "hello png"
    assert by_item[2]["Make"] == "CamCo"
    assert 3 not in by_item
    assert by_item[4]["Title"] == "a title"
    # plan shape: one Arrow pass, no shuffle
    plan = extract_media_metadata(media)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def _box(tag: bytes, body: bytes) -> bytes:
    return (len(body) + 8).to_bytes(4, "big") + tag + body


def make_mp4_with_ilst() -> bytes:
    def data_atom(text: str) -> bytes:
        return _box(b"data", (1).to_bytes(4, "big") + b"\x00" * 4
                    + text.encode())

    ilst = _box(b"\xa9nam", data_atom("an mp4 title"))
    ilst += _box(b"\xa9too", data_atom("engine muxer"))
    meta = _box(b"meta", b"\x00" * 4 + _box(b"ilst", ilst))
    moov = _box(b"moov", _box(b"udta", meta))
    return _box(b"ftyp", b"isom\x00\x00\x00\x01isom") + moov


def _ogg_page(packet: bytes, serial=1, seq=0, htype=2) -> bytes:
    segs = []
    rest = packet
    while True:
        segs.append(min(len(rest), 255))
        if len(rest) < 255:
            break
        rest = rest[255:]
    hdr = (b"OggS" + b"\x00" + bytes([htype]) + b"\x00" * 8
           + serial.to_bytes(4, "little") + seq.to_bytes(4, "little")
           + b"\x00" * 4 + bytes([len(segs)]) + bytes(segs))
    return hdr + packet


def make_ogg_with_comments(opus=False) -> bytes:
    body = b""
    vendor = b"engine-ogg"
    body += len(vendor).to_bytes(4, "little") + vendor
    ents = [b"TITLE=ogg song", b"artist=someone else"]
    body += len(ents).to_bytes(4, "little")
    for e in ents:
        body += len(e).to_bytes(4, "little") + e
    pkt = (b"OpusTags" if opus else b"\x03vorbis") + body
    first = _ogg_page(b"\x01vorbis" + b"\x00" * 23, seq=0, htype=2)
    return first + _ogg_page(pkt, seq=1, htype=0)


def test_mp4_ilst_text_atoms():
    rows = dict((k, v) for _s, k, v in extract_metadata(make_mp4_with_ilst()))
    assert rows == {"Title": "an mp4 title", "Software": "engine muxer"}


@pytest.mark.parametrize("opus", [False, True])
def test_ogg_comment_headers(opus):
    rows = extract_metadata(make_ogg_with_comments(opus))
    assert ("ogg", "TITLE", "ogg song") in rows
    assert ("ogg", "ARTIST", "someone else") in rows
    assert ("ogg", "vendor", "engine-ogg") in rows


def test_mp4_and_ogg_totality():
    rng = np.random.RandomState(41)
    for base in (make_mp4_with_ilst(), make_ogg_with_comments(),
                 make_ogg_with_comments(True)):
        for trial in range(60):
            buf = bytearray(base)
            if trial % 3 == 0:
                buf = buf[: rng.randint(1, len(buf))]
            else:
                for _ in range(rng.randint(1, 5)):
                    buf[rng.randint(0, len(buf))] = rng.randint(0, 256)
            rows = extract_metadata(bytes(buf))
            assert len(rows) <= 64


def test_id3v2_unsynchronisation():
    """v2.3 global unsync (FF 00 -> FF over the whole tag) and v2.4
    per-frame unsync both reverse before text decode — a UTF-16 title
    containing 0xFF bytes survives."""
    title = "ÿ title ÿ"  # latin-1 0xFF characters force unsync bytes
    data = bytes([1]) + title.encode("utf-16")  # BOM FF FE: unsync target
    # v2.3 global: build the frame, unsync the WHOLE tag body
    frame = b"TIT2" + len(data).to_bytes(4, "big") + b"\x00\x00" + data
    sync = frame.replace(b"\xff", b"\xff\x00")
    tag = b"ID3" + bytes([3, 0, 0x80]) + _syncsafe(len(sync)) + sync
    assert ("id3v2", "TIT2", title.strip()) in extract_metadata(tag)
    # v2.4 per-frame: frame format flag 0x02, syncsafe size of the
    # unsynced body
    body = data.replace(b"\xff", b"\xff\x00")
    frame = b"TIT2" + _syncsafe(len(body)) + b"\x00\x02" + body
    tag = b"ID3" + bytes([4, 0, 0]) + _syncsafe(len(frame)) + frame
    assert ("id3v2", "TIT2", title.strip()) in extract_metadata(tag)
