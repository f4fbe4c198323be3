"""H.264 structure parse + AAC framing — hand-built bitstreams from
the public field layouts (ITU-T H.264 sections 7.3/9.1, ISO 14496-3
§1.6, ISO 14496-15 avcC), plus the honest decode boundaries."""

from __future__ import annotations

import struct

import pytest

from rustcheatersdatapipeline_spark.functions import aac as A
from rustcheatersdatapipeline_spark.functions import h264 as H


class BW:
    """MSB-first bit writer."""

    def __init__(self):
        self.bits = []

    def u(self, v, n):
        self.bits.extend((v >> i) & 1 for i in range(n - 1, -1, -1))

    def ue(self, v):
        k = v + 1
        n = k.bit_length()
        self.u(0, n - 1)
        self.u(k, n)

    def se(self, v):
        self.ue(2 * v - 1 if v > 0 else -2 * v)

    def bytes(self):
        bits = self.bits + [1] + [0] * ((8 - (len(self.bits) + 1) % 8) % 8)
        return bytes(
            int("".join(map(str, bits[i:i + 8])), 2) for i in range(0, len(bits), 8)
        )


def test_exp_golomb_known_codes():
    rd = H._ExpGolomb(bytes([0b10100110, 0b01000000]))
    assert rd.ue() == 0      # '1'
    assert rd.ue() == 1      # '010'
    assert rd.ue() == 2      # '011'
    assert rd.ue() == 3      # '00100'
    rd = H._ExpGolomb(bytes([0b01001100]))
    assert rd.se() == 1      # ue 1 -> +1
    assert rd.se() == -1     # ue 2 -> -1


def _sps(profile=66, w_mbs=40, h_units=30, crop=None, frame_mbs_only=1):
    bw = BW()
    bw.u(0x67, 8)            # NAL header: type 7
    bw.u(profile, 8)
    bw.u(0, 8)               # constraint flags
    bw.u(30, 8)              # level 3.0
    bw.ue(0)                 # sps id
    if profile in H._HIGH_PROFILES:
        bw.ue(1)             # chroma 4:2:0
        bw.ue(0), bw.ue(0)
        bw.u(0, 1)
        bw.u(0, 1)           # no scaling matrix
    bw.ue(4)                 # log2_max_frame_num_minus4 -> 8
    bw.ue(0)                 # poc type 0
    bw.ue(0)                 # log2_max_poc_lsb_minus4
    bw.ue(3)                 # num_ref_frames
    bw.u(0, 1)
    bw.ue(w_mbs - 1)
    bw.ue(h_units - 1)
    bw.u(frame_mbs_only, 1)
    if not frame_mbs_only:
        bw.u(0, 1)
    bw.u(1, 1)               # direct_8x8
    if crop:
        bw.u(1, 1)
        for c in crop:
            bw.ue(c)
    else:
        bw.u(0, 1)
    bw.u(0, 1)               # vui absent
    return bw.bytes()


def test_sps_uncropped_dimensions():
    sps = _sps(w_mbs=40, h_units=30)
    got = H.parse_sps(sps)
    assert (got["width"], got["height"]) == (640, 480)
    assert got["profile"] == "baseline" and got["level"] == 3.0
    assert got["log2_max_frame_num"] == 8 and got["num_ref_frames"] == 3


def test_sps_cropped_1080p_and_high_profile():
    # 1920x1080: 120x68 macroblocks, 8 luma rows cropped from the
    # bottom = crop_bottom 4 in 4:2:0 frame units
    sps = _sps(profile=100, w_mbs=120, h_units=68, crop=(0, 0, 0, 4))
    got = H.parse_sps(sps)
    assert (got["width"], got["height"]) == (1920, 1080)
    assert got["profile"] == "high"


def test_pps_entropy_mode():
    bw = BW()
    bw.u(0x68, 8)
    bw.ue(0), bw.ue(0)
    bw.u(1, 1)               # cabac
    assert H.parse_pps(bw.bytes())["entropy"] == "cabac"
    bw = BW()
    bw.u(0x68, 8)
    bw.ue(3), bw.ue(1)
    bw.u(0, 1)
    got = H.parse_pps(bw.bytes())
    assert got == {"pps_id": 3, "sps_id": 1, "entropy": "cavlc"}


def _slice(nal_type, slice_type, pps_id=0):
    bw = BW()
    bw.u((3 << 5) | nal_type, 8)
    bw.ue(0)                 # first_mb
    bw.ue(slice_type)
    bw.ue(pps_id)
    return bw.bytes()


def test_slice_header_classification():
    idr = H.parse_slice_header(_slice(5, 7))
    assert idr == {"idr": True, "first_mb": 0, "slice_type": "I", "pps_id": 0}
    p = H.parse_slice_header(_slice(1, 0, pps_id=2))
    assert p["slice_type"] == "P" and not p["idr"] and p["pps_id"] == 2


def test_annexb_iteration_with_emulation_bytes():
    # NAL payload containing 00 00 01 must survive via 00 00 03 01
    raw_payload = bytes([0x65, 0x00, 0x00, 0x01, 0x42])
    escaped = bytes([0x65, 0x00, 0x00, 0x03, 0x01, 0x42])
    stream = b"\x00\x00\x00\x01" + escaped + b"\x00\x00\x01" + b"\x41\x99"
    nals = list(H.annexb_nal_units(stream))
    assert nals == [raw_payload, b"\x41\x99"]


def test_avcc_sample_classification():
    sps, pps = _sps(), _slice(5, 7)
    idr_nal = _slice(5, 2)
    p_nal = _slice(1, 0)
    sample = b"".join(len(n).to_bytes(4, "big") + n for n in (idr_nal, p_nal))
    info = H.h264_sample_info(sample)
    assert info["idr"] and info["slice_types"] == ["I", "P"]
    assert info["nals"] == ["idr", "slice"]


def test_avcc_config_and_mp4_track_integration():
    from rustcheatersdatapipeline_spark.functions.mp4 import mp4_metadata

    sps, ppsb = _sps(w_mbs=80, h_units=45), None
    bw = BW()
    bw.u(0x68, 8)
    bw.ue(0), bw.ue(0)
    bw.u(0, 1)
    ppsb = bw.bytes()
    avcc = (
        bytes([1, 66, 0, 30, 0xFF, 0xE1])
        + len(sps).to_bytes(2, "big") + sps
        + bytes([1]) + len(ppsb).to_bytes(2, "big") + ppsb
    )

    def box(four, body):
        return struct.pack(">I", len(body) + 8) + four + body

    def full(four, body, ver=0):
        return box(four, struct.pack(">I", ver << 24) + body)

    avc1 = box(b"avc1", bytes(6) + struct.pack(">H", 1) + bytes(16)
               + struct.pack(">HH", 1280, 720) + bytes(50) + box(b"avcC", avcc))
    stsd = full(b"stsd", struct.pack(">I", 1) + avc1)
    stbl = box(b"stbl", stsd + full(b"stsz", struct.pack(">II", 0, 0)))
    hdlr = full(b"hdlr", struct.pack(">I", 0) + b"vide" + bytes(12) + b"\x00")
    mdia = box(b"mdia", hdlr + box(b"minf", stbl))
    moov = box(b"moov", box(b"trak", mdia))
    buf = box(b"ftyp", b"isom" + bytes(4) + b"isom") + moov
    meta = mp4_metadata(buf)
    (trk,) = meta["tracks"]
    assert trk["codec"] == "avc1"
    h = trk["h264"]
    assert h["length_size"] == 4
    assert h["sps"][0]["width"] == 1280 and h["sps"][0]["height"] == 720
    assert h["pps"][0]["entropy"] == "cavlc"


def test_h264_pixel_decode_is_named_boundary():
    with pytest.raises(NotImplementedError, match="CAVLC coefficient codebooks"):
        H.decode_h264_pixels(b"\x00\x00\x01\x65")


# ---------------------------------------------------------------- AAC


def _adts_frame(payload=b"\x00" * 20, sr_idx=4, chan=2, profile=1):
    ln = 7 + len(payload)
    hdr = bytearray(7)
    hdr[0] = 0xFF
    hdr[1] = 0xF1          # MPEG-4, layer 00, no CRC
    hdr[2] = (profile << 6) | (sr_idx << 2) | (chan >> 2)
    hdr[3] = ((chan & 3) << 6) | (ln >> 11)
    hdr[4] = (ln >> 3) & 0xFF
    hdr[5] = ((ln & 7) << 5) | 0x1F
    hdr[6] = 0xFC
    return bytes(hdr) + payload


def test_adts_walk():
    buf = _adts_frame() + _adts_frame() + _adts_frame()
    got = A.parse_adts_header(buf)
    assert got == (44100, 2, 3, 3 * 1024.0 / 44100)


def test_adts_rejects_noise_and_partial():
    assert A.parse_adts_header(b"\xff\xf1" + b"\x00" * 3) is None
    assert A.parse_adts_header(b"hello world") is None
    # one full frame + garbage tail: not a coherent stream
    assert A.parse_adts_header(_adts_frame() + b"\x12") is None
    # exactly one frame ending at EOF is accepted
    assert A.parse_adts_header(_adts_frame())[2] == 1


def test_audio_specific_config_classic_lc():
    # the canonical 0x12 0x10: AAC LC, 44100, stereo, 1024 frame
    got = A.parse_audio_specific_config(bytes([0x12, 0x10]))
    assert got["object_name"] == "AAC LC"
    assert got["rate"] == 44100 and got["channels"] == 2
    assert got["frame_length"] == 1024


def test_esds_descriptor_walk():
    asc = bytes([0x12, 0x10])
    dsi = bytes([5, len(asc)]) + asc
    dcfg = bytes([4, 13 + len(dsi)]) + bytes(13) + dsi
    es = bytes([3, 3 + len(dcfg)]) + bytes(3) + dcfg
    assert A.parse_esds_config(es) == asc
    # long-form (multi-byte) descriptor lengths must also walk
    es_long = bytes([3, 0x80, 3 + len(dcfg)]) + bytes(3) + dcfg
    assert A.parse_esds_config(es_long) == asc


def test_esds_es_descriptor_optional_fields():
    """ISO 14496-1 §7.2.6.5: the ES descriptor flags byte gates optional
    dependsOn_ES_ID / URLstring / OCR_ES_ID fields that sit BEFORE the
    nested descriptors; ignoring them misaligns the walk and can return
    a wrong AudioSpecificConfig."""
    asc = bytes([0x12, 0x10])
    dsi = bytes([5, len(asc)]) + asc
    dcfg = bytes([4, 13 + len(dsi)]) + bytes(13) + dsi

    # streamDependenceFlag: +2-byte dependsOn_ES_ID
    body = bytes([0, 1, 0x80]) + b"\x00\x07" + dcfg
    es = bytes([3, len(body)]) + body
    assert A.parse_esds_config(es) == asc

    # URL_Flag: +1-byte length + URL string
    url = b"rtsp://x"
    body = bytes([0, 1, 0x40, len(url)]) + url + dcfg
    es = bytes([3, len(body)]) + body
    assert A.parse_esds_config(es) == asc

    # all three flags together
    body = (bytes([0, 1, 0xE0]) + b"\x00\x07" + bytes([len(url)]) + url
            + b"\x00\x09" + dcfg)
    es = bytes([3, len(body)]) + body
    assert A.parse_esds_config(es) == asc

    # truncated optional fields must raise, not walk garbage
    import pytest
    with pytest.raises(ValueError, match="esds"):
        A.parse_esds_config(bytes([3, 4, 0, 1, 0x40, 200]))


def test_mp4a_track_integration():
    from rustcheatersdatapipeline_spark.functions.mp4 import mp4_metadata

    asc = bytes([0x12, 0x10])
    dsi = bytes([5, len(asc)]) + asc
    dcfg = bytes([4, 13 + len(dsi)]) + bytes(13) + dsi
    es = bytes([3, 3 + len(dcfg)]) + bytes(3) + dcfg

    def box(four, body):
        return struct.pack(">I", len(body) + 8) + four + body

    def full(four, body):
        return box(four, bytes(4) + body)

    mp4a = box(b"mp4a", bytes(6) + struct.pack(">H", 1) + bytes(20)
               + full(b"esds", es))
    stsd = full(b"stsd", struct.pack(">I", 1) + mp4a)
    stbl = box(b"stbl", stsd + full(b"stsz", struct.pack(">II", 0, 0)))
    hdlr = full(b"hdlr", b"\x00" * 4 + b"soun" + bytes(12) + b"\x00")
    # hdlr body layout: ver/flags (in full) + predefined 4 + handler 4
    hdlr = full(b"hdlr", bytes(4) + b"soun" + bytes(12) + b"\x00")
    mdia = box(b"mdia", hdlr + box(b"minf", stbl))
    moov = box(b"moov", box(b"trak", mdia))
    buf = box(b"ftyp", b"isom" + bytes(4) + b"isom") + moov
    meta = mp4_metadata(buf)
    (trk,) = meta["tracks"]
    assert trk["kind"] == "audio" and trk["codec"] == "mp4a"
    assert trk["aac"]["object_name"] == "AAC LC"
    assert trk["aac"]["rate"] == 44100 and trk["aac"]["channels"] == 2


def test_aac_decode_is_named_boundary():
    with pytest.raises(NotImplementedError, match="Huffman codebooks"):
        A.decode_aac_samples(_adts_frame())


def test_sps_vui_timing_and_sar():
    """VUI (annex E.1.1) through timing_info: fps = time_scale /
    (2 * num_units_in_tick) per E.2.1, SAR from Table E-1 or
    Extended_SAR — the fields a curation pipeline filters crawled
    video on."""
    def sps_with_vui(write_vui):
        bw = BW()
        bw.u(0x67, 8), bw.u(66, 8), bw.u(0, 8), bw.u(30, 8)
        bw.ue(0)                     # sps id
        bw.ue(4), bw.ue(0), bw.ue(0) # frame_num / poc
        bw.ue(3), bw.u(0, 1)         # refs, gaps
        bw.ue(39), bw.ue(29)         # 640x480
        bw.u(1, 1), bw.u(1, 1)       # frame_mbs_only, direct_8x8
        bw.u(0, 1)                   # no crop
        bw.u(1, 1)                   # vui present
        write_vui(bw)
        return bw.bytes()

    def ntsc(bw):
        bw.u(1, 1), bw.u(1, 8)       # aspect present, idc 1 (1:1)
        bw.u(0, 1), bw.u(0, 1), bw.u(0, 1)  # overscan/signal/chroma absent
        bw.u(1, 1)                   # timing present
        bw.u(1001, 32), bw.u(60000, 32), bw.u(1, 1)

    got = H.parse_sps(sps_with_vui(ntsc))
    assert got["sar"] == (1, 1)
    assert abs(got["fps"] - 29.97002997) < 1e-6
    assert (got["width"], got["height"]) == (640, 480)

    def ext_sar_no_timing(bw):
        bw.u(1, 1), bw.u(255, 8)     # Extended_SAR
        bw.u(59, 16), bw.u(54, 16)
        bw.u(0, 1)
        bw.u(1, 1), bw.u(3, 3), bw.u(1, 1), bw.u(0, 1)  # signal type, no colour
        bw.u(0, 1)                   # chroma absent
        bw.u(0, 1)                   # timing absent

    got = H.parse_sps(sps_with_vui(ext_sar_no_timing))
    assert got["sar"] == (59, 54) and got["fps"] is None

    # no VUI at all -> both None (and the golden-vector SPS agrees)
    plain = _sps()
    got = H.parse_sps(plain)
    assert got["fps"] is None and got["sar"] is None
