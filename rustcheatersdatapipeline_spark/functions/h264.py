"""H.264/AVC bitstream STRUCTURE parse — pure stdlib.

Everything here is the Exp-Golomb-coded layer of ITU-T H.264, which is
fully algorithmic (no tabulated VLC data): Annex-B and AVCC
(length-prefixed) NAL unit iteration with emulation-prevention-byte
removal, SPS parse (profile/level, true cropped dimensions, frame
numbering config, scaling-list skip for High profiles), PPS parse
(including ``entropy_coding_mode_flag`` — the CAVLC-vs-CABAC switch),
slice-header type/IDR classification, and the ``avcC`` decoder-config
record MP4 ``avc1`` tracks carry.

The MACROBLOCK layer is the named boundary, stated honestly: baseline
CAVLC is VLC-coded (NOT arithmetic), but its coefficient codebooks
(coeff_token, total_zeros, run_before — ITU tables 9-5..9-10) are
tabulated spec data that fails this build's offline self-certification
discipline (prefix-free + Kraft checks over recalled data — the same
bar that admitted MP3 tables 10-13 and rejected 15/16/24, see
functions/mp3.py); Main/High CABAC is genuinely arithmetic-coded.
Pixel decode therefore quarantines with the codec named, while this
module gives a training-data pipeline what it actually filters on:
resolution, profile, entropy mode, slice/IDR structure, and exact
keyframe classification for the byte ranges ``mp4_keyframe_ranges``
extracts.
"""

from __future__ import annotations

_NAL_TYPES = {
    1: "slice", 2: "dpa", 3: "dpb", 4: "dpc", 5: "idr", 6: "sei",
    7: "sps", 8: "pps", 9: "aud", 10: "end_seq", 11: "end_stream",
    12: "filler",
}

_SLICE_TYPES = {0: "P", 1: "B", 2: "I", 3: "SP", 4: "SI",
                5: "P", 6: "B", 7: "I", 8: "SP", 9: "SI"}

#: profile_idc values that carry the chroma/bit-depth/scaling block
_HIGH_PROFILES = {100, 110, 122, 244, 44, 83, 86, 118, 128, 138, 139,
                  134, 135}

_PROFILES = {66: "baseline", 77: "main", 88: "extended", 100: "high",
             110: "high10", 122: "high422", 244: "high444"}


class _ExpGolomb:
    """MSB-first bit reader with ue(v)/se(v) (H.264 section 9.1)."""

    __slots__ = ("d", "pos")

    def __init__(self, data: bytes) -> None:
        self.d = data
        self.pos = 0

    def u(self, n: int) -> int:
        v = 0
        for _ in range(n):
            byte = self.pos >> 3
            if byte >= len(self.d):
                raise ValueError("H.264: truncated NAL payload")
            v = (v << 1) | ((self.d[byte] >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return v

    def ue(self) -> int:
        zeros = 0
        while self.u(1) == 0:
            zeros += 1
            if zeros > 32:
                raise ValueError("H.264: invalid Exp-Golomb code")
        return (1 << zeros) - 1 + (self.u(zeros) if zeros else 0)

    def se(self) -> int:
        k = self.ue()
        return (k + 1) // 2 if k % 2 else -(k // 2)


def _unescape(data: bytes) -> bytes:
    """Strip emulation-prevention bytes (00 00 03 -> 00 00)."""
    return data.replace(b"\x00\x00\x03", b"\x00\x00")


def annexb_nal_units(buf: bytes):
    """Yield raw NAL units (header byte included, unescaped) from an
    Annex-B byte stream (00 00 [00] 01 start codes)."""
    i = 0
    n = len(buf)
    starts = []
    while i + 3 <= n:
        if buf[i] == 0 and buf[i + 1] == 0:
            if buf[i + 2] == 1:
                starts.append(i + 3)
                i += 3
                continue
            if i + 4 <= n and buf[i + 2] == 0 and buf[i + 3] == 1:
                starts.append(i + 4)
                i += 4
                continue
        i += 1
    for j, s in enumerate(starts):
        end = starts[j + 1] - 3 if j + 1 < len(starts) else n
        while end > s and buf[end - 1] == 0:
            end -= 1  # trailing zero padding before the next start code
        if end > s:
            yield _unescape(buf[s:end])


def avcc_nal_units(buf: bytes, length_size: int = 4):
    """Yield NAL units from an AVCC (length-prefixed) sample, the
    layout inside MP4 ``mdat`` samples."""
    i = 0
    while i + length_size <= len(buf):
        ln = int.from_bytes(buf[i : i + length_size], "big")
        i += length_size
        if ln == 0 or i + ln > len(buf):
            raise ValueError("H.264: bad AVCC NAL length")
        yield _unescape(buf[i : i + ln])
        i += ln


#: sample aspect ratios, aspect_ratio_idc 1..16 (Table E-1)
_SAR_TABLE = (
    (1, 1), (12, 11), (10, 11), (16, 11), (40, 33), (24, 11), (20, 11),
    (32, 11), (80, 33), (18, 11), (15, 11), (64, 33), (160, 99), (4, 3),
    (3, 2), (2, 1),
)


def parse_sps(nal: bytes) -> dict:
    """Sequence parameter set (section 7.3.2.1.1): profile/level,
    TRUE display dimensions (mb grid minus frame cropping), frame
    numbering and field/frame mode — plus, when VUI carries them, the
    curation-filterable ``fps`` (timing_info, frame = two ticks per
    E.2.1) and ``sar`` (Table E-1 or Extended_SAR); both None when the
    stream does not declare them."""
    if not nal or nal[0] & 0x1F != 7:
        raise ValueError("H.264: not an SPS NAL")
    rd = _ExpGolomb(nal[1:])
    profile_idc = rd.u(8)
    rd.u(8)  # constraint flags + reserved
    level_idc = rd.u(8)
    rd.ue()  # sps id
    chroma_format_idc = 1
    if profile_idc in _HIGH_PROFILES:
        chroma_format_idc = rd.ue()
        if chroma_format_idc == 3:
            rd.u(1)  # separate_colour_plane
        rd.ue()  # bit_depth_luma_minus8
        rd.ue()  # bit_depth_chroma_minus8
        rd.u(1)  # qpprime_y_zero_transform_bypass
        if rd.u(1):  # seq_scaling_matrix_present
            for i in range(8 if chroma_format_idc != 3 else 12):
                if rd.u(1):  # list present: skip its deltas
                    size = 16 if i < 6 else 64
                    last = 8
                    nxt = 8
                    for _ in range(size):
                        if nxt:
                            nxt = (last + rd.se() + 256) % 256
                        if nxt:
                            last = nxt
    log2_max_frame_num = rd.ue() + 4
    poc_type = rd.ue()
    if poc_type == 0:
        rd.ue()  # log2_max_pic_order_cnt_lsb_minus4
    elif poc_type == 1:
        rd.u(1)
        rd.se(), rd.se()
        for _ in range(rd.ue()):
            rd.se()
    num_ref_frames = rd.ue()
    rd.u(1)  # gaps_in_frame_num_allowed
    w_mbs = rd.ue() + 1
    h_units = rd.ue() + 1
    frame_mbs_only = rd.u(1)
    if not frame_mbs_only:
        rd.u(1)  # mb_adaptive_frame_field
    rd.u(1)  # direct_8x8_inference
    crop_l = crop_r = crop_t = crop_b = 0
    if rd.u(1):  # frame_cropping
        crop_l, crop_r, crop_t, crop_b = rd.ue(), rd.ue(), rd.ue(), rd.ue()
    # crop units (section 7.4.2.1.1): chroma-dependent
    sub_w = 2 if chroma_format_idc in (1, 2) else 1
    sub_h = 2 if chroma_format_idc == 1 else 1
    crop_y_mult = sub_h * (2 - frame_mbs_only)
    width = w_mbs * 16 - sub_w * (crop_l + crop_r)
    height = (2 - frame_mbs_only) * h_units * 16 - crop_y_mult * (crop_t + crop_b)
    out = {
        "profile_idc": profile_idc,
        "profile": _PROFILES.get(profile_idc, str(profile_idc)),
        "level": level_idc / 10.0,
        "chroma_format_idc": chroma_format_idc,
        "width": width,
        "height": height,
        "frame_mbs_only": frame_mbs_only,
        "log2_max_frame_num": log2_max_frame_num,
        "num_ref_frames": num_ref_frames,
        "fps": None,
        "sar": None,
    }
    if rd.u(1):  # vui_parameters_present (annex E.1.1, through timing)
        if rd.u(1):  # aspect_ratio_info_present
            idc = rd.u(8)
            if idc == 255:  # Extended_SAR
                out["sar"] = (rd.u(16), rd.u(16))
            elif 1 <= idc <= len(_SAR_TABLE):
                out["sar"] = _SAR_TABLE[idc - 1]
        if rd.u(1):  # overscan_info_present
            rd.u(1)
        if rd.u(1):  # video_signal_type_present
            rd.u(4)  # video_format(3) + full_range(1)
            if rd.u(1):  # colour_description_present
                rd.u(24)  # primaries + transfer + matrix
        if rd.u(1):  # chroma_loc_info_present
            rd.ue(), rd.ue()
        if rd.u(1):  # timing_info_present
            num_units = rd.u(32)
            time_scale = rd.u(32)
            rd.u(1)  # fixed_frame_rate_flag
            if num_units:
                # frame rate convention (E.2.1): one frame = two ticks
                out["fps"] = time_scale / (2.0 * num_units)
    return out


def parse_pps(nal: bytes) -> dict:
    """Picture parameter set: the entropy-mode switch plus ids."""
    if not nal or nal[0] & 0x1F != 8:
        raise ValueError("H.264: not a PPS NAL")
    rd = _ExpGolomb(nal[1:])
    pps_id = rd.ue()
    sps_id = rd.ue()
    cabac = rd.u(1)
    return {
        "pps_id": pps_id,
        "sps_id": sps_id,
        "entropy": "cabac" if cabac else "cavlc",
    }


def parse_slice_header(nal: bytes) -> dict:
    """First fields of a coded-slice header: type + IDR flag."""
    if not nal:
        raise ValueError("H.264: empty NAL")
    ntype = nal[0] & 0x1F
    if ntype not in (1, 5):
        raise ValueError("H.264: not a coded slice NAL")
    rd = _ExpGolomb(nal[1:])
    first_mb = rd.ue()
    stype = rd.ue()
    if stype > 9:
        raise ValueError("H.264: invalid slice_type")
    return {
        "idr": ntype == 5,
        "first_mb": first_mb,
        "slice_type": _SLICE_TYPES[stype],
        "pps_id": rd.ue(),
    }


def parse_avcc_config(cfg: bytes) -> dict:
    """The ``avcC`` AVCDecoderConfigurationRecord (ISO 14496-15) from
    an MP4 ``avc1`` sample entry: NAL length size + SPS/PPS sets,
    with the SPS/PPS fields parsed."""
    if len(cfg) < 7 or cfg[0] != 1:
        raise ValueError("H.264: bad avcC configuration version")
    length_size = (cfg[4] & 3) + 1
    n_sps = cfg[5] & 0x1F
    pos = 6
    sps_list = []
    for _ in range(n_sps):
        ln = int.from_bytes(cfg[pos : pos + 2], "big")
        pos += 2
        sps_list.append(parse_sps(_unescape(cfg[pos : pos + ln])))
        pos += ln
    n_pps = cfg[pos]
    pos += 1
    pps_list = []
    for _ in range(n_pps):
        ln = int.from_bytes(cfg[pos : pos + 2], "big")
        pos += 2
        pps_list.append(parse_pps(_unescape(cfg[pos : pos + ln])))
        pos += ln
    return {"length_size": length_size, "sps": sps_list, "pps": pps_list}


def h264_sample_info(sample: bytes, length_size: int = 4) -> dict:
    """Classify one AVCC video sample: NAL kinds + slice types, and
    whether it is an IDR (true keyframe)."""
    kinds = []
    slices = []
    idr = False
    for nal in avcc_nal_units(sample, length_size):
        ntype = nal[0] & 0x1F
        kinds.append(_NAL_TYPES.get(ntype, str(ntype)))
        if ntype in (1, 5):
            sh = parse_slice_header(nal)
            slices.append(sh["slice_type"])
            idr = idr or sh["idr"]
    return {"nals": kinds, "slice_types": slices, "idr": idr}


def decode_h264_pixels(buf: bytes) -> None:
    """Macroblock decode is the named boundary — see module docstring
    for the honest rationale (CAVLC codebooks are tabulated spec data
    that cannot pass offline self-certification; CABAC is
    arithmetic-coded)."""
    raise NotImplementedError(
        "H.264: macroblock decode (CAVLC coefficient codebooks are "
        "tabulated ITU data pending a validating source; CABAC is "
        "arithmetic-coded); structure, dimensions, entropy mode and "
        "keyframe classification are available via functions/h264.py"
    )
