"""Legacy Office binary extraction (functions/cfbtext.py): the oracle
is a test-side forward writer — a spec-shaped CFB container builder
(FAT chains, directory, miniFAT + ministream) plus minimal but
well-formed .doc (FIB + piece table), .xls (BIFF8 BOF/BoundSheet8/SST
with CONTINUE splits), and .ppt (record tree with text atoms) writers."""

from math import ceil

import numpy as np
import pytest

from rustcheatersdatapipeline_spark.functions.cfbtext import (
    _Cfb,
    cfb_to_text,
)

_END = 0xFFFFFFFE
_FREE = 0xFFFFFFFF


def make_cfb(streams: dict[str, bytes]) -> bytes:
    """v3 (512-byte sector) compound file: streams under 4096 bytes go
    through the ministream + miniFAT, the rest through FAT chains."""
    ssz = 512
    minis = {n: d for n, d in streams.items() if len(d) < 4096}
    regs = {n: d for n, d in streams.items() if len(d) >= 4096}

    mini_data = bytearray()
    mini_chains: dict[str, int] = {}
    minifat: list[int] = []
    for n, d in minis.items():
        nsec = max(1, ceil(len(d) / 64))
        start = len(minifat)
        mini_chains[n] = start
        minifat.extend(start + i + 1 for i in range(nsec - 1))
        minifat.append(_END)
        mini_data += d + b"\0" * (nsec * 64 - len(d))

    dir_secs = max(1, ceil((1 + len(streams)) * 128 / ssz))
    minifat_secs = ceil(len(minifat) * 4 / ssz) if minifat else 0
    mini_secs = ceil(len(mini_data) / ssz) if mini_data else 0
    reg_secs = {n: max(1, ceil(len(d) / ssz)) for n, d in regs.items()}
    data_secs = dir_secs + minifat_secs + mini_secs + sum(reg_secs.values())
    fat_secs = 1
    while ceil((fat_secs + data_secs) / (ssz // 4)) > fat_secs:
        fat_secs += 1
    total = fat_secs + data_secs

    fat = [_FREE] * total
    for i in range(fat_secs):
        fat[i] = 0xFFFFFFFD  # FATSECT marker
    pos = fat_secs

    def chain(nsec: int) -> int:
        nonlocal pos
        if nsec == 0:
            return _END
        start = pos
        for i in range(nsec):
            fat[pos] = pos + 1 if i < nsec - 1 else _END
            pos += 1
        return start

    dir_start = chain(dir_secs)
    minifat_start = chain(minifat_secs)
    mini_start = chain(mini_secs)
    reg_starts = {n: chain(reg_secs[n]) for n in regs}

    def dirent(name: str, typ: int, start: int, size: int) -> bytes:
        e = bytearray(128)
        nm = name.encode("utf-16-le")
        e[0 : len(nm)] = nm
        e[64:66] = (len(nm) + 2).to_bytes(2, "little")
        e[66] = typ
        e[67] = 1
        e[68:72] = e[72:76] = e[76:80] = _FREE.to_bytes(4, "little")
        e[116:120] = (start & 0xFFFFFFFF).to_bytes(4, "little")
        e[120:128] = size.to_bytes(8, "little")
        return bytes(e)

    entries = [dirent("Root Entry", 5, mini_start, len(mini_data))]
    for n, d in streams.items():
        if n in minis:
            entries.append(dirent(n, 2, mini_chains[n], len(d)))
        else:
            entries.append(dirent(n, 2, reg_starts[n], len(d)))
    dir_blob = b"".join(entries)
    dir_blob += b"\0" * (dir_secs * ssz - len(dir_blob))
    minifat_blob = b"".join(v.to_bytes(4, "little") for v in minifat)
    minifat_blob += b"\xff" * (minifat_secs * ssz - len(minifat_blob))
    mini_blob = bytes(mini_data) + b"\0" * (mini_secs * ssz - len(mini_data))
    reg_blob = b""
    for n, d in regs.items():
        reg_blob += d + b"\0" * (reg_secs[n] * ssz - len(d))
    fat_blob = b"".join(v.to_bytes(4, "little") for v in fat)
    fat_blob += b"\xff" * (fat_secs * ssz - len(fat_blob))

    h = bytearray(512)
    h[0:8] = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
    h[24:26] = (0x3E).to_bytes(2, "little")
    h[26:28] = (3).to_bytes(2, "little")
    h[28:30] = (0xFFFE).to_bytes(2, "little")
    h[30:32] = (9).to_bytes(2, "little")
    h[32:34] = (6).to_bytes(2, "little")
    h[44:48] = fat_secs.to_bytes(4, "little")
    h[48:52] = dir_start.to_bytes(4, "little")
    h[56:60] = (4096).to_bytes(4, "little")
    h[60:64] = (minifat_start & 0xFFFFFFFF).to_bytes(4, "little")
    h[64:68] = minifat_secs.to_bytes(4, "little")
    h[68:72] = _END.to_bytes(4, "little")
    h[72:76] = (0).to_bytes(4, "little")
    for i in range(109):
        h[76 + 4 * i : 80 + 4 * i] = (
            i if i < fat_secs else _FREE
        ).to_bytes(4, "little")
    return bytes(h) + fat_blob + dir_blob + minifat_blob + mini_blob + reg_blob


# ------------------------------------------------------------ writers


def make_doc_streams(
    pieces: list[tuple[str, bool]],
    which_table: int = 1,
    encrypted: bool = False,
    no_clx: bool = False,
) -> dict[str, bytes]:
    """WordDocument + table stream: each piece is (text, fCompressed)."""
    wd = bytearray(1472)
    wd[0:2] = (0xA5EC).to_bytes(2, "little")
    wd[2:4] = (0x00C1).to_bytes(2, "little")
    flags = (0x0200 if which_table else 0) | (0x0100 if encrypted else 0)
    wd[0x0A:0x0C] = flags.to_bytes(2, "little")
    if no_clx:
        fc_min = len(wd)
        raw = "".join(s for s, _ in pieces).encode("cp1252")
        wd += raw
        wd[24:28] = fc_min.to_bytes(4, "little")
        wd[28:32] = (fc_min + len(raw)).to_bytes(4, "little")
        return {"WordDocument": bytes(wd), "1Table" if which_table else "0Table": b""}
    cps = [0]
    fcs: list[int] = []
    for s, comp in pieces:
        if comp:
            fcs.append((len(wd) * 2) | 0x40000000)
            wd += s.encode("cp1252")
        else:
            fcs.append(len(wd))
            wd += s.encode("utf-16-le")
        cps.append(cps[-1] + len(s))
    plc = b"".join(cp.to_bytes(4, "little") for cp in cps)
    for fc_raw in fcs:
        plc += b"\0\0" + fc_raw.to_bytes(4, "little") + b"\0\0"
    clx = b"\x01\x02\x00\xaa\xbb" + b"\x02" + len(plc).to_bytes(4, "little") + plc
    table = b"\0" * 64 + clx
    wd[0x01A2:0x01A6] = (64).to_bytes(4, "little")
    wd[0x01A6:0x01AA] = len(clx).to_bytes(4, "little")
    return {"WordDocument": bytes(wd), "1Table" if which_table else "0Table": table}


def _biff_rec(rid: int, data: bytes) -> bytes:
    return rid.to_bytes(2, "little") + len(data).to_bytes(2, "little") + data


def _xl_string(s: str) -> bytes:
    high = any(ord(c) > 0xFF for c in s)
    enc = s.encode("utf-16-le") if high else s.encode("latin-1")
    return len(s).to_bytes(2, "little") + bytes([1 if high else 0]) + enc


def make_xls_stream(
    sheets: list[str],
    strings: list[str],
    split_at: int | None = None,
    bof_version: int = 0x0600,
    encrypted: bool = False,
) -> bytes:
    """Workbook stream; ``split_at`` splits the SST after that many
    encoded strings, continuing mid-string in a CONTINUE record with a
    fresh flag byte (the [MS-XLS] 2.5.293 continuation shape)."""
    out = _biff_rec(0x0809, bof_version.to_bytes(2, "little") + (5).to_bytes(2, "little") + b"\0" * 12)
    if encrypted:
        out += _biff_rec(0x002F, b"\x01\x00\x02\x00")
    for nm in sheets:
        body = (0).to_bytes(4, "little") + b"\0\0" + bytes([len(nm), 0]) + nm.encode("latin-1")
        out += _biff_rec(0x0085, body)
    sst_head = len(strings).to_bytes(4, "little") + len(strings).to_bytes(4, "little")
    if split_at is None:
        out += _biff_rec(0x00FC, sst_head + b"".join(_xl_string(s) for s in strings))
    else:
        first = b"".join(_xl_string(s) for s in strings[:split_at])
        tail = strings[split_at]
        k = max(1, len(tail) // 2)
        head_part = len(tail).to_bytes(2, "little") + b"\x00" + tail[:k].encode("latin-1")
        # continuation re-declares its own flag byte: go UTF-16 there
        cont = b"\x01" + tail[k:].encode("utf-16-le")
        cont += b"".join(_xl_string(s) for s in strings[split_at + 1 :])
        out += _biff_rec(0x00FC, sst_head + first + head_part)
        out += _biff_rec(0x003C, cont)
    out += _biff_rec(0x000A, b"")
    return out


def _ppt_atom(rtype: int, data: bytes) -> bytes:
    return b"\x00\x00" + rtype.to_bytes(2, "little") + len(data).to_bytes(4, "little") + data


def make_ppt_stream(texts: list[str]) -> bytes:
    atoms = b""
    for i, t in enumerate(texts):
        if i % 2 == 0:
            atoms += _ppt_atom(0x0FA0, t.encode("utf-16-le"))
        else:
            atoms += _ppt_atom(0x0FA8, t.encode("latin-1"))
    container = b"\x0f\x00" + (0x03EE).to_bytes(2, "little") + len(atoms).to_bytes(4, "little") + atoms
    return container


# -------------------------------------------------------------- tests


def test_cfb_container_roundtrip_mini_and_regular():
    rng = np.random.RandomState(51)
    small = rng.bytes(100)
    exact = rng.bytes(4096)
    big = rng.bytes(9000)
    streams = {"Tiny": small, "Exact": exact, "Big": big}
    got = _Cfb(make_cfb(streams)).streams()
    assert got == streams


def test_doc_piece_table_mixed_encodings():
    pieces = [
        ("Hello world.\r", True),
        ("Ünïcode — em-dash piece.\r", False),
        ("Tab\there\r", True),
    ]
    kind, text = cfb_to_text(make_cfb(make_doc_streams(pieces)))
    assert kind == "doc"
    assert text == "Hello world.\nÜnïcode — em-dash piece.\nTab\there"


def test_doc_zero_table_variant_and_fallback():
    pieces = [("Plain text body.\r", True)]
    kind, text = cfb_to_text(make_cfb(make_doc_streams(pieces, which_table=0)))
    assert kind == "doc" and text == "Plain text body."
    kind, text = cfb_to_text(make_cfb(make_doc_streams(pieces, no_clx=True)))
    assert kind == "doc" and text == "Plain text body."


def test_doc_encrypted_named_boundary():
    buf = make_cfb(make_doc_streams([("x", True)], encrypted=True))
    with pytest.raises(NotImplementedError, match="DOC: encrypted"):
        cfb_to_text(buf)


def test_xls_sheets_and_sst():
    wb = make_xls_stream(["Revenue", "Q2"], ["alpha", "béta", "中文 string"])
    kind, text = cfb_to_text(make_cfb({"Workbook": wb}))
    assert kind == "xls"
    assert text.split("\n") == ["Revenue", "Q2", "alpha", "béta", "中文 string"]


def test_xls_sst_continue_split_mid_string():
    strings = ["first", "a-long-shared-string-value", "last"]
    wb = make_xls_stream(["S"], strings, split_at=1)
    _, text = cfb_to_text(make_cfb({"Workbook": wb}))
    assert text.split("\n") == ["S"] + strings


def test_xls_named_boundaries():
    wb = make_xls_stream(["S"], ["x"], bof_version=0x0500)
    with pytest.raises(NotImplementedError, match="pre-BIFF8"):
        cfb_to_text(make_cfb({"Workbook": wb}))
    wb = make_xls_stream(["S"], ["x"], encrypted=True)
    with pytest.raises(NotImplementedError, match="encrypted"):
        cfb_to_text(make_cfb({"Workbook": wb}))
    with pytest.raises(NotImplementedError, match="pre-BIFF8"):
        cfb_to_text(make_cfb({"Book": b"\x09\x02\x04\x00\x00\x02\x10\x00"}))


def test_ppt_text_atoms():
    texts = ["Title slide", "Bullet one", "Closing"]
    kind, text = cfb_to_text(make_cfb({"PowerPoint Document": make_ppt_stream(texts)}))
    assert kind == "ppt"
    assert text.split("\n") == texts


def test_unrecognized_cfb_and_non_cfb():
    with pytest.raises(ValueError, match="no recognized"):
        cfb_to_text(make_cfb({"Mystery": b"payload"}))
    with pytest.raises(ValueError, match="not a CFB"):
        cfb_to_text(b"PK\x03\x04 definitely a zip")


def test_mutation_totality():
    from rustcheatersdatapipeline_spark.functions.pixels import DECODE_QUARANTINE

    bases = [
        make_cfb(make_doc_streams([("Hello piece table.\r", True), ("Más.\r", False)])),
        make_cfb({"Workbook": make_xls_stream(["S"], ["alpha", "béta"], split_at=0)}),
        make_cfb({"PowerPoint Document": make_ppt_stream(["One", "Two"])}),
    ]
    rng = np.random.RandomState(3)
    for base in bases:
        for _ in range(150):
            buf = bytearray(base)
            buf[rng.randint(0, len(buf))] ^= rng.randint(1, 256)
            try:
                cfb_to_text(bytes(buf[: rng.randint(0, len(buf) + 1)]))
            except DECODE_QUARANTINE:
                pass


def test_crawl_distillation_legacy_doc(spark, tmp_path):
    """A legacy binary .doc response in a WARC distills into the
    documents shape alongside the OOXML path."""
    from rustcheatersdatapipeline_spark.plans.crawl import distill_and_curate
    from tests.test_crawl_pipeline import _crawl_bytes
    from tests.test_warc_source import http_response, warc_record

    words = " ".join(f"token{i}" for i in range(40))
    doc = make_cfb(
        make_doc_streams([(f"A legacy word file about data pipelines. {words}\r", True)])
    )
    recs = _crawl_bytes() + warc_record(
        "response",
        "http://a.test/memo.doc",
        http_response(doc, ctype="application/msword"),
        rid="<urn:doc1>",
    )
    (tmp_path / "dump.warc").write_bytes(recs)
    out = {r["source"]: r for r in distill_and_curate(spark, str(tmp_path)).collect()}
    assert "http://a.test/memo.doc" in out
    assert "legacy word file about data pipelines" in out["http://a.test/memo.doc"]["text"]
