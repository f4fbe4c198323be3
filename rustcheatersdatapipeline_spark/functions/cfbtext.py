"""Legacy Office binary text extraction (.doc / .xls / .ppt) — pure stdlib.

The pre-2007 Office formats still make up a visible slice of any
long-tail web crawl. All three live inside the Compound File Binary
container (public [MS-CFB] spec — the OLE2 "structured storage"
filesystem-in-a-file): a FAT of 512/4096-byte sectors, a directory of
named streams, and a mini-FAT for streams under 4 KiB. On top of the
container walk:

- **.doc** ([MS-DOC]): the ``WordDocument`` stream holds the FIB; the
  piece table (Clx → PlcPcd in the ``0Table``/``1Table`` stream) maps
  character positions to text runs, each either 8-bit CP-1252 (the
  ``fCompressed`` bit, file offset ``fc/2``) or UTF-16LE at ``fc``.
  Files without a usable piece table fall back to the contiguous
  ``fcMin..fcMac`` range of non-complex documents.
- **.xls** ([MS-XLS]): the ``Workbook`` stream is a BIFF8 record walk —
  sheet names (BOUNDSHEET) and the shared-string table (SST), including
  strings split across CONTINUE records where each continuation
  re-declares its own compressed/UTF-16 flag byte.
- **.ppt** ([MS-PPT]): the ``PowerPoint Document`` stream is a nested
  record tree; ``TextCharsAtom`` (UTF-16LE) and ``TextBytesAtom``
  (8-bit) carry the visible slide text.

Named boundaries (quarantined upstream, never a task failure):
encrypted documents/workbooks, pre-BIFF8 .xls. Corruption raises
ValueError; every byte read is bounds-checked and every sector chain
carries a cycle guard, so arbitrary bytes cannot loop or blow memory
(same contract as the PNG/GIF/PDF decode caps).

Spark integration: a payload distiller behind
``sources/warc.warc_to_office_documents`` — Arrow-batched pandas_udf,
bounded per-payload work, linear in corpus size at 100 TB.
"""

from __future__ import annotations

_CFB_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
_MAX_STREAM_BYTES = 64 * 1024 * 1024
_MAX_TEXT_CHARS = 32 * 1024 * 1024
_ENDOFCHAIN = 0xFFFFFFFE
_FREESECT = 0xFFFFFFFF


def _u16(b: bytes, o: int) -> int:
    if o + 2 > len(b):
        raise ValueError("CFB: truncated read")
    return int.from_bytes(b[o : o + 2], "little")


def _u32(b: bytes, o: int) -> int:
    if o + 4 > len(b):
        raise ValueError("CFB: truncated read")
    return int.from_bytes(b[o : o + 4], "little")


class _Cfb:
    """Read-only Compound File: directory walk + stream extraction."""

    def __init__(self, buf: bytes) -> None:
        if len(buf) < 512 or not buf.startswith(_CFB_MAGIC):
            raise ValueError("not a CFB container")
        self.buf = buf
        shift = _u16(buf, 30)
        if shift not in (9, 12):
            raise ValueError("CFB: bad sector shift")
        self.ssz = 1 << shift
        if _u16(buf, 32) != 6:
            raise ValueError("CFB: bad mini sector shift")
        self.mini_cutoff = _u32(buf, 56)
        self.fat = self._build_fat()
        self.minifat = self._read_chain_u32s(_u32(buf, 60))
        self.dir_entries = self._read_directory(_u32(buf, 48))
        self.ministream = b""
        if self.dir_entries:
            root = self.dir_entries[0]
            if root[1] == 5:  # root storage holds the mini stream
                self.ministream = self._read_fat_chain(root[2], root[3])

    # -- container plumbing ------------------------------------------------

    def _sector(self, sid: int) -> bytes:
        off = (sid + 1) * self.ssz
        if off + self.ssz > len(self.buf):
            raise ValueError("CFB: sector out of range")
        return self.buf[off : off + self.ssz]

    def _build_fat(self) -> list[int]:
        per = self.ssz // 4
        difat = [_u32(self.buf, 76 + 4 * i) for i in range(109)]
        sid = _u32(self.buf, 68)
        seen = set()
        while sid not in (_ENDOFCHAIN, _FREESECT):
            if sid in seen or len(seen) > 1 << 16:
                raise ValueError("CFB: DIFAT cycle")
            seen.add(sid)
            sec = self._sector(sid)
            difat.extend(_u32(sec, 4 * i) for i in range(per - 1))
            sid = _u32(sec, 4 * (per - 1))
        fat: list[int] = []
        for fsid in difat:
            if fsid in (_ENDOFCHAIN, _FREESECT):
                continue
            sec = self._sector(fsid)
            fat.extend(_u32(sec, 4 * i) for i in range(per))
        return fat

    def _read_fat_chain(self, start: int, size: int) -> bytes:
        if size > _MAX_STREAM_BYTES:
            raise ValueError("CFB: stream exceeds bound")
        out = bytearray()
        sid = start
        seen = set()
        while sid not in (_ENDOFCHAIN, _FREESECT) and len(out) < size:
            if sid in seen:
                raise ValueError("CFB: FAT chain cycle")
            seen.add(sid)
            out += self._sector(sid)
            if sid >= len(self.fat):
                raise ValueError("CFB: chain runs past FAT")
            sid = self.fat[sid]
        if len(out) < size:
            raise ValueError("CFB: chain shorter than stream size")
        return bytes(out[:size])

    def _read_chain_u32s(self, start: int) -> list[int]:
        out: list[int] = []
        sid = start
        seen = set()
        while sid not in (_ENDOFCHAIN, _FREESECT):
            if sid in seen:
                raise ValueError("CFB: miniFAT cycle")
            seen.add(sid)
            sec = self._sector(sid)
            out.extend(_u32(sec, 4 * i) for i in range(self.ssz // 4))
            if sid >= len(self.fat):
                raise ValueError("CFB: chain runs past FAT")
            sid = self.fat[sid]
        return out

    def _read_mini_chain(self, start: int, size: int) -> bytes:
        if size > _MAX_STREAM_BYTES:
            raise ValueError("CFB: stream exceeds bound")
        out = bytearray()
        sid = start
        seen = set()
        while sid not in (_ENDOFCHAIN, _FREESECT) and len(out) < size:
            if sid in seen:
                raise ValueError("CFB: mini chain cycle")
            seen.add(sid)
            off = sid * 64
            if off + 64 > len(self.ministream):
                raise ValueError("CFB: mini sector out of range")
            out += self.ministream[off : off + 64]
            if sid >= len(self.minifat):
                raise ValueError("CFB: chain runs past miniFAT")
            sid = self.minifat[sid]
        if len(out) < size:
            raise ValueError("CFB: mini chain shorter than stream size")
        return bytes(out[:size])

    def _read_directory(self, start: int) -> list[tuple[str, int, int, int]]:
        """(name, type, start sector, size) per entry — walked linearly
        (robust to broken red-black sibling trees)."""
        raw = bytearray()
        sid = start
        seen = set()
        while sid not in (_ENDOFCHAIN, _FREESECT):
            if sid in seen or len(raw) > _MAX_STREAM_BYTES:
                raise ValueError("CFB: directory cycle")
            seen.add(sid)
            raw += self._sector(sid)
            if sid >= len(self.fat):
                raise ValueError("CFB: chain runs past FAT")
            sid = self.fat[sid]
        entries = []
        for off in range(0, len(raw) - 127, 128):
            name_len = _u16(raw, off + 64)
            typ = raw[off + 66]
            if typ == 0 or name_len < 2 or name_len > 64:
                continue
            name = raw[off : off + name_len - 2].decode("utf-16-le", "replace")
            entries.append((name, typ, _u32(raw, off + 116), _u32(raw, off + 120)))
        return entries

    def streams(self) -> dict[str, bytes]:
        out: dict[str, bytes] = {}
        for name, typ, start, size in self.dir_entries:
            if typ != 2 or name in out:
                continue
            if size < self.mini_cutoff:
                out[name] = self._read_mini_chain(start, size)
            else:
                out[name] = self._read_fat_chain(start, size)
        return out


# -------------------------------------------------------------- .doc


def _doc_normalize(text: str) -> str:
    """Word control characters → whitespace: \\r (paragraph), 0x07
    (cell mark), 0x0B (soft break) become newlines; field delimiters
    (0x13/0x14/0x15), object anchors and the rest of C0 drop."""
    out = []
    for ch in text:
        o = ord(ch)
        if ch in "\r\x07\x0b":
            out.append("\n")
        elif ch == "\t":
            out.append("\t")
        elif o < 0x20 or o == 0x7F:
            continue
        else:
            out.append(ch)
    return "\n".join(s for s in (ln.strip() for ln in "".join(out).split("\n")) if s)


def _doc_text(streams: dict[str, bytes]) -> str:
    wd = streams.get("WordDocument")
    if wd is None:
        raise ValueError("DOC: no WordDocument stream")
    if _u16(wd, 0) != 0xA5EC:
        raise ValueError("DOC: bad FIB magic")
    flags = _u16(wd, 0x0A)
    if flags & 0x0100:
        raise NotImplementedError("DOC: encrypted document")
    table = streams.get("1Table" if flags & 0x0200 else "0Table")
    if table is None:  # tolerate a mislabelled fWhichTblStm
        table = streams.get("0Table") or streams.get("1Table")
    pieces: list[str] = []
    total = 0
    if table is not None and len(wd) >= 0x01AA:
        fc_clx, lcb_clx = _u32(wd, 0x01A2), _u32(wd, 0x01A6)
        if lcb_clx and fc_clx + lcb_clx <= len(table):
            clx = table[fc_clx : fc_clx + lcb_clx]
            i = 0
            while i < len(clx) and clx[i] == 0x01:  # RgPrc property blobs
                i += 3 + _u16(clx, i + 1)
            if i < len(clx) and clx[i] == 0x02:
                lcb = _u32(clx, i + 1)
                plc = clx[i + 5 : i + 5 + lcb]
                if len(plc) == lcb and lcb >= 16 and (lcb - 4) % 12 == 0:
                    n = (lcb - 4) // 12
                    cps = [_u32(plc, 4 * j) for j in range(n + 1)]
                    for j in range(n):
                        pcd = 4 * (n + 1) + 8 * j
                        fc_raw = _u32(plc, pcd + 2)
                        fc = fc_raw & 0x3FFFFFFF
                        cch = cps[j + 1] - cps[j]
                        if cch <= 0 or total + cch > _MAX_TEXT_CHARS:
                            continue
                        if fc_raw & 0x40000000:  # fCompressed: 8-bit CP-1252
                            seg = wd[fc // 2 : fc // 2 + cch]
                            pieces.append(seg.decode("cp1252", "replace"))
                        else:
                            seg = wd[fc : fc + 2 * cch]
                            pieces.append(seg.decode("utf-16-le", "replace"))
                        total += cch
    if not pieces:  # non-complex fallback: the contiguous text range
        fc_min, fc_mac = _u32(wd, 24), _u32(wd, 28)
        if not fc_min < fc_mac <= len(wd):
            raise ValueError("DOC: no piece table and no fcMin/fcMac range")
        pieces.append(wd[fc_min:fc_mac].decode("cp1252", "replace"))
    return _doc_normalize("".join(pieces))


# -------------------------------------------------------------- .xls


class _BiffStrings:
    """XLUnicodeRichExtendedString reader over SST + CONTINUE fragments.

    Strings split only at character boundaries; each continuation
    fragment opens with a fresh compressed/UTF-16 flag byte, while
    rich-run and ExtRst payloads continue raw ([MS-XLS] 2.5.293)."""

    def __init__(self, fragments: list[bytes]) -> None:
        self.frags = fragments
        self.fi = 0
        self.pos = 0

    def _avail(self) -> int:
        return len(self.frags[self.fi]) - self.pos

    def _advance(self) -> bool:
        while self.fi + 1 < len(self.frags) and self._avail() == 0:
            self.fi += 1
            self.pos = 0
        return self._avail() > 0

    def take(self, n: int) -> bytes:
        """n raw bytes spanning fragment boundaries freely."""
        out = bytearray()
        while n > 0:
            if not self._advance():
                raise ValueError("XLS: SST runs past CONTINUE data")
            k = min(n, self._avail())
            out += self.frags[self.fi][self.pos : self.pos + k]
            self.pos += k
            n -= k
        return bytes(out)

    def chars(self, cch: int, high: bool) -> str:
        out: list[str] = []
        while cch > 0:
            if self._avail() == 0:
                if not self._advance():
                    raise ValueError("XLS: string runs past CONTINUE data")
                high = bool(self.take(1)[0] & 0x01)  # fresh flag byte
                continue
            width = 2 if high else 1
            k = min(cch, self._avail() // width)
            if k == 0:
                raise ValueError("XLS: split UTF-16 character")
            raw = self.take(k * width)
            out.append(raw.decode("utf-16-le" if high else "latin-1", "replace"))
            cch -= k
        return "".join(out)

    def string(self) -> str:
        cch = int.from_bytes(self.take(2), "little")
        grbit = self.take(1)[0]
        high = bool(grbit & 0x01)
        c_run = int.from_bytes(self.take(2), "little") if grbit & 0x08 else 0
        cb_ext = int.from_bytes(self.take(4), "little") if grbit & 0x04 else 0
        if cch > _MAX_TEXT_CHARS or cb_ext > _MAX_STREAM_BYTES:
            raise ValueError("XLS: string exceeds bound")
        text = self.chars(cch, high)
        self.take(4 * c_run)
        self.take(cb_ext)
        return text


def _xls_text(streams: dict[str, bytes]) -> str:
    wb = streams.get("Workbook")
    if wb is None:
        if "Book" in streams:
            raise NotImplementedError("XLS: pre-BIFF8 workbook")
        raise ValueError("XLS: no Workbook stream")
    out: list[str] = []
    sst_frags: list[bytes] = []
    collecting_sst = False
    pos = 0
    while pos + 4 <= len(wb):
        rid = _u16(wb, pos)
        ln = _u16(wb, pos + 2)
        data = wb[pos + 4 : pos + 4 + ln]
        if len(data) < ln:
            raise ValueError("XLS: truncated record")
        pos += 4 + ln
        if rid == 0x0809 and len(data) >= 2:  # BOF
            ver = _u16(data, 0)
            if ver and ver != 0x0600:
                raise NotImplementedError(f"XLS: pre-BIFF8 workbook (BOF 0x{ver:04x})")
        elif rid == 0x002F:  # FilePass
            raise NotImplementedError("XLS: encrypted workbook")
        elif rid == 0x0085 and len(data) >= 8:  # BoundSheet8
            cch = data[6]
            high = bool(data[7] & 0x01)
            raw = data[8 : 8 + cch * (2 if high else 1)]
            name = raw.decode("utf-16-le" if high else "latin-1", "replace").strip()
            if name:
                out.append(name)
        elif rid == 0x00FC:  # SST
            sst_frags = [data[8:]]
            collecting_sst = True
            continue
        elif rid == 0x003C and collecting_sst:  # CONTINUE
            sst_frags.append(data)
            continue
        collecting_sst = False
    if sst_frags:
        rdr = _BiffStrings(sst_frags)
        total = 0
        while True:
            try:
                if not rdr._advance():
                    break
            except ValueError:
                break
            s = rdr.string().strip()
            if s:
                out.append(s)
                total += len(s)
                if total > _MAX_TEXT_CHARS:
                    break
    if not out:
        raise ValueError("XLS: no sheet names or shared strings")
    return "\n".join(out)


# -------------------------------------------------------------- .ppt


def _ppt_text(streams: dict[str, bytes]) -> str:
    doc = streams.get("PowerPoint Document")
    if doc is None:
        raise ValueError("PPT: no PowerPoint Document stream")
    if "EncryptedSummary" in streams:
        raise NotImplementedError("PPT: encrypted presentation")
    out: list[str] = []
    total = 0
    stack = [(0, len(doc))]
    steps = 0
    while stack and total < _MAX_TEXT_CHARS:
        pos, end = stack.pop()
        while pos + 8 <= end:
            steps += 1
            if steps > 1 << 20:
                raise ValueError("PPT: record walk exceeds bound")
            ver = _u16(doc, pos) & 0x000F
            rtype = _u16(doc, pos + 2)
            ln = _u32(doc, pos + 4)
            body = pos + 8
            if body + ln > end:
                break  # torn tail: keep what we have
            if ver == 0xF:  # container: descend
                stack.append((body + ln, end))
                end = body + ln
                pos = body
                continue
            if rtype == 0x0FA0:  # TextCharsAtom (UTF-16LE)
                s = doc[body : body + ln].decode("utf-16-le", "replace").strip()
                if s:
                    out.append(s)
                    total += len(s)
            elif rtype == 0x0FA8:  # TextBytesAtom (8-bit)
                s = doc[body : body + ln].decode("latin-1", "replace").strip()
                if s:
                    out.append(s)
                    total += len(s)
            pos = body + ln
    if not out:
        raise ValueError("PPT: no text atoms")
    return "\n".join(out)


# ----------------------------------------------------------- dispatch


def cfb_to_text(buf: bytes) -> tuple[str, str]:
    """(kind, visible text) of a legacy Office payload — kind ∈
    doc/xls/ppt, sniffed from the container's stream names. ValueError
    for non-CFB or unrecognized content; NotImplementedError for the
    named encrypted/pre-BIFF8 boundaries (both quarantined upstream)."""
    streams = _Cfb(buf).streams()
    if "WordDocument" in streams:
        return "doc", _doc_text(streams)
    if "Workbook" in streams or "Book" in streams:
        return "xls", _xls_text(streams)
    if "PowerPoint Document" in streams:
        return "ppt", _ppt_text(streams)
    raise ValueError("CFB: no recognized document streams")
