"""Dependency-free legacy ``.xls`` (BIFF8) codec — stdlib ``struct`` only.

The reference fileserver accepts ``.xlsx/.xls/.xlsm`` uploads
(`fileserver.py:41-44`) and reads them with pandas+xlrd
(`fileserver.py:131-172`); this image ships no xlrd, so `read_excel`'s
executor-side decode of legacy files uses THIS parser. An ``.xls`` file
is an OLE2/CFB compound document whose ``Workbook`` stream holds BIFF8
records; the subset a data table needs is:

- CFB container: FAT + miniFAT sector chains, directory, stream read
- workbook globals: BOUNDSHEET (sheet名 → substream offset), SST
  (shared strings, CONTINUE-spanning)
- worksheet cells: NUMBER, RK, MULRK, LABELSST, LABEL, BOOLERR, FORMULA
  (cached numeric / string results)

Out of scope (raise cleanly): BIFF5 and earlier, encrypted workbooks
(FILEPASS), ``.xlsb``. `build_xls_bytes` is a minimal writer used by
`tests/test_xls_biff.py` and the `src_excel_xls` oracle query to
construct real legacy workbooks in-image.
"""

from __future__ import annotations

import io
import struct

import pandas as pd

CFB_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
_ENDOFCHAIN = 0xFFFFFFFE
_FREESECT = 0xFFFFFFFF
_FATSECT = 0xFFFFFFFD


# ---------------------------------------------------------------------------
# CFB (OLE2 compound file) container
# ---------------------------------------------------------------------------

class _Cfb:
    def __init__(self, raw: bytes):
        if raw[:8] != CFB_MAGIC:
            raise ValueError("not an OLE2/CFB file (bad magic)")
        (self.sector_shift,) = struct.unpack_from("<H", raw, 30)
        # v3 = 512-byte sectors (shift 9), v4 = 4096 (shift 12); anything
        # else is corrupt. _sector handles both via (n+1)<<shift — the
        # header always occupies exactly one sector.
        if self.sector_shift not in (9, 12):
            raise ValueError(
                f"corrupt CFB header: sector shift {self.sector_shift} "
                "(expected 9 for v3 or 12 for v4)")
        (self.mini_shift,) = struct.unpack_from("<H", raw, 32)
        (self.n_fat,) = struct.unpack_from("<I", raw, 44)
        (self.dir_start,) = struct.unpack_from("<I", raw, 48)
        (self.mini_cutoff,) = struct.unpack_from("<I", raw, 56)
        (self.minifat_start,) = struct.unpack_from("<I", raw, 60)
        (self.n_minifat,) = struct.unpack_from("<I", raw, 64)
        (self.difat_start,) = struct.unpack_from("<I", raw, 68)
        (self.n_difat,) = struct.unpack_from("<I", raw, 72)
        self.ssz = 1 << self.sector_shift
        self.msz = 1 << self.mini_shift
        self.raw = raw

        difat = list(struct.unpack_from("<109I", raw, 76))
        sec = self.difat_start
        for _ in range(self.n_difat):
            if sec in (_ENDOFCHAIN, _FREESECT):
                break
            body = self._sector(sec)
            ids = struct.unpack(f"<{self.ssz // 4}I", body)
            difat.extend(ids[:-1])
            sec = ids[-1]
        fat = b"".join(self._sector(s) for s in difat
                       if s not in (_FREESECT, _ENDOFCHAIN))
        self.fat = struct.unpack(f"<{len(fat) // 4}I", fat)

        dir_raw = self._read_chain(self.dir_start)
        self.entries = []
        for off in range(0, len(dir_raw), 128):
            ent = dir_raw[off:off + 128]
            if len(ent) < 128:
                break
            (cb,) = struct.unpack_from("<H", ent, 64)
            name = ent[:max(cb - 2, 0)].decode("utf-16-le", errors="replace")
            etype = ent[66]
            (start,) = struct.unpack_from("<I", ent, 116)
            (size,) = struct.unpack_from("<Q", ent, 120)
            self.entries.append((name, etype, start, size))

        root = next(e for e in self.entries if e[1] == 5)
        self._mini_carrier = self._read_chain(root[2]) if \
            root[2] not in (_ENDOFCHAIN, _FREESECT) else b""
        if self.minifat_start not in (_ENDOFCHAIN, _FREESECT):
            mf = self._read_chain(self.minifat_start)
            self.minifat = struct.unpack(f"<{len(mf) // 4}I", mf)
        else:
            self.minifat = ()

    def _sector(self, n: int) -> bytes:
        # sector 0 starts one full sector past the header: offset 512 for
        # v3, 4096 for v4 (the v4 header is zero-padded to sector size)
        off = (n + 1) * self.ssz
        return self.raw[off:off + self.ssz]

    def _read_chain(self, start: int) -> bytes:
        out, sec, seen = [], start, set()
        while sec not in (_ENDOFCHAIN, _FREESECT):
            if sec in seen or sec >= len(self.fat):
                raise ValueError("corrupt CFB FAT chain")
            seen.add(sec)
            out.append(self._sector(sec))
            sec = self.fat[sec]
        return b"".join(out)

    def _read_mini_chain(self, start: int) -> bytes:
        out, sec, seen = [], start, set()
        while sec not in (_ENDOFCHAIN, _FREESECT):
            if sec in seen or sec >= len(self.minifat):
                raise ValueError("corrupt CFB miniFAT chain")
            seen.add(sec)
            out.append(self._mini_carrier[sec * self.msz:(sec + 1) * self.msz])
            sec = self.minifat[sec]
        return b"".join(out)

    def stream(self, *names: str) -> bytes:
        for name, etype, start, size in self.entries:
            if etype == 2 and name in names:
                body = self._read_mini_chain(start) if size < self.mini_cutoff \
                    else self._read_chain(start)
                return body[:size]
        raise ValueError(f"CFB stream not found: {names}")


# ---------------------------------------------------------------------------
# BIFF8 record stream
# ---------------------------------------------------------------------------

_BOF, _EOF, _CONTINUE = 0x0809, 0x000A, 0x003C
_BOUNDSHEET, _SST, _FILEPASS = 0x0085, 0x00FC, 0x002F
_NUMBER, _RK, _MULRK, _LABELSST = 0x0203, 0x027E, 0x00BD, 0x00FD
_LABEL, _BOOLERR, _FORMULA, _STRING = 0x0204, 0x0205, 0x0006, 0x0207


def _records(data: bytes, pos: int = 0):
    """(type, payload, offset) triples; stops at stream end or zero pad."""
    n = len(data)
    while pos + 4 <= n:
        rt, ln = struct.unpack_from("<HH", data, pos)
        if rt == 0:  # sector zero-padding past the last record
            return
        yield rt, data[pos + 4:pos + 4 + ln], pos
        pos += 4 + ln


def _read_unicode(buf: bytes, off: int, cch: int) -> tuple[str, int]:
    """XLUnicodeString body at ``off`` (after the length field): returns
    (text, bytes consumed including the grbit byte)."""
    grbit = buf[off]
    consumed = 1
    rich = 4 if grbit & 0x08 else 0
    ext = 4 if grbit & 0x04 else 0
    n_rt = struct.unpack_from("<H", buf, off + consumed)[0] if rich else 0
    if rich:
        consumed += 2
    cb_ext = struct.unpack_from("<I", buf, off + consumed)[0] if ext else 0
    if ext:
        consumed += 4
    nbytes = 2 * cch if grbit & 0x01 else cch
    raw = buf[off + consumed:off + consumed + nbytes]
    if len(raw) < nbytes:
        # a LABEL / STRING record whose text spills into a CONTINUE
        # record (cell string > 8224-byte record cap): raise rather than
        # silently truncate to the first fragment. (SST strings, the only
        # place Excel routinely continues, ARE merged — _parse_sst.)
        raise ValueError(
            f"string record truncated: need {nbytes} bytes, have "
            f"{len(raw)} (CONTINUE-spanning LABEL/STRING unsupported)")
    text = raw.decode("utf-16-le" if grbit & 0x01 else "latin-1")
    consumed += nbytes + n_rt * 4 + cb_ext
    return text, consumed


def _parse_sst(payload: bytes, continues: list[bytes]) -> list[str]:
    """Shared-string table, spanning CONTINUE records. At a continuation
    boundary a string restarts with a fresh grbit byte (the encoding may
    switch between compressed and UTF-16 mid-string)."""
    (_, n_unique) = struct.unpack("<II", payload[:8])
    chunks = [payload[8:]] + continues
    out: list[str] = []
    ci, off = 0, 0

    def remaining() -> int:
        return len(chunks[ci]) - off

    def advance_chunk():
        nonlocal ci, off
        if ci + 1 >= len(chunks):
            raise ValueError("corrupt SST: string data exhausted before "
                             f"{n_unique} strings were read")
        ci += 1
        off = 0

    def read(n: int) -> bytes:
        nonlocal off
        b = chunks[ci][off:off + n]
        off += n
        return b

    while len(out) < n_unique:
        if remaining() < 3:
            advance_chunk()
        cch = struct.unpack("<H", read(2))[0]
        grbit = read(1)[0]
        rich = 4 if grbit & 0x08 else 0
        ext = 4 if grbit & 0x04 else 0
        n_rt = struct.unpack("<H", read(2))[0] if rich else 0
        cb_ext = struct.unpack("<I", read(4))[0] if ext else 0
        text, need = "", cch
        wide = bool(grbit & 0x01)
        while need:
            if remaining() == 0:
                advance_chunk()
                wide = bool(read(1)[0] & 0x01)  # re-specified grbit
            take = min(need, remaining() // (2 if wide else 1))
            if take == 0:
                # remaining()==1 with wide chars: a chunk may not end
                # mid-character — without this a truncated workbook spins
                # here forever (need never decreases)
                raise ValueError("corrupt SST: partial character at "
                                 "CONTINUE boundary")
            raw = read(take * (2 if wide else 1))
            text += raw.decode("utf-16-le" if wide else "latin-1")
            need -= take
        skip = n_rt * 4 + cb_ext
        while skip:
            if remaining() == 0:
                advance_chunk()
            t = min(skip, remaining())
            read(t)
            skip -= t
        out.append(text)
    return out


def _decode_rk(rk: int):
    f_div100 = rk & 0x01
    f_int = rk & 0x02
    if f_int:
        v = rk >> 2
        if v & 0x20000000:  # sign-extend 30-bit
            v -= 0x40000000
        num: float | int = v
    else:
        num = struct.unpack("<d", struct.pack("<Q", (rk & 0xFFFFFFFC) << 32))[0]
    if f_div100:
        q, r = divmod(num, 100) if isinstance(num, int) else (None, None)
        num = q if r == 0 else num / 100
    if isinstance(num, float) and num.is_integer() and abs(num) < 2 ** 53:
        num = int(num)
    return num


def list_xls_sheet_names(raw: bytes) -> list[str]:
    wb = _Cfb(raw).stream("Workbook", "Book")
    names = []
    for rt, payload, _ in _records(wb):
        if rt == _BOUNDSHEET:
            cch = payload[6]
            name, _ = _read_unicode(payload, 7, cch)
            names.append(name)
        elif rt == _EOF:
            break
    return names


def parse_xls_rows(raw: bytes, sheet_name: int | str = 0) -> list[list]:
    """Raw cell grid of one sheet (same shape as xlsx.parse_xlsx_rows)."""
    wb = _Cfb(raw).stream("Workbook", "Book")

    ver = struct.unpack_from("<H", wb, 4)[0] if len(wb) >= 6 else 0
    if ver and ver < 0x0600:
        raise NotImplementedError(
            f"BIFF version 0x{ver:04x}: only BIFF8 (.xls written by "
            "Excel 97+) is supported")

    sheets: list[tuple[str, int]] = []  # (name, stream offset of sheet BOF)
    sst: list[str] = []
    pending_sst: bytes | None = None
    pending_cont: list[bytes] = []
    for rt, payload, _ in _records(wb):
        if rt == _FILEPASS:
            raise NotImplementedError("encrypted .xls (FILEPASS) unsupported")
        if rt == _BOUNDSHEET:
            (pos,) = struct.unpack_from("<I", payload, 0)
            name, _ = _read_unicode(payload, 7, payload[6])
            sheets.append((name, pos))
        elif rt == _SST:
            pending_sst, pending_cont = payload, []
        elif rt == _CONTINUE and pending_sst is not None:
            pending_cont.append(payload)
        elif rt == _EOF:
            break
    if pending_sst is not None:
        sst = _parse_sst(pending_sst, pending_cont)

    if isinstance(sheet_name, int):
        if not 0 <= sheet_name < len(sheets):
            raise ValueError(f"sheet index {sheet_name} out of range "
                             f"({len(sheets)} sheets)")
        start = sheets[sheet_name][1]
    else:
        by_name = dict(sheets)
        if sheet_name not in by_name:
            raise ValueError(f"sheet {sheet_name!r} not found; "
                             f"have {[n for n, _ in sheets]}")
        start = by_name[sheet_name]

    cells: dict[tuple[int, int], object] = {}
    last_formula_rc: tuple[int, int] | None = None
    for rt, payload, _ in _records(wb, start):
        if rt == _EOF:
            break
        if rt == _NUMBER:
            rw, col = struct.unpack_from("<HH", payload, 0)
            (v,) = struct.unpack_from("<d", payload, 6)
            cells[rw, col] = int(v) if v.is_integer() and abs(v) < 2 ** 53 else v
        elif rt == _RK:
            rw, col = struct.unpack_from("<HH", payload, 0)
            (rk,) = struct.unpack_from("<I", payload, 6)
            cells[rw, col] = _decode_rk(rk)
        elif rt == _MULRK:
            rw, col0 = struct.unpack_from("<HH", payload, 0)
            n = (len(payload) - 6) // 6
            for i in range(n):
                (rk,) = struct.unpack_from("<I", payload, 4 + i * 6 + 2)
                cells[rw, col0 + i] = _decode_rk(rk)
        elif rt == _LABELSST:
            rw, col = struct.unpack_from("<HH", payload, 0)
            (isst,) = struct.unpack_from("<I", payload, 6)
            cells[rw, col] = sst[isst]
        elif rt == _LABEL:
            rw, col = struct.unpack_from("<HH", payload, 0)
            (cch,) = struct.unpack_from("<H", payload, 6)
            cells[rw, col], _c = _read_unicode(payload, 8, cch)
        elif rt == _BOOLERR:
            rw, col = struct.unpack_from("<HH", payload, 0)
            val, is_err = payload[6], payload[7]
            if not is_err:
                cells[rw, col] = bool(val)
        elif rt == _FORMULA:
            rw, col = struct.unpack_from("<HH", payload, 0)
            res = payload[6:14]
            if res[6:8] == b"\xff\xff":
                if res[0] == 0:      # string result: next STRING record
                    last_formula_rc = (rw, col)
                elif res[0] == 1:    # boolean
                    cells[rw, col] = bool(res[2])
            else:
                (v,) = struct.unpack("<d", res)
                cells[rw, col] = int(v) if v.is_integer() and abs(v) < 2 ** 53 else v
        elif rt == _STRING and last_formula_rc is not None:
            (cch,) = struct.unpack_from("<H", payload, 0)
            cells[last_formula_rc], _c = _read_unicode(payload, 2, cch)
            last_formula_rc = None

    if not cells:
        return []
    n_rows = max(r for r, _ in cells) + 1
    width = max(c for _, c in cells) + 1
    return [[cells.get((r, c)) for c in range(width)] for r in range(n_rows)]


def parse_xls(raw: bytes, sheet_name: int | str = 0,
              skiprows: int | None = None, nrows: int | None = None,
              usecols: str | None = None) -> pd.DataFrame:
    """pandas.read_excel-shaped parse of a BIFF8 workbook — the same
    header/skiprows/nrows/usecols surface as xlsx.parse_xlsx."""
    from .xlsx import grid_to_frame

    return grid_to_frame(parse_xls_rows(raw, sheet_name),
                         skiprows=skiprows, nrows=nrows, usecols=usecols)


# ---------------------------------------------------------------------------
# minimal writer (tests / oracle-query fixtures)
# ---------------------------------------------------------------------------

def _rec(rt: int, payload: bytes) -> bytes:
    if len(payload) > 8224:
        raise ValueError("record too large for a single BIFF record")
    return struct.pack("<HH", rt, len(payload)) + payload


def _ustr(s: str) -> bytes:
    """16-bit-length XLUnicodeString (SST / LABEL form). cch counts
    UTF-16 CODE UNITS, not characters — an astral-plane char is a
    surrogate pair and counts twice (hypothesis-caught)."""
    if all(ord(ch) < 256 for ch in s):
        return struct.pack("<HB", len(s), 0) + s.encode("latin-1")
    enc = s.encode("utf-16-le")
    return struct.pack("<HB", len(enc) // 2, 1) + enc


def _shortstr(s: str) -> bytes:
    """8-bit-length string (BOUNDSHEET sheet name); cch = UTF-16 units."""
    if all(ord(ch) < 256 for ch in s):
        return struct.pack("<BB", len(s), 0) + s.encode("latin-1")
    enc = s.encode("utf-16-le")
    return struct.pack("<BB", len(enc) // 2, 1) + enc


def _bof(dt: int) -> bytes:
    return _rec(_BOF, struct.pack("<HHHHII", 0x0600, dt, 0x0DBB, 0x07CC, 0, 0))


def build_xls_bytes(sheets: dict[str, list[list]]) -> bytes:
    """Real BIFF8 ``.xls`` bytes from {sheet_name: row grid}: a CFB
    container with a single ``Workbook`` stream — globals substream
    (BOUNDSHEETs + SST) followed by one worksheet substream per sheet.
    Strings go through the SST (LABELSST cells), numbers as NUMBER,
    booleans as BOOLERR — the cell types `parse_xls` and xlrd both read."""
    strings: list[str] = []
    s_index: dict[str, int] = {}
    n_refs = 0
    for rows in sheets.values():
        for row in rows:
            for v in row:
                if isinstance(v, str):
                    n_refs += 1
                    if v not in s_index:
                        s_index[v] = len(strings)
                        strings.append(v)

    sheet_bodies = []
    for rows in sheets.values():
        body = [_bof(0x0010)]
        for ri, row in enumerate(rows):
            for ci, v in enumerate(row):
                if v is None:
                    continue
                if isinstance(v, bool):
                    body.append(_rec(_BOOLERR, struct.pack(
                        "<HHHBB", ri, ci, 15, int(v), 0)))
                elif isinstance(v, (int, float)):
                    body.append(_rec(_NUMBER, struct.pack(
                        "<HHHd", ri, ci, 15, float(v))))
                else:
                    body.append(_rec(_LABELSST, struct.pack(
                        "<HHHI", ri, ci, 15, s_index[str(v)])))
        body.append(_rec(_EOF, b""))
        sheet_bodies.append(b"".join(body))

    # SST with CONTINUE spill: records cap at 8224 payload bytes, so the
    # string blobs pack greedily into chunks, split only at STRING
    # boundaries (a mid-string split would need a grbit restart; readers
    # including ours handle boundary-between-strings with no restart)
    _REC_CAP = 8224
    sst_chunks: list[bytes] = [struct.pack("<II", n_refs, len(strings))]
    for s in strings:
        blob = _ustr(s)
        if len(blob) + 8 > _REC_CAP:
            raise ValueError("single string exceeds BIFF record capacity")
        if len(sst_chunks[-1]) + len(blob) > _REC_CAP:
            sst_chunks.append(b"")
        sst_chunks[-1] += blob

    # globals size depends on BOUNDSHEET offsets which depend on globals
    # size — fixed-point in two passes (record sizes don't change)
    offsets = [0] * len(sheets)
    for _ in range(2):
        globals_recs = [_bof(0x0005)]
        for i, name in enumerate(sheets):
            globals_recs.append(_rec(_BOUNDSHEET, struct.pack(
                "<IH", offsets[i], 0) + _shortstr(name)))
        if strings or n_refs:
            globals_recs.append(_rec(_SST, sst_chunks[0]))
            globals_recs.extend(_rec(_CONTINUE, c) for c in sst_chunks[1:])
        globals_recs.append(_rec(_EOF, b""))
        glen = sum(len(r) for r in globals_recs)
        pos = glen
        for i, sb in enumerate(sheet_bodies):
            offsets[i] = pos
            pos += len(sb)
    workbook = b"".join(globals_recs) + b"".join(sheet_bodies)
    return _build_cfb({"Workbook": workbook})


def _build_cfb(streams: dict[str, bytes]) -> bytes:
    """Single-stream CFB v3 writer. The stream is zero-padded to ≥4096
    bytes so it lives in regular FAT sectors (no ministream); BIFF readers
    stop at the trailing EOF record so the padding is inert."""
    assert len(streams) == 1
    (name, data), = streams.items()
    data = data + b"\x00" * max(0, 4096 - len(data))
    size = (len(data) + 511) // 512 * 512
    data = data + b"\x00" * (size - len(data))
    n_stream = size // 512

    n_fat = 1
    while ((n_fat + 1 + n_stream) * 4 + 511) // 512 > n_fat:
        n_fat += 1
    dir_sec = n_fat
    stream_start = n_fat + 1
    n_total = n_fat + 1 + n_stream

    fat = []
    for i in range(n_fat):
        fat.append(_FATSECT)
    fat.append(_ENDOFCHAIN)  # directory: one sector
    for i in range(n_stream - 1):
        fat.append(stream_start + i + 1)
    fat.append(_ENDOFCHAIN)
    fat += [_FREESECT] * (n_fat * 128 - len(fat))
    fat_bytes = struct.pack(f"<{len(fat)}I", *fat)

    def dirent(ename: str, etype: int, start: int, esize: int,
               root: bool = False) -> bytes:
        enc = ename.encode("utf-16-le") + b"\x00\x00"
        ent = bytearray(128)
        ent[0:len(enc)] = enc
        struct.pack_into("<H", ent, 64, len(enc))
        ent[66] = etype
        ent[67] = 1  # black
        struct.pack_into("<i", ent, 68, -1)  # left sibling
        struct.pack_into("<i", ent, 72, -1)  # right sibling
        struct.pack_into("<i", ent, 76, 1 if root else -1)  # child
        struct.pack_into("<I", ent, 116, start)
        struct.pack_into("<Q", ent, 120, esize)
        return bytes(ent)

    directory = (dirent("Root Entry", 5, _ENDOFCHAIN, 0, root=True)
                 + dirent(name, 2, stream_start, size))
    directory += b"\x00" * (512 - len(directory) % 512 if len(directory) % 512 else 0)

    header = bytearray(512)
    header[0:8] = CFB_MAGIC
    struct.pack_into("<H", header, 24, 0x003E)   # minor version
    struct.pack_into("<H", header, 26, 0x0003)   # major version 3
    struct.pack_into("<H", header, 28, 0xFFFE)   # little-endian
    struct.pack_into("<H", header, 30, 9)        # 512-byte sectors
    struct.pack_into("<H", header, 32, 6)        # 64-byte mini sectors
    struct.pack_into("<I", header, 44, n_fat)
    struct.pack_into("<I", header, 48, dir_sec)
    struct.pack_into("<I", header, 56, 4096)     # mini cutoff
    struct.pack_into("<I", header, 60, _ENDOFCHAIN)  # no miniFAT
    struct.pack_into("<I", header, 64, 0)
    struct.pack_into("<I", header, 68, _ENDOFCHAIN)  # no extra DIFAT
    struct.pack_into("<I", header, 72, 0)
    difat = [i for i in range(n_fat)] + [_FREESECT] * (109 - n_fat)
    struct.pack_into("<109I", header, 76, *difat)

    body = fat_bytes + directory + data
    pad = n_total * 512 - len(body)
    return bytes(header) + body + b"\x00" * max(0, pad)
