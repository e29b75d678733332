"""Dependency-free ``.xlsb`` (BIFF12) codec — stdlib ``zipfile`` +
``struct`` only.

The reference fileserver accepts ``.xlsb`` uploads alongside
``.xlsx/.xls/.xlsm`` (`fileserver.py:41-44`); this image ships no pyxlsb,
so `read_excel`'s executor-side decode of binary workbooks uses THIS
parser. An ``.xlsb`` is a ZIP (same package shape as .xlsx) whose parts
are BIFF12 record streams instead of XML:

- record framing: 1-2 byte record type (7 bits per byte, high bit of the
  first byte ⇒ second byte follows), then a 1-4 byte length varint
  (7 bits per byte, high bit = continuation)
- ``xl/workbook.bin``: BrtBundleSh records (sheet name + relationship id)
- ``xl/sharedStrings.bin``: BrtSSTItem records
- ``xl/worksheets/sheetN.bin``: BrtRowHdr + cell records (Rk, Real, Isst,
  St, Bool, cached formula results)

`build_xlsb_bytes` is a minimal writer used by tests and the
`src_excel_xlsb` oracle query. Out of scope (raise cleanly): encrypted
workbooks (those are CFB-wrapped, caught by the OLE2 magic path).
"""

from __future__ import annotations

import io
import struct
import zipfile

import pandas as pd

# BIFF12 record ids (MS-XLSB §2.3; decimal)
_ROW_HDR = 0
_CELL_BLANK, _CELL_RK, _CELL_ERROR, _CELL_BOOL = 1, 2, 3, 4
_CELL_REAL, _CELL_ST, _CELL_ISST = 5, 6, 7
_FMLA_STRING, _FMLA_NUM, _FMLA_BOOL, _FMLA_ERROR = 8, 9, 10, 11
_SST_ITEM = 19
_BUNDLE_SH = 156
_BEGIN_SST = 159


def _read_records(data: bytes):
    """(record_type, payload) pairs from a BIFF12 stream."""
    pos, n = 0, len(data)
    while pos < n:
        b0 = data[pos]
        pos += 1
        if b0 & 0x80:
            if pos >= n:
                raise ValueError("corrupt BIFF12: truncated record type")
            rt = (b0 & 0x7F) | ((data[pos] & 0x7F) << 7)
            pos += 1
        else:
            rt = b0
        ln, shift = 0, 0
        while True:
            if pos >= n:
                raise ValueError("corrupt BIFF12: truncated record length")
            b = data[pos]
            pos += 1
            ln |= (b & 0x7F) << shift
            shift += 7
            if not b & 0x80:
                break
            if shift > 28:
                raise ValueError("corrupt BIFF12: record length varint >4B")
        if pos + ln > n:
            raise ValueError("corrupt BIFF12: record payload truncated")
        yield rt, data[pos:pos + ln]
        pos += ln


def _wide_str(payload: bytes, off: int) -> tuple[str, int]:
    """XLWideString at ``off``: 4-byte cch + UTF-16LE chars. Returns
    (text, next offset)."""
    if off + 4 > len(payload):
        raise ValueError("corrupt BIFF12: string length header exceeds record")
    (cch,) = struct.unpack_from("<I", payload, off)
    end = off + 4 + 2 * cch
    if end > len(payload):
        raise ValueError("corrupt BIFF12: string exceeds record")
    return payload[off + 4:end].decode("utf-16-le"), end


def _decode_rk(rk: int):
    """RkNumber: bit0 fX100, bit1 fInt, 30-bit payload (same semantics as
    BIFF8's RK)."""
    f_div100, f_int = rk & 0x01, rk & 0x02
    if f_int:
        v = rk >> 2
        if v & 0x20000000:
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


def _parse_sst(data: bytes) -> list[str]:
    out: list[str] = []
    for rt, payload in _read_records(data):
        if rt == _SST_ITEM:
            # richStr: 1 flag byte (fRichStr/fExtStr) + XLWideString;
            # trailing run/phonetic data is skipped via the record bound
            text, _ = _wide_str(payload, 1)
            out.append(text)
    return out


def _sheet_parts(zf: zipfile.ZipFile) -> list[tuple[str, str]]:
    """[(sheet_name, zip part path)] in workbook order. Relationship ids
    resolve through xl/_rels/workbook.bin.rels when present; otherwise
    sheets map positionally to xl/worksheets/sheetN.bin."""
    sheets: list[tuple[str, str]] = []  # (name, rel id)
    for rt, payload in _read_records(zf.read("xl/workbook.bin")):
        if rt == _BUNDLE_SH:
            # hsState (4) + iTabID (4) + strRelID (nullable) + strName
            if len(payload) < 12:
                raise ValueError("corrupt BIFF12: BundleSh record too short")
            (cch_rel,) = struct.unpack_from("<I", payload, 8)
            if cch_rel == 0xFFFFFFFF:
                rel, off = "", 12
            else:
                rel, off = _wide_str(payload, 8)
            name, _ = _wide_str(payload, off)
            sheets.append((name, rel))
    # real XML parse (not a regex): attribute order and quoting vary by
    # producer, and a silently-empty rel map would mis-route sheets to
    # positional part names (same approach as the xlsx codec)
    import xml.etree.ElementTree as ET

    rel_map: dict[str, str] = {}
    try:
        root = ET.fromstring(zf.read("xl/_rels/workbook.bin.rels"))
        for rel_el in root:
            rid, target = rel_el.get("Id"), rel_el.get("Target")
            if rid and target:
                rel_map[rid] = "xl/" + target.lstrip("/")
    except (KeyError, ET.ParseError):
        pass
    out = []
    for i, (name, rel) in enumerate(sheets):
        part = rel_map.get(rel, f"xl/worksheets/sheet{i + 1}.bin")
        out.append((name, part))
    return out


def list_xlsb_sheet_names(raw: bytes) -> list[str]:
    with zipfile.ZipFile(io.BytesIO(raw)) as zf:
        return [n for n, _ in _sheet_parts(zf)]


def parse_xlsb_rows(raw: bytes, sheet_name: int | str = 0) -> list[list]:
    """Raw cell grid of one sheet (same shape as xlsx.parse_xlsx_rows /
    xls_biff.parse_xls_rows)."""
    with zipfile.ZipFile(io.BytesIO(raw)) as zf:
        names = zf.namelist()
        if "xl/workbook.bin" not in names:
            raise ValueError("not a BIFF12 workbook (no xl/workbook.bin)")
        sst = _parse_sst(zf.read("xl/sharedStrings.bin")) \
            if "xl/sharedStrings.bin" in names else []
        sheets = _sheet_parts(zf)
        if isinstance(sheet_name, int):
            if not 0 <= sheet_name < len(sheets):
                raise ValueError(f"sheet index {sheet_name} out of range "
                                 f"({len(sheets)} sheets)")
            part = sheets[sheet_name][1]
        else:
            by_name = dict(sheets)
            if sheet_name not in by_name:
                raise ValueError(f"sheet {sheet_name!r} not found; "
                                 f"have {[n for n, _ in sheets]}")
            part = by_name[sheet_name]
        data = zf.read(part)

    cells: dict[tuple[int, int], object] = {}
    row = 0
    for rt, payload in _read_records(data):
        if rt == _ROW_HDR:
            (row,) = struct.unpack_from("<I", payload, 0)
        elif rt in (_CELL_RK, _CELL_REAL, _CELL_ISST, _CELL_ST, _CELL_BOOL,
                    _FMLA_NUM, _FMLA_STRING, _FMLA_BOOL):
            (col,) = struct.unpack_from("<I", payload, 0)
            # payload[4:8] = iStyleRef (24 bit) + flags — not needed
            if rt == _CELL_RK:
                (rk,) = struct.unpack_from("<I", payload, 8)
                cells[row, col] = _decode_rk(rk)
            elif rt in (_CELL_REAL, _FMLA_NUM):
                (v,) = struct.unpack_from("<d", payload, 8)
                cells[row, col] = int(v) \
                    if v.is_integer() and abs(v) < 2 ** 53 else v
            elif rt == _CELL_ISST:
                (isst,) = struct.unpack_from("<I", payload, 8)
                if isst >= len(sst):
                    raise ValueError(
                        f"corrupt BIFF12: shared-string index {isst} out of "
                        f"range (table has {len(sst)} strings)")
                cells[row, col] = sst[isst]
            elif rt in (_CELL_ST, _FMLA_STRING):
                cells[row, col], _ = _wide_str(payload, 8)
            elif rt in (_CELL_BOOL, _FMLA_BOOL):
                cells[row, col] = bool(payload[8])
    if not cells:
        return []
    n_rows = max(r for r, _ in cells) + 1
    width = max(c for _, c in cells) + 1
    return [[cells.get((r, c)) for c in range(width)] for r in range(n_rows)]


def parse_xlsb(raw: bytes, sheet_name: int | str = 0,
               skiprows: int | None = None, nrows: int | None = None,
               usecols: str | None = None) -> pd.DataFrame:
    """pandas.read_excel-shaped parse of a BIFF12 workbook — the same
    header/skiprows/nrows/usecols surface as xlsx.parse_xlsx."""
    from .xlsx import grid_to_frame

    return grid_to_frame(parse_xlsb_rows(raw, sheet_name),
                         skiprows=skiprows, nrows=nrows, usecols=usecols)


# ---------------------------------------------------------------------------
# minimal writer (tests / oracle-query fixtures)
# ---------------------------------------------------------------------------

def _rec(rt: int, payload: bytes) -> bytes:
    if rt < 0x80:
        head = bytes([rt])
    else:
        head = bytes([(rt & 0x7F) | 0x80, (rt >> 7) & 0x7F])
    ln, out = len(payload), b""
    while True:
        b = ln & 0x7F
        ln >>= 7
        out += bytes([b | (0x80 if ln else 0)])
        if not ln:
            break
    return head + out + payload


def _wstr(s: str) -> bytes:
    # cch counts UTF-16 CODE UNITS (surrogate pairs = 2), not characters
    enc = s.encode("utf-16-le")
    return struct.pack("<I", len(enc) // 2) + enc


def build_xlsb_bytes(sheets: dict[str, list[list]]) -> bytes:
    """Real BIFF12 ``.xlsb`` bytes from {sheet_name: row grid}: a zip
    package with workbook/sharedStrings/sheet binary parts. Strings go
    through the shared-string table (BrtCellIsst), integers as BrtCellRk
    where the 30-bit range allows (else BrtCellReal), floats as
    BrtCellReal, booleans as BrtCellBool — the record set `parse_xlsb`
    and pyxlsb both read."""
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

    def cell_head(col: int) -> bytes:
        return struct.pack("<II", col, 0)  # col + zero style/flags

    sheet_parts: dict[str, bytes] = {}
    for i, (name, rows) in enumerate(sheets.items()):
        body = []
        for ri, row in enumerate(rows):
            body.append(_rec(_ROW_HDR, struct.pack("<I", ri)))
            for ci, v in enumerate(row):
                if v is None:
                    continue
                if isinstance(v, bool):
                    body.append(_rec(_CELL_BOOL, cell_head(ci) + bytes([v])))
                elif isinstance(v, int) and -(2 ** 29) <= v < 2 ** 29:
                    rk = ((v & 0x3FFFFFFF) << 2) | 0x02  # fInt, 30-bit two's complement
                    body.append(_rec(_CELL_RK, cell_head(ci)
                                     + struct.pack("<I", rk)))
                elif isinstance(v, (int, float)):
                    body.append(_rec(_CELL_REAL, cell_head(ci)
                                     + struct.pack("<d", float(v))))
                elif isinstance(v, str):
                    body.append(_rec(_CELL_ISST, cell_head(ci)
                                     + struct.pack("<I", s_index[v])))
                else:
                    # only str cells were registered in the SST counting
                    # pass — anything else (datetime, bytes, …) must fail
                    # loudly here, not as a KeyError into the string table
                    raise TypeError(
                        f"unsupported cell type {type(v).__name__} at "
                        f"sheet {name!r} row {ri} col {ci}; supported: "
                        "None, bool, int, float, str")
        sheet_parts[f"xl/worksheets/sheet{i + 1}.bin"] = b"".join(body)

    wb = b"".join(
        _rec(_BUNDLE_SH, struct.pack("<II", 0, i + 1)
             + _wstr(f"rId{i + 1}") + _wstr(name))
        for i, name in enumerate(sheets))
    sst = _rec(_BEGIN_SST, struct.pack("<II", n_refs, len(strings))) + \
        b"".join(_rec(_SST_ITEM, b"\x00" + _wstr(s)) for s in strings)
    rels = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<Relationships xmlns="http://schemas.openxmlformats.org/'
            'package/2006/relationships">'
            + "".join(f'<Relationship Id="rId{i + 1}" Type="http://schemas.'
                      f'openxmlformats.org/officeDocument/2006/relationships/'
                      f'worksheet" Target="worksheets/sheet{i + 1}.bin"/>'
                      for i in range(len(sheets)))
            + '</Relationships>')

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("xl/workbook.bin", wb)
        zf.writestr("xl/sharedStrings.bin", sst)
        zf.writestr("xl/_rels/workbook.bin.rels", rels)
        for part, data in sheet_parts.items():
            zf.writestr(part, data)
    return buf.getvalue()
