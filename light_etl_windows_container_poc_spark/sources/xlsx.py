"""Dependency-free .xlsx codec (zipfile + xml.etree — stdlib only).

The reference's primary input is Excel (`fileserver.py:131-254`
`read_excel` / `read_excel_with_params`, `enhanced_tasks.py:52`), read
via pandas+openpyxl. This image ships neither openpyxl nor xlrd, so
`read_excel`'s executor-side decode uses THIS parser: an .xlsx file is a
zip of SpreadsheetML XML parts, and the subset the reference exercises
(cell values: numbers / shared strings / inline strings / booleans /
formula caches; sheet selection; skiprows / nrows / usecols) needs no
external library.

Out of scope (raise or degrade cleanly): legacy binary .xls/.xlsb
(not zip archives), date FORMATTING (dates surface as Excel serial
numbers — the name-heuristic coercion downstream handles ISO strings,
and the reference's tables carry dates as text), charts/macros.

Also provides `build_xlsx_bytes` — a minimal writer used by tests and
the `src_excel` oracle query to construct real workbooks in-image.
"""

from __future__ import annotations

import io
import re
import zipfile
from xml.etree import ElementTree as ET

import pandas as pd

_CELL_REF = re.compile(r"^([A-Z]+)(\d+)$")


def col_letter_to_index(letters: str) -> int:
    """'A' -> 0, 'Z' -> 25, 'AA' -> 26 …"""
    n = 0
    for ch in letters:
        n = n * 26 + (ord(ch) - 64)
    return n - 1


def col_index_to_letter(idx: int) -> str:
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(65 + rem) + out
    return out


def _parse_usecols(usecols: str, width: int) -> list[int]:
    """pandas-style Excel column spec: 'A:C', 'A,C,E', 'A:B,D'."""
    keep: list[int] = []
    for part in usecols.replace(" ", "").split(","):
        if ":" in part:
            lo, hi = part.split(":")
            keep.extend(range(col_letter_to_index(lo),
                              col_letter_to_index(hi) + 1))
        else:
            keep.append(col_letter_to_index(part))
    return [i for i in sorted(set(keep)) if i < width]


def list_sheet_names(raw: bytes) -> list[str]:
    """Workbook sheet names in workbook order."""
    with zipfile.ZipFile(io.BytesIO(raw)) as zf:
        wb = ET.fromstring(zf.read("xl/workbook.xml"))
    return [s.get("name") for s in wb.iterfind(".//{*}sheet")]


def _sheet_part_path(zf: zipfile.ZipFile, sheet_name: int | str) -> str:
    """Resolve a sheet (by position or name) to its worksheet part path via
    the workbook relationships — sheet order in workbook.xml is the USER
    order, which need not match sheetN.xml numbering."""
    wb = ET.fromstring(zf.read("xl/workbook.xml"))
    rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
    rid_to_target = {
        r.get("Id"): r.get("Target") for r in rels.iterfind(".//{*}Relationship")}
    sheets = list(wb.iterfind(".//{*}sheet"))
    if isinstance(sheet_name, int):
        if not 0 <= sheet_name < len(sheets):
            raise ValueError(f"sheet index {sheet_name} out of range "
                             f"({len(sheets)} sheets)")
        chosen = sheets[sheet_name]
    else:
        by_name = {s.get("name"): s for s in sheets}
        if sheet_name not in by_name:
            raise ValueError(f"sheet {sheet_name!r} not found; "
                             f"have {list(by_name)}")
        chosen = by_name[sheet_name]
    rid = chosen.get(
        "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}id")
    target = rid_to_target[rid]
    return target if target.startswith("xl/") else "xl/" + target.lstrip("/")


# SpreadsheetML's escape for characters XML 1.0 cannot carry (most
# control chars, lone surrogates): _xHHHH_ in the stored text, with a
# literal underscore of any _xHHHH_-looking run escaped as _x005F_.
# (ECMA-376 part 1 §22.9.2.19 / shared string convention — what Excel,
# openpyxl, and pandas all emit and decode.)
_X_ESC = re.compile(r"_x[0-9A-Fa-f]{4}_")


def _xml10_legal(ch: str) -> bool:
    o = ord(ch)
    return (o in (0x9, 0xA, 0xD) or 0x20 <= o <= 0xD7FF
            or 0xE000 <= o <= 0xFFFD or 0x10000 <= o <= 0x10FFFF)


def _ooxml_escape_text(s: str) -> str:
    # Protect EVERY literal underscore that precedes an 'x' — not just
    # complete _xHHHH_ runs: escaping an illegal char can CREATE a
    # decodable token out of a literal tail (e.g. '_x0041' + escaped
    # \x01 would read back as 'A\x01'), and overlapping runs share
    # underscores. Over-escaping is always safe — any conforming
    # decoder (ours, Excel, openpyxl) turns _x005F_ back into '_', and
    # re.sub never rescans its replacement text, so the inserted
    # '_x005F_' cannot itself be re-protected or mis-decoded.
    s = re.sub(r"_(?=x)", "_x005F_", s)
    # \r must also escape: XML parsers line-ending-normalize a literal
    # CR to LF (Excel writes _x000D_ for exactly this reason)
    if all(_xml10_legal(ch) and ch != "\r" for ch in s):
        return s
    return "".join(ch if _xml10_legal(ch) and ch != "\r"
                   else f"_x{ord(ch):04X}_" for ch in s)


def _ooxml_unescape_text(s: str) -> str:
    # re.sub does not rescan replacements, so the decoded "_" of
    # _x005F_ safely abuts a following xHHHH_ without re-decoding
    return _X_ESC.sub(lambda m: chr(int(m.group(0)[2:6], 16)), s)


def _shared_strings(zf: zipfile.ZipFile) -> list[str]:
    try:
        root = ET.fromstring(zf.read("xl/sharedStrings.xml"))
    except KeyError:
        return []
    out = []
    for si in root.iterfind(".//{*}si"):
        # an <si> may be one <t> or multiple rich-text runs <r><t>;
        # unescape PER RUN — the convention applies to each <t>, and
        # adjacent runs could otherwise form a false token at the join
        out.append("".join(_ooxml_unescape_text(t.text or "")
                           for t in si.iterfind(".//{*}t")))
    return out


def _cell_value(c: ET.Element, shared: list[str]):
    t = c.get("t", "n")
    if t == "inlineStr":
        is_el = c.find("{*}is")
        return "".join(_ooxml_unescape_text(tt.text or "")
                       for tt in is_el.iterfind(".//{*}t")) \
            if is_el is not None else None
    v = c.find("{*}v")
    if v is None or v.text is None:
        return None
    if t == "s":
        return shared[int(v.text)]
    if t == "b":
        return v.text == "1"
    if t == "str":  # formula result cached as string — escapes apply
        return _ooxml_unescape_text(v.text)
    if t == "e":  # error literal (#DIV/0! etc.) — never escaped
        return v.text
    # numeric: keep ints exact (Excel stores every number as double text)
    txt = v.text
    try:
        f = float(txt)
    except ValueError:
        return txt
    return int(f) if f.is_integer() and "e" not in txt.lower() \
        and abs(f) < 2 ** 53 else f


def parse_xlsx_rows(raw: bytes, sheet_name: int | str = 0) -> list[list]:
    """Raw cell grid of one sheet: list of rows, each padded to the sheet
    width with None for missing cells."""
    with zipfile.ZipFile(io.BytesIO(raw)) as zf:
        part = _sheet_part_path(zf, sheet_name)
        shared = _shared_strings(zf)
        ws = ET.fromstring(zf.read(part))
    # keyed by the row's r index: Excel OMITS fully-empty rows, so
    # element order alone would silently shift later rows up (a real
    # sheet with data at rows 1 and 5 must yield rows 2-4 as empties)
    by_index: dict[int, dict[int, object]] = {}
    next_row = 1
    for row_el in ws.iterfind(".//{*}row"):
        try:
            ri = int(row_el.get("r", next_row))
        except ValueError:
            ri = next_row
        if ri < 1:  # nonconforming index: keep the data, place it next
            ri = next_row
        next_row = ri + 1
        cells: dict[int, object] = {}
        next_idx = 0
        for c in row_el.iterfind("{*}c"):
            ref = c.get("r")
            if ref:
                m = _CELL_REF.match(ref)
                idx = col_letter_to_index(m.group(1)) if m else next_idx
            else:
                idx = next_idx
            cells[idx] = _cell_value(c, shared)
            next_idx = idx + 1
        if cells:
            # duplicate r (nonconforming): merge, first row's cells win
            merged = by_index.setdefault(ri, {})
            for idx, val in cells.items():
                merged.setdefault(idx, val)
    if not by_index:
        return []
    width = max(max(r) + 1 for r in by_index.values())
    n_rows = max(by_index)
    if n_rows - len(by_index) > 100_000:
        # one stray cell parked at the grid bottom (row ~1048576) would
        # otherwise materialize a million None rows — refuse loudly;
        # read_excel's quarantine mode routes such files aside
        raise ValueError(
            f"sheet declares row {n_rows} with only {len(by_index)} "
            "populated rows — stray bottom-of-grid cell? refusing to "
            "materialize the gap")
    return [[by_index.get(ri, {}).get(i) for i in range(width)]
            for ri in range(1, n_rows + 1)]


def grid_to_frame(grid: list[list], skiprows: int | None = None,
                  nrows: int | None = None,
                  usecols: str | None = None) -> pd.DataFrame:
    """pandas.read_excel-shaped framing of a raw cell grid: first
    (post-skiprows) row is the header, remaining rows are data; ``nrows``
    caps DATA rows; ``usecols`` is an Excel-letter spec applied before the
    header is read — the parameter surface of the reference fileserver's
    read_excel_with_params (`fileserver.py:201-254`). Shared by the .xlsx
    and legacy .xls (`xls_biff`) codecs."""
    if skiprows:
        grid = grid[skiprows:]
    # pandas.read_excel parity: leading fully-blank rows are skipped
    # before header selection (r-indexed gap filling materializes them
    # when a workbook's data starts below row 1, but they must not
    # become an all-None header / 'Unnamed' columns); mid-sheet gaps
    # after the header are preserved as data rows
    while grid and all(v is None for v in grid[0]):
        grid = grid[1:]
    if not grid:
        return pd.DataFrame()
    if usecols is not None:
        keep = _parse_usecols(usecols, max(len(r) for r in grid))
        grid = [[row[i] if i < len(row) else None for i in keep]
                for row in grid]
    header, data = grid[0], grid[1:]
    if nrows is not None:
        data = data[:nrows]
    cols = [str(h) if h is not None else f"Unnamed: {i}"
            for i, h in enumerate(header)]
    return pd.DataFrame(data, columns=cols)


def parse_xlsx(raw: bytes, sheet_name: int | str = 0,
               skiprows: int | None = None, nrows: int | None = None,
               usecols: str | None = None) -> pd.DataFrame:
    """pandas.read_excel-shaped parse of an .xlsx/.xlsm workbook (both are
    the same zip-of-SpreadsheetML container; .xlsm merely adds a macro
    part this reader ignores)."""
    return grid_to_frame(parse_xlsx_rows(raw, sheet_name),
                         skiprows=skiprows, nrows=nrows, usecols=usecols)


# -- minimal writer (tests / oracle-query fixtures) -------------------------

def _xml_escape(s: str) -> str:
    return (s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
            .replace('"', "&quot;"))


def _sheet_xml(rows: list[list]) -> str:
    ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    body = []
    for ri, row in enumerate(rows, start=1):
        cells = []
        for ci, val in enumerate(row):
            ref = f"{col_index_to_letter(ci)}{ri}"
            if val is None:
                continue
            if isinstance(val, bool):
                cells.append(f'<c r="{ref}" t="b"><v>{int(val)}</v></c>')
            elif isinstance(val, (int, float)):
                cells.append(f'<c r="{ref}"><v>{val!r}</v></c>')
            else:
                txt = _xml_escape(_ooxml_escape_text(str(val)))
                cells.append(f'<c r="{ref}" t="inlineStr"><is><t xml:space='
                             f'"preserve">{txt}</t></is></c>')
        if cells:  # Excel omits fully-empty rows; readers use r indices
            body.append(f'<row r="{ri}">{"".join(cells)}</row>')
    return (f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            f'<worksheet xmlns="{ns}"><sheetData>{"".join(body)}</sheetData>'
            f'</worksheet>')


def build_xlsx_bytes(sheets: dict[str, list[list]]) -> bytes:
    """Real (openable-by-Excel) .xlsx bytes from {sheet_name: row grid}.
    Strings are written as inline strings, numbers/bools natively — the
    exact cell types `parse_xlsx` and pandas+openpyxl both understand."""
    ct_overrides = "".join(
        f'<Override PartName="/xl/worksheets/sheet{i + 1}.xml" ContentType='
        f'"application/vnd.openxmlformats-officedocument.spreadsheetml.'
        f'worksheet+xml"/>' for i in range(len(sheets)))
    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
        'content-types">'
        '<Default Extension="rels" ContentType="application/vnd.'
        'openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType="application/'
        'vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        f'{ct_overrides}</Types>')
    root_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
        '2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
        'officeDocument/2006/relationships/officeDocument" '
        'Target="xl/workbook.xml"/></Relationships>')
    sheet_entries = "".join(
        f'<sheet name="{_xml_escape(name)}" sheetId="{i + 1}" r:id="rId{i + 1}"/>'
        for i, name in enumerate(sheets))
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/'
        '2006/main" xmlns:r="http://schemas.openxmlformats.org/'
        'officeDocument/2006/relationships">'
        f'<sheets>{sheet_entries}</sheets></workbook>')
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
        '2006/relationships">' + "".join(
            f'<Relationship Id="rId{i + 1}" Type="http://schemas.'
            f'openxmlformats.org/officeDocument/2006/relationships/worksheet"'
            f' Target="worksheets/sheet{i + 1}.xml"/>'
            for i in range(len(sheets))) + '</Relationships>')
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", content_types)
        zf.writestr("_rels/.rels", root_rels)
        zf.writestr("xl/workbook.xml", workbook)
        zf.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        for i, rows in enumerate(sheets.values()):
            zf.writestr(f"xl/worksheets/sheet{i + 1}.xml", _sheet_xml(rows))
    return buf.getvalue()
