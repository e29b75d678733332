"""BIFF8 ``.xls`` codec tests — writer→parser round trips, hand-crafted
record streams for the cell types the writer doesn't emit (RK/MULRK,
CONTINUE-spanning SST), and the corrupt-input contract (raise cleanly,
never hang) that ``on_error='quarantine'`` depends on.

Reference surface: fileserver.py:41-44 accepts ``.xls`` uploads and
fileserver.py:131-172 reads them via pandas+xlrd; this codec is the
in-image replacement."""

from __future__ import annotations

import struct

import pytest

from light_etl_windows_container_poc_spark.sources.xls_biff import (
    _BOOLERR, _BOUNDSHEET, _CONTINUE, _EOF, _LABEL, _MULRK, _RK, _SST,
    CFB_MAGIC, _bof, _build_cfb, _parse_sst, _rec, _shortstr, _ustr,
    build_xls_bytes, list_xls_sheet_names, parse_xls, parse_xls_rows)


# ---------------------------------------------------------------------------
# writer → parser round trips
# ---------------------------------------------------------------------------

def test_round_trip_types_and_gaps():
    grid = [["name", "score", "active", "note"],
            ["Ana", 1.5, True, "x"],
            ["Bob", 2, False, None],          # None → cell gap
            ["Łódź", -3.25, True, "Ana"]]     # unicode + SST reuse
    rows = parse_xls_rows(build_xls_bytes({"s": grid}))
    assert rows == grid

    df = parse_xls(build_xls_bytes({"s": grid}))
    assert list(df.columns) == ["name", "score", "active", "note"]
    assert df["score"].tolist() == [1.5, 2, -3.25]
    assert df["active"].tolist() == [True, False, True]


def test_round_trip_multi_sheet_and_params():
    sheets = {
        "meta": [["ignore me"]],
        "data": [["title row", None, None],
                 ["a", "junk", "b"],
                 ["x", "no", 1], ["y", "no", 2], ["z", "no", 3]],
    }
    raw = build_xls_bytes(sheets)
    assert list_xls_sheet_names(raw) == ["meta", "data"]
    # by name and by index agree
    assert parse_xls_rows(raw, "data") == parse_xls_rows(raw, 1)
    df = parse_xls(raw, "data", skiprows=1, nrows=2, usecols="A,C")
    assert df.columns.tolist() == ["a", "b"]
    assert df["a"].tolist() == ["x", "y"]
    assert df["b"].tolist() == [1, 2]


def test_round_trip_large_sst_many_unique_strings():
    # >1 sector of string data exercises FAT chaining in the container
    grid = [[f"cell_{r}_{c}" for c in range(5)] for r in range(200)]
    assert parse_xls_rows(build_xls_bytes({"s": grid})) == grid


def test_sheet_selection_errors():
    raw = build_xls_bytes({"only": [["v"]]})
    with pytest.raises(ValueError, match="out of range"):
        parse_xls_rows(raw, 3)
    with pytest.raises(ValueError, match="not found"):
        parse_xls_rows(raw, "missing")


# ---------------------------------------------------------------------------
# hand-crafted records: RK / MULRK (Excel writes these; our writer doesn't)
# ---------------------------------------------------------------------------

def _workbook_from_sheet_records(cell_recs: list[bytes]) -> bytes:
    """Minimal globals + one sheet substream around raw cell records."""
    for _ in range(2):
        globals_recs = b"".join([
            _bof(0x0005),
            _rec(_BOUNDSHEET, struct.pack("<IH", 0, 0) + _shortstr("s")),
            _rec(_EOF, b"")])
        sheet = _bof(0x0010) + b"".join(cell_recs) + _rec(_EOF, b"")
        # second pass fixes the BOUNDSHEET offset (size is stable)
        off = len(globals_recs)
        globals_recs = b"".join([
            _bof(0x0005),
            _rec(_BOUNDSHEET, struct.pack("<IH", off, 0) + _shortstr("s")),
            _rec(_EOF, b"")])
    return _build_cfb({"Workbook": globals_recs + sheet})


def _rk_bits_from_double(v: float, div100: bool = False) -> int:
    bits = struct.unpack("<Q", struct.pack("<d", v))[0]
    return ((bits >> 32) & 0xFFFFFFFC) | (0x01 if div100 else 0)


def test_rk_record_variants():
    recs = [
        # 30-bit int: 7  → fInt, no div
        _rec(_RK, struct.pack("<HHHI", 0, 0, 15, (7 << 2) | 0x02)),
        # negative 30-bit int: -7
        _rec(_RK, struct.pack("<HHHI", 0, 1, 15,
                              (((-7) & 0x3FFFFFFF) << 2) | 0x02)),
        # truncated double: 1.5
        _rec(_RK, struct.pack("<HHHI", 0, 2, 15, _rk_bits_from_double(1.5))),
        # int/100 → 1.23 (fInt + fDiv100): 123/100
        _rec(_RK, struct.pack("<HHHI", 0, 3, 15, (123 << 2) | 0x02 | 0x01)),
        # int/100 exact integer: 500/100 = 5
        _rec(_RK, struct.pack("<HHHI", 0, 4, 15, (500 << 2) | 0x02 | 0x01)),
    ]
    rows = parse_xls_rows(_workbook_from_sheet_records(recs))
    assert rows == [[7, -7, 1.5, 1.23, 5]]


def test_mulrk_record():
    # MULRK: row, col_first, then (ixfe, rk)*, then col_last
    body = struct.pack("<HH", 2, 1)
    for v in (10, 20, 30):
        body += struct.pack("<HI", 15, (v << 2) | 0x02)
    body += struct.pack("<H", 3)
    rows = parse_xls_rows(_workbook_from_sheet_records([_rec(_MULRK, body)]))
    assert rows[2][1:4] == [10, 20, 30]


def test_boolerr_error_cell_is_gap():
    recs = [_rec(_BOOLERR, struct.pack("<HHHBB", 0, 0, 15, 0x2A, 1)),  # #N/A
            _rec(_BOOLERR, struct.pack("<HHHBB", 0, 1, 15, 1, 0))]     # TRUE
    assert parse_xls_rows(_workbook_from_sheet_records(recs)) == [[None, True]]


# ---------------------------------------------------------------------------
# SST CONTINUE spanning (parser-level: the writer caps records at 8224 B)
# ---------------------------------------------------------------------------

def test_sst_continue_string_split_same_encoding():
    # one long compressed string split mid-text; continuation restarts
    # with a fresh grbit byte (0 = still compressed)
    text = "abcdefghij" * 4
    head = struct.pack("<II", 1, 1) + struct.pack("<HB", len(text), 0) \
        + text[:15].encode("latin-1")
    cont = bytes([0]) + text[15:].encode("latin-1")
    assert _parse_sst(head, [cont]) == [text]


def test_sst_continue_encoding_switch():
    # compressed start, UTF-16 continuation — the grbit RE-SPECIFIES the
    # encoding at the boundary, a BIFF8 quirk xlrd also honors
    text = "plain" + "Łukasz"
    head = struct.pack("<II", 1, 1) + struct.pack("<HB", len(text), 0) \
        + b"plain"
    cont = bytes([1]) + "Łukasz".encode("utf-16-le")
    assert _parse_sst(head, [cont]) == [text]


def test_sst_string_boundary_between_strings():
    head = struct.pack("<II", 2, 2) + _ustr("first")
    cont = _ustr("second")
    assert _parse_sst(head, [cont]) == ["first", "second"]


def test_sst_truncated_raises_not_hangs():
    # ADVICE r3: wide char data with one dangling byte used to loop
    # forever (take==0 while need>0). Must raise, not hang.
    head = struct.pack("<II", 1, 1) + struct.pack("<HB", 4, 1) \
        + "ab".encode("utf-16-le") + b"\x00"  # 4 chars promised, 2.5 present
    with pytest.raises(ValueError, match="corrupt SST"):
        _parse_sst(head, [])


def test_sst_exhausted_chunks_raise():
    head = struct.pack("<II", 3, 3) + _ustr("only one")
    with pytest.raises(ValueError, match="corrupt SST"):
        _parse_sst(head, [])


# ---------------------------------------------------------------------------
# corrupt containers / unsupported features raise cleanly
# ---------------------------------------------------------------------------

def test_bad_magic_raises():
    with pytest.raises(ValueError, match="bad magic"):
        parse_xls_rows(b"\x00" * 512)


def test_corrupt_sector_shift_raises():
    raw = bytearray(build_xls_bytes({"s": [["x"]]}))
    struct.pack_into("<H", raw, 30, 10)  # neither v3 (9) nor v4 (12)
    with pytest.raises(ValueError, match="sector shift"):
        parse_xls_rows(bytes(raw))


def test_corrupt_fat_chain_raises():
    raw = bytearray(build_xls_bytes({"s": [["x"]]}))
    # point the directory chain at itself → cycle detection must fire
    (dir_sec,) = struct.unpack_from("<I", raw, 48)
    fat_sec = struct.unpack_from("<109I", raw, 76)[0]
    struct.pack_into("<I", raw, 512 + fat_sec * 512 + dir_sec * 4, dir_sec)
    with pytest.raises(ValueError, match="corrupt CFB"):
        parse_xls_rows(bytes(raw))


def test_label_spanning_continue_raises_not_truncates():
    # LABEL whose cch promises more bytes than the record holds: the
    # parser must refuse (silent truncation loses data)
    payload = struct.pack("<HHH", 0, 0, 15) + struct.pack("<HB", 60, 0) \
        + b"short"
    raw = _workbook_from_sheet_records([_rec(_LABEL, payload)])
    with pytest.raises(ValueError, match="truncated"):
        parse_xls_rows(raw)


def test_biff5_raises_not_implemented():
    raw = bytearray(build_xls_bytes({"s": [["x"]]}))
    # BOF version field lives 4 bytes into the Workbook stream; find the
    # stream via the parser's own CFB (first regular sector after FAT+dir)
    from light_etl_windows_container_poc_spark.sources.xls_biff import _Cfb
    wb_off = raw.find(struct.pack("<HHH", 0x0809, 16, 0x0600))
    assert wb_off > 0
    struct.pack_into("<H", raw, wb_off + 4, 0x0500)  # BIFF5
    with pytest.raises(NotImplementedError, match="BIFF"):
        parse_xls_rows(bytes(raw))
    assert _Cfb(bytes(raw)).stream("Workbook")  # container itself still ok


# ---------------------------------------------------------------------------
# distributed read path (read_excel dispatch + quarantine)
# ---------------------------------------------------------------------------

def test_read_excel_xls_round_trip(spark, tmp_path):
    grid = [["a", "b"], ["Ana", 1.5], ["Bob", 2.0], ["Łódź", None]]
    (tmp_path / "legacy.xls").write_bytes(build_xls_bytes({"Sheet1": grid}))
    from light_etl_windows_container_poc_spark.sources.files import read_excel
    df = read_excel(spark, str(tmp_path), "a string, b double")
    rows = {r.a: r.b for r in df.collect()}
    assert rows == {"Ana": 1.5, "Bob": 2.0, "Łódź": None}
    assert all(r.source_path.endswith("legacy.xls")
               for r in df.select("source_path").collect())


def test_read_excel_mixed_formats_one_dir(spark, tmp_path):
    from light_etl_windows_container_poc_spark.sources.files import read_excel
    from light_etl_windows_container_poc_spark.sources.xlsx import \
        build_xlsx_bytes
    grid = [["a"], ["from_xls"]]
    (tmp_path / "old.xls").write_bytes(build_xls_bytes({"s": grid}))
    (tmp_path / "new.xlsx").write_bytes(
        build_xlsx_bytes({"s": [["a"], ["from_xlsx"]]}))
    df = read_excel(spark, str(tmp_path), "a string",
                    include_source_path=False)
    assert {r.a for r in df.collect()} == {"from_xls", "from_xlsx"}


def test_read_excel_corrupt_xls_quarantines(spark, tmp_path):
    from light_etl_windows_container_poc_spark.sources.files import (
        excel_ingest_log, read_excel)
    (tmp_path / "good.xls").write_bytes(
        build_xls_bytes({"s": [["a"], ["ok"]]}))
    # real CFB magic, garbage body: fails INSIDE the BIFF parser
    (tmp_path / "bad.xls").write_bytes(CFB_MAGIC + b"\x00" * 700)
    df = read_excel(spark, str(tmp_path), "a string",
                    include_source_path=False, on_error="quarantine")
    assert [r.a for r in df.collect()] == ["ok"]
    log = {r.path.rsplit("/", 1)[-1]: (r.status, r.error)
           for r in excel_ingest_log(spark, str(tmp_path)).collect()}
    assert log["good.xls"] == ("ok", None)
    assert log["bad.xls"][0] == "quarantined"
    assert log["bad.xls"][1]  # carries the decode error text
