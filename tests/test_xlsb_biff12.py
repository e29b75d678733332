"""BIFF12 ``.xlsb`` codec tests — writer→parser round trips, record
framing edges (2-byte types, multi-byte length varints), and the
format-sniffing dispatch (a .xlsb and a .xlsx are both zips; only the
workbook part's extension differs).

Reference surface: fileserver.py:41-44 accepts ``.xlsb`` uploads; this
codec is the in-image replacement for pandas+pyxlsb."""

from __future__ import annotations

import struct

import pytest

from light_etl_windows_container_poc_spark.sources.xlsb_biff12 import (
    _read_records, _rec, build_xlsb_bytes, list_xlsb_sheet_names,
    parse_xlsb, parse_xlsb_rows)


# ---------------------------------------------------------------------------
# record framing
# ---------------------------------------------------------------------------

def test_record_framing_one_and_two_byte_types():
    stream = _rec(7, b"abc") + _rec(156, b"xy") + _rec(1091, b"")
    got = list(_read_records(stream))
    assert got == [(7, b"abc"), (156, b"xy"), (1091, b"")]


def test_record_framing_long_payload_varint():
    payload = b"z" * 300  # length needs a 2-byte varint
    assert list(_read_records(_rec(5, payload))) == [(5, payload)]


def test_record_framing_truncated_raises():
    stream = _rec(7, b"abcdef")[:-3]  # payload cut short
    with pytest.raises(ValueError, match="corrupt BIFF12"):
        list(_read_records(stream))
    with pytest.raises(ValueError, match="corrupt BIFF12"):
        list(_read_records(bytes([0x9C])))  # high bit set, no second byte


# ---------------------------------------------------------------------------
# writer → parser round trips
# ---------------------------------------------------------------------------

def test_round_trip_types_and_gaps():
    grid = [["name", "score", "active", "note"],
            ["Ana", 1.5, True, "x"],
            ["Bob", 2, False, None],          # None → cell gap
            ["Łódź", -3.25, True, "Ana"]]     # unicode + SST reuse
    raw = build_xlsb_bytes({"s": grid})
    assert parse_xlsb_rows(raw) == grid
    df = parse_xlsb(raw)
    assert list(df.columns) == ["name", "score", "active", "note"]
    assert df["score"].tolist() == [1.5, 2, -3.25]


def test_round_trip_rk_int_range():
    # RK covers ±2^29; outside that the writer falls back to Real
    grid = [[7, -7, 2 ** 28, -(2 ** 28), 2 ** 40, 1.23]]
    assert parse_xlsb_rows(build_xlsb_bytes({"s": grid})) == [grid[0]]


def test_round_trip_multi_sheet_and_params():
    sheets = {
        "meta": [["ignore me"]],
        "data": [["title row", None, None],
                 ["a", "junk", "b"],
                 ["x", "no", 1], ["y", "no", 2], ["z", "no", 3]],
    }
    raw = build_xlsb_bytes(sheets)
    assert list_xlsb_sheet_names(raw) == ["meta", "data"]
    assert parse_xlsb_rows(raw, "data") == parse_xlsb_rows(raw, 1)
    df = parse_xlsb(raw, "data", skiprows=1, nrows=2, usecols="A,C")
    assert df.columns.tolist() == ["a", "b"]
    assert df["a"].tolist() == ["x", "y"]
    assert df["b"].tolist() == [1, 2]


def test_sheet_selection_errors():
    raw = build_xlsb_bytes({"only": [["v"]]})
    with pytest.raises(ValueError, match="out of range"):
        parse_xlsb_rows(raw, 3)
    with pytest.raises(ValueError, match="not found"):
        parse_xlsb_rows(raw, "missing")


def test_not_a_biff12_zip_raises():
    from light_etl_windows_container_poc_spark.sources.xlsx import \
        build_xlsx_bytes
    xlsx = build_xlsx_bytes({"s": [["v"]]})
    with pytest.raises(ValueError, match="workbook.bin"):
        parse_xlsb_rows(xlsx)


# ---------------------------------------------------------------------------
# distributed read path: magic dispatch, quarantine, sheet listing
# ---------------------------------------------------------------------------

def test_read_excel_xlsb_round_trip(spark, tmp_path):
    from light_etl_windows_container_poc_spark.sources.files import read_excel
    grid = [["a", "b"], ["Ana", 1.5], ["Bob", 2.0], ["Łódź", None]]
    (tmp_path / "modern.xlsb").write_bytes(build_xlsb_bytes({"Sheet1": grid}))
    df = read_excel(spark, str(tmp_path), "a string, b double")
    rows = {r.a: r.b for r in df.collect()}
    assert rows == {"Ana": 1.5, "Bob": 2.0, "Łódź": None}


def test_read_excel_all_four_formats_one_dir(spark, tmp_path):
    from light_etl_windows_container_poc_spark.sources.files import read_excel
    from light_etl_windows_container_poc_spark.sources.xls_biff import \
        build_xls_bytes
    from light_etl_windows_container_poc_spark.sources.xlsx import \
        build_xlsx_bytes
    (tmp_path / "a.xlsx").write_bytes(build_xlsx_bytes({"s": [["a"], ["xlsx"]]}))
    (tmp_path / "b.xlsm").write_bytes(build_xlsx_bytes({"s": [["a"], ["xlsm"]]}))
    (tmp_path / "c.xls").write_bytes(build_xls_bytes({"s": [["a"], ["xls"]]}))
    (tmp_path / "d.xlsb").write_bytes(build_xlsb_bytes({"s": [["a"], ["xlsb"]]}))
    df = read_excel(spark, str(tmp_path), "a string",
                    include_source_path=False)
    assert {r.a for r in df.collect()} == {"xlsx", "xlsm", "xls", "xlsb"}


def test_corrupt_xlsb_quarantines_with_reason(spark, tmp_path):
    from light_etl_windows_container_poc_spark.sources.files import (
        excel_ingest_log, read_excel)
    (tmp_path / "ok.xlsb").write_bytes(
        build_xlsb_bytes({"s": [["a"], ["fine"]]}))
    # valid zip, truncated record stream inside
    import io
    import zipfile
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("xl/workbook.bin", _rec(156, b"broken")[:-3])
    (tmp_path / "bad.xlsb").write_bytes(buf.getvalue())
    df = read_excel(spark, str(tmp_path), "a string",
                    include_source_path=False, on_error="quarantine")
    assert [r.a for r in df.collect()] == ["fine"]
    log = {r.path.rsplit("/", 1)[-1]: (r.status, r.error)
           for r in excel_ingest_log(spark, str(tmp_path)).collect()}
    assert log["ok.xlsb"] == ("ok", None)
    assert log["bad.xlsb"][0] == "quarantined"
    assert "BIFF12" in log["bad.xlsb"][1]


def test_list_excel_sheets_xlsb(spark, tmp_path):
    from light_etl_windows_container_poc_spark.sources.files import \
        list_excel_sheets
    (tmp_path / "wb.xlsb").write_bytes(
        build_xlsb_bytes({"alpha": [["x"]], "beta": [["y"]]}))
    df = list_excel_sheets(spark, str(tmp_path))
    assert [r.sheet_name for r in df.collect()] == ["alpha", "beta"]


# ---------------------------------------------------------------------------
# diagnostic error paths (round-5 hardening)
# ---------------------------------------------------------------------------

def test_writer_rejects_unsupported_cell_type():
    import datetime

    with pytest.raises(TypeError, match="datetime.*row 0 col 1"):
        build_xlsb_bytes({"s": [["ok", datetime.datetime(2024, 1, 1)]]})


def test_out_of_range_sst_index_raises_valueerror():
    raw = build_xlsb_bytes({"s": [["a"], ["x"]]})
    # rewrite the lone BrtCellIsst payload to point past the 2-string table
    import io
    import zipfile

    with zipfile.ZipFile(io.BytesIO(raw)) as zf:
        parts = {n: zf.read(n) for n in zf.namelist()}
    sheet = parts["xl/worksheets/sheet1.bin"]
    body = b"".join(
        _rec(rt, payload[:8] + struct.pack("<I", 99)
             if rt == 7 else payload)
        for rt, payload in _read_records(sheet))
    parts["xl/worksheets/sheet1.bin"] = body
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for n, d in parts.items():
            zf.writestr(n, d)
    with pytest.raises(ValueError, match="shared-string index 99"):
        parse_xlsb_rows(buf.getvalue())


def test_truncated_bundlesh_raises_valueerror_not_struct_error():
    import io
    import zipfile

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("xl/workbook.bin", _rec(156, b"\x00" * 9))  # BundleSh, short
    with pytest.raises(ValueError, match="BundleSh"):
        list_xlsb_sheet_names(buf.getvalue())


def test_truncated_wide_str_raises_valueerror_not_struct_error():
    import io
    import zipfile

    # BundleSh with null relID, then the sheet-name string's 4-byte length
    # header truncated to 2 bytes — must hit _wide_str's bounds check,
    # not struct.error
    payload = struct.pack("<II", 0, 1) + struct.pack("<I", 0xFFFFFFFF) \
        + b"\x07\x00"
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("xl/workbook.bin", _rec(156, payload))
    with pytest.raises(ValueError, match="BIFF12"):
        list_xlsb_sheet_names(buf.getvalue())
