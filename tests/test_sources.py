from __future__ import annotations

import pytest

from light_etl_windows_container_poc_spark.sources.files import (
    read_csv_auto, read_excel, read_json_records)

CSV_SCHEMA = "name string, city string, amount double"


@pytest.fixture()
def csv_dir(tmp_path):
    d = tmp_path / "in"
    d.mkdir()
    (d / "utf8.csv").write_text("name,city,amount\nAna,Paris,1.5\n", encoding="utf-8")
    (d / "sig.csv").write_bytes("name,city,amount\nBob,Łódź,2.5\n".encode("utf-8-sig"))
    (d / "latin1.csv").write_bytes("name,city,amount\nCé,Niño,3.5\n".encode("latin1"))
    (d / "empty.csv").write_text("", encoding="utf-8")
    return str(d)


def test_read_csv_auto_encoding_fallbacks(spark, csv_dir):
    df = read_csv_auto(spark, csv_dir, CSV_SCHEMA)
    rows = {r.name: (r.city, r.amount) for r in df.collect()}
    assert rows == {"Ana": ("Paris", 1.5), "Bob": ("Łódź", 2.5), "Cé": ("Niño", 3.5)}
    paths = [r.source_path for r in df.select("source_path").collect()]
    assert all(p.endswith(".csv") for p in paths)


def test_read_csv_auto_fast_path(spark, csv_dir):
    df = read_csv_auto(spark, csv_dir + "/utf8.csv", CSV_SCHEMA, assume_utf8=True)
    assert df.collect()[0].name == "Ana"


def _write_book(path, sheets):
    from light_etl_windows_container_poc_spark.sources.xlsx import \
        build_xlsx_bytes
    path.write_bytes(build_xlsx_bytes(sheets))


def test_read_excel_round_trip(spark, tmp_path):
    _write_book(tmp_path / "book.xlsx", {"Sheet1": [
        ["a", "b"], ["Ana", 1.5], ["Bob", 2], ["Łódź", None]]})
    df = read_excel(spark, str(tmp_path), "a string, b double")
    rows = {r.a: r.b for r in df.collect()}
    assert rows == {"Ana": 1.5, "Bob": 2.0, "Łódź": None}
    assert all(r.source_path.endswith("book.xlsx")
               for r in df.select("source_path").collect())


def test_read_excel_sheet_skiprows_nrows_usecols(spark, tmp_path):
    _write_book(tmp_path / "multi.xlsx", {
        "meta": [["junk"]],
        "data": [["title row", None, None],
                 ["a", "drop_me", "b"],
                 ["x", "no", 1], ["y", "no", 2], ["z", "no", 3]]})
    df = read_excel(spark, str(tmp_path), "a string, b double",
                    sheet_name="data", skiprows=1, nrows=2, usecols="A,C",
                    include_source_path=False)
    assert sorted((r.a, r.b) for r in df.collect()) == [("x", 1.0), ("y", 2.0)]


def test_read_excel_unrecognized_magic_raises_clearly(spark, tmp_path):
    # neither zip nor full OLE2 magic (only 4 of 8 bytes match): the
    # format sniffer must name the file and the supported formats.
    # (Valid .xls decode is covered positively in test_xls_biff.py.)
    (tmp_path / "mystery.xls").write_bytes(b"\xd0\xcf\x11\xe0 not a zip")
    df = read_excel(spark, str(tmp_path), "a string, b double")
    with pytest.raises(Exception) as ei:
        df.collect()
    assert "not an Excel workbook" in str(ei.value)


def test_read_json_records(spark):
    df = read_json_records(spark, [{"a": 1, "b": "x"}, {"a": 2, "b": "y"}],
                           "a long, b string")
    assert df.count() == 2
    assert dict(df.dtypes) == {"a": "bigint", "b": "string"}


def test_read_csv_auto_max_file_size_guard(spark, tmp_path):
    d = tmp_path / "sz"
    d.mkdir()
    (d / "small.csv").write_text("name,city,amount\nAna,Paris,1.5\n")
    (d / "big.csv").write_text("name,city,amount\n" + "Bob,Big,9.9\n" * 50000)
    df = read_csv_auto(spark, str(d), CSV_SCHEMA, max_file_mb=0.01)
    names = {r.name for r in df.collect()}
    assert names == {"Ana"}  # oversized file rejected before decode


def test_list_excel_sheets(spark, tmp_path):
    from light_etl_windows_container_poc_spark.sources.files import \
        list_excel_sheets

    _write_book(tmp_path / "wb.xlsx", {"alpha": [["x"]], "beta": [["y"]]})
    df = list_excel_sheets(spark, str(tmp_path))
    assert df.columns == ["path", "sheet_name"]
    assert [r.sheet_name for r in df.collect()] == ["alpha", "beta"]
