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


def test_read_excel_is_gated_with_clear_error(spark, tmp_path):
    (tmp_path / "book.xlsx").write_bytes(b"PK\x03\x04 fake")
    df = read_excel(spark, str(tmp_path), "a string, b double")
    assert "a" in df.columns and "source_path" in df.columns  # plan builds
    try:
        import openpyxl  # noqa: F401
        have_openpyxl = True
    except ImportError:
        have_openpyxl = False
    if not have_openpyxl:
        with pytest.raises(Exception) as ei:
            df.collect()
        assert "openpyxl" in str(ei.value)


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


def test_list_excel_sheets_gated(spark, tmp_path):
    from light_etl_windows_container_poc_spark.sources.files import \
        list_excel_sheets

    (tmp_path / "wb.xlsx").write_bytes(b"PK\x03\x04 fake workbook")
    df = list_excel_sheets(spark, str(tmp_path))
    assert df.columns == ["path", "sheet_name"]
    try:
        import openpyxl  # noqa: F401
    except ImportError:
        import pytest
        with pytest.raises(Exception) as ei:
            df.collect()
        assert "openpyxl" in str(ei.value)
