"""The `format("excel")` Python DataSource (Spark 4 DataSource API):
standard reader UX over the same dependency-free codecs as read_excel,
one workbook per input partition."""

from __future__ import annotations

import pytest

from light_etl_windows_container_poc_spark.session import \
    ensure_package_on_executors
from light_etl_windows_container_poc_spark.sources.excel_datasource import \
    ExcelDataSource


@pytest.fixture()
def excel_spark(spark):
    ensure_package_on_executors(spark)
    spark.dataSource.register(ExcelDataSource)
    return spark


def _write_book(path, sheets):
    from light_etl_windows_container_poc_spark.sources.xlsx import \
        build_xlsx_bytes
    path.write_bytes(build_xlsx_bytes(sheets))


def test_format_excel_reads_directory_in_parallel(excel_spark, tmp_path):
    _write_book(tmp_path / "a.xlsx", {"Sheet1": [
        ["name", "qty"], ["Ana", 1.5], ["Bob", 2]]})
    _write_book(tmp_path / "b.xlsx", {"Sheet1": [
        ["name", "qty"], ["Cé", 3]]})
    df = (excel_spark.read.format("excel")
          .schema("name string, qty double, source_path string")
          .load(str(tmp_path)))
    rows = {r.name: (r.qty, r.source_path.rsplit("/", 1)[-1])
            for r in df.collect()}
    assert rows == {"Ana": (1.5, "a.xlsx"), "Bob": (2.0, "a.xlsx"),
                    "Cé": (3.0, "b.xlsx")}
    # one partition per workbook — decode parallelism == file count
    assert df.rdd.getNumPartitions() == 2


def test_format_excel_sheet_and_slicing_options(excel_spark, tmp_path):
    _write_book(tmp_path / "m.xlsx", {
        "meta": [["junk"]],
        "data": [["title", None, None],
                 ["a", "drop", "b"],
                 ["x", "no", 1], ["y", "no", 2], ["z", "no", 3]]})
    df = (excel_spark.read.format("excel")
          .schema("a string, b double")
          .option("sheet", "data").option("skiprows", 1)
          .option("nrows", 2).option("usecols", "A,C")
          .load(str(tmp_path / "m.xlsx")))
    assert sorted((r.a, r.b) for r in df.collect()) == \
        [("x", 1.0), ("y", 2.0)]


def test_format_excel_quarantine_skips_bad_files(excel_spark, tmp_path):
    _write_book(tmp_path / "good.xlsx", {"Sheet1": [["a"], ["v"]]})
    (tmp_path / "bad.xlsx").write_bytes(b"PK\x03\x04 not a real workbook")
    df = (excel_spark.read.format("excel").schema("a string")
          .option("on_error", "quarantine").load(str(tmp_path)))
    assert [r.a for r in df.collect()] == ["v"]
    with pytest.raises(Exception):
        (excel_spark.read.format("excel").schema("a string")
         .load(str(tmp_path))).collect()


def test_format_excel_requires_schema_and_names_missing_columns(
        excel_spark, tmp_path):
    _write_book(tmp_path / "s.xlsx", {"Sheet1": [["a"], ["v"]]})
    with pytest.raises(Exception, match="explicit .schema"):
        excel_spark.read.format("excel").load(str(tmp_path)).collect()
    with pytest.raises(Exception, match="not in"):
        (excel_spark.read.format("excel")
         .schema("nope string").load(str(tmp_path))).collect()


def test_stream_excel_picks_up_new_and_modified_files(
        excel_spark, tmp_path):
    import time

    src = tmp_path / "drive"
    src.mkdir()
    _write_book(src / "first.xlsx", {"Sheet1": [["a"], ["one"]]})
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def drain():
        q = (excel_spark.readStream.format("excel")
             .schema("a string, source_path string")
             .load(str(src))
             .writeStream.format("parquet")
             .option("path", out).option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(300)

    drain()
    got = excel_spark.read.parquet(out)
    assert [r.a for r in got.collect()] == ["one"]

    # NEW file + MODIFIED file both arrive in the next run; the
    # unchanged file is NOT re-read (offset seen-set semantics)
    time.sleep(0.05)
    _write_book(src / "second.xlsx", {"Sheet1": [["a"], ["two"]]})
    _write_book(src / "first.xlsx", {"Sheet1": [["a"], ["one-v2"]]})
    drain()
    vals = sorted(r.a for r in excel_spark.read.parquet(out).collect())
    assert vals == ["one", "one-v2", "two"]


def test_format_excel_write_round_trip(excel_spark, tmp_path):
    """df.write.format('excel') → one workbook per non-empty partition,
    read back exactly through the excel reader."""
    import os

    from pyspark.sql import functions as F

    out = str(tmp_path / "report")
    df = (excel_spark.range(0, 20).repartition(3)
          .select(F.col("id"), F.concat(F.lit("n"), F.col("id"))
                  .alias("name"), (F.col("id") * 1.5).alias("score")))
    df.write.format("excel").mode("append").save(out)

    files = [f for f in os.listdir(out) if f.endswith(".xlsx")]
    assert 1 <= len(files) <= 3           # ≤ one per partition
    assert "_SUCCESS" in os.listdir(out)
    assert not [f for f in os.listdir(out) if f.endswith(".tmp")]

    back = (excel_spark.read.format("excel")
            .schema("id double, name string, score double").load(out))
    got = {int(r.id): (r.name, r.score) for r in back.collect()}
    assert got == {i: (f"n{i}", i * 1.5) for i in range(20)}


def test_format_excel_write_overwrite_mode(excel_spark, tmp_path):
    import os

    out = str(tmp_path / "ow")
    excel_spark.range(0, 5).selectExpr("id").coalesce(1) \
        .write.format("excel").mode("append").save(out)
    excel_spark.range(100, 103).selectExpr("id").coalesce(1) \
        .write.format("excel").mode("overwrite").save(out)
    back = (excel_spark.read.format("excel").schema("id double").load(out))
    assert sorted(int(r.id) for r in back.collect()) == [100, 101, 102]
    assert "_SUCCESS" in os.listdir(out)
