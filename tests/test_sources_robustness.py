"""Ingest robustness: malformed-record capture and schema evolution —
the failure modes a 100 TB lake hits daily (a failed job over a corpus
because one file had one bad line is not acceptable at scale)."""

import json

from pyspark.sql import functions as F

from light_etl_windows_container_poc_spark.sources.files import (
    read_json_robust, read_parquet_evolving)


def _write_jsonl(tmp_path, name, lines):
    p = tmp_path / name
    p.write_text("\n".join(lines))
    return str(p)


def test_corrupt_json_captured_not_fatal(spark, tmp_path):
    path = _write_jsonl(tmp_path, "mixed.jsonl", [
        json.dumps({"id": 1, "v": "a"}),
        '{"id": 2, "v": "b"',           # truncated — malformed
        json.dumps({"id": 3, "v": "c"}),
        "not json at all",
    ])
    df = read_json_robust(spark, path, "id BIGINT, v STRING").cache()
    good = df.filter(F.col("_corrupt_record").isNull())
    bad = df.filter(F.col("_corrupt_record").isNotNull())
    assert good.count() == 2
    assert {r.id for r in good.collect()} == {1, 3}
    # the raw bad lines are preserved for quarantine routing
    assert bad.count() == 2
    assert {r._corrupt_record for r in bad.collect()} == {
        '{"id": 2, "v": "b"', "not json at all"}


def test_dropmalformed_silently_skips(spark, tmp_path):
    path = _write_jsonl(tmp_path, "mixed2.jsonl", [
        json.dumps({"id": 1, "v": "a"}),
        "garbage",
    ])
    df = read_json_robust(spark, path, "id BIGINT, v STRING",
                          mode="DROPMALFORMED")
    assert [r.id for r in df.collect()] == [1]


def test_parquet_schema_evolution(spark, tmp_path):
    base = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "x")], "id BIGINT, old_col STRING") \
        .write.parquet(base + "/batch=1")
    spark.createDataFrame([(2, 9.5)], "id BIGINT, new_col DOUBLE") \
        .write.parquet(base + "/batch=2")
    df = read_parquet_evolving(spark, base)
    assert {"id", "old_col", "new_col"} <= set(df.columns)
    rows = {r.id: r for r in df.collect()}
    assert rows[1].old_col == "x" and rows[1].new_col is None
    assert rows[2].new_col == 9.5 and rows[2].old_col is None


def test_read_xml_explicit_schema_and_corrupt_capture(spark, tmp_path):
    from light_etl_windows_container_poc_spark.sources.files import read_xml

    p = tmp_path / "rows.xml"
    p.write_text(
        "<rows>"
        "<row><id>1</id><name>alpha</name></row>"
        "<row><id>2</id><name>beta</name></row>"
        "<row><id>not-a-number</id><name>gamma</name></row>"
        "</rows>")
    df = read_xml(spark, str(p), row_tag="row",
                  schema_ddl="id BIGINT, name STRING").cache()
    try:
        ok = {(r["id"], r["name"]) for r in
              df.filter("_corrupt_record IS NULL").collect()}
        assert ok == {(1, "alpha"), (2, "beta")}
        bad = df.filter("_corrupt_record IS NOT NULL").collect()
        assert len(bad) == 1 and "gamma" in bad[0]["_corrupt_record"]
    finally:
        df.unpersist()


def test_read_xml_infers_when_no_schema(spark, tmp_path):
    from light_etl_windows_container_poc_spark.sources.files import read_xml

    p = tmp_path / "plain.xml"
    p.write_text("<rows><row><id>7</id><v>x</v></row></rows>")
    got = read_xml(spark, str(p), row_tag="row").collect()
    assert len(got) == 1 and got[0]["id"] == 7 and got[0]["v"] == "x"
