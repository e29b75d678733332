from __future__ import annotations

from light_etl_windows_container_poc_spark.pipeline import ETLPipeline

SCHEMA = "Customer_Name string, Order_Date string, Amount string"


def _mkcsv(p, rows):
    p.parent.mkdir(parents=True, exist_ok=True)
    p.write_text("Customer Name,Order Date,Amount\n" + "\n".join(rows) + "\n")


def test_pipeline_routes_cleans_appends_and_logs(spark, tmp_path):
    src = tmp_path / "drop"
    _mkcsv(src / "customer_data" / "a.csv",
           ["Ana,2024-01-05,10.5", "Bob,2024-02-01,20.0"])
    _mkcsv(src / "sales_data" / "b.csv", ["Cy,2024-03-01,30.25"])
    _mkcsv(src / "unmatched_stuff" / "c.csv", ["Zed,2024-01-01,99.0"])

    wh = str(tmp_path / "warehouse")
    pipe = ETLPipeline(spark, warehouse_dir=wh)
    # read_csv_auto parses with pandas (header from file), so the DDL uses
    # the raw header names — sanitize runs inside the pipeline
    results = pipe.ingest_csv_dir(
        str(src), "`Customer Name` string, `Order Date` string, Amount string",
        batch_ts="2026-01-01 00:00:00")

    by_table = {r.table: r for r in results}
    assert set(by_table) == {"dim_customers", "fact_sales"}  # unmatched skipped
    assert by_table["dim_customers"].rows == 2
    assert by_table["dim_customers"].status == "success"

    cust = spark.read.parquet(f"{wh}/dim_customers")
    assert sorted(cust.columns)[:3] == ["amount", "customer_name", "order_date"]
    row = cust.filter(cust.customer_name == "Ana").collect()[0]
    assert row.amount == 10.5            # *amount* name-coerced to double
    assert str(row.order_date) == "2024-01-05"  # *date* coerced to DATE
    assert row.source_name == "dim_customers"

    log = spark.read.parquet(f"{wh}/etl_processing_log")
    assert log.filter(log.status == "success").count() == 2


def test_pipeline_ingest_is_single_pass(spark, tmp_path, monkeypatch):
    """The input corpus must be parsed exactly once per ingest: the routed+
    cleaned frame is persisted and every per-table append reads the cache.
    Spy on read_csv_auto to count parse-plan constructions and check the
    per-table write plans hit InMemoryRelation."""
    import light_etl_windows_container_poc_spark.pipeline as pl

    src = tmp_path / "drop"
    _mkcsv(src / "customer_data" / "a.csv", ["Ana,2024-01-05,10.5"])
    _mkcsv(src / "sales_data" / "b.csv", ["Cy,2024-03-01,30.25"])

    calls = {"n": 0}
    real = pl.read_csv_auto

    def spy(*a, **k):
        calls["n"] += 1
        return real(*a, **k)

    monkeypatch.setattr(pl, "read_csv_auto", spy)
    wh = str(tmp_path / "warehouse")
    pipe = pl.ETLPipeline(spark, warehouse_dir=wh)
    results = pipe.ingest_csv_dir(
        str(src), "`Customer Name` string, `Order Date` string, Amount string",
        batch_ts="2026-01-01 00:00:00")
    assert calls["n"] == 1          # ONE parse plan for the whole ingest
    assert len(results) == 2
    # both tables landed from the one pass
    assert spark.read.parquet(f"{wh}/dim_customers").count() == 1
    assert spark.read.parquet(f"{wh}/fact_sales").count() == 1


def test_pipeline_archives_and_notifies(spark, tmp_path):
    import os

    import light_etl_windows_container_poc_spark.pipeline as pl

    src = tmp_path / "drop"
    _mkcsv(src / "customer_data" / "a.csv", ["Ana,2024-01-05,10.5"])
    archive = tmp_path / "archive"
    seen = {}
    pipe = pl.ETLPipeline(
        spark, warehouse_dir=str(tmp_path / "wh"),
        on_success=lambda rs: seen.setdefault("ok", rs),
        on_failure=lambda rs: seen.setdefault("bad", rs))
    pipe.ingest_csv_dir(
        str(src), "`Customer Name` string, `Order Date` string, Amount string",
        batch_ts="2026-01-01 00:00:00", archive_dir=str(archive))
    # file moved out of the drop dir into the archive
    assert not (src / "customer_data" / "a.csv").exists()
    assert os.listdir(archive) == ["a.csv"]
    # success callback fired with the results, failure one did not
    assert [r.table for r in seen["ok"]] == ["dim_customers"]
    assert "bad" not in seen


def test_pipeline_retries_then_quarantines_poison_file(spark, tmp_path):
    import light_etl_windows_container_poc_spark.pipeline as pl

    src = tmp_path / "drop" / "customer_data"
    good = src / "good.csv"
    _mkcsv(good, ["Ana,2024-01-05,10.5"])
    poison = src / "poison.csv"
    # unclosed quote + ragged rows → pandas C tokenizer raises ParserError
    poison.write_text('Customer Name,Order Date,Amount\n"Bad,x\nc,d,e,f,g,h\n')

    seen = {}
    quarantine = tmp_path / "quarantine"
    wh = str(tmp_path / "wh")
    pipe = pl.ETLPipeline(spark, warehouse_dir=wh,
                          on_failure=lambda rs: seen.setdefault("bad", rs))
    results = pipe.ingest_files_with_retry(
        [str(good), str(poison)],
        "`Customer Name` string, `Order Date` string, Amount string",
        batch_ts="2026-01-01 00:00:00", max_retries=2,
        backoff_seconds=0.01, quarantine_dir=str(quarantine),
        archive_dir=str(tmp_path / "archive"))

    by_status = {r.status for r in results}
    assert by_status == {"success", "quarantined"}
    # the poison file was moved to quarantine, the good one archived
    assert (quarantine / "poison.csv").exists()
    assert (tmp_path / "archive" / "good.csv").exists()
    # quarantine event recorded in the processing log
    log = spark.read.parquet(f"{wh}/etl_processing_log")
    assert log.filter(log.status == "quarantined").count() == 1
    # failure callback fired (batch contains a non-success result)
    assert "bad" in seen
