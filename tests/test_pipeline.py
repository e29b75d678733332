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
