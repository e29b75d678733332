"""Round-12 head candidate, pre-certified: the STREAMING flagship flow
under the driver hash.

`pipeline_e2e_cert` (queries/breadth37.py) certifies the BATCH
re-expression of the reference's whole watcher flow; this module
certifies its STREAMING twin (streaming/excel_pipeline.py — the excel
drive watch → pattern-route → clean → per-table append → processing
log loop that IS the reference watcher,
pattern_based_cleaner_watcher.py:239-314). Same deterministic
corruption recipe, same DuckDB replay of the cleaned warehouse
aggregates; what it certifies BEYOND the batch cert is the streaming
machinery: the python-data-source excel reader, the per-micro-batch
route+clean handler, checkpointed ingest, and the 7-column
processing-log contract shared with the batch pipeline.

Deliberately NOT decorated with @query: the r11 driver budget is spent
(5 promoted heads + 45 mandatory recertifications == 50). The gate
test in tests/test_breadth43.py runs the EXACT driver-replica compare
(tools/check_oracle pandas fetch + frame_fingerprint) at all three
SFs, so r12 promotes it by adding the decorator — nothing else.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_tables
from .registry import cert_work_dir

_STREAM_PIPE_BATCH_TS = "2025-01-01 00:00:00"

PIPELINE_E2E_STREAM_ORACLE = """
WITH cust AS (
  SELECT CASE WHEN c_custkey % 13 = 0 THEN NULL
              WHEN c_custkey % 10 = 0 THEN NULL
              ELSE CAST(round(c_acctbal * 100) AS BIGINT) END AS cents,
         CASE WHEN c_custkey % 13 = 0 OR c_custkey % 7 = 0 THEN NULL
              ELSE DATE '2024-01-01'
                   + CAST(c_custkey % 60 AS INTEGER) END AS d,
         c_custkey % 13 = 0 AS all_empty
  FROM customer WHERE c_custkey % 20 = 1),
sales AS (
  SELECT CASE WHEN o_orderkey % 13 = 0 THEN NULL
              WHEN o_orderkey % 10 = 0 THEN NULL
              ELSE CAST(round(o_totalprice * 100) AS BIGINT) END AS cents,
         CASE WHEN o_orderkey % 13 = 0 OR o_orderkey % 7 = 0 THEN NULL
              ELSE CAST(o_orderdate AS DATE) END AS d,
         o_orderkey % 13 = 0 AS all_empty
  FROM orders WHERE o_orderkey % 20 = 1),
both_t AS (
  SELECT 'dim_customers' AS table_name, * FROM cust
  UNION ALL
  SELECT 'fact_sales' AS table_name, * FROM sales)
SELECT table_name,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN cents IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_amount_null,
       CAST(sum(cents) AS BIGINT) AS sum_amount_cents,
       CAST(sum(CASE WHEN d IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_date_null,
       CAST(min(d) AS VARCHAR) AS min_date,
       CAST(max(d) AS VARCHAR) AS max_date,
       CAST(count(*) AS BIGINT) AS log_rows,
       'completed' AS log_status
FROM both_t WHERE NOT all_empty
GROUP BY table_name ORDER BY table_name
"""


def pipeline_e2e_stream_cert(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """Seed xlsx workbooks from customer/orders (c/o key % 20 == 1,
    corrupted exactly like pipeline_e2e_cert: key % 13 → all-empty row,
    % 10 → garbage amount, % 7 → null date), stream them through the
    excel ETL (two checkpointed streams, one per pattern dir like the
    reference's per-pattern watcher configs), then hash the cleaned
    warehouse per table: row counts, null counts, exact cents sum,
    date range, and the processing log's per-table row totals + status.
    DuckDB replays every cell from the base tables."""
    from ..sources.xlsx import build_xlsx_bytes
    from ..streaming.excel_pipeline import start_excel_etl_stream

    t = load_tables(spark, sf_dir, ("customer", "orders"))
    work = cert_work_dir("spipe", sf_dir)
    shutil.rmtree(work, ignore_errors=True)
    try:
        drive = os.path.join(work, "drive")
        wh = os.path.join(work, "warehouse")

        def seed(df, key, amount, date, subdir):
            k = F.col(key)
            rows = (df.filter(k % 20 == 1).select(
                k.alias("k"),
                F.when(k % 13 == 0, F.lit(None))
                .otherwise(F.concat(F.lit("K"), k.cast("string")))
                .alias("raw_key"),
                F.when(k % 13 == 0, F.lit(None))
                .when(k % 10 == 0, F.lit("garbage"))
                .otherwise(F.format_string("%.2f", amount))
                .alias("amount"),
                F.when((k % 13 == 0) | (k % 7 == 0), F.lit(None))
                .otherwise(date.cast("string")).alias("date"))
                .orderBy("k").collect())
            header = ["Raw Key", "Amount Due", "Event Date"]
            for part in (0, 1):  # two books -> the log sums over files
                grid = [header] + [[r.raw_key, r.amount, r.date]
                                   for r in rows if r.k % 2 == part]
                path = os.path.join(drive, subdir, f"book{part}.xlsx")
                os.makedirs(os.path.dirname(path), exist_ok=True)
                with open(path, "wb") as fh:
                    fh.write(build_xlsx_bytes({"Sheet1": grid}))

        seed(t["customer"], "c_custkey", F.col("c_acctbal"),
             F.date_add(F.lit("2024-01-01").cast("date"),
                        (F.col("c_custkey") % 60).cast("int")),
             "customer_data_drop")
        seed(t["orders"], "o_orderkey", F.col("o_totalprice"),
             F.col("o_orderdate"), "sales_data_drop")

        ddl = "`Raw Key` string, `Amount Due` string, `Event Date` string"
        for sub in ("customer_data_drop", "sales_data_drop"):
            q = start_excel_etl_stream(
                spark, os.path.join(drive, sub), ddl, wh,
                os.path.join(work, f"ckpt_{sub}"),
                batch_ts=_STREAM_PIPE_BATCH_TS)
            assert q.awaitTermination(300), f"{sub} ingest did not finish"

        log = (spark.read.parquet(os.path.join(wh, "etl_processing_log"))
               .withColumn(
                   "table_name",
                   F.when(F.col("filename").contains("customer_data"),
                          F.lit("dim_customers"))
                   .otherwise(F.lit("fact_sales")))
               .groupBy("table_name")
               .agg(F.sum("rows_processed").cast("long").alias("log_rows"),
                    F.first("status").alias("log_status")))

        parts = []
        for table in ("dim_customers", "fact_sales"):
            w = spark.read.parquet(os.path.join(wh, table))
            parts.append(w.agg(
                F.lit(table).alias("table_name"),
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.sum(F.col("amount_due").isNull().cast("int"))
                .cast("long").alias("n_amount_null"),
                F.sum(F.round(F.col("amount_due") * 100).cast("long"))
                .cast("long").alias("sum_amount_cents"),
                F.sum(F.col("event_date").isNull().cast("int"))
                .cast("long").alias("n_date_null"),
                F.min("event_date").cast("string").alias("min_date"),
                F.max("event_date").cast("string").alias("max_date")))
        wide = parts[0].unionByName(parts[1])
        out = (wide.join(F.broadcast(log), "table_name", "left")
               .select("table_name", "n_rows", "n_amount_null",
                       "sum_amount_cents", "n_date_null", "min_date",
                       "max_date", "log_rows", "log_status")
               .orderBy("table_name"))
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)
