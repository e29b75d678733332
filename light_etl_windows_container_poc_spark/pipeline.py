"""End-to-end ETL pipeline — the reference's whole flow as one engine call.

Reference flow (watch → pattern-route → read → clean → append → log) lived
across a file watcher, Celery tasks, and pandas
(`pattern_based_cleaner_watcher.py`, `dataframe_tasks.py`). Here it's a
single batch (or streaming — see streaming/watcher.py) job:

    discover files → route by path pattern → per-table: read, sanitize
    columns, coerce types, drop empty rows, enrich metadata → append to
    the warehouse → write the processing log.

Scale shape: discovery and routing are metadata-only; each table's ingest
is one distributed read + narrow transforms + one append. No driver-side
per-file loop touches data.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import SparkSession

from .operators.cleaning import (coerce_by_name, drop_empty_rows,
                                 sanitize_column_names, with_etl_metadata)
from .operators.routing import PatternRouter
from .sinks import append_table, write_processing_log
from .sources.files import read_csv_auto


@dataclass
class IngestResult:
    table: str
    rows: int
    status: str
    error: str | None = None


@dataclass
class ETLPipeline:
    spark: SparkSession
    warehouse_dir: str
    router: PatternRouter = field(default_factory=PatternRouter)

    def ingest_csv_dir(self, input_dir: str, schema_ddl: str,
                       batch_ts: str | None = None) -> list[IngestResult]:
        """Route every CSV under ``input_dir`` by path pattern and append
        each routed group to its warehouse table."""
        results: list[IngestResult] = []
        df = read_csv_auto(self.spark, input_dir, schema_ddl)
        routed = self.router.route(df, path_col="source_path")
        tables = [r["target_table"] for r in
                  routed.select("target_table").distinct().collect()]
        for table in sorted(tables):
            t0 = time.time()
            part = routed.filter(routed.target_table == table).drop("target_table")
            try:
                cleaned = with_etl_metadata(
                    coerce_by_name(drop_empty_rows(sanitize_column_names(part))),
                    source_name=table, batch_ts=batch_ts)
                n = cleaned.count()
                append_table(cleaned, self.warehouse_dir, table)
                write_processing_log(self.spark, self.warehouse_dir,
                                     filename=input_dir, rows_processed=n,
                                     status="success",
                                     processing_time_seconds=time.time() - t0,
                                     sheet_name=table)
                results.append(IngestResult(table, n, "success"))
            except Exception as e:  # log-and-continue, reference behavior
                write_processing_log(self.spark, self.warehouse_dir,
                                     filename=input_dir, rows_processed=0,
                                     status="error", error_message=str(e),
                                     processing_time_seconds=time.time() - t0,
                                     sheet_name=table)
                results.append(IngestResult(table, 0, "error", str(e)))
        return results


def health_check(spark: SparkSession, warehouse_dir: str | None = None,
                 tables: list[str] | None = None) -> dict:
    """Reference `health_check` parity (`enhanced_tasks.py:264-284`):
    session liveness + warehouse readability in one probe dict."""
    out: dict = {"status": "healthy", "spark_version": spark.version,
                 "default_parallelism": spark.sparkContext.defaultParallelism}
    try:
        out["session_alive"] = spark.range(1).count() == 1
    except Exception as e:  # pragma: no cover
        return {"status": "unhealthy", "error": str(e)}
    if warehouse_dir and tables:
        table_status = {}
        for t in tables:
            try:
                spark.read.parquet(f"{warehouse_dir}/{t}").limit(1).collect()
                table_status[t] = "ok"
            except Exception as e:
                table_status[t] = f"error: {e}"[:200]
                out["status"] = "degraded"
        out["tables"] = table_status
    return out
