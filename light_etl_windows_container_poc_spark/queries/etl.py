"""ETL-surface queries (SURVEY.md §2.1) — the reference's ingest/clean/
route/log semantics as oracle-checked table-in/table-out operators.

Each query dirties a clean testdata table deterministically (both engines
build the identical dirty input) and then applies the engine operator, so
the oracle checks the OPERATOR's semantics, not the synthesizer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_tables
from ..operators.cleaning import (coerce_by_name, dedup_rows, drop_empty_rows,
                                  sanitize_column_names, with_etl_metadata)
from ..operators.quality import null_profile, validate_rows
from ..operators.routing import PatternRouter
from .registry import query


# --------------------------------------------------------------------------
# column-name sanitize + collision dedup (reference dataframe_tasks.py:54-62)
# --------------------------------------------------------------------------
@query("etl_clean_columns", oracle="""
SELECT event_id, user_id, value, value * 2 AS value_3
FROM events
ORDER BY event_id
""")
def etl_clean_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    messy = ev.select(
        F.col("event_id").alias("Event ID"),
        F.col("user_id").alias("User-Id"),
        F.col("value").alias("Value ($)"),
        (F.col("value") * 2).alias("VALUE!!"),   # collides with value → value_3
    )
    return sanitize_column_names(messy).orderBy("event_id")


# --------------------------------------------------------------------------
# name-heuristic type coercion, invalid → NULL (enhanced_tasks.py:156-167)
# --------------------------------------------------------------------------
@query("etl_type_coercion", oracle="""
SELECT event_id,
       TRY_CAST(CASE WHEN event_id % 97 = 0 THEN 'N/A'
                     ELSE CAST(value AS VARCHAR) END AS DOUBLE) AS amount,
       TRY_CAST(CASE WHEN event_id % 13 = 0 THEN 'not-a-date'
                     ELSE strftime(ts, '%Y-%m-%d') END AS DATE) AS event_date
FROM events
ORDER BY event_id
""")
def etl_type_coercion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    dirty = ev.select(
        "event_id",
        F.when(F.col("event_id") % 97 == 0, F.lit("N/A"))
         .otherwise(F.col("value").cast("string")).alias("amount"),
        F.when(F.col("event_id") % 13 == 0, F.lit("not-a-date"))
         .otherwise(F.date_format("ts", "yyyy-MM-dd")).alias("event_date"),
    )
    return coerce_by_name(dirty).orderBy("event_id")


# --------------------------------------------------------------------------
# drop rows where all business columns are null (enhanced_tasks.py:97-103)
# --------------------------------------------------------------------------
@query("etl_drop_empty_rows", oracle="""
SELECT event_id,
       CASE WHEN event_type = 'error' THEN NULL ELSE event_type END AS etype,
       CASE WHEN value < 10 THEN NULL ELSE value END AS val
FROM events
WHERE NOT (event_type = 'error' AND value < 10)
ORDER BY event_id
""")
def etl_drop_empty_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    dirty = ev.select(
        "event_id",
        F.when(F.col("event_type") == "error", None)
         .otherwise(F.col("event_type")).alias("etype"),
        F.when(F.col("value") < 10, None).otherwise(F.col("value")).alias("val"),
    )
    return drop_empty_rows(dirty, ["etype", "val"]).orderBy("event_id")


# --------------------------------------------------------------------------
# exact row dedup keeping a deterministic representative
# --------------------------------------------------------------------------
@query("etl_dedup_rows", oracle="""
SELECT user_id, event_type, event_id, value
FROM (SELECT user_id, event_type, event_id, value,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY event_id) AS rn
      FROM events) t
WHERE rn = 1
ORDER BY user_id, event_type
""")
def etl_dedup_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    sub = ev.select("user_id", "event_type", "event_id", "value")
    return (dedup_rows(sub, ["user_id", "event_type"], keep_min_of="event_id")
            .select("user_id", "event_type", "event_id", "value")
            .orderBy("user_id", "event_type"))


# --------------------------------------------------------------------------
# lineage metadata enrichment (dataframe_tasks.py:64-67)
# --------------------------------------------------------------------------
@query("etl_enrich_metadata", oracle="""
SELECT doc_id, source,
       'docs_batch' AS source_name,
       TIMESTAMP '2026-01-01 00:00:00' AS processed_at,
       'docs_batch_20260101_000000' AS processing_batch
FROM documents
ORDER BY doc_id
""")
def etl_enrich_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return (with_etl_metadata(docs.select("doc_id", "source"),
                              source_name="docs_batch",
                              batch_ts="2026-01-01 00:00:00")
            .orderBy("doc_id"))


# --------------------------------------------------------------------------
# path-pattern → table routing (pattern_based_cleaner_watcher.py:136-157)
# --------------------------------------------------------------------------
@query("etl_pattern_route", oracle="""
SELECT doc_id,
       CASE WHEN contains(lower(replace(path, '\\', '/')), 'src1') THEN 'dim_ones'
            WHEN contains(lower(replace(path, '\\', '/')), 'rc2')  THEN 'dim_twos'
            WHEN contains(lower(replace(path, '\\', '/')), 'src')  THEN 'staging_misc'
       END AS target_table
FROM (SELECT doc_id, 'Z:\\data\\' || source || '\\file.csv' AS path FROM documents) t
ORDER BY doc_id
""")
def etl_pattern_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    # ordered mapping: first match wins — 'src1' catches src1/src10..src19
    # before the catch-all, reproducing the reference's substring semantics
    router = PatternRouter({"src1": "dim_ones", "rc2": "dim_twos",
                            "src": "staging_misc"})
    paths = docs.select(
        "doc_id",
        F.concat(F.lit("Z:\\data\\"), F.col("source"), F.lit("\\file.csv")).alias("path"))
    return (router.route(paths, path_col="path", drop_unrouted=False)
            .select("doc_id", "target_table")
            .orderBy("doc_id"))


# --------------------------------------------------------------------------
# processing-log stats (tasks_postgres.py:237-263 shape)
# --------------------------------------------------------------------------
@query("etl_processing_stats", oracle="""
SELECT count(*) AS total_jobs,
       count(CASE WHEN event_type <> 'error' THEN 1 END) AS successful_jobs,
       count(CASE WHEN event_type = 'error' THEN 1 END) AS failed_jobs,
       CAST(sum(CAST(round(value) AS BIGINT)) AS BIGINT) AS total_rows_processed,
       CAST(round(CAST(sum(CAST(round(value) AS BIGINT)) AS BIGINT) * 100.0
                  / count(*)) AS BIGINT) AS avg_rows_centi
FROM events
""")
def etl_processing_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    rows_units = F.round(F.col("value")).cast("long")
    n = F.count(F.lit(1))
    return ev.agg(
        n.alias("total_jobs"),
        F.count(F.when(F.col("event_type") != "error", 1)).alias("successful_jobs"),
        F.count(F.when(F.col("event_type") == "error", 1)).alias("failed_jobs"),
        F.sum(rows_units).alias("total_rows_processed"),
        F.round(F.sum(rows_units) * 100.0 / n).cast("long").alias("avg_rows_centi"),
    )


# --------------------------------------------------------------------------
# corpus/file stats by group (fileserver.py:283 get_stats shape)
# --------------------------------------------------------------------------
@query("etl_file_stats", oracle="""
SELECT lang,
       count(*) AS file_count,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST(round(CAST(sum(n_chars) AS BIGINT) * 100.0 / count(*)) AS BIGINT)
         AS avg_chars_centi,
       max(n_chars) AS max_chars
FROM documents
GROUP BY lang
ORDER BY lang
""")
def etl_file_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    n = F.count(F.lit(1))
    return (docs.groupBy("lang")
            .agg(n.alias("file_count"),
                 F.sum("n_chars").alias("total_chars"),
                 F.round(F.sum("n_chars") * 100.0 / n).cast("long")
                 .alias("avg_chars_centi"),
                 F.max("n_chars").alias("max_chars"))
            .orderBy("lang"))


# --------------------------------------------------------------------------
# per-column null/blank/distinct profile (enhanced_tasks.py:93-95)
# --------------------------------------------------------------------------
@query("etl_quality_profile", oracle="""
SELECT 'etype' AS col_name,
       CAST(sum(CASE WHEN etype IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_count,
       CAST(sum(CASE WHEN etype = '' THEN 1 ELSE 0 END) AS BIGINT) AS blank_count,
       count(DISTINCT etype) AS distinct_count
FROM (SELECT CASE WHEN event_type = 'error' THEN NULL ELSE event_type END AS etype,
             CASE WHEN value < 5 THEN '' ELSE CAST(user_id AS VARCHAR) END AS uid
      FROM events) t
UNION ALL
SELECT 'uid',
       CAST(sum(CASE WHEN uid IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       CAST(sum(CASE WHEN uid = '' THEN 1 ELSE 0 END) AS BIGINT),
       count(DISTINCT uid)
FROM (SELECT CASE WHEN event_type = 'error' THEN NULL ELSE event_type END AS etype,
             CASE WHEN value < 5 THEN '' ELSE CAST(user_id AS VARCHAR) END AS uid
      FROM events) t
ORDER BY col_name
""")
def etl_quality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    dirty = ev.select(
        F.when(F.col("event_type") == "error", None)
         .otherwise(F.col("event_type")).alias("etype"),
        F.when(F.col("value") < 5, F.lit(""))
         .otherwise(F.col("user_id").cast("string")).alias("uid"),
    )
    return null_profile(dirty).orderBy("col_name")


# --------------------------------------------------------------------------
# row validation flag (pattern_watcher_configurable.py:240-255)
# --------------------------------------------------------------------------
@query("etl_validate_rows", oracle="""
SELECT doc_id,
       (text IS NOT NULL AND n_chars >= 50 AND n_chars <= 10000) AS is_valid
FROM documents
ORDER BY doc_id
""")
def etl_validate_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return (validate_rows(docs, required_cols=["text"],
                          min_len=50, max_len=10000, len_col="n_chars")
            .select("doc_id", "is_valid")
            .orderBy("doc_id"))


# --------------------------------------------------------------------------
# JSON property extraction (events.props is a JSON string column)
# --------------------------------------------------------------------------
@query("etl_json_extract", oracle="""
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
       CAST(json_extract_string(props, '$.missing') AS BIGINT) AS missing_val
FROM events
ORDER BY event_id
""")
def etl_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return (ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k_val"),
        F.get_json_object("props", "$.missing").cast("long").alias("missing_val"))
        .orderBy("event_id"))


# --------------------------------------------------------------------------
# SCD/MERGE emulation: upsert a staging batch into a dimension with
# anti-join + union (the Delta-less MERGE INTO shape)
# --------------------------------------------------------------------------
@query("etl_scd2_merge", oracle="""
SELECT c_custkey,
       CASE WHEN c_custkey % 10 = 0
            THEN CAST(round(c_acctbal * 100) AS BIGINT) + 10000
            ELSE CAST(round(c_acctbal * 100) AS BIGINT) END AS acctbal_cents,
       CASE WHEN c_custkey % 10 = 0 THEN 'updated' ELSE 'unchanged' END
         AS row_status
FROM customer
ORDER BY c_custkey
""")
def etl_scd2_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.cleaning import merge_upsert

    cust = load_tables(spark, sf_dir, ("customer",))["customer"]
    dim = cust.select("c_custkey",
                      F.round(F.col("c_acctbal") * 100).cast("long")
                      .alias("acctbal_cents"))
    # deterministic staging batch: every 10th customer gets +100.00
    updates = (dim.filter(F.col("c_custkey") % 10 == 0)
               .withColumn("acctbal_cents", F.col("acctbal_cents") + 10000))
    return (merge_upsert(dim, updates, keys=["c_custkey"])
            .orderBy("c_custkey"))


# --------------------------------------------------------------------------
# snapshot reconciliation diff (full-outer-join audit of a load)
# --------------------------------------------------------------------------
@query("etl_snapshot_diff", oracle="""
SELECT c_custkey,
       CAST(round(c_acctbal * 100) AS BIGINT) AS old_val,
       CASE WHEN c_custkey % 97 <> 0 THEN
         CAST(round(c_acctbal * 100) AS BIGINT)
           + CASE WHEN c_custkey % 7 = 0 THEN 100 ELSE 0 END END AS new_val,
       CASE WHEN c_custkey % 97 = 0 THEN 'removed'
            WHEN c_custkey % 7 = 0 THEN 'changed'
            ELSE 'unchanged' END AS status
FROM customer
ORDER BY c_custkey
""")
def etl_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.quality import snapshot_diff

    cust = load_tables(spark, sf_dir, ("customer",))["customer"]
    base = cust.select("c_custkey",
                       F.round(F.col("c_acctbal") * 100).cast("long")
                       .alias("cents"))
    # old snapshot keeps %97 rows that the new one drops; new snapshot
    # bumps %7 rows — deterministic on both engines
    old = base.withColumnRenamed("cents", "v")
    new = (base.filter(F.col("c_custkey") % 97 != 0)
           .select("c_custkey",
                   (F.col("cents") + F.when(F.col("c_custkey") % 7 == 0, 100)
                    .otherwise(0)).alias("v")))
    return (snapshot_diff(old, new, ["c_custkey"], "v")
            .select("c_custkey", "old_val", "new_val", "status")
            .orderBy("c_custkey"))



_NATION_ORACLE = """
SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey,
       n_name,
       CAST(n_regionkey AS BIGINT) AS n_regionkey
FROM nation
ORDER BY n_nationkey
"""


def _nation_excel_roundtrip(spark: SparkSession, sf_dir: str,
                            build_fn, ext: str, title: str) -> DataFrame:
    """Shared round-trip body for the three Excel-format oracle legs:
    build a REAL workbook from the nation table with the given
    dependency-free writer, write it as a .{ext} file, and read it back
    through the distributed binaryFile+mapInPandas reader exercising
    sheet selection, skiprows, and usecols."""
    import os

    from ..sources.files import read_excel
    from .registry import cert_work_dir

    nation = load_tables(spark, sf_dir, ("nation",))["nation"]
    rows = nation.orderBy("n_nationkey").collect()  # 25 rows at any SF
    grid = [[title, None, None, None],             # skiprows target
            ["n_nationkey", "n_name", "junk", "n_regionkey"]]
    grid += [[int(r.n_nationkey), r.n_name, "x", int(r.n_regionkey)]
             for r in rows]
    book = build_fn({"meta": [["ignore me"]], "nation": grid})
    out_dir = cert_work_dir(ext, sf_dir)
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, f"nation.{ext}"), "wb") as fh:
        fh.write(book)
    df = read_excel(
        spark, out_dir,
        "n_nationkey long, n_name string, n_regionkey long",
        sheet_name="nation", skiprows=1, usecols="A:B,D",
        include_source_path=False)
    return df.orderBy("n_nationkey")


# --------------------------------------------------------------------------
# Excel source end-to-end (reference fileserver.py:131-254 read_excel /
# read_excel_with_params), one oracle leg per accepted binary format
# (fileserver.py:41-44): .xlsx via the SpreadsheetML writer, .xlsb via
# the BIFF12 writer, legacy .xls via the BIFF8 writer — each built
# in-repo, decoded by magic-byte dispatch on executors, hash-checked
# against the nation table.
# --------------------------------------------------------------------------
@query("src_excel", oracle=_NATION_ORACLE)
def src_excel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.xlsx import build_xlsx_bytes

    return _nation_excel_roundtrip(spark, sf_dir, build_xlsx_bytes,
                                   "xlsx", "nation export")


@query("src_excel_xlsb", oracle=_NATION_ORACLE)
def src_excel_xlsb(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.xlsb_biff12 import build_xlsb_bytes

    return _nation_excel_roundtrip(spark, sf_dir, build_xlsb_bytes,
                                   "xlsb", "nation export (biff12)")


@query("src_excel_xls", oracle=_NATION_ORACLE)
def src_excel_xls(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.xls_biff import build_xls_bytes

    return _nation_excel_roundtrip(spark, sf_dir, build_xls_bytes,
                                   "xls", "nation export (legacy)")
