from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from light_etl_windows_container_poc_spark.operators.cleaning import (
    coerce_by_name, dedup_rows, drop_empty_rows, sanitize_column_names,
    sanitize_name, with_etl_metadata)


def test_sanitize_name():
    assert sanitize_name("Value ($)") == "value"
    assert sanitize_name("User-Id") == "user_id"
    assert sanitize_name("  Weird__Col!! ") == "weird__col"


def test_sanitize_column_names_dedups_collisions(spark):
    df = spark.createDataFrame([(1, 2, 3)], ["Value ($)", "VALUE!!", "ok"])
    out = sanitize_column_names(df)
    assert out.columns == ["value", "value_1", "ok"]
    assert out.collect()[0][1] == 2


def test_coerce_by_name(spark):
    df = spark.createDataFrame(
        [("2024-01-05", "12.5", "x"), ("garbage", "N/A", "y")],
        ["order_date", "amount", "other"])
    out = coerce_by_name(df)
    types = dict(out.dtypes)
    assert types == {"order_date": "date", "amount": "double", "other": "string"}
    rows = out.orderBy("other").collect()
    assert rows[0].order_date == datetime.date(2024, 1, 5)
    assert rows[0].amount == 12.5
    assert rows[1].order_date is None and rows[1].amount is None


def test_drop_empty_rows(spark):
    df = spark.createDataFrame(
        [(1, None, None), (2, "a", None), (3, None, 1.0)],
        "id long, a string, b double")
    out = drop_empty_rows(df, ["a", "b"])
    assert sorted(r.id for r in out.collect()) == [2, 3]


def test_dedup_rows_keeps_min_representative(spark):
    df = spark.createDataFrame(
        [(1, "k", 10.0), (2, "k", 20.0), (3, "j", 30.0)],
        "event_id long, key string, value double")
    out = dedup_rows(df, ["key"], keep_min_of="event_id")
    got = {r.key: (r.event_id, r.value) for r in out.collect()}
    assert got == {"k": (1, 10.0), "j": (3, 30.0)}


def test_with_etl_metadata_deterministic(spark):
    df = spark.createDataFrame([(1,)], "id long")
    out = with_etl_metadata(df, "src", batch_ts="2026-01-01 12:34:56").collect()[0]
    assert out.source_name == "src"
    assert out.processing_batch == "src_20260101_123456"


def test_with_etl_metadata_clock_is_plan_time_literal(spark):
    df = spark.createDataFrame([(i,) for i in range(5)], "id long")
    vals = with_etl_metadata(df, "s").select("processed_at").distinct().collect()
    assert len(vals) == 1  # one literal, not a per-row clock
