"""Upsert and TTL sink round-trips, including the data-loss guard rails
(schema-narrowing rejection, null-safe keys, unparseable-cutoff
rejection, NULL-timestamp policy, partition-layout preservation)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from light_etl_windows_container_poc_spark.sinks import (apply_ttl,
                                                         upsert_parquet)


def test_upsert_inserts_updates_and_keeps(spark, tmp_path):
    path = str(tmp_path / "upsert")
    base = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "id int, v string, x int")
    n = upsert_parquet(spark, path, base, ["id"])
    assert n == 3
    # update id=2, insert id=4, leave 1 and 3 untouched
    batch = spark.createDataFrame(
        [(2, "B", 200), (4, "d", 40)], "id int, v string, x int")
    n = upsert_parquet(spark, path, batch, ["id"])
    assert n == 4
    got = {r.id: (r.v, r.x) for r in spark.read.parquet(path).collect()}
    assert got == {1: ("a", 10), 2: ("B", 200), 3: ("c", 30), 4: ("d", 40)}


def test_upsert_duplicate_update_keys_pick_one_winner(spark, tmp_path):
    path = str(tmp_path / "upsert_dup")
    base = spark.createDataFrame([(1, "a", 1)], "id int, v string, x int")
    upsert_parquet(spark, path, base, ["id"])
    batch = spark.createDataFrame(
        [(1, "z", 5), (1, "z", 9), (1, "y", 99)], "id int, v string, x int")
    n = upsert_parquet(spark, path, batch, ["id"])
    assert n == 1
    row = spark.read.parquet(path).collect()[0]
    # greatest struct over (v, x): ("z", 9) beats ("z", 5) and ("y", 99)
    assert (row.v, row.x) == ("z", 9)


def test_upsert_creates_table_when_absent(spark, tmp_path):
    path = str(tmp_path / "upsert_new")
    batch = spark.createDataFrame([(7, "n")], "id int, v string")
    assert upsert_parquet(spark, path, batch, ["id"]) == 1
    assert spark.read.parquet(path).count() == 1


def test_upsert_rejects_schema_narrowing_batch(spark, tmp_path):
    path = str(tmp_path / "upsert_narrow")
    base = spark.createDataFrame([(1, "a", 10)], "id int, v string, x int")
    upsert_parquet(spark, path, base, ["id"])
    narrower = spark.createDataFrame([(1, "z")], "id int, v string")
    with pytest.raises(ValueError, match="lacks existing columns"):
        upsert_parquet(spark, path, narrower, ["id"])
    # table untouched by the rejected batch
    assert spark.read.parquet(path).collect()[0].x == 10


def test_upsert_null_key_replaces_not_duplicates(spark, tmp_path):
    path = str(tmp_path / "upsert_nullkey")
    base = spark.createDataFrame([(None, "old"), (1, "a")], "id int, v string")
    upsert_parquet(spark, path, base, ["id"])
    for v in ("new1", "new2"):  # repeated upserts must not accumulate
        batch = spark.createDataFrame([(None, v)], "id int, v string")
        assert upsert_parquet(spark, path, batch, ["id"]) == 2
    got = {r.id: r.v for r in spark.read.parquet(path).collect()}
    assert got == {None: "new2", 1: "a"}


def test_ttl_keeps_recent_rows_only(spark, tmp_path):
    path = str(tmp_path / "ttl")
    df = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00"), (2, "2024-01-20 00:00:00"),
         (3, "2024-01-29 12:00:00")],
        "id int, ts_s string").select(
        "id", F.to_timestamp("ts_s").alias("ts"))
    df.write.mode("overwrite").parquet(path)
    n = apply_ttl(spark, path, "ts", keep_days=14, now="2024-01-30 00:00:00")
    assert n == 2
    ids = sorted(r.id for r in spark.read.parquet(path).collect())
    assert ids == [2, 3]


def test_ttl_rejects_unparseable_now_without_touching_table(spark, tmp_path):
    path = str(tmp_path / "ttl_badnow")
    spark.createDataFrame([(1,)], "id int").select(
        "id", F.current_timestamp().alias("ts")
    ).write.parquet(path)
    with pytest.raises(ValueError, match="not an ISO timestamp"):
        apply_ttl(spark, path, "ts", keep_days=1, now="30/01/2024")
    assert spark.read.parquet(path).count() == 1  # table intact


def test_ttl_null_ts_policy(spark, tmp_path):
    rows = [(1, "2024-01-29 00:00:00"), (2, None)]
    for keep_null, expect in ((False, {1}), (True, {1, 2})):
        path = str(tmp_path / f"ttl_null_{keep_null}")
        (spark.createDataFrame(rows, "id int, ts_s string")
         .select("id", F.to_timestamp("ts_s").alias("ts"))
         .write.parquet(path))
        apply_ttl(spark, path, "ts", keep_days=14,
                  now="2024-01-30 00:00:00", keep_null_ts=keep_null)
        assert {r.id for r in spark.read.parquet(path).collect()} == expect


def test_ttl_preserves_partition_layout(spark, tmp_path):
    path = str(tmp_path / "ttl_part")
    (spark.createDataFrame(
        [(1, "2024-01-10", "2024-01-10 00:00:00"),
         (2, "2024-01-29", "2024-01-29 00:00:00")],
        "id int, dt string, ts_s string")
     .select("id", "dt", F.to_timestamp("ts_s").alias("ts"))
     .write.partitionBy("dt").parquet(path))
    apply_ttl(spark, path, "ts", keep_days=14, now="2024-01-30 00:00:00",
              partition_by=["dt"])
    # the hive-style dt=... directories survive the sweep
    assert any(d.startswith("dt=") for d in os.listdir(path))
    assert [r.id for r in spark.read.parquet(path).collect()] == [2]


def test_upsert_widening_batch_nullfills_kept_rows(spark, tmp_path):
    path = str(tmp_path / "upsert_widen")
    base = spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string")
    upsert_parquet(spark, path, base, ["id"])
    wider = spark.createDataFrame([(2, "B", 9)], "id int, v string, w int")
    assert upsert_parquet(spark, path, wider, ["id"]) == 2
    got = {r.id: (r.v, r.w) for r in spark.read.parquet(path).collect()}
    assert got == {1: ("a", None), 2: ("B", 9)}
