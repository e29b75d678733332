"""Upsert and TTL sink round-trips."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from light_etl_windows_container_poc_spark.sinks import (apply_ttl,
                                                         upsert_parquet)


def _tmpdir(name):
    d = os.path.join(tempfile.gettempdir(), f"test_{name}_{os.getpid()}")
    return d


def test_upsert_inserts_updates_and_keeps(spark):
    path = _tmpdir("upsert")
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


def test_upsert_duplicate_update_keys_pick_one_winner(spark):
    path = _tmpdir("upsert_dup")
    base = spark.createDataFrame([(1, "a", 1)], "id int, v string, x int")
    upsert_parquet(spark, path, base, ["id"])
    batch = spark.createDataFrame(
        [(1, "z", 5), (1, "z", 9), (1, "y", 99)], "id int, v string, x int")
    n = upsert_parquet(spark, path, batch, ["id"])
    assert n == 1
    row = spark.read.parquet(path).collect()[0]
    # greatest struct over (v, x): ("z", 9) beats ("z", 5) and ("y", 99)
    assert (row.v, row.x) == ("z", 9)


def test_upsert_creates_table_when_absent(spark):
    path = _tmpdir("upsert_new")
    import shutil
    shutil.rmtree(path, ignore_errors=True)
    batch = spark.createDataFrame([(7, "n")], "id int, v string")
    assert upsert_parquet(spark, path, batch, ["id"]) == 1
    assert spark.read.parquet(path).count() == 1


def test_ttl_keeps_recent_rows_only(spark):
    path = _tmpdir("ttl")
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
