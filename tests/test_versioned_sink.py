"""Versioned snapshot sink (`sinks.versioned`): time travel, history,
and vacuum without a table format."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from light_etl_windows_container_poc_spark.sinks.versioned import (
    read_version, table_history, vacuum, write_version)


def test_time_travel_reads_pinned_versions(spark, tmp_path):
    path = str(tmp_path / "dim")
    v0 = write_version(spark.range(0, 3).select(
        F.col("id"), F.lit("a").alias("tag")), path)
    v1 = write_version(spark.range(0, 5).select(
        F.col("id"), F.lit("b").alias("tag")), path)
    assert (v0, v1) == (0, 1)
    assert read_version(spark, path).count() == 5          # latest
    old = read_version(spark, path, 0)
    assert old.count() == 3
    assert {r["tag"] for r in old.collect()} == {"a"}      # immutable past

    hist = table_history(path)
    assert [e["version"] for e in hist] == [0, 1]
    assert [e["rows"] for e in hist] == [3, 5]
    assert hist[1]["parent"] == 0


def test_vacuum_bounds_storage_and_errors_clearly(spark, tmp_path):
    path = str(tmp_path / "t")
    for i in range(4):
        write_version(spark.range(0, i + 1), path)
    removed = vacuum(path, keep_last=2)
    assert removed == [0, 1]
    assert [e["version"] for e in table_history(path)] == [2, 3]
    assert read_version(spark, path).count() == 4          # latest intact
    with pytest.raises(ValueError, match="vacuumed or never"):
        read_version(spark, path, 0)
    # next write continues the version sequence after vacuum
    assert write_version(spark.range(0, 9), path) == 4


def test_missing_table_raises(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        read_version(spark, str(tmp_path / "nope"))


def test_delete_where_versioned_purges_all_retained_history(spark,
                                                           tmp_path):
    """The takedown lifecycle (r10 verdict #3): an ordinary live-table
    delete leaves old snapshots serving the row via time travel until
    vacuum — delete_where_versioned purges EVERY retained snapshot so
    no pinned read resurrects it, and refreshes the manifest's row
    counts."""
    from light_etl_windows_container_poc_spark.sinks.versioned import (
        delete_where_versioned,
    )

    path = str(tmp_path / "docs")
    write_version(spark.createDataFrame(
        [(1, "keep"), (2, "purge me"), (3, "keep")],
        "doc_id long, text string"), path)
    write_version(spark.createDataFrame(
        [(1, "keep"), (2, "purge me v2"), (3, "keep"), (4, "new")],
        "doc_id long, text string"), path)

    # the residual the purge exists to close: the row is visible in
    # BOTH snapshots before
    assert read_version(spark, path, 0).filter("doc_id = 2").count() == 1
    assert read_version(spark, path, 1).filter("doc_id = 2").count() == 1

    dels = spark.createDataFrame([(2,)], "doc_id long")
    got = delete_where_versioned(spark, path, dels, ["doc_id"])
    assert got == {0: 1, 1: 1}

    for v in (0, 1):
        assert read_version(spark, path, v).filter("doc_id = 2").count() == 0
    # survivors intact, manifest counts refreshed
    assert read_version(spark, path, 0).count() == 2
    assert read_version(spark, path, 1).count() == 3
    assert [e["rows"] for e in table_history(path)] == [2, 3]

    # idempotent: re-running matches zero rows, touches nothing
    assert delete_where_versioned(spark, path, dels, ["doc_id"]) == {}
    # empty key set is a no-op
    empty = spark.createDataFrame([], "doc_id long")
    assert delete_where_versioned(spark, path, empty, ["doc_id"]) == {}
    # vacuum afterwards still behaves (frontier documented in module)
    assert vacuum(path, keep_last=1) == [0]
    assert read_version(spark, path).count() == 3


def test_delete_where_versioned_null_safe_and_validates_keys(spark,
                                                             tmp_path):
    from light_etl_windows_container_poc_spark.sinks.versioned import (
        delete_where_versioned,
    )

    path = str(tmp_path / "nulls")
    write_version(spark.createDataFrame(
        [(None, "anon"), (7, "named")], "doc_id long, text string"), path)
    dels = spark.createDataFrame([(None,)], "doc_id long")
    assert delete_where_versioned(spark, path, dels, ["doc_id"]) == {0: 1}
    assert [tuple(r) for r in read_version(spark, path, 0).collect()] \
        == [(7, "named")]

    with pytest.raises(ValueError, match="not in v=0"):
        delete_where_versioned(
            spark, path, spark.createDataFrame([(1,)], "nope long"),
            ["nope"])
