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
