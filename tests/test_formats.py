from __future__ import annotations

from pyspark.sql import functions as F

from light_etl_windows_container_poc_spark.catalog import load_tables
from light_etl_windows_container_poc_spark.plans import formatted_plan
from light_etl_windows_container_poc_spark.sinks import (write_format,
                                                         write_partitioned)
from light_etl_windows_container_poc_spark.sources.files import read_format


def test_json_and_orc_and_csv_roundtrip(spark, tmp_path, sf_dir):
    nat = load_tables(spark, sf_dir, ("nation",))["nation"]
    for fmt in ("json", "orc", "csv"):
        p = str(tmp_path / fmt)
        write_format(nat, p, fmt=fmt)
        back = read_format(spark, p, fmt,
                           "n_nationkey int, n_name string, n_regionkey int")
        assert back.count() == 25
        assert {r.n_name for r in back.collect()} == \
               {r.n_name for r in nat.collect()}


def test_partitioned_write_prunes_partitions(spark, tmp_path, sf_dir):
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    p = str(tmp_path / "events_by_day")
    write_partitioned(ev.withColumn("day", F.to_date("ts")), p, ["day"])
    read = spark.read.parquet(p).filter(F.col("day") == "2024-01-05")
    plan = formatted_plan(read)
    assert "PartitionFilters" in plan
    # the day filter must be a partition filter, not a data filter
    pf_lines = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert any("day" in ln for ln in pf_lines), pf_lines
    n_days = ev.select(F.to_date("ts").alias("d")).distinct().count()
    assert read.count() == ev.filter(F.to_date("ts") == "2024-01-05").count()
    assert n_days > 1
