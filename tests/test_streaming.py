from __future__ import annotations

import pandas as pd

from light_etl_windows_container_poc_spark.catalog import load_tables
from light_etl_windows_container_poc_spark.operators.routing import PatternRouter
from light_etl_windows_container_poc_spark.streaming import (
    stateful_running_max, watch_csv_dir, windowed_event_counts)


def _run_available_now(df, name, tmp_path, output_mode="append"):
    q = (df.writeStream.outputMode(output_mode).format("memory")
         .queryName(name)
         .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    return q


def test_watch_csv_dir_pattern_routes_new_files(spark, tmp_path):
    d = tmp_path / "watch" / "customer_data"
    d.mkdir(parents=True)
    (d / "a.csv").write_text("id,name\n1,Ana\n2,Bob\n")
    u = tmp_path / "watch" / "nomatch"
    u.mkdir()
    (u / "b.csv").write_text("id,name\n9,Zed\n")

    stream = watch_csv_dir(spark, str(tmp_path / "watch"), "id long, name string",
                           PatternRouter())
    assert stream.isStreaming
    _run_available_now(stream, "watched", tmp_path)
    out = spark.sql("SELECT * FROM watched").collect()
    assert {r.id for r in out} == {1, 2}           # unmatched file not routed
    assert all(r.target_table == "dim_customers" for r in out)


def _events_stream(spark, tmp_path, sf_dir):
    # materialize micro-precision events (streaming source can't read NANOS)
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    src = str(tmp_path / "events_src")
    ev.limit(500).write.mode("overwrite").parquet(src)
    return spark.readStream.schema(ev.schema).parquet(src)


def test_windowed_event_counts_matches_batch(spark, tmp_path, sf_dir):
    stream = _events_stream(spark, tmp_path, sf_dir)
    agg = windowed_event_counts(stream, window="1 hour", watermark="2 hours")
    # update mode: append would hold back windows the watermark hasn't
    # passed when the bounded stream ends (the final ~2h of windows)
    _run_available_now(agg, "win_counts", tmp_path, output_mode="update")
    got = spark.sql("SELECT sum(n) AS n FROM win_counts").collect()[0].n
    assert got == 500  # every event lands in exactly one window


def test_stateful_running_max(spark, tmp_path, sf_dir):
    stream = _events_stream(spark, tmp_path, sf_dir)
    out = stateful_running_max(stream)
    _run_available_now(out, "run_max", tmp_path, output_mode="update")
    res = {r.user_id: r.running_max for r in spark.sql("SELECT * FROM run_max").collect()}
    ev = load_tables(spark, sf_dir, ("events",))["events"].limit(500).toPandas()
    expect = ev.groupby("user_id")["value"].max()
    assert res and all(abs(res[u] - expect[u]) < 1e-9 for u in res)
    assert isinstance(ev, pd.DataFrame)
