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


def test_watermark_drops_late_events_across_restarts(spark, tmp_path):
    """Late data beyond the watermark must be DROPPED, not merged — the
    contract that bounds state at O(active windows) on an unbounded
    stream. Two availableNow runs share a checkpoint: run 1 finalizes
    the 09:00 window and advances the watermark past it; run 2 delivers
    a 09:45 straggler, which must not reopen the finalized window."""
    import os

    from pyspark.sql import functions as F

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ck")
    os.makedirs(src)

    def drop(name, rows):
        (spark.createDataFrame(rows, "ts_s string, event_type string, v double")
         .select(F.to_timestamp("ts_s").alias("ts"), "event_type",
                 F.col("v").alias("value"))
         .write.parquet(f"{src}/{name}"))

    def run():
        stream = (spark.readStream
                  .schema("ts timestamp, event_type string, value double")
                  .option("recursiveFileLookup", "true").parquet(src))
        q = (windowed_event_counts(stream, window="1 hour",
                                   watermark="2 hours")
             .writeStream.format("parquet")          # append mode
             .option("path", out).option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(300)

    drop("b1", [("2024-01-01 09:15:00", "view", 1.0),
                ("2024-01-01 20:00:00", "view", 2.0)])
    run()  # watermark after run 1: 20:00 - 2h = 18:00 → 09:00 finalized

    drop("b2", [("2024-01-01 09:45:00", "view", 100.0),   # LATE: dropped
                ("2024-01-01 23:30:00", "view", 3.0)])
    run()  # watermark reaches 21:30 → the 20:00 window finalizes too

    got = {(str(r["window_start"]), r["n"], r["total_value"])
           for r in spark.read.parquet(out).collect()}
    assert ("2024-01-01 09:00:00", 1, 1.0) in got   # NOT n=2: late dropped
    assert ("2024-01-01 20:00:00", 1, 2.0) in got
    assert not any(n == 2 for _, n, _ in got)


def test_stateful_ops_on_rocksdb_state_store(spark, tmp_path, sf_dir):
    """The same watermarked dedup runs on the RocksDB state store with
    identical results — and the progress metrics prove the provider was
    actually RocksDB, not a silently-ignored conf."""
    import json

    from light_etl_windows_container_poc_spark.queries.streaming_q import \
        _events_stream
    from light_etl_windows_container_poc_spark.streaming.windows import \
        use_rocksdb_state

    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    use_rocksdb_state(spark)
    try:
        stream = (_events_stream(spark, sf_dir)
                  .withWatermark("ts", "1 day")
                  .dropDuplicates(["user_id"]).select("user_id"))
        q = (stream.writeStream.format("parquet")
             .option("path", str(tmp_path / "out"))
             .option("checkpointLocation", str(tmp_path / "ck"))
             .trigger(availableNow=True).start())
        q.awaitTermination(300)
        progress = q.recentProgress
        assert progress, "no progress recorded"
        metrics = json.dumps([p["stateOperators"] for p in progress])
        assert "rocksdb" in metrics.lower()
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)

    from light_etl_windows_container_poc_spark.catalog import load_tables
    exact = (load_tables(spark, sf_dir, ("events",))["events"]
             .select("user_id").distinct().count())
    got = spark.read.parquet(str(tmp_path / "out"))
    assert got.count() == exact
    assert got.distinct().count() == exact


def test_stream_static_join_sees_dim_updates_between_batches(
        spark, tmp_path, sf_dir):
    """The STATIC side of a stream-static join is re-read per
    micro-batch: a dimension row added between two availableNow runs
    enriches the second run's events without restarting anything — how
    slowly-changing dims stay fresh under a long-lived stream."""
    import os

    from pyspark.sql import functions as F

    src = str(tmp_path / "src")
    dim_p = str(tmp_path / "dim")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ck")
    os.makedirs(src)

    def drop_events(name, uids):
        (spark.createDataFrame([(u,) for u in uids], "user_id long")
         .write.parquet(f"{src}/{name}"))

    def run():
        stream = (spark.readStream.schema("user_id long")
                  .option("recursiveFileLookup", "true").parquet(src))
        dim = spark.read.parquet(dim_p)
        q = (stream.join(F.broadcast(dim), "user_id", "left")
             .writeStream.format("parquet")
             .option("path", out).option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(300)

    spark.createDataFrame([(1, "alpha")], "user_id long, label string") \
        .write.parquet(dim_p)
    drop_events("b1", [1, 2])
    run()

    # dim gains user 2 between runs; only NEW events see it
    spark.createDataFrame([(2, "beta")], "user_id long, label string") \
        .write.mode("append").parquet(dim_p)
    drop_events("b2", [1, 2])
    run()

    rows = [(r["user_id"], r["label"] or "")
            for r in spark.read.parquet(out).collect()]
    assert sorted(rows) == [(1, "alpha"), (1, "alpha"),
                            (2, ""), (2, "beta")]
