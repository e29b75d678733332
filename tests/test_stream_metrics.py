"""Streaming progress capture (`streaming.metrics`): per-batch metrics
land in a queryable relation and the health summary aggregates them."""

from __future__ import annotations

import time

from light_etl_windows_container_poc_spark.streaming.metrics import (
    ProgressCapture, stream_health_summary)


def test_progress_capture_and_health_summary(spark, sf_dir, tmp_path):
    from light_etl_windows_container_poc_spark.queries.streaming_q import \
        _events_stream

    cap = ProgressCapture()
    spark.streams.addListener(cap)
    try:
        q = (_events_stream(spark, sf_dir).select("user_id", "value")
             .writeStream.format("parquet")
             .option("path", str(tmp_path / "out"))
             .option("checkpointLocation", str(tmp_path / "ck"))
             .trigger(availableNow=True).start())
        q.awaitTermination(300)
        # listener delivery is async — give the bus a moment
        for _ in range(40):
            if cap.events:
                break
            time.sleep(0.25)
    finally:
        spark.streams.removeListener(cap)

    assert cap.events, "no progress events captured"
    df = cap.to_df(spark)
    rows = df.collect()
    assert all(r["batch_id"] >= 0 for r in rows)

    from light_etl_windows_container_poc_spark.catalog import load_tables
    n = load_tables(spark, sf_dir, ("events",))["events"].count()
    total = sum(r["num_input_rows"] for r in rows)
    assert total == n  # every input row accounted across batches

    health = stream_health_summary(df).collect()
    assert len(health) == 1
    assert health[0]["total_rows"] == n
    assert health[0]["n_batches"] == len(rows)
