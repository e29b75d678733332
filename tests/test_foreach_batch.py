"""Streaming MERGE via foreachBatch — exercises the LIBRARY sink
(`streaming.sinks.parquet_upsert_sink` / `start_upsert_stream`): each
micro-batch anti-joins the existing keys and appends only new ones —
idempotent under replay, which is what checkpoint recovery requires."""

from pyspark.sql import functions as F

from light_etl_windows_container_poc_spark.queries.streaming_q import \
    _events_stream
from light_etl_windows_container_poc_spark.streaming import \
    start_upsert_stream


def test_foreach_batch_upsert_is_idempotent(spark, sf_dir, tmp_path):
    from light_etl_windows_container_poc_spark.catalog import load_tables

    target = str(tmp_path / "user_dim")
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    # seed the dimension with a subset that the stream will also deliver
    seed = (ev.select("user_id").distinct().filter(F.col("user_id") < 10))
    seed.write.parquet(target)

    stream = _events_stream(spark, sf_dir).select("user_id")
    q = start_upsert_stream(stream, target, ["user_id"],
                            checkpoint_dir=str(tmp_path / "ckpt"))
    q.awaitTermination(300)

    final = spark.read.parquet(target)
    exact = ev.select("user_id").distinct().count()
    assert final.count() == exact                      # no drops
    assert final.distinct().count() == final.count()   # no duplicate keys


def test_upsert_stream_restart_appends_nothing(spark, sf_dir, tmp_path):
    """A second availableNow run over the same source (fresh checkpoint →
    full replay) must not duplicate keys."""
    target = str(tmp_path / "user_dim2")
    stream = _events_stream(spark, sf_dir).select("user_id")
    q = start_upsert_stream(stream, target, ["user_id"],
                            checkpoint_dir=str(tmp_path / "ckpt_a"))
    q.awaitTermination(300)
    n1 = spark.read.parquet(target).count()

    q2 = start_upsert_stream(stream, target, ["user_id"],
                             checkpoint_dir=str(tmp_path / "ckpt_b"))
    q2.awaitTermination(300)
    final = spark.read.parquet(target)
    assert final.count() == n1
    assert final.distinct().count() == n1
