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


def test_upsert_sink_surfaces_corrupt_target(spark, tmp_path):
    """r13 verdict: the upsert's bootstrap except used to swallow EVERY
    read error, silently degrading insert-if-absent to blind append. A
    target directory holding unreadable parquet must now raise; only
    path-missing / not-yet-readable bootstraps are tolerated."""
    import pytest

    from light_etl_windows_container_poc_spark.streaming.sinks import \
        parquet_upsert_sink

    target = tmp_path / "t"
    target.mkdir()
    (target / "part-00000.parquet").write_bytes(b"not a parquet file")
    sink = parquet_upsert_sink(str(target), ["id"])
    with pytest.raises(Exception) as ei:
        sink(spark.range(3).selectExpr("id", "id * 2 as v"), 0)
    assert "PATH_NOT_FOUND" not in str(ei.value)

    # missing target still bootstraps cleanly, and replay is idempotent
    fresh = str(tmp_path / "fresh")
    sink2 = parquet_upsert_sink(fresh, ["id"])
    batch = spark.range(3).selectExpr("id", "id * 2 as v")
    sink2(batch, 0)
    sink2(batch, 0)
    assert spark.read.parquet(fresh).count() == 3
