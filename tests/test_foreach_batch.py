"""Streaming MERGE via foreachBatch: the standard upsert-sink shape when
the warehouse format has no native MERGE (parquet). Each micro-batch
anti-joins the existing keys and appends only new ones — idempotent under
replay, which is what checkpoint recovery requires."""

import pathlib

from pyspark.sql import functions as F

from light_etl_windows_container_poc_spark.queries.streaming_q import \
    _events_stream


def test_foreach_batch_upsert_is_idempotent(spark, sf_dir, tmp_path):
    from light_etl_windows_container_poc_spark.catalog import load_tables

    target = str(tmp_path / "user_dim")
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    # seed the dimension with a subset that the stream will also deliver
    seed = (ev.select("user_id").distinct().filter(F.col("user_id") < 10))
    seed.write.parquet(target)

    def upsert(batch, _bid):
        s = batch.sparkSession
        new = batch.select("user_id").dropDuplicates(["user_id"])
        if pathlib.Path(target).exists():
            existing = s.read.parquet(target).select("user_id")
            new = new.join(existing, "user_id", "left_anti")
        new.write.mode("append").parquet(target)

    stream = _events_stream(spark, sf_dir).select("user_id")
    q = (stream.writeStream.foreachBatch(upsert)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(300)

    final = spark.read.parquet(target)
    exact = ev.select("user_id").distinct().count()
    assert final.count() == exact                      # no drops
    assert final.distinct().count() == final.count()   # no duplicate keys
