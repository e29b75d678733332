"""Streaming sinks built on foreachBatch.

MERGE-less upsert: when the warehouse format has no native MERGE
(parquet), the standard shape is a foreachBatch sink that anti-joins the
target's existing keys and appends only new rows. Idempotent under
micro-batch replay — exactly what checkpoint recovery requires.
(Reference parity: the Postgres writer's append-only contract,
`database_postgres.py:10-44`, lifted to streaming.)
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery


def parquet_upsert_sink(target_path: str,
                        key_cols: list[str]) -> Callable[[DataFrame, int], None]:
    """foreachBatch function: insert-if-absent on ``key_cols`` into a
    parquet table. Each micro-batch dedups itself, anti-joins the target's
    existing keys, and appends the remainder — a replayed batch finds its
    keys already present and appends nothing."""

    def upsert(batch: DataFrame, _batch_id: int) -> None:
        spark = batch.sparkSession
        new = batch.dropDuplicates(key_cols)
        try:
            existing = spark.read.parquet(target_path).select(*key_cols)
            new = new.join(existing, key_cols, "left_anti")
        except Exception:
            pass  # first batch: target does not exist yet
        new.write.mode("append").parquet(target_path)

    return upsert


def start_upsert_stream(stream: DataFrame, target_path: str,
                        key_cols: list[str],
                        checkpoint_dir: str,
                        available_now: bool = True) -> StreamingQuery:
    """Wire a streaming DataFrame into the upsert sink with a checkpoint.
    ``available_now=True`` drains the current backlog and stops (batch-mode
    test/driver shape); False runs continuously."""
    writer = (stream.writeStream.foreachBatch(
        parquet_upsert_sink(target_path, key_cols))
        .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
