"""Streaming incremental dedup: the persisted signature index
(`operators/incremental.py`) consumed from a Structured Streaming
source via foreachBatch — the pipeline form of new-batch-vs-history
dedup (documents arrive continuously; each micro-batch is checked
against everything kept before it and the survivors land in the
training corpus).

Exactly-once shape: the micro-batch id is threaded through as the
index ``batch_tag`` (the probe excludes the current tag, so a crashed
batch's replay sees pre-crash history and reproduces identical
decisions) and the kept-rows output is written to a per-batch
directory with overwrite — replaying batch N rewrites
``out_dir/batch_id=N`` byte-for-byte instead of appending duplicates.
This is the (stream_key, batch_id) replay-dedup contract the
streaming DB sink (`streaming/sinks.py`) established, applied to a
parquet corpus sink.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def incremental_dedup_batch_handler(index_dir: str, out_dir: str,
                                    id_col: str = "doc_id",
                                    text_col: str = "text",
                                    method: str = "exact",
                                    **minhash_kw,
                                    ) -> Callable[[DataFrame, int], None]:
    """foreachBatch function: dedup the micro-batch against the index
    (``method`` = "exact" | "minhash"), append kept docs to the index,
    and write the kept ROWS (all source columns) to
    ``out_dir/batch_id=N/``."""
    from ..operators.incremental import (incremental_exact_dedup,
                                         incremental_minhash_dedup)

    def handle(batch: DataFrame, batch_id: int) -> None:
        if method == "exact":
            dec = incremental_exact_dedup(batch, id_col, text_col,
                                          index_dir, batch_tag=batch_id)
        elif method == "minhash":
            dec = incremental_minhash_dedup(batch, id_col, text_col,
                                            index_dir, batch_tag=batch_id,
                                            **minhash_kw)
        else:
            raise ValueError(f"unknown dedup method {method!r}")
        kept_ids = (dec.filter(F.col("keep") == 1)
                    .select(F.col(id_col)))
        kept = batch.join(kept_ids, id_col)
        (kept.write.mode("overwrite")
         .parquet(os.path.join(out_dir, f"batch_id={batch_id}")))

    return handle


def start_incremental_dedup_stream(stream: DataFrame, index_dir: str,
                                   out_dir: str, checkpoint_dir: str,
                                   id_col: str = "doc_id",
                                   text_col: str = "text",
                                   method: str = "exact",
                                   available_now: bool = True,
                                   **minhash_kw) -> StreamingQuery:
    """Wire any streaming DataFrame of documents into the incremental
    dedup handler. The checkpoint gives at-least-once micro-batches;
    the batch_tag + per-batch overwrite make the effect exactly-once."""
    writer = (stream.writeStream
              .foreachBatch(incremental_dedup_batch_handler(
                  index_dir, out_dir, id_col, text_col, method,
                  **minhash_kw))
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_deduped_corpus(spark: SparkSession, out_dir: str) -> DataFrame:
    """The kept corpus across all completed batches (the batch_id
    partition column is exposed for lineage)."""
    return spark.read.option("basePath", out_dir).parquet(
        os.path.join(out_dir, "batch_id=*"))
