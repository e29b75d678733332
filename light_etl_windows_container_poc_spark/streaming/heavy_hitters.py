"""Streaming heavy hitters: the Misra-Gries summary
(`operators/sketches.py`) maintained from a Structured Streaming
source via foreachBatch — the frequency-monitoring loop a 100 TB
ingest runs continuously ("which domains/tokens dominate today's
arrivals") without ever keeping |distinct| state.

State shape: each micro-batch writes its <= partitions*k-row partial
summary to ``state_dir/batch_tag=N/`` with OVERWRITE — replaying a
crashed batch rewrites its partition byte-for-byte instead of
double-counting (the per-batch-directory replay contract of
streaming/incremental_dedup.py). Queries merge all partials with the
mergeable-summaries rule at read time; ``compact_state`` folds history
into a single <= k-row summary (storage sweep — the merge is
associative, so compaction cannot change any downstream answer's
guarantees). The MG bounds (est <= true, deficit <= n/(k+1),
heavy => present) hold for ANY merge tree over the partials, which is
what makes the read-time merge and the compacted form
interchangeable.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

_SCHEMA = "token string, est long"


def heavy_hitters_batch_handler(state_dir: str, col: str, k: int,
                                ) -> Callable[[DataFrame, int], None]:
    """foreachBatch function: summarize the micro-batch with k MG
    counters per partition and land the partial under its batch_tag."""
    from ..operators.sketches import mg_partial_summaries

    def handle(batch: DataFrame, batch_id: int) -> None:
        part = mg_partial_summaries(batch.select(col), col, k)
        (part.write.mode("overwrite")
         .parquet(os.path.join(state_dir, f"batch_tag={batch_id}")))

    return handle


def start_heavy_hitters_stream(stream: DataFrame, state_dir: str,
                               checkpoint_dir: str, col: str, k: int,
                               ) -> StreamingQuery:
    return (stream.writeStream
            .foreachBatch(heavy_hitters_batch_handler(state_dir, col, k))
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())


def read_heavy_hitters(spark: SparkSession, state_dir: str,
                       k: int) -> DataFrame:
    """Global <= k-row summary over everything ingested so far."""
    from ..operators.sketches import mg_merge

    partials = (spark.read.schema(_SCHEMA).parquet(state_dir)
                .select("token", "est"))
    return mg_merge(partials, k)


def compact_state(spark: SparkSession, state_dir: str, k: int) -> None:
    """Fold all per-batch partials into one summary directory (written
    under a reserved tag, other tags removed). Atomicity note: the
    sweep stages the merged summary first and removes old tags after —
    a crash between the two leaves EXTRA partials, which only tightens
    estimates on re-merge, never corrupts them (merge associativity)."""
    import shutil

    merged = read_heavy_hitters(spark, state_dir, k)
    staged = os.path.join(state_dir, "_compact_staging")
    merged.write.mode("overwrite").parquet(staged)
    for d in os.listdir(state_dir):
        if d.startswith("batch_tag="):
            shutil.rmtree(os.path.join(state_dir, d))
    os.rename(staged, os.path.join(state_dir, "batch_tag=compacted"))
