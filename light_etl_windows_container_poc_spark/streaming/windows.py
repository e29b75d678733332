"""Streaming aggregations: watermarked windows + custom stateful op.

Batch twins of these live in queries/temporal.py (time_window_agg,
sessionize) and are oracle-checked; these streaming forms are exercised by
tests with availableNow triggers + memory sinks.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def windowed_event_counts(events: DataFrame,
                          window: str = "1 hour",
                          watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling-window counts/sums per event_type.

    The watermark bounds state: late events beyond it are dropped, so
    state size is O(active windows), not O(stream length) — the property
    that keeps this runnable forever on an unbounded 100 TB/day stream.
    """
    return (events
            .withWatermark("ts", watermark)
            .groupBy(F.window("ts", window), "event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.sum("value"), 2).alias("total_value"))
            .select(F.col("window.start").alias("window_start"),
                    F.col("window.end").alias("window_end"),
                    "event_type", "n", "total_value"))


def stateful_running_max(events: DataFrame) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: running max of
    `value` per user across micro-batches (state = one float per key)."""

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        current = state.get[0] if state.exists else float("-inf")
        n = 0
        for pdf in pdfs:
            if len(pdf):
                current = max(current, float(pdf["value"].max()))
                n += len(pdf)
        state.update((current,))
        yield pd.DataFrame({"user_id": [key[0]], "running_max": [current],
                            "batch_rows": [n]})

    return (events.groupBy("user_id")
            .applyInPandasWithState(
                fn,
                outputStructType="user_id long, running_max double, batch_rows long",
                stateStructType="mx double",
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout))


ROCKSDB_PROVIDER = ("org.apache.spark.sql.execution.streaming.state."
                    "RocksDBStateStoreProvider")


def use_rocksdb_state(spark) -> None:
    """Switch stateful streaming to the RocksDB state store for queries
    started AFTER this call (the provider is read per query at start).

    This is the state-scale lever: the default HDFS-backed provider
    holds every key in executor heap, so watermark-bounded state that
    fits at test SF OOMs when a 100 TB/day stream carries hundreds of
    millions of live keys; RocksDB keeps working set on local disk with
    changelog checkpointing. Results are provider-independent — the
    test asserts the streaming output matches the batch oracle under
    RocksDB exactly as it does under the default store."""
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
                   ROCKSDB_PROVIDER)
