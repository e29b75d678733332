"""Streaming observability: per-micro-batch metrics as a queryable
relation.

The reference keeps per-file processing stats in `etl_processing_log`
and serves `get_processing_stats` over it (tasks_postgres.py:237-263).
Structured Streaming already EMITS the equivalent signal — per-batch
progress events — but only to logs; this listener captures them into a
bounded in-memory buffer and exposes them as a DataFrame, so the same
stats queries (`etl_processing_stats`) run over stream health: rows per
batch, batch duration, input/processed rates, watermark progress.

Driver-side only and O(buffer) memory — progress events are tiny JSON,
one per micro-batch, never data-sized. For durable history, point
`to_df(...).write` at the warehouse like any other relation.
"""

from __future__ import annotations

import json
from collections import deque

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQueryListener

_SCHEMA = ("query_id string, run_id string, batch_id long, "
           "timestamp string, num_input_rows long, "
           "input_rows_per_second double, process_rows_per_second double, "
           "batch_duration_ms long, watermark string")


class ProgressCapture(StreamingQueryListener):
    """Buffering listener. Register with
    ``spark.streams.addListener(cap)``; remove with
    ``spark.streams.removeListener(cap)`` when done (tests do)."""

    def __init__(self, max_events: int = 1000):
        self.events: deque = deque(maxlen=max_events)

    # StreamingQueryListener contract
    def onQueryStarted(self, event) -> None:
        pass

    def onQueryProgress(self, event) -> None:
        p = json.loads(event.progress.json)
        dur = (p.get("durationMs") or {}).get("triggerExecution")

        def s(v):  # absent → real NULL, never the string "None"
            return None if v is None else str(v)

        self.events.append((
            s(p.get("id")), s(p.get("runId")),
            int(p.get("batchId", -1)), s(p.get("timestamp")),
            int(p.get("numInputRows", 0) or 0),
            float(p.get("inputRowsPerSecond", 0.0) or 0.0),
            float(p.get("processedRowsPerSecond", 0.0) or 0.0),
            int(dur) if dur is not None else None,
            s((p.get("eventTime") or {}).get("watermark"))))

    def onQueryIdle(self, event) -> None:
        pass

    def onQueryTerminated(self, event) -> None:
        pass

    def to_df(self, spark: SparkSession) -> DataFrame:
        """The captured progress events as a relation (empty-safe)."""
        return spark.createDataFrame(list(self.events), _SCHEMA)


def stream_health_summary(progress_df: DataFrame) -> DataFrame:
    """`get_processing_stats` parity over stream progress: per query —
    batches, total rows, avg batch duration, max batch rows."""
    from pyspark.sql import functions as F

    return (progress_df.groupBy("query_id")
            .agg(F.count(F.lit(1)).cast("long").alias("n_batches"),
                 F.sum("num_input_rows").cast("long").alias("total_rows"),
                 F.round(F.avg("batch_duration_ms"), 1)
                 .alias("avg_batch_ms"),
                 F.max("num_input_rows").cast("long")
                 .alias("max_batch_rows"))
            .orderBy("query_id"))
