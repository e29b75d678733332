"""Incremental file watcher — Structured Streaming file source.

The reference polls a directory tree every N seconds, keeps an mtime dict,
and skips files seen before (`pattern_based_cleaner_watcher.py:236-314`).
Structured Streaming's file source IS that loop, minus the hand-rolled
state: the checkpoint tracks processed files exactly-once, `maxFilesPer
Trigger` paces ingestion, and pattern routing happens on
`input_file_name()` inside the stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.routing import PatternRouter


def watch_csv_dir(spark: SparkSession, input_dir: str, schema_ddl: str,
                  router: PatternRouter | None = None,
                  max_files_per_trigger: int = 1000) -> DataFrame:
    """Streaming DataFrame of newly-arrived CSV rows, pattern-routed.

    Only files that appear AFTER the checkpoint was created are processed
    (the reference's "record existing files, process only NEW" semantics).
    Route → writeStream.foreachBatch(append per table) completes the flow;
    tests drive it with trigger(availableNow=True) + a memory sink.
    """
    router = router or PatternRouter()
    stream = (spark.readStream.schema(schema_ddl)
              .option("header", True)
              .option("maxFilesPerTrigger", max_files_per_trigger)
              .csv(input_dir + "/**", pathGlobFilter="*.csv"))
    routed = stream.withColumn("source_path", F.input_file_name())
    return router.route(routed, path_col="source_path")
