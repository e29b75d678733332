"""Streaming weighted-reservoir maintenance: the Efraimidis-Spirakis
weighted sample of queries/breadth29.weighted_sample kept fresh from a
Structured Streaming source via foreachBatch — a training-data pipeline
maintains a quality- or length-weighted sample of everything ingested
so far without ever re-scanning history.

Priority is deterministic (the dsir micro-rounded-ln contract:
lu_micro = round(1e6·ln((h+1)/2^32)) from the md5 bridge, ranking key
lu_micro/w — one IEEE division of exact integers), so the sample is a
pure function of the corpus and the same top-k subset theorem that
makes KMV's merge exact applies verbatim:

    topk(A ∪ B) == topk(topk(A) ∪ topk(B))

— a row in the union's top-k is preceded by fewer than k union rows,
hence by fewer than k rows of its own batch, so it survives its batch's
truncation. Per-batch ≤ k-row partials therefore merge at read time
into CELL-FOR-CELL the one-shot sample (hashed against the direct
weighted_sample oracle in queries/breadth39), and replay is
structurally idempotent on top of the overwrite-by-batch_tag protocol.

State/replay/compaction contracts are shared with heavy_hitters.py
(whose module docstring is the full specification). One publication
protocol, now eight sketch payloads.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from .heavy_hitters import live_partial_dirs

_SCHEMA = "doc_id long, w long, lu_micro long"


def _priority():
    return F.col("lu_micro").cast("double") / F.col("w")


def reservoir_candidates(docs: DataFrame) -> DataFrame:
    """(doc_id, w, lu_micro) for every document — weight = text length,
    priority material from the md5 bridge (weighted_sample's exact
    construction)."""
    h = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8),
               16, 10).cast("long")
    d = docs.select("doc_id", F.length("text").cast("long").alias("w"),
                    h.alias("h"))
    lu = F.round(1_000_000 * F.log((F.col("h") + 1) / F.lit(4294967296.0)))
    return d.select("doc_id", "w", lu.cast("long").alias("lu_micro"))


def reservoir_topk(cands: DataFrame, k: int) -> DataFrame:
    """Top-k by priority (desc, doc_id tiebreak) — orderBy+limit
    compiles to TakeOrderedAndProject: per-partition top-k + driver
    merge, never a global sort."""
    return cands.orderBy(_priority().desc(), "doc_id").limit(k)


def reservoir_batch_handler(state_dir: str,
                            k: int) -> Callable[[DataFrame, int], None]:
    """foreachBatch function: land the micro-batch's own ≤ k-row
    truncated sample under its batch_tag."""

    def handle(batch: DataFrame, batch_id: int) -> None:
        (reservoir_topk(reservoir_candidates(batch), k)
         .write.mode("overwrite")
         .parquet(os.path.join(state_dir, f"batch_tag={batch_id}")))

    return handle


def start_reservoir_stream(stream: DataFrame, state_dir: str,
                           checkpoint_dir: str, k: int) -> StreamingQuery:
    return (stream.writeStream
            .foreachBatch(reservoir_batch_handler(state_dir, k))
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())


def read_reservoir(spark: SparkSession, state_dir: str,
                   k: int) -> DataFrame:
    """The merged sample over everything ingested so far — by the
    top-k subset theorem, cell-identical to the one-shot weighted
    sample of the union of all landed batches."""
    dirs = live_partial_dirs(state_dir)
    if not dirs:
        return spark.createDataFrame([], _SCHEMA)
    paths = [os.path.join(state_dir, d) for d in dirs]
    rows = spark.read.schema(_SCHEMA).parquet(*paths).distinct()
    return reservoir_topk(rows, k)


def compact_reservoir_state(spark: SparkSession, state_dir: str,
                            k: int) -> None:
    """Fold live partials into one ≤ k-row generation via the shared
    manifest protocol (heavy_hitters.compact_via_manifest;
    answer-invariant by the top-k subset theorem)."""
    from .heavy_hitters import compact_via_manifest

    def merge(live: list[str]) -> DataFrame:
        paths = [os.path.join(state_dir, d) for d in live]
        return reservoir_topk(
            spark.read.schema(_SCHEMA).parquet(*paths).distinct(), k)

    compact_via_manifest(state_dir, merge)
