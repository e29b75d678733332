"""Round-11 head candidates, PRE-certified this round.

The round-10 driver budget is spent (head at its 18-slot ceiling + the
32 mandatory recertifications == 50), so these queries deliberately do
NOT carry the @query decorator yet — registering them would push
mandatory recertify rows out of the driver's 50-slot window. Each ships
with its full DuckDB oracle string and a pytest that runs the EXACT
local-gate compare (tools/check_oracle frame_fingerprint over the
pandas fetch path) at sf0.001, so round 11 turns them into driver rows
by adding the decorator — nothing else.

Contents:
- stream_bm25_cert — the streaming BM25 index maintainer
  (streaming/bm25.py, ninth generation-manifest payload) certified
  end-to-end: documents stream in as 3 files → per-batch postings under
  batch_tag → mid-path COMPACTION through the shared manifest protocol
  → top-k served from the maintained state — hashed against the SAME
  DuckDB oracle as the batch bm25_search query (the certified theorem:
  streamed+compacted serving is row-identical to a batch build).
- salting_advice_cert — the sketch-driven skew advisor
  (operators/scale.py salting_advice) hashed EXACTLY: event_type has
  ≤ 64 distinct values, so the Misra-Gries summary never compresses and
  est == exact count regardless of partitioning — the advised factor is
  a pure function of the table and DuckDB replays it cell-for-cell
  (keys needing factor ≥ 2 at 8-way fair share, with the MG slack term
  ceil(n/64) included exactly as the operator computes it).
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_tables
from .breadth14 import bm25_search  # noqa: F401  (registers the oracle twin)
from .registry import ORACLES

_BM25_TERMS = ("spark", "query", "window")

# the certified statement IS bm25_search's: same scoring, same corpus,
# same oracle — only the serving path differs (maintained state, not a
# batch build)
STREAM_BM25_ORACLE = ORACLES["bm25_search"]


def stream_bm25_cert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents stream → per-batch postings → compaction → served
    top-k; row-identical to the batch bm25_search query by the
    disjoint-batch union theorem (streaming/bm25.py module docstring)
    plus compaction answer-invariance."""
    from ..streaming.bm25 import (bm25_topk, compact_bm25_state,
                                  start_bm25_stream)

    docs = (load_tables(spark, sf_dir, ("documents",))["documents"]
            .select("doc_id", "text"))
    h = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    work = os.path.join(tempfile.gettempdir(), f"spark_graft_sbm25_{h}")
    shutil.rmtree(work, ignore_errors=True)
    src = os.path.join(work, "src")
    docs.repartition(3).write.parquet(src)
    stream = (spark.readStream.schema("doc_id long, text string")
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = start_bm25_stream(stream, os.path.join(work, "state"),
                          os.path.join(work, "ckpt"), "doc_id", "text")
    q.awaitTermination(300)
    compact_bm25_state(spark, os.path.join(work, "state"))
    out = bm25_topk(spark, os.path.join(work, "state"), _BM25_TERMS)
    out = out.localCheckpoint(eager=True)
    shutil.rmtree(work, ignore_errors=True)
    return out


SALTING_ADVICE_ORACLE = """
WITH n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM events),
c AS (SELECT event_type AS key, CAST(count(*) AS BIGINT) AS exact_count
      FROM events GROUP BY event_type),
p AS (SELECT c.key, c.exact_count,
             CAST(ceil((c.exact_count + ((n.n + 63) // 64)) * 1.0
                       / ((n.n + 7) // 8)) AS INT) AS factor
      FROM c, n)
SELECT key, factor, exact_count FROM p WHERE factor >= 2 ORDER BY key
"""


def salting_advice_cert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The advisor's exact contract on a ≤ 64-distinct key: MG never
    compresses, est == true count under ANY partitioning, so the
    advised (key, factor) set is deterministic and DuckDB replays it
    cell-for-cell — factor = ceil((count + ceil(n/64)) / ceil(n/8)),
    keys with factor ≥ 2 only, joined back to the exact counts."""
    from ..operators.scale import salting_advice

    events = load_tables(spark, sf_dir, ("events",))["events"]
    df = events.select("event_type")
    advice = salting_advice(df, "event_type", n_partitions=8, k=64)
    exact = (df.groupBy(F.col("event_type").alias("key"))
             .agg(F.count(F.lit(1)).cast("long").alias("exact_count")))
    return (advice.join(exact, "key")
            .select("key", "factor", "exact_count")
            .orderBy("key"))
