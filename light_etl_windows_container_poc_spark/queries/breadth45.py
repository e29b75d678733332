"""Round-14 head candidate, pre-certified: the incremental substring
dedup lifecycle (operators/incremental_substring.py) under the driver
hash.

``substring_incremental_cert`` partitions the documents table into a
history slice (doc_id % 3 != 0) and two id-disjoint arrival batches
(doc_id % 3 == 0, split on doc_id % 2), then runs the REAL lifecycle in
a scratch index: build the windows/ fingerprint state from history,
probe batch 1 (whose append becomes history), probe batch 2. Output =
one row per batch doc: strip results + the split hit evidence
(hist_starts / batch_starts). Certifying batch 2 certifies the APPEND
path end to end — its history hits include spans seen only in batch 1.

The DuckDB oracle is an INDEPENDENT algorithm over materialized
20-gram strings (fine at oracle SF): label every window 0/1/2
(history / batch 1 / batch 2); a batch window is a history hit iff the
same gram appears under ANY smaller label (batches append AS INGESTED,
so batch 1's original text is batch 2's history), and a within-batch
hit iff its own label holds the gram >= 2 times. Agreement certifies
the Merkle fingerprint chain, the state probe, and the append
discipline in one hash.

Deliberately NOT decorated with @query: the r13 driver budget is spent
(3 promoted heads + 47 mandatory recertifications == 50). The gate
tests in tests/test_breadth45.py run the EXACT driver-replica compare
at all three SFs, so r14 promotes it by adding the decorator — nothing
else.

Reference scope: the reference has no substring dedup (its dedup is
row-exact, dataframe_tasks.py drop_duplicates); this certifies the
incremental form of the SURVEY §2.3 Lee-et-al tier.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_tables
from ..operators.incremental_substring import (
    build_substring_index,
    incremental_substring_dedup,
)
from .registry import cert_work_dir

_N = 20

SUBSTRING_INCREMENTAL_ORACLE = """
WITH t0 AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 <> 0 THEN 0
              WHEN doc_id % 2 = 0 THEN 1 ELSE 2 END AS lab,
         list_filter(string_split_regex(trim(text), '\\s+'),
                     x -> x <> '') AS w
  FROM documents
),
wins AS (
  SELECT doc_id, lab, pos, array_to_string(w[pos:pos+19], ' ') AS win
  FROM (SELECT doc_id, lab, w, unnest(range(1, len(w) - 18)) AS pos
        FROM t0)
),
winstats AS (SELECT win, lab, count(*) AS c FROM wins GROUP BY win, lab),
marked AS (
  SELECT w.doc_id, w.pos,
         max(CASE WHEN s.lab < w.lab THEN 1 ELSE 0 END) AS hist_hit,
         max(CASE WHEN s.lab = w.lab AND s.c >= 2 THEN 1 ELSE 0 END)
           AS self_hit
  FROM wins w JOIN winstats s USING (win)
  WHERE w.lab > 0
  GROUP BY w.doc_id, w.pos
),
hit AS (SELECT doc_id, pos FROM marked
        WHERE hist_hit = 1 OR self_hit = 1),
isl AS (
  SELECT doc_id, pos,
         CASE WHEN pos > coalesce(max(pos + 20) OVER (
                PARTITION BY doc_id ORDER BY pos
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
              THEN 1 ELSE 0 END AS new_isl
  FROM hit
),
grp AS (
  SELECT doc_id, pos,
         sum(new_isl) OVER (PARTITION BY doc_id ORDER BY pos) AS g
  FROM isl
),
spans AS (
  SELECT doc_id, min(pos) AS s, max(pos) + 20 AS e
  FROM grp GROUP BY doc_id, g
),
b AS (SELECT doc_id, lab, w FROM t0 WHERE lab > 0),
tokpos AS (
  SELECT doc_id, pos, w[pos] AS tok
  FROM (SELECT doc_id, w, unnest(range(1, len(w) + 1)) AS pos FROM b)
),
kept AS (
  SELECT tp.doc_id, tp.pos, tp.tok
  FROM tokpos tp LEFT JOIN spans s
    ON tp.doc_id = s.doc_id AND tp.pos >= s.s AND tp.pos < s.e
  WHERE s.doc_id IS NULL
)
SELECT b.doc_id,
       CAST(b.lab AS BIGINT) AS batch,
       CAST(len(b.w) AS BIGINT) AS n_tokens,
       CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept,
       coalesce(k.txt, '') AS kept_text,
       CAST(coalesce(m.hist_starts, 0) AS BIGINT) AS hist_starts,
       CAST(coalesce(m.batch_starts, 0) AS BIGINT) AS batch_starts
FROM b
LEFT JOIN (SELECT doc_id, count(*) AS n_kept,
                  string_agg(tok, ' ' ORDER BY pos) AS txt
           FROM kept GROUP BY doc_id) k ON b.doc_id = k.doc_id
LEFT JOIN (SELECT doc_id,
                  sum(hist_hit) AS hist_starts,
                  sum(self_hit) AS batch_starts
           FROM marked GROUP BY doc_id) m ON b.doc_id = m.doc_id
ORDER BY b.doc_id
"""


def substring_incremental_cert(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Build windows/ from the history slice, probe two arrival batches
    sequentially (batch 1's append is batch 2's history), return every
    batch doc's strip + hit evidence. The scratch index lives in a
    cert_work_dir and is removed either way."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    work = cert_work_dir("sinc", sf_dir)
    shutil.rmtree(work, ignore_errors=True)
    try:
        idx = os.path.join(work, "idx")
        hist = docs.filter(F.col("doc_id") % 3 != 0)
        b1 = docs.filter((F.col("doc_id") % 3 == 0)
                         & (F.col("doc_id") % 2 == 0))
        b2 = docs.filter((F.col("doc_id") % 3 == 0)
                         & (F.col("doc_id") % 2 == 1))
        build_substring_index(hist, _N, idx)
        r1 = incremental_substring_dedup(b1, _N, idx, batch_tag=1)
        r2 = incremental_substring_dedup(b2, _N, idx, batch_tag=2)
        out = (r1.withColumn("batch", F.lit(1).cast("long"))
               .unionByName(r2.withColumn("batch", F.lit(2).cast("long")))
               .select(F.col("id").alias("doc_id"), "batch", "n_tokens",
                       "n_kept", "kept_text", "hist_starts", "batch_starts")
               .orderBy("doc_id"))
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)
