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

Promoted to @query in round 14, exactly as the r13 close planned: the
gate tests in tests/test_breadth45.py had already run the EXACT
driver-replica compare at all three SFs in r13, so promotion is only
the decorator + the queries/__init__ import.

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
from .registry import cert_work_dir, query

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


@query("substring_incremental_cert", oracle=SUBSTRING_INCREMENTAL_ORACLE)
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


# --------------------------------------------------------------------------
# Takedown + vacuum under the driver hash: probe the SAME batch three
# times — phase 0 against full history, phase 1 after tombstoning the
# doc_id % 5 == 0 slice of history, phase 2 after vacuum. Phase 1 must
# show tombstoned docs' exclusive spans unmarked while spans shared
# with live history docs keep marking; phase 2's rows must EQUAL
# phase 1's (vacuum decision-invariance certified by hash equality of
# the two phases inside one result). The oracle replays each phase's
# history gram set directly (phase >= 1 simply excludes the tombstoned
# docs from the history slice — per-doc state rows make that the
# correct semantics on the Spark side too).
# --------------------------------------------------------------------------
SUBSTRING_TAKEDOWN_ORACLE = """
WITH t0 AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(text), '\\s+'),
                     x -> x <> '') AS w
  FROM documents
),
wins AS (
  SELECT doc_id, pos, array_to_string(w[pos:pos+19], ' ') AS win
  FROM (SELECT doc_id, w, unnest(range(1, len(w) - 18)) AS pos FROM t0)
),
histg0 AS (SELECT DISTINCT win FROM wins WHERE doc_id % 3 <> 0),
histg1 AS (SELECT DISTINCT win FROM wins
           WHERE doc_id % 3 <> 0 AND doc_id % 5 <> 0),
bw AS (SELECT doc_id, pos, win FROM wins WHERE doc_id % 3 = 0),
selfdup AS (
  SELECT doc_id, pos FROM (
    SELECT doc_id, pos, count(*) OVER (PARTITION BY win) AS c FROM bw)
  WHERE c >= 2
),
phases AS (SELECT unnest(range(0, 3)) AS phase),
marked AS (
  SELECT p.phase, b.doc_id, b.pos,
         CASE WHEN p.phase = 0 THEN h0.win IS NOT NULL
              ELSE h1.win IS NOT NULL END AS hist_hit,
         s.pos IS NOT NULL AS self_hit
  FROM bw b CROSS JOIN phases p
  LEFT JOIN histg0 h0 ON b.win = h0.win
  LEFT JOIN histg1 h1 ON b.win = h1.win
  LEFT JOIN selfdup s ON b.doc_id = s.doc_id AND b.pos = s.pos
),
hit AS (SELECT phase, doc_id, pos FROM marked
        WHERE hist_hit OR self_hit),
isl AS (
  SELECT phase, doc_id, pos,
         CASE WHEN pos > coalesce(max(pos + 20) OVER (
                PARTITION BY phase, doc_id ORDER BY pos
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
              THEN 1 ELSE 0 END AS new_isl
  FROM hit
),
grp AS (
  SELECT phase, doc_id, pos,
         sum(new_isl) OVER (PARTITION BY phase, doc_id
                            ORDER BY pos) AS g
  FROM isl
),
spans AS (
  SELECT phase, doc_id, min(pos) AS s, max(pos) + 20 AS e
  FROM grp GROUP BY phase, doc_id, g
),
b AS (SELECT doc_id, w FROM t0 WHERE doc_id % 3 = 0),
tokpos AS (
  SELECT p.phase, tp.doc_id, tp.pos, tp.tok
  FROM (SELECT doc_id, pos, w[pos] AS tok
        FROM (SELECT doc_id, w, unnest(range(1, len(w) + 1)) AS pos
              FROM b)) tp
  CROSS JOIN phases p
),
kept AS (
  SELECT tp.phase, tp.doc_id, tp.pos, tp.tok
  FROM tokpos tp LEFT JOIN spans s
    ON tp.phase = s.phase AND tp.doc_id = s.doc_id
   AND tp.pos >= s.s AND tp.pos < s.e
  WHERE s.doc_id IS NULL
)
SELECT b.doc_id,
       CAST(p.phase AS BIGINT) AS phase,
       CAST(len(b.w) AS BIGINT) AS n_tokens,
       CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept,
       coalesce(k.txt, '') AS kept_text,
       CAST(coalesce(m.hist_starts, 0) AS BIGINT) AS hist_starts,
       CAST(coalesce(m.batch_starts, 0) AS BIGINT) AS batch_starts
FROM b CROSS JOIN phases p
LEFT JOIN (SELECT phase, doc_id, count(*) AS n_kept,
                  string_agg(tok, ' ' ORDER BY pos) AS txt
           FROM kept GROUP BY phase, doc_id) k
  ON b.doc_id = k.doc_id AND p.phase = k.phase
LEFT JOIN (SELECT phase, doc_id,
                  sum(CASE WHEN hist_hit THEN 1 ELSE 0 END)
                    AS hist_starts,
                  sum(CASE WHEN self_hit THEN 1 ELSE 0 END)
                    AS batch_starts
           FROM marked GROUP BY phase, doc_id) m
  ON b.doc_id = m.doc_id AND p.phase = m.phase
ORDER BY p.phase, b.doc_id
"""


@query("substring_takedown_cert", oracle=SUBSTRING_TAKEDOWN_ORACLE)
def substring_takedown_cert(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """Build windows/ from history, probe the batch pre-takedown, after
    tombstoning the doc_id % 5 == 0 history slice, and after vacuum —
    three phases of the same probe in one hashed relation (phase 2 ==
    phase 1 is the vacuum-invariance theorem, certified by equality
    inside the hash)."""
    from ..operators.incremental_substring import (
        tombstone_substring_docs,
        vacuum_substring_tombstones,
    )

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    work = cert_work_dir("stkd", sf_dir)
    shutil.rmtree(work, ignore_errors=True)
    try:
        idx = os.path.join(work, "idx")
        hist = docs.filter(F.col("doc_id") % 3 != 0)
        batch = docs.filter(F.col("doc_id") % 3 == 0)
        build_substring_index(hist, _N, idx)

        def probe(phase: int) -> DataFrame:
            r = incremental_substring_dedup(batch, _N, idx,
                                            update_index=False)
            return r.withColumn("phase", F.lit(phase).cast("long"))

        p0 = probe(0).localCheckpoint(eager=True)
        tombstone_substring_docs(
            hist.filter(F.col("doc_id") % 5 == 0).select("doc_id"),
            "doc_id", idx)
        p1 = probe(1).localCheckpoint(eager=True)
        vacuum_substring_tombstones(spark, idx)
        p2 = probe(2)
        out = (p0.unionByName(p1).unionByName(p2)
               .select(F.col("id").alias("doc_id"), "phase", "n_tokens",
                       "n_kept", "kept_text", "hist_starts",
                       "batch_starts")
               .orderBy("phase", "doc_id"))
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)
