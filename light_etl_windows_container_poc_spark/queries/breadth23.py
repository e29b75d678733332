"""Round-5 breadth, eleventh wave: decontaminated train splits (the
action contamination-measurement exists to drive), user-journey trigram
mining, and daily percentile bands.

Determinism: the split is the md5 contract split_train_test certifies;
shingle membership is exact set logic; journey order is the total
(ts, event_id) order; percentiles follow the agg_median interpolation
contract on exact cents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_tables
from ..functions.texts import word_shingles
from .registry import query

_SPLIT_SQL = """
  SELECT doc_id,
         CASE WHEN CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)
                                           || 'split'), 1, 6)) AS BIGINT)
                   % 1000 < 200
              THEN 'test' ELSE 'train' END AS split
  FROM documents
"""

_JOURNEY_TOPK = 25


# --------------------------------------------------------------------------
# Decontaminated split: drop TRAIN documents sharing any 3-word shingle
# with the test set — the action the `contamination` metric exists to
# drive (protect eval integrity by cleaning train, never the reverse).
# --------------------------------------------------------------------------
@query("anti_contamination_split", oracle=f"""
WITH wrds AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '') AS w
  FROM documents
),
idx AS (
  SELECT doc_id, w, unnest(range(1, greatest(len(w) - 1, 1))) AS i FROM wrds
),
sh AS (
  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s FROM idx
),
split AS ({_SPLIT_SQL}),
te AS (SELECT DISTINCT s FROM sh JOIN split USING (doc_id)
       WHERE split = 'test'),
tr AS (SELECT sh.doc_id, sh.s FROM sh JOIN split USING (doc_id)
       WHERE split = 'train'),
hits AS (SELECT tr.doc_id, CAST(count(*) AS BIGINT) AS n_overlap
         FROM tr JOIN te ON tr.s = te.s GROUP BY tr.doc_id),
tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles
        FROM tr GROUP BY doc_id)
SELECT t.doc_id, t.n_shingles,
       CAST(coalesce(h.n_overlap, 0) AS BIGINT) AS n_overlap,
       CAST(coalesce(h.n_overlap, 0) = 0 AS INT) AS keep
FROM tot t LEFT JOIN hits h ON t.doc_id = h.doc_id
ORDER BY t.doc_id
""")
def anti_contamination_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-train-doc shingle overlap with the test set and the resulting
    keep flag. Both sides shuffle on the shingle key only (postings
    join, never doc-pairs); the test shingle set is the df-tail of the
    corpus — broadcastable at any realistic eval-set size."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    split = (F.conv(F.substring(
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("split"))),
        1, 6), 16, 10).cast("long") % 1000 < 200)
    sh = (docs.select("doc_id", split.alias("is_test"),
                      F.explode(word_shingles(F.col("text"), 3)).alias("s")))
    te = (sh.filter(F.col("is_test")).select("s").distinct())
    tr = sh.filter(~F.col("is_test")).select("doc_id", "s")
    tot = tr.groupBy("doc_id").agg(F.count(F.lit(1)).cast("long")
                                   .alias("n_shingles"))
    hits = (tr.join(F.broadcast(te), "s")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).cast("long").alias("n_overlap")))
    return (tot.join(hits, "doc_id", "left")
            .select("doc_id", "n_shingles",
                    F.coalesce("n_overlap", F.lit(0)).cast("long")
                    .alias("n_overlap"),
                    (F.coalesce("n_overlap", F.lit(0)) == 0).cast("int")
                    .alias("keep"))
            .orderBy("doc_id"))


# --------------------------------------------------------------------------
# Journey trigrams: the most common 3-step event-type sequences across
# users — funnel DISCOVERY (the funnel query assumes its steps; this
# mines them).
# --------------------------------------------------------------------------
@query("journey_trigrams", oracle=f"""
WITH s AS (
  SELECT user_id, event_type, ts, event_id,
         lag(event_type, 2) OVER w AS t1,
         lag(event_type, 1) OVER w AS t2
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
c AS (
  SELECT t1, t2, event_type AS t3, CAST(count(*) AS BIGINT) AS n
  FROM s WHERE t1 IS NOT NULL
  GROUP BY t1, t2, t3
)
SELECT t1, t2, t3, n,
       CAST(row_number() OVER (ORDER BY n DESC, t1, t2, t3) AS INT) AS rank
FROM c
QUALIFY rank <= {_JOURNEY_TOPK}
ORDER BY rank
""")
def journey_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two lag windows on the per-user partitioning (one shuffle of
    events), reduced to the ≤|types|³ trigram census; the top-k over
    that tiny relation is a distributed TakeOrderedAndProject plus a
    rank over k rows."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select("user_id", F.col("event_type").alias("t3"),
                  F.lag("event_type", 2).over(w).alias("t1"),
                  F.lag("event_type", 1).over(w).alias("t2"))
    c = (s.filter(F.col("t1").isNotNull())
         .groupBy("t1", "t2", "t3")
         .agg(F.count(F.lit(1)).cast("long").alias("n")))
    top = c.orderBy(F.col("n").desc(), "t1", "t2", "t3").limit(_JOURNEY_TOPK)
    w_r = Window.orderBy(F.col("n").desc(), "t1", "t2", "t3")
    return (top.withColumn("rank", F.row_number().over(w_r).cast("int"))
            .select("t1", "t2", "t3", "n", "rank")
            .orderBy("rank"))


# --------------------------------------------------------------------------
# Daily percentile bands: p50/p95 of event value per (type, day) — the
# SLO-dashboard shape.
# --------------------------------------------------------------------------
@query("quantile_bands_daily", oracle="""
WITH e AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
)
SELECT event_type, strftime(day, '%Y-%m-%d') AS day,
       CAST(count(*) AS BIGINT) AS n,
       percentile_cont(0.5)  WITHIN GROUP (ORDER BY cents) AS p50_cents,
       percentile_cont(0.95) WITHIN GROUP (ORDER BY cents) AS p95_cents
FROM e GROUP BY event_type, day
ORDER BY event_type, day
""")
def quantile_bands_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One grouped percentile aggregation (shared value buffer for both
    probabilities, the agg_median pattern) over (type, day) groups."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    e = ev.select("event_type",
                  F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
                  F.round(F.col("value") * 100).cast("long").alias("cents"))
    p = F.percentile("cents", F.array(F.lit(0.5), F.lit(0.95)))
    return (e.groupBy("event_type", "day")
            .agg(F.count(F.lit(1)).cast("long").alias("n"), p.alias("p"))
            .select("event_type",
                    F.date_format("day", "yyyy-MM-dd").alias("day"),
                    "n",
                    F.col("p")[0].alias("p50_cents"),
                    F.col("p")[1].alias("p95_cents"))
            .orderBy("event_type", "day"))
