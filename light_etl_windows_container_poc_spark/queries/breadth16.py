"""Round-5 breadth, fourth wave: event-stream warehouse analytics —
OHLC time-bucket bars (the downsampling shape time-series stores serve),
RFM user segmentation, and first-order event-transition (Markov)
statistics.

Determinism contracts: (ts, event_id) is verified unique, so every
window order is total; money flows as exact cents (round once at
ingest, integer min/max/sum after); ntile/row_number share definitions
across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_tables
from .registry import query


# --------------------------------------------------------------------------
# OHLC bars: per (event_type, day) open/high/low/close/volume — the
# canonical time-series downsample. Open/close are the first/last rows
# under the total (ts, event_id) order within the bucket.
# --------------------------------------------------------------------------
@query("ohlc_bars", oracle="""
WITH e AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS bucket,
         ts, event_id,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
),
r AS (
  SELECT *,
         row_number() OVER (PARTITION BY event_type, bucket
                            ORDER BY ts, event_id) AS rn_a,
         row_number() OVER (PARTITION BY event_type, bucket
                            ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM e
)
SELECT event_type, CAST(bucket AS VARCHAR) AS bucket_day,
       CAST(max(CASE WHEN rn_a = 1 THEN cents END) AS BIGINT) AS open_cents,
       CAST(max(cents) AS BIGINT) AS high_cents,
       CAST(min(cents) AS BIGINT) AS low_cents,
       CAST(max(CASE WHEN rn_d = 1 THEN cents END) AS BIGINT) AS close_cents,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(cents) AS BIGINT) AS volume_cents
FROM r GROUP BY event_type, bucket
ORDER BY event_type, bucket_day
""")
def ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily OHLC per event type. Both row_number windows share the
    (event_type, bucket) partitioning — one shuffle, two in-partition
    sorts — and the bar aggregation reuses the same key, so the whole
    plan is a single exchange over the events stream. Values are exact
    cents from the first projection on."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    e = ev.select("event_type",
                  F.date_trunc("day", F.col("ts")).cast("date")
                  .alias("bucket"),
                  "ts", "event_id",
                  F.round(F.col("value") * 100).cast("long").alias("cents"))
    part = ("event_type", "bucket")
    w_a = Window.partitionBy(*part).orderBy("ts", "event_id")
    w_d = Window.partitionBy(*part).orderBy(F.col("ts").desc(),
                                            F.col("event_id").desc())
    r = e.select("*", F.row_number().over(w_a).alias("rn_a"),
                 F.row_number().over(w_d).alias("rn_d"))
    return (r.groupBy("event_type", "bucket")
            .agg(F.max(F.when(F.col("rn_a") == 1, F.col("cents")))
                 .cast("long").alias("open_cents"),
                 F.max("cents").cast("long").alias("high_cents"),
                 F.min("cents").cast("long").alias("low_cents"),
                 F.max(F.when(F.col("rn_d") == 1, F.col("cents")))
                 .cast("long").alias("close_cents"),
                 F.count(F.lit(1)).cast("long").alias("n_events"),
                 F.sum("cents").cast("long").alias("volume_cents"))
            .select("event_type",
                    F.date_format("bucket", "yyyy-MM-dd").alias("bucket_day"),
                    "open_cents", "high_cents", "low_cents", "close_cents",
                    "n_events", "volume_cents")
            .orderBy("event_type", "bucket_day"))


# --------------------------------------------------------------------------
# RFM segmentation: recency / frequency / monetary quintiles per user,
# assigned by BROADCAST exact-quantile cut points + a CASE ladder — no
# global window and no all-values percentile buffer anywhere. An
# unpartitioned ntile(5) would collapse the aggregated |users| relation
# onto ONE task; Spark's built-in percentile_disc would accumulate every
# distinct value into one aggregation buffer. `exact_quantile_cuts`
# keeps both data-sized steps distributed. Semantics: equal metric
# values share a bucket (SQL-standard percentile_disc = smallest value
# with cume_dist >= p); the helper computes cum/N >= p with the SAME
# IEEE arithmetic the oracle's cume_dist replay uses — hash-safe by
# construction.
# --------------------------------------------------------------------------
@query("user_rfm", oracle="""
WITH anchor AS (SELECT max(ts) AS mx FROM events),
u AS (
  SELECT user_id,
         CAST(date_diff('day', CAST(max(ts) AS DATE),
                        CAST((SELECT mx FROM anchor) AS DATE)) AS BIGINT)
           AS recency_days,
         CAST(count(*) AS BIGINT) AS frequency,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
           AS monetary_cents
  FROM events GROUP BY user_id
),
cd AS (
  SELECT *,
         cume_dist() OVER (ORDER BY recency_days) AS cdr,
         cume_dist() OVER (ORDER BY frequency DESC) AS cdf,
         cume_dist() OVER (ORDER BY monetary_cents DESC) AS cdm
  FROM u
),
cuts AS (
  SELECT min(CASE WHEN cdr >= 0.2 THEN recency_days END) AS rc2,
         min(CASE WHEN cdr >= 0.4 THEN recency_days END) AS rc4,
         min(CASE WHEN cdr >= 0.6 THEN recency_days END) AS rc6,
         min(CASE WHEN cdr >= 0.8 THEN recency_days END) AS rc8,
         max(CASE WHEN cdf >= 0.2 THEN frequency END) AS fc2,
         max(CASE WHEN cdf >= 0.4 THEN frequency END) AS fc4,
         max(CASE WHEN cdf >= 0.6 THEN frequency END) AS fc6,
         max(CASE WHEN cdf >= 0.8 THEN frequency END) AS fc8,
         max(CASE WHEN cdm >= 0.2 THEN monetary_cents END) AS mc2,
         max(CASE WHEN cdm >= 0.4 THEN monetary_cents END) AS mc4,
         max(CASE WHEN cdm >= 0.6 THEN monetary_cents END) AS mc6,
         max(CASE WHEN cdm >= 0.8 THEN monetary_cents END) AS mc8
  FROM cd
),
s AS (
  SELECT u.user_id, u.recency_days, u.frequency, u.monetary_cents,
         CAST(1 + CAST(u.recency_days > c.rc2 AS INT)
                + CAST(u.recency_days > c.rc4 AS INT)
                + CAST(u.recency_days > c.rc6 AS INT)
                + CAST(u.recency_days > c.rc8 AS INT) AS INT) AS r_q,
         CAST(1 + CAST(u.frequency < c.fc2 AS INT)
                + CAST(u.frequency < c.fc4 AS INT)
                + CAST(u.frequency < c.fc6 AS INT)
                + CAST(u.frequency < c.fc8 AS INT) AS INT) AS f_q,
         CAST(1 + CAST(u.monetary_cents < c.mc2 AS INT)
                + CAST(u.monetary_cents < c.mc4 AS INT)
                + CAST(u.monetary_cents < c.mc6 AS INT)
                + CAST(u.monetary_cents < c.mc8 AS INT) AS INT) AS m_q
  FROM u, cuts c
)
SELECT user_id, recency_days, frequency, monetary_cents,
       r_q, f_q, m_q,
       CAST(r_q * 100 + f_q * 10 + m_q AS INT) AS rfm_code
FROM s ORDER BY user_id
""")
def user_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    anchor = ev.agg(F.max("ts").alias("mx"))
    u = (ev.groupBy("user_id")
         .agg(F.max("ts").alias("last_ts"),
              F.count(F.lit(1)).cast("long").alias("frequency"),
              F.sum(F.round(F.col("value") * 100).cast("long"))
              .cast("long").alias("monetary_cents"))
         .crossJoin(F.broadcast(anchor))
         .select("user_id",
                 F.datediff(F.col("mx").cast("date"),
                            F.col("last_ts").cast("date"))
                 .cast("long").alias("recency_days"),
                 "frequency", "monetary_cents"))
    # quintile cuts per dimension via the distributed exact-quantile
    # helper (descending dims via negated copies: the smallest negated
    # value with cume_dist >= p is the largest original). The built-in
    # percentile_disc funnels every distinct value into one aggregation
    # buffer — a column collect at a billion-user scale.
    from ..operators.scale import exact_quantile_cuts

    u = u.persist()
    probs = {2: 0.2, 4: 0.4, 6: 0.6, 8: 0.8}
    cut_cols = [
        exact_quantile_cuts(u.select(F.col("recency_days").alias("v")),
                            "v", {f"rc{q}": p for q, p in probs.items()}),
        exact_quantile_cuts(u.select((-F.col("frequency")).alias("v")),
                            "v", {f"fc{q}": p for q, p in probs.items()}),
        exact_quantile_cuts(u.select((-F.col("monetary_cents")).alias("v")),
                            "v", {f"mc{q}": p for q, p in probs.items()})]
    # materialize the 1-row cuts so the user cache can be released; the
    # final plan then reads events exactly once more
    cuts = (cut_cols[0].crossJoin(cut_cols[1]).crossJoin(cut_cols[2])
            .localCheckpoint(eager=True))
    u.unpersist()

    def ladder(v: "F.Column", pre: str) -> "F.Column":
        e = F.lit(1)
        for q in (2, 4, 6, 8):
            e = e + (v > F.col(f"{pre}{q}")).cast("int")
        return e.cast("int")

    return (u.crossJoin(F.broadcast(cuts))
            .select("user_id", "recency_days", "frequency",
                    "monetary_cents",
                    ladder(F.col("recency_days"), "rc").alias("r_q"),
                    ladder(-F.col("frequency"), "fc").alias("f_q"),
                    ladder(-F.col("monetary_cents"), "mc").alias("m_q"))
            .withColumn("rfm_code",
                        (F.col("r_q") * 100 + F.col("f_q") * 10
                         + F.col("m_q")).cast("int"))
            .orderBy("user_id"))


# --------------------------------------------------------------------------
# First-order event transitions: per-user consecutive event-type pairs
# under the total (ts, event_id) order, reduced to a transition count /
# probability matrix — the Markov summary funnels and anomaly detectors
# start from.
# --------------------------------------------------------------------------
@query("event_transitions", oracle="""
WITH s AS (
  SELECT user_id, event_type, ts, event_id,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM events
),
c AS (
  SELECT prev_type, event_type AS next_type, CAST(count(*) AS BIGINT) AS n
  FROM s WHERE prev_type IS NOT NULL
  GROUP BY prev_type, event_type
),
t AS (SELECT prev_type, CAST(sum(n) AS BIGINT) AS row_total FROM c
      GROUP BY prev_type)
SELECT c.prev_type, c.next_type, c.n,
       CAST(1000 * c.n // t.row_total AS BIGINT) AS prob_milli
FROM c JOIN t ON c.prev_type = t.prev_type
ORDER BY c.prev_type, c.next_type
""")
def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transition matrix over event types. The lag window partitions by
    user (scale-safe: state is one row), the count aggregation reduces
    to |types|² rows, and the row-total join broadcasts — so the only
    data-sized operation is the per-user sort the sessionize family
    already pays."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select("user_id", "event_type",
                  F.lag("event_type").over(w).alias("prev_type"))
    c = (s.filter(F.col("prev_type").isNotNull())
         .groupBy("prev_type", F.col("event_type").alias("next_type"))
         .agg(F.count(F.lit(1)).cast("long").alias("n")))
    t = c.groupBy("prev_type").agg(F.sum("n").cast("long")
                                   .alias("row_total"))
    return (c.join(F.broadcast(t), "prev_type")
            .select("prev_type", "next_type", "n",
                    F.expr("1000 * n div row_total").cast("long")
                    .alias("prob_milli"))
            .orderBy("prev_type", "next_type"))
