"""Temporal operators over the event stream (SURVEY.md §2.2):
as-of join, sessionization, tumbling-window aggregation.

The as-of join is the union+window formulation: tag both sides, sort by
(key, ts), carry the last left-side value forward with
``last(..., ignorenulls)``. One shuffle on the key, no range cross-product
— this is the shape that survives 100 TB (vs. a naive theta-join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load_tables
from .registry import query


def _fmt(c):
    """Timestamp → 'yyyy-MM-dd HH:mm:ss' string: engine-portable output."""
    return F.date_format(c, "yyyy-MM-dd HH:mm:ss")


# --------------------------------------------------------------------------
# as-of join: for each purchase, the nearest prior-or-equal click (same user)
# --------------------------------------------------------------------------
@query("asof_join", oracle="""
SELECT p.event_id,
       p.user_id,
       strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
       CAST(date_diff('second', c.ts, p.ts) AS BIGINT) AS secs_since_click
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND p.ts >= c.ts
ORDER BY p.event_id
""")
def asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    sides = ev.filter(F.col("event_type").isin("purchase", "click")).select(
        "event_id", "user_id", "ts", "event_type",
        F.when(F.col("event_type") == "click", F.col("ts")).alias("click_ts_raw"),
        # clicks sort before purchases at equal ts so ">= prior" includes them
        F.when(F.col("event_type") == "click", F.lit(0)).otherwise(F.lit(1)).alias("side"),
    )
    w = (W.partitionBy("user_id").orderBy("ts", "side", "event_id")
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    return (
        sides.withColumn("last_click", F.last("click_ts_raw", ignorenulls=True).over(w))
        .filter(F.col("event_type") == "purchase")
        .select(
            "event_id", "user_id",
            _fmt("last_click").alias("click_ts"),
            (F.col("ts").cast("long") - F.col("last_click").cast("long"))
            .alias("secs_since_click"))
        .orderBy("event_id")
    )


# --------------------------------------------------------------------------
# sessionization: 30-minute-gap sessions per user
# --------------------------------------------------------------------------
@query("sessionize", oracle="""
WITH flagged AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), numbered AS (
  SELECT user_id, ts, value,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS session_id
  FROM flagged
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       count(*) AS n_events,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100 AS session_value
FROM numbered
GROUP BY user_id, session_id
ORDER BY user_id, session_id
""")
def sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    w_run = (W.partitionBy("user_id").orderBy("ts")
             .rowsBetween(W.unboundedPreceding, W.currentRow))
    flagged = ev.withColumn(
        "new_session",
        F.when(F.lag("ts").over(w).isNull()
               | (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w)) > 1800000000),
               F.lit(1)).otherwise(F.lit(0)))
    numbered = flagged.withColumn("session_id", F.sum("new_session").over(w_run).cast("long"))
    return (
        numbered.groupBy("user_id", "session_id")
        .agg(F.count(F.lit(1)).alias("n_events"),
             _fmt(F.min("ts")).alias("session_start"),
             _fmt(F.max("ts")).alias("session_end"),
             (F.sum(F.round(F.col("value") * 100).cast("long")).cast("double") / 100)
             .alias("session_value"))
        .orderBy("user_id", "session_id")
    )


# --------------------------------------------------------------------------
# tumbling-window aggregation (batch twin of the streaming windowed agg)
# --------------------------------------------------------------------------
@query("time_window_agg", oracle="""
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       count(*) AS n,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100 AS total_value,
       round(CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) * 1.0
             / count(*)) / 100.0 AS avg_value
FROM events
GROUP BY window_start, event_type
ORDER BY window_start, event_type
""")
def time_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    # events.value is a 2-decimal quantity: aggregate in exact integer cents
    # so Spark and the oracle can't diverge by a float ulp at the rounding
    # boundary (avg over tiny groups lands exactly on .005 otherwise).
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    cents = F.round(F.col("value") * 100).cast("long")
    return (
        ev.groupBy(_fmt(F.date_trunc("hour", "ts")).alias("window_start"), "event_type")
        # avg rounds at the CENTS level (integer-over-integer ratio): rounding
        # the off-grid dollars value at 2dp diverges between engines — Spark's
        # round() goes through the shortest decimal string, DuckDB's doesn't.
        .agg(F.count(F.lit(1)).alias("n"),
             (F.sum(cents).cast("double") / 100).alias("total_value"),
             (F.round(F.sum(cents) * 1.0 / F.count(F.lit(1))) / 100.0)
             .alias("avg_value"))
        .orderBy("window_start", "event_type")
    )


# --------------------------------------------------------------------------
# range join: event pairs within 60s per user — bucketed equi-join in
# Spark, plain theta-join in the oracle (same result, different plan)
# --------------------------------------------------------------------------
@query("range_join", oracle="""
SELECT a.event_id AS a_id, b.event_id AS b_id,
       CAST(epoch_us(b.ts) - epoch_us(a.ts) AS BIGINT) AS gap_us
FROM events a JOIN events b
  ON a.user_id = b.user_id
 AND (epoch_us(b.ts) > epoch_us(a.ts)
      OR (epoch_us(b.ts) = epoch_us(a.ts) AND b.event_id > a.event_id))
 AND epoch_us(b.ts) - epoch_us(a.ts) <= 60000000
ORDER BY a_id, b_id
""")
def range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.temporal_ops import range_join_pairs

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return (range_join_pairs(ev, "user_id", "ts", "event_id",
                             max_gap_seconds=60)
            .orderBy("a_id", "b_id"))


# --------------------------------------------------------------------------
# time-RANGE rolling window: trailing 1h value sum per user (exact cents)
# --------------------------------------------------------------------------
@query("window_rolling_time", oracle="""
SELECT event_id,
       CAST(sum(CAST(round(value * 100) AS BIGINT))
            OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
            AS BIGINT) AS rolling_cents
FROM events
ORDER BY event_id
""")
def window_rolling_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.temporal_ops import rolling_time_window

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    cents = F.round(F.col("value") * 100).cast("long")
    return (rolling_time_window(ev, "user_id", "ts", cents,
                                window_seconds=3600, out_col="rolling_cents")
            .select("event_id", "rolling_cents")
            .orderBy("event_id"))


# --------------------------------------------------------------------------
# interval-overlap join: concurrent sessions of DIFFERENT users — the
# interval-join shape (Flink intervalJoin / range-predicate join) Spark
# lacks natively. Spark plan: explode each interval to the hour buckets it
# touches → equi-join on bucket → exact overlap filter → dedup; bucket
# count per interval is bounded by interval length (≤ 1h sessions → ≤ 2
# buckets), so the join stays an equi-join with linear-ish candidates.
# The oracle states the same semantics as a plain inequality join.
# --------------------------------------------------------------------------
@query("interval_join", oracle="""
WITH flagged AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), numbered AS (
  SELECT user_id, ts,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS sid
  FROM flagged
), iv AS (
  SELECT user_id, sid, min(ts) AS t0, max(ts) AS t1
  FROM numbered GROUP BY user_id, sid
)
SELECT a.user_id AS a_user, CAST(a.sid AS BIGINT) AS a_sid,
       b.user_id AS b_user, CAST(b.sid AS BIGINT) AS b_sid,
       CAST(epoch_us(least(a.t1, b.t1)) - epoch_us(greatest(a.t0, b.t0))
            AS BIGINT) AS overlap_us
FROM iv a JOIN iv b
  ON a.user_id < b.user_id AND a.t0 <= b.t1 AND b.t0 <= a.t1
ORDER BY a_user, a_sid, b_user, b_sid
""")
def interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    w_run = (W.partitionBy("user_id").orderBy("ts")
             .rowsBetween(W.unboundedPreceding, W.currentRow))
    flagged = ev.withColumn(
        "new_session",
        F.when(F.lag("ts").over(w).isNull()
               | (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
                  > 1800000000), F.lit(1)).otherwise(F.lit(0)))
    iv = (flagged
          .withColumn("sid", F.sum("new_session").over(w_run).cast("long"))
          .groupBy("user_id", "sid")
          .agg(F.unix_micros(F.min("ts")).alias("u0"),
               F.unix_micros(F.max("ts")).alias("u1")))
    # integer `div` bucketing — float division of epoch micros exceeds
    # double's 2^53 mantissa and can mis-bucket boundary timestamps
    buckets = F.sequence(F.expr("u0 div 3600000000"),
                         F.expr("u1 div 3600000000"))
    def side(p):
        return iv.select(F.col("user_id").alias(f"{p}_user"),
                         F.col("sid").alias(f"{p}_sid"),
                         F.col("u0").alias(f"{p}_u0"),
                         F.col("u1").alias(f"{p}_u1"),
                         F.explode(buckets).alias("bk"))
    return (side("a").join(side("b"), "bk")
            .filter((F.col("a_user") < F.col("b_user"))
                    & (F.col("a_u0") <= F.col("b_u1"))
                    & (F.col("b_u0") <= F.col("a_u1")))
            .select("a_user", "a_sid", "b_user", "b_sid",
                    (F.least("a_u1", "b_u1")
                     - F.greatest("a_u0", "b_u0")).alias("overlap_us"))
            .dropDuplicates(["a_user", "a_sid", "b_user", "b_sid"])
            .orderBy("a_user", "a_sid", "b_user", "b_sid"))
