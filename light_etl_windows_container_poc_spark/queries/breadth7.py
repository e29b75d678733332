"""Rolling uniques, built-in session windows, hash-function breadth, and
mergeable HLL sketches.

- `rolling_uniques` is the exact form: a tiny day spine broadcast against
  the event scan (COUNT DISTINCT cannot ride a window frame in either
  engine). The mergeable-sketch form of the same question is
  `sketch_hll_mergeable` — at 100 TB you pre-aggregate per-day sketches
  and union them per query instead of rescanning.
- `session_window_agg` uses Spark's built-in session_window operator;
  the oracle derives identical sessions from the lag/cumsum formulation
  (end = last event + gap, matching session_window's definition).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_tables
from .registry import query


# --------------------------------------------------------------------------
# trailing-7-day distinct users per day (exact rolling uniques)
# --------------------------------------------------------------------------
@query("rolling_uniques", oracle="""
WITH days AS (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events),
j AS (
  SELECT d.day, e.user_id
  FROM days d JOIN events e
    ON CAST(e.ts AS DATE) BETWEEN d.day - 6 AND d.day
)
SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) AS uniques_7d
FROM j GROUP BY day ORDER BY day
""")
def rolling_uniques(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    e = ev.select(F.col("ts").cast("date").alias("e_day"), "user_id")
    days = e.select(F.col("e_day").alias("day")).distinct()
    j = e.join(F.broadcast(days),
               (F.col("e_day") >= F.date_sub(F.col("day"), 6))
               & (F.col("e_day") <= F.col("day")))
    return (j.groupBy("day")
            .agg(F.count_distinct("user_id").alias("uniques_7d"))
            .orderBy("day"))


# --------------------------------------------------------------------------
# built-in session_window (30-min gap), batch mode — the one-operator form
# of queries/temporal.py sessionize
# --------------------------------------------------------------------------
@query("session_window_agg", oracle="""
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
)
SELECT user_id,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(max(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S')
         AS session_end,
       count(*) AS n_events
FROM numbered
GROUP BY user_id, sid
ORDER BY user_id, session_start
""")
def session_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return (ev.groupBy("user_id",
                       F.session_window("ts", "30 minutes").alias("w"))
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select("user_id",
                    F.date_format("w.start", "yyyy-MM-dd HH:mm:ss")
                    .alias("session_start"),
                    F.date_format("w.end", "yyyy-MM-dd HH:mm:ss")
                    .alias("session_end"),
                    "n_events")
            .orderBy("user_id", "session_start"))


# --------------------------------------------------------------------------
# hash-function breadth (md5 / sha256 / xxhash for bucketing)
# --------------------------------------------------------------------------
@query("hash_funcs", oracle="""
SELECT doc_id,
       md5(text) AS h_md5,
       sha256(text) AS h_sha256,
       CAST(('0x' || substring(md5(text), 1, 8)) AS BIGINT) % 64
         AS md5_bucket
FROM documents
ORDER BY doc_id
""")
def hash_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return docs.select(
        "doc_id",
        F.md5("text").alias("h_md5"),
        F.sha2("text", 256).alias("h_sha256"),
        (F.conv(F.substring(F.md5("text"), 1, 8), 16, 10).cast("long") % 64)
        .alias("md5_bucket"),
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
# mergeable HLL sketches: per-day user sketches + a grand union — the
# pre-aggregation pattern that answers arbitrary-range distinct questions
# without rescanning raw data (sketch bytes are engine-specific → rows;
# estimate-vs-exact accuracy asserted in tests/test_sketches.py)
# --------------------------------------------------------------------------
@query("sketch_hll_mergeable")
def sketch_hll_mergeable(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    daily = (ev.select(F.col("ts").cast("date").alias("day"), "user_id")
             .groupBy("day")
             .agg(F.hll_sketch_agg("user_id").alias("sk")))
    per_day = daily.select(
        "day", F.hll_sketch_estimate("sk").alias("est_uniques"))
    total = (daily.agg(F.hll_union_agg("sk").alias("sk"))
             .select(F.lit(None).cast("date").alias("day"),
                     F.hll_sketch_estimate("sk").alias("est_uniques")))
    return per_day.unionAll(total).orderBy(F.col("day").asc_nulls_last())


# --------------------------------------------------------------------------
# custom grouped-map operator (applyInPandas) with exact oracle parity:
# per-type OLS trend of value vs time. Python sums INTEGER moments only;
# the final doubles use the oracle's exact expression tree.
# --------------------------------------------------------------------------
@query("grouped_ols", oracle="""
WITH b AS (
  SELECT event_type, epoch_us(ts) // 1000000 AS secs,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
), o AS (
  SELECT event_type,
         secs - min(secs) OVER (PARTITION BY event_type) AS x,
         cents AS y
  FROM b
), m AS (
  SELECT event_type, count(*) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(x * y) AS BIGINT) AS sxy
  FROM o GROUP BY event_type
)
SELECT event_type, n, sx, sy, sxx, sxy,
       (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
       / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS slope,
       (CAST(sy AS DOUBLE)
          - (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
             - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
            / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
            * CAST(sx AS DOUBLE))
       / CAST(n AS DOUBLE) AS intercept
FROM m
ORDER BY event_type
""")
def grouped_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.stats import grouped_ols as _ols

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return _ols(ev).orderBy("event_type")


# --------------------------------------------------------------------------
# approximate percentiles (mergeable quantile summaries): the sketch-side
# answer to `percentiles`/`agg_median` — estimates are engine-specific
# (Greenwald-Khanna in Spark) → rows; rank-error bound asserted in
# tests/test_sketches.py
# --------------------------------------------------------------------------
@query("sketch_approx_percentile")
def sketch_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    return (li.select("l_returnflag", cents.alias("cents"))
            .groupBy("l_returnflag")
            .agg(F.approx_percentile("cents", F.array(
                F.lit(0.25), F.lit(0.5), F.lit(0.75)), F.lit(10000))
                .alias("approx_quartiles"))
            .select("l_returnflag",
                    F.col("approx_quartiles")[0].alias("p25"),
                    F.col("approx_quartiles")[1].alias("p50"),
                    F.col("approx_quartiles")[2].alias("p75"))
            .orderBy("l_returnflag"))
