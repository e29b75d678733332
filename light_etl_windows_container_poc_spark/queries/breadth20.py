"""Round-5 breadth, eighth wave: temporal diagnostics over the event
stream — day-of-week seasonality profiles, MAD-flagged daily anomalies
(the robust-statistics contract applied to the time dimension), and
first-touch session attribution.

Determinism: money in exact cents; percentiles linear-interpolated (the
agg_median contract); session/first-touch choices pinned by the total
(ts, event_id) order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_tables
from .registry import query

_SESSION_GAP_MIN = 30


# --------------------------------------------------------------------------
# Day-of-week seasonality: per (event_type, dow) volume and value vs the
# type's daily mean — the profile dashboards and anomaly baselines use.
# --------------------------------------------------------------------------
@query("seasonality_dow", oracle="""
WITH d AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         dayofweek(ts) AS dow,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
),
daily AS (
  SELECT event_type, day, CAST(min(dow) AS INT) AS dow,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(cents) AS BIGINT) AS v
  FROM d GROUP BY event_type, day
),
base AS (
  SELECT event_type,
         CAST(sum(n) AS BIGINT) AS tot_n,
         CAST(count(*) AS BIGINT) AS n_days
  FROM daily GROUP BY event_type
)
SELECT daily.event_type AS event_type, daily.dow AS dow,
       CAST(count(*) AS BIGINT) AS n_days_dow,
       CAST(sum(daily.n) AS BIGINT) AS n_events,
       CAST(sum(daily.v) AS BIGINT) AS value_cents,
       CAST(1000 * sum(daily.n) * base.n_days
            // (base.tot_n * count(*)) AS BIGINT) AS index_milli
FROM daily JOIN base ON daily.event_type = base.event_type
GROUP BY daily.event_type, daily.dow, base.tot_n, base.n_days
ORDER BY event_type, dow
""")
def seasonality_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality index per (type, day-of-week): mean daily volume on
    that weekday over the type's all-days mean, in milli. Two keyed
    aggregations (daily, then dow) plus a broadcast per-type baseline;
    index arithmetic is pure BIGINT (1000·n·days div (tot·days_dow)).
    DuckDB's dayofweek is 0=Sunday; Spark's dayofweek() is 1=Sunday, so
    the Spark side uses dayofweek()-1 to match."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    d = ev.select("event_type",
                  F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
                  (F.dayofweek("ts") - 1).cast("int").alias("dow"),
                  F.round(F.col("value") * 100).cast("long").alias("cents"))
    daily = (d.groupBy("event_type", "day")
             .agg(F.min("dow").cast("int").alias("dow"),
                  F.count(F.lit(1)).cast("long").alias("n"),
                  F.sum("cents").cast("long").alias("v")))
    base = (daily.groupBy("event_type")
            .agg(F.sum("n").cast("long").alias("tot_n"),
                 F.count(F.lit(1)).cast("long").alias("n_days")))
    return (daily.join(F.broadcast(base), "event_type")
            .groupBy("event_type", "dow", "tot_n", "n_days")
            .agg(F.count(F.lit(1)).cast("long").alias("n_days_dow"),
                 F.sum("n").cast("long").alias("n_events"),
                 F.sum("v").cast("long").alias("value_cents"))
            .select("event_type", "dow", "n_days_dow", "n_events",
                    "value_cents",
                    F.expr("1000 * n_events * n_days"
                           " div (tot_n * n_days_dow)").cast("long")
                    .alias("index_milli"))
            .orderBy("event_type", "dow"))


# --------------------------------------------------------------------------
# Daily anomalies: MAD-flag days whose per-type volume deviates from the
# type's median day — mad_outliers' contract moved onto the time axis.
# --------------------------------------------------------------------------
@query("daily_anomaly_mad", oracle="""
WITH daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY event_type, day
),
med AS (
  SELECT event_type,
         percentile_cont(0.5) WITHIN GROUP (ORDER BY n) AS med
  FROM daily GROUP BY event_type
),
dev AS (
  SELECT d.event_type, d.day, d.n, abs(d.n - med.med) AS dev
  FROM daily d JOIN med ON d.event_type = med.event_type
),
mad AS (
  SELECT event_type,
         percentile_cont(0.5) WITHIN GROUP (ORDER BY dev) AS mad
  FROM dev GROUP BY event_type
)
SELECT dev.event_type, CAST(dev.day AS VARCHAR) AS day, dev.n,
       CAST(CASE WHEN mad.mad > 0
                 THEN round(1000.0 * dev.dev / (1.4826 * mad.mad))
                 ELSE 0 END AS BIGINT) AS robust_z_milli,
       CAST(CASE WHEN mad.mad > 0
                 THEN round(1000.0 * dev.dev / (1.4826 * mad.mad)) > 3000
                 ELSE FALSE END AS INT) AS is_anomaly
FROM dev JOIN mad ON dev.event_type = mad.event_type
ORDER BY dev.event_type, day
""")
def daily_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-day volume anomalies per event type. The daily
    aggregation reduces the stream to |types|·|days| rows; both
    percentile relations are |types| rows riding broadcasts."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    daily = (ev.groupBy("event_type",
                        F.date_trunc("day", F.col("ts")).cast("date")
                        .alias("day"))
             .agg(F.count(F.lit(1)).cast("long").alias("n")))
    med = (daily.groupBy("event_type")
           .agg(F.percentile("n", F.lit(0.5)).alias("med")))
    dev = (daily.join(F.broadcast(med), "event_type")
           .select("event_type", "day", "n",
                   F.abs(F.col("n") - F.col("med")).alias("dev")))
    mad = (dev.groupBy("event_type")
           .agg(F.percentile("dev", F.lit(0.5)).alias("mad")))
    z = F.when(F.col("mad") > 0,
               F.round(1000.0 * F.col("dev") / (1.4826 * F.col("mad"))))\
         .otherwise(F.lit(0)).cast("long")
    return (dev.join(F.broadcast(mad), "event_type")
            .select("event_type",
                    F.date_format("day", "yyyy-MM-dd").alias("day"), "n",
                    z.alias("robust_z_milli"),
                    F.when(F.col("mad") > 0, z > 3000)
                    .otherwise(F.lit(False)).cast("int").alias("is_anomaly"))
            .orderBy("event_type", "day"))


# --------------------------------------------------------------------------
# First-touch attribution: credit each purchase to the first event type
# of its session (30-min gap sessions, the sessionize convention).
# --------------------------------------------------------------------------
@query("first_touch_attribution", oracle=f"""
WITH s AS (
  SELECT user_id, event_type, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR date_diff('second', lag(ts) OVER w, ts)
                      > {_SESSION_GAP_MIN * 60}
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
n AS (
  SELECT *, sum(new_session) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS session_id
  FROM s
),
f AS (
  SELECT user_id, session_id, event_type, ts, event_id,
         first_value(event_type) OVER (PARTITION BY user_id, session_id
                                       ORDER BY ts, event_id)
           AS first_touch
  FROM n
)
SELECT first_touch,
       CAST(count(*) AS BIGINT) AS n_purchases,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM f WHERE event_type = 'purchase'
GROUP BY first_touch
ORDER BY first_touch
""")
def first_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchases credited to their session's opening event type. Three
    windows share the per-user partitioning (one shuffle of the events
    stream); the attribution reduction is |types| rows. The purchase
    filter must run AFTER first_value — filtering first would change
    which event opens the session."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_s = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    s = ev.select("user_id", "event_type", "ts", "event_id",
                  F.when(gap_s.isNull()
                         | (gap_s > _SESSION_GAP_MIN * 60), 1)
                  .otherwise(0).alias("new_session"))
    n = s.withColumn("session_id", F.sum("new_session").over(w))
    w_sess = (Window.partitionBy("user_id", "session_id")
              .orderBy("ts", "event_id"))
    f = n.withColumn("first_touch", F.first("event_type").over(w_sess))
    return (f.filter(F.col("event_type") == "purchase")
            .groupBy("first_touch")
            .agg(F.count(F.lit(1)).cast("long").alias("n_purchases"),
                 F.countDistinct("user_id").cast("long").alias("n_users"))
            .orderBy("first_touch"))
