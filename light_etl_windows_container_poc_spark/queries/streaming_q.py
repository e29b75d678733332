"""Streaming operators as driver-checkable queries.

Each entry runs a real Structured Streaming job to completion
(``trigger(availableNow=True)`` + memory sink) and returns the sink table.
The windowed aggregation is oracle-checked against the same SQL the batch
twin uses — on a bounded input, update-mode streaming totals equal the
batch aggregation exactly.
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_tables
from .registry import query


def _events_stream(spark: SparkSession, sf_dir: str):
    """Bounded stream over the events table. The streaming parquet source
    can't read TIMESTAMP(NANOS), so materialize the micro-precision form
    once per (session, sf_dir) into a temp dir."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    key = f"_letl_stream_src_{abs(hash(sf_dir)) % 10**8}"
    cache = getattr(spark, "_letl_stream_dirs", None)
    if cache is None:
        cache = {}
        spark._letl_stream_dirs = cache
    if key not in cache:
        path = tempfile.mkdtemp(prefix=key)
        ev.write.mode("overwrite").parquet(path)
        cache[key] = path
    return spark.readStream.schema(ev.schema).parquet(cache[key])


def _run_to_table(df: DataFrame, output_mode: str,
                  state_partitions: int | None = 8) -> DataFrame:
    """Run a bounded stream to completion into a memory sink.

    ``state_partitions`` right-sizes the state store for these bounded
    demo streams: stateful operator parallelism (and one state-store dir
    per partition per operator) is fixed by spark.sql.shuffle.partitions
    at the FIRST micro-batch, and the batch-oriented session default (32+)
    measured ~40% pure state-store overhead at this state size. A
    production deployment sizes it to state volume ÷ executor memory —
    pass None to inherit the session setting. The override is scoped:
    each run uses a fresh checkpoint, so the baked-in partitioning never
    outlives the query."""
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    if state_partitions is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        name = "s" + uuid.uuid4().hex[:12]
        q = (df.writeStream.outputMode(output_mode).format("memory")
             .queryName(name)
             .option("checkpointLocation",
                     tempfile.mkdtemp(prefix=f"ckpt_{name}"))
             .trigger(availableNow=True).start())
        q.awaitTermination(300)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return df.sparkSession.table(name)


# --------------------------------------------------------------------------
# watermarked tumbling-window aggregation, run as a real stream
# --------------------------------------------------------------------------
@query("stream_window_agg", oracle="""
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       count(*) AS n,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100 AS total_value
FROM events
GROUP BY window_start, event_type
ORDER BY window_start, event_type
""")
def stream_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = _events_stream(spark, sf_dir)
    cents = F.round(F.col("value") * 100).cast("long")
    agg = (stream
           .withWatermark("ts", "2 hours")
           .groupBy(F.window("ts", "1 hour"), "event_type")
           .agg(F.count(F.lit(1)).alias("n"),
                (F.sum(cents).cast("double") / 100).alias("total_value")))
    out = _run_to_table(agg, "update")
    return (out.select(F.date_format("window.start", "yyyy-MM-dd HH:mm:ss")
                       .alias("window_start"),
                       "event_type", "n", "total_value")
            .orderBy("window_start", "event_type"))


# --------------------------------------------------------------------------
# streaming deduplication: dropDuplicates state over a bounded stream —
# the output SET equals batch DISTINCT (arrival order only affects which
# duplicate survives, and we project exactly the key columns)
# --------------------------------------------------------------------------
@query("stream_dedup", oracle="""
SELECT DISTINCT user_id, event_type FROM events
ORDER BY user_id, event_type
""")
def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = _events_stream(spark, sf_dir)
    dd = (stream.select("user_id", "event_type")
          .dropDuplicates(["user_id", "event_type"]))
    out = _run_to_table(dd, "append")
    return out.orderBy("user_id", "event_type")


# --------------------------------------------------------------------------
# stream-static enrichment join: the static dimension broadcasts onto every
# micro-batch (the standard streaming-enrichment shape)
# --------------------------------------------------------------------------
@query("stream_static_join", oracle="""
SELECT event_id,
       CASE event_type WHEN 'view' THEN 'engage' WHEN 'click' THEN 'engage'
            WHEN 'purchase' THEN 'convert' WHEN 'signup' THEN 'convert'
            ELSE 'ops' END AS category
FROM events
ORDER BY event_id
""")
def stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = spark.createDataFrame(
        [("view", "engage"), ("click", "engage"), ("purchase", "convert"),
         ("signup", "convert"), ("error", "ops")],
        "event_type string, category string")
    stream = _events_stream(spark, sf_dir)
    j = (stream.join(F.broadcast(cat), "event_type")
         .select("event_id", "category"))
    out = _run_to_table(j, "append")
    return out.orderBy("event_id")


# --------------------------------------------------------------------------
# custom stateful operator (applyInPandasWithState) — engine-side state,
# rows-only driver check; exact values asserted in tests/test_streaming.py
# --------------------------------------------------------------------------
@query("stream_stateful")
def stream_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.windows import stateful_running_max

    stream = _events_stream(spark, sf_dir)
    out = _run_to_table(stateful_running_max(stream), "update")
    return out.orderBy("user_id")


# --------------------------------------------------------------------------
# invariant twin of stream_stateful with a real SQL oracle: the per-user
# FINAL state of the custom stateful operator must equal the batch
# aggregate — max(running_max) is the stream-end max (monotone state) and
# Σ batch_rows proves every event hit the operator exactly once (fresh
# checkpoint per run). Certifies applyInPandasWithState end-to-end with
# a driver-hashable row per user.
# --------------------------------------------------------------------------
@query("stream_stateful_final", oracle="""
SELECT user_id,
       max(value) AS final_max,
       count(*) AS events_processed
FROM events
GROUP BY user_id
ORDER BY user_id
""")
def stream_stateful_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.windows import stateful_running_max

    stream = _events_stream(spark, sf_dir)
    out = _run_to_table(stateful_running_max(stream), "update")
    return (out.groupBy("user_id")
            .agg(F.max("running_max").alias("final_max"),
                 F.sum("batch_rows").alias("events_processed"))
            .orderBy("user_id"))


# --------------------------------------------------------------------------
# streaming SESSION windows (session_window + watermark): gap-merged
# sessions per user, run as a real stream. On a bounded availableNow input
# the update-mode output equals batch gap-sessionization exactly, so the
# oracle is the same lag+cumsum SQL the batch sessionize twin uses —
# Spark merges an event into a session while event_ts < last_ts + gap,
# i.e. a gap >= 10 min starts a new session.
# --------------------------------------------------------------------------
@query("stream_session_window", oracle="""
WITH flagged AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 600000000
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), numbered AS (
  SELECT user_id, ts,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS sid
  FROM flagged
)
SELECT user_id,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       count(*) AS n_events
FROM numbered
GROUP BY user_id, sid
ORDER BY user_id, session_start
""")
def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = _events_stream(spark, sf_dir)
    agg = (stream
           .withWatermark("ts", "2 hours")
           .groupBy("user_id", F.session_window("ts", "10 minutes"))
           .agg(F.count(F.lit(1)).alias("n_events")))
    out = _run_to_table(agg, "complete")
    return (out.select("user_id",
                       F.date_format("session_window.start",
                                     "yyyy-MM-dd HH:mm:ss")
                       .alias("session_start"),
                       "n_events")
            .orderBy("user_id", "session_start"))


# --------------------------------------------------------------------------
# STREAM-STREAM time-bounded join (watermarked): clicks within 10 minutes
# after a view by the same user. Both sides buffer watermark-bounded
# state; the time-range condition lets Spark evict rows once the other
# side's watermark passes v_ts + 10 min. On the bounded availableNow
# input the inner join emits exactly the batch-SQL result.
# --------------------------------------------------------------------------
@query("stream_stream_join", oracle="""
SELECT v.user_id AS user_id, v.event_id AS v_id, c.event_id AS c_id,
       CAST(epoch_us(c.ts) - epoch_us(v.ts) AS BIGINT) AS gap_us
FROM events v JOIN events c
  ON v.user_id = c.user_id
 AND v.event_type = 'view' AND c.event_type = 'click'
 AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 10 MINUTE
ORDER BY v.user_id, v_id, c_id
""")
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    src = _events_stream(spark, sf_dir)
    views = (src.filter(F.col("event_type") == "view")
             .select("user_id", F.col("ts").alias("v_ts"),
                     F.col("event_id").alias("v_id"))
             .withWatermark("v_ts", "1 hour"))
    clicks = (_events_stream(spark, sf_dir)
              .filter(F.col("event_type") == "click")
              .select(F.col("user_id").alias("c_user"),
                      F.col("ts").alias("c_ts"),
                      F.col("event_id").alias("c_id"))
              .withWatermark("c_ts", "1 hour"))
    j = views.join(
        clicks,
        F.expr("user_id = c_user AND c_ts >= v_ts "
               "AND c_ts <= v_ts + interval 10 minutes"))
    out = _run_to_table(j, "append")
    return (out.select("user_id", "v_id", "c_id",
                       (F.unix_micros("c_ts") - F.unix_micros("v_ts"))
                       .alias("gap_us"))
            .orderBy("user_id", "v_id", "c_id"))


# --------------------------------------------------------------------------
# streaming OHLC bars: open/close via min_by/max_by on the total
# (ts, event_id) order — the streaming twin of the batch `ohlc_bars`
# query, hash-checked against the same relational truth. min_by/max_by
# are commutative merges over the unique struct key, so micro-batch
# boundaries can never change the result.
# --------------------------------------------------------------------------
@query("stream_ohlc_final", oracle="""
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
SELECT event_type, strftime(bucket, '%Y-%m-%d') AS bucket_day,
       CAST(max(CASE WHEN rn_a = 1 THEN cents END) AS BIGINT) AS open_cents,
       CAST(max(cents) AS BIGINT) AS high_cents,
       CAST(min(cents) AS BIGINT) AS low_cents,
       CAST(max(CASE WHEN rn_d = 1 THEN cents END) AS BIGINT) AS close_cents,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(cents) AS BIGINT) AS volume_cents
FROM r GROUP BY event_type, bucket
ORDER BY event_type, bucket_day
""")
def stream_ohlc_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked daily windows; open = min_by(cents, (ts, event_id)),
    close = max_by — deterministic because the struct key is unique, and
    mergeable because min_by/max_by keep one (key, value) pair of state
    per group regardless of arrival order. On the bounded stream the
    final update-mode totals equal the batch bars exactly."""
    stream = _events_stream(spark, sf_dir)
    cents = F.round(F.col("value") * 100).cast("long")
    ordk = F.struct("ts", "event_id")
    agg = (stream
           .withWatermark("ts", "2 days")
           .groupBy(F.window("ts", "1 day"), "event_type")
           .agg(F.min_by(cents, ordk).alias("open_cents"),
                F.max(cents).alias("high_cents"),
                F.min(cents).alias("low_cents"),
                F.max_by(cents, ordk).alias("close_cents"),
                F.count(F.lit(1)).alias("n_events"),
                F.sum(cents).alias("volume_cents")))
    out = _run_to_table(agg, "update")
    return (out.select("event_type",
                       F.date_format("window.start", "yyyy-MM-dd")
                       .alias("bucket_day"),
                       F.col("open_cents").cast("long").alias("open_cents"),
                       F.col("high_cents").cast("long").alias("high_cents"),
                       F.col("low_cents").cast("long").alias("low_cents"),
                       F.col("close_cents").cast("long").alias("close_cents"),
                       F.col("n_events").cast("long").alias("n_events"),
                       F.col("volume_cents").cast("long")
                       .alias("volume_cents"))
            .orderBy("event_type", "bucket_day"))
