"""Warehouse-maintenance breadth: CDC apply (change-stream → final state)
and null imputation (forward-fill, group-mean fill).

- `cdc_apply` is the Delta-CDF-style collapse: latest op per key wins,
  deletes drop the key. One shuffle on the key; at scale this is exactly
  the MERGE-free upsert path `etl_scd2_merge` feeds.
- Forward-fill is the same `last(..., ignorenulls)` running-window device
  the as-of join uses (queries/temporal.py) — one shuffle on the key.
- Group-mean imputation keeps the oracle exact by filling with the
  INTEGER-cents group mean rounded via `div` (floor on non-negatives),
  avoiding engine-divergent double rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load_tables
from .registry import query
from .tpch import _units


# --------------------------------------------------------------------------
# CDC apply: signup/purchase = upsert of value, error = delete; the last
# operation per user (by ts, event_id) decides the final state
# --------------------------------------------------------------------------
@query("cdc_apply", oracle="""
WITH ops AS (
  SELECT user_id, ts, event_id,
         CAST(round(value * 100) AS BIGINT) AS cents,
         CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op
  FROM events
  WHERE event_type IN ('signup', 'purchase', 'error')
), ranked AS (
  SELECT user_id, ts, cents, op,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM ops
)
SELECT user_id, cents AS last_cents,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS last_ts
FROM ranked
WHERE rn = 1 AND op <> 'D'
ORDER BY user_id
""")
def cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    ops = (ev.filter(F.col("event_type").isin("signup", "purchase", "error"))
           .select("user_id", "ts", "event_id",
                   _units(F.col("value"), 100).alias("cents"),
                   F.when(F.col("event_type") == "error", "D")
                   .otherwise("U").alias("op")))
    w = W.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (ops.withColumn("rn", F.row_number().over(w))
            .filter((F.col("rn") == 1) & (F.col("op") != "D"))
            .select("user_id", F.col("cents").alias("last_cents"),
                    F.date_format("ts", "yyyy-MM-dd HH:mm:ss")
                    .alias("last_ts"))
            .orderBy("user_id"))


# --------------------------------------------------------------------------
# forward-fill imputation: nulls inherit the last non-null prior value per
# key (nulls injected deterministically so the op has something to fill)
# --------------------------------------------------------------------------
@query("impute_forward_fill", oracle="""
WITH holey AS (
  SELECT user_id, ts, event_id,
         CASE WHEN event_id % 5 = 0 THEN NULL
              ELSE CAST(round(value * 100) AS BIGINT) END AS cents
  FROM events
)
SELECT event_id, user_id, cents,
       last_value(cents IGNORE NULLS)
         OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS cents_filled
FROM holey
ORDER BY event_id
""")
def impute_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    holey = ev.select(
        "user_id", "ts", "event_id",
        F.when(F.col("event_id") % 5 == 0, F.lit(None).cast("long"))
        .otherwise(_units(F.col("value"), 100)).alias("cents"))
    w = (W.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    return (holey.select("event_id", "user_id", "cents",
                         F.last("cents", ignorenulls=True).over(w)
                         .alias("cents_filled"))
            .orderBy("event_id"))


# --------------------------------------------------------------------------
# group-mean imputation: nulls take their event_type's mean (floor'd
# integer cents — exact in both engines, no double-rounding divergence)
# --------------------------------------------------------------------------
@query("impute_group_mean", oracle="""
WITH holey AS (
  SELECT event_id, event_type,
         CASE WHEN event_id % 5 = 0 THEN NULL
              ELSE CAST(round(value * 100) AS BIGINT) END AS cents
  FROM events
), m AS (
  SELECT event_type,
         CAST(sum(cents) AS BIGINT) // count(cents) AS mean_cents
  FROM holey GROUP BY event_type
)
SELECT h.event_id, h.event_type,
       coalesce(h.cents, m.mean_cents) AS cents_filled,
       (h.cents IS NULL) AS was_imputed
FROM holey h JOIN m ON h.event_type = m.event_type
ORDER BY h.event_id
""")
def impute_group_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    holey = ev.select(
        "event_id", "event_type",
        F.when(F.col("event_id") % 5 == 0, F.lit(None).cast("long"))
        .otherwise(_units(F.col("value"), 100)).alias("cents"))
    m = (holey.groupBy("event_type")
         .agg(F.expr("CAST(sum(cents) AS BIGINT) div count(cents)")
              .alias("mean_cents")))
    return (holey.join(F.broadcast(m), "event_type")
            .select("event_id", "event_type",
                    F.coalesce("cents", "mean_cents").alias("cents_filled"),
                    F.col("cents").isNull().alias("was_imputed"))
            .orderBy("event_id"))


# --------------------------------------------------------------------------
# block-GEMM exact all-pairs cosine — the 100 TB form of dedup_embedding
# (bounded task memory, one numpy matmul per block pair; sims differ from
# the JVM fold only in the last ulp → rows; set-equality vs the exact
# JVM form asserted in tests/test_similarity_blocked.py)
# --------------------------------------------------------------------------
@query("dedup_embedding_blocked")
def dedup_embedding_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import cosine_pairs_blocked

    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    return (cosine_pairs_blocked(emb, "vec_id", "embedding",
                                 threshold=0.45)
            .orderBy("a_id", "b_id"))
