"""Round-10 breadth, fourth wave: the two sketch APPLICATIONS that
justify keeping mergeable state at 100 TB —

1. `hll_rolling_uniques`: the pre-aggregate-once / answer-any-window
   rollup. Events reduce to ONE ≤m-row HLL register grid per day; any
   trailing window is then a MAX-merge of ≤7·m tiny rows per day —
   history is never rescanned, which is the entire point of mergeable
   sketch state in a time-partitioned warehouse (the exact
   `rolling_uniques` twin re-joins a week of raw events per day).
   Certified per day against the exact trailing-7-day distinct count
   with a ±35% flag on every row (measured max per-day error 13.9% /
   1.0% / 16.0% at the three SFs; RSE at m=64 ≈ 13%).

2. `cm_join_size`: JOIN-size estimation from two Count-Min grids —
   est_j = Σ_b cmA[j,b]·cmB[j,b] for each seed row j. Unlike the AMS
   inner product (evaluated this round and rejected: ±74% on this
   selective join, no honest tight certificate), the CM estimate is
   ONE-SIDED BY CONSTRUCTION: collisions only ever add mass, so
   est_j ≥ |A ⋈ B| deterministically for every seed — the certificate
   a planner can actually rely on (never under-provisions a shuffle).
   Certified: per-seed over_ok (the deterministic guarantee) plus the
   concentration flag (est − J) · width ≤ 2·n_A·n_B, all integer
   (measured extra/expected ≤ 1.04 across seeds and SFs).

Both reuse certified kernels (streaming/hll.hll_register_cols,
operators/sketches.cm_build) — the construction layer was hashed in
rounds 8-9; these hash the APPLICATION layer on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_tables
from .breadth38 import _AMS_GROUPS, _AMS_J
from .registry import query

_HLL_M = 64
_HLL_ALPHA = 0.709
_CMJ_DEPTH = 4
_CMJ_WIDTH = 8192

# per-day register grid over the DISTINCT (day, user) pairs — the
# day-partitioned form of breadth36's _HLL_GRID_SQL
_HLL_DAY_SQL = """
du AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
h AS (
  SELECT day,
         CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 8))
              AS BIGINT) % 64 AS bucket,
         33 - length(bin(CAST(('0x' || substring(
                 md5(CAST(user_id AS VARCHAR)), 9, 8)) AS BIGINT))) AS rho
  FROM du
),
dayregs AS (SELECT day, bucket, CAST(max(rho) AS BIGINT) AS reg
            FROM h GROUP BY day, bucket),
days AS (SELECT DISTINCT day FROM dayregs)
"""


@query("hll_rolling_uniques", oracle=f"""
WITH {_HLL_DAY_SQL},
win AS (
  SELECT s.day, r.bucket, CAST(max(r.reg) AS BIGINT) AS reg
  FROM days s JOIN dayregs r ON r.day BETWEEN s.day - 6 AND s.day
  GROUP BY s.day, r.bucket
),
agg AS (
  SELECT day,
         CAST(64 - count(*) AS BIGINT) AS v_zero,
         CAST(sum(CAST(8589934592 AS BIGINT) // CAST(power(2, reg)
              AS BIGINT))
              + (64 - count(*)) * CAST(8589934592 AS BIGINT)
              AS BIGINT) AS sum_scaled
  FROM win GROUP BY day
),
ex AS (
  SELECT d.day, CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_exact
  FROM days d JOIN events e
    ON CAST(e.ts AS DATE) BETWEEN d.day - 6 AND d.day
  GROUP BY d.day
),
est AS (
  SELECT a.day, ex.n_exact, a.v_zero,
         CASE WHEN ({_HLL_ALPHA} * 64 * 64 * 8589934592.0
                    / a.sum_scaled) <= 160.0 AND a.v_zero > 0
              THEN 64.0 * ln(64.0 / a.v_zero)
              ELSE {_HLL_ALPHA} * 64 * 64 * 8589934592.0
                   / a.sum_scaled END AS e
  FROM agg a JOIN ex ON a.day = ex.day
)
SELECT day, n_exact, v_zero,
       CAST(floor(e * 1000 + 0.5) AS BIGINT) AS est_milli,
       CAST(abs(e - n_exact) * 100 <= n_exact * 35 AS INT)
         AS within_35pct
FROM est ORDER BY day
""")
def hll_rolling_uniques(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale shape: events → ≤ m rows PER DAY once (map-side max
    combine); each window day then merges ≤ 7·m register rows. The
    range join's left side is the bounded day spine (broadcast), the
    right side the days·m grid — nothing data-sized is re-joined."""
    from ..streaming.hll import hll_register_cols

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    du = (ev.select(F.col("ts").cast("date").alias("day"), "user_id")
          .distinct())
    bucket, rho = hll_register_cols(F.col("user_id"), _HLL_M)
    dayregs = (du.select("day", bucket.alias("bucket"), rho.alias("rho"))
               .groupBy("day", "bucket")
               .agg(F.max("rho").cast("long").alias("reg")))
    days = dayregs.select(F.col("day").alias("wday")).distinct()
    win = (dayregs.join(
        F.broadcast(days),
        (F.col("day") >= F.date_sub(F.col("wday"), 6))
        & (F.col("day") <= F.col("wday")))
        .groupBy("wday", "bucket")
        .agg(F.max("reg").cast("long").alias("reg")))
    agg = (win.groupBy("wday").agg(
        (F.lit(_HLL_M) - F.count(F.lit(1))).cast("long").alias("v_zero"),
        (F.sum((F.lit(8589934592) / F.pow(F.lit(2.0), F.col("reg")))
               .cast("long"))
         + (F.lit(_HLL_M) - F.count(F.lit(1))) * F.lit(8589934592))
        .cast("long").alias("sum_scaled")))
    e_day = ev.select(F.col("ts").cast("date").alias("e_day"), "user_id")
    ex = (e_day.join(F.broadcast(days),
                     (F.col("e_day") >= F.date_sub(F.col("wday"), 6))
                     & (F.col("e_day") <= F.col("wday")))
          .groupBy("wday")
          .agg(F.count_distinct("user_id").cast("long").alias("n_exact")))
    raw = (F.lit(_HLL_ALPHA) * _HLL_M * _HLL_M * F.lit(8589934592.0)
           / F.col("sum_scaled"))
    e = F.when((raw <= 160.0) & (F.col("v_zero") > 0),
               F.lit(float(_HLL_M))
               * F.log(F.lit(float(_HLL_M)) / F.col("v_zero"))
               ).otherwise(raw)
    return (agg.join(ex, "wday")
            .select(F.col("wday").alias("day"), "n_exact", "v_zero",
                    F.floor(e * 1000 + F.lit(0.5)).cast("long")
                    .alias("est_milli"),
                    (F.abs(e - F.col("n_exact")) * 100
                     <= F.col("n_exact") * 35).cast("int")
                    .alias("within_35pct"))
            .orderBy("day"))


# --------------------------------------------------------------------------
# GROUPED AMS skew scorecard: one 64-counter vector PER event_type over
# user_id — the per-segment self-join-size monitor a partitioned
# warehouse keeps next to its zonemaps (F2/n² is the canonical skew
# score; a segment whose score spikes gets salting before its next
# join). Certified per type: the exact F2, the integer skew score
# (1e6·F2 DIV n² — exact integral division in BOTH engines, no float
# path), the median-of-means estimate ×32, and a ±50% containment
# flag on EVERY type row (measured worst 29.5% / 5.3% / 20.0% across
# the three SFs). Construction is ONE map-side-combined groupBy to
# |types|·64 cells; the per-type windows are over 4-row group-sum
# relations.
# --------------------------------------------------------------------------
@query("ams_skew_by_type", oracle=f"""
WITH seeds AS (SELECT unnest(range({_AMS_J})) AS j),
x AS (
  SELECT event_type, j,
         CAST(SUM(1 - 2 * (CAST(('0x' || substring(
              md5(CAST(j AS VARCHAR) || ':' || CAST(user_id AS VARCHAR)),
              1, 1)) AS BIGINT) % 2)) AS BIGINT) AS x
  FROM events CROSS JOIN seeds GROUP BY 1, 2),
s AS (SELECT event_type, j // 16 AS g, CAST(SUM(x * x) AS BIGINT) AS sg
      FROM x GROUP BY 1, 2),
r AS (SELECT event_type, sg,
             row_number() OVER (PARTITION BY event_type ORDER BY sg)
               AS rn
      FROM s),
est AS (SELECT event_type, CAST(SUM(sg) AS BIGINT) AS est_x32
        FROM r WHERE rn IN (2, 3) GROUP BY 1),
f2 AS (SELECT event_type, CAST(SUM(c * c) AS BIGINT) AS f2_exact,
              CAST(SUM(c) AS BIGINT) AS n
       FROM (SELECT event_type, user_id, count(*) AS c
             FROM events GROUP BY 1, 2)
       GROUP BY 1)
SELECT f2.event_type, f2.n, f2.f2_exact,
       CAST((1000000 * f2.f2_exact) // (f2.n * f2.n) AS BIGINT)
         AS skew_x1m,
       est.est_x32,
       CAST(abs(est.est_x32 - 32 * f2.f2_exact) * 100
            <= 50 * 32 * f2.f2_exact AS INT) AS within_50pct
FROM f2 JOIN est USING (event_type) ORDER BY f2.event_type
""")
def ams_skew_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from ..operators.sketches import ams_sign

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    seeds = F.array(*[F.lit(s) for s in range(_AMS_J)])
    x = (ev.select("event_type", F.explode(seeds).alias("j"),
                   F.col("user_id").alias("k"))
         .select("event_type", "j",
                 ams_sign(F.col("j"), F.col("k")).alias("s"))
         .groupBy("event_type", "j")
         .agg(F.sum("s").cast("long").alias("x")))
    s = (x.groupBy("event_type",
                   (F.col("j") / (_AMS_J // _AMS_GROUPS)).cast("int")
                   .alias("g"))
         .agg(F.sum(F.col("x") * F.col("x")).cast("long").alias("sg")))
    rk = s.withColumn("rn", F.row_number().over(
        W.partitionBy("event_type").orderBy("sg")))
    est = (rk.filter(F.col("rn").isin(_AMS_GROUPS // 2,
                                      _AMS_GROUPS // 2 + 1))
           .groupBy("event_type")
           .agg(F.sum("sg").cast("long").alias("est_x32")))
    f2 = (ev.groupBy("event_type", "user_id")
          .agg(F.count(F.lit(1)).alias("c"))
          .groupBy("event_type")
          .agg(F.sum(F.col("c") * F.col("c")).cast("long")
               .alias("f2_exact"),
               F.sum("c").cast("long").alias("n")))
    return (f2.join(est, "event_type")
            .select("event_type", "n", "f2_exact",
                    F.expr("CAST((1000000 * f2_exact) DIV (n * n) "
                           "AS LONG)").alias("skew_x1m"),
                    "est_x32",
                    (F.abs(F.col("est_x32") - F.lit(32) * F.col("f2_exact"))
                     * 100 <= F.lit(50 * 32) * F.col("f2_exact"))
                    .cast("int").alias("within_50pct"))
            .orderBy("event_type"))


@query("cm_join_size", oracle=f"""
WITH seeds AS (SELECT unnest(range({_CMJ_DEPTH})) AS seed),
ca AS (
  SELECT seed,
         CAST(('0x' || substring(md5(CAST(seed AS VARCHAR) || ':' ||
              CAST(l_partkey AS VARCHAR)), 1, 8)) AS BIGINT)
           % {_CMJ_WIDTH} AS bucket,
         CAST(count(*) AS BIGINT) AS cnt
  FROM lineitem CROSS JOIN seeds GROUP BY 1, 2
),
cb AS (
  SELECT seed,
         CAST(('0x' || substring(md5(CAST(seed AS VARCHAR) || ':' ||
              CAST(p_partkey AS VARCHAR)), 1, 8)) AS BIGINT)
           % {_CMJ_WIDTH} AS bucket,
         CAST(count(*) AS BIGINT) AS cnt
  FROM part CROSS JOIN seeds WHERE p_type LIKE 'PROMO%' GROUP BY 1, 2
),
ip AS (
  SELECT ca.seed, CAST(SUM(ca.cnt * cb.cnt) AS BIGINT) AS est_j
  FROM ca JOIN cb ON ca.seed = cb.seed AND ca.bucket = cb.bucket
  GROUP BY ca.seed
),
ex AS (SELECT CAST(count(*) AS BIGINT) AS j_exact
       FROM lineitem JOIN part ON l_partkey = p_partkey
       WHERE p_type LIKE 'PROMO%'),
nn AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM lineitem) AS n_a,
              (SELECT CAST(count(*) AS BIGINT) FROM part
               WHERE p_type LIKE 'PROMO%') AS n_b)
SELECT ip.seed, ip.est_j, ex.j_exact,
       CAST(ip.est_j >= ex.j_exact AS INT) AS over_ok,
       CAST((ip.est_j - ex.j_exact) * {_CMJ_WIDTH}
            <= 2 * nn.n_a * nn.n_b AS INT) AS within_2x_expected
FROM ip, ex, nn ORDER BY ip.seed
""")
def cm_join_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both grids are bounded (depth·width cells) and the small side
    broadcasts; at 100 TB the two relations are sketched
    independently (one map-side-combined pass each, possibly on
    different clusters or days) and the join-size question is
    answered from 2·depth·width cells without touching either table."""
    from ..operators.sketches import cm_build

    t = load_tables(spark, sf_dir, ("lineitem", "part"))
    li, part = t["lineitem"], t["part"]
    promo = part.filter(F.col("p_type").startswith("PROMO"))
    ca = cm_build(li.select("l_partkey"), "l_partkey",
                  _CMJ_DEPTH, _CMJ_WIDTH)
    cb = cm_build(promo.select("p_partkey"), "p_partkey",
                  _CMJ_DEPTH, _CMJ_WIDTH)
    ip = (ca.join(F.broadcast(cb.withColumnRenamed("cnt", "cnt_b")),
                  ["seed", "bucket"])
          .groupBy("seed")
          .agg(F.sum(F.col("cnt") * F.col("cnt_b")).cast("long")
               .alias("est_j")))
    ex = (li.join(promo, li.l_partkey == promo.p_partkey)
          .agg(F.count(F.lit(1)).cast("long").alias("j_exact")))
    nn = (li.agg(F.count(F.lit(1)).cast("long").alias("n_a"))
          .crossJoin(F.broadcast(
              promo.agg(F.count(F.lit(1)).cast("long").alias("n_b")))))
    return (ip.crossJoin(F.broadcast(ex))  # 4-row × 1-row
            .crossJoin(F.broadcast(nn))
            .select(F.col("seed").cast("long").alias("seed"), "est_j",
                    "j_exact",
                    (F.col("est_j") >= F.col("j_exact")).cast("int")
                    .alias("over_ok"),
                    ((F.col("est_j") - F.col("j_exact")) * _CMJ_WIDTH
                     <= 2 * F.col("n_a") * F.col("n_b")).cast("int")
                    .alias("within_2x_expected"))
            .orderBy("seed"))
