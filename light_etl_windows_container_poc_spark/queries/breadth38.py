"""Round-10 breadth, second wave: the AMS second-frequency-moment
sketch (self-join-size / skew estimation — the statistic a join planner
wants before committing a 100 TB shuffle) certified at CONSTRUCTION
level like the Count-Min / HLL-grid / qsketch families, plus the two
streaming maintainers that finish the sketch-family story: every
mergeable summary the repo ships (Misra-Gries, Count-Min, histogram,
HLL grid, qsketch, KMV, AMS) now has a construction certificate, an
exact-merge statement, AND a generation-manifest streaming maintainer.

AMS (Alon-Matias-Szegedy 1996): X_j = Σ_v f_v·sign_j(v) with ±1 signs
from the md5 bridge; E[X_j²] = F2 = Σ f_v² exactly, which is the size
of the self-join on the key — the quantity that blows up quadratically
under skew. X_j is linear in the rows, so the sketch merges by PLAIN
ADDITION: `ams_f2_sketch` hashes the segment-built-then-merged vector
against DuckDB's direct one-shot construction (the merge theorem and
the cell-exact construction in one relation), and `stream_ams_cert`
hashes the micro-batched streamed state against the SAME direct oracle.

Determinism bridges: sign bit = first md5 hex nibble mod 2 (exact in
both engines), all counter arithmetic integer (X_j ≤ n keeps X_j²
within BIGINT), the median-of-means estimate kept scale-factored as
exact integers (no division), every oracle output CAST (HUGEINT guard).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_tables
from .registry import cert_work_dir, query

_AMS_J = 64          # counters
_AMS_GROUPS = 4      # median-of-means groups (16 counters each)
_KMV_STREAM_K = 64   # stream sketch size (>= 64 distinct keys at every SF)

# the shared construction replay: the signed counter vector over
# orders.o_custkey. sign_j(v) = 1 − 2·(first md5 nibble of "j:v" mod 2).
_AMS_SQL = f"""
seeds AS (SELECT unnest(range({_AMS_J})) AS j),
x AS (
  SELECT j,
         CAST(SUM(1 - 2 * (CAST(('0x' || substring(
              md5(CAST(j AS VARCHAR) || ':' || CAST(o_custkey AS VARCHAR)),
              1, 1)) AS BIGINT) % 2)) AS BIGINT) AS x
  FROM orders CROSS JOIN seeds GROUP BY j)
"""


def _ams_direct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketches import ams_build

    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    return ams_build(orders.select("o_custkey"), "o_custkey", _AMS_J)


# --------------------------------------------------------------------------
# Construction + exact merge in one hashed relation: Spark builds the
# vector on four DISJOINT segments (o_orderkey % 4) and merges by
# addition; the oracle replays the direct one-shot construction. The
# hash passes iff merge(segments) == direct, cell-for-cell — X_j's
# linearity, the property that makes the streamed and tree-reduced
# sketches exact rather than approximately mergeable.
# --------------------------------------------------------------------------
@query("ams_f2_sketch", oracle=f"""
WITH {_AMS_SQL}
SELECT CAST(j AS BIGINT) AS j, x FROM x ORDER BY j
""")
def ams_f2_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale shape: each segment build is one map-side-combined groupBy
    to 64 cells (shuffle = tasks×64 rows, input-size independent); the
    merge is a groupBy over 4×64 rows."""
    from ..operators.sketches import ams_build

    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    segs = [ams_build(orders.filter(F.col("o_orderkey") % 4 == i)
                      .select("o_custkey"), "o_custkey", _AMS_J)
            for i in range(4)]
    u = segs[0]
    for s in segs[1:]:
        u = u.unionByName(s)
    merged = u.groupBy("j").agg(F.sum("x").cast("long").alias("x"))
    return (merged.select(F.col("j").cast("long").alias("j"), "x")
            .orderBy("j"))


# --------------------------------------------------------------------------
# The estimator's guarantee, in exact integers: median-of-means over
# 4 groups of 16 counters, scale-factored by 2·per = 32 so no division
# ever happens — est_x32 = S_(2) + S_(3)
# (the two middle group sums of Σ x_j²) is compared against
# 32·F2_exact, where F2_exact = Σ f_v² is the true self-join size.
# Measured relative error at the three SFs: 15.7% / 6.6% / 20.2% —
# the ±35% flag holds with margin (theory: Var[mean] = 2F2²/16 →
# σ ≈ 0.35·F2 per group mean; the median of four tightens it).
# --------------------------------------------------------------------------
@query("ams_f2_bounds", oracle=f"""
WITH {_AMS_SQL},
s AS (SELECT j // 16 AS g, CAST(SUM(x * x) AS BIGINT) AS sg
      FROM x GROUP BY g),
r AS (SELECT sg, row_number() OVER (ORDER BY sg) AS rn FROM s),
est AS (SELECT CAST(SUM(sg) AS BIGINT) AS est_x32 FROM r WHERE rn IN (2, 3)),
f2 AS (SELECT CAST(SUM(c * c) AS BIGINT) AS f2_exact,
              CAST(SUM(c) AS BIGINT) AS n_rows
       FROM (SELECT count(*) AS c FROM orders GROUP BY o_custkey))
SELECT f2.n_rows, f2.f2_exact, est.est_x32,
       CAST(32 * f2.f2_exact AS BIGINT) AS f2_x32,
       CAST(abs(est.est_x32 - 32 * f2.f2_exact) * 100
            <= 35 * 32 * f2.f2_exact AS INT) AS within_35pct
FROM est, f2
""")
def ams_f2_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketches import ams_f2_estimate

    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    est = ams_f2_estimate(_ams_direct(spark, sf_dir), _AMS_J, _AMS_GROUPS) \
        .withColumnRenamed("est_x2p", "est_x32")
    f2 = (orders.groupBy("o_custkey")
          .agg(F.count(F.lit(1)).alias("c"))
          .agg(F.sum(F.col("c") * F.col("c")).cast("long")
               .alias("f2_exact"),
               F.sum("c").cast("long").alias("n_rows")))
    return (f2.crossJoin(F.broadcast(est))  # two 1-row relations
            .select("n_rows", "f2_exact", "est_x32",
                    (F.lit(32) * F.col("f2_exact")).cast("long")
                    .alias("f2_x32"),
                    (F.abs(F.col("est_x32") - F.lit(32) * F.col("f2_exact"))
                     * 100 <= F.lit(35 * 32) * F.col("f2_exact"))
                    .cast("int").alias("within_35pct")))


# --------------------------------------------------------------------------
# Streaming AMS certification: a REAL availableNow stream lands
# per-micro-batch partial vectors; because X_j merges by ADDITION, the
# read-time-merged state is CELL-FOR-CELL identical to the one-shot
# batch vector — the streamed state answers the SAME direct-construction
# oracle as ams_f2_sketch (the stream_countmin_cert statement, for the
# sixth generation-manifest payload).
# --------------------------------------------------------------------------
@query("stream_ams_cert", oracle=f"""
WITH {_AMS_SQL}
SELECT CAST(j AS BIGINT) AS j, x FROM x ORDER BY j
""")
def stream_ams_cert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders.o_custkey streams in as 4 source files → 4 micro-batch
    partial vectors → manifest-aware read-time merge → the direct
    oracle. Rebuilt per call (the stream_countmin_cert pattern)."""
    from ..streaming.ams import read_ams, start_ams_stream

    orders = load_tables(spark, sf_dir, ("orders",))["orders"]

    work = cert_work_dir("sams", sf_dir)
    shutil.rmtree(work, ignore_errors=True)
    src = os.path.join(work, "src")
    orders.select("o_custkey").repartition(4).write.parquet(src)
    stream = (spark.readStream.schema("o_custkey long")
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = start_ams_stream(stream, os.path.join(work, "state"),
                         os.path.join(work, "ckpt"), "o_custkey", _AMS_J)
    q.awaitTermination(300)
    vec = read_ams(spark, os.path.join(work, "state"))
    out = (vec.select(F.col("j").cast("long").alias("j"), "x")
           .orderBy("j").localCheckpoint(eager=True))
    shutil.rmtree(work, ignore_errors=True)
    return out


# --------------------------------------------------------------------------
# Streaming KMV certification: per-batch k-smallest partials, merged at
# read time by union-then-truncate (exact by the subset theorem in
# streaming/kmv.py), equal the one-shot sketch of the whole stream —
# hashed as (n_exact, kth_min, est_rounded, within_50pct) against
# DuckDB's direct construction. k=64 → theoretical RSE
# 1/sqrt(k−2) ≈ 12.7%; measured 3.4% / 29.6% / 6.9% at the three SFs,
# so the ±50% flag holds with margin. The seventh manifest payload.
# --------------------------------------------------------------------------
@query("stream_kmv_cert", oracle=f"""
WITH h AS (SELECT DISTINCT md5(CAST(o_custkey AS VARCHAR)) AS h
           FROM orders),
rk AS (SELECT h, row_number() OVER (ORDER BY h) AS r,
              count(*) OVER () AS n
       FROM h),
kth AS (SELECT CAST(n AS BIGINT) AS n_exact, h AS kth_min,
               ({_KMV_STREAM_K} - 1) /
               (CAST(('0x' || substring(h, 1, 13)) AS BIGINT)
                / 4503599627370496.0) AS est
        FROM rk WHERE r = {_KMV_STREAM_K})
SELECT n_exact, kth_min,
       CAST(floor(est + 0.5) AS BIGINT) AS est_rounded,
       CAST(abs(est - n_exact) * 100 <= n_exact * 50 AS INT)
         AS within_50pct
FROM kth
""")
def stream_kmv_cert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders.o_custkey streams in as 4 source files (custkeys REPEAT
    across batches, so the union-dedup path is exercised for real) →
    per-batch truncated hash sets → read-time merged sketch → the
    estimate relation."""
    from ..streaming.kmv import read_kmv, start_kmv_stream

    orders = load_tables(spark, sf_dir, ("orders",))["orders"]

    work = cert_work_dir("skmv", sf_dir)
    shutil.rmtree(work, ignore_errors=True)
    src = os.path.join(work, "src")
    orders.select("o_custkey").repartition(4).write.parquet(src)
    stream = (spark.readStream.schema("o_custkey long")
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = start_kmv_stream(stream, os.path.join(work, "state"),
                         os.path.join(work, "ckpt"), "o_custkey",
                         _KMV_STREAM_K)
    q.awaitTermination(300)
    sk = read_kmv(spark, os.path.join(work, "state"), _KMV_STREAM_K)

    n_exact = (orders.select("o_custkey").distinct().count())
    kth = (sk.orderBy(F.desc("h")).limit(1)
           .select(F.lit(int(n_exact)).cast("long").alias("n_exact"),
                   F.col("h").alias("kth_min"),
                   ((F.lit(_KMV_STREAM_K - 1))
                    / (F.conv(F.substring("h", 1, 13), 16, 10)
                       .cast("double") / F.lit(4503599627370496.0)))
                   .alias("est")))
    out = (kth.select(
        "n_exact", "kth_min",
        F.floor(F.col("est") + F.lit(0.5)).cast("long")
        .alias("est_rounded"),
        (F.abs(F.col("est") - F.col("n_exact")) * 100
         <= F.col("n_exact") * 50).cast("int").alias("within_50pct"))
        .localCheckpoint(eager=True))
    shutil.rmtree(work, ignore_errors=True)
    return out
