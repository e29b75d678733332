"""Round-9 fifth wave: an OWN-implementation HyperLogLog register
sketch, certified cell-exact the Count-Min way (the existing
sketch_hll_* rows certify Spark's built-in approx_count_distinct via
error/merge bounds; THIS one replays every register in DuckDB, so the
hash certifies the sketch construction itself), plus the streaming
MAX-merge maintainer — the fourth payload of the generation-manifest
protocol, and the only idempotent one (max forgives replays even
without batch-tag overwrite).

Determinism: bucket/rho come off the md5 bridge (first 8 hex nibbles
mod m; 33 − bit_length of the next 8 — `bin()` has identical
no-leading-zeros semantics in both engines, and w = 0 maps to 32 in
both, a 2⁻³² corner documented rather than special-cased). The
harmonic estimate avoids float-order drift entirely: Σ 2^(−reg) is
computed as the EXACT BIGINT Σ 2^(33−reg) (reg ≤ 33), so both engines
divide the same two exact integers — no partition-order ulp anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_tables
from .registry import query

_HLL_M = 64  # registers; RSE = 1.04/√64 ≈ 13%
_HLL_ALPHA = 0.709  # the standard alpha_64

_HLL_GRID_SQL = """
h AS (
  SELECT CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 8))
              AS BIGINT) % 64 AS bucket,
         33 - length(bin(CAST(('0x' || substring(
                 md5(CAST(user_id AS VARCHAR)), 9, 8)) AS BIGINT))) AS rho
  FROM events
),
regs AS (
  SELECT bucket, CAST(max(rho) AS BIGINT) AS reg FROM h GROUP BY bucket
)
"""


# --------------------------------------------------------------------------
# The register grid itself, cell-exact: every (bucket, max-rho) row
# hashed against DuckDB's replay of the same md5/bin construction.
# Buckets nobody hashed into are absent on both sides.
# --------------------------------------------------------------------------
@query("hll_grid_sketch", oracle=f"""
WITH {_HLL_GRID_SQL}
SELECT bucket, reg FROM regs ORDER BY bucket
""")
def hll_grid_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.hll import hll_grid

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return hll_grid(ev, "user_id", _HLL_M).orderBy("bucket")


# --------------------------------------------------------------------------
# The estimator over that grid, with the standard small-range
# (linear-counting) correction, against the exact distinct count:
# raw = α·m² / Σ2^(−reg); if raw ≤ 2.5m and zero registers exist,
# est = m·ln(m/V). The within-±35% flag is certified (measured error
# 13.9%/1.0%/16.0% at sf0.001/0.01/0.1 — RSE 13% at m=64, so 35% ≈
# 2.7σ holds with real margin on every SF).
# --------------------------------------------------------------------------
@query("hll_grid_estimate", oracle=f"""
WITH {_HLL_GRID_SQL},
spine AS (SELECT unnest(range(64)) AS bucket),
fullg AS (
  SELECT CAST(coalesce(r.reg, 0) AS BIGINT) AS reg
  FROM spine s LEFT JOIN regs r ON s.bucket = r.bucket
),
agg AS (
  SELECT CAST(sum(CASE WHEN reg = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS v_zero,
         CAST(sum(CAST(8589934592 AS BIGINT) // CAST(power(2, reg)
              AS BIGINT)) AS BIGINT) AS sum_scaled
  FROM fullg
),
ex AS (
  SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact FROM events
),
est AS (
  SELECT ex.n_exact, agg.v_zero,
         CASE WHEN ({_HLL_ALPHA} * 64 * 64 * 8589934592.0
                    / agg.sum_scaled) <= 160.0 AND agg.v_zero > 0
              THEN 64.0 * ln(64.0 / agg.v_zero)
              ELSE {_HLL_ALPHA} * 64 * 64 * 8589934592.0
                   / agg.sum_scaled END AS e
  FROM agg, ex
)
SELECT CAST(64 AS BIGINT) AS m, n_exact, v_zero,
       CAST(floor(e * 1000 + 0.5) AS BIGINT) AS est_milli,
       CAST(abs(e - n_exact) * 100 <= n_exact * 35 AS INT)
         AS within_35pct
FROM est
""")
def hll_grid_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.hll import hll_grid

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    regs = hll_grid(ev, "user_id", _HLL_M)
    spine = spark.range(_HLL_M).select(F.col("id").alias("bucket"))
    fullg = (spine.join(F.broadcast(regs), "bucket", "left")
             .select(F.coalesce("reg", F.lit(0)).cast("long")
                     .alias("reg")))
    # Σ 2^(33−reg) as exact BIGINTs: 8589934592 = 2^33, reg ≤ 33
    agg = fullg.agg(
        F.sum(F.when(F.col("reg") == 0, 1).otherwise(0)).cast("long")
        .alias("v_zero"),
        F.sum((F.lit(8589934592) / F.pow(F.lit(2.0), F.col("reg")))
              .cast("long")).cast("long").alias("sum_scaled"))
    ex = ev.agg(F.countDistinct("user_id").cast("long").alias("n_exact"))
    raw = (F.lit(_HLL_ALPHA) * 64 * 64 * F.lit(8589934592.0)
           / F.col("sum_scaled"))
    e = F.when((raw <= 160.0) & (F.col("v_zero") > 0),
               F.lit(64.0) * F.log(F.lit(64.0) / F.col("v_zero"))
               ).otherwise(raw)
    return (agg.crossJoin(F.broadcast(ex))
            .select(F.lit(64).cast("long").alias("m"), "n_exact",
                    "v_zero",
                    F.floor(e * 1000 + F.lit(0.5)).cast("long")
                    .alias("est_milli"),
                    (F.abs(e - F.col("n_exact")) * 100
                     <= F.col("n_exact") * 35).cast("int")
                    .alias("within_35pct")))


# --------------------------------------------------------------------------
# The streaming maintainer certified: user_id streams in as 4 source
# files → per-micro-batch ≤ m-row register partials → read-time
# MAX-merge → the SAME cell-exact grid relation hll_grid_sketch
# hashes. Max-merge is idempotent, so this is the one payload whose
# streamed state equals the batch sketch under ANY replay history —
# the pytest twin re-applies a batch and proves the grid unchanged.
# --------------------------------------------------------------------------
@query("stream_hll_cert", oracle=f"""
WITH {_HLL_GRID_SQL}
SELECT bucket, reg FROM regs ORDER BY bucket
""")
def stream_hll_cert(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib
    import os
    import shutil
    import tempfile

    from ..streaming.hll import read_hll, start_hll_stream

    ev = load_tables(spark, sf_dir, ("events",))["events"]

    h = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    work = os.path.join(tempfile.gettempdir(), f"spark_graft_shll_{h}")
    shutil.rmtree(work, ignore_errors=True)
    src = os.path.join(work, "src")
    ev.select("user_id").repartition(4).write.parquet(src)
    stream = (spark.readStream.schema("user_id long")
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = start_hll_stream(stream, os.path.join(work, "state"),
                         os.path.join(work, "ckpt"), "user_id", _HLL_M)
    q.awaitTermination(300)
    out = read_hll(spark, os.path.join(work, "state")).orderBy("bucket")
    out = out.localCheckpoint(eager=True)
    shutil.rmtree(work, ignore_errors=True)
    return out
