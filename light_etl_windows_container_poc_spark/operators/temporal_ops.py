"""Temporal join/window operators beyond the as-of join: bucketed range
join and time-range rolling windows.

The range join is the shape Spark lacks natively: a theta-join
(|t_a − t_b| ≤ gap) executed as an EQUI-join on time buckets + filter.
Each left row probes its own bucket and the next one — every qualifying
pair shares a probed bucket (gap ≤ bucket width), so candidates are
bounded by bucket co-occupancy, never the O(n²) cross product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def range_join_pairs(df: DataFrame, key_col: str, ts_col: str, id_col: str,
                     max_gap_seconds: int = 60) -> DataFrame:
    """Ordered pairs (a earlier, b within ``max_gap_seconds`` after a) per
    key. Output: a_id, b_id, gap_us."""
    gap_us = max_gap_seconds * 1_000_000
    us = F.unix_micros(F.col(ts_col))
    # `div` keeps the bucket computation in 64-bit integer arithmetic:
    # epoch micros (~1.7e15) are safe today, but a float divide would break
    # silently once the numerator exceeds double's 2^53 mantissa (nanos, or
    # far-future micros) — boundary rows would mis-bucket and pairs with
    # tb-ta <= gap could land 2 buckets apart and be missed.
    base = (df.select(F.col(key_col).alias("k"), F.col(id_col).alias("id"),
                      us.alias("t"))
            .withColumn("bucket", F.expr(f"t div {gap_us}")))
    left = (base.select("k", F.col("id").alias("a_id"), F.col("t").alias("ta"),
                        F.explode(F.array(F.col("bucket"),
                                          F.col("bucket") + 1)).alias("probe")))
    right = base.select("k", F.col("id").alias("b_id"), F.col("t").alias("tb"),
                        F.col("bucket").alias("probe"))
    return (left.join(right, ["k", "probe"])
            .filter(((F.col("tb") > F.col("ta"))
                     | ((F.col("tb") == F.col("ta"))
                        & (F.col("b_id") > F.col("a_id"))))
                    & (F.col("tb") - F.col("ta") <= gap_us))
            .select("a_id", "b_id", (F.col("tb") - F.col("ta")).alias("gap_us"))
            .dropDuplicates(["a_id", "b_id"]))


def rolling_time_window(df: DataFrame, key_col: str, ts_col: str,
                        value_units, window_seconds: int = 3600,
                        out_col: str = "rolling_units") -> DataFrame:
    """Time-RANGE rolling aggregate: for each row, the exact sum of
    ``value_units`` over the trailing ``window_seconds`` for the same key.
    One shuffle on the key; the frame is rangeBetween on epoch micros, so
    ties (equal timestamps) are all included — deterministic regardless of
    physical row order."""
    us = F.unix_micros(F.col(ts_col))
    w = (W.partitionBy(key_col).orderBy(us.alias("t"))
         .rangeBetween(-window_seconds * 1_000_000, 0))
    return df.withColumn(out_col, F.sum(value_units).over(w))
