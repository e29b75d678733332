"""Data-quality operators — reference parity.

- per-column null counts: reference `enhanced_tasks.py:93-95`
- file/row validation rules: reference `pattern_watcher_configurable.py:240-255`
  and `config/pattern_config.yaml` (max size, require headers, skip empty)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def null_profile(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Per-column profile: null / blank / distinct counts, one output row
    per column.

    Single pass over the data (one agg computing 3 metrics × N columns),
    then an unpivot of the 1-row result — profiling 100 TB costs exactly
    one scan, not one scan per column.
    """
    cols = cols or df.columns
    aggs = []
    for c in cols:
        col = F.col(c)
        aggs.append(F.sum(F.when(col.isNull(), 1).otherwise(0)).alias(f"null__{c}"))
        blank = F.when(col.cast("string") == "", 1).otherwise(0)
        aggs.append(F.sum(F.when(col.isNull(), 0).otherwise(blank)).alias(f"blank__{c}"))
        aggs.append(F.count_distinct(col).alias(f"distinct__{c}"))
    wide = df.agg(*aggs)
    metrics = wide.unpivot([], wide.columns, "metric", "value")
    split = metrics.select(
        F.split_part("metric", F.lit("__"), F.lit(1)).alias("kind"),
        # everything after the FIRST '__': a column whose own name contains
        # '__' (legal after sanitize) must not truncate to its first segment
        F.expr("substring(metric, instr(metric, '__') + 2)").alias("col_name"),
        "value")
    return (split.groupBy("col_name")
            .pivot("kind", ["null", "blank", "distinct"])
            .agg(F.first("value"))
            .withColumnsRenamed({"null": "null_count", "blank": "blank_count",
                                 "distinct": "distinct_count"}))


def validate_rows(df: DataFrame, required_cols: list[str],
                  min_len: int = 1, max_len: int | None = None,
                  len_col: str | None = None) -> DataFrame:
    """Row-level validation flag mirroring the reference's file checks:
    required fields present, size within [min_len, max_len]."""
    cond = F.lit(True)
    for c in required_cols:
        cond = cond & F.col(c).isNotNull()
    if len_col is not None:
        cond = cond & (F.col(len_col) >= min_len)
        if max_len is not None:
            cond = cond & (F.col(len_col) <= max_len)
    return df.withColumn("is_valid", cond)


def snapshot_diff(old: DataFrame, new: DataFrame, keys: list[str],
                  compare_col: str, status_col: str = "status") -> DataFrame:
    """Data-reconciliation diff between two table snapshots: classify every
    key as added / removed / changed / unchanged via one full outer join.

    The ETL audit companion to merge_upsert: run it after a load to verify
    the delta is exactly what the batch intended. One shuffle on the keys.
    """
    o = old.select(*keys, F.col(compare_col).alias("old_val"))
    n = new.select(*keys, F.col(compare_col).alias("new_val"))
    joined = o.join(n, keys, "full_outer")
    status = (F.when(F.col("old_val").isNull(), "added")
              .when(F.col("new_val").isNull(), "removed")
              .when(F.col("old_val") != F.col("new_val"), "changed")
              .otherwise("unchanged"))
    return joined.withColumn(status_col, status)
