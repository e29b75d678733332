"""Round-5 breadth, tenth wave: storage-layout round-trip
certifications — the partitioned sink and small-file compaction proven
against direct-scan oracles, upgrading two tests-only §2.1 rows to
driver-certified (the src_excel round-trip pattern applied to sinks).

Both queries write REAL files (to a per-SF temp dir), read them back
through the production sink/compaction code paths, and aggregate — the
oracle aggregates the original table directly, so a partition-pruning
bug, a dropped row in the rewrite, or a schema drift flips the hash.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_tables
from .registry import cert_work_dir, query


def _tmp(tag: str, sf_dir: str) -> str:
    return cert_work_dir(tag, sf_dir)


# --------------------------------------------------------------------------
# Partitioned sink round-trip: write documents partitioned by lang, read
# back WITH a partition filter, aggregate — pruning must not lose rows.
# --------------------------------------------------------------------------
@query("sink_partitioned_roundtrip", oracle="""
SELECT lang, source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS n_chars_total
FROM documents
WHERE lang <> 'xx'
GROUP BY lang, source
ORDER BY lang, source
""")
def sink_partitioned_roundtrip(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """write_partitioned → read-back with a partition-column filter
    (exercising directory pruning on the written layout) → aggregate.
    The filter excludes a nonexistent partition value, so the kept set
    equals the full table and the oracle is a direct GROUP BY — but the
    scan still plans PartitionFilters over the lang directories, which
    is the behavior being certified."""
    from ..sinks import write_partitioned

    docs = (load_tables(spark, sf_dir, ("documents",))["documents"]
            .select("doc_id", "lang", "source", "n_chars"))
    path = _tmp("sinkpart", sf_dir)
    write_partitioned(docs, path, ["lang"])
    back = spark.read.parquet(path).filter(F.col("lang") != "xx")
    return (back.groupBy("lang", "source")
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                 F.sum("n_chars").cast("long").alias("n_chars_total"))
            .orderBy("lang", "source"))


# --------------------------------------------------------------------------
# Compaction round-trip: shatter nation into many tiny files, compact
# with the production operator, aggregate the compacted result.
# --------------------------------------------------------------------------
@query("compaction_roundtrip", oracle="""
SELECT n_regionkey,
       CAST(count(*) AS BIGINT) AS n_nations,
       CAST(sum(n_nationkey) AS BIGINT) AS key_sum
FROM nation
GROUP BY n_regionkey
ORDER BY n_regionkey
""")
def compaction_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """25-way shatter (one row per file — the pathological small-file
    layout) → compact_files (metadata-only sizing, one distributed
    rewrite) → aggregate the compacted directory. Row loss or
    duplication in either hop flips the hash."""
    from ..operators.scale import compact_files

    nation = load_tables(spark, sf_dir, ("nation",))["nation"]
    src = _tmp("compact_src", sf_dir)
    dst = _tmp("compact_dst", sf_dir)
    nation.repartition(25).write.mode("overwrite").parquet(src)
    compact_files(spark, src, dst)
    back = spark.read.parquet(dst)
    return (back.groupBy("n_regionkey")
            .agg(F.count(F.lit(1)).cast("long").alias("n_nations"),
                 F.sum("n_nationkey").cast("long").alias("key_sum"))
            .orderBy("n_regionkey"))
