"""SparkSession factory tuned for this engine.

Local testing runs on ``local[N]`` (single JVM); the same settings are the
right defaults on a real cluster except ``shuffle.partitions``, which AQE
coalesces downward from an intentionally generous initial value, so the
one number scales from laptop to 1000 executors without retuning.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Session timezone is pinned to UTC so timestamp semantics match the
# DuckDB oracle (naive-UTC) and are cluster-location-independent.
_DEFAULTS = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # ~128 MB scan splits: big enough to amortize task overhead at 100 TB,
    # small enough that a partition's working set fits executor memory.
    "spark.sql.files.maxPartitionBytes": "134217728",
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.ui.enabled": "false",
    "spark.sql.shuffle.partitions": "32",
}


def get_spark(app_name: str = "light_etl_windows_container_poc_spark",
              master: str | None = None,
              shuffle_partitions: int | None = None,
              extra_conf: dict | None = None) -> SparkSession:
    """Build (or fetch) the tuned SparkSession.

    ``SPARK_GRAFT_CPUS`` controls local parallelism (default ``*``).
    On a real cluster pass ``master=None`` with an external master URL via
    spark-submit; every other conf still applies.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"

    builder = SparkSession.builder.appName(app_name).master(master)
    conf = dict(_DEFAULTS)
    if shuffle_partitions is not None:
        conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
