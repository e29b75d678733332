"""Query/oracle registry.

Each registered callable has signature ``(spark, sf_dir) -> DataFrame``.
``oracle`` is the ANSI-SQL twin DuckDB runs on the same parquet tables;
column names/aliases MUST match the Spark result exactly (the driver's
compare sorts columns by name before hashing values). Ops whose semantics
aren't SQL-expressible register with ``oracle=None`` (rows-only check).
"""

from __future__ import annotations

import hashlib
import os
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def cert_work_dir(tag: str, sf_dir: str) -> str:
    """Scratch directory for certification queries that materialize
    state (stream ingests, index builds, sink round-trips). md5(sf_dir)
    keeps concurrent SFs apart; the pid keeps concurrent PROCESSES at
    the same SF apart — two runs sharing an md5-only path (builder gate
    + a stray pytest) corrupted each other's streaming state mid-round-10,
    so every filesystem-touching cert routes through here. Callers own
    the rmtree (before AND after)."""
    h = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    return os.path.join(tempfile.gettempdir(),
                        f"spark_graft_{tag}_{h}_{os.getpid()}")


def query(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn
    return deco
