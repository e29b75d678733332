"""Query/oracle registry.

Each registered callable has signature ``(spark, sf_dir) -> DataFrame``.
``oracle`` is the ANSI-SQL twin DuckDB runs on the same parquet tables;
column names/aliases MUST match the Spark result exactly (the driver's
compare sorts columns by name before hashing values). Ops whose semantics
aren't SQL-expressible register with ``oracle=None`` (rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn
    return deco
