"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()`` / ``oracle_sql()`` expose the SURVEY.md §2 inventory for the
driver's DuckDB hash-compare at sf0.01.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# importable regardless of the caller's cwd / sys.path
_HERE = os.path.dirname(os.path.abspath(__file__))
if _HERE not in sys.path:
    sys.path.insert(0, _HERE)

from light_etl_windows_container_poc_spark.queries import ORACLES, QUERIES  # noqa: E402

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape) on /root/testdata/sf0.001."""
    return QUERIES["q1_pricing_summary"](spark, _SMOKE_SF_DIR)


# The round-1 correctness run certified only the first 50 registered
# queries (driver budget), leaving 74 registered-but-unchecked. Order the
# dict so NOT-yet-certified entries run first: whatever budget the driver
# has, it certifies new surface before re-certifying known-good rows.
_R01_CERTIFIED = [
    "q1_pricing_summary", "q3_shipping_priority", "q4_order_priority",
    "q5_local_supplier", "q6_forecast_revenue", "q7_volume_shipping",
    "q10_returned_items", "q14_promo_effect", "q18_large_orders",
    "q19_discount_revenue", "topk_per_group", "window_running",
    "window_lag_delta", "agg_rollup", "agg_cube", "pivot_wide",
    "unpivot_long", "set_ops", "join_anti", "subquery_scalar",
    "percentiles", "q11_important_parts", "q13_cust_distribution",
    "q15_top_supplier", "q16_supplier_counts", "q17_small_qty_revenue",
    "q22_sales_opportunity", "agg_approx_distinct", "agg_grouping_sets",
    "string_funcs", "time_functions", "array_funcs", "map_funcs",
    "window_ntile_firstlast", "q2_min_cost_supplier", "q20_promo_suppliers",
    "q8_market_share", "q9_product_profit", "q12_late_priority",
    "q21_waiting_supplier", "asof_join", "sessionize", "time_window_agg",
    "range_join", "window_rolling_time", "etl_clean_columns",
    "etl_type_coercion", "etl_drop_empty_rows", "etl_dedup_rows",
    "etl_enrich_metadata",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    certified = set(_R01_CERTIFIED)
    head = [n for n in QUERIES if n not in certified]
    tail = [n for n in _R01_CERTIFIED if n in QUERIES]
    return {n: QUERIES[n] for n in (*head, *tail)}


def oracle_sql() -> dict[str, str]:
    """DuckDB-dialect ANSI-SQL twins for every SQL-expressible query."""
    return dict(ORACLES)
