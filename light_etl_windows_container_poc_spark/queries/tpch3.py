"""Relational suite, third batch: the remaining classic TPC-H shapes the
warehouse should serve (Q8/Q9/Q12/Q21 adapted to the synthetic schema —
no partsupp/shipmode/commitdate columns, so cost uses p_retailprice and
"late" is measured as l_shipdate vs o_orderdate + 60 days).

Like the rest of §2.2 these are the analytics the reference's Postgres
star schema existed to answer (reference `tasks_postgres.py:237-263`
shows only bare job stats — the dim_/fact_ tables themselves are queried
externally, so the full join/agg repertoire belongs here).

Scale notes: every dim side (region/nation/supplier/part at any SF) is
broadcast; the only shuffles are fact-fact joins on their keys and the
final aggregations. Money math is exact integer units (see tpch._units)
so the DuckDB oracle hash-matches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_tables
from .registry import query
from .tpch import _rev_units, _units


_LATE = "INTERVAL 60 DAYS"  # adapted lateness threshold (no l_commitdate)


# --------------------------------------------------------------------------
# q8: national market share — share of a supplier nation's revenue within
# one customer region, per order year (7-table join + conditional ratio)
# --------------------------------------------------------------------------
@query("q8_market_share", oracle="""
WITH base AS (
  SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
         CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)
           AS rev_units,
         n2.n_name AS supp_nation
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region   ON n1.n_regionkey = r_regionkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  JOIN part     ON l_partkey = p_partkey
  WHERE r_name = 'ASIA' AND p_type = 'STANDARD'
    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
)
SELECT o_year,
       CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN rev_units ELSE 0 END)
            AS BIGINT) AS nation_units,
       CAST(sum(rev_units) AS BIGINT) AS total_units,
       CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN rev_units ELSE 0 END)
            AS DOUBLE) / CAST(sum(rev_units) AS DOUBLE) AS mkt_share
FROM base
GROUP BY o_year
ORDER BY o_year
""")
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir,
                    ("lineitem", "orders", "customer", "nation", "region",
                     "supplier", "part"))
    n1 = t["nation"].alias("n1")
    n2 = t["nation"].select(F.col("n_nationkey").alias("n2_key"),
                            F.col("n_name").alias("supp_nation"))
    asia_cust = (t["customer"]
                 .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n_nationkey"))
                 .join(F.broadcast(t["region"].filter(F.col("r_name") == "ASIA")),
                       F.col("n_regionkey") == F.col("r_regionkey"), "left_semi")
                 .select("c_custkey"))
    base = (t["lineitem"]
            .join(t["orders"]
                  .filter((F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
                          & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))),
                  F.col("l_orderkey") == F.col("o_orderkey"))
            .join(asia_cust, F.col("o_custkey") == F.col("c_custkey"), "left_semi")
            .join(F.broadcast(t["part"].filter(F.col("p_type") == "STANDARD")),
                  F.col("l_partkey") == F.col("p_partkey"), "left_semi")
            .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
            .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
            .select(F.year("o_orderdate").cast("long").alias("o_year"),
                    _rev_units().alias("rev_units"),
                    "supp_nation"))
    nation_units = F.sum(F.when(F.col("supp_nation") == "NATION_3",
                                F.col("rev_units")).otherwise(F.lit(0)))
    return (base.groupBy("o_year")
            .agg(nation_units.alias("nation_units"),
                 F.sum("rev_units").alias("total_units"))
            .select("o_year", "nation_units", "total_units",
                    (F.col("nation_units").cast("double")
                     / F.col("total_units").cast("double")).alias("mkt_share"))
            .orderBy("o_year"))


# --------------------------------------------------------------------------
# q9: product-line profit by supplier nation × year (profit = revenue −
# retail cost of quantity; partsupp-less adaptation)
# --------------------------------------------------------------------------
@query("q9_product_profit", oracle="""
SELECT n_name AS nation,
       CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)
              - CAST(round(p_retailprice * l_quantity * 10000) AS BIGINT))
            AS BIGINT) AS profit_units
FROM lineitem
JOIN part     ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN orders   ON o_orderkey = l_orderkey
WHERE p_name LIKE '%widget%'
GROUP BY n_name, o_year
ORDER BY n_name, o_year DESC
""")
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("lineitem", "part", "supplier", "nation",
                                    "orders"))
    profit = (_rev_units()
              - _units(F.col("p_retailprice") * F.col("l_quantity"), 10_000))
    return (t["lineitem"]
            .join(F.broadcast(t["part"].filter(F.col("p_name").like("%widget%"))),
                  F.col("p_partkey") == F.col("l_partkey"))
            .join(F.broadcast(t["supplier"]), F.col("s_suppkey") == F.col("l_suppkey"))
            .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
            .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
            .groupBy(F.col("n_name").alias("nation"),
                     F.year("o_orderdate").cast("long").alias("o_year"))
            .agg(F.sum(profit).alias("profit_units"))
            .orderBy("nation", F.desc("o_year")))


# --------------------------------------------------------------------------
# q12: priority counts by lateness bucket (conditional aggregation over the
# orders⋈lineitem join; shipmode-less adaptation)
# --------------------------------------------------------------------------
@query("q12_late_priority", oracle="""
SELECT CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
            THEN 'LATE' ELSE 'ONTIME' END AS ship_bucket,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY ship_bucket
ORDER BY ship_bucket
""")
def q12_late_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("orders", "lineitem"))
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    bucket = (F.when(F.col("l_shipdate")
                     > F.col("o_orderdate") + F.expr(_LATE), "LATE")
              .otherwise("ONTIME"))
    return (t["orders"]
            .join(t["lineitem"]
                  .filter((F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
                          & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))),
                  F.col("o_orderkey") == F.col("l_orderkey"))
            .groupBy(bucket.alias("ship_bucket"))
            .agg(F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
                 F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"))
            .orderBy("ship_bucket"))


# --------------------------------------------------------------------------
# q21: suppliers who were the ONLY late supplier on a multi-supplier
# finished order (double correlated EXISTS / NOT EXISTS)
# --------------------------------------------------------------------------
@query("q21_waiting_supplier", oracle="""
SELECT s_name, count(*) AS numwait
FROM supplier, lineitem l1, orders
WHERE s_suppkey = l1.l_suppkey
  AND o_orderkey = l1.l_orderkey
  AND o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY s_name
ORDER BY numwait DESC, s_name
""")
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    # EXISTS(other supplier)      ⇔ order has ≥2 distinct suppliers overall
    # NOT EXISTS(other late supp) ⇔ order's late-supplier set == {this one}
    # Both rewrites are per-order aggregates joined back — two shuffles on
    # l_orderkey instead of two correlated subquery scans.
    t = load_tables(spark, sf_dir, ("supplier", "lineitem", "orders"))
    li = t["lineitem"]
    supp_per_order = (li.groupBy(F.col("l_orderkey").alias("ok_all"))
                      .agg(F.count_distinct("l_suppkey").alias("n_supp")))
    late = (li.join(t["orders"].filter(F.col("o_orderstatus") == "F")
                    .select("o_orderkey", "o_orderdate"),
                    F.col("l_orderkey") == F.col("o_orderkey"))
            .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr(_LATE))
            .select("l_orderkey", "l_suppkey"))
    late_per_order = (late.groupBy(F.col("l_orderkey").alias("ok_late"))
                      .agg(F.count_distinct("l_suppkey").alias("n_late")))
    return (late
            .join(supp_per_order, F.col("l_orderkey") == F.col("ok_all"))
            .join(late_per_order, F.col("l_orderkey") == F.col("ok_late"))
            .filter((F.col("n_supp") >= 2) & (F.col("n_late") == 1))
            .join(F.broadcast(t["supplier"]),
                  F.col("s_suppkey") == F.col("l_suppkey"))
            .groupBy("s_name")
            .agg(F.count(F.lit(1)).alias("numwait"))
            .orderBy(F.desc("numwait"), "s_name"))
