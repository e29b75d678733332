"""Relational suite, second batch: grouped-subquery and left-join shapes
(TPC-H Q11/Q13/Q15/Q16/Q17/Q22 adapted to the synthetic schema — no
partsupp table, so part-supplier relations go through lineitem).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_tables
from .registry import query
from .tpch import _rev_units, _ts, _units


# --------------------------------------------------------------------------
# q11-ish: parts whose revenue exceeds a fraction of the total (HAVING
# against a global scalar aggregate)
# --------------------------------------------------------------------------
@query("q11_important_parts", oracle="""
WITH v AS (
  SELECT l_partkey,
         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS val_cents
  FROM lineitem GROUP BY l_partkey
), tot AS (SELECT CAST(sum(val_cents) AS BIGINT) AS t,
                  CAST(count(*) AS BIGINT) AS n FROM v)
SELECT l_partkey, val_cents
FROM v, tot
WHERE 2 * val_cents * n > 3 * t
ORDER BY val_cents DESC, l_partkey
""")
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts with > 1.5× the AVERAGE per-part revenue share. The
    threshold is relative to the average (share > 1.5/n_parts), not a
    fixed fraction of the total: per-part share scales as 1/n_parts, so
    TPC-H Q11's fixed-fraction HAVING selects nothing above tiny SF
    (the driver hash-passed a 0-row result at sf0.01 — equal-and-empty
    certifies nothing; tests now prove non-emptiness at every SF).
    Integer-exact cross-engine: 2·val·n > 3·t in BIGINT — no float
    threshold edge. Overflow envelope: val_cents·n_parts ≤ ~4.6e18
    (holds to ~sf1000; past that compare shares as DECIMAL(38))."""
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    v = (li.groupBy("l_partkey")
         .agg(F.sum(_units(F.col("l_extendedprice"), 100)).alias("val_cents")))
    tot = v.agg(F.sum("val_cents").alias("t"),
                F.count(F.lit(1)).cast("long").alias("n"))
    return (v.crossJoin(F.broadcast(tot))
            .filter(2 * F.col("val_cents") * F.col("n") > 3 * F.col("t"))
            .select("l_partkey", "val_cents")
            .orderBy(F.desc("val_cents"), "l_partkey"))


# --------------------------------------------------------------------------
# q13: customer order-count distribution (LEFT JOIN preserving zero-order
# customers + double grouping)
# --------------------------------------------------------------------------
@query("q13_cust_distribution", oracle="""
SELECT c_count, count(*) AS custdist
FROM (SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey) t
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""")
def q13_cust_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    per_cust = (t["customer"]
                .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left")
                .groupBy("c_custkey")
                .agg(F.count("o_orderkey").alias("c_count")))
    return (per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))
            .orderBy(F.desc("custdist"), F.desc("c_count")))


# --------------------------------------------------------------------------
# q15: supplier(s) with the maximum period revenue (scalar max subquery
# over a derived aggregate — exact integer equality)
# --------------------------------------------------------------------------
@query("q15_top_supplier", oracle="""
WITH rev AS (
  SELECT l_suppkey,
         CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS BIGINT)
           AS total_units
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_units
FROM supplier JOIN rev ON s_suppkey = l_suppkey
WHERE total_units = (SELECT max(total_units) FROM rev)
ORDER BY s_suppkey
""")
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("supplier", "lineitem"))
    rev = (t["lineitem"]
           .filter((F.col("l_shipdate") >= _ts("1997-01-01 00:00:00"))
                   & (F.col("l_shipdate") < _ts("1997-04-01 00:00:00")))
           .groupBy("l_suppkey")
           .agg(F.sum(_rev_units()).alias("total_units")))
    mx = rev.agg(F.max("total_units").alias("mx"))
    return (t["supplier"]
            .join(rev, F.col("s_suppkey") == F.col("l_suppkey"))
            .join(F.broadcast(mx), F.col("total_units") == F.col("mx"))
            .select("s_suppkey", "s_name", "total_units")
            .orderBy("s_suppkey"))


# --------------------------------------------------------------------------
# q16-ish: distinct supplier count per part attribute (COUNT DISTINCT
# through the lineitem bridge)
# --------------------------------------------------------------------------
@query("q16_supplier_counts", oracle="""
SELECT p_brand, p_type, count(DISTINCT l_suppkey) AS supplier_cnt
FROM part JOIN lineitem ON p_partkey = l_partkey
WHERE p_size BETWEEN 1 AND 25
GROUP BY p_brand, p_type
ORDER BY supplier_cnt DESC, p_brand, p_type
""")
def q16_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("part", "lineitem"))
    return (t["lineitem"]
            .join(F.broadcast(t["part"].filter(F.col("p_size").between(1, 25))),
                  F.col("p_partkey") == F.col("l_partkey"))
            .groupBy("p_brand", "p_type")
            .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
            .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type"))


# --------------------------------------------------------------------------
# q17: revenue from small-quantity orders (correlated scalar subquery —
# per-part average threshold)
# --------------------------------------------------------------------------
@query("q17_small_qty_revenue", oracle="""
SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM lineitem l1, part
WHERE p_partkey = l1.l_partkey
  AND l1.l_quantity < (SELECT 0.5 * avg(l2.l_quantity) FROM lineitem l2
                       WHERE l2.l_partkey = l1.l_partkey)
""")
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("lineitem", "part"))
    li = t["lineitem"]
    part_avg = (li.groupBy(F.col("l_partkey").alias("pk"))
                .agg((0.5 * F.avg("l_quantity")).alias("half_avg")))
    return (li.join(F.broadcast(t["part"]), F.col("p_partkey") == F.col("l_partkey"))
            .join(F.broadcast(part_avg), F.col("l_partkey") == F.col("pk"))
            .filter(F.col("l_quantity") < F.col("half_avg"))
            .agg(F.sum(_units(F.col("l_extendedprice"), 100)).alias("revenue_cents")))


# --------------------------------------------------------------------------
# q22: high-balance customers with no orders, grouped by nation (scalar
# avg subquery + NOT EXISTS anti-join)
# --------------------------------------------------------------------------
@query("q22_sales_opportunity", oracle="""
SELECT c_nationkey, count(*) AS numcust,
       CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
         AS totacctbal_cents
FROM customer
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
GROUP BY c_nationkey
ORDER BY c_nationkey
""")
def q22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    cust = t["customer"]
    avg_pos = cust.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("ap"))
    return (cust.crossJoin(F.broadcast(avg_pos))
            .filter(F.col("c_acctbal") > F.col("ap"))
            .join(t["orders"].filter(F.col("o_orderdate") >= _ts("2000-01-01 00:00:00")),
                  F.col("c_custkey") == F.col("o_custkey"), "left_anti")
            .groupBy("c_nationkey")
            .agg(F.count(F.lit(1)).alias("numcust"),
                 F.sum(_units(F.col("c_acctbal"), 100)).alias("totacctbal_cents"))
            .orderBy("c_nationkey"))


# --------------------------------------------------------------------------
# approximate distinct sketch (HLL): approximate values are engine-specific
# → rows-only driver check; the ±5% accuracy bound is asserted in tests
# --------------------------------------------------------------------------
@query("agg_approx_distinct")
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    # approx and exact run as SEPARATE aggregations joined at the end:
    # combining them in one .agg() plans an Expand (every input row
    # duplicated per distinct-aggregate branch) and a single huge
    # whole-stage-codegen method whose janino compile measured ~6s and
    # recompiled per run; split, each plan is small, compiles in ms, and
    # the scan feeds a plain partial-agg pipeline with no row doubling
    apx = (li.groupBy("l_returnflag")
           .agg(F.approx_count_distinct("l_orderkey", 0.02)
                .alias("approx_orders")))
    ex = (li.groupBy("l_returnflag")
          .agg(F.count_distinct("l_orderkey").alias("exact_orders")))
    return (apx.join(ex, "l_returnflag")
            .select("l_returnflag", "approx_orders", "exact_orders")
            .orderBy("l_returnflag"))


# --------------------------------------------------------------------------
# GROUPING SETS with grouping indicators
# --------------------------------------------------------------------------
@query("agg_grouping_sets", oracle="""
SELECT o_orderstatus, o_orderpriority,
       CAST(grouping(o_orderstatus) AS INT) AS g_status,
       CAST(grouping(o_orderpriority) AS INT) AS g_prio,
       count(*) AS n
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
ORDER BY o_orderstatus, o_orderpriority
""")
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    orders.createOrReplaceTempView("orders_gs")
    return spark.sql("""
        SELECT o_orderstatus, o_orderpriority,
               CAST(grouping(o_orderstatus) AS INT) AS g_status,
               CAST(grouping(o_orderpriority) AS INT) AS g_prio,
               count(*) AS n
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY o_orderstatus, o_orderpriority
    """)


# --------------------------------------------------------------------------
# string-function breadth: substring/pad/translate/split_part/levenshtein
# --------------------------------------------------------------------------
@query("string_funcs", oracle="""
SELECT p_partkey,
       upper(substring(p_type, 1, 3)) AS type3,
       lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
       replace(p_brand, '#', '_') AS brand_u,
       split_part(p_brand, '#', 2) AS brand_num,
       levenshtein(p_type, 'PROMO') AS dist_promo,
       length(p_name) AS name_len
FROM part
ORDER BY p_partkey
""")
def string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_tables(spark, sf_dir, ("part",))["part"]
    return part.select(
        "p_partkey",
        F.upper(F.substring("p_type", 1, 3)).alias("type3"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.replace(F.col("p_brand"), F.lit("#"), F.lit("_")).alias("brand_u"),
        F.split_part(F.col("p_brand"), F.lit("#"), F.lit(2)).alias("brand_num"),
        F.levenshtein(F.col("p_type"), F.lit("PROMO")).alias("dist_promo"),
        F.length("p_name").cast("long").alias("name_len"),
    ).orderBy("p_partkey")


# --------------------------------------------------------------------------
# date/time-function breadth (avoiding engine-divergent week/dow variants)
# --------------------------------------------------------------------------
@query("time_functions", oracle="""
SELECT o_orderkey,
       CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS y,
       CAST(EXTRACT(quarter FROM o_orderdate) AS BIGINT) AS q,
       CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS m,
       CAST(EXTRACT(day FROM o_orderdate) AS BIGINT) AS d,
       CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS due_date,
       CAST(date_diff('day', o_orderdate, TIMESTAMP '2002-01-01 00:00:00') AS BIGINT)
         AS days_to_2002
FROM orders
ORDER BY o_orderkey
""")
def time_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("y"),
        F.quarter("o_orderdate").cast("long").alias("q"),
        F.month("o_orderdate").cast("long").alias("m"),
        F.dayofmonth("o_orderdate").cast("long").alias("d"),
        F.to_date(F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("due_date"),
        F.datediff(F.lit("2002-01-01").cast("date"),
                   F.to_date("o_orderdate")).cast("long").alias("days_to_2002"),
    ).orderBy("o_orderkey")


# --------------------------------------------------------------------------
# array + higher-order functions over tokenized documents
# --------------------------------------------------------------------------
@query("array_funcs", oracle="""
WITH t AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '') AS w
  FROM documents
)
SELECT doc_id,
       CAST(len(w) AS INT) AS n_words,
       array_to_string(w[1:3], ' ') AS first3,
       list_contains(w, 'spark') AS has_spark,
       array_to_string(list_sort(list_distinct(w))[1:5], ',') AS top5_sorted,
       len(list_filter(w, x -> length(x) > 5)) > 0 AS any_long_word,
       CAST(list_sum(list_transform(w, x -> length(x))) AS BIGINT) AS total_chars
FROM t
ORDER BY doc_id
""")
def array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.texts import words

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    w = words(F.col("text"))
    return docs.select(
        "doc_id",
        F.size(w).alias("n_words"),
        F.concat_ws(" ", F.slice(w, 1, 3)).alias("first3"),
        F.array_contains(w, "spark").alias("has_spark"),
        F.concat_ws(",", F.slice(F.array_sort(F.array_distinct(w)), 1, 5))
        .alias("top5_sorted"),
        F.exists(w, lambda x: F.length(x) > 5).alias("any_long_word"),
        F.aggregate(w, F.lit(0).cast("long"),
                    lambda acc, x: acc + F.length(x)).alias("total_chars"),
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
# map functions over parsed JSON properties
# --------------------------------------------------------------------------
@query("map_funcs", oracle="""
SELECT event_id,
       array_to_string(json_keys(props), ',') AS prop_keys,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
       CAST(json_extract_string(props, '$.k') AS BIGINT) * 2 AS k_doubled
FROM events
ORDER BY event_id
""")
def map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    m = F.from_json("props", "map<string,bigint>")
    return ev.select(
        "event_id",
        F.concat_ws(",", F.map_keys(m)).alias("prop_keys"),
        F.element_at(m, "k").alias("k_val"),
        (F.element_at(m, "k") * 2).alias("k_doubled"),
    ).orderBy("event_id")


# --------------------------------------------------------------------------
# ntile + first/last_value windows (deterministic full ordering)
# --------------------------------------------------------------------------
@query("window_ntile_firstlast", oracle="""
SELECT c_custkey,
       CAST(ntile(4) OVER w AS INT) AS quartile,
       first_value(c_custkey) OVER w AS seg_richest,
       CAST(round(c_acctbal * 100) AS BIGINT)
         - CAST(round(first_value(c_acctbal) OVER w * 100) AS BIGINT)
         AS gap_to_richest_cents
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment
             ORDER BY c_acctbal DESC, c_custkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
ORDER BY c_custkey
""")
def window_ntile_firstlast(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    cust = load_tables(spark, sf_dir, ("customer",))["customer"]
    w = (W.partitionBy("c_mktsegment")
         .orderBy(F.desc("c_acctbal"), "c_custkey"))
    w_rows = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    cents = F.round(F.col("c_acctbal") * 100).cast("long")
    first_cents = F.round(F.first_value(F.col("c_acctbal")).over(w_rows) * 100).cast("long")
    return cust.select(
        "c_custkey",
        F.ntile(4).over(w).alias("quartile"),
        F.first_value("c_custkey").over(w_rows).alias("seg_richest"),
        (cents - first_cents).alias("gap_to_richest_cents"),
    ).orderBy("c_custkey")


# --------------------------------------------------------------------------
# q2-ish: per-part minimum-price supplier (correlated min over a join)
# --------------------------------------------------------------------------
@query("q2_min_cost_supplier", oracle="""
WITH costs AS (
  SELECT l_partkey, l_suppkey,
         CAST(min(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           AS min_cents
  FROM lineitem GROUP BY l_partkey, l_suppkey
)
SELECT c.l_partkey, c.l_suppkey, s_name, c.min_cents
FROM costs c
JOIN supplier ON s_suppkey = c.l_suppkey
WHERE c.min_cents = (SELECT min(min_cents) FROM costs c2
                     WHERE c2.l_partkey = c.l_partkey)
ORDER BY c.l_partkey, c.l_suppkey
""")
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("lineitem", "supplier"))
    costs = (t["lineitem"]
             .groupBy("l_partkey", "l_suppkey")
             .agg(F.min(_units(F.col("l_extendedprice"), 100)).alias("min_cents")))
    best = (costs.groupBy(F.col("l_partkey").alias("bp"))
            .agg(F.min("min_cents").alias("best_cents")))
    return (costs.join(best, (F.col("l_partkey") == F.col("bp"))
                       & (F.col("min_cents") == F.col("best_cents")))
            .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
            .select("l_partkey", "l_suppkey", "s_name", "min_cents")
            .orderBy("l_partkey", "l_suppkey"))


# --------------------------------------------------------------------------
# q20-ish: suppliers who moved significant volume of PROMO parts
# (nested IN subqueries)
# --------------------------------------------------------------------------
@query("q20_promo_suppliers", oracle="""
SELECT s_suppkey, s_name
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'PROMO')
    AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  GROUP BY l_suppkey
  HAVING sum(l_quantity) > 500
)
ORDER BY s_suppkey
""")
def q20_promo_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("supplier", "lineitem", "part"))
    promo_parts = t["part"].filter(F.col("p_type") == "PROMO").select("p_partkey")
    movers = (t["lineitem"]
              .filter((F.col("l_shipdate") >= _ts("1997-01-01 00:00:00"))
                      & (F.col("l_shipdate") < _ts("1998-01-01 00:00:00")))
              .join(F.broadcast(promo_parts),
                    F.col("l_partkey") == F.col("p_partkey"), "left_semi")
              .groupBy("l_suppkey")
              .agg(F.sum("l_quantity").alias("qty"))
              .filter(F.col("qty") > 500)
              .select("l_suppkey"))
    return (t["supplier"]
            .join(movers, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
            .select("s_suppkey", "s_name")
            .orderBy("s_suppkey"))
