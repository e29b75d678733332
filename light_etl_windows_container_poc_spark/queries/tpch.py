"""Relational / warehouse analytics suite (SURVEY.md §2.2).

These are the queries the reference's Postgres warehouse existed to serve
(the pattern-routed dim_*/fact_* tables — reference
`pattern_based_cleaner_watcher.py:34-44`), expressed as Catalyst plans over
the parquet warehouse. TPC-H-shaped where the star schema allows (the
synthetic tables lack partsupp and a few columns; predicates are adapted).

Scale notes (100 TB):
- Every dim join (`region`/`nation`/`supplier`/`part`) is broadcast —
  these stay small at any SF, so the fact side never shuffles for them.
- Fact-fact joins (orders⋈lineitem) shuffle on the join key once; AQE
  coalesces / skew-splits at runtime.
- All filters are plain column predicates → pushed to the parquet scan.
- Window queries partition by their natural key with a full deterministic
  ordering (ties broken by unique ids) so running aggregates are stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load_tables
from .registry import query


def _r2(c):  # stable float output for oracle hash-compare
    return F.round(c, 2)


def _ts(lit: str):
    return F.lit(lit).cast("timestamp")


def _units(col, scale: int):
    """Quantize an on-grid decimal column to exact integer units.

    The synthetic money/discount columns live on fixed decimal grids
    (verified 2/4-decimal). Aggregating exact int64 units makes Spark and
    the DuckDB oracle bit-identical — float sums drift by an ulp between
    engines, and Spark's round() (shortest-decimal-string HALF_UP) disagrees
    with DuckDB's (binary) exactly on the .XX5 boundary where averages of
    2-decimal data often land.
    """
    return F.round(col * scale).cast("long")


# revenue terms: 2dp price × 2dp (1-discount) = exact 4-decimal grid
def _rev_units():
    return _units(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10_000)


_REV_SQL = "CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)"


# --------------------------------------------------------------------------
# q1: filter + groupBy + 8 aggregates + sort (TPC-H Q1 shape)
# --------------------------------------------------------------------------
@query("q1_pricing_summary", oracle="""
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100
         AS sum_base_price,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS DOUBLE) / 10000
         AS sum_disc_price,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 1000000) AS BIGINT)) AS DOUBLE) / 1000000
         AS sum_charge,
       round(CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) * 100.0 / count(*)) / 100.0
         AS avg_qty,
       round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) * 1.0 / count(*)) / 100.0
         AS avg_price,
       round(CAST(sum(CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT) * 1.0 / count(*)) / 100.0
         AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""")
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..catalog import spread_scan

    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    qty_units = F.col("l_quantity").cast("long")       # quantities are integers
    price_cents = _units(F.col("l_extendedprice"), 100)
    disc_units = _units(F.col("l_discount"), 100)
    charge_units = _units(F.col("l_extendedprice") * (1 - F.col("l_discount"))
                          * (1 + F.col("l_tax")), 1_000_000)
    n = F.count(F.lit(1))
    return (
        # spread_scan: q1's 8-aggregate partial agg is the heaviest per-row
        # compute in the relational suite; on a sub-cores-files layout the
        # whole scan+partial-agg ran on ONE task (parquet splits only at
        # row-group boundaries). Adaptive keyed repartition parallelizes it
        # (sf0.1 interleaved A/B: 0.95s → 0.79s median-of-9) and is a no-op
        # at warehouse scale. Keyed on a column the query already reads so
        # column pruning stays exact. Measured and deliberately NOT applied
        # to q18/time_window_agg, where shuffling the rows costs more than
        # the serial agg saves (0.96→1.02 / 0.40→1.02).
        spread_scan(li.filter(F.col("l_shipdate") <= _ts("2000-12-01 00:00:00")),
                    "l_extendedprice")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _r2(F.sum("l_quantity")).alias("sum_qty"),
            (F.sum(price_cents).cast("double") / 100).alias("sum_base_price"),
            (F.sum(_rev_units()).cast("double") / 10000).alias("sum_disc_price"),
            (F.sum(charge_units).cast("double") / 1_000_000).alias("sum_charge"),
            (F.round(F.sum(qty_units) * 100.0 / n) / 100.0).alias("avg_qty"),
            (F.round(F.sum(price_cents) * 1.0 / n) / 100.0).alias("avg_price"),
            (F.round(F.sum(disc_units) * 1.0 / n) / 100.0).alias("avg_disc"),
            n.alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --------------------------------------------------------------------------
# q3: 3-way join + agg + top-k
# --------------------------------------------------------------------------
@query("q3_shipping_priority", oracle="""
SELECT l_orderkey,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS DOUBLE) / 10000 AS revenue,
       CAST(o_orderdate AS DATE)                         AS orderdate
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
  AND l_shipdate  > TIMESTAMP '1998-06-01 00:00:00'
GROUP BY l_orderkey, orderdate
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""")
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("customer", "orders", "lineitem"))
    cust = t["customer"].filter(F.col("c_mktsegment") == "BUILDING")
    return (
        t["lineitem"].filter(F.col("l_shipdate") > _ts("1998-06-01 00:00:00"))
        .join(t["orders"].filter(F.col("o_orderdate") < _ts("1998-06-01 00:00:00")),
              F.col("l_orderkey") == F.col("o_orderkey"))
        # customer keys are a small fraction after the segment filter;
        # at 100 TB this is still << fact side, so broadcast the keys.
        .join(F.broadcast(cust.select("c_custkey")),
              F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", F.to_date("o_orderdate").alias("orderdate"))
        .agg((F.sum(_rev_units()).cast("double") / 10000).alias("revenue"))
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
        .select("l_orderkey", "revenue", "orderdate")
    )


# --------------------------------------------------------------------------
# q4: EXISTS semi-join + agg (commitdate columns absent → "shipped late")
# --------------------------------------------------------------------------
@query("q4_order_priority", oracle="""
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-10-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""")
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("orders", "lineitem"))
    orders = t["orders"].filter(
        (F.col("o_orderdate") >= _ts("1997-07-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1997-10-01 00:00:00")))
    li = t["lineitem"]
    return (
        orders.join(li, (li.l_orderkey == orders.o_orderkey)
                    & (li.l_shipdate > orders.o_orderdate), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# q5: 6-table join chain + agg
# --------------------------------------------------------------------------
@query("q5_local_supplier", oracle="""
SELECT n_name, CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS DOUBLE) / 10000 AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1999-01-01 00:00:00'
GROUP BY n_name
ORDER BY revenue DESC, n_name
""")
def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir,
                    ("customer", "orders", "lineitem", "supplier", "nation", "region"))
    orders = t["orders"].filter(
        (F.col("o_orderdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1999-01-01 00:00:00")))
    return (
        t["lineitem"]
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["supplier"]),
              (F.col("l_suppkey") == F.col("s_suppkey"))
              & (F.col("c_nationkey") == F.col("s_nationkey")))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg((F.sum(_rev_units()).cast("double") / 10000).alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


# --------------------------------------------------------------------------
# q6: tight scan — range filters + single agg (pushdown showcase)
# --------------------------------------------------------------------------
@query("q6_forecast_revenue", oracle="""
SELECT CAST(sum(CAST(round(l_extendedprice * l_discount * 10000) AS BIGINT)) AS DOUBLE) / 10000 AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""")
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    return (
        li.filter((F.col("l_shipdate") >= _ts("1997-01-01 00:00:00"))
                  & (F.col("l_shipdate") < _ts("1998-01-01 00:00:00"))
                  & (F.col("l_discount").between(0.05, 0.07))
                  & (F.col("l_quantity") < 24))
        .agg((F.sum(_units(F.col("l_extendedprice") * F.col("l_discount"), 10_000)).cast("double") / 10000).alias("revenue"))
    )


# --------------------------------------------------------------------------
# q7: self-role join (nation×2) + year agg. The nation pair is
# data-ADAPTIVE (the two alphabetically-first supplier-bearing
# nations) rather than TPC-H's fixed FRANCE/GERMANY: the synthetic
# sf0.001 warehouse has only 10 suppliers over 10 of 25 nations, so
# any fixed pair is empty there and an empty hash-match certifies
# nothing (the 3-SF gate's WARN). The adaptive pair keeps the query
# non-degenerate at every SF while preserving the TPC-H shape
# (two-role nation join, both shipping directions, per-year rollup).
# --------------------------------------------------------------------------
@query("q7_volume_shipping", oracle="""
WITH pair AS (
  SELECT n_name FROM (
    SELECT DISTINCT n_name FROM supplier
    JOIN nation ON s_nationkey = n_nationkey)
  ORDER BY n_name LIMIT 2
)
SELECT supp_nation, cust_nation, l_year, CAST(sum(volume_units) AS DOUBLE) / 10000 AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
         CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT) AS volume_units
  FROM supplier, lineitem, orders, customer, nation n1, nation n2
  WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
    AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
    AND c_nationkey = n2.n_nationkey
    AND n1.n_name IN (SELECT n_name FROM pair)
    AND n2.n_name IN (SELECT n_name FROM pair)
    AND n1.n_name <> n2.n_name
) shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
""")
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir,
                    ("supplier", "lineitem", "orders", "customer", "nation"))
    n1 = t["nation"].select(F.col("n_nationkey").alias("n1_key"),
                            F.col("n_name").alias("supp_nation"))
    n2 = t["nation"].select(F.col("n_nationkey").alias("n2_key"),
                            F.col("n_name").alias("cust_nation"))
    pair = (t["supplier"]
            .join(t["nation"],
                  F.col("s_nationkey") == F.col("n_nationkey"))
            .select("n_name").distinct().orderBy("n_name").limit(2))
    df = (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t["customer"].select("c_custkey", "c_nationkey")),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .join(F.broadcast(pair.withColumnRenamed("n_name", "supp_nation")),
              "supp_nation")
        .join(F.broadcast(pair.withColumnRenamed("n_name", "cust_nation")),
              "cust_nation")
        .filter(F.col("supp_nation") != F.col("cust_nation"))
    )
    return (
        df.select("supp_nation", "cust_nation",
                  F.year("l_shipdate").cast("long").alias("l_year"),
                  _rev_units().alias("volume_units"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg((F.sum("volume_units").cast("double") / 10000).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# --------------------------------------------------------------------------
# q10: join + group + top-k revenue (returned items)
# --------------------------------------------------------------------------
@query("q10_returned_items", oracle="""
SELECT c_custkey, c_name,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS DOUBLE) / 10000 AS revenue,
       round(c_acctbal, 2) AS acctbal, n_name
FROM customer, orders, lineitem, nation
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
  AND l_returnflag = 'R' AND c_nationkey = n_nationkey
GROUP BY c_custkey, c_name, acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""")
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("customer", "orders", "lineitem", "nation"))
    orders = t["orders"].filter(
        (F.col("o_orderdate") >= _ts("1997-01-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1997-07-01 00:00:00")))
    return (
        t["lineitem"].filter(F.col("l_returnflag") == "R")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", _r2(F.col("c_acctbal")).alias("acctbal"), "n_name")
        .agg((F.sum(_rev_units()).cast("double") / 10000).alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
        .select("c_custkey", "c_name", "revenue", "acctbal", "n_name")
    )


# --------------------------------------------------------------------------
# q14: conditional aggregation over join (promo effect)
# --------------------------------------------------------------------------
@query("q14_promo_effect", oracle="""
SELECT round(100.00 * sum(CASE WHEN p_type = 'PROMO'
                               THEN l_extendedprice * (1 - l_discount)
                               ELSE 0 END)
             / sum(l_extendedprice * (1 - l_discount)), 2) AS promo_revenue
FROM lineitem, part
WHERE l_partkey = p_partkey
  AND l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-10-01 00:00:00'
""")
def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("lineitem", "part"))
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= _ts("1997-09-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1997-10-01 00:00:00")))
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .agg(_r2(100.0 * F.sum(F.when(F.col("p_type") == "PROMO", disc_price)
                               .otherwise(F.lit(0.0)))
                 / F.sum(disc_price)).alias("promo_revenue"))
    )


# --------------------------------------------------------------------------
# q18: HAVING subquery (large orders)
# --------------------------------------------------------------------------
@query("q18_large_orders", oracle="""
SELECT c_name, c_custkey, o_orderkey,
       CAST(o_orderdate AS DATE) AS orderdate,
       round(o_totalprice, 2) AS totalprice,
       round(sum(l_quantity), 2) AS sum_qty
FROM customer, orders, lineitem
WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                     GROUP BY l_orderkey HAVING sum(l_quantity) > 250)
  AND c_custkey = o_custkey AND o_orderkey = l_orderkey
GROUP BY c_name, c_custkey, o_orderkey, orderdate, totalprice
ORDER BY totalprice DESC, o_orderkey
LIMIT 100
""")
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("customer", "orders", "lineitem"))
    li = t["lineitem"]
    big = (li.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("s"))
           .filter(F.col("s") > 250).select("l_orderkey"))
    return (
        li.join(big.withColumnRenamed("l_orderkey", "big_orderkey"),
                F.col("l_orderkey") == F.col("big_orderkey"), "left_semi")
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey",
                 F.to_date("o_orderdate").alias("orderdate"),
                 _r2(F.col("o_totalprice")).alias("totalprice"))
        .agg(_r2(F.sum("l_quantity")).alias("sum_qty"))
        .orderBy(F.desc("totalprice"), "o_orderkey")
        .limit(100)
    )


# --------------------------------------------------------------------------
# q19: disjunctive multi-predicate join
# --------------------------------------------------------------------------
@query("q19_discount_revenue", oracle="""
SELECT CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS DOUBLE) / 10000 AS revenue
FROM lineitem, part
WHERE p_partkey = l_partkey AND (
     (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
  OR (p_brand = 'Brand#2'  AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 30)
  OR (p_brand = 'Brand#25' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 40))
""")
def q19_discount_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("lineitem", "part"))
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 20))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 25)
           & F.col("l_quantity").between(10, 30))
        | ((F.col("p_brand") == "Brand#25") & F.col("p_size").between(1, 35)
           & F.col("l_quantity").between(20, 40))
    )
    return (
        t["lineitem"]
        .join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg((F.sum(_rev_units()).cast("double") / 10000).alias("revenue"))
    )


# --------------------------------------------------------------------------
# windows / grouping sets / reshaping / set ops / subqueries
# --------------------------------------------------------------------------
@query("topk_per_group", oracle="""
SELECT p_type, p_partkey, round(p_retailprice, 2) AS retailprice, CAST(rn AS INT) AS rn
FROM (SELECT p_type, p_partkey, p_retailprice,
             row_number() OVER (PARTITION BY p_type
                                ORDER BY p_retailprice DESC, p_partkey) AS rn
      FROM part) t
WHERE rn <= 3
ORDER BY p_type, rn
""")
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_tables(spark, sf_dir, ("part",))["part"]
    w = W.partitionBy("p_type").orderBy(F.desc("p_retailprice"), "p_partkey")
    return (
        part.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("p_type", "p_partkey", _r2(F.col("p_retailprice")).alias("retailprice"), "rn")
        .orderBy("p_type", "rn")
    )


# Running sums accumulate float ulp drift differently per engine, and every
# intermediate row is emitted — so this one runs in exact integer cents.
@query("window_running", oracle="""
SELECT l_suppkey, l_orderkey, l_linenumber,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
            OVER (PARTITION BY l_suppkey
                  ORDER BY l_shipdate, l_orderkey, l_linenumber
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS running_rev_cents
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-04-01 00:00:00'
ORDER BY l_suppkey, l_shipdate, l_orderkey, l_linenumber
""")
def window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    li = li.filter((F.col("l_shipdate") >= _ts("1998-01-01 00:00:00"))
                   & (F.col("l_shipdate") < _ts("1998-04-01 00:00:00")))
    cents = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast("long")
    w = (W.partitionBy("l_suppkey")
         .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    return (
        li.withColumn("running_rev_cents", F.sum(cents).over(w))
        .select("l_suppkey", "l_orderkey", "l_linenumber", "running_rev_cents")
    )


@query("window_lag_delta", oracle="""
SELECT event_id, user_id,
       round(value - lag(value) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id), 2) AS delta
FROM events
ORDER BY user_id, ts, event_id
""")
def window_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("delta", _r2(F.col("value") - F.lag("value").over(w)))
        .select("event_id", "user_id", "delta")
    )


@query("agg_rollup", oracle="""
SELECT o_orderstatus, o_orderpriority,
       count(*) AS n, round(sum(o_totalprice), 2) AS total
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
ORDER BY o_orderstatus, o_orderpriority
""")
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), _r2(F.sum("o_totalprice")).alias("total"))
        .orderBy("o_orderstatus", "o_orderpriority")
    )


@query("agg_cube", oracle="""
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
ORDER BY l_returnflag, l_linestatus
""")
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(_r2(F.sum("l_quantity")).alias("sum_qty"), F.count(F.lit(1)).alias("n"))
        .orderBy("l_returnflag", "l_linestatus")
    )


@query("pivot_wide", oracle="""
SELECT o_orderpriority,
       count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS F,
       count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS O,
       count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS P
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""")
def pivot_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .na.fill(0)  # pivot yields null for absent cells; oracle COUNT gives 0
        .orderBy("o_orderpriority")
    )


@query("unpivot_long", oracle="""
SELECT p_partkey, 'retailprice' AS metric, round(p_retailprice, 2) AS val FROM part
UNION ALL
SELECT p_partkey, 'size' AS metric, round(CAST(p_size AS DOUBLE), 2) AS val FROM part
ORDER BY p_partkey, metric
""")
def unpivot_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_tables(spark, sf_dir, ("part",))["part"]
    return (
        part.select("p_partkey",
                    _r2(F.col("p_retailprice")).alias("retailprice"),
                    _r2(F.col("p_size").cast("double")).alias("size"))
        .unpivot("p_partkey", ["retailprice", "size"], "metric", "val")
        .orderBy("p_partkey", "metric")
    )


@query("set_ops", oracle="""
SELECT nationkey, 'both' AS op FROM
  (SELECT c_nationkey AS nationkey FROM customer
   INTERSECT SELECT s_nationkey FROM supplier) t1
UNION ALL
SELECT nationkey, 'customer_only' AS op FROM
  (SELECT DISTINCT c_nationkey AS nationkey FROM customer
   EXCEPT SELECT s_nationkey FROM supplier) t2
ORDER BY op, nationkey
""")
def set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("customer", "supplier"))
    cn = t["customer"].select(F.col("c_nationkey").alias("nationkey"))
    sn = t["supplier"].select(F.col("s_nationkey").alias("nationkey"))
    both = cn.intersect(sn).withColumn("op", F.lit("both"))
    only = cn.distinct().exceptAll(sn.distinct()).withColumn("op", F.lit("customer_only"))
    return both.unionAll(only).orderBy("op", "nationkey")


@query("join_anti", oracle="""
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
                    AND o_orderdate <  TIMESTAMP '1999-01-01 00:00:00')
ORDER BY c_custkey
""")
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    o98 = t["orders"].filter(
        (F.col("o_orderdate") >= _ts("1998-01-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1999-01-01 00:00:00")))
    return (
        t["customer"]
        .join(o98, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@query("subquery_scalar", oracle="""
SELECT c_custkey, round(c_acctbal, 2) AS acctbal
FROM customer c1
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer c2
                   WHERE c2.c_nationkey = c1.c_nationkey)
ORDER BY c_custkey
""")
def subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_tables(spark, sf_dir, ("customer",))["customer"]
    nation_avg = (cust.groupBy(F.col("c_nationkey").alias("nk"))
                  .agg(F.avg("c_acctbal").alias("nation_avg")))
    return (
        cust.join(F.broadcast(nation_avg), F.col("c_nationkey") == F.col("nk"))
        .filter(F.col("c_acctbal") > F.col("nation_avg"))
        .select("c_custkey", _r2(F.col("c_acctbal")).alias("acctbal"))
        .orderBy("c_custkey")
    )


# Percentiles report exact integer cents: continuous-interpolation output in
# dollars would differ between engines by a float ulp exactly at .XX5.
# p90 is the discrete (type-1) quantile via row_number — interpolation-free
# and identically defined on both engines.
@query("percentiles", oracle="""
WITH c AS (
  SELECT c_mktsegment AS seg, c_custkey,
         CAST(round(c_acctbal * 100) AS BIGINT) AS bal
  FROM customer
), r AS (
  SELECT seg, bal,
         row_number() OVER (PARTITION BY seg ORDER BY bal, c_custkey) AS rn,
         count(*) OVER (PARTITION BY seg) AS n
  FROM c
), p90 AS (
  SELECT seg, bal AS p90_cents FROM r WHERE rn = CAST(ceil(n * 0.9) AS BIGINT)
), a AS (
  SELECT seg, CAST(round(quantile_cont(bal, 0.5)) AS BIGINT) AS p50_cents,
         min(bal) AS lo_cents, max(bal) AS hi_cents
  FROM c GROUP BY seg
)
SELECT a.seg AS c_mktsegment, p50_cents, p90_cents, lo_cents, hi_cents
FROM a JOIN p90 USING (seg)
ORDER BY c_mktsegment
""")
def percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_tables(spark, sf_dir, ("customer",))["customer"]
    c = cust.select(F.col("c_mktsegment").alias("seg"), "c_custkey",
                    _units(F.col("c_acctbal"), 100).alias("bal"))
    w = W.partitionBy("seg")
    r = (c.withColumn("rn", F.row_number().over(w.orderBy("bal", "c_custkey")))
         .withColumn("n", F.count(F.lit(1)).over(w)))
    p90 = (r.filter(F.col("rn") == F.ceil(F.col("n") * 0.9))
           .select("seg", F.col("bal").alias("p90_cents")))
    a = (c.groupBy("seg")
         .agg(F.round(F.percentile("bal", F.lit(0.5))).cast("long").alias("p50_cents"),
              F.min("bal").alias("lo_cents"),
              F.max("bal").alias("hi_cents")))
    return (
        a.join(p90, "seg")
        .select(F.col("seg").alias("c_mktsegment"),
                "p50_cents", "p90_cents", "lo_cents", "hi_cents")
        .orderBy("c_mktsegment")
    )
