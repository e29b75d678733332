"""Round-5 breadth, seventh wave: market-basket affinity — brand-pair
co-occurrence and lift over orders, the classic association-rule
building block (support / lift without the Apriori search, since pairs
of a bounded per-order item set are already tractable relationally).

Determinism: all supports are exact BIGINT counts; lift's one double
division runs on exact integers and is milli-rounded — engine-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_tables
from .registry import query

_MIN_PAIR_SUPPORT = 5


@query("market_basket_lift", oracle=f"""
WITH ob AS (
  SELECT DISTINCT l.l_orderkey AS okey, p.p_brand AS brand
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
),
n AS (SELECT CAST(count(DISTINCT okey) AS BIGINT) AS n_orders FROM ob),
ca AS (SELECT brand, CAST(count(*) AS BIGINT) AS c FROM ob GROUP BY brand),
pairs AS (
  SELECT a.brand AS brand_a, b.brand AS brand_b,
         CAST(count(*) AS BIGINT) AS c_ab
  FROM ob a JOIN ob b ON a.okey = b.okey AND a.brand < b.brand
  GROUP BY a.brand, b.brand
  HAVING count(*) >= {_MIN_PAIR_SUPPORT}
)
SELECT p.brand_a, p.brand_b, p.c_ab,
       ca.c AS c_a, cb.c AS c_b,
       CAST(round(1000.0 * p.c_ab * n.n_orders / (ca.c * cb.c)) AS BIGINT)
         AS lift_milli
FROM pairs p
JOIN ca ON p.brand_a = ca.brand
JOIN ca cb ON p.brand_b = cb.brand
CROSS JOIN n
ORDER BY brand_a, brand_b
""")
def market_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brand-pair lift across orders. The pair join is keyed on the
    ORDER (a bounded basket — TPC-H orders hold ≤7 lines), so pair
    volume is Σ basket², never corpus²; brand supports and the order
    count are tiny broadcast relations. The same shape serves co-view /
    co-purchase affinity at event-log scale, where the basket bound is
    enforced upstream (domain_cap-style) before pairing."""
    t = load_tables(spark, sf_dir, ("lineitem", "part"))
    ob = (t["lineitem"].select("l_orderkey", "l_partkey")
          .join(t["part"].select("p_partkey", "p_brand"),
                F.col("l_partkey") == F.col("p_partkey"))
          .select(F.col("l_orderkey").alias("okey"),
                  F.col("p_brand").alias("brand"))
          .distinct())
    n = ob.agg(F.countDistinct("okey").cast("long").alias("n_orders"))
    ca = ob.groupBy("brand").agg(F.count(F.lit(1)).cast("long").alias("c"))
    a = ob.select("okey", F.col("brand").alias("brand_a"))
    b = ob.select("okey", F.col("brand").alias("brand_b"))
    pairs = (a.join(b, "okey")
             .filter(F.col("brand_a") < F.col("brand_b"))
             .groupBy("brand_a", "brand_b")
             .agg(F.count(F.lit(1)).cast("long").alias("c_ab"))
             .filter(F.col("c_ab") >= _MIN_PAIR_SUPPORT))
    lift = F.round(1000.0 * F.col("c_ab") * F.col("n_orders")
                   / (F.col("c_a") * F.col("c_b"))).cast("long")
    return (pairs
            .join(F.broadcast(ca.select(F.col("brand").alias("brand_a"),
                                        F.col("c").alias("c_a"))), "brand_a")
            .join(F.broadcast(ca.select(F.col("brand").alias("brand_b"),
                                        F.col("c").alias("c_b"))), "brand_b")
            .crossJoin(F.broadcast(n))
            .select("brand_a", "brand_b", "c_ab", "c_a", "c_b",
                    lift.alias("lift_milli"))
            .orderBy("brand_a", "brand_b"))
