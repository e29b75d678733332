"""Round-7 breadth, third wave: exact set-similarity join via prefix
filtering (the AllPairs/PPJoin family — minhash's DETERMINISTIC
sibling), and a z-order storage-layout certification that measures the
data-skipping win of multi-dimensional clustering against a
single-key sort on the SAME zone budget.

Determinism contracts: the prefix join's threshold is the rational
tau=4/5 cross-multiplied in BIGINT; the z-order curve is 32 unrolled
shift/mask terms (pure integer), zone ids are VALUE-based (z div 2^16
— quadtree cells), and the probe box is data-relative via integer
scalar aggregates — so both engines derive byte-identical layouts,
candidates, and counts at every SF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_tables
from .registry import query
from .llm import _NGRAM_MAX_DF, _SHINGLE_CTE


# --------------------------------------------------------------------------
# Exact Jaccard >= 0.8 pairs via PREFIX FILTERING: candidates come only
# from each doc's |s| - ceil(0.8|s|) + 1 RAREST shingles (global-df
# ascending order), then full-intersection verification. The oracle is
# the brute-force all-shingle self-join — a hash match therefore proves
# the prefix theorem's completeness end to end (no qualifying pair can
# hide from the rare-token join). Same max_df boilerplate contract as
# dedup_ngram_jaccard, so the two surfaces stay comparable.
# --------------------------------------------------------------------------
@query("dedup_jaccard_prefix", oracle=f"""
WITH {_SHINGLE_CTE},
shf AS (
  SELECT * FROM sh
  WHERE s NOT IN (SELECT s FROM sh GROUP BY s
                  HAVING count(*) > {_NGRAM_MAX_DF})
),
sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n
       FROM shf GROUP BY doc_id),
pairs AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         CAST(count(*) AS BIGINT) AS inter
  FROM shf a JOIN shf b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY a_id, b_id
)
SELECT a_id, b_id, inter, sa.n AS sa, sb.n AS sb
FROM pairs
JOIN sz sa ON sa.doc_id = a_id
JOIN sz sb ON sb.doc_id = b_id
WHERE inter * 5 >= 4 * (sa.n + sb.n - inter)
ORDER BY a_id, b_id
""")
def dedup_jaccard_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Where dedup_minhash_lsh trades recall for speed, this keeps BOTH:
    the candidate self-join touches only prefix (rarest) shingles —
    sum(bucket²) over low-df keys — and the verified output is exactly
    the threshold pair set. At 100 TB the prefix postings are a small
    fraction of the full postings and their buckets are the least
    skewed by construction (df-ascending order puts boilerplate LAST)."""
    from ..operators.dedup import jaccard_prefix_pairs

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return (jaccard_prefix_pairs(docs, "doc_id", "text", n=3,
                                 tau_num=4, tau_den=5,
                                 max_df=_NGRAM_MAX_DF)
            .orderBy("a_id", "b_id"))


# --------------------------------------------------------------------------
# Z-order layout certification: interleave 16 bits of o_custkey with 16
# bits of the order's epoch-day; zones are the VALUE-based 256x256
# quadtree cells (zone = z div 2^16). For a 2-D probe box (a
# data-relative custkey band x a data-relative ~5%-of-span date
# window — fixed dates would go vacuous under warehouse regeneration,
# the q11 lesson), per-zone
# min/max-rectangle pruning is compared against the SAME pruning on a
# custkey-sorted layout: the z-layout's zones are tight in BOTH
# dimensions, the single-key layout's zones span the full date range.
# Output: per layout, total zones / candidate zones / rows scanned /
# rows actually in the box (equal across layouts — pruning loses
# nothing). Everything is integer arithmetic replayed exactly in
# DuckDB.
# --------------------------------------------------------------------------
# 16-bit envelope: the interleave keeps the LOW 16 bits of each key, so
# keys above 65535 alias into the same z-cells (o_custkey reaches that
# at TPC-H sf≈0.5: 150k customers at sf1). Both engines compute the
# identical expression, so the certification hash stays valid and
# min/max pruning stays SOUND at any SF (zones just get looser, never
# wrong). For a production layout above the envelope, widen _ZBITS (a
# 32-bit interleave fits in the same BIGINT zv) or pre-shift keys by
# ceil(log2(max_key)) − _ZBITS; the oracle string is static, so the
# certified form pins 16.
_ZBITS = 16


def _z_terms(x: str, y: str, shift: str, dialect_spark: bool) -> str:
    terms = []
    for i in range(_ZBITS):
        if dialect_spark:
            terms.append(f"shiftleft(shiftright({x}, {i}) & 1, {2 * i})")
            terms.append(f"shiftleft(shiftright({y}, {i}) & 1, {2 * i + 1})")
        else:
            terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
            terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    _ = shift
    return " + ".join(terms)


@query("zorder_zone_prune", oracle=f"""
WITH base AS (
  SELECT o_custkey AS x,
         CAST(greatest(date_diff('day', DATE '1992-01-01',
                                 CAST(o_orderdate AS DATE)), 0)
              AS BIGINT) AS y
  FROM orders
),
z AS (SELECT x, y, {_z_terms('x', 'y', '', False)} AS zv FROM base),
box AS (
  SELECT CAST(max(x) * 25 // 100 AS BIGINT) AS lo_x,
         CAST(max(x) * 30 // 100 AS BIGINT) AS hi_x,
         CAST(min(y) + (max(y) - min(y)) * 40 // 100 AS BIGINT) AS lo_y,
         CAST(min(y) + (max(y) - min(y)) * 45 // 100 AS BIGINT) AS hi_y
  FROM base
),
zones_z AS (
  SELECT zv // 65536 AS zone, count(*) AS rows_in_zone,
         min(x) AS min_x, max(x) AS max_x,
         min(y) AS min_y, max(y) AS max_y
  FROM z GROUP BY 1
),
zones_k AS (
  SELECT x // 256 AS zone, count(*) AS rows_in_zone,
         min(x) AS min_x, max(x) AS max_x,
         min(y) AS min_y, max(y) AS max_y
  FROM z GROUP BY 1
),
hits AS (
  SELECT CAST(count(*) AS BIGINT) AS rows_in_box
  FROM z, box b
  WHERE x BETWEEN b.lo_x AND b.hi_x AND y BETWEEN b.lo_y AND b.hi_y
),
cand AS (
  SELECT 'zorder' AS layout,
         CAST(count(*) AS BIGINT) AS zones_total,
         CAST(sum(CASE WHEN max_x >= lo_x AND min_x <= hi_x
                        AND max_y >= lo_y AND min_y <= hi_y
                  THEN 1 ELSE 0 END) AS BIGINT) AS candidate_zones,
         CAST(sum(CASE WHEN max_x >= lo_x AND min_x <= hi_x
                        AND max_y >= lo_y AND min_y <= hi_y
                  THEN rows_in_zone ELSE 0 END) AS BIGINT) AS rows_scanned
  FROM zones_z, box
  UNION ALL
  SELECT 'custkey_sort',
         CAST(count(*) AS BIGINT),
         CAST(sum(CASE WHEN max_x >= lo_x AND min_x <= hi_x
                        AND max_y >= lo_y AND min_y <= hi_y
                  THEN 1 ELSE 0 END) AS BIGINT),
         CAST(sum(CASE WHEN max_x >= lo_x AND min_x <= hi_x
                        AND max_y >= lo_y AND min_y <= hi_y
                  THEN rows_in_zone ELSE 0 END) AS BIGINT)
  FROM zones_k, box
)
SELECT layout, zones_total, candidate_zones, rows_scanned,
       hits.rows_in_box
FROM cand CROSS JOIN hits
ORDER BY layout
""")
def zorder_zone_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The storage-layout lever Delta's OPTIMIZE ZORDER ships: one
    clustering that serves range predicates on EITHER dimension. The
    whole certification is two zone-stat aggregations (output ∝ zones)
    plus a broadcast 1-row box — the fact stream is scanned twice and
    never shuffled wider than the zone key."""
    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    base = orders.select(
        F.col("o_custkey").alias("x"),
        F.greatest(
            F.datediff(F.col("o_orderdate").cast("date"),
                       F.lit("1992-01-01").cast("date")).cast("long"),
            F.lit(0).cast("long")).alias("y"))
    z = base.withColumn("zv", F.expr(_z_terms("x", "y", "", True)))
    box = base.agg(
        F.expr("CAST(max(x) * 25 div 100 AS BIGINT)").alias("lo_x"),
        F.expr("CAST(max(x) * 30 div 100 AS BIGINT)").alias("hi_x"),
        F.expr("CAST(min(y) + (max(y) - min(y)) * 40 div 100 AS BIGINT)")
        .alias("lo_y"),
        F.expr("CAST(min(y) + (max(y) - min(y)) * 45 div 100 AS BIGINT)")
        .alias("hi_y"))

    def zone_stats(df: DataFrame, zone_expr: str) -> DataFrame:
        return (df.groupBy(F.expr(zone_expr).alias("zone"))
                .agg(F.count(F.lit(1)).alias("rows_in_zone"),
                     F.min("x").alias("min_x"), F.max("x").alias("max_x"),
                     F.min("y").alias("min_y"), F.max("y").alias("max_y")))

    def pruned(stats: DataFrame, layout: str) -> DataFrame:
        hit = ((F.col("max_x") >= F.col("lo_x"))
               & (F.col("min_x") <= F.col("hi_x"))
               & (F.col("max_y") >= F.col("lo_y"))
               & (F.col("min_y") <= F.col("hi_y")))
        return (stats.crossJoin(F.broadcast(box))
                .agg(F.count(F.lit(1)).cast("long").alias("zones_total"),
                     F.sum(hit.cast("long")).cast("long")
                     .alias("candidate_zones"),
                     F.sum(F.when(hit, F.col("rows_in_zone"))
                           .otherwise(F.lit(0))).cast("long")
                     .alias("rows_scanned"))
                .select(F.lit(layout).alias("layout"), "zones_total",
                        "candidate_zones", "rows_scanned"))

    hits = (z.crossJoin(F.broadcast(box))
            .filter((F.col("x") >= F.col("lo_x"))
                    & (F.col("x") <= F.col("hi_x"))
                    & (F.col("y") >= F.col("lo_y"))
                    & (F.col("y") <= F.col("hi_y")))
            .agg(F.count(F.lit(1)).cast("long").alias("rows_in_box")))
    out = (pruned(zone_stats(z, "zv div 65536"), "zorder")
           .unionByName(pruned(zone_stats(z, "x div 256"), "custkey_sort")))
    return out.crossJoin(F.broadcast(hits)).orderBy("layout")


# --------------------------------------------------------------------------
# RETRACTABLE incremental aggregate maintenance: agg_incremental_merge
# proves merge(base, insert-delta) == recompute; real CDC deltas also
# DELETE. The retractable algebra (count/sum subtract exactly; avg
# derives) maintains the view without touching base rows: merged =
# base + inserts - deletes per group, groups at zero dropped. The
# oracle recomputes from scratch on (base MINUS deletes) UNION inserts
# — the hash match IS the maintenance theorem. (min/max are not
# retractable: a delete hitting the current max forces a recompute or
# a mergeable-summary column; documented, excluded from the view.)
# --------------------------------------------------------------------------
@query("agg_incremental_retract", oracle="""
WITH base AS (
  SELECT * FROM orders WHERE o_orderdate < TIMESTAMP '1999-01-01'
),
ins AS (
  SELECT * FROM orders WHERE o_orderdate >= TIMESTAMP '1999-01-01'
),
del AS (SELECT * FROM base WHERE o_orderkey % 7 = 3),
final_rows AS (
  SELECT * FROM base WHERE o_orderkey % 7 <> 3
  UNION ALL SELECT * FROM ins
)
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS rev_cents
FROM final_rows GROUP BY o_orderpriority ORDER BY o_orderpriority
""")
def agg_incremental_retract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark takes ONLY the merge path — three partial aggregates
    (base / inserts / deletes, each one map-side-combined groupBy)
    joined on the group key and combined with +/-; no final_rows
    relation is ever materialized. At 100 TB the base partials live as
    the materialized view and each CDC batch costs one delta
    aggregation + one tiny join."""
    from .tpch import _units

    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    cents = _units(F.col("o_totalprice"), 100)
    cut = F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp")

    def part(df: DataFrame, tag: str) -> DataFrame:
        return df.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).cast("long").alias(f"n_{tag}"),
            F.sum(cents).cast("long").alias(f"s_{tag}"))

    base = part(orders.filter(cut), "base")
    ins = part(orders.filter(~cut), "ins")
    dele = part(orders.filter(cut & (F.col("o_orderkey") % 7 == 3)), "del")
    merged = (base.join(ins, "o_orderpriority", "full")
              .join(dele, "o_orderpriority", "full"))
    z = lambda c: F.coalesce(F.col(c), F.lit(0))  # noqa: E731
    return (merged.select(
        "o_orderpriority",
        (z("n_base") + z("n_ins") - z("n_del")).cast("long")
        .alias("n_orders"),
        (z("s_base") + z("s_ins") - z("s_del")).cast("long")
        .alias("rev_cents"))
        .filter(F.col("n_orders") > 0)
        .orderBy("o_orderpriority"))
