"""Round-5 breadth, fifth wave: the skew-salted join certified against
its unsalted truth, cross-source duplicate-overlap census, and the
budget-to-sample application step that turns token_budget_mix's
fractions into concrete deterministic keep decisions.

Determinism contracts: the salt column is dropped before output, so the
salted join's RESULT SET is exactly the plain join's (only the shuffle
layout differs — which is the point); md5-bucket keep decisions replay
bit-for-bit in DuckDB (the domain_temperature_sample contract); pair
counts use c·(c−1)//2 on BIGINTs (even product — exact).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_tables
from ..functions.texts import words
from .registry import query

_MIX_BUDGET_TOKENS = 10_000_000  # same budget as token_budget_mix


# --------------------------------------------------------------------------
# Salted join, hash-certified: revenue per part brand computed through
# operators/scale.salted_join — the oracle is the PLAIN join+group, so
# the driver proves salting never changes results, only layout. This
# upgrades the scale_salted_join row from tests-only to driver-green.
# --------------------------------------------------------------------------
@query("salted_join_agg", oracle="""
SELECT p.p_brand,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY p.p_brand
ORDER BY p.p_brand
""")
def salted_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brand revenue through the skew-salted join path. The salt spreads
    any pathological hot part key over `salt` reducers; because __salt
    is internal and dropped, the joined relation — and therefore the
    aggregate — is bit-identical to the unsalted plan the oracle runs.
    The aggregation keys only on brand, so the salt's layout freedom
    never leaks into results."""
    from ..operators.scale import salted_join

    t = load_tables(spark, sf_dir, ("lineitem", "part"))
    li = t["lineitem"].select(
        F.col("l_partkey").alias("p_partkey"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"))
    pt = t["part"].select("p_partkey", "p_brand")
    joined = salted_join(li, pt, "p_partkey", salt=8)
    return (joined.groupBy("p_brand")
            .agg(F.count(F.lit(1)).cast("long").alias("n_lines"),
                 F.sum("cents").cast("long").alias("revenue_cents"))
            .orderBy("p_brand"))


# --------------------------------------------------------------------------
# Cross-source duplicate overlap: for each duplicate clique (shared
# 12-char prefix — the warehouse's boilerplate signal), how many of its
# pairs stay within one source vs cross sources. Cross-source overlap is
# the signal that a crawl's duplication is systemic (mirrors, syndication)
# rather than per-site boilerplate.
# --------------------------------------------------------------------------
@query("dup_source_overlap", oracle="""
WITH k AS (SELECT substring(text, 1, 12) AS h, source FROM documents),
g AS (SELECT h, CAST(count(*) AS BIGINT) AS c FROM k GROUP BY h
      HAVING count(*) >= 2),
s AS (SELECT h, source, CAST(count(*) AS BIGINT) AS cs FROM k
      GROUP BY h, source),
w AS (SELECT h, CAST(sum(cs * (cs - 1) // 2) AS BIGINT) AS pw
      FROM s GROUP BY h)
SELECT g.c AS group_size,
       CAST(count(*) AS BIGINT) AS n_groups,
       CAST(sum(g.c * (g.c - 1) // 2) AS BIGINT) AS pairs_total,
       CAST(sum(w.pw) AS BIGINT) AS pairs_within_source,
       CAST(sum(g.c * (g.c - 1) // 2 - w.pw) AS BIGINT)
         AS pairs_cross_source
FROM g JOIN w ON g.h = w.h
GROUP BY g.c
ORDER BY group_size
""")
def dup_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within- vs cross-source pair census per duplicate-clique size.
    Two aggregations on the clique key (one per-source, one total) joined
    on that key — pair counts come from the counts-squared identity, so
    no pair relation is ever materialized (the naive join would emit
    c² rows per clique)."""
    docs = (load_tables(spark, sf_dir, ("documents",))["documents"]
            .select(F.substring("text", 1, 12).alias("h"), "source"))
    g = (docs.groupBy("h").agg(F.count(F.lit(1)).cast("long").alias("c"))
         .filter(F.col("c") >= 2))
    s = (docs.groupBy("h", "source")
         .agg(F.count(F.lit(1)).cast("long").alias("cs")))
    w = (s.groupBy("h")
         .agg(F.sum(F.expr("cs * (cs - 1) div 2")).cast("long").alias("pw")))
    return (g.join(w, "h")
            .groupBy(F.col("c").alias("group_size"))
            .agg(F.count(F.lit(1)).cast("long").alias("n_groups"),
                 F.sum(F.expr("c * (c - 1) div 2")).cast("long")
                 .alias("pairs_total"),
                 F.sum("pw").cast("long").alias("pairs_within_source"),
                 F.sum(F.expr("c * (c - 1) div 2 - pw")).cast("long")
                 .alias("pairs_cross_source"))
            .orderBy("group_size"))


# --------------------------------------------------------------------------
# Budget application: turn token_budget_mix's per-source keep-fraction
# into a deterministic per-document keep decision (md5 bucket <
# fraction). Integer-vs-integer compare — no float boundary anywhere.
# --------------------------------------------------------------------------
@query("budget_sample_apply", oracle=f"""
WITH d AS (
  SELECT doc_id, source,
         CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
                              x -> x <> '')) AS BIGINT) AS n_tok
  FROM documents
),
per AS (SELECT source, CAST(sum(n_tok) AS BIGINT) AS n_tokens
        FROM d GROUP BY source),
g AS (SELECT CAST(count(*) AS BIGINT) AS n_sources FROM per),
fr AS (
  SELECT source,
         CAST(least(1000000, ({_MIX_BUDGET_TOKENS} // n_sources) * 1000000
                    // greatest(n_tokens, 1)) AS BIGINT) AS fraction_micro
  FROM per CROSS JOIN g
)
SELECT d.doc_id, d.source, d.n_tok,
       CAST(CAST(('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))
                 AS BIGINT) % 1000000 AS BIGINT) AS bucket_micro,
       CAST(CAST(('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))
                 AS BIGINT) % 1000000 < fr.fraction_micro AS INT) AS keep
FROM d JOIN fr ON d.source = fr.source
ORDER BY d.doc_id
""")
def budget_sample_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic downsample to the token budget: documents keep iff
    their md5 bucket falls under their source's keep-fraction. The
    fraction relation is |sources| rows riding a broadcast; the decision
    is map-only over the corpus, and identical md5 arithmetic in DuckDB
    picks the SAME documents — the property that makes budget reruns
    reproducible across engines and runs."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    d = docs.select("doc_id", "source",
                    F.size(words(F.col("text"))).cast("long").alias("n_tok"))
    per = d.groupBy("source").agg(F.sum("n_tok").cast("long")
                                  .alias("n_tokens"))
    g = per.agg(F.count(F.lit(1)).cast("long").alias("n_sources"))
    fr = (per.crossJoin(F.broadcast(g))
          .select("source",
                  F.least(F.lit(1_000_000).cast("long"),
                          F.expr(f"({_MIX_BUDGET_TOKENS} div n_sources)"
                                 " * 1000000 div greatest(n_tokens, 1)"))
                  .cast("long").alias("fraction_micro")))
    bucket = (F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8),
                     16, 10).cast("long") % 1_000_000)
    return (d.join(F.broadcast(fr), "source")
            .select("doc_id", "source", "n_tok",
                    bucket.alias("bucket_micro"),
                    (bucket < F.col("fraction_micro")).cast("int")
                    .alias("keep"))
            .orderBy("doc_id"))
