"""Round-5 breadth, twelfth wave: a declarative data-quality rules
audit (the reference's validate_file/null_counts grown into warehouse
constraint checking), repeated-span dedup signals, training-shard
assignment, exact dyadic EWMA smoothing, incremental-aggregate
maintenance, null-safe join semantics, the co-occurrence graph's degree
histogram, and a source-inequality Gini diagnostic.

Determinism contracts (shared with the rest of the suite): money on the
cents grid via round()·cast, ratios as BIGINT `div` (truncation == floor
on the non-negative domain), md5-prefix bucketing for engine-portable
sampling, and lag()/window frames identical across Spark and DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load_tables
from .registry import query
from .breadth3 import COOCCUR_PAIRS_CTES, word_cooccur_pairs


# --------------------------------------------------------------------------
# Data-quality rules engine: per-rule violation counts over the star
# schema in ONE aggregate pass per table plus two key-orphan checks —
# the reference's per-file validation (enhanced_tasks.py:93-103,
# pattern_config.yaml:44-52) generalized to declarative warehouse
# constraints (not-null, range, PK uniqueness, FK integrity).
# --------------------------------------------------------------------------
@query("dq_rules", oracle="""
WITH o AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(count(*) FILTER (WHERE o_custkey IS NULL) AS BIGINT)
           AS null_cust,
         CAST(count(*) FILTER (WHERE o_orderdate < TIMESTAMP '1992-01-01'
                 OR o_orderdate >= TIMESTAMP '2000-01-01') AS BIGINT)
           AS bad_date
  FROM orders
),
l AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(count(*) FILTER (WHERE l_quantity < 1 OR l_quantity > 50)
              AS BIGINT) AS bad_qty,
         CAST(count(*) FILTER (WHERE l_extendedprice < 0) AS BIGINT)
           AS neg_price,
         CAST(count(*) - count(DISTINCT l_orderkey || '|' || l_linenumber)
              AS BIGINT) AS dup_pk
  FROM lineitem
),
fk_o AS (
  SELECT CAST(count(*) AS BIGINT) AS n FROM orders o
  WHERE NOT EXISTS (SELECT 1 FROM customer c
                    WHERE c.c_custkey = o.o_custkey)
),
fk_l AS (
  SELECT CAST(count(*) AS BIGINT) AS n FROM lineitem li
  WHERE NOT EXISTS (SELECT 1 FROM orders o
                    WHERE o.o_orderkey = li.l_orderkey)
),
r AS (
  SELECT 'orders_custkey_not_null' AS rule, o.n AS n_checked,
         o.null_cust AS n_violations FROM o
  UNION ALL SELECT 'orders_date_in_range', o.n, o.bad_date FROM o
  UNION ALL SELECT 'orders_custkey_fk', o.n, fk_o.n FROM o, fk_o
  UNION ALL SELECT 'lineitem_qty_range', l.n, l.bad_qty FROM l
  UNION ALL SELECT 'lineitem_price_nonneg', l.n, l.neg_price FROM l
  UNION ALL SELECT 'lineitem_pk_unique', l.n, l.dup_pk FROM l
  UNION ALL SELECT 'lineitem_orderkey_fk', l.n, fk_l.n FROM l, fk_l
)
SELECT rule, n_checked, n_violations,
       CAST(n_violations = 0 AS INT) AS pass
FROM r ORDER BY rule
""")
def dq_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seven declarative constraints, two table scans + two FK anti-joins.

    Each table's row-level rules fold into ONE aggregate over its scan
    (conditional count_if / distinct-count — map-side-combined, no
    per-rule rescans); the FK orphan checks are LEFT ANTI joins on the
    key (broadcast-able dims, AQE otherwise) whose 1-row counts attach
    via 1×1 cross joins. Output is rules×1 rows regardless of data
    volume — the audit a 100 TB nightly load gate runs."""
    t = load_tables(spark, sf_dir, ("orders", "lineitem", "customer"))
    orders, li, cust = t["orders"], t["lineitem"], t["customer"]

    o = orders.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.count_if(F.col("o_custkey").isNull()).cast("long")
         .alias("null_cust"),
        F.count_if((F.col("o_orderdate") <
                    F.lit("1992-01-01").cast("timestamp")) |
                   (F.col("o_orderdate") >=
                    F.lit("2000-01-01").cast("timestamp"))).cast("long")
         .alias("bad_date"))
    l = li.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.count_if((F.col("l_quantity") < 1) |
                   (F.col("l_quantity") > 50)).cast("long").alias("bad_qty"),
        F.count_if(F.col("l_extendedprice") < 0).cast("long")
         .alias("neg_price"),
        (F.count(F.lit(1)) -
         F.countDistinct(F.concat_ws("|", "l_orderkey", "l_linenumber")))
        .cast("long").alias("dup_pk"))
    fk_o = (orders.join(cust, orders.o_custkey == cust.c_custkey,
                        "left_anti")
            .agg(F.count(F.lit(1)).cast("long").alias("orphans")))
    fk_l = (li.join(orders.select("o_orderkey"),
                    li.l_orderkey == F.col("o_orderkey"), "left_anti")
            .agg(F.count(F.lit(1)).cast("long").alias("orphans")))

    def leg(rule, checked, violations, src):
        return src.select(F.lit(rule).alias("rule"),
                          F.col(checked).alias("n_checked"),
                          F.col(violations).alias("n_violations"))

    legs = [
        leg("orders_custkey_not_null", "n", "null_cust", o),
        leg("orders_date_in_range", "n", "bad_date", o),
        leg("orders_custkey_fk", "n", "orphans", o.crossJoin(fk_o)),
        leg("lineitem_qty_range", "n", "bad_qty", l),
        leg("lineitem_price_nonneg", "n", "neg_price", l),
        leg("lineitem_pk_unique", "n", "dup_pk", l),
        leg("lineitem_orderkey_fk", "n", "orphans", l.crossJoin(fk_l)),
    ]
    out = legs[0]
    for extra in legs[1:]:
        out = out.unionByName(extra)
    return (out.select("rule", "n_checked", "n_violations",
                       (F.col("n_violations") == 0).cast("int")
                       .alias("pass"))
            .orderBy("rule"))


# --------------------------------------------------------------------------
# Repeated-span census: per document, the fraction of its word 5-gram
# occurrences that appear ≥2 times corpus-wide (within- OR cross-doc) —
# the "duplicated substring" signal repeated-span dedup policies
# threshold on (complementary to minhash whole-doc near-dup).
# --------------------------------------------------------------------------
@query("dup_span_census", oracle="""
WITH wrds AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '')
           AS w
  FROM documents
),
idx AS (
  SELECT doc_id, w, unnest(range(1, greatest(len(w) - 3, 1))) AS i
  FROM wrds
),
g AS (
  SELECT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]
           || ' ' || w[i+4] AS s
  FROM idx WHERE i + 4 <= len(w)
),
occ AS (SELECT s, CAST(count(*) AS BIGINT) AS tot FROM g GROUP BY s),
per AS (
  SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_spans,
         CAST(count(*) FILTER (WHERE occ.tot >= 2) AS BIGINT) AS n_dup
  FROM g JOIN occ ON g.s = occ.s GROUP BY g.doc_id
)
SELECT d.doc_id,
       CAST(coalesce(p.n_spans, 0) AS BIGINT) AS n_spans,
       CAST(coalesce(p.n_dup, 0) AS BIGINT) AS n_dup,
       CAST(CASE WHEN coalesce(p.n_spans, 0) = 0 THEN 0
                 ELSE (1000 * p.n_dup) // p.n_spans END AS BIGINT)
         AS dup_milli
FROM documents d LEFT JOIN per p ON d.doc_id = p.doc_id
ORDER BY d.doc_id
""")
def dup_span_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All 5-gram occurrences (non-distinct — repetition IS the signal)
    shuffle once on the gram key for the occurrence census, then once
    more to rejoin per-occurrence rows; per-doc reduction brings it back
    to |docs| rows. Never doc-pairs: corpus-duplicated spans are a
    property of the gram key's count, exactly like the postings joins in
    contamination/boilerplate. Docs shorter than 5 words report 0/0."""
    from ..functions.texts import word_ngrams_raw

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    g = (docs.select("doc_id",
                     F.explode(word_ngrams_raw(F.col("text"), 5))
                     .alias("s")))
    occ = g.groupBy("s").agg(F.count(F.lit(1)).cast("long").alias("tot"))
    per = (g.join(occ, "s")
           .groupBy("doc_id")
           .agg(F.count(F.lit(1)).cast("long").alias("n_spans"),
                F.count_if(F.col("tot") >= 2).cast("long").alias("n_dup")))
    return (docs.select("doc_id").join(per, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("n_spans", F.lit(0)).cast("long")
                    .alias("n_spans"),
                    F.coalesce("n_dup", F.lit(0)).cast("long")
                    .alias("n_dup"),
                    F.when(F.coalesce("n_spans", F.lit(0)) == 0, F.lit(0))
                    .otherwise(F.expr("1000 * n_dup div n_spans"))
                    .cast("long").alias("dup_milli"))
            .orderBy("doc_id"))


# --------------------------------------------------------------------------
# Training-shard assignment: md5-bucket docs into 16 shards (the
# split_train_test contract generalized to N-way) and profile each shard
# — the deterministic, engine-portable layout step before a training
# run writes its webdataset/parquet shards.
# --------------------------------------------------------------------------
@query("shard_assign", oracle="""
WITH s AS (
  SELECT CAST(CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)
                                      || 'shard'), 1, 6)) AS BIGINT)
              % 16 AS BIGINT) AS shard,
         doc_id, n_chars, source
  FROM documents
)
SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
       CAST(min(doc_id) AS BIGINT) AS min_doc,
       CAST(max(doc_id) AS BIGINT) AS max_doc
FROM s GROUP BY shard ORDER BY shard
""")
def shard_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-only assignment (16-way md5 bucket on the stable id — both
    engines pick the SAME shard per doc) + one 16-group aggregate.
    At 100 TB the same expression feeds `.repartition(n, shard)
    .write.partitionBy(shard)` so shard files land size-balanced without
    a sort; the profile here is the balance audit for that layout."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    shard = (F.conv(F.substring(
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("shard"))),
        1, 6), 16, 10).cast("long") % 16).alias("shard")
    return (docs.select(shard, "doc_id", "n_chars", "source")
            .groupBy("shard")
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                 F.sum("n_chars").cast("long").alias("total_chars"),
                 F.countDistinct("source").cast("long").alias("n_sources"),
                 F.min("doc_id").cast("long").alias("min_doc"),
                 F.max("doc_id").cast("long").alias("max_doc"))
            .orderBy("shard"))


# --------------------------------------------------------------------------
# Exact EWMA smoothing: half-life-1 exponential moving average of daily
# event volume per type over the trailing 8 observations. Dyadic
# weights (2^-(k+1)) over a finite window make the smoother EXACT in
# BIGINTs — no float recursion, no cross-engine drift.
# --------------------------------------------------------------------------
_EWMA_LAG_SQL = ",\n         ".join(
    f"lag(n, {k}) OVER w AS n{k}" for k in range(1, 8))
_EWMA_NUM_SQL = " + ".join(
    ["128 * n"] + [f"coalesce({2 ** (7 - k)} * n{k}, 0)"
                   for k in range(1, 8)])
_EWMA_DEN_SQL = " + ".join(
    ["128"] + [f"CASE WHEN n{k} IS NULL THEN 0 ELSE {2 ** (7 - k)} END"
               for k in range(1, 8)])


@query("ewma_halflife", oracle=f"""
WITH daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY event_type, day
),
lagged AS (
  SELECT event_type, day, n,
         {_EWMA_LAG_SQL}
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY day)
)
SELECT event_type, day, n,
       CAST((1000 * ({_EWMA_NUM_SQL}))
            // ({_EWMA_DEN_SQL}) AS BIGINT) AS ewma_milli
FROM lagged ORDER BY event_type, day
""")
def ewma_halflife(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One events shuffle (the daily aggregate), then lag() windows on
    the tiny |types|·|days| relation. The weighted sum Σ n_{t-k}·2^(7-k)
    and its normalizer stay BIGINT; the division is integer milli —
    bit-identical in both engines, unlike any float-recursive EWMA.
    Warm-up rows (fewer than 8 observations) renormalize over the lags
    that exist, the standard adjusted-EWMA convention."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    daily = (ev.groupBy("event_type",
                        F.date_trunc("day", F.col("ts")).cast("date")
                        .alias("day"))
             .agg(F.count(F.lit(1)).cast("long").alias("n")))
    w = W.partitionBy("event_type").orderBy("day")
    lagged = daily.select(
        "event_type", "day", "n",
        *[F.lag("n", k).over(w).alias(f"n{k}") for k in range(1, 8)])
    num = F.lit(128) * F.col("n")
    den = F.lit(128)
    for k in range(1, 8):
        wt = 2 ** (7 - k)
        num = num + F.coalesce(F.col(f"n{k}") * wt, F.lit(0))
        den = den + F.when(F.col(f"n{k}").isNull(), 0).otherwise(wt)
    return (lagged.select("event_type", "day", "n",
                          (num * 1000).alias("num"), den.alias("den"))
            .select("event_type", "day", "n",
                    F.expr("num div den").cast("long").alias("ewma_milli"))
            .orderBy("event_type", "day"))


# --------------------------------------------------------------------------
# Incremental aggregate maintenance: a monthly revenue rollup kept as
# base (history) + delta (new load) partial aggregates, MERGED — the
# materialized-view maintenance pattern that avoids full recomputes at
# 100 TB. The oracle computes the rollup directly from scratch, so the
# hash match IS the proof that merge(base, delta) == recompute.
# --------------------------------------------------------------------------
@query("agg_incremental_merge", oracle="""
SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS rev_cents,
       CAST(max(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS max_cents
FROM orders GROUP BY month ORDER BY month
""")
def agg_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Base (< 1997-01-01) and delta (≥) partial aggregates merged with
    a full-outer join: counts/sums add, max takes greatest — the
    algebra every re-aggregable accumulator supports. Each side is one
    map-side-combined agg over its pruned scan; the merge joins two
    |months|-row relations. Hash-matching the from-scratch oracle
    certifies the maintenance identity merge(base, delta) == recompute."""
    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    cutoff = F.lit("1997-01-01").cast("timestamp")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")

    def rollup(df):
        return (df.groupBy(F.date_trunc("month", F.col("o_orderdate"))
                           .cast("date").alias("month"))
                .agg(F.count(F.lit(1)).cast("long").alias("n_orders"),
                     F.sum(cents).cast("long").alias("rev_cents"),
                     F.max(cents).cast("long").alias("max_cents")))

    base = rollup(orders.filter(F.col("o_orderdate") < cutoff))
    delta = rollup(orders.filter(F.col("o_orderdate") >= cutoff))
    b, d = base.alias("b"), delta.alias("d")
    return (b.join(d, F.col("b.month") == F.col("d.month"), "full_outer")
            .select(
                F.coalesce(F.col("b.month"), F.col("d.month"))
                .alias("month"),
                (F.coalesce(F.col("b.n_orders"), F.lit(0)) +
                 F.coalesce(F.col("d.n_orders"), F.lit(0)))
                .cast("long").alias("n_orders"),
                (F.coalesce(F.col("b.rev_cents"), F.lit(0)) +
                 F.coalesce(F.col("d.rev_cents"), F.lit(0)))
                .cast("long").alias("rev_cents"),
                F.greatest(
                    F.coalesce(F.col("b.max_cents"), F.col("d.max_cents")),
                    F.coalesce(F.col("d.max_cents"), F.col("b.max_cents")))
                .cast("long").alias("max_cents"))
            .orderBy("month"))


# --------------------------------------------------------------------------
# Null-safe join semantics: NULL keys match each other under <=> (IS NOT
# DISTINCT FROM) — the dimension-enrichment edge case plain equi-joins
# silently drop rows on.
# --------------------------------------------------------------------------
@query("join_null_safe", oracle="""
WITH l AS (
  SELECT nullif(event_type, 'view') AS k, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY nullif(event_type, 'view')
),
dim AS (
  SELECT DISTINCT nullif(event_type, 'view') AS k,
         'dim-' || coalesce(nullif(event_type, 'view'), 'null') AS label
  FROM events
)
SELECT coalesce(l.k, '(null)') AS key, l.n AS n_events, dim.label AS label
FROM l JOIN dim ON l.k IS NOT DISTINCT FROM dim.k
ORDER BY key
""")
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`eqNullSafe` (SQL `<=>`) keeps the NULL-keyed group a plain
    equi-join would drop. Null-safe equality still hash-partitions both
    sides on the key (NULLs co-locate: one hash value), so the join
    shuffles exactly like an equi-join — no BNLJ fallback; the plan
    test asserts that."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    k = F.nullif(F.col("event_type"), F.lit("view"))
    left = ev.groupBy(k.alias("k")).agg(F.count(F.lit(1)).cast("long")
                                        .alias("n"))
    dim = (ev.select(k.alias("dk")).distinct()
           .select("dk", F.concat(F.lit("dim-"),
                                  F.coalesce("dk", F.lit("null")))
                   .alias("label")))
    return (left.join(dim, F.col("k").eqNullSafe(F.col("dk")))
            .select(F.coalesce("k", F.lit("(null)")).alias("key"),
                    F.col("n").alias("n_events"), "label")
            .orderBy("key"))


# --------------------------------------------------------------------------
# Degree distribution of the word co-occurrence graph — the skew
# diagnostic that decides whether graph ops (triangles, pagerank) need
# hub mitigation, as a first-class histogram.
# --------------------------------------------------------------------------
_PAIRS_COUNTED_CTES = COOCCUR_PAIRS_CTES.replace(
    """pairs AS (
  SELECT a.word AS w1, b.word AS w2
  FROM doc_top a JOIN doc_top b
    ON a.doc_id = b.doc_id AND a.word < b.word
  GROUP BY a.word, b.word
  HAVING count(*) >= 20
)""",
    """pc AS (
  SELECT a.word AS w1, b.word AS w2, CAST(count(*) AS BIGINT) AS c
  FROM doc_top a JOIN doc_top b
    ON a.doc_id = b.doc_id AND a.word < b.word
  GROUP BY a.word, b.word
),
med AS (
  SELECT percentile_cont(0.5) WITHIN GROUP (ORDER BY c) AS m FROM pc
),
pairs AS (SELECT w1, w2 FROM pc, med WHERE pc.c >= med.m)""")
# a silent no-op replace would leave the absolute-floor pairs CTE in place
assert "med AS" in _PAIRS_COUNTED_CTES


@query("degree_distribution", oracle=f"""
WITH {_PAIRS_COUNTED_CTES},
ends AS (
  SELECT w1 AS w FROM pairs UNION ALL SELECT w2 FROM pairs
),
deg AS (SELECT w, CAST(count(*) AS BIGINT) AS d FROM ends GROUP BY w)
SELECT d AS degree, CAST(count(*) AS BIGINT) AS n_nodes
FROM deg GROUP BY d ORDER BY degree
""")
def degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree histogram of the above-median co-occurrence graph.

    The edge threshold is the MEDIAN pair count, not an absolute floor:
    the synthetic corpus's 31-word vocabulary makes any fixed floor
    yield the complete graph (every histogram a single bar) at every
    test SF, and at 100 TB an absolute count is meaningless anyway —
    relative thresholding is what co-occurrence graphs use in practice.
    One pair-count aggregate, a 1-row median broadcast back over the
    ≤top_k² pair relation, then each kept edge contributes both
    endpoints via one array-explode and two tiny keyed aggregates. The
    same relation shape pagerank/triangles consume, so this histogram is
    their pre-flight skew probe."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    pc = word_cooccur_pairs(docs, min_pairs=1, keep_count=True)
    med = pc.agg(F.expr("percentile(n_pair, 0.5)").alias("m"))
    pairs = (pc.crossJoin(F.broadcast(med))
             .filter(F.col("n_pair") >= F.col("m")))
    deg = (pairs.select(F.explode(F.array("a_id", "b_id")).alias("w"))
           .groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("d")))
    return (deg.groupBy(F.col("d").alias("degree"))
            .agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
            .orderBy("degree"))


# --------------------------------------------------------------------------
# Source-inequality Gini: how concentrated the corpus's character mass
# is across sources — the one-number diagnostic domain_cap /
# temperature-sampling decisions start from.
# --------------------------------------------------------------------------
@query("source_gini", oracle="""
WITH s AS (
  SELECT source, CAST(sum(n_chars) AS BIGINT) AS chars
  FROM documents GROUP BY source
),
r AS (
  SELECT source, chars,
         CAST(row_number() OVER (ORDER BY chars, source) AS BIGINT) AS i
  FROM s
),
t AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(chars) AS BIGINT) AS tot,
         CAST(sum(i * chars) AS BIGINT) AS iw
  FROM r
)
SELECT n AS n_sources, tot AS total_chars,
       CAST((1000000 * (2 * iw - (n + 1) * tot)) // (n * tot) AS BIGINT)
         AS gini_micro
FROM t
""")
def source_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini = (2·Σ i·x_(i) − (n+1)·Σx) / (n·Σx) on the per-source char
    totals: one corpus aggregate down to |sources| rows, then a window
    rank and a scalar aggregate over that tiny relation (the sort never
    touches the document stream). Ties in x are rank-order invariant —
    Σ i·x over a tied block is the same for any permutation — so the
    (chars, source) tiebreak is for determinism of the rank column only.
    Pure BIGINT; micro-unit integer division."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    s = (docs.groupBy("source")
         .agg(F.sum("n_chars").cast("long").alias("chars")))
    r = s.select("source", "chars",
                 F.row_number().over(W.orderBy("chars", "source"))
                 .cast("long").alias("i"))
    t = r.agg(F.count(F.lit(1)).cast("long").alias("n"),
              F.sum("chars").cast("long").alias("tot"),
              F.sum(F.col("i") * F.col("chars")).cast("long").alias("iw"))
    return t.select(
        F.col("n").alias("n_sources"), F.col("tot").alias("total_chars"),
        F.expr("(1000000 * (2 * iw - (n + 1) * tot)) div (n * tot)")
        .cast("long").alias("gini_micro"))
