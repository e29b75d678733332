"""Round-7 third-wave tests: prefix-filtered exact Jaccard join
(equality with the existing all-shingle operator, candidate reduction,
threshold-boundary behavior) and z-order layout pruning (interleave
arithmetic, scan-subset dominance)."""

from __future__ import annotations

from pyspark.sql import functions as F

from light_etl_windows_container_poc_spark.operators.dedup import (
    jaccard_prefix_pairs,
    ngram_jaccard_pairs,
)
from light_etl_windows_container_poc_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def test_prefix_join_equals_all_shingle_join(spark):
    """Same corpus, same threshold, same max_df: the prefix-filtered
    join must produce EXACTLY the pair set of the full postings join —
    the completeness theorem, checked against the in-repo operator on
    top of the DuckDB oracle."""
    from light_etl_windows_container_poc_spark.catalog import load_tables

    docs = load_tables(spark, SF, ("documents",))["documents"]
    got = {(r["a_id"], r["b_id"]) for r in jaccard_prefix_pairs(
        docs, "doc_id", "text", n=3, tau_num=4, tau_den=5,
        max_df=500).collect()}
    want = {(r["a_id"], r["b_id"]) for r in ngram_jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=0.8, max_df=500,
        hash_shingles=False).collect()}
    assert got == want


def test_prefix_join_threshold_boundary(spark):
    """J exactly at tau is KEPT (>=); just below is dropped. Docs with
    8 shingles sharing 8 (dup => J=1), and a 9-vs-9 pair sharing 8
    (J = 8/10 = 0.8 exactly), and a 10-vs-10 sharing 8 (8/12 < 0.8)."""
    base = "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9"          # 8 shingles
    s10 = base + " xa"                               # 9 shingles
    s10b = base + " xb"                              # 9, shares 8 with s10
    s11 = base + " ya yb"                            # 10 shingles
    s11b = base + " za zb"                           # 10, shares 8 with s11
    df = spark.createDataFrame(
        [(1, base), (2, base), (3, s10), (4, s10b), (5, s11), (6, s11b)],
        "doc_id long, text string")
    pairs = {(r["a_id"], r["b_id"]) for r in jaccard_prefix_pairs(
        df, "doc_id", "text", n=3, tau_num=4, tau_den=5).collect()}
    assert (1, 2) in pairs                      # identical: J = 1
    assert (3, 4) in pairs                      # J = 8/10 = 0.8: kept
    assert (5, 6) not in pairs                  # J = 8/12 < 0.8: dropped


def test_prefix_candidates_shrink(spark):
    """The scale claim: prefix postings and candidate pairs are a small
    fraction of the full join's."""
    from light_etl_windows_container_poc_spark.catalog import load_tables
    from pyspark.sql import Window as W
    from light_etl_windows_container_poc_spark.functions.texts import (
        word_shingles)

    docs = load_tables(spark, SF, ("documents",))["documents"]
    sh = docs.select(F.col("doc_id").alias("doc"),
                     F.explode(word_shingles(F.col("text"), 3)).alias("s"))
    dfreq = sh.groupBy("s").agg(F.count(F.lit(1)).alias("df_"))
    ranked = (sh.join(dfreq, "s").select(
        "doc", "s",
        F.row_number().over(
            W.partitionBy("doc").orderBy("df_", "s")).alias("pos"),
        F.count(F.lit(1)).over(W.partitionBy("doc")).alias("sz")))
    pref = ranked.filter(
        F.col("pos") <= F.col("sz") - F.expr("(4*sz+4) div 5") + 1)
    n_full, n_pref = sh.count(), pref.count()
    assert n_pref * 3 < n_full  # prefix is (1-tau)+eps of each set

    full_cand = (sh.alias("a").join(sh.alias("b"), "s")
                 .filter(F.col("a.doc") < F.col("b.doc")).count())
    pref_cand = (pref.alias("a").join(pref.alias("b"), "s")
                 .filter(F.col("a.doc") < F.col("b.doc")).count())
    assert pref_cand * 5 < full_cand


def test_zorder_interleave_arithmetic(spark):
    from light_etl_windows_container_poc_spark.queries.breadth30 import (
        _z_terms)

    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (3, 5), (65535, 65535)], "x long, y long")
    got = [r[0] for r in df.select(
        F.expr(_z_terms("x", "y", "", True))).collect()]

    def z(x, y):
        v = 0
        for i in range(16):
            v |= ((x >> i) & 1) << (2 * i)
            v |= ((y >> i) & 1) << (2 * i + 1)
        return v

    assert got == [z(0, 0), z(1, 0), z(0, 1), z(3, 5), z(65535, 65535)]
    assert z(1, 0) == 1 and z(0, 1) == 2 and z(3, 5) == 0b100111


def test_zorder_scan_subset_of_key_scan(spark):
    """Every row scanned under the z-layout is also scanned under the
    custkey layout (equal x-granularity), so rows_scanned(z) <=
    rows_scanned(key) always — and strictly less here because the
    90-day window prunes date cells."""
    rows = {r["layout"]: r for r in
            QUERIES["zorder_zone_prune"](spark, SF).collect()}
    zr, kr = rows["zorder"], rows["custkey_sort"]
    assert zr["rows_in_box"] == kr["rows_in_box"]
    assert zr["rows_scanned"] >= zr["rows_in_box"]  # pruning never lies
    assert kr["rows_scanned"] >= kr["rows_in_box"]
    assert zr["rows_scanned"] < kr["rows_scanned"]


def test_new_queries_smoke_and_nonempty(spark):
    for name in ("dedup_jaccard_prefix", "zorder_zone_prune"):
        assert QUERIES[name](spark, SF).count() > 0, name


def test_retract_merge_equals_recompute(spark):
    """Library-level check on top of the oracle: the merge path and a
    Spark-side recompute agree group-for-group, including a group that
    exists only in deletes+base (net zero -> dropped) on synthetic
    data."""
    rows = [(i, f"P{i % 3}", float(i), f"199{8 + (i % 2)}-06-01")
            for i in range(1, 61)]
    # group P9 exists only before the cutoff and is fully deleted
    rows += [(70, "P9", 5.0, "1998-01-01"), (77, "P9", 6.0, "1998-01-01")]
    df = spark.createDataFrame(
        rows, "o_orderkey long, o_orderpriority string,"
              " o_totalprice double, d string") \
        .withColumn("o_orderdate", F.col("d").cast("timestamp")).drop("d")
    # full deletion of P9: both its keys hit o_orderkey % 7 == 0 rule
    cut = F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp")
    is_del = cut & (F.col("o_orderkey") % 7 == 0)

    def part(d, tag):
        return d.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).alias(f"n_{tag}"),
            F.sum("o_totalprice").alias(f"s_{tag}"))

    merged = (part(df.filter(cut), "base")
              .join(part(df.filter(~cut), "ins"), "o_orderpriority", "full")
              .join(part(df.filter(is_del), "del"), "o_orderpriority",
                    "full"))
    z = lambda c: F.coalesce(F.col(c), F.lit(0))  # noqa: E731
    got = {r["o_orderpriority"]: (r["n"], r["s"]) for r in merged.select(
        "o_orderpriority",
        (z("n_base") + z("n_ins") - z("n_del")).alias("n"),
        (z("s_base") + z("s_ins") - z("s_del")).alias("s"))
        .filter(F.col("n") > 0).collect()}
    want = {r["o_orderpriority"]: (r["n"], r["s"]) for r in
            df.filter(~is_del).groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("o_totalprice").alias("s")).collect()}
    assert got == want
    assert "P9" not in got  # net-zero group dropped, not emitted as 0
