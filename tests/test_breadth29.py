"""Round-7 second-wave tests: Misra-Gries guarantees and layout
invariance, BPE learning vs a pure-Python reference trainer, skyline
vs brute-force dominance, bloom-index no-false-negative over EVERY key,
and weighted-sample determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from light_etl_windows_container_poc_spark.operators.sketches import (
    mg_heavy_hitters,
    mg_merge,
    mg_partial_summaries,
)
from light_etl_windows_container_poc_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


# --------------------------------------------------------------------- MG
def _mg_guarantees(spark, rows, k, parts):
    df = spark.createDataFrame([(t,) for t in rows], "token string") \
        .repartition(parts)
    sketch = {r["token"]: r["est"]
              for r in mg_heavy_hitters(df, "token", k).collect()}
    exact: dict[str, int] = {}
    for t in rows:
        exact[t] = exact.get(t, 0) + 1
    n = len(rows)
    assert len(sketch) <= k
    for t, est in sketch.items():
        assert est <= exact[t], f"{t}: overcount {est} > {exact[t]}"
    for t, cnt in exact.items():
        if cnt * (k + 1) > n:  # true freq > n/(k+1) => must be present
            assert t in sketch, f"heavy {t} ({cnt}/{n}) lost"
        if t in sketch:
            assert (cnt - sketch[t]) * (k + 1) <= n, \
                f"{t}: deficit {cnt - sketch[t]} > n/(k+1)"


def test_mg_skewed_stream_guarantees(spark):
    # zipf-ish: token_i appears ~1000/i times; k=8 counters force
    # constant compression
    rows = []
    for i in range(1, 60):
        rows.extend([f"t{i:02d}"] * (1000 // i))
    _mg_guarantees(spark, rows, k=8, parts=7)


def test_mg_uniform_stream_guarantees(spark):
    rows = [f"u{i % 37}" for i in range(5000)]
    _mg_guarantees(spark, rows, k=12, parts=5)


def test_mg_cert_layout_invariant(spark):
    """Estimates may shift with partitioning; the GUARANTEES (what the
    certified query hashes) may not."""
    rows = [f"w{i % 23}" for i in range(3000)] + ["hot"] * 500
    for parts in (1, 3, 11):
        _mg_guarantees(spark, rows, k=10, parts=parts)


def test_mg_merge_caps_size(spark):
    partials = spark.createDataFrame(
        [(f"p{i}", 10 + i) for i in range(40)], "token string, est long")
    out = mg_merge(partials, k=6).collect()
    assert len(out) <= 6
    # survivors are exactly the tokens strictly above the 7th-largest
    assert {r["token"] for r in out} <= {f"p{i}" for i in range(34, 40)}


def test_mg_partials_bounded(spark):
    df = spark.createDataFrame(
        [(f"x{i % 50}",) for i in range(2000)], "token string") \
        .repartition(4)
    per_part = mg_partial_summaries(df, "token", 9)
    assert per_part.count() <= 4 * 9


# -------------------------------------------------------------------- BPE
def _ref_bpe(word_counts: dict[str, int], rounds: int):
    """Pure-Python reference trainer with the SAME contracts: adjacent
    pair counts over the dict, (count DESC, l, r) argmax, literal
    leftmost-non-overlap replace (str.replace scans the original)."""
    reps = {w: " " + " ".join(w) + " " for w in word_counts}
    merges = []
    for _ in range(rounds):
        counts: dict[tuple[str, str], int] = {}
        for w, rep in reps.items():
            syms = rep.split()
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + word_counts[w]
        if not counts:
            break
        (l, r), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((l, r, l + r, c))
        reps = {w: rep.replace(f" {l} {r} ", f" {l}{r} ")
                for w, rep in reps.items()}
    return merges


def test_bpe_learn_matches_reference(spark, tmp_path):
    # build a tiny corpus as a parquet 'documents' table
    docs = [
        (1, "the cat and the hat sat", "en", "a"),
        (2, "the cats chatter and the rats chat", "en", "a"),
        (3, "that hat is the cats hat", "en", "b"),
    ]
    df = spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string")
    d = str(tmp_path / "documents.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(d)
    # the loader reads <sf_dir>/documents.parquet
    got = QUERIES["bpe_learn"](spark, str(tmp_path)).collect()

    wc: dict[str, int] = {}
    for _, text, _, _ in docs:
        for w in text.split():
            wc[w] = wc.get(w, 0) + 1
    want = _ref_bpe(wc, 6)
    assert [(r["lft"], r["rgt"], r["merged"], r["pair_count"])
            for r in got] == want


def test_bpe_adjacent_repeat_semantics(spark, tmp_path):
    """'aaaa' under merge (a,a): leftmost-non-overlap gives aa a a ->
    the reference trainer and the Spark chain must agree on the
    resulting pair counts in the NEXT round."""
    df = spark.createDataFrame(
        [(1, "aaaa aaaa ab", "en", "a")],
        "doc_id long, text string, lang string, source string")
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet"))
    got = QUERIES["bpe_learn"](spark, str(tmp_path)).collect()
    wc = {"aaaa": 2, "ab": 1}
    want = _ref_bpe(wc, 6)
    assert [(r["lft"], r["rgt"], r["merged"], r["pair_count"])
            for r in got] == want


# ---------------------------------------------------------------- skyline
def test_skyline_equals_bruteforce(spark, tmp_path):
    import random

    rng = random.Random(7)
    rows = [(f"B{i % 3}", i,
             float(rng.randrange(100, 200)) / 100.0,
             rng.randrange(1, 20)) for i in range(300)]
    # force tie cases below the random price range so they sit on the
    # frontier: identical duplicates both survive, the same-price
    # smaller-size row is dominated
    rows += [("B0", 900, 0.50, 7), ("B0", 901, 0.50, 7),
             ("B0", 902, 0.50, 5)]
    df = spark.createDataFrame(
        rows, "p_brand string, p_partkey long, p_retailprice double,"
              " p_size int")
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "part.parquet"))
    got = {(r["p_brand"], r["p_partkey"])
           for r in QUERIES["skyline_parts"](spark, str(tmp_path)).collect()}

    pts = [(b, k, round(p * 100), s) for b, k, p, s in rows]
    want = set()
    for b, k, p, s in pts:
        dominated = any(
            b2 == b and p2 <= p and s2 >= s and (p2 < p or s2 > s)
            for b2, _, p2, s2 in pts)
        if not dominated:
            want.add((b, k))
    assert got == want
    # the duplicate pair survives together; the smaller-size triplet row
    # is dominated
    assert ("B0", 900) in got and ("B0", 901) in got
    assert ("B0", 902) not in got


# ------------------------------------------------------------------ bloom
def test_bloom_no_false_negative_every_key(spark):
    """Not just the 5 certified probes: EVERY custkey's true zones must
    pass its bloom check (the index never under-admits)."""
    from light_etl_windows_container_poc_spark.catalog import load_tables

    orders = load_tables(spark, SF, ("orders",))["orders"]
    h = F.conv(F.substring(F.md5(F.col("o_custkey").cast("string")), 1, 8),
               16, 10).cast("long")
    o = orders.select(F.expr("o_orderkey div 4096").alias("zone"),
                      "o_custkey", h.alias("h"))
    s = o.select("zone", "o_custkey",
                 F.expr("(h div 64) % 256").alias("word"),
                 F.expr("shiftleft(CAST(1 AS BIGINT),"
                        " CAST(h % 63 AS INT))").alias("sig"))
    bloom = s.groupBy("zone", "word").agg(
        F.expr("bit_or(sig)").alias("mask"))
    misses = (s.join(bloom, ["zone", "word"])
              .filter(F.expr("(mask & sig) = 0")).count())
    assert misses == 0


# -------------------------------------------------------------- sampling
def test_weighted_sample_deterministic_and_sized(spark):
    a = QUERIES["weighted_sample"](spark, SF).collect()
    b = QUERIES["weighted_sample"](spark, SF).collect()
    assert [r["doc_id"] for r in a] == [r["doc_id"] for r in b]
    assert len(a) == 100
    # weights actually matter: the sampled docs skew longer than the
    # corpus median (expected under ES with length weights)
    from light_etl_windows_container_poc_spark.catalog import load_tables

    docs = load_tables(spark, SF, ("documents",))["documents"]
    med = docs.agg(F.expr("percentile(length(text), 0.5)")).first()[0]
    longer = sum(1 for r in a if r["w"] > med)
    assert longer > 50


@pytest.mark.parametrize("name", [
    "weighted_sample", "skyline_parts", "bloom_zone_prune",
    "heavy_hitters", "bpe_learn"])
def test_new_queries_smoke(spark, name):
    df = QUERIES[name](spark, SF)
    assert df.count() > 0


# ------------------------------------------------------------ plan shapes
def test_weighted_sample_is_take_ordered(spark):
    from light_etl_windows_container_poc_spark.plans import formatted_plan

    plan = formatted_plan(QUERIES["weighted_sample"](spark, SF))
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan  # never a global rank over the corpus


def test_skyline_prefix_and_bloom_probe_broadcast(spark):
    from light_etl_windows_container_poc_spark.plans import (
        assert_broadcast_join, assert_no_python_udf)

    for name in ("skyline_parts", "bloom_zone_prune"):
        df = QUERIES[name](spark, SF)
        assert_broadcast_join(df)
        assert_no_python_udf(df)


def test_dynamic_partition_pruning_fires(spark, tmp_path):
    """100 TB fact tables are date/priority-partitioned; a dim-filtered
    join must prune fact partitions AT RUNTIME (DPP), not scan all of
    them. Certify Spark plans a DynamicPruning subquery on the
    partitioned scan for the canonical star-join shape."""
    from light_etl_windows_container_poc_spark.catalog import load_tables

    orders = load_tables(spark, SF, ("orders",))["orders"]
    fact_dir = str(tmp_path / "orders_by_priority")
    orders.write.partitionBy("o_orderpriority").parquet(fact_dir)
    fact = spark.read.parquet(fact_dir)
    dim = spark.createDataFrame(
        [(p, 1) for p in ("1-URGENT", "2-HIGH")],
        "o_orderpriority string, flag int")
    joined = (fact.join(dim.filter(F.col("flag") == 1), "o_orderpriority")
              .groupBy("o_orderpriority").count())
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]
