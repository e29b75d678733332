"""Round-8 second-wave kernels: Count-Min guarantees, LPA determinism,
entity-resolution structure, and the join-delta maintenance theorem."""

from __future__ import annotations

from pyspark.sql import functions as F

from light_etl_windows_container_poc_spark.catalog import load_tables
from light_etl_windows_container_poc_spark.operators.sketches import (
    cm_build, cm_point_query)
from light_etl_windows_container_poc_spark.operators.graph import (
    label_propagation)
from light_etl_windows_container_poc_spark.queries import QUERIES


def test_cm_never_undercounts_any_key(spark, sf_dir):
    """est >= exact must hold for EVERY key, not just the probed top-20
    (CM's deterministic guarantee)."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    grid = cm_build(ev, "user_id", depth=4, width=64)
    exact = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact_cnt"))
    est = cm_point_query(grid, exact.select("user_id"), "user_id",
                         depth=4, width=64)
    bad = (exact.join(est, "user_id")
           .filter(F.col("est_cnt") < F.col("exact_cnt")).count())
    assert bad == 0


def test_cm_grid_merges_by_addition(spark, sf_dir):
    """Grids built on disjoint halves, summed cell-wise, equal the
    whole-stream grid — CM's mergeability is exact, not approximate."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    whole = cm_build(ev, "user_id", depth=4, width=64)
    lo = cm_build(ev.filter(F.col("event_id") % 2 == 0), "user_id", 4, 64)
    hi = cm_build(ev.filter(F.col("event_id") % 2 == 1), "user_id", 4, 64)
    summed = (lo.unionAll(hi).groupBy("seed", "bucket")
              .agg(F.sum("cnt").alias("cnt")))
    assert summed.exceptAll(whole).count() == 0
    assert whole.exceptAll(summed).count() == 0


def test_cm_absent_key_overestimates_nonnegatively(spark, sf_dir):
    """A key never seen in the stream still gets est >= 0 (pure
    collision mass) — the point-query path must not error on misses."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    grid = cm_build(ev, "user_id", depth=4, width=64)
    absent = spark.range(1).select(
        (F.lit(10 ** 12)).alias("user_id"))
    rows = cm_point_query(grid, absent, "user_id", 4, 64).collect()
    # an absent key estimates pure collision mass; an empty cell counts
    # as ZERO (canonical semantics — the sketch can prove absence)
    assert len(rows) == 1 and rows[0].est_cnt >= 0


def test_lpa_is_partitioning_invariant(spark, sf_dir):
    """Label states depend only on the graph, never on layout — the
    (count DESC, label ASC) total order has no ties to break by luck."""
    t = load_tables(spark, sf_dir, ("orders", "lineitem"))
    pairs = (t["lineitem"].join(t["orders"],
                                F.col("l_orderkey") == F.col("o_orderkey"))
             .groupBy(F.concat(F.lit("c"), F.col("o_custkey")).alias("u"),
                      F.concat(F.lit("s"), F.col("l_suppkey")).alias("v"))
             .agg(F.count(F.lit(1)).alias("n"))
             .filter(F.col("n") >= 2).select("u", "v"))
    edges = pairs.unionAll(pairs.select(F.col("v").alias("u"),
                                        F.col("u").alias("v")))
    a = {(r.node, r.label)
         for r in label_propagation(edges, rounds=2).collect()}
    b = {(r.node, r.label)
         for r in label_propagation(edges.repartition(7, "v"),
                                    rounds=2).collect()}
    assert a == b


def test_lpa_zero_rounds_is_identity(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("b", "c"), ("c", "b")], ["u", "v"])
    out = {(r.node, r.label)
           for r in label_propagation(edges, rounds=0).collect()}
    assert out == {("a", "a"), ("b", "b"), ("c", "c")}


def test_lpa_triangle_converges_to_min_heavy_label(spark):
    """On a path a-b-c, round 1 gives a<-b, b<-a (min of {a,c}), c<-b;
    the rule's determinism is checkable by hand."""
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("b", "c"), ("c", "b")], ["u", "v"])
    out = {r.node: r.label
           for r in label_propagation(edges, rounds=1).collect()}
    assert out == {"a": "b", "b": "a", "c": "b"}


def test_entity_resolution_partitions_the_records(spark, sf_dir):
    """Clusters are a PARTITION of the variant records: every distinct
    (name, brand) lands in exactly one cluster, row mass is conserved,
    and each canonical name is one of its cluster's variants."""
    part = load_tables(spark, sf_dir, ("part",))["part"]
    out = QUERIES["entity_resolution"](spark, sf_dir).collect()
    n_records = part.select("p_name", "p_brand").distinct().count()
    assert sum(r.n_variants for r in out) == n_records
    assert sum(r.n_rows for r in out) == part.count()
    # canonical names exist among the cluster's brand variants
    names = {(r.p_name, r.p_brand) for r in
             part.select("p_name", "p_brand").distinct().collect()}
    for r in out:
        assert (r.canon_name, r.p_brand) in names


def test_join_delta_equals_full_recompute(spark, sf_dir):
    """The Spark-side delta algebra must equal the from-scratch join —
    the same identity the driver oracle hashes, asserted here in-engine
    so pytest catches a broken term before certification does."""
    t = load_tables(spark, sf_dir, ("orders", "lineitem"))
    r_new = (t["orders"]
             .filter(~((F.col("o_orderkey") % 10 != 0)
                       & (F.col("o_orderkey") % 13 == 5)))
             .select("o_orderkey", "o_orderpriority"))
    s = t["lineitem"].select(
        "l_orderkey", "l_returnflag",
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"))
    full = (r_new.join(s, F.col("o_orderkey") == F.col("l_orderkey"))
            .groupBy("o_orderpriority", "l_returnflag")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("cents").alias("revenue_cents")))
    inc = QUERIES["join_incremental_delta"](spark, sf_dir)
    assert inc.exceptAll(full).count() == 0
    assert full.exceptAll(inc).count() == 0


def test_unigram_training_is_layout_invariant(spark, sf_dir):
    """The learned vocabulary depends only on the corpus: partial
    E-step counts merge by addition, so batching/partitioning must not
    matter."""
    from light_etl_windows_container_poc_spark.operators.unigram import (
        unigram_train)

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    v1, lls1, _, _ = unigram_train(docs, "text", rounds=2)
    v2, lls2, _, _ = unigram_train(docs.repartition(7), "text", rounds=2)
    assert lls1 == lls2
    assert v1.exceptAll(v2).count() == 0 and v2.exceptAll(v1).count() == 0


def test_unigram_ll_monotone_and_improving(spark, sf_dir):
    """LL must never drop (within the documented slack) and, on this
    corpus, must strictly improve from the seed model in round 2."""
    from light_etl_windows_container_poc_spark.operators.unigram import (
        unigram_train)

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    _, lls, _, n_chars = unigram_train(docs, "text", rounds=4)
    assert all(b + n_chars >= a for a, b in zip(lls, lls[1:]))
    assert lls[1] > lls[0]


def test_unigram_char_mass_conserved_and_feasible(spark, sf_dir):
    """Every weighted character of the word dictionary lands in exactly
    one counted piece (no word silently dropped as unsegmentable), even
    after enough rounds for rare pieces to fall out of support."""
    from pyspark.sql import functions as SF

    from light_etl_windows_container_poc_spark.operators.unigram import (
        unigram_train)

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    vocab, _, _, n_chars = unigram_train(docs, "text", rounds=6)
    pc = vocab.agg(SF.sum(SF.col("cnt") * SF.length("piece"))).first()[0]
    assert int(pc) == n_chars


def test_unigram_seed_pull_is_bounded(spark):
    """The per-round driver pull is a k-bounded model artifact ONLY
    because the multi-char seed is capped (seed_sentencepiece_size):
    an adversarial vocabulary of many distinct words must yield at most
    seed_size multi-char pieces + the alphabet, the cap must keep the
    HIGHEST-count pieces, and training must still conserve character
    mass on the capped seed."""
    from pyspark.sql import functions as SF

    from light_etl_windows_container_poc_spark.operators.unigram import (
        seed_piece_counts, unigram_train, word_dict)

    # 343 distinct CVC-ish 3-grams + repeated common words → thousands
    # of substring pieces uncapped
    vocab = [a + b + c for a in "abcdefg" for b in "hijklmn"
             for c in "opqrstu"]
    text = " ".join(vocab * 3 + ["the and of"] * 50)
    docs = spark.createDataFrame([(text,)], "text string")
    wdict = word_dict(docs, "text")

    uncapped = seed_piece_counts(wdict, max_len=4, min_count=2).collect()
    seed_size = 40
    capped = seed_piece_counts(wdict, max_len=4, min_count=2,
                               seed_size=seed_size).collect()
    n_chars_alpha = len({ch for w in vocab + ["the", "and", "of"]
                         for ch in w})
    assert len([r for r in uncapped if len(r["piece"]) > 1]) > seed_size
    multi = [r for r in capped if len(r["piece"]) > 1]
    assert len(multi) == seed_size
    assert len(capped) <= seed_size + n_chars_alpha
    # the cap keeps the TOP pieces: min kept count >= max dropped count
    kept = {r["piece"] for r in multi}
    dropped = [r for r in uncapped
               if len(r["piece"]) > 1 and r["piece"] not in kept]
    assert min(r["cnt"] for r in multi) >= max(r["cnt"] for r in dropped)
    # training on the capped seed still conserves character mass
    v, _, _, n_chars = unigram_train(docs, "text", rounds=2,
                                     seed_size=seed_size)
    pc = v.agg(SF.sum(SF.col("cnt") * SF.length("piece"))).first()[0]
    assert int(pc) == n_chars


def test_second_wave_queries_plan_clean(spark, sf_dir):
    """No cartesian/nested-loop joins anywhere in the second wave's
    relational plans: ER's candidates come from the brand equi-join,
    LPA/join-delta from key equi-joins, CM from broadcast grid joins."""
    from light_etl_windows_container_poc_spark.plans import formatted_plan

    for name in ("countmin_sketch", "graph_label_propagation",
                 "entity_resolution", "join_incremental_delta"):
        plan = formatted_plan(QUERIES[name](spark, sf_dir))
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name
