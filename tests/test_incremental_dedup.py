"""Cross-run incremental dedup: index build/append/query round-trips and
the batch-invariance contract (greedy-vs-kept) replayed for real."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from light_etl_windows_container_poc_spark.catalog import load_tables
from light_etl_windows_container_poc_spark.operators.incremental import (
    build_exact_index, build_minhash_index, greedy_keep,
    incremental_exact_dedup, incremental_minhash_dedup)


@pytest.fixture()
def docs(spark, sf_dir):
    return (load_tables(spark, sf_dir, ("documents",))["documents"]
            .filter(F.col("doc_id") < 120).select("doc_id", "text"))


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "a_id long, b_id long")


def _ids(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "doc long")


def test_greedy_keep_chain_semantics(spark):
    # chain 1-2-3 (no 1~3 edge): greedy keeps {1, 3} — 2 drops against
    # kept 1, 3 survives because its only smaller neighbor was dropped
    out = {r.doc: r.keep
           for r in greedy_keep(_ids(spark, [1, 2, 3]),
                                _pairs(spark, [(1, 2), (2, 3)])).collect()}
    assert out == {1: 1, 2: 0, 3: 1}


def test_greedy_keep_clique_keeps_min(spark):
    out = {r.doc: r.keep
           for r in greedy_keep(
               _ids(spark, [5, 6, 7, 9]),
               _pairs(spark, [(5, 6), (5, 7), (6, 7)])).collect()}
    assert out == {5: 1, 6: 0, 7: 0, 9: 1}  # 9 unpaired → kept


def test_exact_incremental_matches_global_min(spark, docs, tmp_path):
    # corpus = docs ∪ exact copies of %5 docs at +10000: batch replay
    # must equal the global min-id-per-hash answer
    copies = (docs.filter(F.col("doc_id") % 5 == 0)
              .select((F.col("doc_id") + 10_000).alias("doc_id"), "text"))
    idx = str(tmp_path / "idx")
    build_exact_index(docs, "doc_id", "text", idx)
    dec = incremental_exact_dedup(copies, "doc_id", "text", idx)
    got = {r.doc_id: (r.dup_of_history, r.keep) for r in dec.collect()}
    assert got and all(v == (1, 0) for v in got.values())
    # novel doc in a later batch is kept and lands in the index
    novel = copies.limit(1).select(
        (F.col("doc_id") + 20_000).alias("doc_id"),
        F.concat("text", F.lit(" novel")).alias("text"))
    d2 = incremental_exact_dedup(novel, "doc_id", "text", idx)
    assert [r.keep for r in d2.collect()] == [1]
    # ... so a COPY of it in the batch after that is dropped as history
    again = novel.select((F.col("doc_id") + 1).alias("doc_id"), "text")
    d3 = incremental_exact_dedup(again, "doc_id", "text", idx)
    assert [(r.dup_of_history, r.keep) for r in d3.collect()] == [(1, 0)]


def test_minhash_batched_equals_oneshot(spark, docs, tmp_path):
    variants = (docs.filter(F.col("doc_id") % 6 == 0)
                .select((F.col("doc_id") + 10_000).alias("doc_id"),
                        F.concat("text", F.lit(" tail")).alias("text")))
    corpus = docs.unionByName(variants)
    kw = dict(num_hashes=32, bands=8, threshold=0.8, seed=7, num_parts=4)

    idx_b = str(tmp_path / "b")
    batched = {}
    for b in (docs, variants):
        for r in incremental_minhash_dedup(b, "doc_id", "text", idx_b,
                                           **kw).collect():
            batched[r.doc_id] = r.keep
    idx_o = str(tmp_path / "o")
    oneshot = {r.doc_id: r.keep
               for r in incremental_minhash_dedup(
                   corpus, "doc_id", "text", idx_o, **kw).collect()}
    assert batched == oneshot
    # the near-dup variants must actually be caught (non-vacuous test)
    dropped = [d for d, k in batched.items() if d >= 10_000 and k == 0]
    assert dropped, "no variant was deduped — thresholds too tight?"


def test_minhash_index_persists_across_reopen(spark, docs, tmp_path):
    idx = str(tmp_path / "idx")
    build_minhash_index(docs, "doc_id", "text", idx, num_hashes=32,
                        bands=8, num_parts=4)
    assert os.path.exists(os.path.join(idx, "sigs"))
    assert os.path.exists(os.path.join(idx, "bands"))
    # an exact copy batch probed against the REOPENED index is dropped
    copies = (docs.limit(5)
              .select((F.col("doc_id") + 10_000).alias("doc_id"), "text"))
    dec = incremental_minhash_dedup(copies, "doc_id", "text", idx,
                                    num_hashes=32, bands=8, num_parts=4)
    rows = dec.collect()
    assert all(r.dup_of_history == 1 and r.keep == 0 for r in rows)
    assert len(rows) == 5


def test_missing_index_bootstraps_empty_history(spark, docs, tmp_path):
    idx = str(tmp_path / "fresh")
    dec = incremental_minhash_dedup(docs.limit(10), "doc_id", "text", idx,
                                    num_hashes=32, bands=8, num_parts=4)
    rows = dec.collect()
    assert len(rows) == 10
    assert all(r.dup_of_history == 0 for r in rows)
    # the bootstrap append created the state tables
    assert os.path.exists(os.path.join(idx, "sigs"))
    assert os.path.exists(os.path.join(idx, "bands"))


def test_greedy_keep_matches_sequential_reference_on_random_graphs(spark):
    """greedy_keep's distributed layering must equal the sequential
    definition (process ids ascending; drop iff a KEPT smaller neighbor
    exists) on arbitrary graphs — chains, cliques, stars, and the
    random mixtures hypothesis-style seeds generate."""
    import random
    from collections import defaultdict

    for seed in range(6):
        rng = random.Random(seed)
        ids = sorted(rng.sample(range(1000), 30))
        edges = {tuple(sorted(rng.sample(ids, 2))) for _ in range(40)}
        adj = defaultdict(set)
        for a, b in edges:
            adj[a].add(b)
            adj[b].add(a)
        kept_ref = set()
        for d in ids:  # ascending — the sequential definition
            if not any(k < d and k in kept_ref for k in adj[d]):
                kept_ref.add(d)
        got = {r.doc: r.keep
               for r in greedy_keep(
                   _ids(spark, ids),
                   _pairs(spark, sorted(edges))).collect()}
        want = {d: (1 if d in kept_ref else 0) for d in ids}
        assert got == want, (seed, got, want)


def test_greedy_keep_settles_at_exact_round_bound(spark):
    """A dependency chain needing exactly max_rounds working rounds
    must SETTLE, not raise: path 1-2-3-4-5 layers as {1},{3},{5} = 3
    rounds; the convergence check runs after the last working round
    (a for/else formulation raised here despite convergence)."""
    ids = _ids(spark, [1, 2, 3, 4, 5])
    pairs = _pairs(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    out = {r.doc: r.keep
           for r in greedy_keep(ids, pairs, max_rounds=3).collect()}
    assert out == {1: 1, 2: 0, 3: 1, 4: 0, 5: 1}
    # one round fewer genuinely cannot finish → the error is real
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="did not settle"):
        greedy_keep(ids, pairs, max_rounds=2).collect()


# --------------------------------------------------------------------------
# bucketed bands state table: shuffle-free history-side probe
# --------------------------------------------------------------------------

def test_bucketed_bands_probe_has_no_history_side_exchange(spark, docs,
                                                           tmp_path):
    """With bands/ bucketed by band_hash, the probe join must read the
    history side `Bucketed: true` with NO Exchange above its scan —
    only the (small) batch shuffles, to the bucket count. This is the
    100 TB lever: the history table grows with the corpus; the probe
    cost must not."""
    from light_etl_windows_container_poc_spark.operators.incremental import (
        _band_table, _minhash_sigs, _read_bands)

    idx = str(tmp_path / "bidx")
    build_minhash_index(docs, "doc_id", "text", idx, num_hashes=32,
                        bands=8, num_parts=4, bucket_bands=8)
    bands_path = os.path.join(idx, "bands")
    assert os.path.exists(os.path.join(bands_path, "_bucket_spec.json"))
    # the EXACT probe join the operator builds (its return value is
    # checkpointed, so the probe plan must be asserted pre-checkpoint)
    batch = (docs.limit(20)
             .select((F.col("doc_id") + 10_000).alias("doc_id"), "text"))
    bsigs = _minhash_sigs(batch, "doc_id", "text", 32, 3, 42, num_parts=4)
    probe = (_band_table(bsigs, 8, 4)
             .join(_read_bands(spark, bands_path)
                   .withColumnRenamed("doc", "h_doc")
                   .select("h_doc", "band_hash"), "band_hash"))
    # a CERTIFICATION-sized batch broadcasts (BroadcastHashJoin — zero
    # shuffle on either side, the right plan when the batch is tiny);
    # the bucketing pays off when the batch outgrows broadcast, so
    # force the sort-merge path to assert the at-scale shape
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan = probe._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
    assert "Bucketed: true" in plan, plan
    assert "disabled by query planner" not in plan, plan
    # the history leg (the subtree containing the bands FileScan) must
    # hold NO Exchange: in the plan text the bucketed scan's leg is the
    # last child printed under the join — everything from that leg's
    # opening Sort to the FileScan line must be exchange-free (the
    # batch leg's Exchange prints before it)
    scan_pos = plan.index("letl_state_")
    join_pos = max(plan.rfind("SortMergeJoin", 0, scan_pos),
                   plan.rfind("ShuffledHashJoin", 0, scan_pos))
    assert join_pos >= 0, plan
    between = plan[join_pos:scan_pos]
    hist_leg = between[between.rfind("+- Sort"):] if "+- Sort" in between \
        else between
    assert "Exchange" not in hist_leg, plan
    # and the decisions through the full operator are real
    dec = incremental_minhash_dedup(batch, "doc_id", "text", idx,
                                    num_hashes=32, bands=8, num_parts=4,
                                    update_index=False)
    assert all(r.dup_of_history == 1 for r in dec.collect())


def test_bucketed_bands_decisions_equal_plain(spark, docs, tmp_path):
    """Bucketing (and the band_hash-only probe key) is a LAYOUT change:
    keep decisions across build + two probe batches must be identical
    to the plain-parquet index."""
    variants = (docs.filter(F.col("doc_id") % 6 == 0)
                .select((F.col("doc_id") + 10_000).alias("doc_id"),
                        F.concat("text", F.lit(" tail")).alias("text")))
    kw = dict(num_hashes=32, bands=8, threshold=0.8, seed=7, num_parts=4)
    results = {}
    for tag, bucket in (("plain", None), ("bucketed", 8)):
        idx = str(tmp_path / tag)
        build_minhash_index(docs, "doc_id", "text", idx, num_hashes=32,
                            bands=8, seed=7, num_parts=4,
                            bucket_bands=bucket)
        got = {}
        for b in (variants, variants.select(
                (F.col("doc_id") + 5_000).alias("doc_id"), "text")):
            for r in incremental_minhash_dedup(b, "doc_id", "text", idx,
                                               **kw).collect():
                got[r.doc_id] = (r.dup_of_history, r.keep)
        results[tag] = got
    assert results["plain"] == results["bucketed"]
    assert any(v == (1, 0) for v in results["plain"].values())


def test_bucketed_bands_reregisters_in_fresh_catalog(spark, docs,
                                                     tmp_path):
    """A new session's catalog is empty — the bucket spec marker must
    re-register the external CLUSTERED BY table over the existing
    files (bucket ids live in the file names), keeping later probes
    shuffle-free and appends bucket-consistent."""
    from light_etl_windows_container_poc_spark.operators.incremental import (
        _read_bands, _state_table_name)

    idx = str(tmp_path / "ridx")
    build_minhash_index(docs, "doc_id", "text", idx, num_hashes=32,
                        bands=8, num_parts=4, bucket_bands=8)
    bands_path = os.path.join(idx, "bands")
    name = _state_table_name(bands_path)
    spark.sql(f"DROP TABLE IF EXISTS {name}")  # simulate a fresh session
    hist = _read_bands(spark, bands_path)
    assert spark.catalog.tableExists(name)
    n0 = hist.count()
    # append through the re-registered table, then read back everything
    batch = (docs.limit(7).select((F.col("doc_id") + 30_000)
                                  .alias("doc_id"), "text"))
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    incremental_minhash_dedup(batch, "doc_id", "text", idx,
                              num_hashes=32, bands=8, num_parts=4)
    got = _read_bands(spark, bands_path).count()
    assert got == n0  # all 7 were history dups → nothing appended


def test_bucketed_exact_probe_and_decision_parity(spark, docs, tmp_path):
    """exact/ bucketed by content_hash: the probe join key IS the
    bucket key, so the history scan reads Bucketed: true with no
    Exchange under the sort-merge path — and decisions are identical
    to the plain-parquet index."""
    from light_etl_windows_container_poc_spark.operators.incremental import (
        _EXACT_DDL_COLS, _exact_hashes, _read_state)

    results = {}
    for tag, buckets in (("plain", None), ("bucketed", 8)):
        idx = str(tmp_path / f"ex_{tag}")
        build_exact_index(docs, "doc_id", "text", idx,
                          bucket_hashes=buckets)
        copies = (docs.filter(F.col("doc_id") % 5 == 0)
                  .select((F.col("doc_id") + 10_000).alias("doc_id"),
                          "text"))
        dec = incremental_exact_dedup(copies, "doc_id", "text", idx)
        results[tag] = {r.doc_id: (r.dup_of_history, r.keep)
                        for r in dec.collect()}
    assert results["plain"] == results["bucketed"]
    assert results["plain"] and all(
        v == (1, 0) for v in results["plain"].values())
    # plan shape: forced-SMJ probe against the bucketed history
    ex_path = os.path.join(str(tmp_path / "ex_bucketed"), "exact")
    hist = _read_state(spark, ex_path, _EXACT_DDL_COLS)
    probe = _exact_hashes(docs.limit(30), "doc_id", "text").join(
        hist.select("content_hash", "keep_id"), "content_hash")
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan = probe._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
    assert "Bucketed: true" in plan, plan
    scan_pos = plan.index("letl_state_")
    between = plan[max(plan.rfind("SortMergeJoin", 0, scan_pos),
                       plan.rfind("ShuffledHashJoin", 0, scan_pos)):scan_pos]
    hist_leg = between[between.rfind("+- Sort"):] if "+- Sort" in between \
        else between
    assert "Exchange" not in hist_leg, plan
