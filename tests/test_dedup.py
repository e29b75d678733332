from __future__ import annotations

from pyspark.sql import functions as F

from light_etl_windows_container_poc_spark.catalog import load_tables
from light_etl_windows_container_poc_spark.operators.dedup import (
    exact_dedup, minhash_lsh_pairs, ngram_jaccard_pairs, simhash64,
    simhash_pairs)


def _docs(spark, sf_dir):
    return load_tables(spark, sf_dir, ("documents",))["documents"]


def test_exact_dedup_finds_planted_dups(spark):
    df = spark.createDataFrame(
        [(1, "aa bb cc"), (2, "aa bb cc"), (3, "zz yy xx")], "id long, t string")
    got = {r.keep_id: r.dup_count for r in exact_dedup(df, "t", "id").collect()}
    assert got == {1: 2, 3: 1}


def test_ngram_jaccard_identical_docs_score_one(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "a b c d e f"), (3, "q w e r t y")],
        "id long, t string")
    pairs = ngram_jaccard_pairs(df, "id", "t", n=3, threshold=0.9).collect()
    assert [(p.a_id, p.b_id, p.jaccard) for p in pairs] == [(1, 2, 1.0)]


def test_minhash_lsh_recall_vs_exact_jaccard(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    truth = {(r.a_id, r.b_id) for r in
             ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.8).collect()}
    found = {(r.a_id, r.b_id) for r in
             minhash_lsh_pairs(docs, "doc_id", "text",
                               num_hashes=128, bands=32, threshold=0.7).collect()}
    assert truth, "test corpus should contain planted near-dups"
    recall = len(truth & found) / len(truth)
    assert recall >= 0.9, f"minhash recall {recall} over {len(truth)} true pairs"


def test_simhash_identical_docs_have_equal_fp(spark):
    df = spark.createDataFrame(
        [(1, "spark table join"), (2, "spark table join"), (3, "entirely different words here")],
        "id long, t string")
    fp = {r.doc: r.simhash for r in simhash64(df, "id", "t").collect()}
    assert fp[1] == fp[2]
    pairs = simhash_pairs(df, "id", "t", max_hamming=3).collect()
    assert (1, 2) in {(p.a_id, p.b_id) for p in pairs}


def test_simhash_catches_planted_neardups(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    truth = {(r.a_id, r.b_id) for r in
             ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.9).collect()}
    found = {(r.a_id, r.b_id) for r in
             simhash_pairs(docs, "doc_id", "text", max_hamming=10,
                           allow_partial=True).collect()}
    if truth:  # sf0.001 may not contain >=0.9 pairs
        recall = len(truth & found) / len(truth)
        assert recall >= 0.5, f"simhash recall {recall}"


def test_connected_components_and_keep_representatives(spark):
    from light_etl_windows_container_poc_spark.operators.dedup import (
        connected_components, dedup_keep_representatives)

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6), (9, 1)], "a_id long, b_id long")
    comp = {r.node: r.component for r in connected_components(pairs).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 9: 1, 5: 5, 6: 5}

    docs = spark.createDataFrame([(i, f"d{i}") for i in [1, 2, 3, 5, 6, 9, 42]],
                                 "doc_id long, text string")
    kept = sorted(r.doc_id for r in
                  dedup_keep_representatives(docs, pairs, "doc_id").collect())
    assert kept == [1, 5, 42]  # one per component + untouched doc


def test_hamming_band_pairs_rejects_incomplete_radius(spark):
    """max_hamming > 3 exceeds the 4x16-bit pigeonhole guarantee: the
    guard must refuse rather than silently return incomplete pairs
    (allow_partial=True is the explicit recall-best-effort opt-in)."""
    import pytest as _pytest

    from light_etl_windows_container_poc_spark.operators.dedup import \
        hamming_band_pairs

    fps = spark.createDataFrame([(1, 7), (2, 11)], "doc long, fp long")
    with _pytest.raises(ValueError, match="pigeonhole-complete"):
        hamming_band_pairs(fps, "doc", "fp", max_hamming=4)
    # opt-in path still constructs a plan
    assert hamming_band_pairs(fps, "doc", "fp", max_hamming=4,
                              allow_partial=True).columns == \
        ["a_id", "b_id", "hamming"]
