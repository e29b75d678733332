"""Corpus-curation breadth ops: domain cap, block strip, bigram LM,
int8 quantization, kNN graph (queries/breadth12.py)."""

from collections import Counter

from pyspark.sql import functions as F

from light_etl_windows_container_poc_spark.catalog import load_tables
from light_etl_windows_container_poc_spark.operators.similarity import (
    ann_bruteforce_topk, knn_graph_topk)
from light_etl_windows_container_poc_spark.queries.breadth12 import (
    _CAP, boilerplate_strip, domain_cap, embed_quantize, knn_graph,
    text_bigram_lm)


def test_knn_graph_matches_bruteforce(spark, sf_dir):
    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    graph = {(r.q_id, r.rank): (r.n_id, r.sim) for r in
             knn_graph_topk(emb, "vec_id", "embedding",
                            k=3, n_blocks=4).collect()}
    truth = {(r.q_id, r.rank): (r.n_id, r.sim) for r in
             ann_bruteforce_topk(emb, emb, "vec_id", "embedding",
                                 k=3).collect()}
    assert graph == truth  # exact fold re-score → identical ranking


def test_knn_graph_covers_every_row(spark, sf_dir):
    rows = knn_graph(spark, sf_dir).collect()
    n = load_tables(spark, sf_dir, ("embeddings",))["embeddings"].count()
    per_q = Counter(r.q_id for r in rows)
    assert len(per_q) == n and set(per_q.values()) == {3}
    assert all(r.q_id != r.n_id for r in rows)


def test_domain_cap_caps_each_source(spark, sf_dir):
    rows = domain_cap(spark, sf_dir).collect()
    per_src = Counter(r.source for r in rows)
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    src_sizes = {r.source: r.n for r in
                 docs.groupBy("source").agg(F.count("*").alias("n")).collect()}
    for src, kept in per_src.items():
        assert kept == min(_CAP, src_sizes[src])
    # ranks are a permutation of 1..kept within each source
    ranks: dict[str, list[int]] = {}
    for r in rows:
        ranks.setdefault(r.source, []).append(r.rk)
    for src, rks in ranks.items():
        assert sorted(rks) == list(range(1, per_src[src] + 1))


def test_boilerplate_strip_conserves_blocks(spark, sf_dir):
    out = {r.doc_id: r for r in boilerplate_strip(spark, sf_dir).collect()}
    docs = load_tables(spark, sf_dir, ("documents",))["documents"].collect()
    dropped_total = 0
    for d in docs:
        r = out[d.doc_id]
        toks = d.text.split()
        assert r.n_blocks == (len(toks) + 2) // 3
        assert 0 <= r.n_kept <= r.n_blocks
        dropped_total += r.n_blocks - r.n_kept
        if r.n_kept == r.n_blocks:  # nothing stripped → normalized original
            assert r.kept_text == " ".join(toks)
        else:  # kept text is a subsequence of the original blocks
            blocks = [" ".join(toks[i * 3:i * 3 + 3])
                      for i in range((len(toks) + 2) // 3)]
            kept_blocks, pos = [], 0
            assert r.kept_text != " ".join(toks)
            for b in blocks:
                if r.kept_text.find(b, pos) != -1:
                    kept_blocks.append(b)
    assert dropped_total > 0  # the op actually fires on the corpus


def test_bigram_lm_bounds(spark, sf_dir):
    rows = text_bigram_lm(spark, sf_dir).collect()
    docs = {r.doc_id: r.text for r in
            load_tables(spark, sf_dir, ("documents",))["documents"].collect()}
    assert {r.doc_id for r in rows} == \
        {i for i, t in docs.items() if len(t.split()) >= 2}
    for r in rows:
        assert r.n_bigrams == len(docs[r.doc_id].split()) - 1
        # P(w2|w1) ≤ 1 always (bigram count ≤ first-token count)
        assert 0 <= r.avg_prob_micro <= 1_000_000
        assert r.sum_prob_micro >= r.avg_prob_micro * r.n_bigrams


def test_embed_quantize_reconstruction(spark, sf_dir):
    emb = {r.vec_id: [float(x) for x in r.embedding] for r in
           load_tables(spark, sf_dir, ("embeddings",))["embeddings"].collect()}
    rows = embed_quantize(spark, sf_dir).collect()
    assert {r.vec_id for r in rows} == set(emb)
    for r in rows:
        v = emb[r.vec_id]
        maxabs = max(abs(x) for x in v)
        scale = maxabs / 127.0
        q = [int((x / scale + 0.5) // 1) for x in v]
        assert all(-127 <= x <= 127 for x in q)
        assert r.q_l2sq == sum(x * x for x in q)
        assert r.nnz == sum(1 for x in q if x != 0)
        # reconstruction error bounded by half a quantization step
        assert all(abs(x - qi * scale) <= scale / 2 + 1e-12
                   for x, qi in zip(v, q))
