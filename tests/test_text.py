from __future__ import annotations

from pyspark.sql import functions as F

from light_etl_windows_container_poc_spark.functions.texts import word_shingles
from light_etl_windows_container_poc_spark.operators.text import (
    fingerprint, language_id, quality_metrics)


def test_word_shingles_basic_and_short(spark):
    df = spark.createDataFrame([("a b c d",), ("a b",), ("",)], "t string")
    got = df.select(word_shingles(F.col("t"), 3).alias("s")).collect()
    assert got[0].s == ["a b c", "b c d"]
    assert got[1].s == []
    assert got[2].s == []


def test_language_id_stopword_overlap(spark):
    df = spark.createDataFrame(
        [(1, "the cat is in the house and it is warm"),
         (2, "der hund ist von dem haus und das ist"),
         (3, "xyzzy qwerty asdf")],
        "id long, text string")
    got = {r.id: r.lang_pred for r in language_id(df, "text").collect()}
    assert got[1] == "en"
    assert got[2] == "de"
    assert got[3] == "und"


def test_quality_metrics_values(spark):
    df = spark.createDataFrame([(1, "ab 12 cd")], "id long, text string")
    r = quality_metrics(df, "text").collect()[0]
    assert r.n_chars_q == 8 and r.n_words == 3
    assert r.alpha_milli == 500   # 4 alpha chars / 8
    assert r.digit_milli == 250   # 2 digits / 8
    assert r.space_milli == 250
    assert r.word_len_centi == 200  # avg word len 2.0


def test_fingerprint_stable_and_distinct(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d e"), (3, "v w x y z")],
        "doc_id long, t string")
    rows = {r.doc_id: (r.content_md5, r.min_shingle_md5)
            for r in fingerprint(df, "t", "doc_id").collect()}
    assert rows[1] == rows[2]
    assert rows[1] != rows[3]
    assert len(rows[1][0]) == 32


def test_mask_pii(spark):
    from light_etl_windows_container_poc_spark.operators.text import mask_pii

    df = spark.createDataFrame(
        [(1, "mail me at a.b+c@x-corp.io or call +1 (555) 123-4567 ok")],
        "id long, t string")
    out = mask_pii(df, "t").collect()[0].text_masked
    assert "<EMAIL>" in out and "<PHONE>" in out
    assert "@" not in out and "555" not in out


def test_train_test_split_deterministic_and_proportional(spark, sf_dir):
    from light_etl_windows_container_poc_spark.catalog import load_tables
    from light_etl_windows_container_poc_spark.operators.text import \
        train_test_split

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    a = {r.doc_id: r.split for r in
         train_test_split(docs, "doc_id").select("doc_id", "split").collect()}
    b = {r.doc_id: r.split for r in
         train_test_split(docs, "doc_id").select("doc_id", "split").collect()}
    assert a == b  # stable across runs
    frac = sum(1 for v in a.values() if v == "test") / len(a)
    assert 0.1 < frac < 0.3  # ~20% ± sampling noise on 500 ids


def test_repetition_metrics_edges(spark):
    from light_etl_windows_container_poc_spark.operators.text import \
        repetition_metrics

    df = spark.createDataFrame(
        [(1, "a a a a"),            # one word repeated: top share 1000
         (2, "x"),                  # single word: no bigrams -> dup2 = 0
         (3, ""),                   # empty: no tokens -> dropped
         (4, "a b a b a b")],       # alternating: every bigram duplicated
        "id long, text string")
    out = {r.id: r for r in repetition_metrics(df, "text", "id").collect()}
    assert set(out) == {1, 2, 4}
    assert out[1].distinct_milli == 250 and out[1].topword_milli == 1000
    assert out[1].dup2gram_milli == 666          # 3 bigrams, 1 distinct
    assert out[2].n_words == 1 and out[2].dup2gram_milli == 0
    assert out[4].distinct_milli == 333          # 2 of 6
    assert out[4].dup2gram_milli == 600          # 5 bigrams, 2 distinct


def test_gopher_rules_flags(spark):
    from light_etl_windows_container_poc_spark.operators.text import \
        gopher_quality_rules

    good = "the quick brown fox jumps over the lazy dog and then it " \
           "runs far away for a while in the sun " * 2
    df = spark.createDataFrame(
        [(1, good),                     # passes everything
         (2, "a b"),                    # too short
         (3, "1234 5678 " * 30)],       # numeric: alpha fraction fails
        "id long, text string")
    out = {r.id: r for r in
           gopher_quality_rules(df, "text", "id").collect()}
    assert out[1].keep
    assert not out[2].pass_word_count and not out[2].keep
    assert not out[3].pass_alpha and not out[3].keep


# --------------------------------------------------------------------------
# Trigram Kneser-Ney backoff identities (queries/breadth28.py)
# --------------------------------------------------------------------------

def _kn_counts(texts):
    """Reference counts with the exact conventions the operator
    documents: everything derives from the trigram token stream."""
    from collections import Counter

    tris = []
    for t in texts:
        w = t.split()
        tris += [(w[i], w[i + 1], w[i + 2]) for i in range(len(w) - 2)]
    ty = set(tris)
    return {
        "c_tri": Counter(tris),
        "c_ctx": Counter((a, b) for a, b, _ in tris),
        "fan_hi": Counter((a, b) for a, b, _ in ty),
        "mid_num": Counter((b, c) for _, b, c in ty),
        "mid_den": Counter(b for _, b, _ in ty),
        "fan_mid": Counter(),  # filled below
        "cont_num": Counter(c for _, c in {(b, c) for _, b, c in ty}),
        "bity": {(b, c) for _, b, c in ty},
        "ty": ty, "tris": tris,
    }


def test_trigram_kn_distributions_sum_to_one_exactly():
    """With every count derived from the trigram stream, interpolated
    KN sums to EXACTLY 1 over the continuation vocabulary at both
    backoff levels — verified in rational arithmetic (the identity the
    integer micro-unit formula discretizes)."""
    from fractions import Fraction as Fr

    texts = ["a b c a b d a b c", "b c a b c d", "c a b a b c",
             "d d d a b c d"]
    K = _kn_counts(texts)
    for b, c in K["bity"]:
        K["fan_mid"][b] += 1
    D = Fr(3, 4)
    cont_den = len(K["bity"])
    vocab = set(K["cont_num"])

    def p_cont(w3):
        return Fr(K["cont_num"][w3], cont_den)

    def p_mid(w2, w3):
        md = K["mid_den"][w2]
        lam2 = D * K["fan_mid"][w2] / md
        base = (Fr(K["mid_num"][(w2, w3)]) - D) / md \
            if (w2, w3) in K["bity"] else Fr(0)
        return base + lam2 * p_cont(w3)

    def p_hi(w1, w2, w3):
        cc = K["c_ctx"][(w1, w2)]
        lam = D * K["fan_hi"][(w1, w2)] / cc
        base = (Fr(K["c_tri"][(w1, w2, w3)]) - D) / cc \
            if (w1, w2, w3) in K["ty"] else Fr(0)
        return base + lam * p_mid(w2, w3)

    assert sum(p_cont(w) for w in vocab) == 1
    for w2 in K["mid_den"]:
        assert sum(p_mid(w2, w) for w in vocab) == 1, w2
    for (w1, w2) in K["c_ctx"]:
        assert sum(p_hi(w1, w2, w) for w in vocab) == 1, (w1, w2)


def test_trigram_kn_query_matches_integer_reference(spark):
    """The Spark plan's per-doc sums equal a pure-Python replay of the
    SAME integer micro-unit formula over the same counts — truncating
    div, 1e6 scale, trigram-stream conventions."""
    from light_etl_windows_container_poc_spark.queries.breadth28 import \
        trigram_kn_scores

    texts = ["a b c a b d a b c", "b c a b c d", "c a b a b c",
             "d d d a b c d", "a b"]  # last doc: no trigrams → no row
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    got = {r.doc_id: (r.n_trigrams, r.sum_kn_micro, r.avg_kn_micro)
           for r in trigram_kn_scores(docs).collect()}

    K = _kn_counts(texts)
    for b, c in K["bity"]:
        K["fan_mid"][b] += 1
    cont_den = len(K["bity"])
    want = {}
    for i, t in enumerate(texts):
        w = t.split()
        tot, n = 0, 0
        for j in range(len(w) - 2):
            w1, w2, w3 = w[j], w[j + 1], w[j + 2]
            cc = K["c_ctx"][(w1, w2)]
            md = K["mid_den"][w2]
            p_cont = (1_000_000 * K["cont_num"][w3]) // cont_den
            p_mid = ((1_000_000 * K["mid_num"][(w2, w3)] - 750_000) // md
                     + ((750_000 * K["fan_mid"][w2]) // md) * p_cont
                     // 1_000_000)
            kn = ((1_000_000 * K["c_tri"][(w1, w2, w3)] - 750_000) // cc
                  + ((750_000 * K["fan_hi"][(w1, w2)]) // cc) * p_mid
                  // 1_000_000)
            tot += kn
            n += 1
        if n:
            want[i] = (n, tot, tot // n)
    assert got == want


def test_dedup_paragraph_drops_later_instances_and_reassembles(spark):
    """A paragraph (10-word chunk) shared across docs survives only at
    its first (doc_id, position) occurrence; reassembly stitches the
    kept chunks back in order."""
    para_a = "p q r s t u v w x y"          # shared chunk
    tail_b = "one two three"
    docs = spark.createDataFrame(
        [(1, para_a + " a b c d e f g h i j"),
         (2, para_a + " " + tail_b),         # loses para_a, keeps tail
         (3, "a b c d e f g h i j " + para_a)],  # chunk0 dups doc1's 2nd
        "doc_id long, text string")
    from light_etl_windows_container_poc_spark.queries.breadth28 import \
        dedup_paragraph

    import types
    # drive the registered query body over the synthetic docs by
    # rebinding its loader — simpler: replicate via a temp view is
    # overkill; call the pipeline pieces through a tiny sf_dir shim
    got = {}
    import light_etl_windows_container_poc_spark.queries.breadth28 as b28
    orig = b28.load_tables
    try:
        b28.load_tables = lambda _s, _d, _t: {"documents": docs}
        for r in dedup_paragraph(spark, "unused").collect():
            got[r.doc_id] = (r.n_paras, r.n_kept, r.clean_text)
    finally:
        b28.load_tables = orig
    assert got[1] == (2, 2, para_a + " a b c d e f g h i j")
    assert got[2] == (2, 1, tail_b)   # shared chunk gone
    # BOTH of doc 3's chunks duplicate doc 1's (in either order) — the
    # whole doc dissolves, the fully-empty reassembly case
    assert got[3] == (2, 0, "")
