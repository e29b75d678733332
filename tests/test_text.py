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
