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
