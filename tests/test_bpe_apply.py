"""Arrow-batched BPE application (`operators/bpe.py`): path invariance
against the codegen chain, prefilter soundness, and auto routing."""

from __future__ import annotations

import random
import string

from pyspark.sql import functions as F

from light_etl_windows_container_poc_spark.catalog import load_tables
from light_etl_windows_container_poc_spark.functions.texts import words
from light_etl_windows_container_poc_spark.operators.bpe import (
    bpe_apply,
    merge_index,
    tokenize_word,
)
from light_etl_windows_container_poc_spark.plans import formatted_plan
from light_etl_windows_container_poc_spark.queries.breadth27 import BPE_MERGES


def _words_df(spark, sf_dir, limit=400):
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return (docs.select(
        F.explode(words(F.lower(F.col("text")))).alias("word"))
        .filter(F.col("word").rlike("^[a-z]+$"))
        .distinct().orderBy("word").limit(limit))


def _large_table(n=220, seed=11):
    """BPE_MERGES extended with generated lowercase merges — enough to
    cross the chain_limit and to collide surface forms."""
    rng = random.Random(seed)
    extra = []
    seen = set(BPE_MERGES)
    syms = [a + b for a, b in BPE_MERGES] + list(string.ascii_lowercase)
    while len(extra) < n - len(BPE_MERGES):
        m = (rng.choice(syms), rng.choice(syms))
        if m not in seen:
            seen.add(m)
            extra.append(m)
    return BPE_MERGES + extra


def test_kernel_equals_chain_on_certified_table(spark, sf_dir):
    w = _words_df(spark, sf_dir)
    chain = bpe_apply(w, "word", BPE_MERGES, mode="chain")
    kernel = bpe_apply(w, "word", BPE_MERGES, mode="kernel")
    assert sorted(map(tuple, chain.collect())) == \
        sorted(map(tuple, kernel.collect()))


def test_kernel_equals_chain_on_large_table(spark, sf_dir):
    """The scale case: a 220-merge table (above chain_limit) — the
    kernel must still match the chain symbol-for-symbol, including
    merges whose inputs are products of earlier merges."""
    merges = _large_table()
    w = _words_df(spark, sf_dir, limit=250)
    chain = bpe_apply(w, "word", merges, mode="chain")
    kernel = bpe_apply(w, "word", merges, mode="kernel")
    assert sorted(map(tuple, chain.collect())) == \
        sorted(map(tuple, kernel.collect()))


def test_prefilter_is_sound():
    """The substring prefilter must be a pure no-op skip: tokenizing
    with the index equals tokenizing against the full table, for words
    engineered to hit the continue-after-match edge (ththth) and
    shared surface forms."""
    merges = _large_table()
    idx = merge_index(merges)
    rng = random.Random(3)
    cases = ["ththth", "thethethe", "aaaa", "x", "", "andanding",
             "inginging"]
    cases += ["".join(rng.choice(string.ascii_lowercase[:6])
                      for _ in range(rng.randint(1, 14)))
              for _ in range(300)]
    for w in cases:
        assert tokenize_word(w, merges, idx) == \
            tokenize_word(w, merges, None), w


def test_auto_mode_routes_by_table_size(spark, sf_dir):
    w = _words_df(spark, sf_dir, limit=50)
    small = bpe_apply(w, "word", BPE_MERGES, mode="auto")
    assert "mapInPandas" not in formatted_plan(small)
    big = bpe_apply(w, "word", _large_table(), mode="auto")
    assert "ArrowEvalPython" in formatted_plan(big) or \
        "MapInPandas" in formatted_plan(big)


def test_query_matches_text_bpe_tokenize(spark, sf_dir):
    """bpe_apply_large (kernel) and text_bpe_tokenize (chain) are the
    same computation through different paths — identical output."""
    from light_etl_windows_container_poc_spark.queries.registry import \
        QUERIES

    a = QUERIES["bpe_apply_large"](spark, sf_dir)
    b = QUERIES["text_bpe_tokenize"](spark, sf_dir)
    assert sorted(map(tuple, a.collect())) == \
        sorted(map(tuple, b.collect()))
