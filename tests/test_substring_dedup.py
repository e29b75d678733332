"""Exact variable-length substring dedup (operators/substring_dedup.py):
planted duplicates with known span boundaries, same-doc repetition,
power-of-two window lengths, strip semantics, and a brute-force
cross-check on a small high-collision corpus."""

from __future__ import annotations

import random

import pytest

from light_etl_windows_container_poc_spark.operators.substring_dedup import (
    duplicated_spans,
    duplicated_window_starts,
    strip_duplicated_substrings,
)

SCHEMA = "doc_id long, text string"


def _mk(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _toks(prefix, n):
    return [f"{prefix}{i}" for i in range(n)]


def test_planted_shared_run_yields_exact_spans(spark):
    shared = _toks("s", 25)
    pad_a, pad_b = _toks("a", 7), _toks("b", 11)
    tail_a, tail_b = _toks("x", 4), _toks("y", 9)
    docs = _mk(spark, [
        (1, " ".join(pad_a + shared + tail_a)),
        (2, " ".join(pad_b + shared + tail_b)),
    ])
    got = {(r.id, r.span_start, r.span_end)
           for r in duplicated_spans(docs, 20).collect()}
    assert got == {(1, 7, 7 + 25), (2, 11, 11 + 25)}


def test_run_shorter_than_n_is_ignored(spark):
    shared = _toks("s", 19)
    docs = _mk(spark, [
        (1, " ".join(_toks("a", 5) + shared + _toks("x", 5))),
        (2, " ".join(_toks("b", 5) + shared + _toks("y", 5))),
    ])
    assert duplicated_spans(docs, 20).count() == 0


def test_same_document_repetition_counts(spark):
    """Lee et al. semantics: a span duplicated WITHIN one document is
    duplicated — both copies are covered."""
    rep = _toks("r", 22)
    docs = _mk(spark, [
        (1, " ".join(rep + _toks("m", 6) + rep)),
    ])
    got = {(r.id, r.span_start, r.span_end)
           for r in duplicated_spans(docs, 20).collect()}
    assert got == {(1, 0, 22), (1, 28, 50)}


def test_overlapping_windows_merge_to_one_island(spark):
    shared = _toks("s", 40)
    docs = _mk(spark, [
        (1, " ".join(_toks("a", 3) + shared)),
        (2, " ".join(shared + _toks("y", 2))),
    ])
    got = {(r.id, r.span_start, r.span_end)
           for r in duplicated_spans(docs, 20).collect()}
    # spans sit at doc end (doc 1) and doc start (doc 2): boundary legs
    assert got == {(1, 3, 43), (2, 0, 40)}


@pytest.mark.parametrize("n", [16, 20])
def test_power_of_two_and_general_n_agree_with_bruteforce(spark, n):
    """d == 0 (n = 2^k, single-class key) and d > 0 (overlapped pair
    key) both match a per-window brute force."""
    rng = random.Random(42)
    vocab = [f"w{i}" for i in range(8)]  # tiny vocab -> real collisions
    rows = [(i, " ".join(rng.choice(vocab) for _ in range(60)))
            for i in range(10)]
    docs = _mk(spark, rows)

    from collections import Counter
    occ = Counter()
    for _, text in rows:
        t = text.split()
        for p in range(len(t) - n + 1):
            occ[tuple(t[p:p + n])] += 1
    want = set()
    for doc_id, text in rows:
        t = text.split()
        for p in range(len(t) - n + 1):
            if occ[tuple(t[p:p + n])] >= 2:
                want.add((doc_id, p))
    got = {(r.id, r.pos)
           for r in duplicated_window_starts(docs, n).collect()}
    assert got == want


def test_strip_removes_exactly_the_spans(spark):
    shared = _toks("s", 25)
    pad = _toks("a", 7)
    tail = _toks("x", 4)
    docs = _mk(spark, [
        (1, " ".join(pad + shared + tail)),
        (2, " ".join(shared)),              # fully covered -> ''
        (3, " ".join(_toks("z", 30))),       # untouched
        (4, "  " + "   ".join(shared) + " "),  # odd whitespace, covered
    ])
    got = {r.id: (r.n_tokens, r.n_kept, r.kept_text)
           for r in strip_duplicated_substrings(docs, 20).collect()}
    assert got[1] == (36, 11, " ".join(pad + tail))
    assert got[2] == (25, 0, "")
    assert got[3] == (30, 30, " ".join(_toks("z", 30)))
    assert got[4] == (25, 0, "")


def test_contamination_marks_only_corpus_ref_overlap(spark):
    """Cross-corpus semantics: a corpus span appearing in ref is
    stripped; a span duplicated ONLY corpus-corpus is kept (that's
    dedup's job, not decontamination's); ref-internal duplication is
    irrelevant."""
    from light_etl_windows_container_poc_spark.operators.substring_dedup import (
        contaminated_spans,
        strip_contaminated_substrings,
    )

    bench = _toks("q", 25)        # the "eval set" span
    cc = _toks("c", 25)           # corpus-corpus duplicate, not in ref
    corpus = _mk(spark, [
        (1, " ".join(_toks("a", 5) + bench + _toks("x", 3))),
        (2, " ".join(cc + _toks("y", 4))),
        (3, " ".join(_toks("b", 6) + cc)),
        (4, " ".join(_toks("z", 30))),
    ])
    ref = _mk(spark, [
        (7, " ".join(_toks("r", 4) + bench + bench)),  # ref-internal dup
    ])
    got = {(r.id, r.span_start, r.span_end)
           for r in contaminated_spans(corpus, ref, 20).collect()}
    assert got == {(1, 5, 30)}

    stripped = {r.id: (r.n_tokens, r.n_kept, r.kept_text)
                for r in strip_contaminated_substrings(
                    corpus, ref, 20).collect()}
    assert stripped[1] == (33, 8, " ".join(_toks("a", 5) + _toks("x", 3)))
    assert stripped[2] == (29, 29, " ".join(cc + _toks("y", 4)))
    assert stripped[3] == (31, 31, " ".join(_toks("b", 6) + cc))
    assert stripped[4] == (30, 30, " ".join(_toks("z", 30)))


def test_contamination_sub_threshold_ignored(spark):
    from light_etl_windows_container_poc_spark.operators.substring_dedup import (
        contaminated_window_starts,
    )

    shared = _toks("s", 19)
    corpus = _mk(spark, [(1, " ".join(_toks("a", 3) + shared))])
    ref = _mk(spark, [(9, " ".join(shared + _toks("r", 3)))])
    assert contaminated_window_starts(corpus, ref, 20).count() == 0


def test_contamination_string_and_negative_ids(spark):
    """The internal union id is a (src, orig) tag struct, so any id
    type works — an arithmetic id*2/id*2+1 encoding silently null-cast
    string ids (empty result, no error) and mis-filtered negative ids
    (-1 % 2 == -1 in Spark, so ref windows vanished instead of
    matching)."""
    from light_etl_windows_container_poc_spark.operators.substring_dedup import (
        contaminated_window_starts,
        strip_contaminated_substrings,
    )

    bench = _toks("q", 20)
    corpus_s = spark.createDataFrame(
        [("doc-A", " ".join(_toks("a", 4) + bench))],
        "doc_id string, text string")
    ref_s = spark.createDataFrame(
        [("eval-1", " ".join(bench))], "doc_id string, text string")
    hits = contaminated_window_starts(corpus_s, ref_s, 20).collect()
    assert {(r.id, r.pos) for r in hits} == {("doc-A", 4)}
    stripped = strip_contaminated_substrings(corpus_s, ref_s, 20).collect()
    assert {(r.id, r.n_tokens, r.n_kept) for r in stripped} == \
        {("doc-A", 24, 4)}

    corpus_n = _mk(spark, [(-5, " ".join(_toks("c", 2) + bench))])
    ref_n = _mk(spark, [(-9, " ".join(bench))])
    hits_n = contaminated_window_starts(corpus_n, ref_n, 20).collect()
    assert {(r.id, r.pos) for r in hits_n} == {(-5, 2)}


def test_strip_null_text_doc_is_zero_token_identity(spark):
    """A NULL-text doc behaves exactly like an empty doc: n_tokens 0,
    n_kept 0, kept_text '' (size(words(null)) is engine-dependent, so
    the strip coalesces to '' first — matching the DuckDB oracles)."""
    docs = _mk(spark, [(1, None), (2, ""), (3, "one two three")])
    got = {r.id: (r.n_tokens, r.n_kept, r.kept_text)
           for r in strip_duplicated_substrings(docs, 20).collect()}
    assert got[1] == (0, 0, "")
    assert got[2] == (0, 0, "")
    assert got[3] == (3, 3, "one two three")
