"""Incremental (cross-run) exact-substring dedup
(operators/incremental_substring.py): fingerprint soundness vs a
brute-force n-gram census, build/append/probe lifecycle, forward-only
batch-vs-history semantics, within-batch duplication, sub-threshold
immunity, and replay idempotence under batch_tag."""

from __future__ import annotations

import random

from light_etl_windows_container_poc_spark.operators.incremental_substring import (
    build_substring_index,
    incremental_substring_dedup,
    window_fingerprints,
)

SCHEMA = "doc_id long, text string"


def _mk(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _toks(prefix, n):
    return [f"{prefix}{i}" for i in range(n)]


def test_fingerprints_match_brute_force_ngrams(spark):
    """fp equality == window-text equality on a high-collision corpus
    (tiny vocabulary forces many genuine repeats), across several n
    including exact powers of two — the lead-chain contiguity argument
    and the final overlapping shift both get exercised."""
    rng = random.Random(13)
    rows = [(i, " ".join(rng.choice("abc") for _ in range(rng.randint(0, 40))))
            for i in range(30)]
    docs = _mk(spark, rows)
    for n in (1, 2, 3, 4, 7, 8, 13, 16, 20):
        got = {(r.id, r.pos): (r.fp_a, r.fp_b)
               for r in window_fingerprints(docs, n).collect()}
        want = {}
        for i, text in rows:
            toks = text.split()
            for p in range(len(toks) - n + 1):
                want[(i, p)] = " ".join(toks[p:p + n])
        assert set(got) == set(want), f"position set diverged at n={n}"
        by_text: dict[str, tuple] = {}
        for k, text in want.items():
            fp = got[k]
            assert by_text.setdefault(text, fp) == fp, \
                f"equal windows got different fps at n={n}"
        assert len({v for v in by_text.values()}) == len(by_text), \
            f"distinct windows collided at n={n}"


def test_history_span_is_stripped_from_batch_only(spark, tmp_path):
    """Forward-only semantics: a batch span copied from ingested history
    is stripped from the BATCH; fresh batch text survives; history is
    never rewritten (the index only grows)."""
    shared = _toks("s", 25)
    hist = _mk(spark, [(1, " ".join(_toks("h", 5) + shared))])
    idx = str(tmp_path / "idx")
    build_substring_index(hist, 20, idx)

    batch = _mk(spark, [
        (10, " ".join(_toks("a", 3) + shared + _toks("z", 4))),
        (11, " ".join(_toks("fresh", 30))),
    ])
    got = {r.id: r for r in
           incremental_substring_dedup(batch, 20, idx).collect()}
    assert got[10].n_tokens == 32 and got[10].n_kept == 7
    assert got[10].kept_text == " ".join(_toks("a", 3) + _toks("z", 4))
    assert got[10].hist_starts == 6 and got[10].batch_starts == 0
    assert got[11].n_kept == 30 and got[11].hist_starts == 0


def test_within_batch_duplicate_spans_stripped(spark, tmp_path):
    """Two batch docs sharing a >= n run (absent from history) both
    strip it — the batch behaves like a one-shot strip over itself."""
    idx = str(tmp_path / "idx")
    shared = _toks("q", 22)
    batch = _mk(spark, [
        (1, " ".join(_toks("a", 4) + shared)),
        (2, " ".join(shared + _toks("b", 6))),
    ])
    got = {r.id: r for r in
           incremental_substring_dedup(batch, 20, idx).collect()}
    assert got[1].n_kept == 4 and got[1].kept_text == " ".join(_toks("a", 4))
    assert got[2].n_kept == 6 and got[2].kept_text == " ".join(_toks("b", 6))
    assert got[1].batch_starts == 3 and got[1].hist_starts == 0


def test_sub_threshold_overlap_untouched(spark, tmp_path):
    shared = _toks("s", 19)  # one token short of n=20
    idx = str(tmp_path / "idx")
    build_substring_index(_mk(spark, [(1, " ".join(shared))]), 20, idx)
    batch = _mk(spark, [(9, " ".join(_toks("x", 2) + shared))])
    (row,) = incremental_substring_dedup(batch, 20, idx).collect()
    assert row.n_kept == row.n_tokens == 21


def test_appended_batch_becomes_history_for_the_next(spark, tmp_path):
    """build → probe batch1 (appends) → probe batch2: batch2's copy of a
    BATCH1 span is stripped, proving the append landed and probes see
    it. A third batch re-sending batch2's fresh text also strips (any
    ingested text is history, stripped or not — as-ingested appends)."""
    idx = str(tmp_path / "idx")
    run_a = _toks("a", 21)
    build_substring_index(_mk(spark, [(1, " ".join(_toks("h", 25)))]),
                          20, idx)
    b1 = _mk(spark, [(10, " ".join(run_a + _toks("t", 3)))])
    (r1,) = incremental_substring_dedup(b1, 20, idx).collect()
    assert r1.n_kept == 24  # nothing duplicated yet

    b2 = _mk(spark, [(20, " ".join(_toks("p", 2) + run_a))])
    (r2,) = incremental_substring_dedup(b2, 20, idx).collect()
    assert r2.n_kept == 2 and r2.kept_text == " ".join(_toks("p", 2))
    assert r2.hist_starts == 2

    b3 = _mk(spark, [(30, " ".join(run_a))])
    (r3,) = incremental_substring_dedup(b3, 20, idx).collect()
    assert r3.n_kept == 0 and r3.kept_text == ""


def test_missing_index_bootstraps_empty_history(spark, tmp_path):
    idx = str(tmp_path / "never_built")
    batch = _mk(spark, [(1, " ".join(_toks("a", 30)))])
    (row,) = incremental_substring_dedup(batch, 20, idx).collect()
    assert row.n_kept == 30  # nothing to hit
    # and the bootstrap append created the state for the next batch
    (row2,) = incremental_substring_dedup(
        _mk(spark, [(2, " ".join(_toks("a", 30)))]), 20, idx).collect()
    assert row2.n_kept == 0 and row2.hist_starts == 11


def test_replay_same_batch_tag_is_idempotent(spark, tmp_path):
    """A crashed micro-batch's retry must reproduce identical decisions:
    the first attempt's own appends carry the tag and are excluded from
    its replay's probe."""
    idx = str(tmp_path / "idx")
    build_substring_index(_mk(spark, [(1, " ".join(_toks("h", 25)))]),
                          20, idx)
    batch = _mk(spark, [(10, " ".join(_toks("new", 26)))])
    first = sorted(
        incremental_substring_dedup(batch, 20, idx, batch_tag=7).collect())
    replay = sorted(
        incremental_substring_dedup(batch, 20, idx, batch_tag=7).collect())
    assert first == replay
    assert first[0].n_kept == 26  # NOT self-deduplicated by the retry
    # a LATER tag does see the ingested text
    (later,) = incremental_substring_dedup(
        _mk(spark, [(11, " ".join(_toks("new", 26)))]),
        20, idx, batch_tag=8).collect()
    assert later.n_kept == 0


def test_sequential_batches_match_decontaminate_reference(spark, tmp_path):
    """Batch-vs-history equals the batch tier's cross-corpus operator:
    probing batch B against history H (no within-batch dups in B)
    strips exactly what strip_contaminated_substrings(B, H) strips."""
    from light_etl_windows_container_poc_spark.operators.substring_dedup import (
        strip_contaminated_substrings,
    )

    rng = random.Random(99)
    hist_rows = [(i, " ".join(rng.choice("uvw") for _ in range(30)))
                 for i in range(8)]
    # batch docs embed random history windows at random offsets
    batch_rows = []
    for j in range(6):
        src = hist_rows[rng.randrange(len(hist_rows))][1].split()
        start = rng.randrange(0, len(src) - 21)
        span = src[start:start + 21]
        batch_rows.append(
            (100 + j, " ".join(_toks(f"x{j}_", rng.randint(0, 6)) + span
                               + _toks(f"y{j}_", rng.randint(0, 6)))))
    hist, batch = _mk(spark, hist_rows), _mk(spark, batch_rows)
    idx = str(tmp_path / "idx")
    build_substring_index(hist, 20, idx)
    got = {r.id: (r.n_tokens, r.n_kept, r.kept_text) for r in
           incremental_substring_dedup(batch, 20, idx,
                                       update_index=False).collect()}
    want = {r.id: (r.n_tokens, r.n_kept, r.kept_text) for r in
            strip_contaminated_substrings(batch, hist, 20).collect()}
    assert got == want


def test_fingerprint_chain_is_one_exchange(spark):
    """The whole Merkle chain must plan as ONE per-doc Exchange + Sort
    feeding chained WindowExecs (log2(n) doublings + the overlap shift
    — 5 at n=20): every level shares the same (id, pos) partitioning
    and ordering, so no level may re-shuffle or re-sort. This is the
    100 TB shape — cost = one shuffle of the token stream."""
    import re

    docs = _mk(spark, [(1, " ".join(_toks("t", 40)))])
    plan = window_fingerprints(docs, 20)._jdf.queryExecution() \
        .executedPlan().toString()
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan
    assert len(re.findall(r"\bSort ", plan)) == 1, plan
    assert len(re.findall(r"\bWindow ", plan)) == 5, plan


def test_bucketed_windows_decisions_equal_plain(spark, tmp_path):
    """bucket_fps persists windows/ hash-bucketed by fp_a; probe
    decisions must be bit-identical to the plain layout and the probe
    must read the history side Bucketed: true."""
    shared = _toks("s", 25)
    hist = _mk(spark, [(1, " ".join(_toks("h", 5) + shared))])
    batch = _mk(spark, [(10, " ".join(_toks("a", 3) + shared))])

    plain_idx, buck_idx = str(tmp_path / "plain"), str(tmp_path / "buck")
    build_substring_index(hist, 20, plain_idx)
    build_substring_index(hist, 20, buck_idx, bucket_fps=4)
    import os
    assert os.path.exists(os.path.join(buck_idx, "windows",
                                       "_bucket_spec.json"))
    plain = sorted(incremental_substring_dedup(
        batch, 20, plain_idx, update_index=False).collect())
    probe = incremental_substring_dedup(batch, 20, buck_idx,
                                        update_index=False)
    assert sorted(probe.collect()) == plain
    assert "Bucketed: true" in probe._jdf.queryExecution() \
        .executedPlan().toString()


def test_takedown_unmarks_only_the_tombstoned_docs_spans(spark, tmp_path):
    """Tombstoning a history doc: its spans stop marking future batches;
    a span SHARED with a live history doc keeps marking (per-doc rows
    in windows/ make this the free semantics). Vacuum then physically
    reclaims the rows without changing any probe decision."""
    import os

    from light_etl_windows_container_poc_spark.operators.incremental_substring import (
        tombstone_substring_docs,
        vacuum_substring_tombstones,
    )

    gone = _toks("g", 22)    # only in the doc being taken down
    shared = _toks("s", 22)  # in the taken-down doc AND a live doc
    hist = _mk(spark, [
        (1, " ".join(gone + shared)),
        (2, " ".join(_toks("l", 4) + shared)),
    ])
    idx = str(tmp_path / "idx")
    build_substring_index(hist, 20, idx)

    batch = _mk(spark, [(10, " ".join(gone + _toks("x", 2) + shared))])
    (before,) = incremental_substring_dedup(
        batch, 20, idx, update_index=False).collect()
    assert before.n_kept == 2  # both spans stripped pre-takedown

    n = tombstone_substring_docs(
        spark.createDataFrame([(1,)], "doc_id long"), "doc_id", idx)
    assert n == 1
    (after,) = incremental_substring_dedup(
        batch, 20, idx, update_index=False).collect()
    # `gone` is new content now; `shared` still marks via live doc 2
    assert after.n_kept == 24
    assert after.kept_text == " ".join(gone + _toks("x", 2))

    vacuum_substring_tombstones(spark, idx)
    assert not os.path.isdir(os.path.join(idx, "windows_tombstones"))
    (post,) = incremental_substring_dedup(
        batch, 20, idx, update_index=False).collect()
    assert (post.n_kept, post.kept_text) == (after.n_kept, after.kept_text)
    # and no doc-1 rows survive in the state
    state = spark.read.parquet(os.path.join(idx, "windows"))
    assert state.filter("doc = 1").count() == 0


def test_vacuum_preserves_bucketed_layout(spark, tmp_path):
    import os

    from light_etl_windows_container_poc_spark.operators.incremental_substring import (
        tombstone_substring_docs,
        vacuum_substring_tombstones,
    )

    hist = _mk(spark, [(1, " ".join(_toks("a", 25))),
                       (2, " ".join(_toks("b", 25)))])
    idx = str(tmp_path / "idx")
    build_substring_index(hist, 20, idx, bucket_fps=4)
    tombstone_substring_docs(
        spark.createDataFrame([(2,)], "doc_id long"), "doc_id", idx)
    vacuum_substring_tombstones(spark, idx)
    spec = os.path.join(idx, "windows", "_bucket_spec.json")
    assert os.path.exists(spec)
    batch = _mk(spark, [(10, " ".join(_toks("a", 21)))])
    probe = incremental_substring_dedup(batch, 20, idx,
                                        update_index=False)
    assert "Bucketed: true" in probe._jdf.queryExecution() \
        .executedPlan().toString()
    (row,) = probe.collect()
    assert row.n_kept == 0  # doc 1's span still history post-vacuum


def test_takedown_rejects_noncastable_ids(spark, tmp_path):
    """r13 ADVICE (medium): a string id that null-casts to BIGINT used
    to make the takedown a silent no-op (the anti-join matched nothing
    while the call reported success). It must raise instead."""
    import pytest

    from light_etl_windows_container_poc_spark.operators.incremental_substring import (
        tombstone_substring_docs,
    )

    hist = _mk(spark, [(1, " ".join(_toks("a", 22)))])
    idx = str(tmp_path / "idx")
    build_substring_index(hist, 20, idx)
    bad = spark.createDataFrame([("doc-1",)], "doc_id string")
    with pytest.raises(ValueError, match="castable to BIGINT"):
        tombstone_substring_docs(bad, "doc_id", idx)
    # numeric strings DO cast — the takedown goes through
    ok = spark.createDataFrame([("1",)], "doc_id string")
    assert tombstone_substring_docs(ok, "doc_id", idx) == 1


def test_probe_rejects_mismatched_window_length(spark, tmp_path):
    """r13 ADVICE: n is persisted at build and asserted at probe —
    fingerprints from different n never match, so a mismatched probe
    would silently report 'nothing duplicated' instead of erroring."""
    import pytest

    hist = _mk(spark, [(1, " ".join(_toks("a", 30)))])
    idx = str(tmp_path / "idx")
    build_substring_index(hist, 20, idx)
    batch = _mk(spark, [(10, " ".join(_toks("a", 24)))])
    with pytest.raises(ValueError, match="built with n=20"):
        incremental_substring_dedup(batch, 24, idx, update_index=False)
    (row,) = incremental_substring_dedup(
        batch, 20, idx, update_index=False).collect()
    assert row.n_kept == 0  # the matching-n probe still strips


def test_substring_vacuum_spares_colocated_index_tombstones(spark, tmp_path):
    """r13 ADVICE: a substring vacuum must only clear its OWN
    windows_tombstones/ — a co-located exact/minhash index's pending
    takedowns in tombstones/ survive untouched."""
    import os

    from light_etl_windows_container_poc_spark.operators.incremental import (
        tombstone_dedup_ids,
    )
    from light_etl_windows_container_poc_spark.operators.incremental_substring import (
        tombstone_substring_docs,
        vacuum_substring_tombstones,
    )

    hist = _mk(spark, [(1, " ".join(_toks("a", 22))),
                       (2, " ".join(_toks("b", 22)))])
    idx = str(tmp_path / "idx")
    build_substring_index(hist, 20, idx)
    ids = spark.createDataFrame([(2,)], "doc_id long")
    tombstone_substring_docs(ids, "doc_id", idx)
    tombstone_dedup_ids(ids, "doc_id", idx)  # co-located OTHER family
    vacuum_substring_tombstones(spark, idx)
    assert not os.path.isdir(os.path.join(idx, "windows_tombstones"))
    assert os.path.isdir(os.path.join(idx, "tombstones"))  # untouched
