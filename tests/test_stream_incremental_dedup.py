"""Streaming incremental dedup: real availableNow runs against the
persisted index, cross-batch suppression, and replay idempotence."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from light_etl_windows_container_poc_spark.streaming.incremental_dedup import (
    incremental_dedup_batch_handler, read_deduped_corpus,
    start_incremental_dedup_stream)

SCHEMA = "doc_id long, text string"


def _write_file(path, rows):
    with open(path, "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")


def test_stream_dedups_across_micro_batches(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    _write_file(src / "a.json", [
        {"doc_id": 1, "text": "alpha beta gamma"},
        {"doc_id": 2, "text": "delta epsilon zeta"},
        {"doc_id": 3, "text": "alpha beta gamma"},      # in-batch dup of 1
    ])
    _write_file(src / "b.json", [
        {"doc_id": 10, "text": "alpha beta gamma"},     # dup of batch-1 kept
        {"doc_id": 11, "text": "eta theta iota"},       # novel
    ])
    # pin modification times so the file source's oldest-first pickup
    # processes a.json as batch 0 deterministically
    os.utime(src / "a.json", (1_000_000, 1_000_000))
    os.utime(src / "b.json", (2_000_000, 2_000_000))
    stream = (spark.readStream.schema(SCHEMA)
              .option("maxFilesPerTrigger", 1).json(str(src)))
    q = start_incremental_dedup_stream(
        stream, str(tmp_path / "idx"), str(tmp_path / "out"),
        str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    kept = {r.doc_id for r in
            read_deduped_corpus(spark, str(tmp_path / "out")).collect()}
    assert kept == {1, 2, 11}
    # lineage column exposed
    out = read_deduped_corpus(spark, str(tmp_path / "out"))
    assert "batch_id" in out.columns


def test_replayed_batch_is_idempotent(spark, tmp_path):
    idx, out = str(tmp_path / "idx"), str(tmp_path / "out")
    handler = incremental_dedup_batch_handler(idx, out)
    b1 = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta")], SCHEMA)
    b2 = spark.createDataFrame(
        [(10, "alpha beta"), (11, "unseen text")], SCHEMA)
    handler(b1, 0)
    handler(b2, 1)
    first = sorted(r.doc_id for r in
                   read_deduped_corpus(spark, out).collect())
    assert first == [1, 2, 11]
    # crash-replay of batch 1: the retry must see pre-crash history only
    # (its own failed appends are tag-excluded) and rewrite the same
    # output partition — no duplicates, identical decisions
    handler(b2, 1)
    again = sorted(r.doc_id for r in
                   read_deduped_corpus(spark, out).collect())
    assert again == first
    # the index still answers later batches correctly after the replay
    b3 = spark.createDataFrame([(20, "unseen text"),
                                (21, "really new")], SCHEMA)
    handler(b3, 2)
    final = sorted(r.doc_id for r in
                   read_deduped_corpus(spark, out).collect())
    assert final == [1, 2, 11, 21]


def test_minhash_method_suppresses_near_dups(spark, tmp_path):
    idx, out = str(tmp_path / "idx"), str(tmp_path / "out")
    base = ("the quick brown fox jumps over the lazy dog and keeps "
            "running through the quiet green field all day long")
    handler = incremental_dedup_batch_handler(
        idx, out, method="minhash", num_hashes=32, bands=8, num_parts=2)
    handler(spark.createDataFrame([(1, base)], SCHEMA), 0)
    handler(spark.createDataFrame(
        [(10, base + " extra"), (11, "completely different words here "
                                     "about other topics entirely")],
        SCHEMA), 1)
    kept = sorted(r.doc_id for r in
                  read_deduped_corpus(spark, out).collect())
    assert kept == [1, 11]
