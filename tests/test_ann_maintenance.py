"""Streaming ANN index maintenance: availableNow appends against the
frozen quantizers, marker-based replay skip, and exactness of the
grown index."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from light_etl_windows_container_poc_spark.catalog import load_tables
from light_etl_windows_container_poc_spark.operators.ann_index import (
    build_ivfpq_index, query_ivfpq_index)
from light_etl_windows_container_poc_spark.operators.similarity import \
    ann_bruteforce_topk
from light_etl_windows_container_poc_spark.streaming.ann_maintenance import (
    ann_append_batch_handler, start_ann_index_maintenance)

SCHEMA = "vec_id long, embedding array<double>"


def _emb(spark, sf_dir):
    return load_tables(spark, sf_dir, ("embeddings",))["embeddings"]


def _write_vec_file(path, rows):
    with open(path, "w") as fh:
        for vid, vec in rows:
            fh.write(json.dumps({"vec_id": vid, "embedding": vec}) + "\n")


def test_stream_appends_grow_index_and_stay_exact(spark, sf_dir,
                                                  tmp_path):
    emb = _emb(spark, sf_dir)
    base = emb.filter(F.col("vec_id") < 200)
    idx = str(tmp_path / "ivfpq")
    build_ivfpq_index(base, "vec_id", "embedding", idx, n_clusters=4)

    arrivals = [(int(r["vec_id"]), [float(x) for x in r["embedding"]])
                for r in emb.filter((F.col("vec_id") >= 200)
                                    & (F.col("vec_id") < 300)).collect()]
    src = tmp_path / "src"
    src.mkdir()
    _write_vec_file(src / "day1.json", arrivals[:len(arrivals) // 2])
    _write_vec_file(src / "day2.json", arrivals[len(arrivals) // 2:])
    os.utime(src / "day1.json", (1_000_000, 1_000_000))
    os.utime(src / "day2.json", (2_000_000, 2_000_000))

    stream = (spark.readStream.schema(SCHEMA)
              .option("maxFilesPerTrigger", 1).json(str(src)))
    q = start_ann_index_maintenance(stream, idx, str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    grown = emb.filter(F.col("vec_id") < 300)
    stored = spark.read.parquet(os.path.join(idx, "codes"))
    assert stored.count() == grown.count()
    # two applied-batch markers, one per micro-batch
    markers = os.listdir(os.path.join(idx, "_applied_batches"))
    assert len(markers) == 2
    queries = emb.filter(F.col("vec_id") < 3)
    got = query_ivfpq_index(spark, idx, grown, queries, "vec_id",
                            "embedding", k=4, nprobe=4, rerank=1 << 30)
    exact = ann_bruteforce_topk(grown, queries, "vec_id", "embedding", k=4)
    assert sorted((r.q_id, r.n_id, r.rank) for r in got.collect()) == \
        sorted((r.q_id, r.n_id, r.rank) for r in exact.collect())


def test_clean_replay_skips_applied_batch(spark, sf_dir, tmp_path):
    emb = _emb(spark, sf_dir)
    base = emb.filter(F.col("vec_id") < 200)
    batch = emb.filter((F.col("vec_id") >= 200) & (F.col("vec_id") < 250))
    idx = str(tmp_path / "ivfpq")
    build_ivfpq_index(base, "vec_id", "embedding", idx, n_clusters=4)
    handler = ann_append_batch_handler(idx)
    handler(batch, 7)
    n_after_first = spark.read.parquet(os.path.join(idx, "codes")).count()
    handler(batch, 7)  # clean replay: marker exists → no-op
    n_after_replay = spark.read.parquet(os.path.join(idx, "codes")).count()
    assert n_after_first == n_after_replay == 250
    # crash-window replay (marker lost): storage duplicates, but the
    # candidate dedupe keeps queries exact — asserted in
    # test_replayed_append_does_not_corrupt_query_results
    os.remove(os.path.join(idx, "_applied_batches", "batch_7"))
    handler(batch, 7)
    assert spark.read.parquet(os.path.join(idx, "codes")).count() == 300


def test_codes_compaction_removes_replay_duplicates(spark, sf_dir,
                                                    tmp_path):
    """The storage sweep: after a crash-window replay duplicated a
    batch's codes, compaction drops the exact-duplicate rows and
    coalesces append small-files — queries identical before and
    after (they already were, via candidate dedupe; compaction
    reclaims the scan)."""
    from light_etl_windows_container_poc_spark.operators.ann_index import \
        compact_ivfpq_codes

    emb = _emb(spark, sf_dir)
    base = emb.filter(F.col("vec_id") < 200)
    batch = emb.filter((F.col("vec_id") >= 200) & (F.col("vec_id") < 250))
    grown = emb.filter(F.col("vec_id") < 250)
    idx = str(tmp_path / "ivfpq")
    build_ivfpq_index(base, "vec_id", "embedding", idx, n_clusters=4)
    handler = ann_append_batch_handler(idx)
    handler(batch, 1)
    os.remove(os.path.join(idx, "_applied_batches", "batch_1"))
    handler(batch, 1)  # crash-window replay → duplicate codes
    codes_path = os.path.join(idx, "codes")
    assert spark.read.parquet(codes_path).count() == 300
    queries = emb.filter(F.col("vec_id") < 3)
    before = sorted((r.q_id, r.n_id, r.rank) for r in
                    query_ivfpq_index(spark, idx, grown, queries,
                                      "vec_id", "embedding", k=4,
                                      nprobe=4, rerank=1 << 30).collect())
    n = compact_ivfpq_codes(spark, idx)
    assert n == 250
    assert spark.read.parquet(codes_path).count() == 250
    after = sorted((r.q_id, r.n_id, r.rank) for r in
                   query_ivfpq_index(spark, idx, grown, queries,
                                     "vec_id", "embedding", k=4,
                                     nprobe=4, rerank=1 << 30).collect())
    assert before == after
