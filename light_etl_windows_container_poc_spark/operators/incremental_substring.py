"""Cross-run (incremental) exact-substring dedup — the Lee et al. tier
against a PERSISTED window index.

`operators/substring_dedup.py` is corpus-in/corpus-out: its prefix-
doubling equality classes are CORPUS-RELATIVE (a class id is the min
(id, pos) struct of the class), so they cannot be persisted and probed
by a later run — the same window content gets a different class id in a
different corpus. A 100 TB ingestion pipeline instead sees
new-batch-vs-history: yesterday's corpus is already ingested and only
today's arrivals must be checked for spans duplicating ANY previously
ingested text, without re-scanning history (the
`operators/incremental.py` exact/minhash discipline, applied to the
substring tier).

The persisted key is therefore a CONTENT-DETERMINED fingerprint, built
with the same doubling recursion as the batch tier but hash-valued —
a Merkle chain over the token stream:

    h_0(p)   = xxhash64(salt, tok(p))
    h_k(p)   = xxhash64(salt, h_{k-1}(p), h_{k-1}(p + 2^{k-1}))
    key(p)   = xxhash64(salt, h_k(p), h_k(p + N - 2^k))   (2^k <= N)

computed with per-doc ``lead`` windows — log2(N) Window passes over ONE
per-doc sort, zero joins, zero extra shuffles (every level shares the
same (id, pos) partitioning+ordering, so Spark plans one Exchange+Sort
feeding a chain of WindowExecs). Two independent salt chains give a
128-bit key: unlike the batch tier this op is fingerprint-based — a
collision can only over-strip, with ~2^-128 per-pair probability (the
exactness-critical batch census stays on the hash-free class path).

Semantics — FORWARD-ONLY, the property that matches the module's
exact/minhash siblings: a batch window is duplicated iff its content
appears in the already-ingested history OR >= 2 times within the batch
itself. History text is never re-stripped (ingested state is
immutable), and the index append records the batch AS INGESTED, so any
span the pipeline has ever seen marks future repeats. ``batch_tag``
makes the call replay-idempotent exactly as in
`incremental_exact_dedup`: appends carry the tag and the probe excludes
the current tag, so a crashed micro-batch's retry reproduces identical
decisions.

State: ``windows/`` under the index dir — (doc, fp_a, fp_b, batch_tag),
one row per token position of ingested text (the suffix-array-scale
state; append-only, optionally HASH-BUCKETED by fp_a so the history
side of the probe join never shuffles — `bucket_fps`, same measured
constraint as bands/: the bucketed scan needs join key == bucket key,
so the probe joins on fp_a alone and verifies fp_b as a residual
filter). The doc column exists for TAKEDOWNS
(`tombstone_substring_docs` / `vacuum_substring_tombstones` — the
substring sibling of `dedup_takedown`): a taken-down doc's spans stop
marking future batches, while windows shared with live docs keep
marking through the live rows.

Reference scope: the reference has no substring dedup (its dedup is
row-exact, dataframe_tasks.py drop_duplicates); this is the incremental
form of the SURVEY §2.3 Lee-et-al tier.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .incremental import (
    _dedup_tombstones,
    _read_state,
    _staged_state_rewrite,
    _write_state,
    tombstone_dedup_ids,
)
from .substring_dedup import _merge_islands, _strip_spans, token_positions

WINDOWS_SUBDIR = "windows"
# Substring tombstones live in their OWN subdir, not incremental.py's
# shared TOMBS_SUBDIR name: a caller co-locating an exact/minhash index
# at the same directory must never have a substring vacuum clear that
# index's pending takedowns (r13 ADVICE).
SUBSTRING_TOMBS_SUBDIR = "windows_tombstones"
_SPEC_FILENAME = "_substring_spec.json"


def _spec_path(index_dir: str) -> str:
    return os.path.join(index_dir, _SPEC_FILENAME)


def _write_spec(index_dir: str, n: int) -> None:
    os.makedirs(index_dir, exist_ok=True)
    with open(_spec_path(index_dir), "w") as f:
        json.dump({"n": n}, f)


def _check_spec(index_dir: str, n: int) -> None:
    """Fingerprints from different window lengths NEVER match (the
    doubling recursion differs in shape), so probing an n=20 index at
    n=24 silently reports 'nothing duplicated'. The build persists n and
    every probe asserts it (r13 ADVICE); pre-spec indexes (no file) are
    tolerated unchecked."""
    p = _spec_path(index_dir)
    if not os.path.exists(p):
        return
    with open(p) as f:
        stored = json.load(f)["n"]
    if stored != n:
        raise ValueError(
            f"substring index at {index_dir} was built with n={stored}; "
            f"probing with n={n} would match nothing — pass n={stored} "
            "or rebuild the index")
# doc attribution makes takedowns possible: tombstoning a doc removes
# ONLY its rows from the probe's history, so a window shared with a
# live doc keeps marking (the correct takedown semantics for free).
# BIGINT doc in the DDL = the bucketed catalog layout assumes long ids,
# exactly like bands/. Plain-parquet indexes preserve any id type for
# PROBING, but takedown/vacuum compare against BIGINT tombstones on
# both paths — ids that cannot cast to long raise at tombstone time.
_WINDOWS_DDL_COLS = "doc BIGINT, fp_a BIGINT, fp_b BIGINT, batch_tag BIGINT"


def window_fingerprints(docs: DataFrame, n: int, id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """(id, pos, fp_a, fp_b): a 128-bit content fingerprint of the
    exact-N-token window starting at pos — equal window text yields
    equal fingerprints ACROSS runs and corpora (unlike the batch tier's
    corpus-relative class ids). Only positions whose window fits the
    document appear.

    Row-offset ``lead`` is position-offset here by construction: the
    positions surviving level k form the contiguous range
    [0, len - 2^k] (every level drops exactly the tail whose doubled
    window would cross the document end), so the k-th lead's row
    distance equals its token distance.
    """
    if n < 1:
        raise ValueError(f"window length must be >= 1, got {n}")
    w = Window.partitionBy("id").orderBy("pos")

    def h(salt: str, *cols):
        return F.xxhash64(F.lit(salt), *cols)

    cur = (token_positions(docs, id_col, text_col)
           .select("id", "pos",
                   h("sda", F.col("tok")).alias("ha"),
                   h("sdb", F.col("tok")).alias("hb")))
    span = 1
    while span * 2 <= n:
        nxt_a = F.lead("ha", span).over(w)
        nxt_b = F.lead("hb", span).over(w)
        cur = (cur.select("id", "pos",
                          h("sda", F.col("ha"), nxt_a).alias("ha"),
                          h("sdb", F.col("hb"), nxt_b).alias("hb"),
                          nxt_a.isNull().alias("_trunc"))
               .filter(~F.col("_trunc")).drop("_trunc"))
        span *= 2
    d = n - span  # 0 <= d < span: the overlapping second leg
    if d == 0:
        return cur.select("id", "pos", F.col("ha").alias("fp_a"),
                          F.col("hb").alias("fp_b"))
    sh_a = F.lead("ha", d).over(w)
    sh_b = F.lead("hb", d).over(w)
    return (cur.select("id", "pos",
                       h("sda", F.col("ha"), sh_a).alias("fp_a"),
                       h("sdb", F.col("hb"), sh_b).alias("fp_b"),
                       sh_a.isNull().alias("_trunc"))
            .filter(~F.col("_trunc")).drop("_trunc"))


def build_substring_index(docs: DataFrame, n: int, index_dir: str,
                          id_col: str = "doc_id", text_col: str = "text",
                          bucket_fps: int | None = None) -> None:
    """Initialize ``index_dir``/windows from an already-ingested corpus:
    every window fingerprint, tagged -1 (pre-history). ``bucket_fps``
    persists the table HASH-BUCKETED by fp_a so later probes read the
    history side with no Exchange (the history side is the one that
    grows with the corpus; the batch side stays batch-sized)."""
    fps = (window_fingerprints(docs, n, id_col, text_col)
           .select(F.col("id").alias("doc"), "fp_a", "fp_b",
                   F.lit(-1).cast("long").alias("batch_tag")))
    _write_state(fps, os.path.join(index_dir, WINDOWS_SUBDIR),
                 "overwrite", "fp_a", _WINDOWS_DDL_COLS, bucket_fps)
    _write_spec(index_dir, n)


def incremental_substring_dedup(batch: DataFrame, n: int, index_dir: str,
                                id_col: str = "doc_id",
                                text_col: str = "text",
                                update_index: bool = True,
                                batch_tag: int | None = None
                                ) -> DataFrame:
    """Strip every batch span of >= n tokens that appears verbatim in
    the ingested history OR >= 2 times within the batch. Returns one row
    per batch doc: (id, n_tokens, n_kept, kept_text, hist_starts,
    batch_starts) — the two start counts split the evidence (history hit
    vs within-batch duplication; a window can be both). A missing index
    bootstraps as empty history; with ``update_index`` the batch's
    windows (as ingested, pre-strip) append so the next batch sees them.

    Probe shape: ONE equi-join of the batch's fingerprints against
    windows/ on fp_a (the bucket key when bucketed — no history-side
    shuffle), fp_b verified as a residual; within-batch duplication is
    one count over the near-unique fingerprint key. Per-batch cost
    follows batch size + collision volume, never history size."""
    spark = batch.sparkSession
    _check_spec(index_dir, n)
    path = os.path.join(index_dir, WINDOWS_SUBDIR)
    fps = (window_fingerprints(batch, n, id_col, text_col)
           .localCheckpoint(eager=True))

    if os.path.exists(path):
        hist = _read_state(spark, path, _WINDOWS_DDL_COLS)
        if batch_tag is not None and "batch_tag" in hist.columns:
            hist = hist.filter(F.col("batch_tag") != batch_tag)
        tombs = _dedup_tombstones(spark, index_dir,
                                  SUBSTRING_TOMBS_SUBDIR)
        if tombs is not None:
            # takedown: a taken-down doc's spans stop being history; a
            # window shared with a live doc keeps its other rows
            hist = hist.join(F.broadcast(tombs), "doc", "left_anti")
        hist_hits = (fps.join(hist.select("fp_a",
                                          F.col("fp_b").alias("_h_fp_b")),
                              "fp_a")
                     .filter(F.col("fp_b") == F.col("_h_fp_b"))
                     .select("id", "pos").dropDuplicates(["id", "pos"]))
    else:
        hist_hits = spark.createDataFrame([], fps.select("id", "pos").schema)
    c = F.count(F.lit(1)).over(Window.partitionBy("fp_a", "fp_b"))
    batch_hits = (fps.withColumn("_c", c).filter(F.col("_c") >= 2)
                  .select("id", "pos"))
    starts = (hist_hits.unionByName(batch_hits)
              .dropDuplicates(["id", "pos"])
              .localCheckpoint(eager=True))
    spans = _merge_islands(starts, n)
    per_hist = (hist_hits.groupBy("id")
                .agg(F.count(F.lit(1)).cast("long").alias("hist_starts")))
    per_batch = (batch_hits.groupBy("id")
                 .agg(F.count(F.lit(1)).cast("long").alias("batch_starts")))
    out = (_strip_spans(batch, spans, id_col, text_col)
           .join(per_hist, "id", "left").join(per_batch, "id", "left")
           .select("id", "n_tokens", "n_kept", "kept_text",
                   F.coalesce("hist_starts", F.lit(0)).cast("long")
                   .alias("hist_starts"),
                   F.coalesce("batch_starts", F.lit(0)).cast("long")
                   .alias("batch_starts")))
    if update_index:
        # materialize decisions BEFORE the append extends the path the
        # probe plan reads (the incremental_exact_dedup discipline)
        out = out.localCheckpoint(eager=True)
        _write_state(
            fps.select(F.col("id").alias("doc"), "fp_a", "fp_b",
                       F.lit(batch_tag if batch_tag is not None else -1)
                       .cast("long").alias("batch_tag")),
            path, "append", "fp_a", _WINDOWS_DDL_COLS, None)
        if not os.path.exists(_spec_path(index_dir)):
            _write_spec(index_dir, n)  # bootstrap-created index
    return out


def tombstone_substring_docs(ids: DataFrame, id_col: str,
                             index_dir: str) -> int:
    """Mark docs taken down for the substring index (append-only;
    duplicates collapse at read) — the substring sibling of
    `tombstone_dedup_ids`, in this index family's OWN
    ``windows_tombstones/`` subdir so a co-located exact/minhash index's
    ``tombstones/`` is never touched. Ids must cast to BIGINT (the
    windows/ doc type) — non-castable ids raise instead of silently
    matching nothing. Returns the batch's id count."""
    return tombstone_dedup_ids(ids, id_col, index_dir,
                               SUBSTRING_TOMBS_SUBDIR)


def vacuum_substring_tombstones(spark: SparkSession,
                                index_dir: str) -> None:
    """Physically remove tombstoned docs' window rows from windows/
    (preserving the plain/bucketed layout) and clear the tombstone set,
    via the staged rename-aside swap — probe results are unchanged
    before/after (the anti-join already excluded these rows).

    Crash-window idempotence: the rewrite lands via
    `_staged_state_rewrite` (stage → rename-old-aside → rename-in), so
    a crash before the swap leaves the old windows/ + tombstones intact
    and a re-run redoes the identical rewrite; a crash AFTER the swap
    but before the tombstone clear leaves the rewritten windows/ plus
    now-stale tombstones whose docs no longer exist in state — the
    anti-joins then exclude nothing, and a re-run (or the next vacuum)
    clears them. Every interleaving converges to the same probe
    answers. Only this family's ``windows_tombstones/`` is cleared."""
    import shutil

    from .incremental import _bucket_spec_path

    tombs = _dedup_tombstones(spark, index_dir, SUBSTRING_TOMBS_SUBDIR)
    if tombs is None:
        return
    tombs = tombs.localCheckpoint(eager=True)
    path = os.path.join(index_dir, WINDOWS_SUBDIR)
    if os.path.exists(path):
        kept = (_read_state(spark, path, _WINDOWS_DDL_COLS)
                .join(F.broadcast(tombs), "doc", "left_anti")
                .localCheckpoint(eager=True))
        spec_path = _bucket_spec_path(path)
        nb = key = None
        if os.path.exists(spec_path):
            with open(spec_path) as f:
                s = json.load(f)
            nb, key = s["num_buckets"], s["key"]
        _staged_state_rewrite(spark, kept, path, key or "fp_a",
                              _WINDOWS_DDL_COLS, nb)
    shutil.rmtree(os.path.join(index_dir, SUBSTRING_TOMBS_SUBDIR),
                  ignore_errors=True)
