"""Exact variable-length substring dedup — the Lee et al. tier.

"Deduplicating Training Data Makes Language Models Better" (Lee et al.
2022) drops every span of >= N tokens that occurs verbatim anywhere
else in the corpus (including elsewhere in the same document), via a
monolithic suffix array over the concatenated corpus. This module
re-expresses that pass Spark-first, on top of one identity:

    the token set covered by duplicated spans of length >= N
    == the union of all duplicated EXACT-N-token windows,

because every length-L >= N duplicated span contains L-N+1 duplicated
N-windows whose union is exactly the span, and every duplicated
N-window IS a duplicated span. So variable-length semantics reduce to
finding exact-length-N window equality classes with >= 2 members.

Window equality is computed EXACTLY (no hashing, no collision caveat)
by prefix doubling over token positions — the suffix-array construction
step, stopped at level ceil(log2 N) instead of log(corpus):

  - level 0: a window of 1 token; its equality class id is the minimum
    (id, pos) struct among equal tokens — deterministic, no
    monotonically_increasing_id (whose values can differ between two
    evaluations of the same plan).
  - level k: class of [p, p+2^k) = canonical id of the PAIR
    (class_{k-1}(p), class_{k-1}(p + 2^{k-1})) — one inner equi-join on
    (id, pos) plus one groupBy-min plus one join back, all JVM-side.
  - length-N windows (2^k <= N < 2^{k+1}): the pair
    (class_k(p), class_k(p + N - 2^k)) — the two spans overlap and
    cover [p, p+N), the standard O(1) range-equality trick.

Each level is localCheckpoint'ed: level k's plan joins level k-1 with
itself, so an unmaterialized lineage would double per level (2^k copies
of the scan by level k).

Scale shape at 100 TB: ~log2(N) rounds (N=20 -> 4 doublings + 1 shift
join) of constant-row-width shuffles over the token stream — each
shuffle row is (id, pos, two 16-byte struct ids), vs the O(T*N)-byte
blowup of shuffling materialized N-gram strings (the dup_span_census
approach at n=5, queries/breadth24.py — right for tiny n, 20x token
bytes at n=20) and vs log(T) rounds for a full suffix sort. Class keys
at level >= 2 are near-unique so the groupBys don't skew; level-0
token skew is absorbed by partial aggregation (min). Island merging and
text rebuild are windowed per doc_id — never a global window.

Reference scope: the reference has no substring dedup (its dedup is
row-exact, dataframe_tasks.py drop_duplicates); this is new surface for
the 100 TB training-data pipeline, SURVEY §2.3.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.texts import words


def token_positions(docs: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """(id, pos, tok) with pos 0-based in document order; empty/null
    text yields no rows (posexplode drops them)."""
    return (docs.select(F.col(id_col).alias("id"),
                        F.posexplode(words(F.col(text_col)))
                        .alias("pos", "tok")))


def _level0(tok: DataFrame) -> DataFrame:
    """Equality class of each single token: min (id, pos) of the class."""
    tab = tok.groupBy("tok").agg(F.min(F.struct("id", "pos")).alias("cls"))
    return tok.join(tab, "tok").select("id", "pos", "cls")


def _double(cur: DataFrame, span: int) -> DataFrame:
    """Classes of [p, p+2*span) from classes of [p, p+span): inner join
    with the span-shifted copy (truncates positions whose doubled
    window would cross the document end), canonicalize the pair."""
    right = cur.select("id", (F.col("pos") - F.lit(span)).alias("pos"),
                       F.col("cls").alias("cls2"))
    pair = cur.join(right, ["id", "pos"])
    tab = (pair.groupBy("cls", "cls2")
           .agg(F.min(F.struct("id", "pos")).alias("ncls")))
    return (pair.join(tab, ["cls", "cls2"])
            .select("id", "pos", F.col("ncls").alias("cls")))


def window_classes(docs: DataFrame, n: int, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """(id, pos, cls, cls2): the exact-equality key of the N-token
    window starting at pos — two rows share (cls, cls2) iff their
    windows are token-identical. Only positions whose window fits the
    document (pos + n <= doc tokens) appear."""
    if n < 1:
        raise ValueError(f"window length must be >= 1, got {n}")
    cur = _level0(token_positions(docs, id_col, text_col))
    cur = cur.localCheckpoint(eager=True)
    span = 1
    while span * 2 <= n:
        cur = _double(cur, span).localCheckpoint(eager=True)
        span *= 2
    d = n - span  # 0 <= d < span: the overlapping second leg
    if d == 0:
        return cur.select("id", "pos", "cls",
                          F.struct(F.lit(0).alias("id"),
                                   F.lit(0).alias("pos")).alias("cls2"))
    right = cur.select("id", (F.col("pos") - F.lit(d)).alias("pos"),
                       F.col("cls").alias("cls2"))
    return cur.join(right, ["id", "pos"])


def duplicated_window_starts(docs: DataFrame, n: int,
                             id_col: str = "doc_id",
                             text_col: str = "text") -> DataFrame:
    """(id, pos) of every exact-N-token window occurring >= 2 times
    corpus-wide (same-document repeats count, per Lee et al.). One
    window count over the class key — a single shuffle on near-unique
    keys, no self-join."""
    wins = window_classes(docs, n, id_col, text_col)
    c = F.count(F.lit(1)).over(Window.partitionBy("cls", "cls2"))
    return (wins.withColumn("c", c).filter(F.col("c") >= 2)
            .select("id", "pos"))


def _merge_islands(starts: DataFrame, n: int) -> DataFrame:
    """Merge overlapping/adjacent [pos, pos+n) windows per id into
    maximal spans — gaps-and-islands with per-id windows."""
    w = Window.partitionBy("id").orderBy("pos")
    prev_end = (F.max(F.col("pos") + F.lit(n))
                .over(w.rowsBetween(Window.unboundedPreceding, -1)))
    flagged = starts.withColumn(
        "new_isl",
        F.when(prev_end.isNull() | (F.col("pos") > prev_end), 1)
        .otherwise(0))
    grouped = flagged.withColumn("isl", F.sum("new_isl").over(w))
    return (grouped.groupBy("id", "isl")
            .agg(F.min("pos").alias("span_start"),
                 (F.max("pos") + F.lit(n)).alias("span_end"))
            .select("id", "span_start", "span_end"))


def duplicated_spans(docs: DataFrame, n: int, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """(id, span_start, span_end) — maximal duplicated spans of
    length >= n per document, end exclusive, 0-based. These are
    exactly the spans the Lee et al. pass would strip."""
    return _merge_islands(
        duplicated_window_starts(docs, n, id_col, text_col), n)


def _strip_spans(docs: DataFrame, spans: DataFrame, id_col: str,
                 text_col: str) -> DataFrame:
    """(id, n_tokens, n_kept, kept_text): every doc minus the tokens
    covered by its spans — kept_text rebuilt from surviving tokens
    single-space-joined (whitespace-normalized on both engines), a
    fully-covered doc keeps ''. Spans are takedown-sized relative to
    the corpus; the anti-join is doc-local (equi on id + pos range)."""
    toks = token_positions(docs, id_col, text_col)
    kept = toks.alias("t").join(
        spans.alias("s"),
        (F.col("t.id") == F.col("s.id"))
        & (F.col("t.pos") >= F.col("s.span_start"))
        & (F.col("t.pos") < F.col("s.span_end")),
        "left_anti")
    per = (kept.groupBy("id")
           .agg(F.count(F.lit(1)).alias("n_kept"),
                F.concat_ws(
                    " ",
                    F.transform(
                        F.array_sort(F.collect_list(
                            F.struct("pos", "tok"))),
                        lambda s: s["tok"])).alias("kept_text")))
    # null text coalesces to '' so n_tokens is 0 on BOTH engines
    # (size(null) is engine-config-dependent; token_positions already
    # yields no rows for null docs, so 0 is the consistent answer)
    return (docs.select(F.col(id_col).alias("id"),
                        F.size(words(F.coalesce(F.col(text_col),
                                                F.lit("")))).cast("long")
                        .alias("n_tokens"))
            .join(per, "id", "left")
            .select("id",
                    "n_tokens",
                    F.coalesce("n_kept", F.lit(0)).cast("long")
                    .alias("n_kept"),
                    F.coalesce("kept_text", F.lit("")).alias("kept_text")))


def strip_duplicated_substrings(docs: DataFrame, n: int,
                                id_col: str = "doc_id",
                                text_col: str = "text") -> DataFrame:
    """Every doc minus its duplicated >= n-token spans:
    (id, n_tokens, n_kept, kept_text)."""
    return _strip_spans(docs, duplicated_spans(docs, n, id_col, text_col),
                        id_col, text_col)


def contaminated_window_starts(corpus: DataFrame, ref: DataFrame, n: int,
                               id_col: str = "doc_id",
                               text_col: str = "text") -> DataFrame:
    """(id, pos) of every corpus window whose exact n-token content
    appears ANYWHERE in the reference corpus — the substring tier of
    benchmark decontamination (strip eval data from training data, the
    cross-corpus companion of duplicated_window_starts: corpus-corpus
    duplication does NOT mark a window here, only corpus∩ref). The
    prefix-doubling classes are built ONCE over the tagged union, so
    cross-corpus equality is exact; the internal union id is a
    (src, orig) struct — type-agnostic (string/negative ids work; an
    id*2/id*2+1 arithmetic encoding would silently null-cast string
    ids and mis-filter negatives under Spark's % semantics) — unmapped
    on output."""
    c = corpus.select(F.struct(F.lit(0).alias("src"),
                               F.col(id_col).alias("orig")).alias("_sd_id"),
                      F.col(text_col).alias("_sd_text"))
    r = ref.select(F.struct(F.lit(1).alias("src"),
                            F.col(id_col).alias("orig")).alias("_sd_id"),
                   F.col(text_col).alias("_sd_text"))
    wins = window_classes(c.unionByName(r), n, "_sd_id", "_sd_text")
    ref_classes = (wins.filter(F.col("id.src") == 1)
                   .select("cls", "cls2").distinct())
    return (wins.filter(F.col("id.src") == 0)
            .join(ref_classes, ["cls", "cls2"], "left_semi")
            .select(F.col("id.orig").alias("id"), "pos"))


def contaminated_spans(corpus: DataFrame, ref: DataFrame, n: int,
                       id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """(id, span_start, span_end): maximal corpus spans of length >= n
    appearing verbatim in the reference corpus."""
    return _merge_islands(
        contaminated_window_starts(corpus, ref, n, id_col, text_col), n)


def strip_contaminated_substrings(corpus: DataFrame, ref: DataFrame,
                                  n: int, id_col: str = "doc_id",
                                  text_col: str = "text") -> DataFrame:
    """Every corpus doc minus its spans that appear in the reference:
    (id, n_tokens, n_kept, kept_text) — the decontamination strip."""
    return _strip_spans(
        corpus, contaminated_spans(corpus, ref, n, id_col, text_col),
        id_col, text_col)
