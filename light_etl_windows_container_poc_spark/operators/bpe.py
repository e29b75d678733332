"""BPE merge-table APPLICATION at production vocabulary sizes.

`text_bpe_tokenize` (queries/breadth27.py) applies its fixed 24-merge
table as a chain of `regexp_replace` projections — one whole-stage-
codegen'd pass per merge, the right shape for a small table. A
production tokenizer ships 32k merges, and 32k chained projections is
not a plan Catalyst should ever see (codegen size limits aside, the
plan alone would dwarf the data). This module supplies the scale path:
an Arrow-batched `mapInPandas` kernel (the sanctioned Python class —
the same family as the GEMM/ADC paths) that applies the SAME merge
semantics, with two levers the chain cannot pull:

- **vocabulary memoization** — within a batch, each DISTINCT word is
  tokenized once and cached; corpus text is Zipf-distributed, so the
  kernel's cost follows the batch vocabulary, not the token count;
- **substring prefilter** — a merge (a, b) can only fire on a word if
  the concatenation ``a+b`` is a contiguous substring of it (every BPE
  symbol is a contiguous substring of its word by induction), so each
  word consults only the O(len²) merges its own substrings index,
  independent of table size.

Merge semantics (IDENTICAL to the chain, which is what the certified
query hashes against): symbols start as the boundary-padded character
string ``" c1 c2 … cn "``; each merge (a, b), in table order, performs
ONE leftmost, non-overlapping, continue-after-match replace of
``" a b "`` with ``" ab "`` — exactly Python ``str.replace``, exactly
Java/RE2 ``regexp_replace`` with a global flag. Sequential-per-merge
(not rank-priority-iterative) is the documented contract; the two
disagree on words like "ththth" where one pass leaves an unmerged
middle pair.

`bpe_apply` routes automatically: tables at or under ``chain_limit``
(default 64) build the codegen chain; larger tables take the kernel.
Path invariance is pytest-certified on the same table, and the kernel
is hash-certified against the chain's SQL oracle (`bpe_apply_large`,
queries/breadth31.py).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

CHAIN_LIMIT_DEFAULT = 64


def bpe_symbols_expr(word: Column, merges: list[tuple[str, str]]) -> Column:
    """The codegen chain: boundary-padded symbol string after applying
    every merge in order — one `regexp_replace` projection per merge.
    Right below ``chain_limit``; see the module docstring for why it
    cannot scale to a shipped vocabulary."""
    cur = F.concat(F.lit(" "), F.regexp_replace(word, "(.)", "$1 "))
    for a, b in merges:
        cur = F.regexp_replace(cur, f" {a} {b} ", f" {a}{b} ")
    return cur


def tokenize_word(word: str, merges: list[tuple[str, str]],
                  index: dict[str, list[int]] | None = None) -> list[str]:
    """One word through the merge table (driver-side reference used by
    the kernel and the property tests). ``index`` is the prebuilt
    concat→merge-positions map enabling the substring prefilter."""
    s = " " + " ".join(word) + " "
    if index is None:
        todo = range(len(merges))
    else:
        hits: set[int] = set()
        for i in range(len(word)):
            for j in range(i + 2, len(word) + 1):
                hits.update(index.get(word[i:j], ()))
        todo = sorted(hits)
    for t in todo:
        a, b = merges[t]
        s = s.replace(f" {a} {b} ", f" {a}{b} ")
    return s.split()


def merge_index(merges: list[tuple[str, str]]) -> dict[str, list[int]]:
    """concat(a,b) → positions in the table holding that concatenation
    (several merges can share one surface form at different ranks)."""
    idx: dict[str, list[int]] = {}
    for t, (a, b) in enumerate(merges):
        idx.setdefault(a + b, []).append(t)
    return idx


def bpe_apply(df: DataFrame, word_col: str,
              merges: list[tuple[str, str]],
              out_col: str = "n_sym",
              mode: str = "auto",
              symbols_col: str | None = None,
              chain_limit: int = CHAIN_LIMIT_DEFAULT) -> DataFrame:
    """Append ``out_col`` = the word's symbol count under the merge
    table, and (when ``symbols_col`` is set) the symbol SEQUENCE as an
    ``array<string>`` — the actual tokenization downstream stages
    consume. ``mode``: "auto" picks chain vs kernel by table size;
    "chain" / "kernel" force a path (the invariance tests force both
    and compare)."""
    if mode not in ("auto", "chain", "kernel"):
        raise ValueError(f"unknown mode {mode!r}")
    if mode == "chain" or (mode == "auto" and len(merges) <= chain_limit):
        sym = F.split(F.trim(bpe_symbols_expr(F.col(word_col), merges)),
                      " +")
        out = df.withColumn(out_col, F.size(sym).cast("long"))
        if symbols_col is not None:
            out = out.withColumn(symbols_col, sym)
        return out

    import pandas as pd  # noqa: F811 — executor-side

    from ..session import ensure_package_on_executors

    ensure_package_on_executors(df.sparkSession)
    from pyspark.sql.types import (ArrayType, LongType, StringType,
                                   StructField, StructType)

    idx = merge_index(merges)
    cols = df.columns
    # fresh StructType — StructType.add MUTATES in place, and df.schema
    # can be a cached object, so .add would corrupt the input's schema
    fields = list(df.schema.fields) + [StructField(out_col, LongType())]
    if symbols_col is not None:
        fields.append(StructField(symbols_col, ArrayType(StringType())))
    schema = StructType(fields)

    def kernel(batches: Iterator["pd.DataFrame"],
               ) -> Iterator["pd.DataFrame"]:
        cache: dict[str, list[str]] = {}

        def toks(w: str) -> list[str]:
            t = cache.get(w)
            if t is None:
                # `or [""]`: the chain's split(trim(s), " +") maps an
                # empty word to [""] → size 1; match it bit-for-bit
                t = tokenize_word(w, merges, idx) or [""]
                cache[w] = t
            return t

        for pdf in batches:
            out = pdf[cols].copy()
            seqs = pdf[word_col].map(toks)
            out[out_col] = seqs.map(len).astype("int64")
            if symbols_col is not None:
                out[symbols_col] = seqs
            yield out

    return df.mapInPandas(kernel, schema)
