"""Text column expressions — tokenization, shingles, hashes.

All pure JVM column expressions (split/transform/slice/xxhash64): document
fingerprinting over 100 TB stays inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Mersenne prime 2^31-1 for minhash permutations: reduced hash (< 2^31)
# times a (< 2^31) stays under 2^62 — no int64 overflow under ANSI mode
MINHASH_PRIME = (1 << 31) - 1


def words(text: Column) -> Column:
    """Whitespace tokens of trimmed text (empty text → empty array)."""
    w = F.split(F.trim(text), r"\s+")
    return F.filter(w, lambda x: x != "")


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct n-word shingles (space-joined); < n words → empty array.

    Built as a zip_with chain over shifted slices of the token array —
    NOT `transform(indices, i -> slice(w, i, n))`: a lambda body that
    references `w` re-evaluates the whole split per element (higher-order
    bodies are interpreted subtrees, not bound attributes), making the
    index form O(tokens²) per row. The zip chain evaluates the split
    O(n) times per row (measured 4.6×, identical output)."""
    w = words(text)
    sh = w
    for k in range(1, n):
        shifted = F.slice(w, k + 1, F.greatest(F.size(w) - k, F.lit(0)))
        sh = F.zip_with(sh, shifted, lambda a, b: F.concat_ws(" ", a, b))
    out = F.slice(sh, 1, F.greatest(F.size(w) - (n - 1), F.lit(0)))
    return F.when(F.size(w) >= n, F.array_distinct(out)) \
            .otherwise(F.array().cast("array<string>"))


def word_ngrams_raw(text: Column, n: int = 2) -> Column:
    """NON-distinct n-word shingles in document order (duplicates are the
    signal for repetition metrics / LM scoring); same zip_with-chain cost
    argument as `word_shingles`."""
    w = words(text)
    sh = w
    for k in range(1, n):
        shifted = F.slice(w, k + 1, F.greatest(F.size(w) - k, F.lit(0)))
        sh = F.zip_with(sh, shifted, lambda a, b: F.concat_ws(" ", a, b))
    out = F.slice(sh, 1, F.greatest(F.size(w) - (n - 1), F.lit(0)))
    return F.when(F.size(w) >= n, out) \
            .otherwise(F.array().cast("array<string>"))


def shingle_hashes(text: Column, n: int = 3) -> Column:
    """xxhash64 of each distinct shingle — the minhash input."""
    return F.transform(word_shingles(text, n), lambda s: F.xxhash64(s))


def _perm_params(num_hashes: int, seed: int = 42) -> list[tuple[int, int]]:
    """Deterministic affine permutation params (a odd, b) for minhash."""
    import random

    rng = random.Random(seed)
    return [(rng.randrange(1, MINHASH_PRIME, 2), rng.randrange(0, MINHASH_PRIME))
            for _ in range(num_hashes)]


def minhash_signature(text: Column, num_hashes: int = 128,
                      n: int = 3, seed: int = 42) -> Column:
    """MinHash signature: array of ``num_hashes`` minima of affine
    permutations of the shingle hashes. One pass per row, no shuffle.

    Built as ONE fold over the hash array (init = [P,P,...], step =
    elementwise least against the permuted values of the next shingle):
    the naive form — num_hashes separate array_min(transform(...)) columns
    — re-evaluates the tokenize+shingle+hash subtree once per permutation
    (Catalyst doesn't CSE across projection items), which measured ~50×
    slower and megabyte-scale codegen.
    """
    params = _perm_params(num_hashes, seed)
    a_arr = F.array(*[F.lit(a) for a, _ in params])
    b_arr = F.array(*[F.lit(b) for _, b in params])
    # reduce the 64-bit hash into [0, P) first so every product fits int64
    hashes = F.transform(shingle_hashes(text, n),
                         lambda h: F.pmod(h, F.lit(MINHASH_PRIME)))
    init = F.array_repeat(F.lit(MINHASH_PRIME).cast("bigint"), num_hashes)
    return F.aggregate(
        hashes, init,
        lambda acc, h: F.zip_with(
            acc,
            F.transform(a_arr, lambda a, i: F.pmod(
                h * a + F.element_at(b_arr, i + 1), F.lit(MINHASH_PRIME))),
            lambda x, y: F.least(x, y)))


def signature_agreement(sig_a: Column, sig_b: Column) -> Column:
    """Estimated Jaccard: fraction of agreeing minhash positions."""
    eq = F.zip_with(sig_a, sig_b,
                    lambda x, y: F.when(x == y, 1).otherwise(0))
    return F.aggregate(eq, F.lit(0), lambda acc, x: acc + x) / F.size(sig_a)
