"""Text-analysis operators: language ID, quality scoring, token counting,
fingerprinting. Pure column expressions — a 100 TB quality-filter pass is
one codegen'd scan, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.texts import word_ngrams_raw, words

# Small high-frequency stopword sets per language (public knowledge).
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "to", "in", "is", "it", "that", "for"),
    "de": ("der", "die", "das", "und", "ist", "von", "zu", "mit", "den", "ein"),
    "fr": ("le", "la", "les", "et", "de", "un", "une", "est", "pour", "que"),
    "es": ("el", "la", "los", "las", "y", "de", "un", "una", "es", "para"),
    "zh": ("的", "了", "是", "我", "不", "在", "有", "这", "他", "们"),
}


def token_count(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(words(text))


def regex_token_count(text: Column) -> Column:
    """BPE-ish alphanumeric-run token count."""
    return F.size(F.regexp_extract_all(text, F.lit("[A-Za-z0-9]+"), F.lit(0)))


def _ratio_milli(num: Column, den: Column) -> Column:
    """Integer-over-integer ratio in exact milli-units (engine-portable)."""
    return F.round(num * 1000.0 / F.greatest(den, F.lit(1))).cast("long")


def quality_metrics(df: DataFrame, text_col: str) -> DataFrame:
    """Per-document quality signals: char/word counts, alpha/digit/space
    ratios (milli-units), mean word length (centi-chars), stopword ratio.

    Ratio outputs are integer units so any engine reproduces them exactly.
    """
    text = F.col(text_col)
    n_chars = F.length(text)
    w = words(text)
    n_words = F.size(w)
    alpha = F.length(F.regexp_replace(text, "[^A-Za-z]", ""))
    digit = F.length(F.regexp_replace(text, "[^0-9]", ""))
    space = F.length(F.regexp_replace(text, "[^ ]", ""))
    sw = F.array([F.lit(s) for s in STOPWORDS["en"]])
    n_stop = F.size(F.filter(w, lambda x: F.array_contains(sw, F.lower(x))))
    total_word_chars = F.aggregate(w, F.lit(0), lambda acc, x: acc + F.length(x))
    return df.select(
        "*",
        n_chars.alias("n_chars_q"),
        n_words.alias("n_words"),
        _ratio_milli(alpha, n_chars).alias("alpha_milli"),
        _ratio_milli(digit, n_chars).alias("digit_milli"),
        _ratio_milli(space, n_chars).alias("space_milli"),
        _ratio_milli(n_stop, n_words).alias("stopword_milli"),
        F.round(total_word_chars * 100.0 / F.greatest(n_words, F.lit(1)))
        .cast("long").alias("word_len_centi"),
    )


def language_id(df: DataFrame, text_col: str,
                out_col: str = "lang_pred") -> DataFrame:
    """Stopword-overlap language ID: per language, count tokens in its
    stopword set; argmax with deterministic order, 'und' when no evidence."""
    w = words(F.col(text_col))

    def in_set(sw):
        return lambda x: F.array_contains(sw, F.lower(x))

    scores = {}
    for lang, stops in STOPWORDS.items():
        sw = F.array([F.lit(s) for s in stops])
        scores[lang] = F.size(F.filter(w, in_set(sw)))
    langs = sorted(STOPWORDS)  # deterministic tie-break: alphabetical
    best = F.lit("und")
    best_score = F.lit(0)
    for lang in langs:
        s = scores[lang]
        take = (s > best_score)
        best = F.when(take, F.lit(lang)).otherwise(best)
        best_score = F.when(take, s).otherwise(best_score)
    return df.withColumn(out_col, best)


def fingerprint(df: DataFrame, text_col: str, id_col: str,
                n: int = 3) -> DataFrame:
    """Document fingerprints: full-content md5 (portable) + the minimum
    shingle md5 (a 1-hash minhash — stable under reordering of shingles)."""
    from ..functions.texts import word_shingles

    sh = word_shingles(F.col(text_col), n)
    min_sh = F.array_min(F.transform(sh, lambda s: F.md5(s)))
    return df.select(F.col(id_col),
                     F.md5(F.col(text_col)).alias("content_md5"),
                     min_sh.alias("min_shingle_md5"))


def repetition_metrics(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Gopher-style repetition signals per document: distinct-word
    fraction, top-word share, duplicate-2-gram fraction (all exact
    integer milli-units via floor — floor of an identically-computed IEEE
    double is engine-portable where round() is not).

    Shape at scale: two explode → two-level groupBy passes (word counts,
    bigram counts) + one join on the doc id. Everything stays in codegen;
    docs with zero words drop out (no tokens → no signal).
    Output: id, n_words, distinct_milli, topword_milli, dup2gram_milli.
    """
    did = F.col(id_col)
    w = words(F.col(text_col))
    word_stats = (df.select(did.alias("__id"), F.explode(w).alias("word"))
                  .groupBy("__id", "word")
                  .agg(F.count(F.lit(1)).alias("c"))
                  .groupBy("__id")
                  .agg(F.sum("c").alias("n_words"),
                       F.count(F.lit(1)).alias("n_distinct"),
                       F.max("c").alias("top_c")))
    # raw (non-distinct) bigrams — duplicates are the signal here, so this
    # uses word_ngrams_raw, not word_shingles (which de-dups)
    bg = word_ngrams_raw(F.col(text_col), 2)
    bg_stats = (df.select(did.alias("__id"), F.explode(bg).alias("bg"))
                .groupBy("__id", "bg")
                .agg(F.count(F.lit(1)).alias("c"))
                .groupBy("__id")
                .agg(F.sum("c").alias("total2"),
                     F.count(F.lit(1)).alias("distinct2")))
    out = (word_stats.join(bg_stats, "__id", "left")
           .select(F.col("__id").alias(id_col), "n_words",
                   F.floor(F.col("n_distinct") * 1000.0 / F.col("n_words"))
                   .alias("distinct_milli"),
                   F.floor(F.col("top_c") * 1000.0 / F.col("n_words"))
                   .alias("topword_milli"),
                   F.floor((F.coalesce(F.col("total2"), F.lit(0))
                            - F.coalesce(F.col("distinct2"), F.lit(0))) * 1000.0
                           / F.greatest(F.coalesce(F.col("total2"), F.lit(0)),
                                        F.lit(1)))
                   .alias("dup2gram_milli")))
    return out


def gopher_quality_rules(df: DataFrame, text_col: str, id_col: str,
                         min_words: int = 20, max_words: int = 100_000,
                         min_word_len_centi: int = 300,
                         max_word_len_centi: int = 1_000,
                         min_alpha_milli: int = 600,
                         min_stopword_hits: int = 2) -> DataFrame:
    """Composite Gopher-rules quality filter: word-count bounds, mean word
    length bounds, alphabetic-character fraction, minimum stopword hits.
    Emits one boolean per rule plus the conjunction (`keep`) so a corpus
    report can attribute rejections — one codegen'd scan at any scale.
    """
    text = F.col(text_col)
    w = words(text)
    n_words = F.size(w)
    total_word_chars = F.aggregate(w, F.lit(0), lambda acc, x: acc + F.length(x))
    word_len_centi = F.floor(total_word_chars * 100.0
                             / F.greatest(n_words, F.lit(1)))
    alpha_milli = F.floor(F.length(F.regexp_replace(text, "[^A-Za-z]", ""))
                          * 1000.0 / F.greatest(F.length(text), F.lit(1)))
    sw = F.array([F.lit(s) for s in STOPWORDS["en"]])
    stop_hits = F.size(F.filter(w, lambda x: F.array_contains(sw, F.lower(x))))
    p_count = n_words.between(min_words, max_words)
    p_len = word_len_centi.between(min_word_len_centi, max_word_len_centi)
    p_alpha = alpha_milli >= min_alpha_milli
    p_stop = stop_hits >= min_stopword_hits
    return df.select(
        F.col(id_col),
        p_count.alias("pass_word_count"),
        p_len.alias("pass_word_len"),
        p_alpha.alias("pass_alpha"),
        p_stop.alias("pass_stopwords"),
        (p_count & p_len & p_alpha & p_stop).alias("keep"))


def clean_text(df: DataFrame, text_col: str,
               out_col: str = "text_clean") -> DataFrame:
    """Normalization pass for training corpora: lowercase, strip
    non-printable/control chars, collapse whitespace runs, trim."""
    t = F.col(text_col)
    t = F.lower(t)
    t = F.regexp_replace(t, "[\\x00-\\x1f\\x7f]", " ")
    t = F.regexp_replace(t, "\\s+", " ")
    return df.withColumn(out_col, F.trim(t))


def mask_pii(df: DataFrame, text_col: str,
             out_col: str = "text_masked") -> DataFrame:
    """PII masking for training corpora: emails and long digit runs
    (phone/account numbers) replaced with typed tokens. Patterns are
    intentionally simple-and-portable (same semantics in Java regex and
    RE2-family engines)."""
    t = F.col(text_col)
    t = F.regexp_replace(t, "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
                         "<EMAIL>")
    t = F.regexp_replace(t, "[0-9][0-9 ()+-]{7,}[0-9]", "<PHONE>")
    return df.withColumn(out_col, t)


def train_test_split(df: DataFrame, id_col: str, test_permille: int = 200,
                     salt: str = "split") -> DataFrame:
    """Deterministic, id-stable train/test assignment: bucket by md5 of the
    (salted) id — stable across runs/engines/cluster sizes, unlike
    rand()-based sampling. Output column `split` ∈ {train, test}."""
    bucket = F.conv(F.substring(F.md5(F.concat(F.col(id_col).cast("string"),
                                               F.lit(salt))), 1, 6), 16, 10) \
        .cast("long") % 1000
    return df.withColumn(
        "split", F.when(bucket < test_permille, "test").otherwise("train"))
