"""Text-analysis ops for large-scale training-data pipelines:
token counting, quality scoring, language ID, document fingerprinting.

All JVM-native expressions (regex + array algebra) — these run over every
document at 100 TB scale, so no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from feature_extraction_spark.functions.text import nan_guard_div

# BPE-ish pre-tokenization regex (public GPT-2 pattern family): word pieces,
# numbers, punctuation runs, whitespace-prefixed words.
BPE_ISH_RE = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+"

_STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "you", "that",
           "was", "for", "on", "are", "with", "as", "this", "have", "be"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "una", "es", "se",
           "no", "los", "las", "por", "con", "para", "como", "su"],
    "fr": ["le", "la", "de", "et", "un", "une", "est", "que", "les", "des",
           "en", "du", "il", "elle", "pour", "dans", "ce", "pas"],
    "de": ["der", "die", "das", "und", "ist", "ein", "eine", "zu", "den",
           "von", "mit", "nicht", "sich", "auf", "es", "ich", "auch"],
}


def _words(col: Column) -> Column:
    """Lowercased whitespace words, empties removed — the shared
    ws_tokens_expr tokenizer (single definition; analysis ops can never
    diverge from vocab/chunk token accounting) over lowered text."""
    from feature_extraction_spark.functions.text import ws_tokens_expr

    return ws_tokens_expr(F.lower(col))


def with_token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """n_words (whitespace) and n_tokens_bpe (BPE-ish regex pieces)."""
    c = F.col(text_col)
    return df.withColumn(
        "n_words", F.size(_words(c))
    ).withColumn(
        "n_tokens_bpe", F.size(F.regexp_extract_all(c, F.lit(BPE_ISH_RE), 0))
    )


def with_quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality features + a composite score in [0,1]:
    length, mean word length, punctuation ratio, stopword(en) ratio,
    uppercase ratio, repetition (distinct/total words)."""
    c = F.col(text_col)
    words = _words(c)
    n_chars = F.length(c)
    n_words = F.size(words)
    mean_wlen = nan_guard_div(
        F.aggregate(words, F.lit(0), lambda a, w: a + F.length(w)).cast("double"),
        n_words,
    )
    punct = F.length(F.regexp_replace(c, r"[^\p{Punct}]", ""))
    upper = F.length(F.regexp_replace(c, r"[^A-Z]", ""))
    sw = F.array(*[F.lit(w) for w in _STOPWORDS["en"]])
    stop_ratio = nan_guard_div(
        F.size(F.filter(words, lambda w: F.array_contains(sw, w))).cast("double"),
        n_words,
    )
    distinct_ratio = nan_guard_div(
        F.size(F.array_distinct(words)).cast("double"), n_words
    )
    df = (
        df.withColumn("q_n_chars", n_chars.cast("double"))
        .withColumn("q_n_words", n_words.cast("double"))
        .withColumn("q_mean_word_len", mean_wlen)
        .withColumn("q_punct_ratio", nan_guard_div(punct.cast("double"), n_chars))
        .withColumn("q_upper_ratio", nan_guard_div(upper.cast("double"), n_chars))
        .withColumn("q_stopword_ratio", stop_ratio)
        .withColumn("q_distinct_ratio", distinct_ratio)
    )
    # composite: reward stopword presence and moderate word length; punish
    # punctuation/upper spam and heavy repetition. Clamped to [0,1].
    # NaN ratios (empty / whitespace-only docs) must score ZERO credit:
    # Spark's `least` treats NaN as GREATER than any number, so an
    # unguarded least(NaN*3, 1.0) returns 1.0 — full credit for garbage.
    def _nan0(x):  # reward terms: NaN -> no credit
        return F.when(F.isnan(x), F.lit(0.0)).otherwise(x)

    def _nan1(x):  # penalty terms: NaN -> full penalty
        return F.when(F.isnan(x), F.lit(1.0)).otherwise(x)

    score = (
        F.lit(0.25) * F.least(_nan0(F.col("q_stopword_ratio")) * 3, F.lit(1.0))
        + F.lit(0.25)
        * F.least(_nan0(F.col("q_distinct_ratio")) * 1.25, F.lit(1.0))
        + F.lit(0.25)
        * (F.lit(1.0) - F.least(_nan1(F.col("q_punct_ratio")) * 4, F.lit(1.0)))
        + F.lit(0.25)
        * F.when((F.col("q_mean_word_len") >= 3) & (F.col("q_mean_word_len") <= 10), 1.0)
        .otherwise(0.0)
    )
    return df.withColumn("q_score", F.coalesce(score, F.lit(0.0)))


def with_lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-list language ID over {en,es,fr,de}: argmax of per-language
    stopword hit counts; 'und' (undetermined) when no hits."""
    words = _words(F.col(text_col))

    def hits_for(sws: list[str]):
        arr = F.array(*[F.lit(w) for w in sws])
        # single-parameter lambda: a defaulted 2nd param would be parsed as
        # the array index by Spark's HOF machinery
        return F.size(F.filter(words, lambda w: F.array_contains(arr, w)))

    scores = [
        F.struct(hits_for(sws).alias("hits"), F.lit(lang).alias("lang"))
        for lang, sws in _STOPWORDS.items()
    ]
    best = F.array_max(F.array(*scores))
    return df.withColumn(
        "lang_pred",
        F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und")),
    )


def normalized_text_expr(col: Column) -> Column:
    """Dedup normalization: lowercase, strip non-alphanumerics to spaces,
    collapse whitespace, trim."""
    c = F.lower(col)
    c = F.regexp_replace(c, r"[^a-z0-9]+", " ")
    return F.trim(c)


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic document fingerprint: md5 of the normalized text
    (portable across engines), plus a 64-bit xxhash for joins."""
    norm = normalized_text_expr(F.col(text_col))
    return df.withColumn("fingerprint_md5", F.md5(norm)).withColumn(
        "fingerprint_64", F.xxhash64(norm)
    )


# PII patterns deliberately stick to portable regex constructs (character
# classes + bounded quantifiers) so the Java (Spark) and RE2 (DuckDB
# oracle) engines match byte-for-byte.
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    # \b anchors (RE2-compatible, unlike lookarounds — the DuckDB oracle
    # runs the same pattern) stop partial redaction inside longer numeric
    # strings: 'build 10.20.30.4056' and 'v1.2.3.4-beta' are NOT IPs
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    ("ssn", r"[0-9]{3}-[0-9]{2}-[0-9]{4}", "<SSN>"),
    # the optional 4th segment requires its digits (a bare trailing
    # separator must not be swallowed into the redacted span)
    ("phone", r"\+?[0-9]{1,3}[-. ][0-9]{3}[-. ][0-9]{3,4}(?:[-. ][0-9]{1,4})?", "<PHONE>"),
]


def with_pii_scrub(
    df: DataFrame, text_col: str = "text", out_col: str = "text_scrubbed"
) -> DataFrame:
    """Redact common PII shapes (emails, IPv4, SSN-style ids, phone-ish
    numbers) with typed placeholder tokens — the standard pre-training
    scrub pass. A chain of native regexp_replace calls: JVM-side, codegen,
    no UDF. Order matters: email first (user@host is one span), and the
    greedy phone rule LAST so it cannot half-eat dotted IPv4s or
    ddd-dd-dddd ids."""
    col = F.col(text_col)
    for name, pat, repl in PII_PATTERNS:
        col = F.regexp_replace(col, pat, repl)
    return df.withColumn(out_col, col)
