"""Text preprocessing ops (reference: archived/preprocess_text.py:7-32 and
text_features/text_util.py).

- remove_nonverbal_tokens: drop '[noise]'/'[laughter]'/'<unk>' tokens and
  then rows whose token list emptied (P5).
- remove_stopwords: array_except against a broadcast stopword list (P8).
- strip punctuation (keep apostrophes) / lowercase / sentence split (F2-F4);
  sentence split is a regex approximation of NLTK punkt (punkt unavailable —
  documented deviation).

All native array/regex expressions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from feature_extraction_spark.functions.text import strip_punct_expr, tokenize_expr

NONVERBAL_TOKENS = ["[noise]", "[laughter]", "<unk>"]


def remove_nonverbal_tokens(
    df: DataFrame, text_col: str = "text", drop_empty: bool = True
) -> DataFrame:
    """Remove non-verbal tokens from each turn's text; optionally drop turns
    that become empty (reference preprocess_text.py:20-32)."""
    toks = F.filter(
        tokenize_expr(F.col(text_col)),
        lambda t: (~t.isin(NONVERBAL_TOKENS)) & (t != ""),
    )
    out = df.withColumn(text_col, F.concat_ws(" ", toks))
    if drop_empty:
        out = out.filter(F.size(toks) > 0)
    return out


def remove_stopwords(
    df: DataFrame, stopwords: list[str], text_col: str = "text"
) -> DataFrame:
    """Drop stopwords (case-insensitive membership, reference
    preprocess_text.py:7-17)."""
    sw = [w.lower() for w in stopwords]
    toks = F.filter(
        tokenize_expr(F.col(text_col)),
        lambda t: (~F.lower(t).isin(sw)) & (t != ""),
    )
    return df.withColumn(text_col, F.concat_ws(" ", toks))


def sentence_split_expr(col: Column) -> Column:
    """Sentence boundaries at [.!?]+ followed by whitespace — regex
    approximation of punkt (text_util.py:96-101, documented deviation)."""
    return F.filter(
        F.split(col, r"(?<=[.!?])\s+", -1), lambda s: F.length(F.trim(s)) > 0
    )


def filter_groups_by_min_words(
    df: DataFrame,
    level: str = "conv",
    min_words: int = 10,
    text_col: str = "text",
) -> DataFrame:
    """P9 group-threshold filter (reference
    archived/train_topic_model.py:54-56): keep only entities with at least
    ``min_words`` non-empty tokens — a HAVING, expressed as a semi-join so
    the turn grain is preserved."""
    from feature_extraction_spark.ops.levels import keys_for

    keys = keys_for(level)
    toks = F.filter(tokenize_expr(F.col(text_col)), lambda t: t != "")
    counts = df.groupBy(*keys).agg(F.sum(F.size(toks)).alias("_n"))
    keep = counts.filter(F.col("_n") >= min_words).select(*keys)
    return df.join(keep, on=keys, how="left_semi")


def basic_clean(df: DataFrame, text_col: str = "text") -> DataFrame:
    """text_basic variant: lowercase + punctuation strip keeping apostrophes
    (reference text_util.py:104-109 + extract_text_features text_basic)."""
    return df.withColumn(
        f"{text_col}_basic", F.lower(strip_punct_expr(F.col(text_col)))
    )


def vocab_document_frequency(
    df: DataFrame,
    doc_col: str = "conv_id",
    text_col: str = "text",
) -> DataFrame:
    """(word, df) document frequencies over distinct words per document —
    the input to A11's vocabulary filter (reference analog: gensim
    Dictionary.filter_extremes inside archived/train_topic_model.py; here a
    first-class distributed op). One explode + one hash aggregation."""
    words = F.array_distinct(
        F.filter(tokenize_expr(F.col(text_col)), lambda w: w != "")
    )
    return (
        df.select(F.col(doc_col).alias("_doc"), F.explode(words).alias("word"))
        .groupBy("word")
        .agg(F.count_distinct("_doc").alias("df"))
    )


def df_vocab_filter(
    df: DataFrame,
    min_df: int = 2,
    max_df_frac: float = 0.5,
    doc_col: str = "conv_id",
    text_col: str = "text",
) -> DataFrame:
    """A11 document-frequency vocabulary filter: keep words appearing in at
    least ``min_df`` documents and at most ``max_df_frac`` of all documents
    (too-rare words are noise, too-common words are stop-like). Returns the
    kept vocabulary (word, df).

    Scale shape: the vocab is a hash aggregation keyed by word (map-side
    combinable); callers prune token streams against it with a broadcast
    semi-join (vocabularies are small relative to corpora) — no second scan
    of the text. The denominator count below is a deliberate extra job, but
    a column-pruned one: it scans ONLY ``doc_col`` (empty documents must
    count toward the denominator, so it cannot be derived from the token
    stream, which drops them)."""
    n_docs = df.select(F.count_distinct(F.col(doc_col)).alias("n")).collect()[0]["n"]
    vocab = vocab_document_frequency(df, doc_col, text_col)
    return vocab.filter(
        (F.col("df") >= min_df) & (F.col("df") <= float(max_df_frac) * n_docs)
    )


def filter_tokens_by_vocab(
    df: DataFrame,
    vocab: DataFrame,
    doc_col: str = "conv_id",
    text_col: str = "text",
    out_col: str = "tokens_kept",
) -> DataFrame:
    """Prune each document's token stream to the kept vocabulary, keeping
    token order. ``df`` must have one row per ``doc_col`` value (document
    grain).

    Scale shape: posexplode -> broadcast LEFT SEMI join on the word (the
    filtered vocab is small next to the corpus; per-token membership is a
    hash probe, not an O(|vocab|) array scan) -> regroup in position order
    with one shuffle keyed by the document id."""
    toks = df.select(
        F.col(doc_col).alias("_doc"),
        F.posexplode(
            F.filter(tokenize_expr(F.col(text_col)), lambda w: w != "")
        ).alias("pos", "word"),
    )
    kept = toks.join(F.broadcast(vocab.select("word")), on="word", how="left_semi")
    regrouped = kept.groupBy("_doc").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("pos", "word"))),
            lambda s: s["word"],
        ).alias(out_col)
    )
    out = df.join(
        regrouped, on=df[doc_col] == regrouped["_doc"], how="left"
    ).drop("_doc")
    return out.withColumn(
        out_col, F.coalesce(F.col(out_col), F.array().cast("array<string>"))
    )
