"""Distributional truecasing (U2).

The reference truecases every turn with ``truecase.get_true_case``
(text_features/extract_pos.py:91) — a pretrained English unigram casing
model. That package (and any pretrained model) is unavailable in this
offline sandbox, so this module implements the same mechanism the library
is built on — tRuEcasIng's unigram backbone (Lita et al. 2003): learn the
most frequent surface casing of each token from a corpus, then rewrite
tokens to their majority form. Documented deviation: the casing
distribution is learned from the input corpus itself rather than from a
pretrained news-text model.

Learning skips sentence/turn-initial tokens — they are force-capitalized
by convention and would bias every word toward Titlecase.

Scale shape: learning is explode -> one hash aggregation (lword, form)
-> per-lword argmax via max_by (map-side combinable, deterministic
count-then-form tie-break); application is posexplode -> join on the
lowercased token (broadcast when the model is small) -> positional
regroup, one shuffle keyed by the row id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from feature_extraction_spark.functions.text import tokenize_expr


def learn_case_model(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 1,
) -> DataFrame:
    """(lword, form): majority surface casing per lowercased token.

    Deterministic: ties on count break toward the lexicographically
    smallest surface form. Tokens whose majority form is all-lowercase are
    kept too (they normalize stray mid-sentence capitals back down).

    Skipped observations: the turn-initial token AND any token following
    sentence-ending punctuation (.!?) — both are force-capitalized by
    convention; counting them would flip frequent sentence-openers
    ('the', 'he', ...) to a Titlecase majority corpus-wide."""
    words = F.filter(tokenize_expr(F.col(text_col)), lambda w: w != "")
    toks = (
        df.select(F.posexplode(words).alias("pos", "form"), words.alias("_w"))
        .filter(F.col("pos") > 0)  # turn-initial
        .withColumn("_prev", F.element_at("_w", F.col("pos")))  # pos is 0-based
        .filter(~F.col("_prev").rlike(r"[.!?]$"))  # sentence-initial
        .select("form")
    )
    counts = (
        toks.groupBy(F.lower(F.col("form")).alias("lword"), "form")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= min_count)
    )
    # argmax without a window pass: min_by over the key (-n, form) — the
    # minimum is the highest count, ties to the lexicographically smallest
    # form; a single map-side-combinable hash aggregation.
    return counts.groupBy("lword").agg(
        F.min_by("form", F.struct((-F.col("n")).alias("k"), F.col("form"))).alias(
            "form"
        )
    )


def apply_truecase(
    df: DataFrame,
    model: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "text_truecased",
    broadcast_model: bool = True,
) -> DataFrame:
    """Rewrite each token to the model's majority casing (unknown tokens
    pass through). ``df`` must have one row per ``id_col`` (document
    grain). Output column is the re-joined single-space text, preserving
    token positions (including empty tokens, which pass through)."""
    toks = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(tokenize_expr(F.col(text_col))).alias("pos", "form"),
    ).withColumn("lword", F.lower(F.col("form")))
    m = model.withColumnRenamed("form", "_tc")
    if broadcast_model:
        m = F.broadcast(m)
    joined = toks.join(m, on="lword", how="left").withColumn(
        "out_form", F.coalesce(F.col("_tc"), F.col("form"))
    )
    regrouped = joined.groupBy("_id").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "out_form"))),
                lambda s: s["out_form"],
            ),
        ).alias(out_col)
    )
    return df.join(
        regrouped, on=df[id_col] == regrouped["_id"], how="left"
    ).drop("_id")
