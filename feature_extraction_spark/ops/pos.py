"""Part-of-speech feature pack (reference: text_features/extract_pos.py).

Semantics preserved exactly (with the documented rule-tagger substitution
for nltk, functions/postag.py):
- num_words counts tokens of the raw single-space split INCLUDING empty
  strings (reference :84-85 counts before the '' filter at :92-93);
- tags are computed over the ''-filtered words;
- Penn tag -> coarse class mapping with multi-increments (PRP -> NOUN+PNOUN,
  PRP$ -> PSNOUN+NOUN, W-words by 2nd letter; reference :17-54);
- ratios adj/v/n/pn/sc with NaN guards (:57-67);
- class counts converted to proportions of num_words (:99-101);
- truecase pass is an identity stub (truecase lib absent — deviation).

Fully native: one explode + one hash aggregation; the tagger is a CASE
expression inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from feature_extraction_spark.functions.postag import penn_tag_expr
from feature_extraction_spark.functions.text import nan_guard_div, tokenize_expr
from feature_extraction_spark.ops.levels import keys_for

POS_KEYS = ["ADJ", "VERB", "NOUN", "ADV", "DET", "INT", "PREP", "CC",
            "PNOUN", "PSNOUN"]


def _class_increments(tag):
    """Return dict class -> 0/1 Column increments for one tag
    (reference update_feature_vals, extract_pos.py:17-54)."""
    inc = {}
    second = F.substring(tag, 2, 1)
    inc["ADJ"] = tag.startswith("J")
    inc["VERB"] = tag.startswith("V")
    inc["ADV"] = tag.startswith("R") | (tag.startswith("W") & (second == "R"))
    inc["DET"] = tag.startswith("D") | (tag.startswith("W") & (second == "D"))
    inc["INT"] = tag.startswith("U")
    inc["PREP"] = tag.startswith("I") | tag.startswith("T")
    inc["CC"] = tag == "CC"
    w_p = tag.startswith("W") & (second != "D") & (second != "R") & tag.endswith("P")
    w_ps = (
        tag.startswith("W") & (second != "D") & (second != "R") & ~tag.endswith("P")
    )
    inc["PNOUN"] = (tag == "PRP") | w_p
    inc["PSNOUN"] = (tag == "PRP$") | w_ps
    inc["NOUN"] = (
        tag.startswith("N") | (tag == "PRP") | (tag == "PRP$") | w_p
    )
    return {k: v.cast("int") for k, v in inc.items()}


def pos_features(
    transcripts: DataFrame, level: str = "conv", text_col: str = "text"
) -> DataFrame:
    """One row per entity: POS-class proportions (ADJ..PSNOUN over num_words)
    + adj_ratio v_ratio n_ratio pn_ratio sc_ratio."""
    keys = keys_for(level)
    raw_words = tokenize_expr(F.col(text_col))
    words = F.filter(raw_words, lambda w: w != "")

    per_turn = transcripts.select(
        *keys,
        F.size(raw_words).alias("_nw"),  # INCLUDES '' tokens (reference :85)
        words.alias("_words"),
    )
    # tag materialized ONCE per word: inlining penn_tag_expr (a ~200-branch
    # CASE) into each of the 10 conditional sums re-evaluates the tagger
    # 10x per row and pushes the generated hashAgg past janino's 64 KB
    # method limit — whole-stage codegen silently falls back to interpreted
    # for the aggregation stage (observed in the sf0.01 driver run)
    word_rows = per_turn.select(
        *keys, "_nw", F.explode_outer("_words").alias("word")
    ).withColumn("_tag", penn_tag_expr(F.col("word")))
    inc = _class_increments(F.col("_tag"))

    agg = word_rows.groupBy(*keys).agg(
        *[
            F.sum(F.when(F.col("word").isNotNull(), inc[k]).otherwise(0)).alias(
                f"_c_{k}"
            )
            for k in POS_KEYS
        ],
    )
    # num_words aggregated at turn grain (explode_outer would overcount)
    nw = per_turn.groupBy(*keys).agg(F.sum("_nw").alias("_num_words"))
    out = agg.join(nw, on=keys, how="inner")

    c = {k: F.col(f"_c_{k}").cast("double") for k in POS_KEYS}
    out = (
        out.withColumn("adj_ratio", nan_guard_div(c["ADJ"], c["VERB"]))
        .withColumn("v_ratio", nan_guard_div(c["NOUN"], c["VERB"]))
        .withColumn("n_ratio", nan_guard_div(c["NOUN"], c["VERB"] + c["NOUN"]))
        .withColumn("pn_ratio", nan_guard_div(c["PNOUN"], c["NOUN"]))
        .withColumn("sc_ratio", nan_guard_div(c["PREP"], c["CC"]))
    )
    for k in POS_KEYS:
        # nan_guard, not bare division: an entity with zero words must get
        # NaN proportions (the library's null object), never NULL
        out = out.withColumn(
            k, nan_guard_div(c[k], F.col("_num_words"))
        ).drop(f"_c_{k}")
    return out.drop("_num_words")
