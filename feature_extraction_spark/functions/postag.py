"""Deterministic rule-based Penn-Treebank-ish POS tagger.

The reference uses nltk.pos_tag (text_features/extract_pos.py:94), which is
not available in this environment. This tagger is the engine's documented
deviation: a pure function of the word (closed-class lexicons + suffix
rules), implemented three ways with IDENTICAL semantics:
  1. ``penn_tag_expr`` — a native Spark Column expression (codegen, no UDF),
  2. ``penn_tag`` — plain Python (test oracle),
  3. the DuckDB CASE expression in __spark_entry__.oracle_sql.

Tag inventory (enough for extract_pos.py:17-54's class mapping):
DT IN TO CC PRP PRP$ WDT WRB WP WP$ UH RB MD VB VBG VBD VBZ JJ CD NNP NN.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DETERMINERS = ["the", "a", "an", "this", "that", "these", "those", "each",
               "every", "some", "any", "no", "all", "both"]
PREPOSITIONS = ["in", "on", "at", "by", "for", "with", "about", "against",
                "between", "into", "through", "during", "before", "after",
                "above", "below", "from", "up", "down", "of", "off", "over",
                "under", "if", "because", "while", "than", "as"]
CONJUNCTIONS = ["and", "but", "or", "nor", "so", "yet"]
PRONOUNS = ["i", "you", "he", "she", "it", "we", "they", "me", "him", "her",
            "us", "them", "myself", "yourself", "himself", "herself",
            "itself", "ourselves", "themselves"]
POSS_PRONOUNS = ["my", "your", "his", "its", "our", "their", "mine",
                 "yours", "hers", "ours", "theirs"]
INTERJECTIONS = ["um", "uh", "oh", "ah", "hmm", "yeah", "okay", "wow",
                 "hey", "ouch", "oops", "huh"]
WH_DET = ["which", "whatever", "whichever"]
WH_ADV = ["when", "where", "why", "how"]
WH_P = ["who", "whom", "what"]
WH_PS = ["whose"]
MODALS = ["can", "could", "may", "might", "must", "shall", "should",
          "will", "would", "can't", "won't", "couldn't", "wouldn't",
          "shouldn't"]
COMMON_VERBS = ["be", "am", "is", "are", "was", "were", "been", "being",
                "have", "has", "had", "do", "does", "did", "go", "goes",
                "went", "know", "think", "want", "get", "got", "like",
                "make", "say", "said", "see", "don't", "can't", "it's",
                "i'm", "we're", "isn't", "aren't", "didn't", "doesn't"]
ADVERBS = ["not", "very", "really", "just", "too", "also", "then", "there",
           "here", "now", "probably", "maybe", "well", "never", "always",
           "often", "again", "still"]


def penn_tag(word: str) -> str:
    """Python mirror of penn_tag_expr (identical rule order)."""
    w = word.lower().rstrip(".,!?;:")
    if w == "":
        return "NN"
    if w in DETERMINERS:
        return "DT"
    if w in CONJUNCTIONS:
        return "CC"
    if w in PRONOUNS:
        return "PRP"
    if w in POSS_PRONOUNS:
        return "PRP$"
    if w in WH_DET:
        return "WDT"
    if w in WH_ADV:
        return "WRB"
    if w in WH_P:
        return "WP"
    if w in WH_PS:
        return "WP$"
    if w in INTERJECTIONS:
        return "UH"
    if w in MODALS:
        return "MD"
    if w in COMMON_VERBS:
        return "VB"
    if w == "to":
        return "TO"
    if w in PREPOSITIONS:
        return "IN"
    if w in ADVERBS or w.endswith("ly"):
        return "RB"
    if w and w[0].isdigit():
        return "CD"
    if w.endswith("ing"):
        return "VBG"
    if w.endswith("ed"):
        return "VBD"
    if w.endswith(("ous", "ful", "able", "ible", "ive", "al", "ic")):
        return "JJ"
    if word[:1].isupper():
        return "NNP"
    return "NN"


def _in(w: Column, words: list[str]) -> Column:
    return w.isin(words)


def penn_tag_expr(word: Column) -> Column:
    """Native Column version — MUST stay rule-for-rule identical to
    ``penn_tag`` above."""
    w = F.regexp_replace(F.lower(word), r"[.,!?;:]+$", "")
    first_char = F.substring(word, 1, 1)
    return (
        F.when(w == "", F.lit("NN"))
        .when(_in(w, DETERMINERS), "DT")
        .when(_in(w, CONJUNCTIONS), "CC")
        .when(_in(w, PRONOUNS), "PRP")
        .when(_in(w, POSS_PRONOUNS), "PRP$")
        .when(_in(w, WH_DET), "WDT")
        .when(_in(w, WH_ADV), "WRB")
        .when(_in(w, WH_P), "WP")
        .when(_in(w, WH_PS), "WP$")
        .when(_in(w, INTERJECTIONS), "UH")
        .when(_in(w, MODALS), "MD")
        .when(_in(w, COMMON_VERBS), "VB")
        .when(w == "to", "TO")
        .when(_in(w, PREPOSITIONS), "IN")
        .when(_in(w, ADVERBS) | w.endswith("ly"), "RB")
        .when(F.substring(w, 1, 1).rlike("[0-9]"), "CD")
        .when(w.endswith("ing"), "VBG")
        .when(w.endswith("ed"), "VBD")
        .when(
            w.endswith("ous") | w.endswith("ful") | w.endswith("able")
            | w.endswith("ible") | w.endswith("ive") | w.endswith("al")
            | w.endswith("ic"),
            "JJ",
        )
        .when(first_char.rlike("[A-Z]"), "NNP")
        .otherwise("NN")
    )


def lemmatize_simple(word: str) -> str:
    """Deterministic suffix lemmatizer (documented deviation from WordNet,
    reference text_util.py:36-47). Mirrored natively in ops/graph.py."""
    w = word
    lw = w.lower()
    if len(lw) > 4 and lw.endswith("ies"):
        return w[:-3] + "y"
    if len(lw) > 3 and lw.endswith("sses"):
        return w[:-2]
    if len(lw) > 3 and lw.endswith("s") and not lw.endswith(("ss", "us", "is")):
        return w[:-1]
    return w
