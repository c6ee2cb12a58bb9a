"""Gopher repetition/quality rules: Spark vs pure-python oracle parity,
filter semantics, and randomized-text property coverage."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from feature_extraction_spark.oracle import kernels as ok
from feature_extraction_spark.ops.gopher import (
    GOPHER_THRESHOLDS,
    gopher_filter,
    with_gopher_quality,
    with_repetition_features,
)

FEATS = [
    "gq_n_words",
    "gq_total_chars",
    "mean_word_len",
    "dup_line_frac",
    "dup_line_char_frac",
    "dup_para_frac",
    "dup_para_char_frac",
    "bullet_line_frac",
    "ellipsis_line_frac",
    "symbol_word_ratio",
    "alpha_word_frac",
    "stopword_hits",
    "top_2gram_char_frac",
    "top_3gram_char_frac",
    "top_4gram_char_frac",
    "dup_5gram_char_frac",
    "dup_6gram_char_frac",
    "dup_7gram_char_frac",
    "dup_8gram_char_frac",
    "dup_9gram_char_frac",
    "dup_10gram_char_frac",
]

DOCS = [
    (0, "the cat sat on the mat and that dog is fine to be here with us"),
    (1, "spam spam spam spam spam spam spam spam spam spam"),
    (2, None),
    (3, ""),
    (4, "   \n  \n\n\t "),
    (5, "line one\nline one\nline two\n- bullet a\n* bullet b\nwait for it..."),
    (
        6,
        "para one has words\n\npara one has words\n\npara two is different\n"
        "• third line bullet\nnormal tail line…",
    ),
    (7, "a b c d e f g h i j " * 10),
    (8, "### #hashtag wall ### ... more ... dots …"),
    (9, "12345 67890 !!! ??? ***"),
    (
        10,
        "the quick brown fox jumps over a lazy dog while we have been keen "
        "to walk of and that many various other things would simply be "
        "narrated with plenty of distinct useful regular normal everyday "
        "words providing enough length and variety for every single rule "
        "to pass here today because this document contains fifty plus "
        "words easily and remains clean",
    ),
    (11, "one two one two one two one two one two one two one two"),
]


@pytest.fixture(scope="module")
def gq(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    return with_gopher_quality(df).toPandas().set_index("doc_id")


def test_gopher_parity(gq):
    for doc_id, text in DOCS:
        exp = ok.gopher_stats(text)
        row = gq.loc[doc_id]
        for f in FEATS:
            assert np.allclose(float(row[f]), exp[f], equal_nan=True), (
                f"doc {doc_id} {f}: spark={row[f]} oracle={exp[f]}"
            )


def test_gopher_rows_preserved(gq):
    # NULL/empty/whitespace docs keep their (NaN) rows — they never vanish
    assert sorted(gq.index) == sorted(d for d, _ in DOCS)
    for d in (2, 3, 4):
        assert np.isnan(gq.loc[d, "mean_word_len"])
        assert not gq.loc[d, "gopher_keep"]


def test_gopher_keep_matches_thresholds(gq):
    t = GOPHER_THRESHOLDS
    for doc_id, text in DOCS:
        exp = ok.gopher_stats(text)
        fails = []

        def bad_hi(name):
            v = exp[name]
            return v != v or v > t[name]

        for name in FEATS:
            if name.startswith(("dup_", "top_")) and bad_hi(name):
                fails.append(name)
        nw = exp["gq_n_words"]
        if nw < t["min_words"] or nw > t["max_words"]:
            fails.append("word_count")
        mwl = exp["mean_word_len"]
        if mwl != mwl or mwl < t["min_mean_word_len"] or mwl > t["max_mean_word_len"]:
            fails.append("mean_word_len")
        for stat, key, kind in [
            ("symbol_word_ratio", "max_symbol_word_ratio", "hi"),
            ("bullet_line_frac", "max_bullet_line_frac", "hi"),
            ("ellipsis_line_frac", "max_ellipsis_line_frac", "hi"),
            ("alpha_word_frac", "min_alpha_word_frac", "lo"),
        ]:
            v = exp[stat]
            if v != v or (kind == "hi" and v > t[key]) or (kind == "lo" and v < t[key]):
                fails.append(stat)
        if exp["stopword_hits"] < t["min_stopword_hits"]:
            fails.append("stopword_hits")
        row = gq.loc[doc_id]
        assert bool(row["gopher_keep"]) == (not fails), (
            f"doc {doc_id}: spark flags {list(row['gopher_flags'])} "
            f"oracle fails {fails}"
        )
        assert sorted(row["gopher_flags"]) == sorted(fails), (
            f"doc {doc_id}: {sorted(row['gopher_flags'])} != {sorted(fails)}"
        )


def test_gopher_clean_doc_passes(gq):
    assert bool(gq.loc[10, "gopher_keep"]), list(gq.loc[10, "gopher_flags"])


def test_gopher_filter_preserves_schema(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    out = gopher_filter(df)
    assert out.columns == df.columns
    kept = {r.doc_id for r in out.collect()}
    assert kept == {10}


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.sampled_from(list("ab c\nd.#-*…the ")),
            min_size=0,
            max_size=80,
        ),
        min_size=1,
        max_size=6,
    )
)
def test_gopher_property_random_texts(spark, texts):
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = with_repetition_features(df).toPandas().set_index("doc_id")
    for i, text in enumerate(texts):
        exp = ok.gopher_stats(text)
        for f in FEATS:
            assert np.allclose(float(got.loc[i, f]), exp[f], equal_nan=True), (
                f"text={text!r} {f}: spark={got.loc[i, f]} oracle={exp[f]}"
            )
