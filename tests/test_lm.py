"""N-gram LM training + perplexity scoring: Spark vs pure-python oracle
parity, empty-doc NaN semantics, filter behavior, and held-out scoring."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from feature_extraction_spark.oracle import kernels as ok
from feature_extraction_spark.ops.lm import (
    perplexity_filter,
    train_bigram_lm,
    with_perplexity,
)

DOCS = [
    (0, "the cat sat on the mat"),
    (1, "the cat sat on the cat"),
    (2, "a completely different sentence here"),
    (3, None),
    (4, ""),
    (5, "   \n\t  "),
    (6, "the the the the the"),
    (7, "one"),
    (8, "The CAT sat"),  # case folding: shares mass with docs 0/1
    (9, "unseen tokens only zzz qqq"),
]


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


@pytest.fixture(scope="module")
def scored(corpus):
    lm = train_bigram_lm(corpus, k=0.1)
    return (
        with_perplexity(corpus, lm)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )


def test_lm_self_scoring_parity(scored):
    texts = [t for _, t in DOCS]
    exp = ok.bigram_perplexity(texts, texts, k=0.1)
    for i, (doc_id, _) in enumerate(DOCS):
        got = float(scored.loc[doc_id, "log_ppl"])
        assert np.allclose(got, exp[i], equal_nan=True), (
            f"doc {doc_id}: spark={got} oracle={exp[i]}"
        )
        ppl = float(scored.loc[doc_id, "ppl"])
        want = math.exp(exp[i]) if exp[i] == exp[i] else float("nan")
        assert np.allclose(ppl, want, equal_nan=True)


def test_lm_rows_preserved_and_empty_nan(scored):
    # every input row keeps its output row; degenerate docs score NaN
    assert sorted(scored.index) == sorted(d for d, _ in DOCS)
    for d in (3, 4, 5):
        assert np.isnan(scored.loc[d, "log_ppl"])
        assert np.isnan(scored.loc[d, "ppl"])


def test_lm_repetitive_doc_scores_lower(scored):
    # "the the the ..." self-trains high bigram mass -> lower ppl than the
    # all-unseen doc
    assert scored.loc[6, "ppl"] < scored.loc[9, "ppl"]


def test_lm_held_out_scoring(spark, corpus):
    """Model trained on one corpus scores a disjoint one; unseen-only docs
    get finite (smoothed) perplexity."""
    lm = train_bigram_lm(corpus, k=0.5)
    test_docs = [(100, "the cat sat"), (101, "totally novel words"), (102, None)]
    test_df = spark.createDataFrame(test_docs, "doc_id long, text string")
    got = with_perplexity(test_df, lm)
    pd_got = got.toPandas().set_index("doc_id").sort_index()
    exp = ok.bigram_perplexity(
        [t for _, t in DOCS], [t for _, t in test_docs], k=0.5
    )
    for i, (doc_id, _) in enumerate(test_docs):
        assert np.allclose(
            float(pd_got.loc[doc_id, "log_ppl"]), exp[i], equal_nan=True
        ), f"doc {doc_id}"
    # seen text must beat unseen text under the trained model
    assert pd_got.loc[100, "ppl"] < pd_got.loc[101, "ppl"]


def test_lm_stats(corpus):
    lm = train_bigram_lm(corpus, k=0.1)
    row = lm.stats().collect()[0]
    texts = [t for _, t in DOCS]
    toks = [w for t in texts for w in (t or "").lower().split() if w]
    assert row.t_tokens == len(toks)
    assert row.v_vocab == len(set(toks))


def test_perplexity_filter_schema_and_semantics(corpus):
    lm = train_bigram_lm(corpus, k=0.1)
    scored = with_perplexity(corpus, lm).toPandas().set_index("doc_id")
    finite = scored[~scored["ppl"].isna()]
    # cut strictly BETWEEN two docs' scores, never equal to one: ppl sums
    # are summation-order-dependent at the ulp, so a cut equal to a doc's
    # own ppl (e.g. the odd-count median) makes that doc's membership flip
    # with partition order — observed as rare suite-order flakiness
    vals = sorted(set(finite["ppl"]))
    mid = len(vals) // 2
    cut = (vals[mid - 1] + vals[mid]) / 2.0
    kept = perplexity_filter(corpus, lm, max_ppl=cut)
    assert kept.columns == corpus.columns
    kept_ids = {r.doc_id for r in kept.collect()}
    want = {int(d) for d, v in finite["ppl"].items() if v <= cut}
    assert kept_ids == want
    # NaN docs are always dropped
    assert kept_ids.isdisjoint({3, 4, 5})


def test_lm_no_python_udfs(corpus):
    """Training and scoring must stay JVM-side: no BatchEvalPython /
    ArrowEvalPython nodes in the plan."""
    lm = train_bigram_lm(corpus)
    plan = with_perplexity(corpus, lm)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_unsmoothed_unseen_bigram_gives_inf_not_silent_skip(spark, corpus):
    # Regression: with k=0, log(0) is NULL in non-ANSI Spark and F.sum
    # SKIPS NULL rows — an unseen bigram silently vanished from the
    # log-prob sum, UNDERESTIMATING ppl. Pinned semantics: P=0 -> -inf
    # log-prob -> ppl = +inf -> every perplexity_filter cut drops the doc.
    lm = train_bigram_lm(corpus, k=0.0)
    held = spark.createDataFrame(
        [(100, "the cat sat"), (101, "cat the zzz")], "doc_id long, text string"
    )
    out = {r.doc_id: r.ppl for r in with_perplexity(held, lm).collect()}
    assert math.isfinite(out[100])  # fully in-model word sequence
    assert math.isinf(out[101])  # contains a zero-probability transition
    kept = perplexity_filter(held, lm, max_ppl=1e18)
    assert {r.doc_id for r in kept.collect()} == {100}


def test_npmi_degenerate_single_pair_is_one(spark):
    """One pair holding ALL bigram mass makes -ln(p12) exactly 0; the
    guarded npmi returns the perfect-association limit 1.0 (Bouma 2009)
    instead of NULL / an ANSI division error."""
    from feature_extraction_spark.ops.lm import pmi_collocations

    df = spark.createDataFrame(
        [(1, "hello world"), (2, "hello world")], "doc_id bigint, text string"
    )
    out = pmi_collocations(df, min_count=1).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["w1"], r["w2"]) == ("hello", "world")
    assert r["pmi"] == 0.0 and r["npmi"] == 1.0


# ------------------------------------------------------------- phrases


def test_merge_phrases_greedy_python_parity(spark):
    from feature_extraction_spark.ops.lm import merge_phrases

    rows = [
        (0, "new york city is in new york state"),
        (1, "a a a a a"),            # overlap chain: greedy pairs
        (2, ""),
        (3, None),
        (4, "new york"),
        (5, "b new york new york b a a"),
        (6, "one token"),
    ]
    P = [("new", "york"), ("a", "a"), ("york", "new")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["text_phrased"], r["n_tokens"], r["n_tokens_phrased"])
        for r in merge_phrases(df, P).collect()
    }

    def greedy(toks):
        s, o, i = set(P), [], 0
        while i < len(toks):
            if i + 1 < len(toks) and (toks[i], toks[i + 1]) in s:
                o.append(toks[i] + "_" + toks[i + 1])
                i += 2
            else:
                o.append(toks[i])
                i += 1
        return o

    for i, t in rows:
        toks = (t or "").lower().split()
        exp = greedy(toks)
        assert got[i] == (" ".join(exp), len(toks), len(exp)), i
    # the chain case pins NON-OVERLAPPING semantics: 5 a's -> a_a a_a a
    assert got[1][0] == "a_a a_a a"


def test_train_phrases_gensim_scorer_parity(spark):
    from collections import Counter

    from feature_extraction_spark.ops.lm import train_phrases

    texts = [
        "the quick fox likes new york",
        "new york is big and new york is loud",
        "the slow fox avoids new york",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        (r["w1"], r["w2"]): (r["c12"], r["c1"], r["c2"], r["score"])
        for r in train_phrases(df, min_count=2, threshold=0.0).collect()
    }
    toks = [t.lower().split() for t in texts]
    uni = Counter(w for ts in toks for w in ts)
    bi = Counter((ts[i], ts[i + 1]) for ts in toks for i in range(len(ts) - 1))
    V = float(len(uni))
    exp = {}
    for (a, b), c12 in bi.items():
        if c12 >= 2:
            score = ((c12 - 2) * V) / (uni[a] * float(uni[b]))
            if score > 0.0:
                exp[(a, b)] = (c12, uni[a], uni[b], score)
    assert got == exp
    assert ("new", "york") in got  # 4 occurrences -> positive score


def test_merge_phrases_map_only_plan(spark, tmp_path):
    from feature_extraction_spark.ops.lm import merge_phrases

    df = spark.createDataFrame(
        [(i, "new york is new york") for i in range(20)],
        "doc_id long, text string",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "d"))
    out = merge_phrases(
        spark.read.parquet(str(tmp_path / "d")), [("new", "york")]
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan  # literal phrase table: zero shuffle
