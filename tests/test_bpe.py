"""Distributed BPE training vs a pure-Python reference implementation of
the Sennrich et al. word-level merge algorithm: identical merge sequence,
identical final segmentations, deterministic ties, and apply-time
OOV/empty-doc conventions."""

from collections import Counter

import pytest
from pyspark.sql import functions as F

from feature_extraction_spark.ops.bpe import END, apply_bpe, train_bpe


def _ref_bpe(texts, num_merges, min_pair_count=2):
    """Sequential reference: word counts -> repeated (best pair, merge)."""
    wc = Counter(w for t in texts for w in t.lower().split())
    vocab = {w: [*w, END] for w in wc}
    merges = []
    for _ in range(num_merges):
        pairs = Counter()
        for w, syms in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += wc[w]
        if not pairs:
            break
        # max count, ties broken lexicographically on (a, b)
        (a, b), c = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if c < min_pair_count:
            break
        merges.append((a, b, c))
        for w, syms in vocab.items():
            out = []
            for x in syms:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            vocab[w] = out
    return merges, vocab, wc


@pytest.fixture(scope="module")
def corpus(spark):
    texts = [
        "the cat sat on the mat",
        "the cats sat",
        "a cat and a cat",
        "low lower lowest",
        "new york new york city",
        "the the the",
    ] * 4
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    return df, texts


def test_train_matches_reference(corpus):
    df, texts = corpus
    merges, word_seg = train_bpe(df, num_merges=12)
    ref_merges, ref_vocab, _ = _ref_bpe(texts, 12)
    assert merges == ref_merges
    got = {r["word"]: list(r["syms"]) for r in word_seg.collect()}
    assert got == ref_vocab


def test_train_deterministic(corpus):
    df, _ = corpus
    m1, _ = train_bpe(df, num_merges=6)
    m2, _ = train_bpe(df, num_merges=6)
    assert m1 == m2


def test_min_pair_count_stops_early(corpus):
    df, texts = corpus
    merges, _ = train_bpe(df, num_merges=500, min_pair_count=30)
    ref_merges, _, _ = _ref_bpe(texts, 500, min_pair_count=30)
    assert merges == ref_merges
    assert len(merges) < 500


def test_apply_counts_and_oov(spark, corpus):
    df, texts = corpus
    _, word_seg = train_bpe(df, num_merges=8)
    new = spark.createDataFrame(
        [(100, "the cat zzzqqq"), (101, ""), (102, None)],
        "doc_id bigint, text string",
    )
    out = apply_bpe(new, word_seg).toPandas().set_index("doc_id")
    seg = {r["word"]: list(r["syms"]) for r in word_seg.collect()}
    want_tokens = len(seg["the"]) + len(seg["cat"]) + (len("zzzqqq") + 1)
    assert out.loc[100, "n_words"] == 3
    assert out.loc[100, "n_bpe_tokens"] == want_tokens
    assert out.loc[100, "n_oov_words"] == 1
    # empty and NULL docs are kept with zero counts
    for d in (101, 102):
        assert out.loc[d, "n_words"] == 0
        assert out.loc[d, "n_bpe_tokens"] == 0
        assert out.loc[d, "n_oov_words"] == 0


def test_apply_consistent_with_training_corpus(corpus):
    df, texts = corpus
    _, word_seg = train_bpe(df, num_merges=8)
    out = apply_bpe(df, word_seg).toPandas()
    seg = {r["word"]: list(r["syms"]) for r in word_seg.collect()}
    for _, r in out.iterrows():
        words = texts[int(r["doc_id"])].lower().split()
        assert r["n_words"] == len(words)
        assert r["n_bpe_tokens"] == sum(len(seg[w]) for w in words)
        assert r["n_oov_words"] == 0


def test_segment_words_matches_training_segmentation(spark, corpus):
    """Replaying the LEARNED merge list with segment_words over the same
    vocabulary reproduces train_bpe's final word_seg exactly — the
    apply-side artifact builder is semantics-identical to the trainer's
    vocab updates."""
    from feature_extraction_spark.ops.bpe import segment_words, word_counts

    df, _ = corpus
    merges, word_seg = train_bpe(df, num_merges=12)
    replay = segment_words(
        word_counts(df).select("word"), [(a, b) for a, b, _ in merges]
    )
    exp = {r["word"]: list(r["syms"]) for r in word_seg.collect()}
    got = {r["word"]: list(r["syms"]) for r in replay.collect()}
    assert got == exp
