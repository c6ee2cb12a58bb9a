"""Preprocessing ops (P5/P8/F2-F4) and hypothesis source + A7 mean."""

import datetime as dt

import numpy as np

from feature_extraction_spark.ops.preprocess import (
    basic_clean,
    remove_nonverbal_tokens,
    remove_stopwords,
    sentence_split_expr,
)
from feature_extraction_spark.sources.hypotheses import (
    mean_across_hypotheses,
    read_hypothesis_dirs,
)

TS = dt.datetime(2024, 1, 1)
SCHEMA = "conv_id string, turn_idx int, text string, ts timestamp"


def test_remove_nonverbal(spark):
    df = spark.createDataFrame(
        [
            ("c", 0, "hello [noise] world", TS),
            ("c", 1, "[laughter] <unk>", TS),
            ("c", 2, "ok", TS),
        ],
        SCHEMA,
    )
    out = remove_nonverbal_tokens(df).orderBy("turn_idx").toPandas()
    assert list(out["text"]) == ["hello world", "ok"]  # emptied row dropped


def test_remove_stopwords(spark):
    df = spark.createDataFrame([("c", 0, "The cat AND the dog", TS)], SCHEMA)
    out = remove_stopwords(df, ["the", "and"]).collect()[0]
    assert out["text"] == "cat dog"


def test_basic_clean_and_sentences(spark):
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [("c", 0, "Hello, World! It's me. Right? yes", TS)], SCHEMA
    )
    out = basic_clean(df).collect()[0]
    assert out["text_basic"] == "hello world it's me right yes"
    sents = df.select(sentence_split_expr(F.col("text")).alias("s")).collect()[0]["s"]
    assert sents == ["Hello, World!", "It's me.", "Right?", "yes"]


def test_hypothesis_source_and_mean(spark, tmp_path):
    call = tmp_path / "call_01"
    call.mkdir()
    (call / "hyp1.txt").write_text("seg1 hello world\nseg2 one two three\n")
    (call / "hyp2.txt").write_text("seg1 hello word\nseg2 one two\n")

    df = read_hypothesis_dirs(spark, str(call / "*.txt"))
    pdf = df.toPandas()
    assert set(pdf["hypothesis_id"]) == {"hyp1.txt", "hyp2.txt"}
    assert set(pdf["call_id"]) == {"call_01"}
    assert pdf[pdf.seg_id == "seg1"]["text"].tolist().count("hello world") == 1

    # per-hypothesis word counts -> mean across hypotheses (A7)
    import pyspark.sql.functions as F

    feats = df.groupBy("call_id", "hypothesis_id").agg(
        F.sum(F.size(F.split("text", " ", -1))).cast("double").alias("n_words")
    )
    out = mean_across_hypotheses(feats, ["call_id"]).collect()[0]
    assert np.allclose(out["n_words"], (5 + 4) / 2)
