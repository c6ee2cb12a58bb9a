"""Corpus-preparation composition: funnel monotonicity, stage semantics
inheritance, chunk/split integrity, and laziness of the chain."""

import pytest
from pyspark.sql import functions as F

from feature_extraction_spark.ops.pipeline import (
    prepare_corpus,
    prepare_corpus_stages,
    stage_counts,
)

CLEAN = (
    "the quick brown fox jumps over a lazy dog while we have been keen "
    "to walk of and that many various other things would simply be "
    "narrated with plenty of distinct useful regular normal everyday "
    "words providing enough length and variety for every single rule "
    "to pass here today because this document contains fifty plus "
    "words easily and remains clean"
)
BOILER = "shared license boilerplate that is repeated across documents here"


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, CLEAN),
        (1, CLEAN),  # exact duplicate of 0 -> dropped at exact_dedup
        (2, f"{CLEAN} {BOILER}"),
        (3, f"{BOILER} {CLEAN} extra tail tokens beyond the boilerplate"),
        (4, "spam spam spam spam spam spam spam spam spam spam"),  # gopher-fail
        (5, None),  # gopher-fail (NaN stats)
        (6, CLEAN.replace("quick", "sly")),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_funnel_counts_and_monotonicity(spark, corpus):
    stages = prepare_corpus_stages(corpus, max_tokens=16, span_min_docs=2)
    rep = {r.stage: r.rows for r in stage_counts(stages).collect()}
    assert rep["input"] == 7
    assert rep["exact_dedup"] == 6  # doc 1 gone
    assert rep["gopher"] < rep["exact_dedup"]  # spam + NULL gone
    assert rep["despan"] == rep["gopher"]  # despan edits text, keeps rows
    assert rep["chunks"] >= rep["despan"]
    assert rep["split"] == rep["chunks"]


def test_stage_semantics_flow_through(spark, corpus):
    stages = prepare_corpus_stages(corpus, max_tokens=16, span_min_docs=2)
    kept_ids = {r.doc_id for r in stages["gopher"].select("doc_id").collect()}
    assert 1 not in kept_ids and 4 not in kept_ids and 5 not in kept_ids
    # the boilerplate survives in exactly one doc after despan
    despan = {r.doc_id: r.text for r in stages["despan"].collect()}
    n_boiler = sum(BOILER in (t or "") for t in despan.values())
    assert n_boiler == 1
    # chunk grain: every chunk respects max_tokens and points at a kept doc
    chunks = stages["split"].collect()
    assert all(r.n_tokens <= 16 for r in chunks)
    assert {r.doc_id for r in chunks} <= kept_ids
    # split integrity: all chunks of a doc share one split label
    per_doc = {}
    for r in chunks:
        per_doc.setdefault(r.doc_id, set()).add(r.split)
    assert all(len(s) == 1 for s in per_doc.values())


def test_decontaminate_and_ppl_stages_optional(spark, corpus):
    bench = spark.createDataFrame([(0, CLEAN)], "q_id long, text string")
    stages = prepare_corpus_stages(
        corpus, benchmark_df=bench, max_ppl=1e9, max_tokens=16
    )
    assert "decontaminate" in stages and "ppl_filter" in stages
    # despan runs first and strips the shared CLEAN span from every doc but
    # its keeper (doc 0), so after despan only doc 0 still carries the
    # benchmark 8-grams — decontamination must drop exactly it
    ids = {r.doc_id for r in stages["decontaminate"].select("doc_id").collect()}
    assert 0 not in ids
    despan_ids = {r.doc_id for r in stages["despan"].select("doc_id").collect()}
    assert despan_ids - ids == {0}
    # a huge max_ppl keeps everything that reached the stage
    assert stages["ppl_filter"].count() == len(ids)


def test_prepare_corpus_is_final_stage(spark, corpus):
    final = prepare_corpus(corpus, max_tokens=16)
    assert set(["doc_id", "chunk_idx", "chunk_text", "n_tokens", "split"]) <= set(
        final.columns
    )
    assert final.count() > 0


def test_quality_model_stage_optional(spark, corpus):
    from feature_extraction_spark.ops.quality_model import train_quality_classifier

    # train on planted labels: CLEAN-ish docs positive, junk negative
    labeled = spark.createDataFrame(
        [
            (0, CLEAN, 1.0),
            (1, CLEAN.replace("fox", "cat"), 1.0),
            (2, "spam spam spam spam spam spam spam spam", 0.0),
            (3, "!!! $$$ zz zz zz zz zz zz zz zz $$$ !!!", 0.0),
        ],
        "doc_id long, text string, label double",
    )
    m = train_quality_classifier(labeled)
    stages = prepare_corpus_stages(
        corpus, quality_model=m, min_quality_prob=0.5, max_tokens=16
    )
    assert "quality_model" in stages
    prev = stages["despan"]
    q = stages["quality_model"]
    # stage contract: doc grain, input columns only, subset of rows
    assert set(q.columns) == set(prev.columns)
    q_ids = {r.doc_id for r in q.select("doc_id").collect()}
    prev_ids = {r.doc_id for r in prev.select("doc_id").collect()}
    assert q_ids <= prev_ids
    # the surviving docs all contain CLEAN-like prose; doc 4/5 junk is
    # already gone at gopher, so the learned stage must keep clean docs
    assert len(q_ids) > 0


def test_prepare_sft_end_to_end(spark, transcripts):
    from feature_extraction_spark.ops.pipeline import (
        prepare_sft,
        prepare_sft_stages,
        stage_counts,
    )

    stages = prepare_sft_stages(
        transcripts,
        max_chars=500,
        dedup_lines=True,
        split_fractions={"train": 0.8, "val": 0.1, "test": 0.1},
    )
    assert list(stages) == [
        "input", "truncate", "render", "trainable_only", "exact_dedup",
        "line_dedup", "split",
    ]
    final = stages["split"]
    rows = final.collect()
    assert rows and set(final.columns) == {"conv_id", "text", "split"}
    assert {r["split"] for r in rows} <= {"train", "val", "test"}
    # conv grain: one row per conversation
    assert len(rows) == len({r["conv_id"] for r in rows})
    # every surviving conversation fits the truncation budget
    assert all(len(r["text"]) <= 500 for r in rows)
    # funnel is monotone from render onward (each stage only drops convs)
    counts = {r["stage"]: r["rows"] for r in stage_counts(stages).collect()}
    assert (
        counts["render"] >= counts["trainable_only"]
        >= counts["exact_dedup"] >= counts["line_dedup"] == counts["split"]
    )
    # the collapsed helper returns the same final frame
    assert prepare_sft(
        transcripts, max_chars=500, dedup_lines=True
    ).count() == counts["split"]


def test_prepare_sft_dedups_identical_conversations(spark):
    rows = []
    for conv in ("a", "b"):  # two identical conversations
        rows += [
            (conv, 0, "user", "hello there friend", None, None),
            (conv, 1, "assistant", "hi how can i help", None, None),
        ]
    rows += [("c", 0, "user", "only context here", None, None)]  # no assistant
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    from feature_extraction_spark.ops.pipeline import prepare_sft

    out = prepare_sft(df).collect()
    # c dropped (zero trainable mass); a/b dedup to the min conv_id
    assert [r["conv_id"] for r in out] == ["a"]
