"""Line-granular corpus ops: CCNet/FineWeb cross-corpus line dedup, the C4
line+page rules, and CCNet perplexity buckets (ops/lines.py, ops/lm.py)."""

import math

from pyspark.sql import functions as F

from feature_extraction_spark.ops.lines import c4_filters, line_dedup

SHUFFLE = "Exchange hashpartitioning"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------- line_dedup


def test_line_dedup_cross_doc_keeps_min_occurrence(spark):
    df = _docs(
        spark,
        [
            (1, "unique one\nshared line\ntail one"),
            (2, "shared line\nunique two"),
            (3, "SHARED   LINE"),  # normalization: case + ws collapse
        ],
    )
    out = {
        r["doc_id"]: r
        for r in line_dedup(df).collect()
    }
    # doc 1 holds the min (doc_id, line_idx) for "shared line" -> keeps all
    assert out[1]["text_dedup"] == "unique one\nshared line\ntail one"
    assert out[1]["n_lines"] == 3 and out[1]["n_lines_kept"] == 3
    # doc 2 loses its copy
    assert out[2]["text_dedup"] == "unique two"
    assert out[2]["n_lines"] == 2 and out[2]["n_lines_kept"] == 1
    # doc 3 normalizes to the same line and loses everything -> empty string
    assert out[3]["text_dedup"] == ""
    assert out[3]["n_lines"] == 1 and out[3]["n_lines_kept"] == 0


def test_line_dedup_within_doc_and_empty_lines(spark):
    df = _docs(spark, [(7, "a b c\n\na b c\nx y"), (8, "\n\n")])
    out = {r["doc_id"]: r for r in line_dedup(df).collect()}
    # second "a b c" inside the SAME doc is dropped; the empty line stays
    assert out[7]["text_dedup"] == "a b c\n\nx y"
    assert out[7]["n_lines"] == 4 and out[7]["n_lines_kept"] == 3
    # empty-normalized lines are exempt from dedup everywhere
    assert out[8]["text_dedup"] == "\n\n"
    assert out[8]["n_lines_kept"] == 3


def test_line_dedup_python_parity(spark, transcripts_pd):
    """Replay the keeper rule in plain python over turn texts packed into
    3-line docs and compare full outputs."""
    texts = [
        "\n".join(ts)
        for ts in zip(*[iter(transcripts_pd["text"].head(90))] * 3)
    ]
    rows = [(i, t) for i, t in enumerate(texts)]
    got = {
        r["doc_id"]: (r["text_dedup"], r["n_lines"], r["n_lines_kept"])
        for r in line_dedup(_docs(spark, rows)).collect()
    }

    def norm(l):
        return " ".join(l.split()).lower()

    keeper = {}
    for i, t in rows:
        for j, l in enumerate(t.split("\n")):
            n = norm(l)
            if n and n not in keeper:
                keeper[n] = (i, j)
    exp = {}
    for i, t in rows:
        lines = t.split("\n")
        kept = [
            l
            for j, l in enumerate(lines)
            if not norm(l) or keeper[norm(l)] == (i, j)
        ]
        exp[i] = ("\n".join(kept), len(lines), len(kept))
    assert got == exp


def test_line_dedup_plan_text_never_shuffles(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, f"line {i % 3}\nother {i}") for i in range(100)],
        "doc_id long, text string",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "d"))
    plan = _plan(line_dedup(spark.read.parquet(str(tmp_path / "d"))))
    # every hash exchange is keyed (and loaded) with id/line_idx/md5
    # triples only — document TEXT never rides a corpus-wide exchange
    exch = [
        ln for ln in plan.splitlines() if "Exchange hashpartitioning" in ln
    ]
    assert len(exch) == 2, plan  # keeper-stats agg + doc-grain drop agg
    assert all("(_h#" in ln or "(_id#" in ln for ln in exch), plan
    # the only join that sees text is the final doc-grain join, and the
    # drop-index table (docs that LOSE a line) is the broadcast side
    assert "BroadcastHashJoin [_id" in plan, plan
    # text is rebuilt row-locally by an index filter, not re-collected
    assert "array_join(filter(" in plan, plan
    # the price of text-free exchanges: <= 3 column-pruned scans
    assert plan.count("FileScan parquet") <= 3, plan


# ---------------------------------------------------------------- c4_filters


def test_c4_line_rules(spark):
    df = _docs(
        spark,
        [
            (1, "one two three four five.\nshort line.\nno terminal punct here"),
            (2, 'quoted line with five words!"\nends bang one two three!'),
        ],
    )
    out = {r["doc_id"]: r for r in c4_filters(df, min_lines=1).collect()}
    # >=5 words + terminal punctuation required; "short line." has 2 words
    assert out[1]["text_c4"] == "one two three four five."
    assert out[1]["n_lines_kept"] == 1 and out[1]["kept"]
    assert out[2]["n_lines_kept"] == 2 and out[2]["kept"]


def test_c4_page_rules(spark):
    base = "one two three four five.\nsix seven eight nine ten.\na b c d e."
    df = _docs(
        spark,
        [
            (1, base),
            (2, base + "\nthis page uses javascript for rendering."),
            (3, base + "\nLorem Ipsum dolor sit amet."),
            (4, base + "\nconfig = { enabled }"),
            (5, base + "\nfuck spam spam spam spam."),
            (6, "one two three four five.\nsix seven eight nine ten."),
        ],
    )
    out = {r["doc_id"]: r for r in c4_filters(df).collect()}
    assert out[1]["kept"] and out[1]["n_lines_kept"] == 3
    # javascript drops only the LINE, the page survives
    assert out[2]["kept"] and out[2]["n_lines_kept"] == 3
    # lorem ipsum / '{' / bad word drop the PAGE
    assert not out[3]["kept"]
    assert not out[4]["kept"]
    assert not out[5]["kept"]
    # fewer than min_lines retained lines drops the page
    assert not out[6]["kept"] and out[6]["n_lines_kept"] == 2


def test_c4_zero_shuffle_plan(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, "a b c d e.\nf g h") for i in range(50)],
        "doc_id long, text string",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "d"))
    plan = _plan(c4_filters(spark.read.parquet(str(tmp_path / "d"))))
    assert SHUFFLE not in plan and "Exchange" not in plan, plan


# ---------------------------------------------------------------- ppl_buckets


def test_ppl_buckets_rank_exact_counts(spark):
    from feature_extraction_spark.ops.lm import ppl_buckets

    rows = [(i, float(i)) for i in range(9)]
    df = spark.createDataFrame(rows, "doc_id long, log_ppl double")
    out = ppl_buckets(df, method="rank").collect()
    by_bucket = {}
    for r in out:
        by_bucket.setdefault(r["bucket"], set()).add(r["doc_id"])
    assert by_bucket == {
        "head": {0, 1, 2},
        "middle": {3, 4, 5},
        "tail": {6, 7, 8},
    }


def test_ppl_buckets_threshold_agrees_with_rank(spark):
    from feature_extraction_spark.ops.lm import ppl_buckets

    # well-separated values: both methods must produce identical buckets
    rows = [(i, float(10 * i)) for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, log_ppl double")
    rank = {
        r["doc_id"]: r["bucket"]
        for r in ppl_buckets(df, method="rank").collect()
    }
    thr = {
        r["doc_id"]: r["bucket"]
        for r in ppl_buckets(df, method="threshold").collect()
    }
    assert rank == thr


def test_ppl_buckets_nan_lands_in_tail_both_methods(spark):
    from feature_extraction_spark.ops.lm import ppl_buckets

    rows = [(i, float(i)) for i in range(8)] + [(99, float("nan"))]
    df = spark.createDataFrame(rows, "doc_id long, log_ppl double")
    for method in ("rank", "threshold"):
        out = {
            r["doc_id"]: r["bucket"]
            for r in ppl_buckets(df, method=method).collect()
        }
        assert out[99] == "tail", method


def test_ppl_buckets_threshold_map_only_after_fit(spark, tmp_path):
    from feature_extraction_spark.ops.lm import ppl_buckets

    df = spark.createDataFrame(
        [(i, float(i)) for i in range(100)], "doc_id long, log_ppl double"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "p"))
    out = ppl_buckets(spark.read.parquet(str(tmp_path / "p")), method="threshold")
    plan = _plan(out)
    # labeling is pure column algebra over broadcast scalar cut points
    assert SHUFFLE not in plan and "Window" not in plan, plan


def test_ppl_buckets_validation(spark):
    import pytest as _pytest

    from feature_extraction_spark.ops.lm import ppl_buckets

    df = spark.createDataFrame([(1, 1.0)], "doc_id long, log_ppl double")
    with _pytest.raises(ValueError):
        ppl_buckets(df, n_buckets=1)
    with _pytest.raises(ValueError):
        ppl_buckets(df, labels=("a",))
    with _pytest.raises(ValueError):
        ppl_buckets(df, method="bogus")
