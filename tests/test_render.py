"""SFT transcript rendering (ops/render.py): offsets, loss mask, flatten
parity, plan shapes."""

from pyspark.sql import functions as F

from feature_extraction_spark.ops.render import (
    render_conversations,
    render_turns,
)

SHUFFLE = "Exchange hashpartitioning"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_render_turns_offsets_python_parity(spark, transcripts_pd):
    df = spark.createDataFrame(transcripts_pd)
    got = {
        (r["conv_id"], r["turn_idx"]): (
            r["rendered"], r["start_char"], r["end_char"], r["trainable"]
        )
        for r in render_turns(df).collect()
    }
    exp = {}
    for conv_id, g in transcripts_pd.groupby("conv_id"):
        pos = 0
        for _, row in g.sort_values("turn_idx").iterrows():
            rend = f"{row['role']}: {row['text'] or ''}"
            exp[(conv_id, row["turn_idx"])] = (
                rend, pos, pos + len(rend), row["role"] == "assistant"
            )
            pos += len(rend) + 1
    assert got == exp


def test_render_turns_offsets_slice_roundtrip(spark, transcripts):
    """Slicing the flattened conversation at each turn's offsets must give
    back exactly that turn's rendered string."""
    convs = {
        r["conv_id"]: r["text"]
        for r in render_conversations(transcripts).collect()
    }
    for r in render_turns(transcripts).collect():
        flat = convs[r["conv_id"]]
        assert flat[r["start_char"]:r["end_char"]] == r["rendered"]


def test_render_conversations_totals(spark, transcripts):
    out = render_conversations(transcripts).collect()
    assert len(out) == transcripts.select("conv_id").distinct().count()
    for r in out:
        assert r["n_chars"] == len(r["text"])
        assert 0 <= r["n_trainable_chars"] <= r["n_chars"]
    # assistant turns exist in the fixture -> some trainable mass
    assert any(r["n_trainable_chars"] > 0 for r in out)


def test_render_custom_template_and_roles(spark):
    df = spark.createDataFrame(
        [("c", 0, "system", "s"), ("c", 1, "tool", "t")],
        "conv_id string, turn_idx int, role string, text string",
    )
    out = render_conversations(
        df, trainable_roles=("tool",), sep=" | ", role_sep=" >> "
    ).collect()[0]
    assert out["text"] == "system >> s | tool >> t"
    assert out["n_chars"] == len(out["text"])
    assert out["n_trainable_chars"] == len("tool >> t")


def test_truncate_keep_last_budget_respected(spark, transcripts):
    from feature_extraction_spark.ops.render import truncate_conversations

    out = truncate_conversations(transcripts, max_chars=200, keep="last")
    kept = out.filter("kept")
    # re-rendering ONLY the kept turns must fit the budget exactly
    for r in render_conversations(kept).collect():
        assert r["n_chars"] <= 200
    # kept set is a suffix: every turn after a kept turn is kept
    rows = out.select("conv_id", "turn_idx", "kept").collect()
    by_conv = {}
    for r in rows:
        by_conv.setdefault(r["conv_id"], []).append((r["turn_idx"], r["kept"]))
    for conv, ts in by_conv.items():
        flags = [k for _, k in sorted(ts)]
        assert flags == sorted(flags), conv  # False* then True*


def test_truncate_keep_first_and_python_parity(spark):
    from feature_extraction_spark.ops.render import truncate_conversations

    rows = [("c", i, "user", "x" * (3 * i + 1)) for i in range(6)]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string"
    )
    out = {
        r["turn_idx"]: (r["cum_chars"], r["kept"])
        for r in truncate_conversations(df, 40, keep="first").collect()
    }
    pos = 0
    for i in range(6):
        rend = len(f"user: {'x' * (3 * i + 1)}")
        pos += rend + 1
        assert out[i] == (pos - 1, pos - 1 <= 40), i


def test_truncate_validation(spark):
    import pytest as _pytest

    from feature_extraction_spark.ops.render import truncate_conversations

    df = spark.createDataFrame(
        [("c", 0, "user", "t")],
        "conv_id string, turn_idx int, role string, text string",
    )
    with _pytest.raises(ValueError):
        truncate_conversations(df, -1)
    with _pytest.raises(ValueError):
        truncate_conversations(df, 10, keep="middle")


def test_render_plans_single_shuffle(spark, tmp_path):
    df = spark.createDataFrame(
        [("c%d" % (i % 5), i, "user" if i % 2 else "assistant", "x" * i)
         for i in range(50)],
        "conv_id string, turn_idx int, role string, text string",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "t"))
    src = spark.read.parquet(str(tmp_path / "t"))
    from feature_extraction_spark.ops.render import truncate_conversations

    assert _plan(render_turns(src)).count(SHUFFLE) == 1
    assert _plan(render_conversations(src)).count(SHUFFLE) == 1
    assert _plan(truncate_conversations(src, 100)).count(SHUFFLE) == 1
