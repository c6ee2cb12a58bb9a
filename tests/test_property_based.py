"""Property-based (hypothesis) parity tests: randomized inputs vs
pandas/pure-python models for the north-rule core ops (as-of join,
sessionize, backfill). Complements the fixed-seed parity tests with
adversarial shapes: duplicate timestamps, empty groups, single-row convs,
unmatched keys.
"""

import datetime

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from feature_extraction_spark.ops.asof import asof_join
from feature_extraction_spark.ops.backfill import backfill
from feature_extraction_spark.ops.sessionize import sessionize

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# timestamps as small epoch-second ints (kept < 1e6 to stay well-formed)
_ts = st.integers(min_value=0, max_value=100_000)
_key = st.sampled_from(["a", "b", "c"])


@st.composite
def _asof_case(draw):
    left = draw(
        st.lists(st.tuples(_key, _ts), min_size=1, max_size=25, unique=True)
    )
    right = draw(
        st.lists(
            st.tuples(_key, _ts, st.floats(-100, 100, allow_nan=False)),
            min_size=0,
            max_size=25,
            unique_by=lambda r: (r[0], r[1]),
        )
    )
    return left, right


@given(case=_asof_case())
@settings(**_SETTINGS)
def test_asof_join_matches_merge_asof(spark, case):
    left_rows, right_rows = case
    ldf = spark.createDataFrame(
        [(k, t * 1_000_000) for k, t in left_rows], "k string, us long"
    ).select("k", F.timestamp_micros(F.col("us")).alias("ts"))
    rdf = spark.createDataFrame(
        [(k, t * 1_000_000, v) for k, t, v in right_rows],
        "k string, us long, v double",
    ).select("k", F.timestamp_micros(F.col("us")).alias("ts"), "v")

    got = (
        asof_join(ldf, rdf, on="k", value_cols=["v"])
        .select("k", F.unix_micros("ts").alias("us"), "v_asof")
        .toPandas()
        .sort_values(["k", "us"])
        .reset_index(drop=True)
    )

    lp = pd.DataFrame(left_rows, columns=["k", "t"]).sort_values(["t", "k"])
    rp = pd.DataFrame(right_rows, columns=["k", "t", "v"]).sort_values(["t", "k"])
    if len(rp):
        exp = pd.merge_asof(lp, rp, on="t", by="k", direction="backward")
    else:
        exp = lp.assign(v=np.nan)
    exp = exp.assign(us=exp["t"] * 1_000_000).sort_values(["k", "us"]).reset_index(
        drop=True
    )
    assert len(got) == len(exp)
    assert (got["k"].values == exp["k"].values).all()
    assert np.allclose(
        got["v_asof"].astype(float).values,
        exp["v"].astype(float).values,
        equal_nan=True,
    )


@st.composite
def _session_case(draw):
    return draw(
        st.lists(
            st.tuples(_key, _ts), min_size=1, max_size=40, unique=True
        )
    )


@given(rows=_session_case(), gap=st.integers(min_value=1, max_value=1000))
@settings(**_SETTINGS)
def test_sessionize_matches_python_model(spark, rows, gap):
    df = spark.createDataFrame(
        [(k, i, t * 1_000_000) for i, (k, t) in enumerate(rows)],
        "conv_id string, turn_idx int, us long",
    ).select("conv_id", "turn_idx", F.timestamp_micros(F.col("us")).alias("ts"))

    got = {
        (r["conv_id"], r["turn_idx"]): r["session_id"]
        for r in sessionize(df, gap_seconds=float(gap)).collect()
    }

    # pure-python model: sort by (ts, turn_idx) within conv, increment when
    # gap strictly exceeds the threshold
    by_conv: dict[str, list[tuple[int, int]]] = {}
    for i, (k, t) in enumerate(rows):
        by_conv.setdefault(k, []).append((t, i))
    for k, items in by_conv.items():
        items.sort()
        sid, prev = 0, None
        for t, i in items:
            if prev is not None and (t - prev) > gap:
                sid += 1
            assert got[(k, i)] == sid, (k, i, t, prev, gap, got[(k, i)], sid)
            prev = t


@st.composite
def _backfill_case(draw):
    return draw(
        st.lists(
            st.tuples(
                _key,
                _ts,
                st.one_of(st.none(), st.floats(-10, 10, allow_nan=False)),
            ),
            min_size=1,
            max_size=30,
            unique_by=lambda r: (r[0], r[1]),
        )
    )


@given(rows=_backfill_case())
@settings(**_SETTINGS)
def test_backfill_matches_pandas_ffill(spark, rows):
    df = spark.createDataFrame(
        [(k, t, t * 1_000_000, v) for k, t, v in rows],
        "conv_id string, turn_idx int, us long, x double",
    ).select(
        "conv_id", "turn_idx", F.timestamp_micros(F.col("us")).alias("ts"), "x"
    )
    got = (
        backfill(df, ["x"])
        .select("conv_id", "turn_idx", "x_filled")
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    pdf = (
        pd.DataFrame(rows, columns=["conv_id", "turn_idx", "x"])
        .sort_values(["conv_id", "turn_idx"])
    )
    exp = (
        pdf.assign(x_filled=pdf.groupby("conv_id")["x"].ffill())
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert np.allclose(
        got["x_filled"].astype(float).values,
        exp["x_filled"].astype(float).values,
        equal_nan=True,
    )


# ---------------------------------------------------------------- MATTR O(n)


@given(
    words=st.lists(
        st.sampled_from(["a", "b", "c", "d", "e"]), min_size=1, max_size=80
    ),
    w=st.sampled_from([3, 10, 25]),
)
@settings(**_SETTINGS)
def test_mattr_interval_formula_matches_bruteforce(spark, words, w):
    """The O(n) previous-occurrence interval formulation must equal the
    brute-force sliding-window distinct-count mean for any token sequence."""
    from feature_extraction_spark.ops.lexdiv import lexdiv_stats

    n = len(words)
    if n >= w:
        expected = sum(
            len(set(words[i : i + w])) for i in range(n - w + 1)
        ) / (w * (n - w + 1))
    else:
        expected = len(set(words)) / n

    df = spark.createDataFrame(
        [("c", 0, " ".join(words), datetime.datetime(2024, 1, 1))],
        "conv_id string, turn_idx int, text string, ts timestamp",
    )
    got = lexdiv_stats(df, level="conv", windows=(w,)).collect()[0][f"MATTR_{w}"]
    assert np.isclose(got, expected), (words, w, got, expected)


# ---------------------------------------------------------------- chunking

@st.composite
def _chunk_case(draw):
    texts = draw(
        st.lists(
            st.lists(
                st.text(alphabet="abc", min_size=1, max_size=4),
                min_size=0,
                max_size=40,
            ).map(" ".join),
            min_size=1,
            max_size=12,
        )
    )
    max_tokens = draw(st.integers(min_value=2, max_value=12))
    overlap = draw(st.integers(min_value=0, max_value=max_tokens - 1))
    return texts, max_tokens, overlap


@given(case=_chunk_case())
@settings(**_SETTINGS)
def test_chunk_documents_matches_python_model(spark, case):
    from feature_extraction_spark.ops.chunk import chunk_documents

    texts, max_tokens, overlap = case
    stride = max_tokens - overlap
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = sorted(
        (r["doc_id"], r["chunk_idx"], r["chunk_text"], r["n_tokens"])
        for r in chunk_documents(
            df, max_tokens=max_tokens, overlap=overlap
        ).collect()
    )
    exp = []
    for i, t in enumerate(texts):
        ws = [w for w in t.split() if w]
        s, ci = 0, 0
        while s < len(ws):
            if s != 0 and s + overlap >= len(ws):
                break
            chunk = ws[s : s + max_tokens]
            exp.append((i, ci, " ".join(chunk), len(chunk)))
            s += stride
            ci += 1
    assert got == sorted(exp)
