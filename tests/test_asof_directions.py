"""Directional as-of joins (forward / nearest): parity vs
pandas.merge_asof on both physical strategies, tie and tolerance
semantics, strict-mode guards."""

import datetime as dt

import numpy as np
import pandas as pd
import pytest

from feature_extraction_spark.ops.asof import asof_join, asof_join_broadcast

IMPLS = {"sortmerge": asof_join, "broadcast": asof_join_broadcast}


@pytest.fixture(scope="module")
def dir_inputs(spark):
    """Right timestamps sit at +250 ms offsets so no left row is ever
    equidistant from a backward and a forward candidate (backward ages end
    in .75 s, forward ages in .25 s) — nearest-parity tests then never
    depend on either engine's tie rule."""
    t0 = dt.datetime(2024, 1, 1)
    rng = np.random.RandomState(11)
    left_rows, right_rows = [], []
    for k in range(6):
        key = f"conv_{k:03d}"
        lt = sorted(set(rng.randint(0, 5_000, size=30).tolist()))
        rt = sorted(set(rng.randint(0, 5_000, size=12).tolist()))
        left_rows += [
            (key, i, t0 + dt.timedelta(seconds=int(s))) for i, s in enumerate(lt)
        ]
        right_rows += [
            (key, t0 + dt.timedelta(seconds=int(s), milliseconds=250), float(s))
            for s in rt
        ]
    left = spark.createDataFrame(
        left_rows, "conv_id string, turn_idx int, ts timestamp"
    )
    right = spark.createDataFrame(
        right_rows, "conv_id string, ts timestamp, score double"
    )
    return left, right


def _expected(left, right, direction, allow_exact=True, tolerance=None):
    lp = left.toPandas().sort_values("ts")
    rp = right.toPandas().sort_values("ts").rename(columns={"ts": "r_ts"})
    out = pd.merge_asof(
        lp,
        rp,
        left_on="ts",
        right_on="r_ts",
        by="conv_id",
        direction=direction,
        allow_exact_matches=allow_exact,
        tolerance=pd.Timedelta(seconds=tolerance) if tolerance else None,
    )
    return out.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)


def _got(impl, left, right, **kw):
    out = IMPLS[impl](left, right, on="conv_id", value_cols=["score"], **kw)
    return (
        out.toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )


@pytest.mark.parametrize("impl", ["sortmerge", "broadcast"])
@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
def test_direction_parity_with_pandas(dir_inputs, impl, direction):
    left, right = dir_inputs
    got = _got(impl, left, right, direction=direction)
    exp = _expected(left, right, direction)
    assert np.allclose(
        got["score_asof"].to_numpy(dtype=float),
        exp["score"].to_numpy(dtype=float),
        equal_nan=True,
    )
    # the matched timestamp is reported too
    got_ts = got["ts_asof"].to_numpy()
    exp_ts = exp["r_ts"].to_numpy()
    assert ((got_ts == exp_ts) | (pd.isna(got_ts) & pd.isna(exp_ts))).all()


@pytest.mark.parametrize("impl", ["sortmerge", "broadcast"])
def test_forward_strict_excludes_equal_ts(spark, impl):
    t0 = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [("a", 0, t0 + dt.timedelta(seconds=10))],
        "conv_id string, turn_idx int, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("a", t0 + dt.timedelta(seconds=10), 1.0),
            ("a", t0 + dt.timedelta(seconds=20), 2.0),
        ],
        "conv_id string, ts timestamp, score double",
    )
    incl = _got(impl, left, right, direction="forward", inclusive=True)
    strict = _got(impl, left, right, direction="forward", inclusive=False)
    assert incl.loc[0, "score_asof"] == 1.0
    assert strict.loc[0, "score_asof"] == 2.0


@pytest.mark.parametrize("impl", ["sortmerge", "broadcast"])
def test_nearest_tie_prefers_backward(spark, impl):
    t0 = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [("a", 0, t0 + dt.timedelta(seconds=10))],
        "conv_id string, turn_idx int, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("a", t0 + dt.timedelta(seconds=5), 1.0),
            ("a", t0 + dt.timedelta(seconds=15), 2.0),
        ],
        "conv_id string, ts timestamp, score double",
    )
    got = _got(impl, left, right, direction="nearest")
    assert got.loc[0, "score_asof"] == 1.0


@pytest.mark.parametrize("impl", ["sortmerge", "broadcast"])
def test_nearest_requires_inclusive(dir_inputs, impl):
    left, right = dir_inputs
    with pytest.raises(ValueError, match="nearest"):
        IMPLS[impl](
            left,
            right,
            on="conv_id",
            value_cols=["score"],
            direction="nearest",
            inclusive=False,
        )


@pytest.mark.parametrize("impl", ["sortmerge", "broadcast"])
def test_bad_direction_raises(dir_inputs, impl):
    left, right = dir_inputs
    with pytest.raises(ValueError, match="direction"):
        IMPLS[impl](
            left, right, on="conv_id", value_cols=["score"], direction="upward"
        )


def test_forward_tolerance(dir_inputs):
    left, right = dir_inputs
    got = _got(left=left, right=right, impl="sortmerge", direction="forward",
               tolerance_s=30.0)
    exp = _expected(left, right, "forward", tolerance=30)
    assert np.allclose(
        got["score_asof"].to_numpy(dtype=float),
        exp["score"].to_numpy(dtype=float),
        equal_nan=True,
    )


def test_nearest_one_sided_keys(spark):
    """Keys with only-earlier or only-later right rows fall back to the
    available side."""
    t0 = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [("a", 0, t0 + dt.timedelta(seconds=10)),
         ("b", 0, t0 + dt.timedelta(seconds=10)),
         ("c", 0, t0 + dt.timedelta(seconds=10))],
        "conv_id string, turn_idx int, ts timestamp",
    )
    right = spark.createDataFrame(
        [("a", t0 + dt.timedelta(seconds=3), 1.0),
         ("b", t0 + dt.timedelta(seconds=99), 2.0)],
        "conv_id string, ts timestamp, score double",
    )
    for impl in IMPLS:
        got = _got(impl, left, right, direction="nearest").set_index("conv_id")
        assert got.loc["a", "score_asof"] == 1.0
        assert got.loc["b", "score_asof"] == 2.0
        assert pd.isna(got.loc["c", "score_asof"])
