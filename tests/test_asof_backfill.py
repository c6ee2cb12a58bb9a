"""As-of join (both physical strategies) and backfill: parity vs
pandas.merge_asof, strict/inclusive/tolerance semantics, leakage property."""

import datetime as dt

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
import pytest

from feature_extraction_spark.ops.asof import asof_join, asof_join_broadcast
from feature_extraction_spark.ops.backfill import backfill


def _mk(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


@pytest.fixture(scope="module")
def asof_inputs(spark):
    t0 = dt.datetime(2024, 1, 1)
    left_rows = []
    right_rows = []
    rng = np.random.RandomState(7)
    for k in range(8):
        key = f"conv_{k:03d}"
        lt = sorted(rng.randint(0, 10_000, size=40))
        rt = sorted(rng.randint(0, 10_000, size=15))
        left_rows += [(key, i, t0 + dt.timedelta(seconds=int(s))) for i, s in enumerate(lt)]
        right_rows += [
            (key, t0 + dt.timedelta(seconds=int(s)), float(s) * 0.5) for s in rt
        ]
    left = _mk(spark, left_rows, "conv_id string, turn_idx int, ts timestamp")
    right = _mk(spark, right_rows, "conv_id string, ts timestamp, score double")
    return left, right


def _expected_merge_asof(left, right, direction_allow_exact=True, tolerance=None):
    lp = left.toPandas().sort_values("ts")
    rp = right.toPandas().sort_values("ts").rename(columns={"ts": "r_ts"})
    out = pd.merge_asof(
        lp,
        rp,
        left_on="ts",
        right_on="r_ts",
        by="conv_id",
        allow_exact_matches=direction_allow_exact,
        tolerance=pd.Timedelta(seconds=tolerance) if tolerance else None,
    )
    return out.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)


@pytest.mark.parametrize("impl", [asof_join, asof_join_broadcast])
@pytest.mark.parametrize("inclusive", [True, False])
def test_asof_parity_with_pandas(asof_inputs, impl, inclusive):
    left, right = asof_inputs
    got = (
        impl(left, right, on="conv_id", inclusive=inclusive)
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    exp = _expected_merge_asof(left, right, direction_allow_exact=inclusive)
    assert np.allclose(
        got["score_asof"].astype(float).values,
        exp["score"].astype(float).values,
        equal_nan=True,
    )


def test_asof_tolerance(asof_inputs):
    left, right = asof_inputs
    got = (
        asof_join(left, right, on="conv_id", tolerance_s=500.0)
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    exp = _expected_merge_asof(left, right, tolerance=500.0)
    assert np.allclose(
        got["score_asof"].astype(float).values,
        exp["score"].astype(float).values,
        equal_nan=True,
    )


def test_asof_leakage_free(asof_inputs):
    """Altering right-side rows that are strictly in the future of every left
    row must not change the join output."""
    left, right = asof_inputs
    base = (
        asof_join(left, right, on="conv_id")
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    max_left_ts = left.agg(F.max("ts")).collect()[0][0]
    future = right.withColumn(
        "ts", F.col("ts") + F.expr("INTERVAL 100000 SECONDS")
    ).withColumn("score", F.lit(-999.0))
    right2 = right.unionByName(future)
    mut = (
        asof_join(left, right2, on="conv_id")
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert (mut["score_asof"] != -999.0).all()
    pd.testing.assert_frame_equal(base, mut)
    assert max_left_ts is not None


def test_backfill_locf(spark):
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        ("c", 0, 1.0, t0),
        ("c", 1, None, t0 + dt.timedelta(seconds=1)),
        ("c", 2, None, t0 + dt.timedelta(seconds=2)),
        ("c", 3, 4.0, t0 + dt.timedelta(seconds=3)),
        ("c", 4, None, t0 + dt.timedelta(seconds=4)),
        ("d", 0, None, t0),  # leading null stays null (no future fill!)
        ("d", 1, 7.0, t0 + dt.timedelta(seconds=1)),
    ]
    df = _mk(spark, rows, "conv_id string, turn_idx int, v double, ts timestamp")
    got = (
        backfill(df, ["v"])
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])["v_filled"]
        .tolist()
    )
    assert got[:5] == [1.0, 1.0, 1.0, 4.0, 4.0]
    assert np.isnan(got[5]) or got[5] is None
    assert got[6] == 7.0


def test_asof_join_auto_picks_strategy(spark, asof_inputs):
    """auto == both fixed strategies on the same input; threshold routes."""
    from pyspark.sql import functions as F

    from feature_extraction_spark.ops.asof import (
        asof_join,
        asof_join_auto,
        asof_join_broadcast,
    )

    left, right = asof_inputs

    def vals(df):
        return sorted(
            (r["conv_id"], r["us"],
             None if r["score_asof"] is None else round(r["score_asof"], 9))
            for r in df.select(
                "conv_id", F.unix_micros("ts").alias("us"), "score_asof"
            ).collect()
        )

    base = vals(asof_join(left, right, on="conv_id", value_cols=["score"]))
    # low threshold -> union-tag path; high threshold -> broadcast path
    assert vals(
        asof_join_auto(left, right, on="conv_id", broadcast_threshold_rows=0,
                       value_cols=["score"])
    ) == base
    assert vals(
        asof_join_auto(left, right, on="conv_id",
                       broadcast_threshold_rows=10**6, value_cols=["score"])
    ) == base
    assert vals(
        asof_join_broadcast(left, right, on="conv_id", value_cols=["score"])
    ) == base


def test_asof_broadcast_ansi_left_precedes_all_rights(spark):
    """Regression (round-2 review): a left row earlier than every right row
    has an EMPTY filtered series; the lookup must yield NULL, not throw,
    under Spark 4's default ANSI mode (try_element_at)."""
    import datetime as dt

    from feature_extraction_spark.ops.asof import asof_join_broadcast

    prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        left = spark.createDataFrame(
            [("k", dt.datetime(2024, 1, 1)), ("k", dt.datetime(2024, 1, 3))],
            "conv_id string, ts timestamp",
        )
        right = spark.createDataFrame(
            [("k", dt.datetime(2024, 1, 2), 7.0)],
            "conv_id string, ts timestamp, v double",
        )
        out = asof_join_broadcast(left, right, on="conv_id", value_cols=["v"])
        rows = {r["ts"].day: r["v_asof"] for r in out.collect()}
        assert rows[1] is None and rows[3] == 7.0
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev)
