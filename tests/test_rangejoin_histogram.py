"""Interval/range join (granule decomposition) and the mergeable
histogram-quantile state."""

import math
import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from feature_extraction_spark.ops.rangejoin import interval_join
from feature_extraction_spark.ops.sketches import (
    HistogramSpec,
    histogram_quantiles,
    histogram_state,
    merge_histogram_states,
)


def _ts(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


@pytest.fixture(scope="module")
def pts(spark):
    # 200 points across 2 keys, seconds 0..999
    rng = random.Random(7)
    rows = [
        (i, rng.choice(["a", "b"]), float(rng.uniform(0, 1000)))
        for i in range(200)
    ]
    return spark.createDataFrame(rows, "pid long, k string, sec double").select(
        "pid", "k", F.timestamp_seconds(F.col("sec")).alias("ts")
    )


@pytest.fixture(scope="module")
def ivs(spark):
    # overlapping intervals per key, varying lengths (incl zero-length)
    rng = random.Random(13)
    rows = []
    for j in range(30):
        k = rng.choice(["a", "b"])
        s = rng.uniform(0, 950)
        rows.append((j, k, s, s + rng.uniform(0, 120)))
    rows.append((98, "a", 500.0, 500.0))  # zero-length
    return spark.createDataFrame(
        rows, "iv_id long, k string, s double, e double"
    ).select(
        "iv_id",
        "k",
        F.timestamp_seconds(F.col("s")).alias("start"),
        F.timestamp_seconds(F.col("e")).alias("end"),
    )


def _oracle_pairs(pts_pd, ivs_pd, end_inclusive=False):
    out = set()
    for p in pts_pd.itertuples():
        for iv in ivs_pd.itertuples():
            if p.k != iv.k:
                continue
            ok = iv.start <= p.ts and (
                p.ts <= iv.end if end_inclusive else p.ts < iv.end
            )
            if ok:
                out.add((p.pid, iv.iv_id))
    return out


@pytest.mark.parametrize("granule", [5.0, 60.0, 600.0])
def test_interval_join_matches_nested_loop_oracle(spark, pts, ivs, granule):
    got = interval_join(pts, ivs, granule_seconds=granule, on="k")
    pairs = {(r.pid, r.iv_id) for r in got.collect()}
    oracle = _oracle_pairs(pts.toPandas(), ivs.toPandas())
    assert pairs == oracle
    # no duplicate (point, interval) rows from the granule explode
    assert got.count() == len(pairs)


def test_interval_join_end_inclusive_and_left(spark, pts, ivs):
    got = interval_join(
        pts, ivs, granule_seconds=60.0, on="k", how="left", end_inclusive=True
    )
    pairs = {(r.pid, r.iv_id) for r in got.collect() if r.iv_id is not None}
    assert pairs == _oracle_pairs(pts.toPandas(), ivs.toPandas(), end_inclusive=True)
    # left keeps every point at least once
    assert got.select("pid").distinct().count() == pts.count()
    unmatched = {r.pid for r in got.collect() if r.iv_id is None}
    assert unmatched == {r.pid for r in pts.collect()} - {p for p, _ in pairs}


def test_interval_join_no_keys(spark, pts, ivs):
    # keyless range join (the case a plain BETWEEN join plans as a
    # nested loop): decomposition still exact
    got = interval_join(pts, ivs.drop("k"), granule_seconds=60.0)
    pts_pd, ivs_pd = pts.toPandas(), ivs.toPandas()
    oracle = {
        (p.pid, iv.iv_id)
        for p in pts_pd.itertuples()
        for iv in ivs_pd.itertuples()
        if iv.start <= p.ts < iv.end
    }
    assert {(r.pid, r.iv_id) for r in got.collect()} == oracle


def test_interval_join_is_equi_join_not_nested_loop(spark, pts, ivs):
    got = interval_join(pts, ivs, granule_seconds=60.0, on="k")
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_interval_join_validates(spark, pts, ivs):
    with pytest.raises(ValueError):
        interval_join(pts, ivs, granule_seconds=0.0)
    with pytest.raises(ValueError):
        interval_join(pts, ivs, granule_seconds=60.0, how="full")


def test_interval_join_assert_valid_raises_on_inverted(spark, pts):
    bad = spark.createDataFrame(
        [(1, "a", 500.0, 100.0)], "iv_id long, k string, s double, e double"
    ).select(
        "iv_id", "k",
        F.timestamp_seconds("s").alias("start"),
        F.timestamp_seconds("e").alias("end"),
    )
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    with pytest.raises((Py4JJavaError, SparkRuntimeException, Exception),
                       match="inverted interval"):
        interval_join(pts, bad, granule_seconds=60.0, on="k",
                      assert_valid=True).collect()
    # same data without the flag: silently no matches outside the
    # (empty) residual window — zero rows, zero error
    assert interval_join(pts, bad, granule_seconds=60.0, on="k").count() == 0


def test_interval_join_null_bounds_dropped(spark, pts):
    ivs = spark.createDataFrame(
        [(1, "a", None, 100.0), (2, "a", 0.0, None), (3, "a", 0.0, 1000.0)],
        "iv_id long, k string, s double, e double",
    ).select(
        "iv_id", "k",
        F.timestamp_seconds("s").alias("start"),
        F.timestamp_seconds("e").alias("end"),
    )
    got = interval_join(pts, ivs, granule_seconds=60.0, on="k")
    # only the well-formed interval matches; NULL-bounded rows are dropped
    assert {r.iv_id for r in got.select("iv_id").distinct().collect()} == {3}


# ---------------------------------------------------------------------------
# histogram quantile state
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def values(spark):
    rng = random.Random(23)
    rows = []
    for conv in range(6):
        n = 200 + conv * 50
        for _ in range(n):
            rows.append((f"c{conv}", rng.uniform(0, 100) ** 1.5))
    # NULL and NaN rows must be excluded, all-NULL entity drops
    rows += [("c0", None), ("c1", float("nan")), ("cnull", None)]
    return spark.createDataFrame(rows, "conv_id string, v double")


SPEC = HistogramSpec(lo=0.0, hi=1000.0, bins=200)


def test_histogram_quantiles_within_bin_width(spark, values):
    state = histogram_state(values, "v", SPEC)
    got = histogram_quantiles(state, SPEC, probs=[0.25, 0.5, 0.75, 0.99])
    pd = values.toPandas().dropna()
    width = (SPEC.hi - SPEC.lo) / SPEC.bins
    rows = {r.conv_id: r for r in got.collect()}
    assert "cnull" not in rows
    for conv, grp in pd.groupby("conv_id"):
        vals = grp.v.values
        vals = vals[~np.isnan(vals)]
        for p, col in [(0.25, "q_0_25"), (0.5, "q_0_5"), (0.75, "q_0_75"), (0.99, "q_0_99")]:
            exact = float(np.quantile(vals, p))
            est = rows[conv][col]
            assert abs(est - exact) <= width + 1e-9, (conv, p, est, exact)


def test_histogram_state_merges_exactly(spark, values):
    """Sharded states merged == whole-data state (bit-identical counts),
    so quantiles from merged shards == quantiles from one pass."""
    a = values.filter(F.crc32(F.col("v").cast("string")) % 2 == 0)
    b = values.subtract(a)
    merged = merge_histogram_states(
        histogram_state(a, "v", SPEC), histogram_state(b, "v", SPEC)
    )
    whole = histogram_state(values, "v", SPEC)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )


def test_histogram_log_bins_relative_error(spark):
    rng = random.Random(5)
    rows = [("c", math.exp(rng.uniform(0, math.log(1e6)))) for _ in range(3000)]
    df = spark.createDataFrame(rows, "conv_id string, v double")
    spec = HistogramSpec(lo=1e-3, hi=1e7, bins=400, log=True)
    got = histogram_quantiles(histogram_state(df, "v", spec), spec, probs=[0.5]).collect()[0]
    exact = float(np.quantile([v for _, v in rows], 0.5))
    # log bins: bounded RELATIVE error (one bin = constant log width)
    ratio = math.exp((math.log(1e7) - math.log(1e-3)) / 400)
    assert exact / ratio / 1.001 <= got.q_0_5 <= exact * ratio * 1.001


def test_histogram_clamps_domain(spark):
    df = spark.createDataFrame(
        [("c", -5.0), ("c", 0.5), ("c", 99.0)], "conv_id string, v double"
    )
    spec = HistogramSpec(lo=0.0, hi=10.0, bins=10)
    state = histogram_state(df, "v", spec)
    bins = {r.bin for r in state.collect()}
    assert bins == {0, 9}  # -5 clamps to bin 0, 99 to the last bin
    # log bins: values at/below zero must clamp into bin 0, not vanish
    # into a NULL bin (log(x<=0) is NULL)
    lspec = HistogramSpec(lo=0.1, hi=1000.0, bins=20, log=True)
    lstate = histogram_state(df, "v", lspec)
    lbins = {r.bin: r.n for r in lstate.collect()}
    assert None not in lbins and sum(lbins.values()) == 3
    assert lbins.get(0, 0) >= 1  # the -5.0 row
    with pytest.raises(ValueError):
        HistogramSpec(lo=5.0, hi=5.0)
    with pytest.raises(ValueError):
        HistogramSpec(lo=0.0, hi=1.0, log=True)


def test_interval_join_rejects_submicro_granule(spark, pts, ivs):
    with pytest.raises(ValueError):
        interval_join(pts, ivs, granule_seconds=5e-7)


def test_interval_join_pre_epoch_timestamps(spark):
    """Negative unix micros: `div` truncates toward zero (not floor), which
    is still monotonic — containment must survive granule ids around 0."""
    pts = spark.createDataFrame(
        [(i, float(s)) for i, s in enumerate(range(-3600, 3600, 97))],
        "pid long, sec double",
    ).select("pid", F.timestamp_seconds(F.col("sec")).alias("ts"))
    ivs = spark.createDataFrame(
        [(0, -3000.0, -20.0), (1, -100.0, 150.0), (2, 30.0, 3500.0)],
        "iv_id long, s double, e double",
    ).select(
        "iv_id",
        F.timestamp_seconds(F.col("s")).alias("start"),
        F.timestamp_seconds(F.col("e")).alias("end"),
    )
    got = {(r.pid, r.iv_id) for r in
           interval_join(pts, ivs, granule_seconds=60.0).collect()}
    p, v = pts.toPandas(), ivs.toPandas()
    exp = {(a.pid, b.iv_id) for a in p.itertuples() for b in v.itertuples()
           if b.start <= a.ts < b.end}
    assert got == exp and len(exp) > 0
