"""Leakage-safe normalization: pandas parity, fit/transform isolation,
NaN conventions, broadcast-join plan shape."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from feature_extraction_spark.ops.normalize import (
    apply_normalizer,
    fit_normalizer,
    normalize_features,
)


@pytest.fixture(scope="module")
def vals(spark):
    rows = [
        ("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 10.0),
        ("b", 5.0), ("b", 5.0), ("b", 5.0),
        ("c", None), ("c", 7.0),
    ]
    return spark.createDataFrame(rows, "grp string, x double")


def test_zscore_parity(vals):
    got = normalize_features(vals, ["x"], ["grp"]).toPandas()
    pdf = vals.toPandas()
    for g, sub in pdf.groupby("grp"):
        mu = sub["x"].mean()
        sd = sub["x"].std(ddof=0)
        for _, r in got[got["grp"] == g].iterrows():
            if pd.isna(r["x"]):
                assert pd.isna(r["x_norm"])
            elif sd == 0:
                assert np.isnan(r["x_norm"])  # constant group -> NaN, not inf
            else:
                assert np.allclose(r["x_norm"], (r["x"] - mu) / sd)


def test_minmax_parity(vals):
    got = normalize_features(vals, ["x"], ["grp"], method="minmax").toPandas()
    sub = got[got["grp"] == "a"].sort_values("x")
    assert np.allclose(sub["x_norm"].tolist(), [0.0, 1 / 9, 2 / 9, 1.0])


def test_robust_centers_on_median(spark):
    df = spark.range(101).select((F.col("id").cast("double")).alias("x"))
    got = normalize_features(df, ["x"], method="robust").toPandas()
    mid = got[got["x"] == 50.0]["x_norm"].iloc[0]
    assert abs(mid) < 1e-9  # median maps to 0
    hi = got[got["x"] == 75.0]["x_norm"].iloc[0]
    assert np.allclose(hi, 0.5)  # 75th pct is half an IQR above the median


def test_fit_transform_no_leakage(spark):
    """Stats must come from the train slice only: transforming the eval
    slice with train stats reproduces hand-computed train mean/std."""
    train = spark.createDataFrame([("a", 0.0), ("a", 2.0)], "grp string, x double")
    ev = spark.createDataFrame([("a", 100.0)], "grp string, x double")
    stats = fit_normalizer(train, ["x"], ["grp"])
    out = apply_normalizer(ev, stats, ["x"], ["grp"]).collect()[0]
    assert np.allclose(out["x_norm"], (100.0 - 1.0) / 1.0)


def test_unseen_group_yields_nan(spark):
    train = spark.createDataFrame([("a", 1.0), ("a", 3.0)], "grp string, x double")
    ev = spark.createDataFrame([("zzz", 5.0)], "grp string, x double")
    stats = fit_normalizer(train, ["x"], ["grp"])
    out = apply_normalizer(ev, stats, ["x"], ["grp"]).collect()[0]
    assert out["x_norm"] is not None and np.isnan(out["x_norm"])


def test_apply_is_broadcast_join(vals):
    stats = fit_normalizer(vals, ["x"], ["grp"])
    plan = (
        apply_normalizer(vals, stats, ["x"], ["grp"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan
