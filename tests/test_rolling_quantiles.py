"""Exact rolling trailing-window quantiles: Spark vs numpy type-7 parity,
NULL-sample semantics, single-exchange plan."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from feature_extraction_spark.ops.windows import rolling_quantiles

ROWS = [
    # (uid, seq, value)
    (1, 1, 10.0), (1, 2, 3.0), (1, 3, 7.5), (1, 4, None), (1, 5, 1.0),
    (1, 6, 99.0), (1, 7, 2.0),
    (2, 1, 5.0),
    (3, 1, None), (3, 2, None), (3, 3, 4.0),
]


def model(rows, k, qs):
    out = {}
    by_uid = {}
    for uid, seq, v in sorted(rows):
        by_uid.setdefault(uid, []).append((seq, v))
    for uid, items in by_uid.items():
        for i, (seq, _) in enumerate(items):
            window = [v for _, v in items[max(0, i - k + 1) : i + 1] if v is not None]
            for q in qs:
                key = (uid, seq, q)
                out[key] = (
                    float(np.percentile(window, q * 100)) if window else float("nan")
                )
    return out


@pytest.mark.parametrize("k", [3, 10])
def test_rolling_quantile_parity(spark, k):
    df = spark.createDataFrame(ROWS, "uid long, seq long, value double")
    qs = (0.25, 0.5, 0.75)
    got = rolling_quantiles(
        df, "value", part_cols=("uid",), order_cols=("seq",),
        trailing_rows=k, quantiles=qs,
    ).collect()
    exp = model(ROWS, k, qs)
    assert len(got) == len(ROWS)
    for r in got:
        for q in qs:
            col = f"roll_value_q{int(q * 100)}_{k}"
            assert np.allclose(r[col], exp[(r.uid, r.seq, q)], equal_nan=True), (
                f"uid={r.uid} seq={r.seq} q={q}: {r[col]} != {exp[(r.uid, r.seq, q)]}"
            )


def test_all_null_window_is_nan(spark):
    df = spark.createDataFrame(ROWS, "uid long, seq long, value double")
    out = {
        (r.uid, r.seq): r["roll_value_q50_3"]
        for r in rolling_quantiles(
            df, "value", part_cols=("uid",), order_cols=("seq",),
            trailing_rows=3, quantiles=(0.5,),
        ).collect()
    }
    assert np.isnan(out[(3, 1)]) and np.isnan(out[(3, 2)])
    assert out[(3, 3)] == 4.0


def test_single_exchange_plan(spark):
    df = spark.createDataFrame(ROWS, "uid long, seq long, value double")
    plan = (
        rolling_quantiles(df, "value", part_cols=("uid",), order_cols=("seq",))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") <= 1
    assert "EvalPython" not in plan
