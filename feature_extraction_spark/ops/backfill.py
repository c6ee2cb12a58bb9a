"""Backfill (last-observation-carried-forward) — W7, north_rule requirement.

Fill missing values strictly from EARLIER timestamps within the same
conversation: ``last(value, ignorenulls=True)`` over a frame ending at the
current row. Leakage-free by construction (no following rows in the frame).
Forward-fill from future rows is deliberately not offered.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from feature_extraction_spark.ops.windows import ORDER_COLS


def backfill(
    df: DataFrame,
    cols: list[str],
    partition_cols: list[str] | None = None,
    order_cols: list[str] | None = None,
    suffix: str = "_filled",
) -> DataFrame:
    w = (
        Window.partitionBy(*(partition_cols or ["conv_id"]))
        .orderBy(*(order_cols or ORDER_COLS))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    for c in cols:
        df = df.withColumn(f"{c}{suffix}", F.last(c, ignorenulls=True).over(w))
    return df
