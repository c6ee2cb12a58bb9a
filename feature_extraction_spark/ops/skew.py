"""Key-skew diagnosis: the operational tool behind "explicit skew
handling" (BASELINE.json north_star — salted repartitioning by conv_id +
AQE skew joins need to know WHICH keys are hot before choosing a salt
factor or a broadcast threshold).

``skew_report`` is one map-combinable groupBy over the key (the same
shuffle any keyed op would do anyway) followed by window ranking over the
ALREADY-AGGREGATED key table — corpus rows never sort, only |keys| rows
do. At 100 TB this is the cheap pre-flight that tells you whether the
long-tail conversation (or user, or domain) will dominate a shuffle stage
and what salt factor bounds the largest task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["skew_report"]


def skew_report(
    df: DataFrame, keys: list[str], top_n: int = 10
) -> DataFrame:
    """Top-``top_n`` heaviest key groups with corpus-level skew context.

    Output per heavy key: the key columns, ``n_rows``, ``share`` (of all
    rows), ``skew_factor`` (n_rows / mean rows-per-key — the salt factor
    that would level this key), ``rank``. Deterministic tie-break on the
    key columns. One shuffle (the groupBy); the windows run over the
    aggregated key table with a single global partition, which is safe
    ONLY because it holds one row per key-combination after aggregation —
    at extreme cardinality pre-filter with a heavy-hitter sketch
    (ops/sketches.misra_gries) and pass the survivors through here.
    """
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_rows"))
    # dimension-sized global window (one row per key) — see docstring
    w = Window.partitionBy()
    order = [F.desc("n_rows")] + [F.col(k) for k in keys]
    return (
        counts.withColumn("_total", F.sum("n_rows").over(w))
        .withColumn("_nkeys", F.count(F.lit(1)).over(w))
        .withColumn("rank", F.row_number().over(Window.orderBy(*order)))
        .filter(F.col("rank") <= top_n)
        .select(
            *keys,
            "n_rows",
            (F.col("n_rows") / F.col("_total")).alias("share"),
            (
                F.col("n_rows") / (F.col("_total") / F.col("_nkeys"))
            ).alias("skew_factor"),
            "rank",
        )
    )
