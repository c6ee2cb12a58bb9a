"""Categorical diversity features: Shannon entropy, normalized entropy,
and Gini impurity of a categorical column per group — the standard
behavioral-diversity feature family (how varied is a user's event mix, a
conversation's speaker mix, a domain's document-type mix).

Scale design: TWO hash aggregations and nothing else — no window, no join,
no shuffle beyond the two agg exchanges. The entropy is computed from the
per-(group, category) counts via the identity

    H = -sum_c (n_c/n) ln(n_c/n) = ln(n) - (1/n) sum_c n_c ln(n_c)

so the second aggregation needs only sum(n_c), count(c), sum(n_c ln n_c),
and sum(n_c^2) (for Gini) — all map-side combinable. NULL categories count
as their own category (visible, not dropped).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def categorical_entropy(
    df: DataFrame,
    cat_col: str,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Per-group diversity of ``cat_col``: returns one row per group with

    - ``n``: rows in the group; ``n_cats``: distinct categories
    - ``entropy``: Shannon entropy (natural log) of the category
      distribution; 0.0 for a single-category group
    - ``norm_entropy``: entropy / ln(n_cats) in [0, 1]; NaN for a
      single-category group (no diversity scale to normalize by — the
      engine-wide visible no-signal marker, never a silent 0 or 1)
    - ``gini``: Gini impurity 1 - sum p_c^2 in [0, 1)
    """
    per_cat = df.groupBy(*group_cols, cat_col).agg(
        F.count(F.lit(1)).alias("_c")
    )
    c = F.col("_c").cast("double")
    g = per_cat.groupBy(*group_cols) if group_cols else per_cat.groupBy()
    agg = g.agg(
        F.sum("_c").alias("n"),
        F.count(F.lit(1)).alias("n_cats"),
        F.sum(c * F.log(c)).alias("_clnc"),
        F.sum(c * c).alias("_c2"),
    )
    n = F.col("n").cast("double")
    entropy = F.log(n) - F.col("_clnc") / n
    return agg.select(
        *group_cols,
        "n",
        "n_cats",
        entropy.alias("entropy"),
        F.when(
            F.col("n_cats") > 1, entropy / F.log(F.col("n_cats").cast("double"))
        )
        .otherwise(F.lit(float("nan")))
        .alias("norm_entropy"),
        (F.lit(1.0) - F.col("_c2") / (n * n)).alias("gini"),
    )
