"""Leakage-safe feature normalization (z-score / min-max / robust).

The fit/transform split is the point: ``fit_normalizer`` computes per-group
statistics from a TRAINING frame only, and ``apply_normalizer`` joins those
statistics onto any frame (train, validation, live) — the standard guard
against train/test contamination through normalization statistics, the
same zero-leakage discipline the engine's as-of/backfill ops enforce for
temporal features.

Scale design: the stats table is |groups| x |cols| — tiny relative to the
fact table — and is broadcast into the transform join, so applying a
normalizer never shuffles the data being normalized. Fitting is one hash
aggregation (map-side partial) per call; the robust method's median/IQR
use ``percentile_approx`` (mergeable sketch, bounded memory per group)
because exact per-group percentiles of a 100 TB frame are the one thing
you never want to sort for — rank error 1/accuracy is far below any
normalization-relevant scale.

NaN/zero-spread convention: a group whose spread is 0 (constant feature)
or whose stats are NaN normalizes to NaN (guarded division), never ±inf —
downstream NaN guards treat it as "no signal", matching the engine-wide
convention.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from feature_extraction_spark.functions.text import nan_guard_div

METHODS = ("zscore", "minmax", "robust")


def fit_normalizer(
    train: DataFrame,
    cols: Sequence[str],
    group_cols: Sequence[str] = (),
    method: str = "zscore",
    accuracy: int = 10_000,
) -> DataFrame:
    """Per-group normalization statistics from the training frame only.

    Returns one row per group with ``<col>__center`` / ``<col>__spread``:
    zscore -> mean / stddev_pop; minmax -> min / (max - min);
    robust -> approx median / IQR (percentile_approx, mergeable)."""
    if method not in METHODS:
        raise ValueError(f"unknown method {method!r}; expected one of {METHODS}")
    aggs = []
    for c in cols:
        x = F.col(c).cast("double")
        if method == "zscore":
            center, spread = F.avg(x), F.stddev_pop(x)
        elif method == "minmax":
            center = F.min(x)
            spread = F.max(x) - F.min(x)
        else:
            q = F.percentile_approx(x, F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)), F.lit(accuracy))
            center = F.element_at(q, 2)
            spread = F.element_at(q, 3) - F.element_at(q, 1)
        aggs.append(center.alias(f"{c}__center"))
        aggs.append(spread.alias(f"{c}__spread"))
    g = train.groupBy(*group_cols) if group_cols else train.groupBy()
    return g.agg(*aggs)


def apply_normalizer(
    df: DataFrame,
    stats: DataFrame,
    cols: Sequence[str],
    group_cols: Sequence[str] = (),
    suffix: str = "_norm",
) -> DataFrame:
    """Join the (broadcast) stats table and emit ``<col><suffix>`` =
    (x - center) / spread with NaN-guarded division. Groups unseen at fit
    time get NULL stats -> NaN normalized values (the engine-wide
    "no signal" marker — visible, not silently passed through)."""
    joined = (
        df.join(F.broadcast(stats), on=list(group_cols), how="left")
        if group_cols
        else df.crossJoin(F.broadcast(stats))
    )
    for c in cols:
        joined = joined.withColumn(
            f"{c}{suffix}",
            nan_guard_div(
                F.col(c).cast("double") - F.col(f"{c}__center"),
                F.col(f"{c}__spread"),
            ),
        )
    return joined.drop(*[f"{c}__center" for c in cols]).drop(
        *[f"{c}__spread" for c in cols]
    )


def normalize_features(
    df: DataFrame,
    cols: Sequence[str],
    group_cols: Sequence[str] = (),
    method: str = "zscore",
    train: DataFrame | None = None,
    suffix: str = "_norm",
) -> DataFrame:
    """Fit on ``train`` (defaults to ``df`` itself — the no-split case) and
    transform ``df``. Pass the training slice explicitly whenever one
    exists; fitting on the frame being transformed leaks evaluation rows
    into the statistics."""
    stats = fit_normalizer(train if train is not None else df, cols, group_cols, method)
    return apply_normalizer(df, stats, cols, group_cols, suffix=suffix)
