"""Distributed table profiler: per-column null rate, exact distinct
count, and the modal value — the pre-flight every large-scale ingest
runs before committing partition/join/encoding decisions (and the thing
you consult before choosing broadcast candidates, salting keys, or
dictionary encodings at 100 TB).

Plan shape: ONE corpus pass builds a (column, value) frequency table via
an inline unpivot (explode of a literal struct array — a generator, no
shuffle), then ONE map-combinable shuffle at (column, value) grain. The
frequency table has THREE consumers (stats, the argmax join's both
sides); left lazy each would re-run the corpus scan, so it is
materialized once at construction (dimension-sized; localCheckpoint by
default, snapshot-committed with ``checkpoint_dir`` — the PMI pair-table
contract, ops/lm.py). All remaining aggregates (distincts, null counts,
argmax-by-count) run over that table; the corpus is never scanned or
shuffled again (plan-asserted: exactly one FileScan). The modal value
uses a deterministic two-step argmax (max count, then MIN value among
ties) instead of a window — no single-partition WindowExec anywhere.

Values are profiled as strings (cast once in the unpivot): the profile
is a diagnostic surface, and string grain makes one frequency table
serve every input type. For extreme-cardinality columns compose with
ops/sketches (HLL distincts, Misra-Gries heavy hitters) instead — this
op is the EXACT profiler.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["profile_table"]


def profile_table(
    df: DataFrame,
    cols: list[str] | None = None,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Profile ``cols`` (default: all) into one row per column:
    (column, n_rows, n_null, n_distinct, top_value, top_count).

    - n_distinct counts NON-NULL distinct values (NULL is reported via
      n_null, not as a distinct value).
    - top_value/top_count: the most frequent non-null value; ties break
      to the smallest value (string order). All-NULL columns report
      n_distinct 0 and NULL top_value/top_count.
    """
    cols = list(cols) if cols is not None else list(df.columns)
    if not cols:
        raise ValueError("no columns to profile")
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"unknown columns: {missing}")

    pairs = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col(c).cast("string").alias("value"),
            )
            for c in cols
        ]
    )
    from feature_extraction_spark.sources.snapshots import materialize

    # generator, not a join/shuffle: each row fans out to len(cols) rows
    freq = (
        df.select(F.explode(pairs).alias("p"))
        .select("p.column", "p.value")
        .groupBy("column", "value")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # 3 consumers below — materialize so the corpus is scanned exactly once
    freq = materialize(freq, checkpoint_dir, name="profile_freq")
    stats = freq.groupBy("column").agg(
        F.sum("cnt").alias("n_rows"),
        F.coalesce(
            F.sum(F.when(F.col("value").isNull(), F.col("cnt"))), F.lit(0)
        ).alias("n_null"),
        F.count(F.when(F.col("value").isNotNull(), F.lit(1))).alias(
            "n_distinct"
        ),
        F.max(F.when(F.col("value").isNotNull(), F.col("cnt"))).alias(
            "_top_cnt"
        ),
    )
    # deterministic argmax: join back on (column, cnt == max), then MIN
    # value among the tied — all on the dimension-sized frequency table
    top = (
        freq.join(
            stats.select("column", "_top_cnt"),
            on=["column"],
            how="inner",
        )
        .filter(
            F.col("value").isNotNull() & (F.col("cnt") == F.col("_top_cnt"))
        )
        .groupBy("column")
        .agg(F.min("value").alias("top_value"))
    )
    return (
        stats.join(top, "column", "left")
        .select(
            "column",
            "n_rows",
            "n_null",
            "n_distinct",
            "top_value",
            F.col("_top_cnt").alias("top_count"),
        )
        .orderBy("column")
    )
