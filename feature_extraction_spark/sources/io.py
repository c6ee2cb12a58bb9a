"""Table IO (reference S1/S8-S11 collapsed into real table sinks).

The reference writes one CSV per entity then re-unions them in a second
process (agg_timing_features.py:18-39) — its hand-rolled partial/final
exchange. Under Spark that is a single partitioned write; the union stage
disappears.

Iceberg is the intended production format (`BASELINE.json`): `write_table`
uses the `iceberg` format when a catalog is configured on the session and
transparently falls back to parquet here (no Iceberg runtime jar in this
sandbox). Either way the layout decisions are the same: partition by a
low-cardinality derived column (day), sort within files by the entity key
for row-group skipping.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _iceberg_available(spark: SparkSession) -> bool:
    try:
        return bool(
            spark.conf.get("spark.sql.catalog.spark_catalog", None)
            or spark.conf.get("spark.sql.catalog.local", None)
        )
    except Exception:
        return False


def read_transcripts(spark: SparkSession, path_or_table: str) -> DataFrame:
    """Load the canonical transcripts table from an Iceberg table name or a
    parquet path; normalizes ts to session-TZ TIMESTAMP."""
    if "/" not in path_or_table and _iceberg_available(spark):
        df = spark.read.format("iceberg").load(path_or_table)
    else:
        df = spark.read.parquet(path_or_table)
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition a narrow scan up to the cluster's default parallelism so
    heavy per-row expressions (shingling, hashing, UDF kernels) use every
    core.

    A single small parquet file arrives as ONE input split, serializing all
    downstream projection work onto one task regardless of cluster size. At
    real scale (many files / Iceberg manifests) the scan already has >=
    defaultParallelism splits and this is a no-op — the check is on the
    *physical* partition count, so the round-robin shuffle (cost: one pass
    over the raw rows, tiny next to the per-row work it parallelizes) only
    happens when the input is pathologically under-split."""
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def write_table(
    df: DataFrame,
    path_or_table: str,
    partition_by: list[str] | None = None,
    sort_within_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Feature-matrix sink. At 100 TB: partition pruning by `partition_by`
    (e.g. day), file-internal ordering by entity for min/max skipping."""
    if sort_within_by:
        df = df.sortWithinPartitions(*sort_within_by)
    spark = df.sparkSession
    if "/" not in path_or_table and _iceberg_available(spark):
        w = df.writeTo(path_or_table)
        if partition_by:
            w = w.partitionedBy(*[F.col(c) for c in partition_by])
        w.createOrReplace()
        return
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path_or_table)
