"""Sequence packing: combine short items (documents / chunks) into
near-full fixed-token training sequences — the standard dataloader
efficiency transform (padding waste -> throughput) downstream of
``ops/chunk.chunk_documents``.

Bin packing is inherently sequential, so the distributed shape is the one
production pipelines use: DETERMINISTIC scatter, then first-fit-decreasing
(FFD) within each partition.

1. items are repartitioned by ``xxhash64(id) mod P`` — a pure function of
   the id, so pack assignments are reproducible run-to-run and independent
   of the input's physical partitioning (unlike raw ``repartition(P)``,
   which round-robins from arbitrary input splits). The hash also MIXES
   lengths uniformly across partitions; FFD fills best on mixed lengths
   (range-partitioning by length would segregate the long items and cap
   fill at item/max).
2. within a partition: sort by (tokens desc, id), first-fit into open
   packs (pandas kernel via ``mapInPandas`` — the per-partition batch
   iterator is drained, packing state is O(open packs)). FFD guarantees
   <= (11/9)OPT + 1 packs; empirically ~0.9+ fill on natural length mixes.

Items longer than ``max_tokens`` become singleton packs flagged
``oversize`` (chunk first if that matters). Global pack ids compose
(partition id, local index).

No driver/DuckDB oracle: an FFD loop is not SQL-expressible; correctness
is property-tested instead (exactly-once membership, capacity, fill-ratio
floor, cross-run determinism) in tests/test_pack.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    max_tokens: int = 2048,
    num_partitions: int | None = None,
) -> DataFrame:
    """Pack items into sequences of at most ``max_tokens`` total tokens.

    Returns one row per pack: (pack_id, ids, n_items, total_tokens,
    fill_ratio, oversize)."""
    id_type = df.schema[id_col].dataType
    out_schema = T.StructType(
        [
            T.StructField("pack_id", T.StringType()),
            T.StructField("ids", T.ArrayType(id_type)),
            T.StructField("n_items", T.IntegerType()),
            T.StructField("total_tokens", T.LongType()),
            T.StructField("fill_ratio", T.DoubleType()),
            T.StructField("oversize", T.BooleanType()),
        ]
    )

    p = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    items = (
        df.select(F.col(id_col).alias("id"), F.col(tokens_col).cast("long").alias("n"))
        .repartition(p, F.pmod(F.xxhash64(F.col(id_col).cast("string")), F.lit(p)))
        .withColumn("_pid", F.spark_partition_id())
    )

    def _pack(batches):
        import pandas as pd

        parts = list(batches)
        if not parts:
            return
        pdf = pd.concat(parts, ignore_index=True)
        if len(pdf) == 0:
            return
        pdf = pdf.sort_values(["n", "id"], ascending=[False, True])
        part = int(pdf["_pid"].iloc[0])
        packs: list[list] = []  # [remaining, ids, total]
        oversize_rows = []
        for id_, n in zip(pdf["id"], pdf["n"]):
            n = int(n)
            if n > max_tokens:
                oversize_rows.append(([id_], n))
                continue
            for b in packs:
                if b[0] >= n:
                    b[0] -= n
                    b[1].append(id_)
                    b[2] += n
                    break
            else:
                packs.append([max_tokens - n, [id_], n])
        rows = [
            (
                f"{part}_{i}",
                ids,
                len(ids),
                total,
                total / max_tokens,
                False,
            )
            for i, (_, ids, total) in enumerate(packs)
        ] + [
            (f"{part}_x{i}", ids, 1, total, total / max_tokens, True)
            for i, (ids, total) in enumerate(oversize_rows)
        ]
        yield pd.DataFrame(
            rows,
            columns=[
                "pack_id", "ids", "n_items", "total_tokens",
                "fill_ratio", "oversize",
            ],
        )

    return items.mapInPandas(_pack, schema=out_schema)
