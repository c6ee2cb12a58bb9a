"""Sequence packing (ops/pack.py): exactly-once membership, capacity,
fill-ratio floor, oversize handling, determinism across physical layouts."""

import pyspark.sql.functions as F

from feature_extraction_spark.ops.pack import pack_sequences


def _items(spark, n=2000, seed=7):
    return spark.range(0, n).select(
        F.col("id").alias("doc_id"),
        (F.pmod(F.xxhash64("id", F.lit(seed)), 500) + 10).alias("n_tokens"),
    )


def test_pack_capacity_and_membership(spark):
    items = _items(spark)
    packs = pack_sequences(items, max_tokens=1024, num_partitions=8)
    pdf = packs.toPandas()
    assert (pdf[~pdf.oversize].total_tokens <= 1024).all()
    # every item appears in exactly one pack
    seen = [i for ids in pdf.ids for i in ids]
    assert len(seen) == items.count()
    assert len(set(seen)) == len(seen)
    # token accounting is exact
    assert pdf.total_tokens.sum() == items.agg(F.sum("n_tokens")).collect()[0][0]


def test_pack_fill_ratio_floor(spark):
    """FFD on a uniform length mix must fill well: overall fill >= 0.9
    (the waste bound that makes packing worth a shuffle)."""
    items = _items(spark, n=5000)
    pdf = pack_sequences(items, max_tokens=2048, num_partitions=8).toPandas()
    total = pdf.total_tokens.sum()
    capacity = len(pdf[~pdf.oversize]) * 2048 + pdf[pdf.oversize].total_tokens.sum()
    assert total / capacity >= 0.9, total / capacity


def test_pack_oversize_singletons(spark):
    items = spark.createDataFrame(
        [(1, 100), (2, 5000), (3, 200), (4, 9000)], "doc_id long, n_tokens long"
    )
    pdf = pack_sequences(items, max_tokens=1024, num_partitions=2).toPandas()
    over = pdf[pdf.oversize]
    assert sorted(i for ids in over.ids for i in ids) == [2, 4]
    assert (over.n_items == 1).all()
    normal = pdf[~pdf.oversize]
    assert sorted(i for ids in normal.ids for i in ids) == [1, 3]


def test_pack_deterministic_across_input_layout(spark):
    """Same items, different physical partitioning -> identical packs
    (the hash scatter is a pure function of the id)."""
    items = _items(spark, n=1500)
    a = pack_sequences(items, max_tokens=1024, num_partitions=8).toPandas()
    b = pack_sequences(
        items.repartition(33).sortWithinPartitions(F.desc("doc_id")),
        max_tokens=1024,
        num_partitions=8,
    ).toPandas()

    def canon(pdf):
        return sorted(
            (r.pack_id, tuple(sorted(r.ids)), r.total_tokens)
            for r in pdf.itertuples()
        )

    assert canon(a) == canon(b)


def test_pack_composes_with_chunking(spark, transcripts):
    """chunk -> pack end-to-end: every chunk packed once, no pack overflows."""
    from feature_extraction_spark.ops.chunk import chunk_documents

    docs = transcripts.select(
        F.concat_ws("#", "conv_id", F.col("turn_idx").cast("string")).alias(
            "doc_id"
        ),
        "text",
    )
    chunks = chunk_documents(docs, max_tokens=64, overlap=0).withColumn(
        "chunk_id", F.concat_ws("@", "doc_id", F.col("chunk_idx").cast("string"))
    )
    packs = pack_sequences(
        chunks, id_col="chunk_id", tokens_col="n_tokens", max_tokens=256,
        num_partitions=8,
    )
    pdf = packs.toPandas()
    assert (pdf.total_tokens <= 256).all()  # chunks are <=64, never oversize
    seen = [i for ids in pdf.ids for i in ids]
    assert len(seen) == chunks.count() and len(set(seen)) == len(seen)
