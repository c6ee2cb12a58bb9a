"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with typed metadata structs;
decode/feature-extraction runs in Arrow-batched pandas UDFs via mapInPandas.
The actual codecs (PIL/librosa/ffmpeg) are NOT in this container, so the
decode kernels are stubbed: ``decode_stub=True`` (default) produces
deterministic fake features so the Spark-side plumbing — schema, batching,
partitioning — is fully real and tested; with ``decode_stub=False`` the
kernel raises NotImplementedError where the codec call belongs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                    T.StructField("mime", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("feat", T.ArrayType(T.FloatType()), True),
    ]
)


def synth_media(spark, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic fake media table: payload = seeded pseudo-random bytes.

    Every column is expressible in portable ANSI SQL (modulo kind mapping,
    sha256-hex payload) so downstream feature extraction over this table can
    be value-verified against a DuckDB oracle; only ``meta.duration_ms``
    keeps a Spark-specific hash (never consumed by the image kernel)."""
    return spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.pmod(F.col("id"), F.lit(3)) + 1).cast("int"),
        ).alias("kind"),
        F.sha2(F.concat(F.lit(str(seed)), F.col("id").cast("string")), 256)
        .cast("binary")
        .alias("payload"),
        F.struct(
            F.lit(64).alias("width"),
            F.lit(64).alias("height"),
            F.lit(16000).alias("sample_rate"),
            (F.pmod(F.xxhash64("id", F.lit(seed + 1)), F.lit(60_000)))
            .alias("duration_ms"),
            F.lit("application/octet-stream").alias("mime"),
        ).alias("meta"),
    )


def extract_image_features(
    media: DataFrame,
    dim: int = 8,
    decode_stub: bool = True,
    batch_partitions: int | None = None,
) -> DataFrame:
    """Arrow-batched feature extraction over image payloads.

    Real plumbing: mapInPandas with an explicit output schema, repartitioned
    so each task sees a bounded byte volume (at 100 TB the repartition count
    comes from bytes/task targets, not row counts). STUB kernel: features are
    a deterministic hash-fold of the payload bytes; swap `_decode` for a real
    codec when available."""

    def _decode(payload: bytes) -> list[float]:
        if not decode_stub:
            raise NotImplementedError(
                "image codec not available in this environment; "
                "plug PIL/torchvision decode here"
            )
        # deterministic fake: fold payload bytes into `dim` floats
        acc = [0] * dim
        for i, b in enumerate(payload or b""):
            acc[i % dim] = (acc[i % dim] * 31 + b) % 100_003
        return [a / 100_003.0 for a in acc]

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["payload"].map(
                        lambda p: len(p) if p is not None else 0
                    ),
                    "feat": pdf["payload"].map(_decode),
                }
            )

    imgs = media.filter(F.col("kind") == "image").select("media_id", "payload")
    if batch_partitions:
        imgs = imgs.repartition(batch_partitions)
    return imgs.mapInPandas(kernel, schema=IMAGE_FEATURES_SCHEMA)
