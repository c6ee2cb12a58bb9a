"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with typed metadata structs;
decode/feature-extraction runs in Arrow-batched pandas UDFs via mapInPandas.
Compressed codecs (JPEG/PNG via PIL, audio via librosa/ffmpeg) are NOT in
this container, so those kernels are stubbed: ``decode_stub=True``
(default) produces deterministic fake features so the Spark-side plumbing
— schema, batching, partitioning — is fully real and tested; with
``decode_stub=False`` the kernel raises NotImplementedError where the
codec call belongs.

One REAL codec is implemented from scratch: uncompressed 24-bit BMP
(``encode_bmp``/``decode_bmp``, pure numpy over the binary column — file
header, BITMAPINFOHEADER, bottom-up rows, 4-byte row padding, BGR order).
``extract_bmp_stats`` decodes actual pixels distributedly and emits
dimension + per-channel mean statistics, demonstrating the full
binary-payload path end to end without any external imaging library.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
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


# ---------------------------------------------------------------------------
# Real from-scratch codec: uncompressed 24-bit BMP (BITMAPINFOHEADER, BI_RGB)
# ---------------------------------------------------------------------------

_BMP_PIXEL_OFFSET = 54  # 14-byte file header + 40-byte BITMAPINFOHEADER


def encode_bmp(pixels_bgr: np.ndarray) -> bytes:
    """Serialize an (h, w, 3) uint8 array (BGR channel order, row 0 = top)
    into a standard uncompressed 24-bit BMP: rows stored bottom-up, each
    padded to a 4-byte boundary."""
    if pixels_bgr.ndim != 3 or pixels_bgr.shape[2] != 3:
        raise ValueError("expected an (h, w, 3) array")
    h, w, _ = pixels_bgr.shape
    stride = (w * 3 + 3) // 4 * 4
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = pixels_bgr[::-1].reshape(h, w * 3)  # bottom-up
    size = _BMP_PIXEL_OFFSET + h * stride
    file_hdr = struct.pack("<2sIHHI", b"BM", size, 0, 0, _BMP_PIXEL_OFFSET)
    # BITMAPINFOHEADER: size, width, height(+ = bottom-up), planes, bpp,
    # compression(0 = BI_RGB), image size, x/y ppm, palette counts
    info_hdr = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, h * stride, 2835, 2835, 0, 0
    )
    return file_hdr + info_hdr + rows.tobytes()


def decode_bmp(payload: bytes) -> np.ndarray:
    """Parse an uncompressed 24-bit BMP into an (h, w, 3) uint8 array in
    BGR order with row 0 = top. Validates magic, bit depth, and
    compression; supports top-down files (negative height) and arbitrary
    pixel-data offsets."""
    if payload is None or len(payload) < _BMP_PIXEL_OFFSET:
        raise ValueError("not a BMP: payload too short")
    if payload[:2] != b"BM":
        raise ValueError("not a BMP: bad magic")
    (pixel_off,) = struct.unpack_from("<I", payload, 10)
    hdr_size, w, h_signed = struct.unpack_from("<Iii", payload, 14)
    planes, bpp, compression = struct.unpack_from("<HHI", payload, 26)
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    if bpp != 24 or compression != 0:
        raise ValueError(f"only 24-bit BI_RGB supported (bpp={bpp}, "
                         f"compression={compression})")
    bottom_up = h_signed > 0
    h = abs(h_signed)
    stride = (w * 3 + 3) // 4 * 4
    need = pixel_off + h * stride
    if len(payload) < need:
        raise ValueError(f"truncated BMP: {len(payload)} < {need} bytes")
    rows = np.frombuffer(payload, dtype=np.uint8,
                         count=h * stride, offset=pixel_off).reshape(h, stride)
    px = rows[:, : w * 3].reshape(h, w, 3)
    return px[::-1] if bottom_up else px


def _synth_pixels_bgr(media_id: int, w: int, h: int) -> np.ndarray:
    """Deterministic pixel field, re-derivable in portable SQL: the stored
    channel c (0=B,1=G,2=R) of pixel (row y from top, col x) is
    ``(media_id*31 + y*17 + x*5 + c*11) % 256``."""
    y = np.arange(h, dtype=np.int64)[:, None, None]
    x = np.arange(w, dtype=np.int64)[None, :, None]
    c = np.arange(3, dtype=np.int64)[None, None, :]
    return ((media_id * 31 + y * 17 + x * 5 + c * 11) % 256).astype(np.uint8)


BMP_MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
    ]
)

BMP_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("mean_r", T.DoubleType(), True),
        T.StructField("mean_g", T.DoubleType(), True),
        T.StructField("mean_b", T.DoubleType(), True),
    ]
)


def synth_media_bmp(spark, n: int = 100) -> DataFrame:
    """Deterministic REAL-BMP media table: image media_id gets dimensions
    ``w = 8 + media_id % 9``, ``h = 8 + (media_id*3) % 9`` (odd widths
    exercise row padding) and the ``_synth_pixels_bgr`` pixel field,
    serialized through ``encode_bmp``. Every decoded statistic is thereby
    re-derivable in ANSI SQL from (media_id, w, h) alone — the DuckDB
    oracle recomputes the channel means without touching BMP bytes, so a
    value match proves the encoder AND decoder round-trip real pixels."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            payloads = []
            for mid in ids:
                w = 8 + int(mid) % 9
                h = 8 + (int(mid) * 3) % 9
                payloads.append(encode_bmp(_synth_pixels_bgr(int(mid), w, h)))
            yield pd.DataFrame(
                {"media_id": ids, "kind": "image", "payload": payloads}
            )

    return spark.range(n).mapInPandas(kernel, schema=BMP_MEDIA_SCHEMA)


def extract_bmp_stats(media: DataFrame, round_digits: int | None = None) -> DataFrame:
    """Distributed real-pixel decode: parse each BMP payload and emit
    (n_bytes, width, height, per-channel means — one exact integer-sum
    division each, bit-identical across engines, so no rounding by
    default). Arrow-batched mapInPandas
    — the decode is vectorized numpy per image, no Python per pixel. At
    100 TB the input repartition comes from bytes/task targets
    (``sources.io.ensure_parallelism`` or an explicit repartition before
    this call); the kernel itself is embarrassingly parallel."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("media_id", "n_bytes", "width", "height",
                                   "mean_r", "mean_g", "mean_b")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                px = decode_bmp(payload)
                h, w, _ = px.shape
                # exact integer sums -> one IEEE division: bit-identical
                # to any other engine computing avg over the same ints
                sums = px.reshape(-1, 3).sum(axis=0, dtype=np.int64)
                cnt = h * w
                means = sums / cnt
                if round_digits is not None:
                    means = means.round(round_digits)
                out["media_id"].append(mid)
                out["n_bytes"].append(len(payload))
                out["width"].append(w)
                out["height"].append(h)
                out["mean_b"].append(means[0])
                out["mean_g"].append(means[1])
                out["mean_r"].append(means[2])
            yield pd.DataFrame(out)

    imgs = media.filter(F.col("kind") == "image").select("media_id", "payload")
    return imgs.mapInPandas(kernel, schema=BMP_STATS_SCHEMA)


# ---------------------------------------------------------------------------
# Real from-scratch codec #2: RIFF/WAVE PCM-16 mono audio
# ---------------------------------------------------------------------------

_WAV_HEADER_BYTES = 44  # RIFF(12) + fmt chunk(8+16) + data chunk header(8)


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Serialize a 1-D int16 sample array into a canonical 44-byte-header
    RIFF/WAVE file: PCM (format 1), mono, 16 bits/sample, little-endian."""
    if samples.ndim != 1:
        raise ValueError("expected a 1-D sample array")
    data = samples.astype("<i2").tobytes()
    byte_rate = sample_rate * 2
    hdr = (
        struct.pack("<4sI4s", b"RIFF", 36 + len(data), b"WAVE")
        + struct.pack(
            "<4sIHHIIHH", b"fmt ", 16, 1, 1, sample_rate, byte_rate, 2, 16
        )
        + struct.pack("<4sI", b"data", len(data))
    )
    return hdr + data


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Parse a RIFF/WAVE PCM-16 mono payload into (int16 samples,
    sample_rate). Walks the chunk list (tolerates extra chunks such as
    LIST/INFO before data), validating magic, audio format, channel count
    and bit depth."""
    if payload is None or len(payload) < _WAV_HEADER_BYTES:
        raise ValueError("not a WAV: payload too short")
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV: bad RIFF/WAVE magic")
    pos, sample_rate, data = 12, None, None
    while pos + 8 <= len(payload):
        cid, size = struct.unpack_from("<4sI", payload, pos)
        body = pos + 8
        if cid == b"fmt ":
            fmt, ch, sr, _br, _ba, bits = struct.unpack_from(
                "<HHIIHH", payload, body
            )
            if fmt != 1 or ch != 1 or bits != 16:
                raise ValueError(
                    f"only PCM-16 mono supported (fmt={fmt}, ch={ch}, "
                    f"bits={bits})"
                )
            sample_rate = sr
        elif cid == b"data":
            if body + size > len(payload):
                raise ValueError("truncated WAV data chunk")
            data = np.frombuffer(payload, dtype="<i2", count=size // 2,
                                 offset=body)
        pos = body + size + (size & 1)  # chunks are word-aligned
    if sample_rate is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    return data, sample_rate


def _synth_samples(media_id: int, n: int) -> np.ndarray:
    """Deterministic int16 sample field, re-derivable in portable SQL:
    sample i of media_id is ``(media_id*7919 + i*2654435761) % 65536 -
    32768`` (all arithmetic in int64 — max |term| ~2e12, far from
    overflow)."""
    i = np.arange(n, dtype=np.int64)
    return ((media_id * 7919 + i * 2654435761) % 65536 - 32768).astype(
        np.int16
    )


WAV_MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
    ]
)

WAV_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_samples", T.LongType(), True),
        T.StructField("duration_ms", T.DoubleType(), True),
        T.StructField("peak", T.IntegerType(), True),
        T.StructField("rms", T.DoubleType(), True),
        T.StructField("mean_amp", T.DoubleType(), True),
    ]
)


def synth_media_wav(spark, n: int = 100) -> DataFrame:
    """Deterministic REAL-WAV media table: media_id gets ``400 + media_id %
    257`` samples at ``8000 + (media_id % 4) * 4000`` Hz with the
    ``_synth_samples`` field, serialized through ``encode_wav``. As with
    the BMP table, every decoded statistic is re-derivable in ANSI SQL
    from media_id alone, so a value match proves the encoder AND decoder
    round-trip real PCM frames."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            payloads = []
            for mid in ids:
                k = 400 + int(mid) % 257
                sr = 8000 + (int(mid) % 4) * 4000
                payloads.append(encode_wav(_synth_samples(int(mid), k), sr))
            yield pd.DataFrame(
                {"media_id": ids, "kind": "audio", "payload": payloads}
            )

    return spark.range(n).mapInPandas(kernel, schema=WAV_MEDIA_SCHEMA)


def extract_wav_stats(media: DataFrame) -> DataFrame:
    """Distributed real-PCM decode: parse each WAV payload and emit
    duration/peak/RMS/mean statistics. Exact int64 sums feed ONE IEEE
    division (+ one correctly-rounded sqrt for RMS), so the doubles are
    bit-identical to any engine computing over the same frames — no
    rounding needed. Arrow-batched mapInPandas, vectorized numpy per clip;
    embarrassingly parallel, parallelism set by the upstream partitioning
    (bytes/task targets at scale, as with extract_bmp_stats)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "media_id", "n_bytes", "sample_rate", "n_samples",
                "duration_ms", "peak", "rms", "mean_amp",
            )}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                s, sr = decode_wav(payload)
                s64 = s.astype(np.int64)
                k = len(s64)
                out["media_id"].append(mid)
                out["n_bytes"].append(len(payload))
                out["sample_rate"].append(sr)
                out["n_samples"].append(k)
                out["duration_ms"].append(k * 1000.0 / sr)
                out["peak"].append(int(np.abs(s64).max()) if k else 0)
                out["rms"].append(
                    float(np.sqrt((s64 * s64).sum() / k)) if k else 0.0
                )
                out["mean_amp"].append(float(s64.sum() / k) if k else 0.0)
            yield pd.DataFrame(out)

    clips = media.filter(F.col("kind") == "audio").select("media_id", "payload")
    return clips.mapInPandas(kernel, schema=WAV_STATS_SCHEMA)
