"""Streaming point-in-time enrichment.

``stream_asof_enrich`` runs the engine's as-of join on a STREAM of turns
against a static (slowly-changing) dimension time-series: each arriving
turn gets the latest dimension row at-or-before its event time — the same
zero-leakage guarantee as the batch op, in micro-batch streaming.

It reuses ``ops.asof.asof_join_broadcast`` verbatim: the static side packs
into per-key sorted arrays (a static aggregation, computed once and
broadcast), the stream side is enriched by an equi-join + JVM array filter
— a stateless stream-static join, so it needs no watermark, supports
append mode, and never shuffles the stream by key (skew-immune, the same
property that makes the broadcast strategy the batch skew escape hatch).

For two STREAMS (both sides unbounded) use Spark's native stream-stream
interval join with watermarks instead; the as-of-latest semantics over an
unbounded right side requires retraction and is out of scope (documented
limitation, same as Flink's temporal join restrictions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from feature_extraction_spark.ops.asof import asof_join_broadcast


def stream_asof_enrich(
    stream_turns: DataFrame,
    static_right: DataFrame,
    on: str | list[str],
    ts_col: str = "ts",
    right_ts_col: str | None = None,
    value_cols: list[str] | None = None,
    inclusive: bool = True,
    suffix: str = "_asof",
) -> DataFrame:
    """As-of enrich a streaming DataFrame from a static dimension.

    ``stream_turns`` must be a streaming DataFrame (readStream);
    ``static_right`` a batch DataFrame. Output column contract matches the
    batch ``asof_join`` ops: ``<col><suffix>`` + ``<ts_col><suffix>``.
    """
    if not stream_turns.isStreaming:
        raise ValueError("stream_turns must be a streaming DataFrame")
    if static_right.isStreaming:
        raise ValueError(
            "static_right must be batch; for stream-stream use an interval join"
        )
    return asof_join_broadcast(
        stream_turns,
        static_right,
        on,
        ts_col=ts_col,
        right_ts_col=right_ts_col,
        value_cols=value_cols,
        inclusive=inclusive,
        suffix=suffix,
    )
