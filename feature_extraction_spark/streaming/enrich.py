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

For two STREAMS (both sides unbounded), ``stream_trailing_join`` provides
the watermark-bounded interval form (every right event in the trailing
lookback window — leakage-free, state bounded by the watermark). True
as-of-LATEST semantics over an unbounded right side would require
retraction and stays out of scope (documented limitation, same as Flink's
temporal join restrictions).
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


def stream_trailing_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    lookback_seconds: float,
    left_ts: str = "ts",
    right_ts: str = "ts",
    watermark: str = "1 hour",
    strict: bool = False,
    suffix: str = "_r",
) -> DataFrame:
    """Stream-STREAM trailing-window join: every left event is matched
    with the right-stream events of the same key whose event time falls in
    ``[left.ts - lookback, left.ts]`` (``strict=True`` excludes equality —
    exactly-earlier rows only). The zero-temporal-leakage direction: a
    right event later than the left event can never join.

    This is Spark's native watermarked stream-stream inner join — the
    time-range condition plus both watermarks let the engine bound its
    join state: right rows older than (watermark - lookback) and left rows
    older than the watermark are dropped from state, so state size is
    O(rate x (watermark + lookback)) regardless of stream lifetime. That
    is the 100 TB/day story: no unbounded buffering, no rescan.

    Append output mode; inner join only (left-outer stream-stream joins
    emit NULL matches at watermark expiry and delay results by the full
    watermark — compose with a batch backfill instead if you need them).
    Right columns (except the join keys) come back ``<col><suffix>``.

    Reference analog: none — the reference is batch-only; this is the
    always-on form of the engine's trailing-window features
    (ops/windows.rolling_turn_features at event grain)."""
    if not (left.isStreaming and right.isStreaming):
        raise ValueError(
            "both sides must be streaming; for stream-static use "
            "stream_asof_enrich, for batch use ops.rangejoin/ops.asof"
        )
    if lookback_seconds <= 0:
        raise ValueError("lookback_seconds must be > 0")
    keys = [on] if isinstance(on, str) else list(on)

    from pyspark.sql import functions as F

    r = right
    for c in right.columns:
        if c not in keys:
            new = f"{c}{suffix}"
            # a suffixed name that collides with another right column or a
            # left column makes every later reference ambiguous — fail at
            # construction, not at analysis inside the streaming query
            if new in right.columns or new in left.columns:
                raise ValueError(
                    f"suffixed right column {new!r} collides with an "
                    f"existing column; pass a different suffix"
                )
            r = r.withColumnRenamed(c, new)
    rts = f"{right_ts}{suffix}" if right_ts not in keys else right_ts

    l_wm = left.withWatermark(left_ts, watermark)
    r_wm = r.withWatermark(rts, watermark)

    # dataframe-qualified time refs: unqualified F.col(rts) is ambiguous
    # when the left stream already carries a column named like the
    # suffixed right ts
    rcol, lcol = r_wm[rts], l_wm[left_ts]
    upper = rcol < lcol if strict else rcol <= lcol
    us = int(lookback_seconds * 1_000_000)
    lower = rcol >= lcol - F.expr(f"INTERVAL {us} MICROSECONDS")
    cond = upper & lower
    for k in keys:
        cond = cond & (l_wm[k] == r_wm[k])
    joined = l_wm.join(r_wm, cond, "inner")
    # drop the duplicate key columns from the right side
    return joined.select(*[l_wm[c] for c in left.columns],
                         *[r_wm[c] for c in r.columns if c not in keys])
