"""Structured-Streaming façade over the engine's event-time logic.

The reference is purely batch (SURVEY.md §2.5); these are the engine
extensions for streams of transcript turns: gap-based session windows with
watermarked late-data handling, and sliding-window turn-rate aggregates.
Semantics match the batch ops (sessionize/session_bounds) — a session closes
when no turn arrives within the gap — with ONE boundary-exact difference
inherent to ``session_window``: a gap of EXACTLY the threshold splits here
(the window [t, t+gap) does not overlap an event at t+gap) while the batch
op's strict ``gap > threshold`` test keeps the pair together. Real event
times hit the exact boundary with measure zero; the stateful sessionizer
(streaming/stateful.py) uses the batch comparison and has no such skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_session_bounds(
    turns: DataFrame,
    gap: str = "5 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Per-conversation session summaries over a streaming DataFrame.
    Batch equivalent: ops.sessionize.session_bounds."""
    return (
        turns.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap), F.col("conv_id"))
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
        .select(
            "conv_id",
            F.col("session_window.start").alias("window_start"),
            F.col("session_window.end").alias("window_end"),
            "n_turns",
            "session_start",
            "session_end",
        )
    )


def stream_turn_rates(
    turns: DataFrame,
    window: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Sliding-window turn counts + tool-usage rates per conversation."""
    return (
        turns.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide), F.col("conv_id"))
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.avg(F.col("tool").isNotNull().cast("double")).alias("tool_rate"),
        )
        .select(
            "conv_id",
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "n_turns",
            "tool_rate",
        )
    )


def stream_dedup_turns(
    turns: DataFrame,
    watermark: str = "1 hour",
) -> DataFrame:
    """Late/duplicate turn suppression within the watermark horizon."""
    return turns.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["conv_id", "turn_idx"]
    )
