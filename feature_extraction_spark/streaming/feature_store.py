"""Streaming feature-store maintenance: fold each micro-batch into a
snapshot-committed mergeable-state table.

This closes the loop between the streaming layer and the incremental
aggregation algebra (ops/incremental.py): a Structured Streaming source
feeds ``foreachBatch``; every micro-batch is reduced to per-entity partial
stat states (one hash aggregation over |batch| rows) and merged with the
current state snapshot (|entities| rows), and the result is committed as
the next snapshot of the state table. Per update the engine touches
|batch| + |state| bytes — never the stream's history.

Exactly-once without a transactional sink: Structured Streaming replays a
failed micro-batch under the SAME batch_id, and the state commit is atomic
(sources/snapshots.py marker protocol) and records the batch_id it folded
in. A replayed batch whose id is already committed is skipped, so the
crash window between snapshot-commit and stream-checkpoint-advance cannot
double-count (tested by direct replay in tests/test_feature_store.py).

Reference analog: none — the reference re-runs batch scripts per data drop
(extract_timing_features.py:187-218); this is the always-on form.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame

from feature_extraction_spark.ops.incremental import (
    merge_stat_states,
    partial_stat_state,
)
from feature_extraction_spark.sources.snapshots import (
    commit_snapshot,
    last_committed_version,
    read_manifest,
    read_snapshot,
)


def make_state_upserter(
    state_table: str,
    value_col: str,
    level: str = "conv",
) -> Callable[[DataFrame, int], None]:
    """The foreachBatch callable: fold one micro-batch into the state
    snapshot table, idempotently under batch replay."""

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        last = last_committed_version(spark, state_table)
        if last is not None:
            m = read_manifest(spark, state_table, last)
            done = m.get("stream_batch_id")
            if done is not None and int(batch_id) <= int(done):
                return  # replay of an already-committed batch
        delta = partial_stat_state(batch_df, value_col, level=level)
        if last is None:
            state = delta
        else:
            state = merge_stat_states(
                read_snapshot(spark, state_table, last), delta
            )
        commit_snapshot(
            state,
            state_table,
            mode="overwrite",
            extra_meta={"stream_batch_id": int(batch_id)},
        )

    return upsert


def stream_update_stat_states(
    stream: DataFrame,
    state_table: str,
    checkpoint: str,
    value_col: str,
    level: str = "conv",
    query_name: str = "feature_store_update",
):
    """Wire a streaming DataFrame into the state-table upserter. Returns
    the (not-yet-started) DataStreamWriter so the caller picks the
    trigger (availableNow for catch-up runs, processingTime for always-on)."""
    return (
        stream.writeStream.queryName(query_name)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
        .foreachBatch(make_state_upserter(state_table, value_col, level=level))
    )
