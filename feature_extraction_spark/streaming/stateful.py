"""Custom stateful streaming operator: incremental gap-based sessionization
with ``applyInPandasWithState`` (the sanctioned surface for stateful logic
the built-in session_window cannot express — e.g. carrying per-session
running feature state across micro-batches).

State per conv_id: (session_id counter, session_start_us, last_ts_us,
n_turns, n_tool_turns). Closed sessions are emitted as soon as a turn
arrives more than ``gap_seconds`` after the previous one, or when the
event-time timeout fires (watermark passed last_ts + gap).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("session_id", T.IntegerType()),
        T.StructField("session_start_us", T.LongType()),
        T.StructField("session_end_us", T.LongType()),
        T.StructField("n_turns", T.LongType()),
        T.StructField("n_tool_turns", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("session_id", T.IntegerType()),
        T.StructField("session_start_us", T.LongType()),
        T.StructField("last_ts_us", T.LongType()),
        T.StructField("n_turns", T.LongType()),
        T.StructField("n_tool_turns", T.LongType()),
    ]
)


def stream_sessionize_stateful(
    turns: DataFrame,
    gap_seconds: float = 300.0,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming per-conversation sessionizer emitting CLOSED sessions with
    turn/tool counts. Batch equivalent: ops.sessionize.session_bounds."""
    gap_us = int(gap_seconds * 1_000_000)

    def fn(key, pdfs, state: GroupState):
        conv_id = key[0]
        out = []

        if state.hasTimedOut:
            if state.exists:
                sid, start, last, n, ntool = state.get
                if n > 0:
                    out.append((conv_id, sid, start, last, n, ntool))
                # KEEP the state (advance the counter, clear the open
                # session) instead of remove(): dropping it would restart
                # the next session at session_id=0, colliding with the one
                # just emitted under the same (conv_id, session_id) key.
                # Cost: one tiny state row per conversation, retained; no
                # timeout is re-armed until new data opens a session.
                state.update((sid + 1, None, None, 0, 0))
            yield pd.DataFrame(out, columns=OUTPUT_SCHEMA.fieldNames())
            return

        rows = pd.concat(list(pdfs))
        rows["ts_us"] = rows["ts"].astype("int64") // 1000
        rows = rows.sort_values(["ts_us", "turn_idx"])

        if state.exists:
            sid, start, last, n, ntool = state.get
        else:
            sid, start, last, n, ntool = 0, None, None, 0, 0

        for r in rows.itertuples():
            is_tool = 1 if r.tool is not None and not pd.isna(r.tool) else 0
            if last is None:
                start, last, n, ntool = r.ts_us, r.ts_us, 1, is_tool
            elif r.ts_us - last > gap_us:
                out.append((conv_id, sid, start, last, n, ntool))
                sid += 1
                start, last, n, ntool = r.ts_us, r.ts_us, 1, is_tool
            else:
                # late-but-within-watermark rows (ts_us < last) join the
                # open session WITHOUT regressing its bounds: last must
                # stay the max event time seen or session_end goes
                # backward and the next gap test spuriously splits
                last = max(last, r.ts_us)
                start = min(start, r.ts_us)
                n += 1
                ntool += is_tool

        state.update((sid, start, last, n, ntool))
        state.setTimeoutTimestamp(last // 1000 + int(gap_seconds * 1000))
        yield pd.DataFrame(out, columns=OUTPUT_SCHEMA.fieldNames())

    return (
        turns.withWatermark("ts", watermark)
        .groupBy("conv_id")
        .applyInPandasWithState(
            fn,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
