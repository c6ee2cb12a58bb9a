"""Stateful streaming sessionizer (applyInPandasWithState) vs batch."""

import pandas as pd
import pyspark.sql.functions as F


def test_stateful_sessionize_matches_batch(spark, transcripts, tmp_path):
    from feature_extraction_spark.ops.sessionize import session_bounds
    from feature_extraction_spark.streaming.stateful import (
        stream_sessionize_stateful,
    )

    src = str(tmp_path / "src")
    transcripts.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(transcripts.schema).parquet(src)

    out_path = str(tmp_path / "out")
    q = (
        stream_sessionize_stateful(stream, gap_seconds=300.0, watermark="0 seconds")
        .writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = spark.read.parquet(out_path).toPandas()
    exp = session_bounds(transcripts, gap_seconds=300.0).toPandas()
    exp["start_us"] = exp["session_start"].astype("int64") // 1000
    exp["end_us"] = exp["session_end"].astype("int64") // 1000

    # every emitted session must exactly match a batch session
    merged = got.merge(
        exp,
        left_on=["conv_id", "session_start_us", "session_end_us"],
        right_on=["conv_id", "start_us", "end_us"],
        how="left",
    )
    assert merged["session_id_y"].notna().all()
    assert (merged["n_turns_x"] == merged["n_turns_y"]).all()

    # sessions the stream closed mid-batch (gap seen within data) must all
    # be emitted: batch sessions that are NOT the last of their conv
    last = exp.sort_values("start_us").groupby("conv_id").tail(1)
    must_emit = exp.merge(
        last[["conv_id", "session_id"]],
        on=["conv_id", "session_id"],
        how="left",
        indicator=True,
    )
    must_emit = must_emit[must_emit["_merge"] == "left_only"]
    got_keys = {(r.conv_id, r.session_start_us) for r in got.itertuples()}
    missing = [
        (r.conv_id, r.start_us)
        for r in must_emit.itertuples()
        if (r.conv_id, r.start_us) not in got_keys
    ]
    assert not missing, f"unclosed mid-stream sessions: {missing[:5]}"
    assert isinstance(got, pd.DataFrame)


def _run_batch(spark, schema, src, out_path, ck, gap_s, watermark):
    from feature_extraction_spark.streaming.stateful import (
        stream_sessionize_stateful,
    )

    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        stream_sessionize_stateful(stream, gap_seconds=gap_s, watermark=watermark)
        .writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def _turn(conv, idx, ts_s, tool=None):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    return (conv, idx, "user", f"text {idx}", tool,
            t0 + dt.timedelta(seconds=ts_s))


_SCHEMA = ("conv_id string, turn_idx int, role string, text string, "
           "tool string, ts timestamp")


def test_stateful_session_id_continues_after_timeout(spark, tmp_path):
    """Regression (round-2 review): after an event-time timeout closes a
    session, the NEXT session of the same conversation must get a fresh
    session_id, not restart at 0 (duplicate (conv_id, session_id) keys)."""
    src, out, ck = (str(tmp_path / p) for p in ("src", "out", "ck"))
    batches = [
        [_turn("A", 0, 0)],
        [_turn("B", 0, 3600)],          # watermark passes A's gap -> timeout
        [_turn("A", 1, 7200)],          # A's second session opens
        [_turn("B", 1, 14400)],         # watermark flushes A's second session
    ]
    for b in batches:
        spark.createDataFrame(b, _SCHEMA).write.mode("append").parquet(src)
        _run_batch(spark, spark.read.parquet(src).schema, src, out, ck,
                   gap_s=300.0, watermark="0 seconds")
    got = spark.read.parquet(out).filter("conv_id = 'A'").toPandas()
    assert len(got) == 2
    assert sorted(got["session_id"]) == [0, 1], got


def test_stateful_late_row_does_not_regress_session_end(spark, tmp_path):
    """Regression (round-2 review): a late-but-within-watermark row must
    not move the open session's last-seen timestamp backward (which made
    the next on-time turn split the session spuriously)."""
    src, out, ck = (str(tmp_path / p) for p in ("src", "out", "ck"))
    batches = [
        [_turn("A", 0, 0), _turn("A", 1, 200)],
        [_turn("A", 2, 30)],            # late row, inside the 2h watermark
        [_turn("A", 3, 400)],           # true gap 200s < 300 -> same session
        [_turn("B", 0, 14400)],         # flush via timeout
    ]
    for b in batches:
        spark.createDataFrame(b, _SCHEMA).write.mode("append").parquet(src)
        _run_batch(spark, spark.read.parquet(src).schema, src, out, ck,
                   gap_s=300.0, watermark="2 hours")
    got = spark.read.parquet(out).filter("conv_id = 'A'").toPandas()
    assert len(got) == 1, got  # ONE session, not spuriously split
    r = got.iloc[0]
    assert r["n_turns"] == 4
    base = 1_704_067_200_000_000  # 2024-01-01 epoch micros
    assert r["session_start_us"] == base
    assert r["session_end_us"] == base + 400_000_000
